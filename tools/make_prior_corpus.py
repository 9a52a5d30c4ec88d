#!/usr/bin/env python
"""Generate a synthetic taskonomy-style annotations corpus for the prior
trainer head-to-head (VERDICT r4 #3).

Layout matches the reference MultiDataset contract
(ambiguity_aware_prior/data/multi_dataset.py:21-26,54-98): one dataset dir
containing annotations/{train,val}_annotations.json with rgb_path /
depth_path / ins_planes_path entries, RGB pngs, uint16 depth pngs, and
uint8 plane-instance pngs. Depth images are smooth gradients plus per-plane
offsets so the PWN-plane and edge losses have real structure to regress.

Usage: python tools/make_prior_corpus.py /tmp/prior_corpus [--n 16]
       [--H 256] [--W 320] [--n_val 2] [--dataset taskonomy]
"""

import argparse
import json
import os

import numpy as np


def make_image(rng, H, W):
    """Piecewise-planar depth + correlated RGB: a few random half-plane
    'walls' over a smooth background gradient."""
    yy, xx = np.meshgrid(
        np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij"
    )
    depth = 2.0 + 1.5 * xx + 1.0 * yy
    planes = np.zeros((H, W), np.uint8)
    n_planes = rng.integers(2, 5)
    for pid in range(1, n_planes + 1):
        # random oriented half-plane region with its own slanted depth
        a, b = rng.normal(size=2)
        c = rng.uniform(-0.5, 0.5)
        region = (a * (xx - 0.5) + b * (yy - 0.5) + c) > 0
        slant = 1.0 + 0.8 * rng.random() * xx + 0.8 * rng.random() * yy
        depth = np.where(region, 0.8 + 1.2 * rng.random() * slant, depth)
        planes = np.where(region, pid, planes).astype(np.uint8)
    rgb = np.stack(
        [
            np.clip(50 + 40 * depth + 20 * rng.normal(size=(H, W)), 0, 255),
            np.clip(30 + 30 * planes.astype(np.float64) * 10, 0, 255),
            np.clip(200 - 30 * depth, 0, 255),
        ],
        -1,
    ).astype(np.uint8)
    # taskonomy convention: uint16 >= 28000 is INVALID (reference
    # multi_dataset.py:546-549 loading_check) — keep the whole range below
    depth_u16 = np.clip(depth / depth.max() * 20000, 0, 27999).astype(
        np.uint16
    )
    return rgb, depth_u16, planes


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--n_val", type=int, default=2)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--dataset", default="taskonomy",
                    help="dataset dir name (taskonomy → quality_flg=3, "
                         "multi_dataset.py:228-234)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    d = os.path.join(args.out_dir, args.dataset)
    os.makedirs(os.path.join(d, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(d, "imgs"), exist_ok=True)

    for phase, count in (("train", args.n), ("val", args.n_val)):
        annos = []
        for i in range(count):
            rgb, depth, planes = make_image(rng, args.H, args.W)
            tag = f"{phase}{i}"
            cv2.imwrite(os.path.join(d, "imgs", f"{tag}.png"),
                        rgb[:, :, ::-1])
            cv2.imwrite(os.path.join(d, "imgs", f"{tag}_d.png"), depth)
            cv2.imwrite(os.path.join(d, "imgs", f"{tag}_p.png"), planes)
            annos.append({
                "rgb_path": f"{args.dataset}/imgs/{tag}.png",
                "depth_path": f"{args.dataset}/imgs/{tag}_d.png",
                "ins_planes_path": f"{args.dataset}/imgs/{tag}_p.png",
            })
        with open(os.path.join(d, "annotations",
                               f"{phase}_annotations.json"), "w") as f:
            json.dump(annos, f)
    print(f"wrote {args.n} train + {args.n_val} val images under {d}")


if __name__ == "__main__":
    main()
