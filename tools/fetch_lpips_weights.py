#!/usr/bin/env python
"""Assemble the LPIPS(alex) weights npz WITHOUT the `lpips` package.

The LPIPS(alex) metric = torchvision AlexNet conv features + the 5 learned
1x1 linear heads from the official LPIPS v0.1 release. Both artifacts are
public; this script downloads them (or takes local copies), verifies them,
and writes the npz that scade_tpu.eval.lpips_jax loads. Run it on any
machine WITH network access (this build environment has none), then ship
the ~9 MB npz to ~/.cache/scade_tpu/lpips_alex.npz or $SCADE_LPIPS_WEIGHTS.

    python tools/fetch_lpips_weights.py [--alexnet PATH] [--lin PATH] [out.npz]

Artifacts (same ones the `lpips` package downloads):
  1. AlexNet ImageNet weights — torchvision model zoo:
     https://download.pytorch.org/models/alexnet-owt-7be5be79.pth
     (torch zoo convention: "7be5be79" is the first 8 hex chars of the
     file's sha256 — verified after download)
  2. LPIPS v0.1 alex linear heads — official repo:
     https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/
     master/lpips/weights/v0.1/alex.pth

Output keys (identical to tools/export_lpips_weights.py): conv{0..4}_{w,b}
(OIHW) from AlexNet features convs 0/3/6/8/10, lin{0..4}_w (C,) from the
lpips lin heads. Reference use site: run_scade_scannet.py:371 `lpips(alex)`.
"""

import argparse
import hashlib
import os
import sys

ALEXNET_URL = "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth"
ALEXNET_SHA_PREFIX = "7be5be79"
LIN_URL = (
    "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
    "master/lpips/weights/v0.1/alex.pth"
)
# AlexNet `features` Sequential indices of the 5 convs
ALEX_CONV_IDX = (0, 3, 6, 8, 10)
ALEX_CONV_CH = (64, 192, 384, 256, 256)


def _download(url, dest):
    import urllib.request

    print(f"fetching {url} ...")
    urllib.request.urlretrieve(url, dest)
    return dest


def _sha256(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=os.path.expanduser(
        "~/.cache/scade_tpu/lpips_alex.npz"))
    ap.add_argument("--alexnet", help="local alexnet-owt-*.pth (skip download)")
    ap.add_argument("--lin", help="local lpips v0.1 alex.pth (skip download)")
    args = ap.parse_args()

    import numpy as np
    import torch

    alexnet_pth = args.alexnet or _download(ALEXNET_URL, "/tmp/alexnet-owt.pth")
    sha = _sha256(alexnet_pth)
    if not sha.startswith(ALEXNET_SHA_PREFIX):
        sys.exit(
            f"alexnet weights sha256 {sha[:8]} != expected {ALEXNET_SHA_PREFIX}"
        )
    lin_pth = args.lin or _download(LIN_URL, "/tmp/lpips_alex_v01.pth")
    print(f"lpips lin heads sha256: {_sha256(lin_pth)}")

    alex_sd = torch.load(alexnet_pth, map_location="cpu")
    lin_sd = torch.load(lin_pth, map_location="cpu")

    data = {}
    for i, fi in enumerate(ALEX_CONV_IDX):
        w = alex_sd[f"features.{fi}.weight"].numpy()
        b = alex_sd[f"features.{fi}.bias"].numpy()
        assert w.shape[0] == ALEX_CONV_CH[i], (i, w.shape)
        data[f"conv{i}_w"] = w
        data[f"conv{i}_b"] = b
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        assert w.shape[1] == ALEX_CONV_CH[i], (i, w.shape)
        data[f"lin{i}_w"] = w.reshape(-1)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(args.out, **data)
    print(f"wrote {args.out}: {sorted(data)}")


if __name__ == "__main__":
    main()
