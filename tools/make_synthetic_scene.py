#!/usr/bin/env python
"""Generate a tiny synthetic scene in the reference's on-disk format
(transforms_*.json + rgb jpg + 16-bit depth png + GT target_depth + cIMLE
hypothesis .npy dumps) for end-to-end CLI tests — the reference ships no
test fixtures at all (SURVEY.md §4).

Usage: python tools/make_synthetic_scene.py /tmp/scene [--H 48 --W 64 --K 4]
"""

import argparse
import json
import os

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None


def look_at_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """OpenGL-style c2w: camera looks down -z."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd
    c2w[:3, 3] = eye
    return c2w


def render_synthetic(H, W, fx, fy, cx, cy, c2w, spheres):
    """Analytic ray-sphere render: rgb in [0,1], depth in meters (0 = miss).
    Uses the repo's own pixel conventions (+0.5 centers, y-flip)."""
    jj, ii = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    dirs = np.stack(
        [((ii + 0.5) - cx) / fx, (H - (jj + 0.5) - cy) / fy, -np.ones_like(ii)],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)

    depth = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3))
    # background: gradient sky
    rgb[..., 0] = np.linspace(0.2, 0.6, W)[None, :]
    rgb[..., 1] = np.linspace(0.3, 0.5, H)[:, None]
    rgb[..., 2] = 0.7
    for center, radius, color in spheres:
        oc = rays_o - np.asarray(center)
        b = np.sum(oc * rays_d, -1)
        a = np.sum(rays_d * rays_d, -1)
        c = np.sum(oc * oc, -1) - radius**2
        disc = b * b - a * c
        hit = disc > 0
        t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / a, np.inf)
        # depth convention: -z in camera frame (distance along optical axis)
        closer = (t > 0) & (t < depth)
        depth = np.where(closer, t, depth)
        shade = 0.6 + 0.4 * np.clip(-rays_d[..., 2], 0, 1)
        for ch in range(3):
            rgb[..., ch] = np.where(closer, color[ch] * shade, rgb[..., ch])
    depth = np.where(np.isinf(depth), 0.0, depth)
    return rgb.astype(np.float32), depth.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--H", type=int, default=48)
    ap.add_argument("--W", type=int, default=64)
    ap.add_argument("--K", type=int, default=4, help="hypotheses per image")
    ap.add_argument("--n_train", type=int, default=3)
    ap.add_argument("--n_val", type=int, default=1)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--n_video", type=int, default=3)
    ap.add_argument("--cimle_dir", type=str, default="dump")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backdrop", action="store_true",
                    help="add a huge far sphere as a back wall so (nearly) "
                         "every pixel has valid finite gt depth — without "
                         "it the majority background rays miss (gt 0, "
                         "hypothesis=far), space carving is satisfied by a "
                         "far billboard, and test depth RMSE barely moves "
                         "at short horizons (BASELINE.md r5 ladder)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    H, W = args.H, args.W
    fx = fy = 0.8 * W
    cx, cy = W / 2.0, H / 2.0
    near, far = 0.5, 8.0
    dsf = 1000.0  # depth png stores millimeters

    spheres = [
        ((0.0, 0.0, -3.0), 1.0, (0.9, 0.2, 0.2)),
        ((1.2, 0.5, -4.5), 0.8, (0.2, 0.8, 0.3)),
        ((-1.0, -0.4, -2.5), 0.5, (0.9, 0.8, 0.1)),
    ]
    if args.backdrop:
        # nearly-flat wall: surface z≈-5 on-axis, z≥-5.4 at the image
        # corners, so optical depth stays < far=8 from every camera
        spheres.append(((0.0, 0.0, -55.0), 50.0, (0.5, 0.55, 0.65)))

    base = args.out_dir
    for sub in ("train/rgb", "train/depth", "train/target_depth",
                f"train/leres_cimle/{args.cimle_dir}"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    splits = {
        "train": args.n_train,
        "val": args.n_val,
        "test": args.n_test,
        "video": args.n_video,
    }
    img_counter = 0
    for split, n in splits.items():
        frames = []
        for k in range(n):
            angle = (img_counter * 0.35) + (0.1 if split != "train" else 0.0)
            eye = (1.8 * np.sin(angle), 0.3 * np.cos(angle * 1.7),
                   1.5 + 0.5 * np.cos(angle))
            c2w = look_at_pose(eye, target=(0.0, 0.0, -3.0))
            rgb, depth = render_synthetic(H, W, fx, fy, cx, cy, c2w, spheres)
            if args.backdrop:
                # off-axis corners of the tilted wall can exceed far — mark
                # them invalid (0) rather than asking the NeRF to place
                # geometry outside its [near, far] sampling support
                depth = np.where(depth > 0.93 * far, 0.0, depth)

            name = f"{img_counter}"
            rgb_rel = f"train/rgb/{name}.jpg"
            depth_rel = f"train/depth/{name}.png"
            depth_mm = (depth * dsf).astype(np.uint16)
            if cv2 is not None:
                cv2.imwrite(os.path.join(base, rgb_rel),
                            cv2.cvtColor((rgb * 255).astype(np.uint8),
                                         cv2.COLOR_RGB2BGR),
                            [cv2.IMWRITE_JPEG_QUALITY, 98])
                cv2.imwrite(os.path.join(base, depth_rel), depth_mm)
                cv2.imwrite(
                    os.path.join(base, f"train/target_depth/{name}.png"),
                    depth_mm,
                )
            frames.append({
                "file_path": rgb_rel,
                "depth_file_path": depth_rel,
                "transform_matrix": c2w.tolist(),
                "fx": fx, "fy": fy, "cx": cx, "cy": cy,
            })

            if split == "train":
                # K noisy hypotheses around the true depth (stand-in for the
                # cIMLE prior's dumps)
                for j in range(args.K):
                    scale = 1.0 + 0.08 * rng.standard_normal()
                    shift = 0.05 * rng.standard_normal()
                    hyp = np.clip(depth * scale + shift, near, far)
                    hyp = np.where(depth > 0, hyp, far).astype(np.float32)
                    np.save(
                        os.path.join(
                            base, "train", "leres_cimle", args.cimle_dir,
                            f"{name}_{j}.npy",
                        ),
                        hyp,
                    )
            img_counter += 1

        if n == 0 and split != "train":
            continue  # omit empty split files entirely
        meta = {"frames": frames}
        if split == "train":
            meta.update({"near": near, "far": far,
                         "depth_scaling_factor": dsf})
        with open(os.path.join(base, f"transforms_{split}.json"), "w") as fp:
            json.dump(meta, fp, indent=1)

    print(f"wrote synthetic scene to {base}: "
          f"{img_counter} frames, K={args.K}, {H}x{W}")


if __name__ == "__main__":
    main()
