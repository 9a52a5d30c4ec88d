#!/usr/bin/env python
"""Generate an END-TO-END render golden by running the REFERENCE's
render_rays (torch CPU, deterministic: perturb=0 so every u draw is a
linspace) with a small coarse+fine NeRF, and pinning the weights, rays and
every returned tensor to tests/golden/render_rays_e2e.npz.

This pins the full composition — stratified sampling, coarse pass,
importance resampling, sorted union, fine pass, P_depth draws — on top of
the per-component goldens.

Run from the repo root with the reference mounted at /root/reference:
    python tools/gen_render_golden.py
"""

import os
import sys

import numpy as np

REF = os.environ.get("SCADE_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# single source of truth for the reference-dependency stubs (the same
# machinery run_reference_test.py imports) — drifting copies broke once
from run_reference_training import install_stubs  # noqa: E402


def main():
    install_stubs()
    sys.path.insert(0, REF)
    import torch

    torch.manual_seed(0)
    import run_scade_scannet as R
    from model import run_nerf_helpers as H

    D, W, multires, n_samples, n_importance = 8, 64, 4, 8, 16
    embed_fn, input_ch = H.get_embedder(multires, 0)
    embeddirs_fn, input_ch_views = H.get_embedder(0, 0)

    coarse = H.NeRF(D=D, W=W, input_ch=input_ch, output_ch=5,
                    input_ch_views=input_ch_views, input_ch_cam=0,
                    use_viewdirs=True)
    fine = H.NeRF(D=D, W=W, input_ch=input_ch, output_ch=5,
                  input_ch_views=input_ch_views, input_ch_cam=0,
                  use_viewdirs=True)

    bb_center = torch.tensor([0.1, -0.2, 0.3])
    bb_scale = torch.tensor(0.5)
    query = lambda inputs, viewdirs, embedded_cam, network_fn: R.run_network(
        inputs, viewdirs, embedded_cam, network_fn, embed_fn, embeddirs_fn,
        bb_center, bb_scale, netchunk=65536,
    )

    rng = np.random.default_rng(7)
    n_rays = 24
    rays_o = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    rays_d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = 0.5, 6.0
    ray_batch = np.concatenate(
        [rays_o, rays_d,
         np.full((n_rays, 1), near, np.float32),
         np.full((n_rays, 1), far, np.float32),
         viewdirs.astype(np.float32)], -1,
    )

    with torch.no_grad():
        ret = R.render_rays(
            torch.from_numpy(ray_batch), True, coarse, query,
            N_samples=n_samples, embedded_cam=torch.zeros((0,)),
            perturb=0.0, N_importance=n_importance, network_fine=fine,
            raw_noise_std=0.0, pytest=False, is_joint=False, retraw=False,
        )

    arrs = {
        "rays_o": rays_o, "rays_d": rays_d,
        "near": np.float32(near), "far": np.float32(far),
        "bb_center": bb_center.numpy(), "bb_scale": bb_scale.numpy(),
    }
    for k, v in ret.items():
        arrs["out_" + k] = v.numpy()
    for name, net in (("coarse", coarse), ("fine", fine)):
        for k, v in net.state_dict().items():
            arrs[f"sd_{name}.{k}"] = v.numpy()

    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "render_rays_e2e.npz"), **arrs)
    print("wrote render_rays_e2e.npz:",
          sorted(k for k in arrs if k.startswith("out_")))


if __name__ == "__main__":
    main()
