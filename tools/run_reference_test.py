#!/usr/bin/env python
"""Run the REFERENCE `test` task (torch, CPU) on a scene and write its
metrics.txt — the reference side of the real-scene parity playbook
(tools/run_real_scene_parity.py).

Mirrors the reference run_nerf() test dispatch (run_scade_scannet.py:
1246-1283) with a hand-built args Namespace because configargparse is not
installed here (same stubbing machinery as tools/run_reference_training.py).
The reference's load_checkpoint only picks up files whose name contains
'000.tar' (run_scade_scannet.py:412-413) — name pretrained bundles
accordingly.

Usage:
  python tools/run_reference_test.py --data_dir <root>/datasets/scannet \
      --scene_id scene0758_00 --cimle_dir dump_... \
      --ckpt_dir <root>/pretrained_models/scannet --expname scene758_scade
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_reference_training import install_stubs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--scene_id", required=True)
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--expname", required=True)
    ap.add_argument("--cimle_dir", default="dump")
    ap.add_argument("--num_hypothesis", type=int, default=20)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--netdepth", type=int, default=8)
    ap.add_argument("--netwidth", type=int, default=256)
    ap.add_argument("--multires", type=int, default=9)
    flags = ap.parse_args()

    install_stubs()
    sys.path.insert(0, os.environ.get("SCADE_REFERENCE", "/root/reference"))
    import numpy as np
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference predates torch's weights_only=True default
    # (load_checkpoint, run_scade_scannet.py:419); our .tar carries a numpy
    # optax sidecar, so opt back in to full unpickling of our own file
    _load = torch.load
    torch.load = lambda *a, **k: _load(*a, **{"weights_only": False, **k})

    import run_scade_scannet as R
    from data import load_scene_scannet

    scene_dir = os.path.join(flags.data_dir, flags.scene_id)
    (images, depths, valid_depths, poses, H, W, intrinsics, near, far,
     i_split, gt_depths, gt_valid_depths, _all_hyp) = load_scene_scannet(
        scene_dir, flags.cimle_dir, flags.num_hypothesis,
        "transforms_train.json",
    )
    i_train, i_val, i_test, i_video = i_split

    # scene bounds exactly as run_nerf does (:1236-1244)
    max_xyz = torch.full((3,), -1e6)
    min_xyz = torch.full((3,), 1e6)
    for idx in i_train:
        ro, rd = R.get_rays(
            H, W, torch.Tensor(intrinsics[idx]), torch.Tensor(poses[idx])
        )
        pts = (ro + rd * far).view(-1, 3)
        max_xyz = torch.max(pts.amax(0), max_xyz)
        min_xyz = torch.min(pts.amin(0), min_xyz)

    args = argparse.Namespace(
        task="test", expname=flags.expname, ckpt_dir=flags.ckpt_dir,
        netdepth=flags.netdepth, netwidth=flags.netwidth,
        netdepth_fine=flags.netdepth, netwidth_fine=flags.netwidth,
        N_rand=1024, num_iterations=0,
        lrate=5e-4, decay_step=400000, decay_rate=0.1,
        chunk=flags.chunk, netchunk_per_gpu=65536, no_reload=False,
        N_samples=flags.N_samples, N_importance=flags.N_importance,
        perturb=1.0, use_viewdirs=True, i_embed=0, multires=flags.multires,
        multires_views=0, raw_noise_std=0.0, lindisp=False,
        i_print=1000, i_img=10**9, i_weights=10**9,
        scene_id=flags.scene_id, data_dir=flags.data_dir,
        train_jsonfile="transforms_train.json",
        cimle_dir=flags.cimle_dir, num_hypothesis=flags.num_hypothesis,
        space_carving_weight=0.007, warm_start_nerf=0,
        scaleshift_lr=1e-7, scale_init=1.0, shift_init=0.0,
        freeze_ss=400000, is_joint=False, norm_p=2,
        space_carving_threshold=0.0, mask_corners=False,
        load_pretrained=False, pretrained_dir="", input_ch_cam=0,
        opt_ch_cam=False, ch_cam_lr=1e-4, n_gpus=1,
        bb_center=(max_xyz + min_xyz) / 2.0,
        bb_scale=2.0 / (max_xyz - min_xyz).max(),
    )

    scene_sample_params = {
        "precomputed_z_samples": None, "near": near, "far": far,
    }
    lpips_alex = sys.modules["lpips"].LPIPS()

    # test dispatch (run_scade_scannet.py:1260-1283)
    _, render_kwargs_test, _, nerf_grad_vars, _, _ = R.create_nerf(
        args, scene_sample_params
    )
    for p in nerf_grad_vars:
        p.requires_grad = False

    device = R.device
    images_t = torch.Tensor(images[i_test]).to(device)
    if gt_depths is None:
        depths_t = torch.Tensor(depths[i_test]).to(device)
        valid_t = torch.Tensor(valid_depths[i_test]).bool().to(device)
    else:
        depths_t = torch.Tensor(gt_depths[i_test]).to(device)
        valid_t = torch.Tensor(gt_valid_depths[i_test]).bool().to(device)
    poses_t = torch.Tensor(poses[i_test]).to(device)
    intr_t = torch.Tensor(intrinsics[i_test]).to(device)
    i_test0 = i_test - i_test[0]
    mean_metrics, images_test = R.render_images_with_metrics(
        None, i_test0, images_t, depths_t, valid_t, poses_t, H, W, intr_t,
        lpips_alex, args, render_kwargs_test,
        with_test_time_optimization=False,
    )
    R.write_images_with_metrics(
        images_test, mean_metrics, far, args, with_test_time_optimization=False
    )
    out = os.path.join(
        flags.ckpt_dir, flags.expname, f"test_images_{flags.scene_id}",
        "metrics.txt",
    )
    print(f"reference metrics written to {out}")


if __name__ == "__main__":
    main()
