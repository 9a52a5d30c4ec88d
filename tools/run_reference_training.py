#!/usr/bin/env python
"""Run the REFERENCE SCADE trainer (torch, CPU) on a scene for N steps and
print its final test metrics — the apples-to-apples oracle for our training
dynamics (same scene, same hyperparameters, different frameworks/RNG).

Usage:
  python tools/run_reference_training.py --data_dir /tmp --scene_id scene \
      --num_iterations 2000 --N_rand 256 [--ckpt_dir /tmp/refckpt]
"""

import argparse
import os
import sys
import types


def install_stubs():
    import numpy as np

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    import torch

    class _LPIPS:
        def __init__(self, *a, **k):
            pass

        def __call__(self, a, b, normalize=False):
            return torch.zeros((1, 1, 1, 1))

    mod("configargparse", ArgumentParser=object)
    mod("lpips", LPIPS=_LPIPS)
    skm = mod("skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
    sk = mod("skimage")
    sk.metrics = skm
    sk.io = mod("skimage.io", imread=lambda *a, **k: None)

    class _Grid:
        @staticmethod
        def make_grid(x, nrow=1):
            return x

    tv = mod("torchvision")
    tv.utils = mod("torchvision.utils", make_grid=_Grid.make_grid)
    tv.transforms = mod(
        "torchvision.transforms",
        functional=types.SimpleNamespace(),
        Normalize=lambda *a, **k: (lambda x: x),
        Compose=lambda fns: (lambda x: x),
        ToTensor=lambda *a, **k: (lambda x: x),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--scene_id", required=True)
    ap.add_argument("--ckpt_dir", default="/tmp/ref_ckpt")
    ap.add_argument("--expname", default="ref")
    ap.add_argument("--num_iterations", type=int, default=2000)
    ap.add_argument("--i_weights", type=int, default=0,
                    help="checkpoint cadence (0 = only at the end); "
                         "intermediate .tar files let long runs be scored "
                         "mid-flight with tools/run_reference_test.py")
    ap.add_argument("--N_rand", type=int, default=256)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=128)
    ap.add_argument("--num_hypothesis", type=int, default=4)
    ap.add_argument("--cimle_dir", default="dump")
    ap.add_argument("--seed", type=int, default=0,
                    help="train_nerf hardcodes seed 0 (run_scade_scannet.py"
                         ":831-833); this remaps that seed(0) call so "
                         "reference-side seed-variance runs are possible")
    flags = ap.parse_args()

    install_stubs()
    sys.path.insert(0, os.environ.get("SCADE_REFERENCE", "/root/reference"))
    import numpy as np
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self

    if flags.seed != 0:
        _np_seed, _t_seed = np.random.seed, torch.manual_seed
        np.random.seed = lambda s=None: _np_seed(
            flags.seed if s == 0 else s
        )
        torch.manual_seed = lambda s: _t_seed(flags.seed if s == 0 else s)

    import run_scade_scannet as R
    from data import load_scene_scannet

    scene_dir = os.path.join(flags.data_dir, flags.scene_id)
    (images, depths, valid_depths, poses, H, W, intrinsics, near, far,
     i_split, gt_depths, gt_valid_depths, all_hyp) = load_scene_scannet(
        scene_dir, flags.cimle_dir, flags.num_hypothesis,
        "transforms_train.json",
    )

    # scene bounds exactly as run_nerf does (:1236-1244)
    max_xyz = torch.full((3,), -1e6)
    min_xyz = torch.full((3,), 1e6)
    for idx in i_split[0]:
        ro, rd = R.get_rays(
            H, W, torch.Tensor(intrinsics[idx]), torch.Tensor(poses[idx])
        )
        pts = (ro + rd * far).view(-1, 3)
        max_xyz = torch.max(pts.amax(0), max_xyz)
        min_xyz = torch.min(pts.amin(0), min_xyz)

    args = argparse.Namespace(
        task="train", expname=flags.expname, ckpt_dir=flags.ckpt_dir,
        netdepth=8, netwidth=256, netdepth_fine=8, netwidth_fine=256,
        N_rand=flags.N_rand, num_iterations=flags.num_iterations,
        lrate=5e-4, decay_step=400000, decay_rate=0.1,
        chunk=4096, netchunk_per_gpu=65536, no_reload=True,
        N_samples=flags.N_samples, N_importance=flags.N_importance,
        perturb=1.0, use_viewdirs=True, i_embed=0, multires=9,
        multires_views=0, raw_noise_std=0.0, lindisp=False,
        i_print=max(flags.num_iterations // 10, 1), i_img=10**9,
        i_weights=flags.i_weights or flags.num_iterations,
        scene_id=flags.scene_id,
        data_dir=flags.data_dir, train_jsonfile="transforms_train.json",
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
    os.makedirs(os.path.join(flags.ckpt_dir, flags.expname), exist_ok=True)

    scene_sample_params = {
        "precomputed_z_samples": None, "near": near, "far": far,
    }
    lpips_alex = sys.modules["lpips"].LPIPS()
    R.train_nerf(
        images, depths, valid_depths, poses, intrinsics, i_split, args,
        scene_sample_params, lpips_alex, gt_depths, gt_valid_depths, all_hyp,
    )


if __name__ == "__main__":
    main()
