#!/usr/bin/env python
"""Dump K cIMLE depth hypotheses per train image for a scene — the bridge
to the SCADE NeRF optimizer (reference:
ambiguity_aware_prior/tools/output_depth_hypothesis_scannet.py).

Usage:
  python tools/output_depth_hypothesis_scannet.py --scene_dir <scene> \
      --ckpt logs/prior/epoch56_step0.msgpack \
      --mean_var logs/prior/mean_var_adain.npy --dump_dir dump_cimle
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--ckpt", required=True, help="flax msgpack prior ckpt, "
                    "or a torch .pth/.tar (auto-translated)")
    ap.add_argument("--mean_var", required=True, help="mean_var_adain.npy")
    ap.add_argument("--dump_dir", default="dump_cimle")
    ap.add_argument("--dataset_name", default="scannet")
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--version", default="v2", choices=["v2", "v3"],
                    help="encoder cIMLE AdaIn flavor")
    ap.add_argument("--backbone", default="resnext101_32x8d")
    ap.add_argument("--num_hypothesis", type=int, default=20)
    ap.add_argument("--mini_batch_size", type=int, default=20,
                    help="z-draws per forward program; the reference uses "
                         "4 sets of 5 for GPU memory "
                         "(output_depth_hypothesis_scannet.py:393-395); one "
                         "20-draw program measures 6.6 img/s vs 4.2 at 5 on "
                         "this chip (BASELINE.md r3)")
    ap.add_argument("--sfm_mask_threshold", type=float, default=0.1)
    ap.add_argument("--sfm_scaling_factor", type=float, default=1000.0,
                    help="SfM depth png units per meter")
    ap.add_argument("--sfm_far_clip", type=float, default=None,
                    help="drop SfM points beyond this depth (wild scenes)")
    ap.add_argument("--default_scale", type=float, default=0.5)
    ap.add_argument("--default_shift", type=float, default=0.0)
    ap.add_argument("--seed_num", type=int, default=0)
    ap.add_argument("--small_model", action="store_true")
    ap.add_argument("--save_previews", action="store_true")
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--precision", default="bfloat16",
                    choices=["highest", "high", "bfloat16", "tensorfloat32",
                             "ambient"],
                    help="matmul/conv precision for the dump forward passes; "
                         "bfloat16 is the TPU fast path (the downstream "
                         "SfM polyfit realigns every hypothesis, and the "
                         "reference itself runs TF32 on Ampere); 'highest' "
                         "restores exact f32")
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "none"],
                    help="run the WHOLE forward (params + activations) in "
                         "this dtype — bfloat16 halves HBM traffic on top "
                         "of --precision bfloat16's MXU fast path and is "
                         "the DEFAULT (measured 10.53 vs 8.42 img/s dump "
                         "rate at B=20 on chip; the SfM polyfit realigns "
                         "every hypothesis downstream). 'none' keeps f32 "
                         "params/activations (matmul precision still "
                         "applies); combine 'none' with --precision "
                         "highest for the exact-f32 path")
    args = ap.parse_args()

    if os.environ.get("SCADE_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

    import jax

    if args.precision != "ambient":
        jax.config.update("jax_default_matmul_precision", args.precision)

    from scade_tpu.prior.dump import dump_depth_hypotheses
    from scade_tpu.prior.model import backbone_config, init_prior
    from scade_tpu.prior.train import load_mean_var_adain

    cfg = backbone_config(args.backbone, d_latent=args.d_latent)
    if args.small_model:
        cfg = cfg.with_small()
    model, variables = init_prior(
        jax.random.PRNGKey(0), cfg,
        image_size=(args.image_size, args.image_size),
        version=args.version,
    )

    if args.ckpt.endswith((".pth", ".tar")):
        import torch

        from scade_tpu.prior.translate import params_from_torch_state_dict

        raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
        sd = raw.get("model_state_dict", raw.get("state_dict", raw))
        params, batch_stats = params_from_torch_state_dict(sd, cfg, version=args.version)
        variables = {"params": params, "batch_stats": batch_stats}
        print(f"translated torch checkpoint {args.ckpt}")
    else:
        from flax import serialization

        with open(args.ckpt, "rb") as fp:
            variables = serialization.from_bytes(variables, fp.read())
        print(f"restored {args.ckpt}")

    shifts = load_mean_var_adain(args.mean_var)
    out = dump_depth_hypotheses(
        model, variables, shifts, args.scene_dir, args.dump_dir,
        d_latent=args.d_latent, num_hypothesis=args.num_hypothesis,
        mini_batch_size=args.mini_batch_size,
        dataset_name=args.dataset_name,
        sfm_mask_threshold=args.sfm_mask_threshold,
        default_scale=args.default_scale, default_shift=args.default_shift,
        seed=args.seed_num, save_previews=args.save_previews,
        sfm_scaling_factor=args.sfm_scaling_factor,
        sfm_far_clip=args.sfm_far_clip,
        compute_dtype=None if args.compute_dtype == "none"
        else args.compute_dtype,
        image_size=args.image_size,
    )
    print(f"hypotheses written to {out}")


if __name__ == "__main__":
    main()
