#!/usr/bin/env python
"""Demo hypothesis dump: run the cIMLE prior on a folder of raw images (no
scene json, no SfM alignment) and save K depth hypotheses + turbo previews
per image (reference: ambiguity_aware_prior/tools/output_depth_hypothesis_demo.py
— the raw-image variant without metric alignment).

Usage:
  python tools/output_depth_hypothesis_demo.py --image_dir imgs/ \
      --ckpt <ckpt> --mean_var <mean_var_adain.npy> --out_dir demo_dump
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--mean_var", required=True)
    ap.add_argument("--out_dir", default="demo_dump")
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--version", default="v2", choices=["v2", "v3"],
                    help="encoder cIMLE AdaIn flavor")
    ap.add_argument("--backbone", default="resnext101_32x8d")
    ap.add_argument("--num_hypothesis", type=int, default=20)
    ap.add_argument("--mini_batch_size", type=int, default=20,
                    help="z-draws per forward program (see the scannet tool)")
    ap.add_argument("--seed_num", type=int, default=0)
    ap.add_argument("--small_model", action="store_true")
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--precision", default="bfloat16",
                    choices=["highest", "high", "bfloat16", "tensorfloat32",
                             "ambient"],
                    help="matmul/conv precision for the forward passes "
                         "(bfloat16 = TPU fast path; 'highest' = exact f32)")
    args = ap.parse_args()

    if os.environ.get("SCADE_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

    import jax as _jax_precision_cfg

    if args.precision != "ambient":
        _jax_precision_cfg.config.update(
            "jax_default_matmul_precision", args.precision
        )

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from scade_tpu.prior.data import normalize_rgb
    from scade_tpu.prior.model import (PriorConfig, backbone_config,
                                       init_prior, prior_apply)
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
    else:
        with open(args.ckpt, "rb") as fp:
            variables = serialization.from_bytes(variables, fp.read())
    shifts = load_mean_var_adain(args.mean_var)

    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed_num)
    # ceil: cover num_hypothesis even when not a multiple of the z
    # minibatch (the k_i break below trims the overshoot)
    num_sets = -(-args.num_hypothesis // args.mini_batch_size)
    S = args.image_size

    # variables/shifts are jit ARGUMENTS: closed-over device arrays get
    # baked into the HLO as constants, and the 466 MB production model then
    # overflows the axon tunnel's remote_compile request (HTTP 413)
    @jax.jit
    def infer(variables, shifts, rgb, z):
        rgb_rep = jnp.repeat(rgb, args.mini_batch_size, axis=0)
        return prior_apply(model, variables, shifts, rgb_rep, z)

    names = sorted(
        f for f in os.listdir(args.image_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    for name in names:
        img_id = name.split(".")[0]
        bgr = cv2.imread(os.path.join(args.image_dir, name))
        rgb = bgr[:, :, ::-1]
        H_raw, W_raw = rgb.shape[:2]
        rgb_n = normalize_rgb(cv2.resize(rgb, (S, S)))[None]

        k_i = 0
        for _ in range(num_sets):
            key, k = jax.random.split(key)
            z = jax.random.normal(
                k, (args.mini_batch_size, args.d_latent), jnp.float32
            )
            depth = np.asarray(
                infer(variables, shifts, jnp.asarray(rgb_n), z))[..., 0]
            for d in depth:
                if k_i >= args.num_hypothesis:
                    break
                d_raw = cv2.resize(d.astype(np.float32), (W_raw, H_raw))
                np.save(os.path.join(args.out_dir, f"{img_id}_{k_i}.npy"), d_raw)
                prev = d_raw - d_raw.min()
                prev = (prev / (prev.max() + 1e-8) * 255).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(args.out_dir, f"{img_id}_{k_i}_preview.png"),
                    cv2.applyColorMap(prev, cv2.COLORMAP_TURBO),
                )
                k_i += 1
        print(f"{img_id}: {k_i} hypotheses")


if __name__ == "__main__":
    main()
