#!/usr/bin/env python
"""Dump a fresh prior-model init as a flax msgpack checkpoint.

The head-to-head (VERDICT r4 #3) needs BOTH trainers to start from the SAME
weights: this init loads into tools/train_prior.py via --ckpt, and exports
to the reference train_single.py via tools/export_prior_to_torch.py (whose
{model_state_dict} output run_reference_prior_training.py rewraps as the
{depth_model} schema the reference loads, train_single.py:199-225).

Usage: python tools/make_prior_init.py --out /tmp/prior_init.msgpack
       [--d_latent 32] [--image_size 224] [--seed 0] [--small_model]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--backbone", default="resnext101_32x8d")
    ap.add_argument("--version", default="v2")
    ap.add_argument("--cimle_version", default="enc", choices=["enc", "dec"])
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small_model", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    from scade_tpu.prior.model import backbone_config, init_prior

    cfg = backbone_config(args.backbone, d_latent=args.d_latent)
    if args.small_model:
        cfg = cfg.with_small()
    _, variables = init_prior(
        jax.random.PRNGKey(args.seed), cfg,
        image_size=(args.image_size, args.image_size),
        version=args.version, cimle_version=args.cimle_version,
    )
    with open(args.out, "wb") as fp:
        fp.write(serialization.to_bytes(variables))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
