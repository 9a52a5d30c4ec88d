#!/usr/bin/env python
"""Export a scade_tpu prior checkpoint (flax msgpack) to the reference's
torch state_dict naming so the upstream PyTorch tooling can consume it.

Usage:
  python tools/export_prior_to_torch.py --ckpt logs/prior/epoch56_step0.msgpack \
      --out prior_torch.pth [--d_latent 32] [--small_model]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--d_latent", type=int, default=32)
    # model-selection plumbing mirrors tools/output_depth_hypothesis_*.py:
    # the serialized tree only deserializes against the matching architecture
    ap.add_argument("--backbone", default="resnext101_32x8d")
    ap.add_argument("--version", default="v2",
                    help="encoder AdaIn taps v2/v3 (cimle_version=enc) or "
                         "decoder tap schedule v2-v6 (cimle_version=dec)")
    ap.add_argument("--cimle_version", default="enc", choices=["enc", "dec"])
    ap.add_argument("--small_model", action="store_true")
    ap.add_argument("--image_size", type=int, default=448)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch
    from flax import serialization

    from scade_tpu.prior.model import backbone_config, init_prior
    from scade_tpu.prior.translate import params_to_torch_state_dict

    cfg = backbone_config(args.backbone, d_latent=args.d_latent)
    if args.small_model:
        cfg = cfg.with_small()
    model, variables = init_prior(
        jax.random.PRNGKey(0), cfg,
        image_size=(args.image_size, args.image_size),
        version=args.version, cimle_version=args.cimle_version,
    )
    with open(args.ckpt, "rb") as fp:
        variables = serialization.from_bytes(variables, fp.read())

    map_kwargs = (
        {"version": args.version}
        if args.cimle_version == "enc"
        else {"dec_version": args.version}
    )
    sd = params_to_torch_state_dict(
        variables["params"], variables["batch_stats"], cfg, **map_kwargs
    )
    torch.save(
        {"model_state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
        args.out,
    )
    print(f"wrote {args.out}: {len(sd)} tensors")


if __name__ == "__main__":
    main()
