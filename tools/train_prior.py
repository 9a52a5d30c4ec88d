#!/usr/bin/env python
"""Train the ambiguity-aware cIMLE depth prior on a scene (TPU-native CLI).

Mirrors the reference trainer (reference:
ambiguity_aware_prior/tools/train_single.py): epoch-0 AdaIn stat init →
mean_var_adain.npy, z-recache every --refresh_z epochs, SGD epochs over
(image, cached z), checkpoint every 8 epochs.

Usage:
  python tools/train_prior.py --scene_dir <scene> --log_dir logs/prior \
      --epochs 60 [--d_latent 32] [--batchsize 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--version", default="v2",
                    choices=["v2", "v3", "v4", "v5", "v6"],
                    help="AdaIn flavor: encoder side takes v2|v3 "
                         "(RelDepthModel_cIMLE(version=...)); decoder side "
                         "(--cimle_version dec) takes v2..v6 (Decoder_cIMLE)")
    ap.add_argument("--cimle_version", default="enc", choices=["enc", "dec"],
                    help="where z enters: encoder (shipped path) or decoder "
                         "(RelDepthModel_cIMLE_decoder)")
    ap.add_argument("--backbone", default="resnext101_32x8d",
                    help="encoder zoo entry (network_auxi.py:16-50 factories)")
    ap.add_argument("--loss_mode", default=None,
                    help="criterion substring registry (train_single.py:38); "
                         "default = the reference's full 5-loss mode")
    ap.add_argument("--use_scheduler", action="store_true",
                    help="WarmupMultiStepLR (lr_scheduler_custom.py:14-55)")
    ap.add_argument("--lr_scheduler_multiepochs", type=int, nargs="+",
                    default=None, help="milestones in STEPS for the scheduler")
    ap.add_argument("--scale_decoder_lr", type=float, default=1.0,
                    help="decoder LR multiplier (cfg.TRAIN.SCALE_DECODER_LR)")
    ap.add_argument("--only_output_adain_init", action="store_true",
                    help="compute + save mean_var_adain.npy, then exit "
                         "(train_single.py --only_output_adain_init)")
    ap.add_argument("--check_init", action="store_true",
                    help="after AdaIn init, write the raw rgb + a rainbow "
                         "depth map per z-draw for the first batch to "
                         "log_dir, then exit (train_single.py CHECK_INIT "
                         "debug block :417-468)")
    ap.add_argument("--debug_mode", action="store_true",
                    help="skip the expensive z-recache and train with "
                         "zero z-codes (train_single.py --debug_mode "
                         ":392,500-502)")
    # pretraining input: taskonomy-style annotations corpora instead of a
    # single scene (reference --dataset multi --dataroot --dataset_list)
    ap.add_argument("--dataset", default="scene", choices=["scene", "multi"])
    ap.add_argument("--dataroot", default=None,
                    help="(--dataset multi) corpora root")
    ap.add_argument("--dataset_list", nargs="+", default=["taskonomy"],
                    help="(--dataset multi) dataset names under dataroot")
    ap.add_argument("--phase_anno", default="train",
                    help="(--dataset multi) annotations file prefix")
    ap.add_argument("--sample_ratio", type=float, default=1.0)
    ap.add_argument("--scene_dir", default=None,
                    help="scene root containing train/ + transforms_train.json "
                         "(required for --dataset scene)")
    ap.add_argument("--log_dir", default="logs/prior")
    ap.add_argument("--dataset_name", default="scannet")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batchsize", type=int, default=4)
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--base_lr", type=float, default=1e-3)
    ap.add_argument("--mlp_lr", type=float, default=1e-3)
    ap.add_argument("--refresh_z", type=int, default=10)
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--mini_batch_size", type=int, default=5)
    ap.add_argument("--adain_subset", type=int, default=100)
    ap.add_argument("--pretrain_mlp_epochs", type=int, default=0,
                    help="train only the AdaIn style MLPs for the first N "
                         "epochs (reference PRETRAIN_MLP)")
    ap.add_argument("--seed_num", type=int, default=0)
    ap.add_argument("--loss_jsonl", default=None,
                    help="append RAW per-step criterion losses as JSONL "
                         "(one record per SGD step) — the head-to-head "
                         "trajectory artifact matching "
                         "run_reference_prior_training.py's patched "
                         "TrainingStats capture")
    ap.add_argument("--small_model", action="store_true",
                    help="tiny ResNeXt variant (tests only)")
    ap.add_argument("--ckpt", default=None, help="resume/finetune checkpoint")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard the image batch (and z-codes) over all "
                         "devices on a mesh data axis; --batchsize must "
                         "be divisible by the device count")
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--precision", default="ambient",
                    choices=["highest", "high", "bfloat16", "tensorfloat32",
                             "ambient"],
                    help="matmul/conv precision (params/accumulation stay "
                         "f32). bfloat16 measures ~3x on this chip "
                         "(BASELINE.md r3); the conservative default keeps "
                         "the ambient JAX setting")
    ap.add_argument("--compute_dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="mixed-precision compute: fwd/bwd in this dtype "
                         "with f32 master params and optimizer state "
                         "(PriorTrainConfig.compute_dtype); BN batch stats "
                         "stay f32 inside flax")
    args = ap.parse_args()

    if os.environ.get("SCADE_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

    import jax

    if args.precision != "ambient":
        jax.config.update("jax_default_matmul_precision", args.precision)
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from scade_tpu.prior.data import FinetuneDataset, collate
    from scade_tpu.prior.model import (
        backbone_config,
        init_prior,
        zero_shifts_for,
    )
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        compute_adain_stats,
        load_mean_var_adain,
        make_prior_optimizer,
        make_train_step,
        make_train_step_dp,
        recache_z,
    )

    os.makedirs(args.log_dir, exist_ok=True)
    cfg = backbone_config(args.backbone, d_latent=args.d_latent)
    if args.small_model:
        cfg = cfg.with_small()
    tc_kwargs = dict(
        base_lr=args.base_lr, mlp_lr=args.mlp_lr,
        num_samples=args.num_samples, mini_batch_size=args.mini_batch_size,
        refresh_z=args.refresh_z, max_epoch=args.epochs,
        batch_size=args.batchsize, d_latent=args.d_latent,
        use_scheduler=args.use_scheduler,
        scale_decoder_lr=args.scale_decoder_lr,
        compute_dtype=args.compute_dtype,
    )
    if args.loss_mode:
        tc_kwargs["loss_mode"] = args.loss_mode
    if args.lr_scheduler_multiepochs:
        tc_kwargs["lr_milestones"] = tuple(args.lr_scheduler_multiepochs)
    tc = PriorTrainConfig(**tc_kwargs)
    key = jax.random.PRNGKey(args.seed_num)

    if args.dataset == "multi":
        # pretraining over annotations corpora: per-source readers, rank-
        # sharded round-robin interleave (reference train_single.py
        # MultipleDataLoaderDistributed path)
        from scade_tpu.prior.multi_data import (
            InterleavedShardedSampler,
            MultiDataset,
            MultipleDataset,
        )

        if not args.dataroot:
            sys.exit("--dataset multi requires --dataroot")
        sources = [
            MultiDataset(args.dataroot, name, args.phase_anno,
                         crop_size=(args.image_size, args.image_size))
            for name in args.dataset_list
        ]
        ds = MultipleDataset(sources)
        sampler = InterleavedShardedSampler(
            ds, num_replicas=jax.process_count(), rank=jax.process_index(),
            sample_ratio=args.sample_ratio,
            rng=np.random.default_rng(args.seed_num),
        )

        def collate_fn(items):
            out = {}
            for k in ("rgb", "depth", "disp", "planes"):
                out[k] = np.stack([it[k] for it in items])
            out["planes"] = out["planes"].astype(np.int32)
            out["focal_length"] = np.array(
                [it["focal_length"] for it in items], np.float32
            )
            out["quality_flg"] = np.array(
                [int(it["quality_flg"]) for it in items], np.int32
            )
            return out

        # freeze one sampler order per z-recache cycle: the cached z's are
        # positional, so SGD epochs must visit examples in the same order
        # they were cached (the reference zips (dataset, z) — ZippedDataset)
        order = {"idx": list(iter(sampler))}

        def reshuffle():
            order["idx"] = list(iter(sampler))

        def batches(bs, limit=None):
            idx = order["idx"]
            if limit is not None:
                idx = idx[:limit]
            for s in range(0, len(idx), bs):
                yield collate_fn([ds[i] for i in idx[s : s + bs]])

        n_examples = len(sampler)
    else:
        if not args.scene_dir:
            sys.exit("--dataset scene requires --scene_dir")
        ds = FinetuneDataset(
            os.path.join(args.scene_dir, "train"), args.dataset_name,
            crop_size=(args.image_size, args.image_size),
        )

        def batches(bs, limit=None):
            n = len(ds) if limit is None else min(limit, len(ds))
            for s in range(0, n, bs):
                yield collate([ds[i] for i in range(s, min(s + bs, n))])

        def reshuffle():
            pass

        n_examples = len(ds)
    print(f"{n_examples} training examples")

    key, k_init = jax.random.split(key)
    model, variables = init_prior(
        k_init, cfg, image_size=(args.image_size, args.image_size),
        version=args.version, cimle_version=args.cimle_version,
    )
    if args.ckpt:
        with open(args.ckpt, "rb") as fp:
            variables = serialization.from_bytes(variables, fp.read())
        print(f"restored {args.ckpt}")

    opt = make_prior_optimizer(variables["params"], tc)
    opt_state = opt.init(variables["params"])
    n_data = 1
    if args.data_parallel:
        from scade_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        n_data = mesh.devices.shape[0]
        if args.batchsize % n_data:
            raise SystemExit(f"--batchsize {args.batchsize} not divisible "
                             f"by the {n_data}-device data axis")
        print(f"data-parallel over {n_data} devices")
        make_step = lambda o: make_train_step_dp(model, tc, o, mesh)
    else:
        make_step = lambda o: make_train_step(model, tc, o)
    step_fn = make_step(opt)
    if args.pretrain_mlp_epochs > 0:
        pre_opt = make_prior_optimizer(variables["params"], tc, fixed_backbone=True)
        pre_opt_state = pre_opt.init(variables["params"])
        pre_step_fn = make_step(pre_opt)

    shifts = zero_shifts_for(model)
    mv_path = os.path.join(args.log_dir, "mean_var_adain.npy")
    selected_z = None
    jsonl_step = [0]  # global SGD-step counter for --loss_jsonl records
    for epoch in range(args.epochs):
        if epoch == 0:
            print("Initializing AdaIn layers")
            key, k = jax.random.split(key)
            shifts = compute_adain_stats(
                model, variables, batches(1, args.adain_subset), k,
                args.d_latent, tc.mini_batch_size, out_path=mv_path,
            )
            shifts = load_mean_var_adain(mv_path)
            print("AdaIn weights init done.")
            if args.only_output_adain_init:
                print(f"--only_output_adain_init: wrote {mv_path}, exiting")
                return
            if args.check_init:
                # sanity render of the freshly-initialized model: raw rgb +
                # mini_batch_size rainbow depth maps for the first batch,
                # then exit (reference train_single.py:417-468 CHECK_INIT)
                import cv2
                import jax.numpy as jnp
                import matplotlib

                from scade_tpu.prior.model import prior_inference

                batch0 = next(iter(batches(1)))
                rgb0 = np.asarray(batch0["rgb"][0])
                rgb_img = 255 * (rgb0 - rgb0.min()) / (
                    rgb0.max() - rgb0.min() + 1e-12
                )
                cv2.imwrite(os.path.join(args.log_dir, "image0-raw.png"),
                            rgb_img.astype(np.uint8))
                key, k = jax.random.split(key)
                z = jax.random.normal(
                    k, (tc.mini_batch_size, args.d_latent), jnp.float32
                )
                rgb_rep = jnp.repeat(
                    jnp.asarray(batch0["rgb"][:1]), tc.mini_batch_size, 0
                )
                pred = np.asarray(prior_inference(
                    model, variables, shifts, rgb_rep, z, rescaled=False
                ))
                cmap = matplotlib.colormaps["rainbow"]
                for s in range(tc.mini_batch_size):
                    d = pred[s].squeeze()
                    d = (d - d.min()) / (d.max() - d.min() + 1e-12)
                    img = (cmap(d)[..., :3][..., ::-1] * 255).astype(np.uint8)
                    cv2.imwrite(
                        os.path.join(args.log_dir, f"image0_0_{s}-depth.png"),
                        img,
                    )
                print("Done with debug block.")
                return

        if args.debug_mode:
            # caching takes time; debug with zero z-codes
            # (train_single.py:500-502)
            if selected_z is None:
                n_total = sum(
                    b["rgb"].shape[0] for b in batches(args.batchsize)
                )
                selected_z = np.zeros((n_total, args.d_latent), np.float32)
        elif epoch % tc.refresh_z == 0:
            print("Recaching z-codes...")
            reshuffle()  # new visit order; z's are cached in this order
            key, k = jax.random.split(key)
            selected_z = recache_z(
                model, variables, shifts, tc, batches(args.batchsize), k
            )
            print(f"cached z: {selected_z.shape}")

        epoch_losses = []
        epoch_loss_dicts = []
        idx = 0
        for batch in batches(args.batchsize):
            import jax.numpy as jnp

            B = batch["rgb"].shape[0]
            z = jnp.asarray(selected_z[idx : idx + B])
            idx += B
            if args.data_parallel and B % n_data:
                continue  # drop the uneven remainder batch: the sharded
                # leading axis must divide the data-axis size
            key, k = jax.random.split(key)
            if args.pretrain_mlp_epochs > 0 and epoch < args.pretrain_mlp_epochs:
                params, batch_stats, pre_opt_state, total, loss_dict = pre_step_fn(
                    variables["params"], variables["batch_stats"], pre_opt_state,
                    shifts, {k2: jnp.asarray(v) for k2, v in batch.items()}, z, k,
                )
            else:
                params, batch_stats, opt_state, total, loss_dict = step_fn(
                    variables["params"], variables["batch_stats"], opt_state,
                    shifts, {k2: jnp.asarray(v) for k2, v in batch.items()}, z, k,
                )
            variables = {"params": params, "batch_stats": batch_stats}
            # keep the loss as a device scalar: float() here would force a
            # tunnel round trip EVERY step (deferred execution, ~40-80 ms)
            epoch_losses.append(total)
            if args.loss_jsonl:
                epoch_loss_dicts.append(loss_dict)
        if args.loss_jsonl and epoch_loss_dicts:
            # one fetch per epoch (not per step): stack device scalars, then
            # materialize; step numbering is global like the reference's
            import json

            import jax.numpy as jnp

            keys2 = sorted(epoch_loss_dicts[0])
            stacked = np.asarray(jnp.stack(
                [jnp.stack([ld[k2] for k2 in keys2])
                 for ld in epoch_loss_dicts]
            ))
            with open(args.loss_jsonl, "a") as fp:
                for row in stacked:
                    rec = {"step": jsonl_step[0], "epoch": epoch}
                    rec.update({k2: float(v) for k2, v in zip(keys2, row)})
                    fp.write(json.dumps(rec) + "\n")
                    jsonl_step[0] += 1
        if epoch_losses:
            print(f"Epoch {epoch}/{args.epochs}: loss "
                  f"{np.asarray(jnp.stack(epoch_losses)).mean():.5f}")
        else:
            print(
                f"Epoch {epoch}/{args.epochs}: NO trainable batches — the "
                f"loader yielded nothing, or every batch was a remainder "
                f"not divisible by the {n_data}-device data axis"
            )

        if epoch % 8 == 0 or epoch == args.epochs - 1:
            path = os.path.join(args.log_dir, f"epoch{epoch}_step0.msgpack")
            with open(path, "wb") as fp:
                fp.write(serialization.to_bytes(variables))
            print(f"saved {path}")


if __name__ == "__main__":
    main()
