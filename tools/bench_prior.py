"""Prior-side TPU benchmark: ResNeXt101+AdaIn cIMLE forward (the hypothesis
-dump hot loop, reference output_depth_hypothesis_scannet.py:415-488) and
the SGD train step, at the production 448x448 shape.

Timings materialize outputs to host (np.asarray) — block_until_ready does
not force execution through the axon tunnel (BASELINE.md).

Usage: python tools/bench_prior.py [--batch 5] [--precision bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def ablate(args, model, variables, shifts, x, z, timeit):
    """Attribute the prior's ~3% MFU (VERDICT r2 weak #2): where does the
    time go (encoder vs decoder), what does precision buy, and how bad are
    the ResNeXt grouped convs on the MXU vs an equivalent dense conv."""
    from scade_tpu.prior.model import ResNeXtCIMLE, Decoder

    cfg = model.cfg
    enc = ResNeXtCIMLE(cfg, adain_version="v2")
    dec = Decoder(cfg)
    v_enc = {"params": variables["params"]["encoder"],
             "batch_stats": variables["batch_stats"]["encoder"]}
    v_dec = {"params": variables["params"]["decoder"],
             "batch_stats": variables["batch_stats"]["decoder"]}

    for prec in ("highest", "bfloat16"):
        with jax.default_matmul_precision(prec):
            full = jax.jit(
                lambda v, x, z: model.apply(v, x, z, shifts, train=False)
            )
            dt = timeit(full, variables, x, z)
            print(f"full fwd   [{prec:8s}]: {dt * 1e3:7.1f} ms "
                  f"({args.batch / dt:5.1f} img/s)", flush=True)

            enc_fwd = jax.jit(
                lambda v, x, z: enc.apply(v, x, z, shifts, train=False)[-1]
            )
            dt_e = timeit(enc_fwd, v_enc, x, z)
            print(f"encoder    [{prec:8s}]: {dt_e * 1e3:7.1f} ms", flush=True)

            feats = jax.jit(
                lambda v, x, z: enc.apply(v, x, z, shifts, train=False)
            )(v_enc, x, z)
            feats = jax.tree.map(jnp.asarray, feats)
            dec_fwd = jax.jit(lambda v, f: dec.apply(v, f, train=False))
            dt_d = timeit(dec_fwd, v_dec, feats)
            print(f"decoder    [{prec:8s}]: {dt_d * 1e3:7.1f} ms", flush=True)

    # grouped-conv microbench at the X101 layer2 shape: (B, 56, 56, 512),
    # 3x3, groups=32 (16 ch/group) — the MXU sees 16-wide matmuls
    B = args.batch
    key = jax.random.PRNGKey(1)
    xx = jax.random.normal(key, (B, 56, 56, 512), jnp.float32)
    wg = jax.random.normal(key, (3, 3, 16, 512), jnp.float32) * 0.05
    wd = jax.random.normal(key, (3, 3, 512, 512), jnp.float32) * 0.05
    dn = jax.lax.conv_dimension_numbers(xx.shape, wd.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    for prec in ("highest", "bfloat16"):
        with jax.default_matmul_precision(prec):
            grouped = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=32))
            dense = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn))
            dt_g = timeit(grouped, xx, wg)
            dt_dn = timeit(dense, xx, wd)
            gflop_g = 2 * 9 * 512 * 16 * 56 * 56 * B / 1e9
            gflop_d = 2 * 9 * 512 * 512 * 56 * 56 * B / 1e9
            print(f"conv3x3 56x56x512 [{prec:8s}]: grouped(32) "
                  f"{dt_g * 1e3:6.1f} ms ({gflop_g / dt_g:6.0f} GFLOP/s)  "
                  f"dense {dt_dn * 1e3:6.1f} ms "
                  f"({gflop_d / dt_dn:6.0f} GFLOP/s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5,
                    help="z minibatch size (reference draws 20 z in "
                         "minibatches of 5, :482-488)")
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--precision", default=None,
                    choices=["highest", "high", "bfloat16", "tensorfloat32"],
                    help="matmul/conv precision on the MXU; bfloat16 is the "
                         "fast path (params/activations stay f32); default "
                         "leaves the JAX ambient setting")
    ap.add_argument("--ablate", action="store_true",
                    help="attribution mode: encoder vs decoder, grouped-vs-"
                         "dense conv microbench, f32-vs-bf16 A/B")
    args = ap.parse_args()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)

    from scade_tpu.prior.model import (
        DepthModelCIMLE,
        PriorConfig,
        zero_shifts,
    )

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)

    print("initializing model ...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), x[:1], z[:1], shifts,
                           train=False)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params / 1e6:.1f}M", flush=True)

    fwd = jax.jit(lambda v, x, z: model.apply(v, x, z, shifts, train=False))

    def timeit(fn, *a, iters=args.iters):
        np.asarray(fn(*a))[0, 0, 0]  # compile
        np.asarray(fn(*a))[0, 0, 0]  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(fn(*a))[0, 0, 0]
        return (time.perf_counter() - t0) / iters

    if args.ablate:
        ablate(args, model, variables, shifts, x, z, timeit)
        return

    dt = timeit(fwd, variables, x, z)
    img_s = B / dt
    print(f"inference fwd (B={B}, {S}x{S}): {dt * 1e3:.1f} ms "
          f"= {img_s:.1f} img/s", flush=True)
    # the dump loop draws 20 hypotheses per image
    print(f"→ hypothesis dump rate: {img_s / 20:.2f} images/s "
          f"(20 z-draws each)", flush=True)

    # train step: forward + backward + SGD on an ILNR-style masked MAE
    # (the full criterion is data-dependent; the MLP/conv cost dominates)
    import optax

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-3, momentum=0.9))
    opt_state = tx.init(variables["params"])
    target = jax.random.normal(jax.random.fold_in(key, 2), (B, S, S, 1))

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, z, target):
        def loss_fn(p):
            out, new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, z, shifts,
                train=True, mutable=["batch_stats"],
            )
            return jnp.abs(out - target).mean(), new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    params, batch_stats = variables["params"], variables["batch_stats"]

    def step_fn(params, batch_stats, opt_state):
        p, bs, o, loss = train_step(params, batch_stats, opt_state, x, z, target)
        return loss

    np.asarray(step_fn(params, batch_stats, opt_state))  # compile
    np.asarray(step_fn(params, batch_stats, opt_state))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(step_fn(params, batch_stats, opt_state))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step (B={B}): {dt * 1e3:.1f} ms = {B / dt:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
