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
