"""Probe the prior SGD train step under PRODUCT conditions: repeated calls
of one jitted step (the way train_prior.py actually runs), not a
scan-chain. The scan-chain protocol carries the 466 MB (params, momentum)
pytree as a lax.scan carry, whose double-buffering can charge a full
state copy to every iteration — this probe separates that artifact from
real optimizer cost, and A/Bs buffer donation and the global-norm clip.

Timing: N back-to-back dispatches accumulating a host-side float list of
device scalars, fetched ONCE at the end (np.asarray of the summed scalar)
— per-call tunnel latency is overlapped by async dispatch, matching the
sustained rate a training loop sees.

Usage: python tools/probe_prior_step.py [--batch 5] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--precision", default="bfloat16")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", args.precision)

    from scade_tpu.prior.model import DepthModelCIMLE, PriorConfig, zero_shifts

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)
    target = jax.random.normal(jax.random.fold_in(key, 2), (B, S, S, 1))

    print("initializing model ...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), x[:1], z[:1], shifts,
                           train=False)

    def make_step(tx, donate):
        def step(params, batch_stats, opt_state, x):
            def loss_fn(p):
                out, new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, z, shifts,
                    train=True, mutable=["batch_stats"])
                return jnp.abs(out - target).mean(), new_vars["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, new_opt, loss

        if donate:
            return jax.jit(step, donate_argnums=(0, 1, 2))
        return jax.jit(step)

    def bench(label, tx, donate):
        step = make_step(tx, donate)
        params = jax.tree.map(jnp.copy, variables["params"])
        stats = jax.tree.map(jnp.copy, variables["batch_stats"])
        opt_state = tx.init(params)
        # compile + warm
        params, stats, opt_state, l = step(params, stats, opt_state, x)
        np.asarray(l)
        params, stats, opt_state, l = step(params, stats, opt_state, x)
        np.asarray(l)
        t0 = time.perf_counter()
        acc = None
        for i in range(args.iters):
            params, stats, opt_state, l = step(
                params, stats, opt_state, x + 1e-9 * i)
            acc = l if acc is None else acc + l
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:44s} {dt * 1e3:8.1f} ms/step = "
              f"{B / dt:6.1f} img/s", flush=True)
        return dt

    clip_sgd = optax.chain(optax.clip_by_global_norm(10.0),
                           optax.sgd(1e-3, momentum=0.9))
    sgd_only = optax.sgd(1e-3, momentum=0.9)

    bench(f"per-call step clip+sgd       (B={B})", clip_sgd, donate=False)
    bench(f"per-call step clip+sgd DONATED", clip_sgd, donate=True)
    bench(f"per-call step sgd-only DONATED", sgd_only, donate=True)


if __name__ == "__main__":
    main()
