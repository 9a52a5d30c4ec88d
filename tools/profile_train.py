"""Time the full SCADE train step (fwd + bwd + both Adams, on-device batch
gather) at the reference workload shape on the attached chip.

Timings materialize a scalar metric to host (np.asarray) — through the
axon tunnel block_until_ready does not force execution (BASELINE.md).

Usage: python tools/profile_train.py [--n_rand 1024] [--iters 8]
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
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--H", type=int, default=468)
    ap.add_argument("--W", type=int, default=624)
    ap.add_argument("--n_train", type=int, default=16)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from scade_tpu.render.renderer import make_render_config
    from scade_tpu.train.step import (
        SceneTensors,
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    rc = make_render_config(compute_dtype=getattr(jnp, args.dtype))
    tc = TrainConfig(n_rand=args.n_rand)
    H, W, n_train, K = args.H, args.W, args.n_train, args.K

    key = jax.random.PRNGKey(0)
    state = create_train_state(key, rc, tc, n_images=n_train + 2)
    rng = np.random.default_rng(0)
    scene = SceneTensors(
        images=jnp.asarray(rng.uniform(size=(n_train + 2, H, W, 3)), jnp.float32),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_train + 2, 4, 4)),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([W / 2, W / 2, W / 2, H / 2], jnp.float32),
            (n_train + 2, 4),
        ),
        hyps=jnp.asarray(
            rng.uniform(1.0, 5.0, size=(n_train, K, H, W, 1)), jnp.float32
        ),
        near=jnp.float32(0.1),
        far=jnp.float32(10.0),
        bb_center=jnp.zeros((3,), jnp.float32),
        bb_scale=jnp.float32(0.5),
    )
    step = make_train_step(rc, tc, H, W, n_train, donate=False)

    def run(i):
        _, metrics = step(state, scene, jax.random.PRNGKey(i))
        return np.asarray(metrics["loss"])

    print("compiling ...", flush=True)
    run(0)
    run(1)
    t0 = time.perf_counter()
    for i in range(args.iters):
        run(2 + i)
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"train step ({args.n_rand} rays, 64+128+128 samples, K={K}, "
        f"{args.dtype}): {dt * 1e3:.1f} ms/step "
        f"→ 500k iters in {dt * 500000 / 3600:.2f} h", flush=True,
    )


if __name__ == "__main__":
    main()
