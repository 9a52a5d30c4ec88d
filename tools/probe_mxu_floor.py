"""Attribute the render's MLP compute floor (VERDICT r3 next-round #5).

The r3 all-live mlp-only floor is 233.8k rays/s × 403 MFLOP/ray ≈ 94
TFLOP/s effective — against a nominal ~197 TFLOP/s v5e bf16 peak. This
probe measures, in ONE session (so attachment variance cancels):

1. big-matmul ceiling: (65536, 2048) @ (2048, 2048) x4 chained — the
   practical peak through this attachment;
2. the renderer's actual MLP shape: 8-layer width-256 chains at several
   batch sizes — W=256 MXU occupancy (a 256-wide matmul uses 2 of the
   8 128x128 MXU tiles per pass unless XLA batches them);
3. the same chain at widths 128/256/512/1024 — how much of the gap is
   width, how much is the chain's serial dependency;
4. W=256 with the PE-embedded input width (63) — the first layer's
   skinny-K penalty.

All timings host-materialize one scalar; chained-scan slope removes
per-call latency (protocol: tools/bench_prior.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from bench_prior import make_timer  # noqa: E402


def chain_flops_probe(timer, batch, width, depth, k_in=None, label=""):
    key = jax.random.PRNGKey(0)
    k_in = k_in or width
    x = jax.random.normal(key, (batch, k_in), jnp.bfloat16) * 0.1
    ws = [jax.random.normal(jax.random.fold_in(key, i),
                            (k_in if i == 0 else width, width),
                            jnp.bfloat16) * 0.05
          for i in range(depth)]

    def apply(xx, ws):
        h = xx
        for w in ws:
            h = jnp.maximum(h @ w, 0.0)
        return h

    def make(k):
        @jax.jit
        def f(salt, x, ws):
            def body(acc, i):
                out = apply(x + (salt * 1e-9 * i + acc * 0.0).astype(x.dtype),
                            ws)
                return acc + jnp.sum(out).astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc

        return lambda salt: f(salt, x, ws)

    dt = timer(make, label or f"chain B={batch} W={width} D={depth} K0={k_in}")
    flops = 2 * batch * (k_in * width + (depth - 1) * width * width)
    print(f"{'':42s} = {flops / dt / 1e12:6.1f} TFLOP/s", flush=True)
    return flops / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    timer = make_timer(args.iters)

    # 1. practical ceiling
    chain_flops_probe(timer, 65536, 2048, 4, label="ceiling 65536x2048 D=4")

    # 2-3. the renderer's MLP shape across widths and batches
    for width in (128, 256, 512, 1024):
        chain_flops_probe(timer, 65536, width, 8)
    for batch in (8192, 32768, 131072, 524288):
        chain_flops_probe(timer, batch, 256, 8)

    # 4. the production first layer: PE width 63 into 256
    chain_flops_probe(timer, 131072, 256, 8, k_in=63)


if __name__ == "__main__":
    main()
