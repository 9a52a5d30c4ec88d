"""Attribute the render's MLP compute floor (VERDICT r3 next-round #5).

The r3 all-live mlp-only floor is 233.8k rays/s × 403 MFLOP/ray ≈ 94
TFLOP/s effective. The first run of this probe showed the round-1
"47 TFLOP/s practical ceiling" was a PER-CALL-LATENCY artifact: the
chained-slope ceiling measures ~200+ TFLOP/s (the actual v5e bf16 peak
is 197), so the floor attribution question becomes: where does the
MLP path lose its ~2x against pure-matmul speed?

Leading hypothesis: activation DTYPE. The renderer runs f32 activations
with bf16 MATMUL PRECISION (inputs are converted per-matmul, outputs
written back f32) — at W=256 the working set is bandwidth-heavy and f32
doubles every HBM byte. This probe A/Bs pure-bf16 vs f32-activations+
bf16-precision chains at the renderer's shapes.

Timing: chained-scan slope with per-shape chain lengths sized so each
chain body is >= ~80 ms of estimated work (short chains drown in
dispatch noise — the first run measured NEGATIVE slopes on sub-ms
bodies).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from bench_prior import make_timer  # noqa: E402


def chain_flops_probe(timer_factory, batch, width, depth, k_in=None,
                      act_dtype=jnp.bfloat16, matmul_bf16=True, label="",
                      iters=4):
    key = jax.random.PRNGKey(0)
    k_in = k_in or width
    x = (jax.random.normal(key, (batch, k_in)) * 0.1).astype(act_dtype)
    ws = [(jax.random.normal(jax.random.fold_in(key, i),
                             (k_in if i == 0 else width, width)) * 0.05
           ).astype(act_dtype)
          for i in range(depth)]
    prec = "bfloat16" if matmul_bf16 else "highest"

    def apply(xx, ws):
        h = xx
        with jax.default_matmul_precision(prec):
            for w in ws:
                h = jnp.maximum(h @ w, 0.0)
        return h

    flops = 2 * batch * (k_in * width + (depth - 1) * width * width)
    # size the chain so one body is >= ~80 ms of work at an assumed
    # 150 TFLOP/s (slope noise through the tunnel is ~1-2 ms)
    est_s = flops / 150e12
    k0 = max(2, int(0.08 / est_s))
    ks = (k0, 4 * k0)

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

    timer = make_timer(iters, ks=ks)
    dt = timer(make, label or
               f"B={batch} W={width} D={depth} K0={k_in} "
               f"act={jnp.dtype(act_dtype).name} ks={ks}")
    print(f"{'':42s} = {flops / dt / 1e12:6.1f} TFLOP/s", flush=True)
    return flops / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--k0_sweep", action="store_true",
                    help="only sweep the first-layer input width K0 "
                         "(production PE width 57, the r4-probed 63, and "
                         "lane-aligned 64/128/256) — the VERDICT r4 #2 "
                         "alignment question")
    args = ap.parse_args()

    if args.k0_sweep:
        for k0 in (57, 63, 64, 128, 256):
            chain_flops_probe(None, 131072, 256, 8, k_in=k0,
                              iters=args.iters)
        return

    # 1. practical ceiling (pure bf16)
    chain_flops_probe(None, 65536, 2048, 4, iters=args.iters,
                      label="ceiling 65536x2048 D=4 bf16")

    # 2. the renderer's MLP shape: pure bf16 vs the production scheme
    #    (f32 activations + bf16 matmul precision)
    for act, mm, tag in ((jnp.bfloat16, True, "bf16 act"),
                         (jnp.float32, True, "f32 act + bf16 mm"),
                         (jnp.float32, False, "f32 act + f32 mm")):
        chain_flops_probe(None, 131072, 256, 8, act_dtype=act,
                          matmul_bf16=mm, iters=args.iters,
                          label=f"W=256 D=8 B=131072 [{tag}]")

    # 3. width sweep at pure bf16 (reliable chain lengths)
    for width in (128, 256, 512, 1024):
        chain_flops_probe(None, 131072, width, 8, iters=args.iters)

    # 4. batch (chunk-size) sweep at W=256 pure bf16: the renderer tiles
    #    at chunk=8192 rays x 256 samples = ~2M points, but per lax.map
    #    step the MLP batch is chunk*samples
    for batch in (32768, 131072, 524288, 2097152):
        chain_flops_probe(None, batch, 256, 8, iters=args.iters)

    # 5. the production first layer: PE width 63 into 256
    chain_flops_probe(None, 131072, 256, 8, k_in=63, iters=args.iters)


if __name__ == "__main__":
    main()
