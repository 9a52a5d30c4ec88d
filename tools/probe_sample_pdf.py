"""Standalone chained timing of the inverse-CDF lookup at the renderer's
two call-site shapes — separates sample_pdf's intrinsic cost from fusion
interactions inside the full render program (BASELINE.md r3).

Shapes per 65536-ray batch (chunk is irrelevant standalone):
  importance site: bins M=63  (z_mid of 64 coarse), S=128 draws
  P_depth site:    bins M=191 (z_mid of 192 merged), S=128 draws

Variants: masked (VPU reductions), onehot (MXU matmuls), pallas (sweep
kernel — compiles standalone; blocked only under lax.map). Chained-scan
slope timing (the per-call tunnel latency cancels).

Usage: python tools/probe_sample_pdf.py [--rays 65536] [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

if os.environ.get("SCADE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--draws", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--ks", type=int, nargs=2, default=(2, 8))
    args = ap.parse_args()

    from scade_tpu.ops.fused_sampling import fused_sample_pdf
    from scade_tpu.ops.sampling import sample_pdf_masked, sample_pdf_onehot

    R, S = args.rays, args.draws
    key = jax.random.PRNGKey(0)

    def make_inputs(M):
        kb, kw, ku = jax.random.split(key, 3)
        bins = jnp.sort(jax.random.uniform(kb, (R, M), minval=0.1, maxval=10.0), -1)
        weights = jax.random.uniform(kw, (R, M - 1))
        u = jax.random.uniform(ku, (R, S))
        return bins, weights, u

    def chain(fn, bins, weights, u, k):
        @jax.jit
        def f(salt):
            def body(acc, i):
                s = fn(bins + acc * 0.0, weights, u + salt * 1e-9 * i)
                return acc + jnp.sum(s[:, 0]), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc

        return f

    from scade_tpu.ops.sampling import sample_pdf_bucketed

    impls = {
        "masked": sample_pdf_masked,
        "onehot": sample_pdf_onehot,
        "bucketed": sample_pdf_bucketed,
        "pallas": fused_sample_pdf,
    }
    for M in (63, 191):
        bins, weights, u = make_inputs(M)
        for name, fn in impls.items():
            try:
                ts = []
                for k in args.ks:
                    cf = chain(fn, bins, weights, u, k)
                    np.asarray(cf(jnp.float32(1.0)))
                    np.asarray(cf(jnp.float32(2.0)))
                    t0 = time.perf_counter()
                    for i in range(args.iters):
                        np.asarray(cf(jnp.float32(3.0 + i)))
                    ts.append((time.perf_counter() - t0) / args.iters)
                dt = (ts[1] - ts[0]) / (args.ks[1] - args.ks[0])
                print(f"M={M:3d} {name:8s} {dt * 1e3:7.1f} ms per call "
                      f"({R} rays x {S} draws)", flush=True)
            except Exception as e:  # pragma: no cover
                print(f"M={M:3d} {name:8s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
