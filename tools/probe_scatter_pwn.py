"""Slope-time the scatter-add strategies available for the PWN losses'
backward (the VJP of the point-pair gathers in pwn_edge_loss /
pwn_plane_loss, reference PWN_edges.py:193-245 / PWN_planes.py:143-176).

The backward of `nf[a]` (nf: (P,3) normal field, a: (n,) sampled pixel
indices) is a scatter-add of the cotangent rows into a zero (P,3) buffer.
Variants probed, all at the production shape (B=20 images vmapped,
P=448², n=18k edge pairs + 6k random pairs per image):

  row          one .at[a].add on the (P,3) buffer per index set (what the
               plain-JAX VJP emits; HEAD behavior)
  scalar       three per-channel .at[a].add into (P,) planes (the
               custom-VJP rewrite that won 1.7x for PWN planes, where the
               payload really is a scalar; for edges the payload is a
               3-vector so this triples the scatter count)
  sorted_row   concatenate both index sets, sort by index (payload rows
               carried), one row scatter with indices_are_sorted=True
  sorted_scalar same sort, three per-channel sorted scalar scatters
  onehot_bucket bucketed matmul scatter: sort indices, then segment the
               sorted stream into P/512 blocks and accumulate each block
               with a (n_blk, 512) one-hot matmul — MXU instead of
               scatter units (skipped by default: needs runtime blocking)

Usage: python tools/probe_scatter_pwn.py [--batch 20]
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
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ks", default="2,8")
    ap.add_argument("--n_pairs", type=int, default=18000)
    args = ap.parse_args()

    B, S, n = args.batch, args.image_size, args.n_pairs
    P = S * S
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(0, P, size=(B, n)), jnp.int32)
    Bi = jnp.asarray(rng.integers(0, P, size=(B, n)), jnp.int32)
    GA = jnp.asarray(rng.normal(size=(B, n, 3)), jnp.float32)  # g * nb
    GB = jnp.asarray(rng.normal(size=(B, n, 3)), jnp.float32)  # g * na
    ks = tuple(int(x) for x in args.ks.split(","))

    def slope(fn, label, *extra):
        def make(k):
            @jax.jit
            def g(salt, a, b, ga, gb):
                def body(acc, i):
                    gai = ga + (salt * 1e-9) * i + acc * 0.0
                    out = fn(a, b, gai, gb)
                    return acc + jnp.sum(out[:, :: P // 127]), None

                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc

            return lambda salt: g(salt, A, Bi, GA, GB)

        ts = []
        for k in ks:
            f = make(k)
            np.asarray(f(jnp.float32(1.0)))
            np.asarray(f(jnp.float32(2.0)))
            t0 = time.perf_counter()
            for i in range(args.iters):
                np.asarray(f(jnp.float32(3.0 + i)))
            ts.append((time.perf_counter() - t0) / args.iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:26s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    def row(a, b, ga, gb):
        def per(a, b, ga, gb):
            buf = jnp.zeros((P, 3), jnp.float32)
            buf = buf.at[a].add(ga)
            buf = buf.at[b].add(gb)
            return buf.reshape(-1)

        return jax.vmap(per)(a, b, ga, gb)

    def scalar(a, b, ga, gb):
        def per(a, b, ga, gb):
            planes = []
            for c in range(3):
                p = jnp.zeros((P,), jnp.float32)
                p = p.at[a].add(ga[:, c])
                p = p.at[b].add(gb[:, c])
                planes.append(p)
            return jnp.stack(planes, -1).reshape(-1)

        return jax.vmap(per)(a, b, ga, gb)

    def sorted_row(a, b, ga, gb):
        def per(a, b, ga, gb):
            idx = jnp.concatenate([a, b])
            val = jnp.concatenate([ga, gb])
            order = jnp.argsort(idx)
            idx, val = idx[order], val[order]
            buf = jnp.zeros((P, 3), jnp.float32)
            return buf.at[idx].add(
                val, indices_are_sorted=True
            ).reshape(-1)

        return jax.vmap(per)(a, b, ga, gb)

    def sorted_scalar(a, b, ga, gb):
        def per(a, b, ga, gb):
            idx = jnp.concatenate([a, b])
            val = jnp.concatenate([ga, gb])
            order = jnp.argsort(idx)
            idx, val = idx[order], val[order]
            planes = []
            for c in range(3):
                p = jnp.zeros((P,), jnp.float32)
                p = p.at[idx].add(val[:, c], indices_are_sorted=True)
                planes.append(p)
            return jnp.stack(planes, -1).reshape(-1)

        return jax.vmap(per)(a, b, ga, gb)

    def merged_row(a, b, ga, gb):
        # one scatter instead of two: concat WITHOUT sorting
        def per(a, b, ga, gb):
            idx = jnp.concatenate([a, b])
            val = jnp.concatenate([ga, gb])
            buf = jnp.zeros((P, 3), jnp.float32)
            return buf.at[idx].add(val).reshape(-1)

        return jax.vmap(per)(a, b, ga, gb)

    slope(row, "row (HEAD vjp)")
    slope(scalar, "scalar x3 (WIP vjp)")
    slope(merged_row, "merged row (1 scatter)")
    slope(sorted_row, "sorted row")
    slope(sorted_scalar, "sorted scalar x3")


if __name__ == "__main__":
    main()
