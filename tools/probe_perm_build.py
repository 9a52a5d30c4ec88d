"""Probe the raw primitives for a permutation-based masked_sample.

masked_sample's bucketed inverse-CDF search costs, per call at n=15000
draws over P=448²: a (n, P/512) brute-force first-level compare, an
(n, 512)-row gather (~30 MB), and an (n, 512) second-level compare. A
permutation formulation replaces all three with n SCALAR gathers from a
precomputed "valid pixels first, ascending" permutation — but building
that permutation needs either a (P,) unique-index scatter-set or a (P,)
stable argsort, both of which can lower poorly on TPU. This probe
slope-times each primitive at the PWN-planes shape (B=20 images x 8
planes per image, P=448², n=15000) so the choice is measured, not
guessed (chained-scan protocol; see BASELINE.md round 3 on why).

Usage: python tools/probe_perm_build.py [--iters 6] [--ks 2,8]
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

from scade_tpu.prior.losses import masked_sample

B, K, P, N = 20, 8, 448 * 448, 15000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ks", default="2,8")
    args = ap.parse_args()
    ks = tuple(int(x) for x in args.ks.split(","))

    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(0, K, size=(B, P)), jnp.int32)
    key = jax.random.PRNGKey(0)

    def slope(body, label):
        # body: (carry (B, P) f32, i) -> carry; chained to defeat per-call
        # dispatch latency (results feed the next link)
        def make(k):
            @jax.jit
            def g(salt, pl):
                def scan_body(acc, i):
                    return body(acc, i, pl, salt), None
                acc, _ = jax.lax.scan(
                    scan_body,
                    jnp.zeros((B,), jnp.float32) + salt,
                    jnp.arange(k),
                )
                return jnp.sum(acc)
            return lambda salt: g(salt, planes)
        ts = []
        for k in ks:
            fn = make(k)
            np.asarray(fn(jnp.float32(1.0)))
            np.asarray(fn(jnp.float32(2.0)))
            t0 = time.perf_counter()
            for i in range(args.iters):
                np.asarray(fn(jnp.float32(3.0 + i)))
            ts.append((time.perf_counter() - t0) / args.iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:34s} {dt * 1e3:8.1f} ms", flush=True)

    # every body consumes the carry (salt-perturbed) so links chain and
    # nothing is DCE'd or hoisted as loop-invariant
    def shifted(pl, acc):
        # (B, P) int planes, data-dependent on the carry so XLA cannot
        # hoist the body's work out of the scan
        return (pl + (acc[:, None] > 1e30).astype(jnp.int32)) % (K + 1)

    def body_masked_sample(acc, i, pl, salt):
        # current production path: 8 masked_sample calls per image
        pls = shifted(pl, acc)

        def per_image(a, p):
            def per_plane(j):
                idx, _ = masked_sample(
                    jax.random.fold_in(key, j), p == j + 1, N)
                return jnp.sum(idx)
            s = jnp.sum(jax.vmap(per_plane)(jnp.arange(K)))
            return a + s.astype(jnp.float32) * 1e-12
        return jax.vmap(per_image)(acc, pls)

    def body_scatter_perm(acc, i, pl, salt):
        # counting-sort permutation via unique-index scatter-set
        pls = shifted(pl, acc)

        def per_image(a, p):
            onehot = (p[:, None] == jnp.arange(K + 1)[None, :]).astype(jnp.int32)
            cums = jnp.cumsum(onehot, axis=0)
            counts = cums[-1]
            offsets = jnp.cumsum(counts) - counts
            rank = jnp.take_along_axis(cums, p[:, None], axis=1)[:, 0] - 1
            pos = offsets[p] + rank
            perm = jnp.zeros((P,), jnp.int32).at[pos].set(
                jnp.arange(P, dtype=jnp.int32), unique_indices=True,
                mode="promise_in_bounds")
            def per_plane(j):
                cnt = counts[j + 1]
                u = jax.random.uniform(jax.random.fold_in(key, j), (N,)) \
                    * jnp.maximum(cnt.astype(jnp.float32), 1.0)
                r = u.astype(jnp.int32)
                inner = offsets[j + 1] + jnp.clip(r, 0, jnp.maximum(cnt - 1, 0))
                idx = jnp.where(r >= cnt, P - 1,
                                perm[jnp.minimum(inner, P - 1)])
                return jnp.sum(idx)
            s = jnp.sum(jax.vmap(per_plane)(jnp.arange(K)))
            return a + s.astype(jnp.float32) * 1e-12
        return jax.vmap(per_image)(acc, pls)

    def body_argsort_perm(acc, i, pl, salt):
        # stable argsort by plane id (one sort per image, shared by planes)
        pls = shifted(pl, acc)

        def per_image(a, p):
            perm = jnp.argsort(p, stable=True).astype(jnp.int32)
            onehot = (p[:, None] == jnp.arange(K + 1)[None, :]).astype(jnp.int32)
            counts = jnp.sum(onehot, axis=0)
            offsets = jnp.cumsum(counts) - counts
            def per_plane(j):
                cnt = counts[j + 1]
                u = jax.random.uniform(jax.random.fold_in(key, j), (N,)) \
                    * jnp.maximum(cnt.astype(jnp.float32), 1.0)
                r = u.astype(jnp.int32)
                inner = offsets[j + 1] + jnp.clip(r, 0, jnp.maximum(cnt - 1, 0))
                idx = jnp.where(r >= cnt, P - 1,
                                perm[jnp.minimum(inner, P - 1)])
                return jnp.sum(idx)
            s = jnp.sum(jax.vmap(per_plane)(jnp.arange(K)))
            return a + s.astype(jnp.float32) * 1e-12
        return jax.vmap(per_image)(acc, pls)

    def body_scatter_only(acc, i, pl, salt):
        # isolate the (P,) unique scatter-set (one per image)
        pls = shifted(pl, acc)

        def per_image(a, p):
            pos = jnp.argsort(p, stable=True)  # any permutation as target
            perm = jnp.zeros((P,), jnp.int32).at[pos].set(
                jnp.arange(P, dtype=jnp.int32), unique_indices=True,
                mode="promise_in_bounds")
            return a + jnp.sum(perm[:8]).astype(jnp.float32) * 1e-12
        return jax.vmap(per_image)(acc, pls)

    slope(body_masked_sample, "8x masked_sample (bucketed CDF)")
    slope(body_scatter_perm, "scatter-perm partition + draws")
    slope(body_argsort_perm, "argsort-perm partition + draws")
    slope(body_scatter_only, "argsort + (P,) scatter-set alone")


if __name__ == "__main__":
    main()
