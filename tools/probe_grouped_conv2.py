"""Grouped-conv formulation shootout at ResNeXt101-32x8d's real shapes.

Contenders per shape (B=5, f32 activations, bf16 matmul precision):
  fgc      — lax.conv feature_group_count (flax default)
  blockdiag— dense conv with block-diagonal kernel (32x FLOPs, full lanes)
  einsum   — 9x shift + batched (g,i,o) einsum
  im2col   — patches (M, g, 72) x (g, 72, 8) batched matmul

Run: python tools/probe_grouped_conv2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from tools.bench_prior import slope_time  # shared chained-scan protocol

jax.config.update("jax_default_matmul_precision", "bfloat16")

DN = ("NHWC", "HWIO", "NHWC")



def main():
    B, G = 5, 32
    key = jax.random.key(0)

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, DN),
            feature_group_count=groups)

    for H, C in ((112, 256), (56, 512), (28, 1024)):
        cg = C // G
        k1, k2 = jax.random.split(jax.random.fold_in(key, H))
        x = jax.random.normal(k1, (B, H, H, C), jnp.float32)
        wg = jax.random.normal(k2, (3, 3, cg, C), jnp.float32) * 0.05
        # scatter the grouped kernel into a block-diagonal dense kernel:
        # wbd[ky,kx, g*cg+i, o] = wg[ky,kx,i,o] where g = o // cg
        wg_r = wg.reshape(3, 3, cg, G, cg)  # [ky,kx,i,go,oc]
        eye = jnp.eye(G)
        wbd = jnp.einsum("xyigo,hg->xyhigo", wg_r, eye).reshape(3, 3, C, C)
        gf = B * H * H * C * cg * 9 * 2 / 1e9

        def f_fgc(x, w):
            return conv(x, w, G)

        def f_bd(x, w):
            return conv(x, w)

        def f_einsum(x, w):
            xg = x.reshape(B, H, H, G, cg)
            wg_ = w.reshape(3, 3, cg, G, cg).transpose(0, 1, 3, 2, 4)
            xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
            out = 0.0
            for dy in range(3):
                for dx in range(3):
                    out = out + jnp.einsum(
                        "bhwgi,gio->bhwgo", xp[:, dy:dy + H, dx:dx + H],
                        wg_[dy, dx])
            return out.reshape(B, H, H, C)

        def f_im2col(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, dy:dy + H, dx:dx + H].reshape(B, H, H, G, cg)
                 for dy in range(3) for dx in range(3)], axis=-1
            )  # (B,H,W,G,9cg) tap-major
            wt = (w.reshape(3 * 3, cg, G, cg)
                  .transpose(2, 0, 1, 3)
                  .reshape(G, 9 * cg, cg))
            out = jnp.einsum("bhwgk,gko->bhwgo", cols, wt)
            return out.reshape(B, H, H, C)

        rows = [("fgc", f_fgc, wg), ("blockdiag", f_bd, wbd),
                ("einsum", f_einsum, wg), ("im2col", f_im2col, wg)]
        # correctness cross-check (fgc as oracle)
        ref = np.asarray(f_fgc(x, wg))
        for name, f, w in rows[1:]:
            got = np.asarray(f(x, w))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            assert err < 2e-2, (name, err)  # bf16 matmul tolerance

        print(f"== {H}x{H} x{C} g32 (grouped {gf:.1f} GFLOP) ==", flush=True)
        for name, f, w in rows:
            ms = slope_time(f, x, w)
            print(f"  {name:10s} {ms:7.2f} ms  {gf / ms:7.2f} TFLOP/s-eff",
                  flush=True)


if __name__ == "__main__":
    main()
