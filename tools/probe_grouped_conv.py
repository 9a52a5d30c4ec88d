"""Microbench: why is ResNeXt layer1 (112x112, 256ch, groups=32) slow?

Times layer1's three convs separately and A/Bs grouped-conv formulations:
feature_group_count (flax default), per-group batched einsum, and a dense
3x3 for reference. Run: python tools/probe_grouped_conv.py [--batch 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from tools.bench_prior import make_timer


def timed(timer, label, fn, x, w, gflop):
    def chain(salt, x, w, k):
        def body(acc, i):
            out = fn(x + (salt * 1e-9) * i + acc * 0.0, w)
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return acc

    def make_chain(k):
        f = jax.jit(lambda salt, x, w: chain(salt, x, w, k))
        return lambda salt: f(salt, x, w)

    dt = timer(make_chain, label)
    print(f"{'':42s} {gflop / dt / 1e3:8.2f} TFLOP/s ({gflop:.1f} GFLOP)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    dt_ = jnp.dtype(args.dtype)

    B, H, G = args.batch, 112, 32
    timer = make_timer(args.iters, ks=(2, 8))
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    x64 = jax.random.normal(k1, (B, H, H, 64), dt_)
    x256 = jax.random.normal(k2, (B, H, H, 256), dt_)
    w11a = jax.random.normal(k3, (1, 1, 64, 256), dt_) * 0.05
    w11b = jax.random.normal(k3, (1, 1, 256, 256), dt_) * 0.05
    wg = jax.random.normal(k4, (3, 3, 8, 256), dt_) * 0.05  # grouped: in/g
    wd = jax.random.normal(k4, (3, 3, 256, 256), dt_) * 0.05

    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(w.shape[0] // 2,) * 2] * 2,
            dimension_numbers=dn, feature_group_count=groups)

    gf = lambda cin, cout, kk: B * H * H * cin * cout * kk * kk * 2 / 1e9

    timed(timer, "1x1 64->256", lambda x, w: conv(x, w), x64, w11a,
          gf(64, 256, 1))
    timed(timer, "1x1 256->256", lambda x, w: conv(x, w), x256, w11b,
          gf(256, 256, 1))
    timed(timer, "3x3 grouped(32) 256->256 [fgc]",
          lambda x, w: conv(x, w, G), x256, wg, gf(8, 256, 3))
    timed(timer, "3x3 dense 256->256", lambda x, w: conv(x, w), x256, wd,
          gf(256, 256, 3))

    # grouped conv as one dense conv with a block-diagonal kernel: trades
    # 32x the MACs for full-lane MXU utilization
    mask = jnp.kron(jnp.eye(G, dtype=dt_),
                    jnp.ones((8, 8), dt_))  # (256, 256) block-diag
    wbd = wd * mask[None, None]
    timed(timer, "3x3 grouped as block-diag dense",
          lambda x, w: conv(x, w), x256, wbd, gf(8, 256, 3))

    # grouped conv as einsum over groups: im2col-free shift-and-accumulate
    def grouped_einsum(x, w):
        # x: (B,H,W,256) -> (B,H,W,G,8); w: (3,3,8,256) -> (3,3,G,8,8)
        xg = x.reshape(B, H, H, G, 8)
        wg_ = w.reshape(3, 3, 8, G, 8).transpose(0, 1, 3, 2, 4)
        xp = jnp.pad(xg, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        out = 0.0
        for dy in range(3):
            for dx in range(3):
                out = out + jnp.einsum(
                    "bhwgi,gio->bhwgo",
                    jax.lax.dynamic_slice_in_dim(
                        jax.lax.dynamic_slice_in_dim(xp, dy, H, 1), dx, H, 2),
                    wg_[dy, dx])
        return out.reshape(B, H, H, 256)

    timed(timer, "3x3 grouped as shift+batched einsum",
          grouped_einsum, x256, wg, gf(8, 256, 3))

    # elementwise BN+relu pass at this shape (bandwidth floor probe)
    timed(timer, "scale+shift+relu 256ch",
          lambda x, w: jax.nn.relu(x * 1.01 + 0.01), x256, w11b,
          B * H * H * 256 * 2 / 1e9)


if __name__ == "__main__":
    main()
