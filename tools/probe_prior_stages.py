"""Per-stage attribution of the ResNeXt101-32x8d encoder at 448x448.

Times each encoder stage STANDALONE at its true input shape (B configurable,
chained-scan slope protocol from tools/bench_prior.py) so the 52-60 ms bf16
encoder forward (BASELINE.md r3) can be attributed: conv1 (3-channel 7x7
stride 2 — a classic MXU lane-underutilization suspect), maxpool, and each
of the 4 Bottleneck stacks. Also A/Bs candidate fixes in isolation.

Usage: python tools/probe_prior_stages.py [--batch 5] [--precision bfloat16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from tools.bench_prior import chain_of, make_timer


class Stage(nn.Module):
    """One ResNeXt layer: `blocks` Bottlenecks, first with stride/downsample."""

    planes: int
    blocks: int
    stride: int
    groups: int = 32
    base_width: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        from scade_tpu.prior.blocks import Bottleneck

        for b in range(self.blocks):
            s = self.stride if b == 0 else 1
            has_ds = b == 0
            x = Bottleneck(
                planes=self.planes, stride=s, groups=self.groups,
                base_width=self.base_width, has_downsample=has_ds,
                name=f"b{b}",
            )(x, train)
        return x


class Conv1(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Conv(64, (7, 7), strides=(2, 2),
                       padding=[(3, 3), (3, 3)], use_bias=False,
                       name="conv1")(x)


class Conv1BnPool(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=True)(x))
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )


def bench_module(timer, label, mod, shape, key, gflop=None, dtype=jnp.float32):
    x = jax.random.normal(key, shape, dtype)
    variables = mod.init(key, x, train=False)

    def apply_fn(xx, vv):
        return mod.apply(vv, xx, train=False)

    dt = timer(lambda k: chain_of(apply_fn, x, k, variables), label)
    if gflop is not None:
        print(f"{'':42s} {gflop / dt / 1e3:8.1f} GFLOP/s "
              f"({gflop:.1f} GFLOP)", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--dtype", default="float32",
                    help="activation/param dtype for the stage probes")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", args.precision)
    dtype = jnp.dtype(args.dtype)

    B = args.batch
    timer = make_timer(args.iters)
    key = jax.random.key(0)

    def bottleneck_gflops(planes, blocks, stride, hw_in, in_ch):
        """FLOPs (multiply+add) for one standalone Stage at B images."""
        width = planes * 4  # 32x8d: planes * (8/64) * 32
        out_ch = planes * 4
        total = 0.0
        h = hw_in
        ch = in_ch
        for b in range(blocks):
            s = stride if b == 0 else 1
            ho = h // s
            # 1x1 in -> width (at input res), grouped 3x3 (stride s),
            # 1x1 width -> out, downsample 1x1 on block 0
            total += h * h * ch * width * 2
            total += ho * ho * width * (width // 32) * 9 * 2
            total += ho * ho * width * out_ch * 2
            if b == 0:
                total += ho * ho * ch * out_ch * 2
            h, ch = ho, out_ch
        return total * B / 1e9

    print(f"== encoder stages standalone, B={B}, 448x448, "
          f"precision={args.precision}, dtype={args.dtype} ==")
    c1_gf = B * 224 * 224 * 64 * 7 * 7 * 3 * 2 / 1e9
    bench_module(timer, "conv1 7x7s2 3->64 @448", Conv1(),
                 (B, 448, 448, 3), key, c1_gf, dtype)
    bench_module(timer, "conv1+bn+relu+maxpool", Conv1BnPool(),
                 (B, 448, 448, 3), key, None, dtype)
    specs = [
        ("layer1 3xBneck(256) @112", 64, 3, 1, 112, 64),
        ("layer2 4xBneck(512) @112->56", 128, 4, 2, 112, 256),
        ("layer3 23xBneck(1024) @56->28", 256, 23, 2, 56, 512),
        ("layer4 3xBneck(2048) @28->14", 512, 3, 2, 28, 1024),
    ]
    total = 0.0
    for label, planes, blocks, stride, hw, in_ch in specs:
        gf = bottleneck_gflops(planes, blocks, stride, hw, in_ch)
        dt = bench_module(
            timer, label, Stage(planes=planes, blocks=blocks, stride=stride),
            (B, hw, hw, in_ch), key, gf, dtype)
        total += dt
    print(f"{'sum of layer stages':42s} {total * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
