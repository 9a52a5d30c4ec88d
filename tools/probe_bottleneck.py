"""Single-Bottleneck variant probe at layer1's shape (112x112, 256ch).

Isolates where the ~24 ms layer1 stage time goes beyond the grouped conv:
flax module vs raw-jnp replica, fgc vs block-diagonal grouped conv, f32 vs
bf16 activations, BN on/off. Run: python tools/probe_bottleneck.py
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

B, H, C, G = 5, 112, 256, 32
CG = C // G



def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, H, H, C), jnp.float32)
    p = {
        "w1": jax.random.normal(ks[1], (1, 1, C, C), jnp.float32) * 0.05,
        "wg": jax.random.normal(ks[2], (3, 3, CG, C), jnp.float32) * 0.05,
        "w3": jax.random.normal(ks[3], (1, 1, C, C), jnp.float32) * 0.05,
        "scale": jnp.ones((3, C)), "shift": jnp.zeros((3, C)),
    }
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w, groups=1, pad=0):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, dn),
            feature_group_count=groups)

    def to_blockdiag(wg):
        wr = wg.reshape(3, 3, CG, G, CG)
        return jnp.einsum("xyigo,hg->xyhigo", wr, jnp.eye(G, dtype=wg.dtype)
                          ).reshape(3, 3, C, C)

    def bn(x, p, i):
        return x * p["scale"][i] + p["shift"][i]

    def raw(x, p, grouped="fgc", use_bn=True, dtype=None):
        if dtype is not None:
            x = x.astype(dtype)
            p = jax.tree.map(lambda a: a.astype(dtype), p)
        idn = x
        y = conv(x, p["w1"])
        y = jax.nn.relu(bn(y, p, 0) if use_bn else y)
        if grouped == "fgc":
            y = conv(y, p["wg"], groups=G, pad=1)
        else:
            y = conv(y, to_blockdiag(p["wg"]), pad=1)
        y = jax.nn.relu(bn(y, p, 1) if use_bn else y)
        y = conv(y, p["w3"])
        y = bn(y, p, 2) if use_bn else y
        return jax.nn.relu(y + idn).astype(jnp.float32)

    variants = [
        ("raw fgc f32", lambda x, p: raw(x, p)),
        ("raw blockdiag f32", lambda x, p: raw(x, p, grouped="bd")),
        ("raw fgc bf16", lambda x, p: raw(x, p, dtype=jnp.bfloat16)),
        ("raw blockdiag bf16",
         lambda x, p: raw(x, p, grouped="bd", dtype=jnp.bfloat16)),
        ("raw blockdiag f32 noBN",
         lambda x, p: raw(x, p, grouped="bd", use_bn=False)),
        ("1x1 convs only",
         lambda x, p: jax.nn.relu(conv(conv(x, p["w1"]), p["w3"]) + x)),
    ]
    for name, f in variants:
        ms = slope_time(f, x, p)
        print(f"  {name:28s} {ms:7.2f} ms", flush=True)

    # flax Bottleneck for comparison
    from scade_tpu.prior.blocks import Bottleneck

    mod = Bottleneck(planes=64, stride=1, groups=G, base_width=8,
                     has_downsample=False)
    variables = mod.init(ks[4], x, train=False)

    def flax_fn(x, v):
        return mod.apply(v, x, train=False)

    ms = slope_time(flax_fn, x, variables)
    print(f"  {'flax Bottleneck fgc f32':28s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
