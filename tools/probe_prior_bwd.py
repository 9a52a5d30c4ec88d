"""Attribute the prior SGD step's BACKWARD cost (VERDICT r3 next-round #2).

The step at B=20 is ~2.8-3x the forward and 'BN-bound' was asserted but
never attributed. Three candidate levers, each probed standalone at the
production shapes with the chained-scan slope protocol
(tools/bench_prior.py):

1. GroupedConv3x3's block-diagonal dense lowering: its forward is 3.4x
   faster than feature_group_count at 112² (BASELINE.md r3), but its
   WGRAD computes a dense (3,3,C,C) kernel gradient — 32x the nominal
   MACs — and then the eye-scatter VJP gathers the block diagonal. The
   fgc wgrad computes only the (3,3,C/g,C) block entries. Conceivably
   dense-fwd + fgc-wgrad is the right hybrid.
2. BatchNorm train-mode statistics: per-channel NHW reductions in fwd
   AND bwd (the VJP re-reduces), ~100 BN layers.
3. The conv dgrad lowerings (dense vs fgc transposed forms).

Usage: python tools/probe_prior_bwd.py [--batch 5] [--dtype bfloat16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from bench_prior import make_timer, perturbed  # noqa: E402  (tools/)


def conv(x, w, groups):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
        feature_group_count=groups,
    )


def blockdiag_kernel(kernel, groups, features):
    cg = kernel.shape[2]
    ocg = features // groups
    wr = kernel.reshape(3, 3, cg, groups, ocg)
    eye = jnp.eye(groups, dtype=kernel.dtype)
    return (eye[None, None, :, None, :, None] * wr[:, :, None]).reshape(
        3, 3, cg * groups, features)


def grad_chain(loss_of, x, w, wrt):
    """chain builder: k dependent evaluations of grad(loss)(x, w)."""

    def make(k):
        @jax.jit
        def f(salt, x, w):
            def body(acc, i):
                xx = perturbed(x, salt, i, acc)
                if wrt == "both":
                    g = jax.grad(loss_of, argnums=(0, 1))(xx, w)
                    s = sum(jnp.sum(t).astype(jnp.float32) for t in g)
                elif wrt == "w":
                    s = jnp.sum(jax.grad(loss_of, argnums=1)(xx, w)).astype(
                        jnp.float32)
                elif wrt == "x":
                    s = jnp.sum(jax.grad(loss_of, argnums=0)(xx, w)).astype(
                        jnp.float32)
                else:  # fwd
                    s = loss_of(xx, w).astype(jnp.float32)
                return acc + s, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc

        return lambda salt: f(salt, x, w)

    return make


def probe_conv_grads(args, timer):
    """fgc vs blockdiag vs hybrid (dense fwd/dgrad + fgc wgrad) at the two
    blockdiag-active shapes."""
    g = 32
    # 28²x1024 is layer3's shape — 23 blocks, kept on the fgc lowering by
    # the H*W >= 56² blockdiag gate; its BACKWARD was never probed.
    for (H, C) in ((112, 256), (56, 512), (28, 1024), (14, 2048)):
        B = args.batch
        key = jax.random.PRNGKey(0)
        x = (jax.random.normal(key, (B, H, H, C)) * 0.1).astype(args.dtype)
        kern = (jax.random.normal(jax.random.fold_in(key, 1),
                                  (3, 3, C // g, C)) * 0.05).astype(args.dtype)

        def loss_fgc(xx, w):
            return jnp.sum(conv(xx, w, g) ** 2)

        def loss_bd(xx, w):
            return jnp.sum(conv(xx, blockdiag_kernel(w, g, C), 1) ** 2)

        @jax.custom_vjp
        def hybrid(xx, w):
            return conv(xx, blockdiag_kernel(w, g, C), 1)

        def hybrid_fwd(xx, w):
            return hybrid(xx, w), (xx, w)

        def hybrid_bwd(res, ct):
            xx, w = res
            # dgrad through the DENSE form (full lanes), wgrad through the
            # fgc form (only the block-diagonal entries are ever needed)
            dx = jax.vjp(lambda a: conv(a, blockdiag_kernel(w, g, C), 1),
                         xx)[1](ct)[0]
            dw = jax.vjp(lambda ww: conv(xx, ww, g), w)[1](ct)[0]
            return dx, dw

        hybrid.defvjp(hybrid_fwd, hybrid_bwd)

        def loss_hy(xx, w):
            return jnp.sum(hybrid(xx, w) ** 2)

        tag = f"{H}²x{C} g{g} B={B} [{args.dtype}]"
        for name, loss in (("fgc", loss_fgc), ("blockdiag", loss_bd),
                           ("hybrid", loss_hy)):
            timer(grad_chain(loss, x, kern, "fwd"), f"{tag} {name} fwd")
            timer(grad_chain(loss, x, kern, "x"), f"{tag} {name} dgrad")
            timer(grad_chain(loss, x, kern, "w"), f"{tag} {name} wgrad")
            timer(grad_chain(loss, x, kern, "both"), f"{tag} {name} d+wgrad")


def probe_bn(args, timer):
    """BN train-mode cost in fwd+bwd at the encoder's big shapes: a stack
    of conv+BN vs conv-only, value_and_grad wrt params."""
    import flax.linen as nn

    for (H, C, n_blocks) in ((112, 256, 3), (56, 512, 4), (28, 1024, 8)):
        B = args.batch

        class Stack(nn.Module):
            use_bn: bool

            @nn.compact
            def __call__(self, x, train=True):
                for _ in range(n_blocks):
                    x = nn.Conv(C, (3, 3), use_bias=False,
                                dtype=args.dtype)(x)
                    if self.use_bn:
                        x = nn.BatchNorm(use_running_average=not train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=args.dtype)(x)
                    x = nn.relu(x)
                return x

        key = jax.random.PRNGKey(0)
        x = (jax.random.normal(key, (B, H, H, C)) * 0.1).astype(args.dtype)
        for use_bn in (True, False):
            m = Stack(use_bn=use_bn)
            variables = m.init(key, x, train=False)
            params = variables["params"]
            bs = variables.get("batch_stats", {})

            def make(k):
                @jax.jit
                def f(salt, params, bs, x):
                    def loss(p, xx):
                        if use_bn:
                            out, _ = m.apply(
                                {"params": p, "batch_stats": bs}, xx,
                                train=True, mutable=["batch_stats"],
                            )
                        else:
                            out = m.apply({"params": p}, xx, train=True)
                        return jnp.sum(out ** 2).astype(jnp.float32)

                    def body(acc, i):
                        xx = perturbed(x, salt, i, acc)
                        l, g = jax.value_and_grad(loss)(params, xx)
                        return acc + l + 1e-30 * sum(
                            jnp.sum(t).astype(jnp.float32)
                            for t in jax.tree.leaves(g)), None

                    acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                          jnp.arange(k))
                    return acc

                return lambda salt: f(salt, params, bs, x)

            timer(make, f"{n_blocks}x[conv{'+bn' if use_bn else '    '}] "
                        f"{H}²x{C} B={B} [{args.dtype}] grad")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip_bn", action="store_true")
    ap.add_argument("--skip_conv", action="store_true")
    args = ap.parse_args()
    args.dtype = jnp.dtype(args.dtype)
    timer = make_timer(args.iters)
    if not args.skip_conv:
        probe_conv_grads(args, timer)
    if not args.skip_bn:
        probe_bn(args, timer)


if __name__ == "__main__":
    main()
