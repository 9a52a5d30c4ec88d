"""Attribute the PRODUCT prior train step's loss-suite cost per term.

bench_prior_product measured the product step at 1327 ms (B=20, bf16)
vs 409.5 ms for the proxy-loss step (tools/bench_prior.py) — i.e. the
real criterion (multi_depth_model_auxiv2.py:209-341's five losses) costs
~900 ms, 2.2x the whole ResNeXt fwd+bwd. This probe slope-times each
loss term's forward and forward+grad w.r.t. the (B,448,448,1) predicted
depth directly (no model), which is exactly the marginal cost the train
step pays for it (the model bwd downstream of d(loss)/d(pred) is shared).

Usage: python tools/probe_prior_criterion.py [--batch 20] [--grad]
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


MODES = {
    "plane": "_pairwise-normal-regress-plane_",
    "pwn-edge": "_pairwise-normal-regress-edge_",
    "ilnr": "_meanstd-tanh_",
    "ranking": "_ranking-edge_",
    "msgil": "_msgil-normal_",
    "full": ("_ranking-edge_pairwise-normal-regress-edge_msgil-normal_"
             "meanstd-tanh_pairwise-normal-regress-plane_"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ks", default="2,8")
    ap.add_argument("--terms", default="")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from scade_tpu.prior.losses import criterion, recover_scale_shift_depth

    S, B = args.image_size, args.batch
    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32),
        "depth": jnp.asarray(
            np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32),
        "planes": jnp.asarray(rng.integers(0, 8, size=(B, S, S)), jnp.int32),
        "focal_length": jnp.full((B,), 500.0, jnp.float32),
        "quality_flg": jnp.full((B,), 3, jnp.int32),
    }
    pred = jnp.asarray(np.abs(rng.normal(size=(B, S, S, 1))) + 0.5,
                       jnp.float32)
    key = jax.random.PRNGKey(0)
    ks = tuple(int(x) for x in args.ks.split(","))

    def slope(make_chain, label):
        ts = []
        for k in ks:
            fn = make_chain(k)
            np.asarray(fn(jnp.float32(1.0)))
            np.asarray(fn(jnp.float32(2.0)))
            t0 = time.perf_counter()
            for i in range(args.iters):
                np.asarray(fn(jnp.float32(3.0 + i)))
            ts.append((time.perf_counter() - t0) / args.iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:28s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    def loss_of(mode):
        def f(p, b):
            _, tot = criterion(key, p, b, mode)
            return jnp.sum(tot)
        return f

    def chain(fn, use_grad):
        # batch/pred are jit ARGUMENTS — closed-over device arrays get
        # baked into the HLO and bloat the tunnel's compile request.
        def make(k):
            @jax.jit
            def g(salt, p, b):
                def body(acc, i):
                    pi = p + ((salt * 1e-9) * i + acc * 0.0).astype(p.dtype)
                    v = (jax.value_and_grad(fn)(pi, b)[1].sum() if use_grad
                         else fn(pi, b))
                    return acc + v.astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc
            return lambda salt: g(salt, pred, batch)
        return make

    names = args.terms.split(",") if args.terms else list(MODES)
    ss_fn = lambda p, b: jnp.sum(recover_scale_shift_depth(p, b["depth"]))
    slope(chain(ss_fn, False), "recover_ss fwd")
    slope(chain(ss_fn, True), "recover_ss fwd+grad")
    for name in names:
        mode = MODES[name]
        slope(chain(loss_of(mode), False), f"{name} fwd")
        slope(chain(loss_of(mode), True), f"{name} fwd+grad")


if __name__ == "__main__":
    main()
