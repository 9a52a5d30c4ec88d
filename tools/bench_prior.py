"""Prior-side TPU benchmark: ResNeXt101+AdaIn cIMLE forward (the hypothesis
-dump hot loop, reference output_depth_hypothesis_scannet.py:415-488) and
the SGD train step, at the production 448x448 shape.

MEASUREMENT PROTOCOL (BASELINE.md r3): every benched function reduces its
output to a SCALAR on device, and timing fetches only that scalar —
through the axon tunnel a full-tensor fetch moves at ~30 MB/s (a 32 MB
conv output "costs" a second of pure transfer) and block_until_ready does
not force execution at all. Per-call latency (~35-50 ms) is removed by
timing k-call chains at two k's and taking the slope.

Usage: python tools/bench_prior.py [--batch 5] [--precision bfloat16]
       [--ablate]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def make_timer(iters, ks=(1, 4)):
    """timer(make_chain) where make_chain(k) -> jitted fn(salt)->scalar
    running k dependent evaluations; returns slope seconds per evaluation."""

    def timer(make_chain, label):
        ts = []
        for k in ks:
            fn = make_chain(k)
            np.asarray(fn(jnp.float32(1.0)))  # compile
            np.asarray(fn(jnp.float32(2.0)))  # warm
            t0 = time.perf_counter()
            for i in range(iters):
                np.asarray(fn(jnp.float32(3.0 + i)))
            ts.append((time.perf_counter() - t0) / iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:42s} {dt * 1e3:8.1f} ms", flush=True)
        return dt

    return timer


def perturbed(x, salt, i, acc=None):
    """x + tiny salt*i perturbation, cast to x.dtype. An f32 perturbation
    would silently promote a bf16 x to f32 and crash the model at the first
    conv ("arguments must have the same dtypes") — the round-3 harness bug
    that killed every full-cast bf16 measurement (VERDICT r3 weak #1). The
    optional acc*0.0 term keeps a data dependence between scan iterations
    so XLA cannot hoist the chain."""
    eps = (salt * 1e-9) * i
    if acc is not None:
        eps = eps + acc * 0.0
    return x + eps.astype(x.dtype)


def slope_time(fn, x, params, iters=6, ks=(2, 8)):
    """ms per single fn(x, params) application via the chained-scan slope
    protocol (one shared copy for the probe tools — keep measurement
    methodology identical across probes)."""
    import time as _time

    def make(k):
        @jax.jit
        def f(salt, x, params):
            def body(acc, i):
                out = fn(perturbed(x, salt, i, acc), params)
                return acc + jnp.sum(out).astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return acc

        return f

    ts = []
    for k in ks:
        f = make(k)
        np.asarray(f(jnp.float32(1.0), x, params))
        np.asarray(f(jnp.float32(2.0), x, params))
        t0 = _time.perf_counter()
        for i in range(iters):
            np.asarray(f(jnp.float32(3.0 + i), x, params))
        ts.append((_time.perf_counter() - t0) / iters)
    return (ts[1] - ts[0]) / (ks[1] - ks[0]) * 1e3


def chain_of(apply_fn, x, k, *state):
    """k dependent applications of apply_fn(x + eps, *state) summed to one
    scalar. x and state are jit ARGUMENTS — closed-over device arrays would
    be baked into the HLO as constants, and 466 MB of ResNeXt params then
    overflows the tunnel's remote_compile request (HTTP 413)."""

    @jax.jit
    def f(salt, x, *state):
        def body(acc, i):
            out = apply_fn(perturbed(x, salt, i, acc), *state)
            return acc + jnp.sum(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return acc

    return lambda salt: f(salt, x, *state)


def ablate(args, model, variables, shifts, x, z, timer):
    """Attribute the prior's low MFU (VERDICT r2 weak #2): encoder vs
    decoder, what precision buys, and the ResNeXt grouped-conv penalty vs
    an equivalent dense conv."""
    from scade_tpu.prior.model import Decoder, ResNeXtCIMLE

    cfg = model.cfg
    enc = ResNeXtCIMLE(cfg, adain_version="v2")
    dec = Decoder(cfg)
    v_enc = {"params": variables["params"]["encoder"],
             "batch_stats": variables["batch_stats"]["encoder"]}
    v_dec = {"params": variables["params"]["decoder"],
             "batch_stats": variables["batch_stats"]["decoder"]}
    B = args.batch

    feats = jax.jit(
        lambda v, x, z: enc.apply(v, x, z, shifts, train=False)
    )(v_enc, x, z)
    feats = jax.tree.map(jnp.asarray, feats)

    for prec in ("highest", "bfloat16"):
        with jax.default_matmul_precision(prec):
            dt = timer(
                lambda k: chain_of(
                    lambda xx, v: model.apply(v, xx, z, shifts, train=False),
                    x, k, variables),
                f"full fwd   [{prec}] (B={B})",
            )
            print(f"{'':42s} = {B / dt:6.1f} img/s, dump rate "
                  f"{B / dt / 20:5.2f} img/s at 20 draws", flush=True)
            timer(
                lambda k: chain_of(
                    lambda xx, v: enc.apply(v, xx, z, shifts,
                                            train=False)[-1], x, k, v_enc),
                f"encoder    [{prec}]",
            )

            def dec_apply(f0, v, f1, f2, f3):
                return dec.apply(v, [f0, f1, f2, f3], train=False)

            timer(lambda k: chain_of(dec_apply, feats[0], k, v_dec,
                                     feats[1], feats[2], feats[3]),
                  f"decoder    [{prec}]")

    # grouped-conv microbench at the X101 layer2 shape: (B, 56, 56, 512),
    # 3x3, groups=32 (16 ch/group) — the MXU sees 16-wide matmuls
    key = jax.random.PRNGKey(1)
    xx = jax.random.normal(key, (B, 56, 56, 512), jnp.float32)
    wg = jax.random.normal(key, (3, 3, 16, 512), jnp.float32) * 0.05
    wd = jax.random.normal(key, (3, 3, 512, 512), jnp.float32) * 0.05
    dn = jax.lax.conv_dimension_numbers(xx.shape, wd.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    gflop_g = 2 * 9 * 512 * 16 * 56 * 56 * B / 1e9
    gflop_d = 2 * 9 * 512 * 512 * 56 * 56 * B / 1e9

    for prec in ("highest", "bfloat16"):
        with jax.default_matmul_precision(prec):
            dt_g = timer(
                lambda k: chain_of(
                    lambda a, w: jax.lax.conv_general_dilated(
                        a, w, (1, 1), "SAME", dimension_numbers=dn,
                        feature_group_count=32), xx, k, wg),
                f"conv3x3 56x56x512 grouped(32) [{prec}]",
            )
            dt_d = timer(
                lambda k: chain_of(
                    lambda a, w: jax.lax.conv_general_dilated(
                        a, w, (1, 1), "SAME", dimension_numbers=dn), xx, k, wd),
                f"conv3x3 56x56x512 dense       [{prec}]",
            )
            print(f"{'':42s} grouped {gflop_g / dt_g:7.0f} GFLOP/s | "
                  f"dense {gflop_d / dt_d:7.0f} GFLOP/s", flush=True)


def ablate_train(args, model, variables, shifts, x, z, timer):
    """Attribute the SGD train step's cost (BASELINE r3: step ≈ 5x fwd at
    B=5 — canonical conv fwd:bwd is ~1:2, so ~2x is unexplained). Chains
    carry (params, opt_state) through lax.scan; every variant consumes a
    scalar so XLA DCEs the unused machinery."""
    import optax

    B = args.batch
    target = jax.random.normal(jax.random.PRNGKey(2), (B, args.image_size,
                                                       args.image_size, 1))
    batch_stats = variables["batch_stats"]
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(1e-3, momentum=0.9))
    opt_state = tx.init(variables["params"])

    def fwd_chain(train):
        def make(k):
            @jax.jit
            def f(salt, params, batch_stats, x, target):
                def body(acc, i):
                    xx = perturbed(x, salt, i, acc)
                    if train:
                        out, _ = model.apply(
                            {"params": params, "batch_stats": batch_stats},
                            xx, z, shifts, train=True,
                            mutable=["batch_stats"])
                    else:
                        out = model.apply(
                            {"params": params, "batch_stats": batch_stats},
                            xx, z, shifts, train=False)
                    return acc + jnp.abs(out - target).mean(), None

                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc

            return lambda salt: f(salt, variables["params"], batch_stats,
                                  x, target)

        return make

    def step_chain(mode):
        """mode: 'grads' (no optimizer), 'full' (grads+clip+sgd),
        'dec_only' (stop_gradient after the encoder — isolates the
        decoder+loss backward), 'no_bnstats' (train=False fwd in the
        grad, i.e. running-stat BN — isolates batch-stat cost)."""

        def make(k):
            @jax.jit
            def f(salt, params0, batch_stats, opt_state, x, target):
                def run(p, xx):
                    train = mode != "no_bnstats"
                    kwargs = dict(train=train)
                    if train:
                        kwargs["mutable"] = ["batch_stats"]
                    out = model.apply(
                        {"params": p, "batch_stats": batch_stats}, xx, z,
                        shifts, **kwargs)
                    if train:
                        out = out[0]
                    return jnp.abs(out - target).mean()

                def body(carry, i):
                    params, opt_state = carry
                    xx = perturbed(x, salt, i)
                    if mode == "dec_only":
                        # differentiate ONLY the non-encoder params: the
                        # encoder subtree enters as a closed-over constant,
                        # so its backward is genuinely absent from the
                        # program (stop_gradient on the value passed INTO
                        # value_and_grad would not remove it).
                        enc = params["encoder"]
                        rest = {k2: v for k2, v in params.items()
                                if k2 != "encoder"}
                        loss, grads = jax.value_and_grad(
                            lambda r, xx: run({"encoder": enc, **r}, xx)
                        )(rest, xx)
                    else:
                        loss, grads = jax.value_and_grad(run)(params, xx)
                    if mode == "full":
                        updates, opt_state = tx.update(grads, opt_state,
                                                       params)
                        params = optax.apply_updates(params, updates)
                    else:
                        # consume grads so the bwd isn't DCE'd
                        loss = loss + 1e-30 * optax.global_norm(grads)
                    return (params, opt_state), loss

                (_, _), losses = jax.lax.scan(
                    body, (params0, opt_state), jnp.arange(k))
                return jnp.sum(losses)

            return lambda salt: f(salt, variables["params"], batch_stats,
                                  opt_state, x, target)

        return make

    for prec in ("bfloat16",) if args.precision == "bfloat16" else \
            ("highest", "bfloat16"):
        with jax.default_matmul_precision(prec):
            timer(fwd_chain(False), f"fwd eval-BN        [{prec}] (B={B})")
            timer(fwd_chain(True), f"fwd train-BN stats [{prec}]")
            timer(step_chain("no_bnstats"), f"grads, eval-BN fwd [{prec}]")
            timer(step_chain("grads"), f"grads only         [{prec}]")
            timer(step_chain("dec_only"), f"grads dec-only     [{prec}]")
            dt = timer(step_chain("full"), f"full step          [{prec}]")
            print(f"{'':42s} = {B / dt:6.1f} img/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5,
                    help="z minibatch size (reference draws 20 z in "
                         "minibatches of 5, :482-488)")
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", default=None,
                    choices=["highest", "high", "bfloat16", "tensorfloat32"],
                    help="matmul/conv precision on the MXU; bfloat16 is the "
                         "fast path (params/activations stay f32); default "
                         "leaves the JAX ambient setting")
    ap.add_argument("--ablate", action="store_true",
                    help="attribution mode: encoder vs decoder, grouped-vs-"
                         "dense conv microbench, f32-vs-bf16 A/B")
    ap.add_argument("--ablate_train", action="store_true",
                    help="train-step attribution: fwd / BN stats / grads / "
                         "decoder-only grads / full SGD step")
    ap.add_argument("--compute_dtype", default=None,
                    choices=["bfloat16", "float32"],
                    help="full-cast path: params+activations in this dtype "
                         "(the dump tools' --compute_dtype / the trainer's "
                         "mixed-precision mode)")
    args = ap.parse_args()
    if args.precision:
        jax.config.update("jax_default_matmul_precision", args.precision)

    from scade_tpu.prior.model import (
        DepthModelCIMLE,
        PriorConfig,
        zero_shifts,
    )

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), jnp.float32)
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)

    print("initializing model ...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), x[:1], z[:1], shifts,
                           train=False)
    if args.compute_dtype:
        cd = jnp.dtype(args.compute_dtype)
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(cd)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        variables, shifts, x, z = cast(variables), cast(shifts), cast(x), cast(z)
        print(f"compute_dtype: {cd}", flush=True)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params / 1e6:.1f}M", flush=True)

    timer = make_timer(args.iters)

    if args.ablate:
        ablate(args, model, variables, shifts, x, z, timer)
        return
    if args.ablate_train:
        ablate_train(args, model, variables, shifts, x, z, timer)
        return

    dt = timer(
        lambda k: chain_of(
            lambda xx, v: model.apply(v, xx, z, shifts, train=False),
            x, k, variables),
        f"inference fwd (B={B}, {S}x{S})",
    )
    img_s = B / dt
    print(f"= {img_s:.1f} img/s → hypothesis dump rate {img_s / 20:.2f} "
          f"images/s (20 z-draws each)", flush=True)

    # train step: forward + backward + SGD on an ILNR-style masked MAE
    # (the full criterion is data-dependent; the MLP/conv cost dominates)
    import optax

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.sgd(1e-3, momentum=0.9))
    opt_state = tx.init(variables["params"])
    target = jax.random.normal(jax.random.fold_in(key, 2), (B, S, S, 1))
    batch_stats = variables["batch_stats"]

    def train_chain(k):
        @jax.jit
        def f(salt, params0, batch_stats, opt_state, x, target):
            def loss_fn(p, xx):
                out, new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats}, xx, z, shifts,
                    train=True, mutable=["batch_stats"],
                )
                return jnp.abs(out - target).mean(), new_vars["batch_stats"]

            def body(carry, i):
                params, opt_state = carry
                xx = perturbed(x, salt, i)
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, xx)
                updates, new_opt = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_opt), loss

            (_, _), losses = jax.lax.scan(
                body, (params0, opt_state), jnp.arange(k)
            )
            return jnp.sum(losses)

        return lambda salt: f(salt, variables["params"], batch_stats,
                              opt_state, x, target)

    try:
        dt = timer(train_chain, f"train step (B={B})")
        print(f"= {B / dt:.1f} img/s", flush=True)
    except Exception as e:  # large B OOMs HBM (B=20 needs ~16.7 GB)
        print(f"train step (B={B}) skipped: {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
