"""Time the full SCADE train step (fwd + bwd + both Adams, on-device batch
gather) at the reference workload shape on the attached chip — plus an
ablation mode that attributes the step time to its stages.

Timings materialize a scalar metric to host (np.asarray) — through the
axon tunnel block_until_ready does not force execution (BASELINE.md).

Ablation variants (DCE-based: each variant consumes only the outputs whose
computation it wants to keep; XLA dead-code-eliminates the rest):

  choice      jax.random.choice(HW, n_rand, replace=False) alone — the
              reference's no-replacement pixel pick (select_coordinates,
              run_nerf_helpers.py:279-283) lowers to a full 292k-element
              random permutation (sort) per step.
  gather      sample_ray_batch alone (choice + rays + rgb/hyp gathers).
  fwd         full forward loss (img + img0 + sc), no grad.
  fwd_no_sc   forward without the space-carving term (P_depth branch DCEd).
  grad        full grads (no optimizer applies).
  grad_no_sc  grads without the sc term (sample_pdf bwd + sc reduction DCEd).
  grad_sg_hyp grads with sc on stop_gradient(pred_hyp): keeps the sc fwd
              reduction, kills the P_depth sample_pdf backward.
  grad_img    grads of the fine img loss only (no coarse head, no sc).
  full        the production train step (make_train_step).
  full_strat  production step with stratified pixel sampling (tc override).

Usage: python tools/profile_train.py [--ablate] [--variants a,b,c]
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
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--H", type=int, default=468)
    ap.add_argument("--W", type=int, default=624)
    ap.add_argument("--n_train", type=int, default=16)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from scade_tpu.ops.losses import compute_space_carving_loss, img2mse
    from scade_tpu.render.renderer import SceneVars, make_render_config, render_rays
    from scade_tpu.train.step import (
        SceneTensors,
        TrainConfig,
        create_train_state,
        make_train_step,
        sample_ray_batch,
    )

    rc = make_render_config(compute_dtype=getattr(jnp, args.dtype))
    # "choice" = the round-1/2 baseline semantics; the _strat variants
    # measure the stratified default
    tc = TrainConfig(n_rand=args.n_rand, pixel_sampling="choice")
    tc_strat = TrainConfig(n_rand=args.n_rand, pixel_sampling="stratified")
    H, W, n_train, K = args.H, args.W, args.n_train, args.K

    key = jax.random.PRNGKey(0)
    state = create_train_state(key, rc, tc, n_images=n_train + 2)
    rng = np.random.default_rng(0)
    scene = SceneTensors(
        images=jnp.asarray(rng.uniform(size=(n_train + 2, H, W, 3)), jnp.float32),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_train + 2, 4, 4)),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([W / 2, W / 2, W / 2, H / 2], jnp.float32),
            (n_train + 2, 4),
        ),
        hyps=jnp.asarray(
            rng.uniform(1.0, 5.0, size=(n_train, K, H, W, 1)), jnp.float32
        ),
        near=jnp.float32(0.1),
        far=jnp.float32(10.0),
        bb_center=jnp.zeros((3,), jnp.float32),
        bb_scale=jnp.float32(0.5),
    )

    def timeit(fn, label, iters=None):
        iters = iters or args.iters
        t_c0 = time.perf_counter()
        np.asarray(fn(jax.random.PRNGKey(0)))
        t_compile = time.perf_counter() - t_c0
        np.asarray(fn(jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        for i in range(iters):
            np.asarray(fn(jax.random.PRNGKey(2 + i)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:14s} {dt * 1e3:8.1f} ms/step   (compile {t_compile:.0f}s)",
              flush=True)
        return dt

    def timeit_chained(make_chain, label, ks=(4, 20), iters=3):
        """Latency-free per-step time: run a k-step lax.scan chain as ONE
        program for two k's and take the slope — the ~35-50 ms per-call
        tunnel round-trip (BASELINE.md / memory) cancels out."""
        ts = []
        for k in ks:
            fn = make_chain(k)
            t_c0 = time.perf_counter()
            np.asarray(fn(jax.random.PRNGKey(0)))
            t_compile = time.perf_counter() - t_c0
            np.asarray(fn(jax.random.PRNGKey(1)))
            t0 = time.perf_counter()
            for i in range(iters):
                np.asarray(fn(jax.random.PRNGKey(2 + i)))
            ts.append((time.perf_counter() - t0) / iters)
        dt = (ts[1] - ts[0]) / (ks[1] - ks[0])
        print(f"{label:14s} {dt * 1e3:8.1f} ms/step   "
              f"(chain {ks[0]}:{ts[0] * 1e3:.0f}ms {ks[1]}:{ts[1] * 1e3:.0f}ms, "
              f"last compile {t_compile:.0f}s)", flush=True)
        return dt

    if not args.ablate:
        step = make_train_step(rc, tc, H, W, n_train, donate=False)
        dt = timeit(lambda k: step(state, scene, k)[1]["loss"], "full")
        print(
            f"train step ({args.n_rand} rays, 64+128+128 samples, K={K}, "
            f"{args.dtype}): {dt * 1e3:.1f} ms/step "
            f"→ 500k iters in {dt * 500000 / 3600:.2f} h", flush=True,
        )
        return

    # ------------------------------------------------------------------ ablate
    # NOTE: scene/state must be ARGUMENTS of the jitted fns — closed-over
    # device arrays are baked into the HLO as constants, and the 467 MB
    # hypothesis tensor then overflows the tunnel's compile request.
    def make_loss(key, mode, sc, st):
        """Build the train-step loss with selectable terms. mode controls
        which loss terms are consumed → XLA DCEs unconsumed branches."""
        k_batch, k_render = jax.random.split(key)
        rays_o, rays_d, target_s, target_h, sc_mask, img_i = sample_ray_batch(
            k_batch, sc, H, W, n_train, tc
        )

        def loss_fn(diff):
            scene_vars = SceneVars(
                params_coarse=diff["params"]["coarse"],
                params_fine=diff["params"]["fine"],
                bb_center=sc.bb_center,
                bb_scale=sc.bb_scale,
                embedded_cam=jnp.zeros((0,), jnp.float32),
            )
            out = render_rays(
                scene_vars, rc, rays_o, rays_d, sc.near, sc.far,
                key=k_render,
            )
            loss = img2mse(out["rgb_map"], target_s)
            if mode != "img":
                loss = loss + img2mse(out["rgb0"], target_s)
            if mode in ("full", "sg_hyp"):
                hyp = out["pred_hyp"]
                if mode == "sg_hyp":
                    hyp = jax.lax.stop_gradient(hyp)
                th = target_h * diff["scales"][img_i] + diff["shifts"][img_i]
                loss = loss + tc.space_carving_weight * compute_space_carving_loss(
                    hyp, th, is_joint=tc.is_joint
                )
            return loss

        return loss_fn

    def fwd(mode):
        @jax.jit
        def f(key, st, sc):
            diff = {"params": st.params, "scales": st.scales,
                    "shifts": st.shifts}
            return make_loss(key, mode, sc, st)(diff)
        return lambda key: f(key, state, scene)

    def grad(mode):
        @jax.jit
        def f(key, st, sc):
            diff = {"params": st.params, "scales": st.scales,
                    "shifts": st.shifts}
            g = jax.grad(make_loss(key, mode, sc, st))(diff)
            return sum(jnp.sum(x) for x in jax.tree.leaves(g))
        return lambda key: f(key, state, scene)

    @jax.jit
    def choice_only(key):
        pix = jax.random.choice(key, H * W, (tc.n_rand,), replace=False)
        return jnp.sum(pix)

    @jax.jit
    def _gather_only(key, sc):
        rays_o, rays_d, target_s, target_h, _, _ = sample_ray_batch(
            key, sc, H, W, n_train, tc
        )
        return jnp.sum(rays_o) + jnp.sum(target_s) + jnp.sum(target_h)

    def gather_only(key):
        return _gather_only(key, scene)

    @jax.jit
    def strat_only(key):
        # the production law, not a reimplementation — a diverged copy here
        # would attribute the cost of a different program
        from scade_tpu.train.step import select_pixels

        return jnp.sum(select_pixels(key, H, W, tc_strat))

    step = make_train_step(rc, tc, H, W, n_train, donate=False)
    step_strat = make_train_step(rc, tc_strat, H, W, n_train, donate=False)

    def chain_step(the_step):
        def make(k):
            @jax.jit
            def f(key, st, sc):
                def body(carry, i):
                    st2, m = the_step(carry, sc, jax.random.fold_in(key, i))
                    return st2, m["loss"]
                _, losses = jax.lax.scan(body, st, jnp.arange(k))
                return jnp.sum(losses)
            return lambda key: f(key, state, scene)
        return make

    def chain_loss(mode, use_grad):
        def make(k):
            @jax.jit
            def f(key, st, sc):
                diff = {"params": st.params, "scales": st.scales,
                        "shifts": st.shifts}

                def body(acc, i):
                    lf = make_loss(jax.random.fold_in(key, i), mode, sc, st)
                    if use_grad:
                        g = jax.grad(lf)(diff)
                        v = sum(jnp.sum(x) for x in jax.tree.leaves(g))
                    else:
                        v = lf(diff)
                    return acc + v, None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc
            return lambda key: f(key, state, scene)
        return make

    def chain_null():
        def make(k):
            @jax.jit
            def f(key):
                def body(acc, i):
                    return acc + jax.random.uniform(jax.random.fold_in(key, i), ()), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
                return acc
            return f
        return make

    variants = {
        "choice": lambda: timeit(choice_only, "choice"),
        "strat": lambda: timeit(strat_only, "strat"),
        "gather": lambda: timeit(gather_only, "gather"),
        "null": lambda: timeit_chained(chain_null(), "null"),
        "fwd": lambda: timeit_chained(chain_loss("full", False), "fwd"),
        "fwd_no_sc": lambda: timeit_chained(chain_loss("no_sc", False), "fwd_no_sc"),
        "grad": lambda: timeit_chained(chain_loss("full", True), "grad"),
        "grad_no_sc": lambda: timeit_chained(chain_loss("no_sc", True), "grad_no_sc"),
        "grad_sg_hyp": lambda: timeit_chained(chain_loss("sg_hyp", True), "grad_sg_hyp"),
        "grad_img": lambda: timeit_chained(chain_loss("img", True), "grad_img"),
        "full": lambda: timeit_chained(chain_step(step), "full"),
        "full_strat": lambda: timeit_chained(chain_step(step_strat), "full_strat"),
    }
    names = args.variants.split(",") if args.variants else list(variants)
    for name in names:
        variants[name]()


if __name__ == "__main__":
    main()
