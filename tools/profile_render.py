"""Ablation timing of the render pipeline on the real chip.

Times the full flagship render and ablated variants (sort removed,
sample_pdf removed, glue removed) to attribute the gap between measured
throughput and the MLP-only speed of light (BASELINE.md). Timings force
host materialization (np.asarray) — block_until_ready is a no-op through
the axon tunnel.

Usage: python tools/profile_render.py [--batch 65536] [--chunk 8192]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def fetch(out):
    # fetching ONE output of a jit call forces the whole program to run;
    # transferring only the (B,) depth keeps tunnel traffic out of the
    # timing (same protocol as bench.py)
    return np.asarray(out[1])


def timeit(fn, *args, iters=4):
    fetch(fn(*args))  # compile
    fetch(fn(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fetch(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--slope", action="store_true",
                    help="chained-scan slope protocol (two chain lengths "
                         "inside ONE program): removes the ~0.14-0.25 s "
                         "per-call dispatch latency that the per-call "
                         "protocol folds into every variant (BASELINE r3 "
                         "bench section). Per-call stays the default for "
                         "continuity with earlier recorded attributions.")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--only", nargs="+", default=None,
                    help="run only these variant names (substring match)")
    args = ap.parse_args()
    if os.environ.get("SCADE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

    from scade_tpu.models.nerf import nerf_init
    from scade_tpu.ops.embedding import positional_encoding
    from scade_tpu.ops.sampling import draw_u, sample_pdf
    from scade_tpu.ops.volume import raw2outputs, stratified_z_vals
    from scade_tpu.render.renderer import (
        SceneVars,
        _query_network,
        make_render_config,
        render_ray_batch,
    )

    rc = make_render_config(compute_dtype=jnp.bfloat16).test_mode()
    key = jax.random.PRNGKey(0)
    kc, kf, ko, kd = jax.random.split(key, 4)
    scene = SceneVars(
        params_coarse=nerf_init(kc, rc.nerf_coarse),
        params_fine=nerf_init(kf, rc.nerf_fine),
        bb_center=jnp.zeros((3,), jnp.float32),
        bb_scale=jnp.float32(0.5),
        embedded_cam=jnp.zeros((0,), jnp.float32),
    )
    B, C = args.batch, args.chunk
    rays_o = jax.random.normal(ko, (B, 3), jnp.float32) * 0.1
    rays_d = jax.random.normal(kd, (B, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    near, far = 0.1, 10.0
    n_rays = C
    NS, NI = rc.n_samples, rc.n_importance

    def tiled(body):
        """lax.map the per-chunk body over the batch, like render_ray_batch."""

        @jax.jit
        def fn(scene, rays_o, rays_d):
            ro = rays_o.reshape(B // C, C, 3)
            rd = rays_d.reshape(B // C, C, 3)
            out = jax.lax.map(lambda a: body(scene, a[0], a[1]), (ro, rd))
            return out

        return fn

    def full(scene, ro, rd):
        from scade_tpu.render.renderer import render_rays

        out = render_rays(scene, rc, ro, rd, near, far)
        return out["rgb_map"], out["depth_map"], out["pred_hyp"]

    def make_body(do_imp_sample=True, do_sort=True, do_pred_hyp=True,
                  do_coarse=True, imp_mode="use", union="sort"):
        """imp_mode: "use" (normal), "compute_only" (run sample_pdf, keep
        its result live via a side output, but feed the fine pass a
        broadcast linspace — separates the op's compute cost from the
        downstream data-dependence it creates). union: "sort" (concat+sort)
        or "merge" (the production merge_sorted)."""

        def body(scene, ro, rd):
            from scade_tpu.ops.sampling import merge_sorted

            viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
            nearb = jnp.broadcast_to(jnp.float32(near), (n_rays, 1))
            farb = jnp.broadcast_to(jnp.float32(far), (n_rays, 1))
            z_vals = stratified_z_vals(nearb, farb, NS, rc.lindisp)
            side = jnp.zeros((n_rays,), jnp.float32)
            if do_coarse:
                pts = ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]
                raw = _query_network(
                    scene.params_coarse, rc.nerf_coarse, rc, pts, viewdirs, scene
                )
                rgb_map, _, _, weights, depth_map = raw2outputs(
                    raw, z_vals, rd, 0.0
                )
                # keep the coarse pass LIVE in every variant: without this,
                # do_imp_sample=False leaves `weights` unconsumed and XLA
                # dead-code-eliminates the whole coarse MLP — which made the
                # round-2 "no-sampling floor" drop 25% of the MLP work and
                # overstate the remaining render gap (BASELINE.md r3)
                side = side + jnp.sum(weights, axis=-1) * 1e-12
            else:
                weights = jnp.ones((n_rays, NS), jnp.float32) / NS
            if do_imp_sample:
                z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                u_imp = draw_u(None, n_rays, NI, det=True, joint=False)
                z_samples = sample_pdf(z_mid, weights[..., 1:-1], u_imp)
                z_samples = jax.lax.stop_gradient(z_samples)
                if imp_mode == "compute_only":
                    side = jnp.sum(z_samples, axis=-1)
                    z_samples = jnp.broadcast_to(
                        jnp.linspace(near, far, NI, dtype=jnp.float32),
                        (n_rays, NI),
                    )
            else:
                z_samples = jnp.broadcast_to(
                    jnp.linspace(near, far, NI, dtype=jnp.float32), (n_rays, NI)
                )

            if union == "merge" and do_sort:
                z_all = merge_sorted(z_vals, z_samples)
            else:
                z_all = jnp.concatenate([z_vals, z_samples], axis=-1)
                if do_sort:
                    z_all = jnp.sort(z_all, axis=-1)
            pts = ro[..., None, :] + rd[..., None, :] * z_all[..., :, None]
            raw = _query_network(
                scene.params_fine, rc.nerf_fine, rc, pts, viewdirs, scene
            )
            rgb_map, _, _, weights, depth_map = raw2outputs(raw, z_all, rd, 0.0)

            if do_pred_hyp:
                z_mid2 = 0.5 * (z_all[..., 1:] + z_all[..., :-1])
                u = draw_u(None, n_rays, NI, det=True, joint=rc.is_joint)
                pred_hyp = sample_pdf(z_mid2, weights[..., 1:-1], u)
            else:
                pred_hyp = depth_map[:, None]
            return rgb_map, depth_map + side, pred_hyp

        return body

    def mlp_only(scene, ro, rd):
        # coarse 64 + fine 192 MLP evals on fixed z, raw2outputs: the compute
        # floor of the pipeline with zero sampling machinery.
        viewdirs = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        z_c = jnp.broadcast_to(
            jnp.linspace(near, far, NS, dtype=jnp.float32), (n_rays, NS)
        )
        z_f = jnp.broadcast_to(
            jnp.linspace(near, far, NS + NI, dtype=jnp.float32),
            (n_rays, NS + NI),
        )
        pts = ro[..., None, :] + rd[..., None, :] * z_c[..., :, None]
        raw_c = _query_network(
            scene.params_coarse, rc.nerf_coarse, rc, pts, viewdirs, scene
        )
        rgb0, _, _, w0, d0 = raw2outputs(raw_c, z_c, rd, 0.0)
        pts = ro[..., None, :] + rd[..., None, :] * z_f[..., :, None]
        raw_f = _query_network(
            scene.params_fine, rc.nerf_fine, rc, pts, viewdirs, scene
        )
        rgb, _, _, w, d = raw2outputs(raw_f, z_f, rd, 0.0)
        return rgb + rgb0, d + d0, w

    variants = {
        "full(render_rays)": full,
        "full(reassembled)": make_body(),
        "full(merge)": make_body(union="merge"),
        "imp_compute_only": make_body(imp_mode="compute_only"),
        "no_sort": make_body(do_sort=False),
        "no_pred_hyp": make_body(do_pred_hyp=False),
        "no_imp_sample": make_body(do_imp_sample=False),
        "no_sampling_at_all": make_body(
            do_imp_sample=False, do_sort=False, do_pred_hyp=False
        ),
        "fine_only_floor": make_body(
            do_coarse=False, do_imp_sample=False, do_sort=False,
            do_pred_hyp=False,
        ),
        "mlp_only": mlp_only,
    }
    def chained(body, k):
        """k dependent whole-batch renders in ONE program; every returned
        leaf is consumed (same liveness as the stacked per-call outputs)."""

        @jax.jit
        def fn(salt, scene, rays_o, rays_d):
            def chain_body(acc, i):
                ro = (rays_o + salt * 1e-9 * i + acc * 0.0).reshape(
                    B // C, C, 3)
                rd = rays_d.reshape(B // C, C, 3)
                out = jax.lax.map(lambda a: body(scene, a[0], a[1]),
                                  (ro, rd))
                consumed = sum(jnp.sum(l[0, 0]).astype(jnp.float32)
                               for l in jax.tree.leaves(out))
                return acc + consumed, None

            acc, _ = jax.lax.scan(chain_body, jnp.float32(0.0),
                                  jnp.arange(k))
            return acc

        return fn

    def timeit_slope(body, ks=(1, 3)):
        ts = []
        for k in ks:
            fn = chained(body, k)
            np.asarray(fn(jnp.float32(1.0), scene, rays_o, rays_d))
            np.asarray(fn(jnp.float32(2.0), scene, rays_o, rays_d))
            t0 = time.perf_counter()
            for r in range(args.iters):
                np.asarray(fn(jnp.float32(3.0 + r), scene, rays_o, rays_d))
            ts.append((time.perf_counter() - t0) / args.iters)
        return (ts[1] - ts[0]) / (ks[1] - ks[0])

    if args.only:
        variants = {n: b for n, b in variants.items()
                    if any(s in n for s in args.only)}
    results = {}
    for name, body in variants.items():
        if args.slope:
            dt = timeit_slope(body)
        else:
            fn = tiled(body)
            dt = timeit(fn, scene, rays_o, rays_d, iters=args.iters)
        results[name] = dt
        print(f"{name:24s} {dt * 1e3:8.1f} ms   {B / dt / 1e3:8.1f}k rays/s",
              flush=True)

    if "full(reassembled)" in results:
        base = results["full(reassembled)"]
        print("\nattribution vs full(reassembled):")
        for name, dt in results.items():
            print(f"{name:24s} {(base - dt) * 1e3:+7.1f} ms")


if __name__ == "__main__":
    main()
