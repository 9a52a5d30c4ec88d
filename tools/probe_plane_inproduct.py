"""Attribute the PWN-planes loss's IN-PRODUCT cost inside the real train step.

bench_prior_product (round 4) measured the plane term's in-product marginal
at ~144 ms (486.4 ms plane-only step vs 342.0 ms proxy step) while the
standalone criterion probe reads its fwd+grad at only ~45 ms — a 3x
composition gap that standalone probes cannot see. This probe runs the REAL
product step (make_train_step: donated state, per-group SGD+clip, bf16
compute path) with the plane loss's internals ablated one at a time via
monkeypatch, so every number is the in-product marginal:

  carrier            ilnr-only criterion (the cheap live-gradient carrier;
                     keeps d(loss)/d(pred) nonzero so no variant lets XLA
                     DCE the model backward)
  plane              ilnr + full plane loss        (marginal = plane cost)
  plane-nograd       ilnr + plane over stop_gradient(pred_ss)
                     (marginal = plane FORWARD; full - this = plane bwd)
  plane-fixedsample  ilnr + plane with masked_sample replaced by strided
                     deterministic indices (full - this = sampling cost:
                     per-plane mask + cumsum CDF + bucketed search)
  plane-fixed-nograd both ablations (leftover = xyz/filter/normals math)

Values are meaningless (ablations change the loss); only step time counts.
Protocol: repeated dispatches of the jitted donated step, one final scalar
fetch, first two calls discarded (compile+warm) — the same protocol as
tools/bench_prior_product.py, so numbers are comparable within a session.

Usage: python tools/probe_plane_inproduct.py [--batch 20] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# the fixedsample ablation monkeypatches masked_sample, which only the
# "cdf" plane-sampling impl routes through — pin it so the attribution
# stays meaningful now that the production default is "perm"
os.environ.setdefault("SCADE_PWN_PLANES", "cdf")

if os.environ.get("SCADE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from scade_tpu.prior.model import DepthModelCIMLE, PriorConfig, zero_shifts
    import scade_tpu.prior.losses as losses
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        make_prior_optimizer,
        make_train_step,
    )

    ILNR = "_meanstd-tanh_"
    PLANE = "_pairwise-normal-regress-plane_"
    EDGE = "_pairwise-normal-regress-edge_"

    orig_planes = losses.pwn_planes_loss
    orig_edges = losses.pwn_edge_loss
    orig_sample = losses.masked_sample
    orig_normals = losses.surface_normal_from_depth

    def stopgrad_planes(key, gt_depth, pred_depth, planes_mask, focal_length,
                        **kw):
        return orig_planes(key, gt_depth, jax.lax.stop_gradient(pred_depth),
                           planes_mask, focal_length, **kw)

    def stopgrad_edges(key, pred_ss, gt, rgb, focal_length, **kw):
        return orig_edges(key, jax.lax.stop_gradient(pred_ss), gt, rgb,
                          focal_length, **kw)

    def fixed_sample(key, mask_flat, n):
        # deterministic strided indices, same shapes/dtypes as masked_sample
        # but no mask compare, no cumsum CDF, no bucketed search
        P = mask_flat.shape[0]
        idx = (jnp.arange(n, dtype=jnp.int32) * 9973) % P
        return idx, jnp.bool_(True)

    def cheap_normals(depth, focal_length, valid_mask=None):
        # differentiable elementwise stand-in for surface_normal_from_depth:
        # keeps the pair gathers/scatters and their gradient real while
        # deleting the avg pools, 5-px shifts, crosses, and orients
        n = losses.safe_normalize(jnp.concatenate(
            [depth, depth * 0.5, depth + 1.0], axis=-1))
        if valid_mask is not None:
            n = jnp.where(valid_mask, n, 0.0)
        return n

    # (loss_mode, planes_fn, edges_fn, sample_fn, normals_fn)
    VARIANTS = {
        "carrier": (ILNR, orig_planes, orig_edges, orig_sample, orig_normals),
        "plane": (ILNR + PLANE, orig_planes, orig_edges, orig_sample,
                  orig_normals),
        "plane-nograd": (ILNR + PLANE, stopgrad_planes, orig_edges,
                         orig_sample, orig_normals),
        "plane-fixedsample": (ILNR + PLANE, orig_planes, orig_edges,
                              fixed_sample, orig_normals),
        "plane-fixed-nograd": (ILNR + PLANE, stopgrad_planes, orig_edges,
                               fixed_sample, orig_normals),
        "edge": (ILNR + EDGE, orig_planes, orig_edges, orig_sample,
                 orig_normals),
        "edge-nograd": (ILNR + EDGE, orig_planes, stopgrad_edges,
                        orig_sample, orig_normals),
        "edge-fixedsample": (ILNR + EDGE, orig_planes, orig_edges,
                             fixed_sample, orig_normals),
        "edge-cheapnormals": (ILNR + EDGE, orig_planes, orig_edges,
                              orig_sample, cheap_normals),
    }
    names = args.variants.split(",") if args.variants else list(VARIANTS)

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32),
        "depth": jnp.asarray(
            np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32),
        "planes": jnp.asarray(rng.integers(0, 8, size=(B, S, S)), jnp.int32),
        "focal_length": jnp.full((B,), 500.0, jnp.float32),
        "quality_flg": jnp.full((B,), 3, jnp.int32),
    }
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)

    print("initializing model ...", flush=True)
    variables = model.init(jax.random.PRNGKey(0), batch["rgb"][:1], z[:1],
                           shifts, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    results = {}
    # state is threaded across variants: the step donates its inputs, and
    # re-uploading a fresh 1.4 GB state through the tunnel per variant
    # costs minutes; the drifting values do not affect timing
    for name in names:
        loss_mode, planes_fn, edges_fn, sample_fn, normals_fn = VARIANTS[name]
        losses.pwn_planes_loss = planes_fn
        losses.pwn_edge_loss = edges_fn
        losses.masked_sample = sample_fn
        losses.surface_normal_from_depth = normals_fn
        try:
            tc = PriorTrainConfig(compute_dtype="bfloat16",
                                  loss_mode=loss_mode)
            opt = make_prior_optimizer(params, tc)
            opt_state = opt.init(params)
            step = make_train_step(model, tc, opt)
            for _ in range(2):
                params, batch_stats, opt_state, total, _ = step(
                    params, batch_stats, opt_state, shifts, batch, z, key)
                np.asarray(total)
            t0 = time.perf_counter()
            acc = None
            for i in range(args.iters):
                params, batch_stats, opt_state, total, _ = step(
                    params, batch_stats, opt_state, shifts, batch, z,
                    jax.random.fold_in(key, i))
                acc = total if acc is None else acc + total
            np.asarray(acc)
            dt = (time.perf_counter() - t0) / args.iters
        finally:
            losses.pwn_planes_loss = orig_planes
            losses.pwn_edge_loss = orig_edges
            losses.masked_sample = orig_sample
            losses.surface_normal_from_depth = orig_normals
        results[name] = dt
        print(f"{name:22s} {dt * 1e3:8.1f} ms = {B / dt:6.1f} img/s",
              flush=True)

    if "carrier" in results and "plane" in results:
        base, full = results["carrier"], results["plane"]
        print(f"\nplane in-product marginal      {(full - base) * 1e3:8.1f} ms")
        if "plane-nograd" in results:
            print(f"  of which backward            "
                  f"{(full - results['plane-nograd']) * 1e3:8.1f} ms")
        if "plane-fixedsample" in results:
            print(f"  of which sampling (CDF+srch) "
                  f"{(full - results['plane-fixedsample']) * 1e3:8.1f} ms")
        if "plane-fixed-nograd" in results:
            print(f"  leftover fwd math            "
                  f"{(results['plane-fixed-nograd'] - base) * 1e3:8.1f} ms")
    if "carrier" in results and "edge" in results:
        base, full = results["carrier"], results["edge"]
        print(f"\nedge in-product marginal       {(full - base) * 1e3:8.1f} ms")
        if "edge-nograd" in results:
            print(f"  of which backward            "
                  f"{(full - results['edge-nograd']) * 1e3:8.1f} ms")
        if "edge-fixedsample" in results:
            print(f"  of which sampling            "
                  f"{(full - results['edge-fixedsample']) * 1e3:8.1f} ms")
        if "edge-cheapnormals" in results:
            print(f"  of which normal fields       "
                  f"{(full - results['edge-cheapnormals']) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
