"""Benchmark the PRODUCT prior train step — scade_tpu.prior.train's
make_train_step with the real criterion, the real per-group SGD optimizer,
and the real mixed-precision path — at the production 448² shape.

The numbers in tools/bench_prior.py use a masked-MAE proxy loss and a
plain SGD; this tool measures what `tools/train_prior.py` actually runs,
A/B'ing compute_dtype None vs bfloat16 (VERDICT r3 next-round #2's
"done" bar is the PRODUCT step at B=20).

Protocol: repeated dispatches of the jitted donated step with ONE final
scalar fetch (the shape a real training loop sees through the axon
tunnel); first two calls discarded as compile+warm.

Usage: python tools/bench_prior_product.py [--batch 20]
       [--compute_dtype bfloat16] [--precision bfloat16]
       [--terms full|mae|plane,edge,...]

--terms ablates the criterion INSIDE the product step (attribution of
the composition overhead: criterion-alone 328 ms + proxy-step 409.5 ms
!= 1327 ms product step as measured in round 4): "mae" swaps the
criterion for the same masked-MAE proxy tools/bench_prior.py uses,
otherwise a comma list of {plane, edge, ranking, ilnr, msgil} builds
the loss_mode substring.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--image_size", type=int, default=448)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--compute_dtype", default=None,
                    choices=["bfloat16", "float32"])
    ap.add_argument("--terms", default="full")
    args = ap.parse_args()
    jax.config.update("jax_default_matmul_precision", args.precision)

    from scade_tpu.prior.model import DepthModelCIMLE, PriorConfig, zero_shifts
    import scade_tpu.prior.train as train_mod
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        make_prior_optimizer,
        make_train_step,
    )

    TERM_SUBSTR = {
        "plane": "_pairwise-normal-regress-plane_",
        "edge": "_pairwise-normal-regress-edge_",
        "ilnr": "_meanstd-tanh_",
        "ranking": "_ranking-edge_",
        "msgil": "_msgil-normal_",
    }
    if args.terms == "full":
        loss_mode = PriorTrainConfig().loss_mode
    elif args.terms == "mae":
        loss_mode = "_mae-proxy_"

        def proxy_criterion(key, pred, batch, mode):
            # the masked-MAE proxy tools/bench_prior.py measures, in the
            # criterion's (loss_dict, per-image totals) contract
            per_img = jnp.mean(
                jnp.abs(pred - batch["depth"]), axis=(1, 2, 3))
            return {"total_loss": jnp.sum(per_img)}, per_img

        train_mod.criterion = proxy_criterion
    else:
        loss_mode = "".join(TERM_SUBSTR[t] for t in args.terms.split(","))

    cfg = PriorConfig(d_latent=32)
    model = DepthModelCIMLE(cfg)
    tc = PriorTrainConfig(compute_dtype=args.compute_dtype,
                          loss_mode=loss_mode)
    S, B = args.image_size, args.batch
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    # a full criterion batch (prior/losses.py criterion contract)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32),
        "depth": jnp.asarray(
            np.abs(rng.normal(size=(B, S, S, 1))) + 0.5, jnp.float32),
        "planes": jnp.asarray(
            rng.integers(0, 8, size=(B, S, S)), jnp.int32),
        "focal_length": jnp.full((B,), 500.0, jnp.float32),
        "quality_flg": jnp.full((B,), 3, jnp.int32),
    }
    z = jax.random.normal(jax.random.fold_in(key, 1), (B, cfg.d_latent))
    shifts = zero_shifts(cfg)

    print("initializing model ...", flush=True)
    x0 = batch["rgb"][:1]
    variables = model.init(jax.random.PRNGKey(0), x0, z[:1], shifts,
                           train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt = make_prior_optimizer(params, tc)
    opt_state = opt.init(params)
    step = make_train_step(model, tc, opt)

    print(f"product step: B={B}, compute_dtype={args.compute_dtype}, "
          f"matmul={args.precision}, terms={args.terms}", flush=True)
    # compile + warm (donation: rebind every call)
    for _ in range(2):
        params, batch_stats, opt_state, total, loss_dict = step(
            params, batch_stats, opt_state, shifts, batch, z, key)
        np.asarray(total)
    t0 = time.perf_counter()
    acc = None
    for i in range(args.iters):
        params, batch_stats, opt_state, total, loss_dict = step(
            params, batch_stats, opt_state, shifts, batch, z,
            jax.random.fold_in(key, i))
        acc = total if acc is None else acc + total
    np.asarray(acc)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"product train step                        {dt * 1e3:8.1f} ms = "
          f"{B / dt:6.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
