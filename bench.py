"""SCADE-TPU benchmark: render throughput (rays/sec/chip) on the flagship
coarse+fine NeRF at the reference workload shape (64 coarse + 128 fine
samples, multires-9 positional encoding, 8x256 MLPs — reference defaults at
run_scade_scannet.py:1108-1131).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 5M rays/sec/chip north-star target
(BASELINE.json) — the reference publishes no numbers of its own.
"""

import json
import time

import jax
import jax.numpy as jnp

import os

NORTH_STAR_RAYS_PER_SEC = 5e6
# big batch amortizes the ~78 ms tunnel round-trip per materialization
BATCH = int(os.environ.get("SCADE_BENCH_BATCH", 131072))
ITERS = int(os.environ.get("SCADE_BENCH_ITERS", 6))
CHUNK = int(os.environ.get("SCADE_BENCH_CHUNK", 8192))


def main():
    from scade_tpu.models.nerf import nerf_init
    from scade_tpu.render.renderer import (
        SceneVars,
        make_render_config,
        render_ray_batch,
    )

    # bf16 matmuls on the MXU with f32 accumulation — the production fast
    # path (strict-parity mode uses compute_dtype=float32).
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
    rays_o = jax.random.normal(ko, (BATCH, 3), jnp.float32) * 0.1
    rays_d = jax.random.normal(kd, (BATCH, 3), jnp.float32)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    @jax.jit
    def render(scene, rays_o, rays_d, salt):
        # 8192-ray tiles bound activation memory (65536 rays x 192 samples
        # x 256-wide layers would blow HBM); lax.map pipelines the tiles.
        # Returning pred_hyp keeps the P_depth inverse-CDF branch live — the
        # training path always computes it, so the recorded throughput must
        # include it (rgb+depth alone lets XLA DCE that branch and flatters
        # the number by ~5%). `outputs=` prunes everything else BEFORE the
        # lax.map stacks tiles into HBM.
        out = render_ray_batch(
            scene, rc, rays_o + salt, rays_d, 0.1, 10.0, chunk=CHUNK,
            outputs=("rgb_map", "depth_map", "pred_hyp"),
        )
        return out["rgb_map"], out["depth_map"], out["pred_hyp"]

    # compile + warmup. NOTE: we materialize outputs to host (np.asarray)
    # rather than block_until_ready — on remote/tunneled devices execution
    # can be deferred until data is actually requested, which makes
    # block-only timings meaningless.
    import numpy as np

    np.asarray(render(scene, rays_o, rays_d, 0.0)[2])
    np.asarray(render(scene, rays_o, rays_d, 0.0)[2])

    # accumulate a scalar from each iteration ON DEVICE and fetch once at
    # the end: the ~78 ms tunnel round-trip is then paid once instead of
    # per iteration (~10% of each 0.6 s iteration)
    t0 = time.perf_counter()
    acc = None
    for i in range(ITERS):
        out = render(scene, rays_o, rays_d, 1e-6 * (i + 1))
        piece = out[2][0, 0] + out[1][0]
        acc = piece if acc is None else acc + piece
    np.asarray(acc)
    dt = time.perf_counter() - t0

    rays_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "render_throughput",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec/chip",
                "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
