"""The SCADE train step as a single jitted XLA program.

Semantics follow the reference hot loop (reference: run_scade_scannet.py:942-1002):

  1. pick a random train image, pick N_rand pixels without replacement,
  2. gather rgb / depth-hypothesis targets and generate rays at those pixels,
  3. scale the K hypotheses by the image's learned depth scale/shift,
  4. render (coarse + fine + P_depth draws),
  5. loss = img_mse + w_sc * space_carving + img_mse0,
  6. Adam on the MLPs (staircase LR decay), Adam on scale/shift
     (frozen after `freeze_ss` steps; space-carving gated by `warm_start_nerf`).

TPU-first design notes:

- Steps 1-2 run ON DEVICE: scene tensors are resident in HBM and the batch
  is gathered inside the program, so a training step involves zero host↔
  device traffic (the reference re-generates a full (H, W) ray grid on every
  step and runs several Python chunk loops).
- The LR staircase is an optax schedule traced on the update count — no
  host-side "did the LR change" check (train_utils/hyperparameter_update.py:9-13).
- freeze_ss / warm_start gating are `jnp.where` masks, keeping one compiled
  program valid for the whole run.
- Optional sharding: pass `data_spec` to shard the ray batch over a mesh
  data axis; params stay replicated and XLA turns the loss-mean into a psum
  over ICI (the TPU equivalent of the reference's nn.DataParallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scade_tpu.ops.losses import compute_space_carving_loss, img2mse, mse2psnr
from scade_tpu.ops.rays import get_rays
from scade_tpu.render.renderer import RenderConfig, SceneVars, render_rays


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (defaults = reference flag defaults,
    run_scade_scannet.py:1091-1205)."""

    n_rand: int = 1024
    num_iterations: int = 500000
    lrate: float = 5e-4
    decay_step: int = 400000
    decay_rate: float = 0.1
    scaleshift_lr: float = 1e-7
    scale_init: float = 1.0
    shift_init: float = 0.0
    freeze_ss: int = 400000
    warm_start_nerf: int = 0
    space_carving_weight: float = 0.007
    space_carving_threshold: float = 0.0
    is_joint: bool = False
    norm_p: int = 2
    mask_corners: bool = False
    # wild-runner variants (run_scade_wild.py): 10px border mask and RGB
    # loss masked by the space-carving mask (:818-830, :976-1008)
    mask_edges: bool = False
    mask_rgb: bool = False
    # Per-step pixel selection. The reference's no-replacement choice
    # (select_coordinates, run_nerf_helpers.py:279-283) lowers on TPU to a
    # full H*W random permutation — a 292k-element sort that was measured
    # at ~49 ms/step, ~80% of the whole train step (BASELINE.md r3).
    #   "stratified": one uniform pixel per contiguous ~H*W/n_rand stratum
    #       (integer boundaries) — O(n_rand), distinct by construction,
    #       per-pixel marginals n_rand/HW up to the ±1 stratum-size
    #       remainder (exact when n_rand | H*W); only the joint law
    #       differs (documented, PARITY.md §known deviations).
    #   "choice": the reference's exact uniform-without-replacement law.
    #   "iid": with replacement (≈1.8 expected duplicate pixels per step).
    pixel_sampling: str = "stratified"


class SceneTensors(NamedTuple):
    """Device-resident scene data the train step gathers from.

    Layout matches the reference's post-upload arrays (train+val reindexed
    first, run_scade_scannet.py:864-872); `hyps` covers train images only.
    """

    images: jnp.ndarray  # (N_rel, H, W, 3)
    poses: jnp.ndarray  # (N_rel, 4, 4)
    intrinsics: jnp.ndarray  # (N_rel, 4)
    hyps: jnp.ndarray  # (N_train, K, H, W, 1)
    near: jnp.ndarray  # ()
    far: jnp.ndarray  # ()
    bb_center: jnp.ndarray  # (3,)
    bb_scale: jnp.ndarray  # ()


class TrainState(NamedTuple):
    params: Any  # {"coarse": Params, "fine": Params}
    opt_state: Any
    scales: jnp.ndarray  # (N_rel, 1) per-image depth scale
    shifts: jnp.ndarray  # (N_rel, 1) per-image depth shift
    ss_opt_state: Any
    step: jnp.ndarray  # () int32


def staircase_lr(tc: TrainConfig):
    """lr * rate^floor(i / step) (train_utils/hyperparameter_update.py:9-13).

    optax evaluates the schedule at update count c = i - 1 (the count starts
    at 0 on the first step) while the reference applies get_learning_rate(i)
    with i starting at 1 — so the schedule shifts by one to make the decay
    boundary fire at exactly iteration `decay_step`, like the reference."""

    def schedule(count):
        p = jnp.floor_divide(count + 1, tc.decay_step).astype(jnp.float32)
        return tc.lrate * (tc.decay_rate**p)

    return schedule


def make_optimizers(tc: TrainConfig):
    # torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8 — same as optax.
    nerf_opt = optax.adam(learning_rate=staircase_lr(tc))
    ss_opt = optax.adam(learning_rate=tc.scaleshift_lr)
    return nerf_opt, ss_opt


def create_train_state(
    key,
    rc: RenderConfig,
    tc: TrainConfig,
    n_images: int,
    scales_init: Optional[np.ndarray] = None,
    shifts_init: Optional[np.ndarray] = None,
) -> TrainState:
    from scade_tpu.models.nerf import nerf_init

    k_coarse, k_fine = jax.random.split(key)
    params = {"coarse": nerf_init(k_coarse, rc.nerf_coarse)}
    params["fine"] = (
        nerf_init(k_fine, rc.nerf_fine) if rc.nerf_fine is not None else params["coarse"]
    )
    nerf_opt, ss_opt = make_optimizers(tc)
    if scales_init is not None:
        scales = jnp.asarray(scales_init, jnp.float32).reshape(n_images, 1)
    else:
        scales = jnp.full((n_images, 1), tc.scale_init, jnp.float32)
    if shifts_init is not None:
        shifts = jnp.asarray(shifts_init, jnp.float32).reshape(n_images, 1)
    else:
        shifts = jnp.full((n_images, 1), tc.shift_init, jnp.float32)
    return TrainState(
        params=params,
        opt_state=nerf_opt.init(params),
        scales=scales,
        shifts=shifts,
        ss_opt_state=ss_opt.init({"scales": scales, "shifts": shifts}),
        step=jnp.zeros((), jnp.int32),
    )


def scene_tensors_from_scene(scene, bb_center, bb_scale) -> SceneTensors:
    """Build device tensors from a loaded Scene, reproducing the reference's
    train+val repacking (run_scade_scannet.py:843-872): val/test splits get
    GT depth, train+val move to device, hypotheses cover the train split."""
    i_train, i_val = scene.i_train, scene.i_val
    if len(i_val) == 0:
        i_val = scene.i_test
    i_rel = np.concatenate([i_train, i_val], 0)
    return SceneTensors(
        images=jnp.asarray(scene.images[i_rel]),
        poses=jnp.asarray(scene.poses[i_rel]),
        intrinsics=jnp.asarray(scene.intrinsics[i_rel]),
        hyps=jnp.asarray(scene.depth_hypothesis),
        near=jnp.float32(scene.near),
        far=jnp.float32(scene.far),
        bb_center=jnp.asarray(bb_center, jnp.float32),
        bb_scale=jnp.asarray(bb_scale, jnp.float32),
    )


def _corner_mask(rows, cols, H: int, W: int, n_pix: int = 20):
    """space_carving corner mask (run_scade_scannet.py:818-830): zero out a
    20px square in each image corner."""
    in_r = jnp.logical_or(rows < n_pix, rows >= H - n_pix)
    in_c = jnp.logical_or(cols < n_pix, cols >= W - n_pix)
    return jnp.where(jnp.logical_and(in_r, in_c), 0.0, 1.0)


def _edge_mask(rows, cols, H: int, W: int, n_pix: int = 10):
    """wild-runner edge mask (run_scade_wild.py:818-830): zero a 10px border."""
    in_r = jnp.logical_or(rows < n_pix, rows >= H - n_pix)
    in_c = jnp.logical_or(cols < n_pix, cols >= W - n_pix)
    return jnp.where(jnp.logical_or(in_r, in_c), 0.0, 1.0)


def select_pixels(k_pix, H: int, W: int, tc: TrainConfig):
    """Per-step ray-pixel ids (select_coordinates,
    run_nerf_helpers.py:279-283); see TrainConfig.pixel_sampling for why
    stratified is the default on TPU."""
    if tc.pixel_sampling == "choice":
        return jax.random.choice(k_pix, H * W, (tc.n_rand,), replace=False)
    if tc.pixel_sampling == "iid":
        return jax.random.randint(k_pix, (tc.n_rand,), 0, H * W)
    # stratified
    u = jax.random.uniform(k_pix, (tc.n_rand,), dtype=jnp.float32)
    # Integer stratum boundaries, host-computed exactly: stratum i
    # covers [b[i], b[i+1]), disjoint and non-empty for n_rand <= H*W,
    # so the n_rand picks are distinct by construction even when
    # H*W % n_rand != 0 (the float-stride form floor((i+u)*s) could
    # duplicate across a non-integral boundary). Stratum sizes differ
    # by at most one, so the per-pixel marginal varies by at most
    # ceil(s)/floor(s); exactly uniform — and bitwise identical to
    # the float-stride form — when n_rand divides H*W.
    b = np.arange(tc.n_rand + 1, dtype=np.int64) * (H * W) // tc.n_rand
    lo = jnp.asarray(b[:-1], jnp.int32)
    size = jnp.asarray(b[1:] - b[:-1], jnp.float32)
    return lo + (u * size).astype(jnp.int32)


def sample_ray_batch(key, scene: SceneTensors, H: int, W: int, n_train: int, tc: TrainConfig):
    """On-device batch gather (reference
    get_ray_batch_from_one_image_hypothesis_idx, run_scade_scannet.py:772-828).
    Returns (rays_o, rays_d, target_s, target_h, sc_mask, img_i)."""
    k_img, k_pix = jax.random.split(key)
    img_i = jax.random.randint(k_img, (), 0, n_train)
    pix = select_pixels(k_pix, H, W, tc)
    rows = pix // W
    cols = pix % W
    coords = jnp.stack([rows, cols], axis=-1).astype(jnp.float32)

    rays_o, rays_d = get_rays(H, W, scene.intrinsics[img_i], scene.poses[img_i], coords=coords)
    target_s = scene.images[img_i, rows, cols]  # (n_rand, 3)
    target_h = scene.hyps[img_i][:, rows, cols]  # (K, n_rand, 1)
    if tc.mask_corners:
        sc_mask = _corner_mask(rows, cols, H, W)
    elif tc.mask_edges:
        sc_mask = _edge_mask(rows, cols, H, W)
    else:
        sc_mask = None
    return rays_o, rays_d, target_s, target_h, sc_mask, img_i


def make_train_step(
    rc: RenderConfig,
    tc: TrainConfig,
    H: int,
    W: int,
    n_train: int,
    data_spec=None,
    donate: bool = True,
):
    """Build the jitted train step: (state, scene, key) -> (state, metrics).

    `data_spec`: optional jax.sharding.NamedSharding/PartitionSpec applied to
    the gathered ray batch — rays shard over the mesh data axis, params stay
    replicated, and XLA reduces the loss/grads with psum over ICI.
    """
    nerf_opt, ss_opt = make_optimizers(tc)
    has_fine = rc.nerf_fine is not None

    def step_fn(state: TrainState, scene: SceneTensors, key):
        k_batch, k_render = jax.random.split(key)
        rays_o, rays_d, target_s, target_h, sc_mask, img_i = sample_ray_batch(
            k_batch, scene, H, W, n_train, tc
        )
        if data_spec is not None:
            constrain = lambda x: jax.lax.with_sharding_constraint(x, data_spec)
            rays_o, rays_d, target_s = map(constrain, (rays_o, rays_d, target_s))

        def loss_fn(diff):
            scene_vars = SceneVars(
                params_coarse=diff["params"]["coarse"],
                params_fine=diff["params"]["fine"],
                bb_center=scene.bb_center,
                bb_scale=scene.bb_scale,
                embedded_cam=jnp.zeros((rc.input_ch_cam,), jnp.float32),
            )
            out = render_rays(
                scene_vars, rc, rays_o, rays_d, scene.near, scene.far, key=k_render
            )
            if tc.mask_rgb and sc_mask is not None:
                # wild runner: RGB loss masked at image edges (:976-986)
                img_loss = jnp.mean((out["rgb_map"] - target_s) ** 2 * sc_mask[:, None])
            else:
                img_loss = img2mse(out["rgb_map"], target_s)
            loss = img_loss

            # per-image learned depth alignment of the hypotheses (:952-954)
            th = target_h * diff["scales"][img_i] + diff["shifts"][img_i]
            sc_loss = compute_space_carving_loss(
                out["pred_hyp"],
                th,
                is_joint=tc.is_joint,
                mask=sc_mask,
                norm_p=tc.norm_p,
                threshold=tc.space_carving_threshold,
            )
            sc_active = jnp.asarray(False)
            if tc.space_carving_weight > 0.0:
                # active only after warm_start_nerf iters (:971-977)
                sc_active = state.step + 1 > tc.warm_start_nerf
                w_sc = jnp.where(sc_active, tc.space_carving_weight, 0.0)
                loss = loss + w_sc * sc_loss

            # the reference logs a ZERO space_carving_loss while the term is
            # inactive (warm phase / weight 0 — run_scade_scannet.py:972-977);
            # match that so TB curves line up
            metrics = {
                "img_loss": img_loss,
                "space_carving_loss": jnp.where(sc_active, sc_loss, 0.0),
            }
            if has_fine:
                if tc.mask_rgb and sc_mask is not None:
                    img_loss0 = jnp.mean(
                        (out["rgb0"] - target_s) ** 2 * sc_mask[:, None]
                    )
                else:
                    img_loss0 = img2mse(out["rgb0"], target_s)
                loss = loss + img_loss0  # coarse head supervision (:980-983)
                metrics["img_loss0"] = img_loss0
            metrics["loss"] = loss
            return loss, metrics

        diff = {"params": state.params, "scales": state.scales, "shifts": state.shifts}
        grads, metrics = jax.grad(loss_fn, has_aux=True)(diff)

        updates, opt_state = nerf_opt.update(
            grads["params"], state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        ss_grads = {"scales": grads["scales"], "shifts": grads["shifts"]}
        ss_params = {"scales": state.scales, "shifts": state.shifts}
        ss_updates, ss_opt_state = ss_opt.update(ss_grads, state.ss_opt_state, ss_params)
        # freeze scale/shift after freeze_ss iterations (:996-997). The
        # reference stops calling optimizer_ss.step() entirely; we zero the
        # update but still advance the Adam moments (a fixed-program-shape
        # necessity). Parameter VALUES match exactly; the frozen-phase
        # optimizer state differs, which is unobservable unless a run is
        # un-frozen later (the reference never does).
        frozen = state.step + 1 >= tc.freeze_ss
        ss_updates = jax.tree.map(
            lambda u: jnp.where(frozen, jnp.zeros_like(u), u), ss_updates
        )
        ss_new = optax.apply_updates(ss_params, ss_updates)

        metrics["psnr"] = mse2psnr(metrics["img_loss"])
        if has_fine:
            metrics["psnr0"] = mse2psnr(metrics["img_loss0"])
        metrics["lr"] = staircase_lr(tc)(state.step)
        metrics["depth_scale_mean"] = jnp.mean(ss_new["scales"][:n_train])
        metrics["depth_shift_mean"] = jnp.mean(ss_new["shifts"][:n_train])

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            scales=ss_new["scales"],
            shifts=ss_new["shifts"],
            ss_opt_state=ss_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)
