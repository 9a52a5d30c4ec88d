"""Host-side training loop: cadence, checkpoints, logging, final test.

The device does all per-step work (see scade_tpu.train.step); this loop only
splits RNG keys, fetches metrics at the i_print cadence (fetching every step
would stall the device pipeline — on deferred-execution backends it would
also serialize dispatch), and handles i_weights / i_img / final-test side
effects (reference cadence: run_scade_scannet.py:1002-1087).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.eval.evaluate import (
    render_images_with_metrics,
    write_images_with_metrics,
)
from scade_tpu.eval.lpips_jax import LPIPSAlex
from scade_tpu.ops.rays import get_rays
from scade_tpu.render.renderer import SceneVars, make_render_config
from scade_tpu.train.step import (
    TrainConfig,
    create_train_state,
    make_train_step,
    scene_tensors_from_scene,
)
from scade_tpu.utils.ckpt import (
    find_checkpoints,
    load_params_from_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from scade_tpu.utils.logging import Writer


def compute_scene_bounds(scene):
    """Scene bbox from far-plane points of all train rays
    (reference run_nerf, run_scade_scannet.py:1236-1244).

    One jitted lax.map over the train images (per-image min/max reduced
    in-program) instead of a Python loop of per-image dispatches — on a
    1000-image scene over a remote-device tunnel the loop form paid N
    dispatch round trips for a one-off reduction. min/max are exact, so
    the bounds are identical to the loop's."""
    H, W = scene.H, scene.W

    @jax.jit
    def bounds(intrinsics, poses, far):
        def one(args):
            intr, pose = args
            rays_o, rays_d = get_rays(H, W, intr, pose)
            pts = (rays_o + rays_d * far).reshape(-1, 3)
            return pts.min(0), pts.max(0)

        mins, maxs = jax.lax.map(one, (intrinsics, poses))
        return mins.min(0), maxs.max(0)

    min_xyz, max_xyz = bounds(
        jnp.asarray(scene.intrinsics[scene.i_train]),
        jnp.asarray(scene.poses[scene.i_train]),
        jnp.float32(scene.far),
    )
    min_xyz = np.minimum(np.asarray(min_xyz), np.full((3,), 1e6, np.float32))
    max_xyz = np.maximum(np.asarray(max_xyz), np.full((3,), -1e6, np.float32))
    bb_center = (max_xyz + min_xyz) / 2.0
    bb_scale = 2.0 / (max_xyz - min_xyz).max()
    return bb_center, float(bb_scale)


def args_to_configs(args):
    """CLI args → (RenderConfig, TrainConfig)."""
    rc = make_render_config(
        multires=args.multires,
        multires_views=args.multires_views,
        i_embed=args.i_embed,
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        netdepth_fine=args.netdepth_fine,
        netwidth_fine=args.netwidth_fine,
        n_samples=args.N_samples,
        n_importance=args.N_importance,
        perturb=args.perturb > 0.0,
        raw_noise_std=args.raw_noise_std,
        lindisp=args.lindisp,
        is_joint=args.is_joint,
        use_viewdirs=args.use_viewdirs,
        input_ch_cam=args.input_ch_cam,
        compute_dtype=jnp.bfloat16
        if args.compute_dtype == "bfloat16"
        else jnp.float32,
        use_fused=getattr(args, "use_fused", False),
    )
    tc = TrainConfig(
        n_rand=args.N_rand,
        num_iterations=args.num_iterations,
        lrate=args.lrate,
        decay_step=args.decay_step,
        decay_rate=args.decay_rate,
        scaleshift_lr=args.scaleshift_lr,
        scale_init=args.scale_init,
        shift_init=args.shift_init,
        freeze_ss=args.freeze_ss,
        warm_start_nerf=args.warm_start_nerf,
        space_carving_weight=args.space_carving_weight,
        space_carving_threshold=args.space_carving_threshold,
        is_joint=args.is_joint,
        norm_p=args.norm_p,
        mask_corners=getattr(args, "mask_corners", False),
        mask_edges=getattr(args, "mask_edges", False),
        # the wild runner masks the RGB loss whenever a pixel mask exists
        # (run_scade_wild.py:976-1008); set by run_scade_wild.py
        mask_rgb=getattr(args, "mask_rgb", False),
        pixel_sampling=getattr(args, "pixel_sampling", "stratified"),
    )
    return rc, tc


def _tb_grid(images: dict, with0: bool) -> np.ndarray:
    """Side-by-side columns of vertically stacked renders, matching the
    reference's torchvision make_grid(nrow=1) concatenation along width
    (run_scade_scannet.py:1044-1048 train, :1063-1074 val — the val grid
    interleaves the coarse rgbs0/depths0 columns when present)."""
    from scade_tpu.utils.logging import make_image_grid

    keys = ["rgbs"]
    if with0 and "rgbs0" in images:
        keys.append("rgbs0")
    keys.append("target_rgbs")
    keys.append("depths")
    if with0 and "depths0" in images:
        keys.append("depths0")
    keys.append("target_depths")
    return np.concatenate([make_image_grid(images[k]) for k in keys], axis=1)


def train_nerf(scene, args):
    """Full SCADE training (reference train_nerf :830-1089). `scene` is a
    loaded scade_tpu.data.Scene. Returns the final TrainState."""
    rc, tc = args_to_configs(args)
    key = jax.random.PRNGKey(args.seed)

    # val/test get GT depth when available (:843-847)
    if scene.gt_depths is not None:
        for idx in (scene.i_test, scene.i_val):
            scene.depths[idx] = scene.gt_depths[idx]
            scene.valid_depths[idx] = scene.gt_valid_depths[idx]

    bb_center, bb_scale = compute_scene_bounds(scene)
    st = scene_tensors_from_scene(scene, bb_center, bb_scale)
    n_train = len(scene.i_train)
    n_rel = int(st.images.shape[0])

    key, k_init = jax.random.split(key)
    state = create_train_state(
        k_init, rc, tc, n_images=n_rel,
        scales_init=scene.scales_init, shifts_init=scene.shifts_init,
    )

    run_dir = os.path.join(args.ckpt_dir, args.expname)
    os.makedirs(run_dir, exist_ok=True)
    start = 0
    resumed = False
    if not args.no_reload:
        ckpts = find_checkpoints(args.ckpt_dir, args.expname)
        if ckpts:
            print(f"Reloading from {ckpts[-1]}")
            state = restore_train_state(ckpts[-1], state, rc)
            start = int(state.step)
            resumed = True
    if args.load_pretrained and resumed:
        # Resume wins over warm start: re-applying the pretrained bundle
        # would discard `start` iterations of progress and reset the step.
        # Matches the reference's effective behavior — its load_pretrained
        # block never calls load_state_dict (run_scade_scannet.py:915-926,
        # the updated dicts are discarded) and never rewinds `start`.
        print(
            f"Run checkpoint found at step {start}; ignoring "
            "--load_pretrained (resume takes precedence)"
        )
    elif args.load_pretrained:
        ckpts = find_checkpoints(
            os.path.dirname(args.pretrained_dir.rstrip("/")),
            os.path.basename(args.pretrained_dir.rstrip("/")),
        )
        if not ckpts:
            raise FileNotFoundError(f"no ckpts in {args.pretrained_dir}")
        print(f"Warm-starting from {ckpts[-1]}")
        # weights + depth scales/shifts ONLY: the reference's warm start
        # keeps the freshly-built optimizer (create_nerf constructs it new;
        # the load_pretrained block loads just the state dicts,
        # run_scade_scannet.py:906-938). Restoring the donor's optax state
        # would carry its LR-schedule count (a donor past decay_step trains
        # the whole new run at the decayed LR) and its Adam moments.
        params, _, raw = load_params_from_checkpoint(ckpts[-1], rc)
        kwargs = dict(params=params, step=jnp.zeros((), jnp.int32))
        if "depth_scales" in raw:
            kwargs["scales"] = jnp.asarray(
                raw["depth_scales"], jnp.float32
            ).reshape(state.scales.shape)
        if "depth_shifts" in raw:
            kwargs["shifts"] = jnp.asarray(
                raw["depth_shifts"], jnp.float32
            ).reshape(state.shifts.shape)
        state = state._replace(**kwargs)

    # multi-device: shard the ray batch over a data mesh; params replicate
    # and XLA inserts psums over ICI (multi-host joins the same mesh after
    # jax.distributed.initialize() in the CLI)
    n_dev = jax.device_count()
    if n_dev > 1:
        from scade_tpu.parallel.mesh import (
            data_sharding,
            make_mesh,
            replicate,
            state_shardings,
        )

        if tc.n_rand % n_dev != 0:
            new_n_rand = -(-tc.n_rand // n_dev) * n_dev
            print(
                f"WARNING: N_rand={tc.n_rand} not divisible by "
                f"{n_dev} devices; rounding up to {new_n_rand}"
            )
            tc = dataclasses.replace(tc, n_rand=new_n_rand)
        mesh = make_mesh()
        # eval renders shard over the FULL mesh, multihost included: every
        # process calls the render (its devices compute a ray stripe, the
        # renderer all-gathers the finished maps), and only process 0
        # writes TB images / files below
        eval_mesh = mesh
        print(f"Training data-parallel over {n_dev} devices")
        state = jax.device_put(state, state_shardings(state, mesh))
        st = jax.device_put(st, replicate(mesh))
        step_fn = make_train_step(
            rc, tc, scene.H, scene.W, n_train, data_spec=data_sharding(mesh)
        )
    else:
        eval_mesh = None
        step_fn = make_train_step(rc, tc, scene.H, scene.W, n_train)

    # multi-host: only process 0 performs filesystem side effects — all
    # hosts run the same jitted steps (they must, for the collectives), but
    # checkpoints/logs/test renders are written once
    is_primary = jax.process_index() == 0
    # the wild runner logs under runs_prior_corrected (run_scade_wild.py:842)
    tb_root = "runs_prior_corrected" \
        if getattr(args, "variant", "scannet") == "wild" else "runs"
    tb = Writer(os.path.join(tb_root, args.expname)) if is_primary else None
    lpips_fn = LPIPSAlex()

    def scene_vars(params):
        return SceneVars(
            params_coarse=params["coarse"],
            params_fine=params["fine"],
            bb_center=st.bb_center,
            bb_scale=st.bb_scale,
            embedded_cam=jnp.zeros((rc.input_ch_cam,), jnp.float32),
        )

    base_key = jax.random.PRNGKey(args.seed + 1)
    i_val_local = np.arange(n_train, n_rel)
    if len(i_val_local) == 0:
        i_val_local = np.arange(n_train)

    metrics = {}
    _iimg_arrays = None  # lazily-built loop-invariant i_img render inputs
    for i in range(start + 1, tc.num_iterations + 1):
        state, metrics = step_fn(state, st, jax.random.fold_in(base_key, i))

        if i % args.i_weights == 0 and is_primary:
            path = os.path.join(run_dir, f"{i:06d}.tar")
            save_checkpoint(path, jax.device_get(state), rc)
            print(f"Saved checkpoints at {path}")

        if i % args.i_print == 0 and is_primary:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            tb.add_scalars("mse", {"train": m["img_loss"]}, i)
            if tc.space_carving_weight > 0.0:
                tb.add_scalars(
                    "space_carving_loss", {"train": m["space_carving_loss"]}, i
                )
            tb.add_scalars("psnr", {"train": m["psnr"]}, i)
            if "img_loss0" in m:
                tb.add_scalars("mse0", {"train": m["img_loss0"]}, i)
                tb.add_scalars("psnr0", {"train": m["psnr0"]}, i)
            tb.add_scalars("depth_scale_mean", {"train": m["depth_scale_mean"]}, i)
            tb.add_scalars("depth_shift_mean", {"train": m["depth_shift_mean"]}, i)
            print(
                f"[TRAIN] Iter: {i} Loss: {m['loss']:.6f}  PSNR: {m['psnr']:.3f}"
                f"  MSE: {m['img_loss']:.6f} Space carving: "
                f"{m['space_carving_loss']:.6f}"
            )

        # multihost: every process must participate in the sharded eval
        # renders (they contain cross-process collectives); non-primary
        # processes render and discard — only is_primary writes TB/files
        all_render = eval_mesh is not None and jax.process_count() > 1
        if i % args.i_img == 0 and (is_primary or all_render):
            sv = scene_vars(state.params)
            if _iimg_arrays is None:
                # all of these already live on the host in `scene` — indexing
                # there avoids re-fetching the (possibly hundreds of MB)
                # image stack from the device at every i_img; computed once,
                # they are loop-invariant. Rows must align with st.images:
                # train split then the substituted val split (test when
                # i_val is empty) — mirror scene_tensors_from_scene
                # (reference :843-847)
                i_val_global = scene.i_val if len(scene.i_val) else scene.i_test
                i_rel = (
                    np.concatenate([scene.i_train, i_val_global])
                    if len(i_val_global)
                    else scene.i_train
                )
                _iimg_arrays = (
                    scene.images[i_rel], scene.depths[i_rel],
                    scene.valid_depths[i_rel], scene.poses[i_rel],
                    scene.intrinsics[i_rel],
                )
            imgs_np, depths_np, valid_np, poses_np, intr_np = _iimg_arrays
            # 2 train renders → TB image grid (reference :1041-1048)
            # the subset rngs are seeded by the STEP, so every process draws
            # the same image indices — a requirement when the render inputs
            # feed cross-process collectives
            _, images_train = render_images_with_metrics(
                min(2, n_train), np.arange(n_train), imgs_np, depths_np,
                valid_np, poses_np, scene.H, scene.W, intr_np, sv, rc,
                scene.near, scene.far, chunk=args.chunk // 2,
                lpips_fn=lpips_fn, rng=np.random.default_rng(i),
                mesh=eval_mesh, verbose=is_primary,
            )
            # val metrics + 8 val renders (reference :1050-1074)
            mean_val, images_val = render_images_with_metrics(
                min(8, len(i_val_local)), i_val_local, imgs_np, depths_np,
                valid_np, poses_np, scene.H, scene.W, intr_np, sv, rc,
                scene.near, scene.far, chunk=args.chunk // 2,
                lpips_fn=lpips_fn, rng=np.random.default_rng(i + 1),
                mesh=eval_mesh, verbose=is_primary,
            )
            if is_primary:
                tb.add_image(
                    "train_image", _tb_grid(images_train, with0=False), i
                )
                tb.add_scalars("mse", {"val": mean_val.get("img_loss")}, i)
                tb.add_scalars("psnr", {"val": mean_val.get("psnr")}, i)
                tb.add_scalar("ssim", mean_val.get("ssim"), i)
                tb.add_scalar("lpips", mean_val.get("lpips"), i)
                if mean_val.has("depth_rmse"):
                    tb.add_scalar("depth_rmse", mean_val.get("depth_rmse"), i)
                if mean_val.has("img_loss0"):
                    tb.add_scalars(
                        "mse0", {"val": mean_val.get("img_loss0")}, i
                    )
                    tb.add_scalars(
                        "psnr0", {"val": mean_val.get("psnr0")}, i
                    )
                tb.add_image("val_image", _tb_grid(images_val, with0=True), i)

        if i == tc.num_iterations and (is_primary or all_render):
            sv = scene_vars(state.params)
            test_idx = np.arange(len(scene.i_test))
            mean_test, images_test = render_images_with_metrics(
                None, test_idx,
                scene.images[scene.i_test], scene.depths[scene.i_test],
                scene.valid_depths[scene.i_test], scene.poses[scene.i_test],
                scene.H, scene.W, scene.intrinsics[scene.i_test],
                sv, rc, scene.near, scene.far, chunk=args.chunk // 2,
                lpips_fn=lpips_fn, mesh=eval_mesh, verbose=is_primary,
            )
            if is_primary:
                write_images_with_metrics(
                    images_test, mean_test, scene.far, args.ckpt_dir,
                    args.expname, args.scene_id,
                )
                tb.flush()

    return state
