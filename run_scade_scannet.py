#!/usr/bin/env python
"""SCADE on ScanNet — TPU-native CLI, drop-in for the reference runner.

Tasks (reference: run_scade_scannet.py:1207-1291):
  train     optimize a per-scene NeRF with the space-carving loss
  test      render the test split from the newest checkpoint + metrics
  test_opt  same, with per-image camera-latent test-time optimization
  video     render the video trajectory to mp4

Usage:
  python run_scade_scannet.py train --data_dir <dir> --scene_id scene0758_00 \
      --cimle_dir dump_1102_scene0758_sfmaligned_indv --ckpt_dir ckpts
  python run_scade_scannet.py test --expname <exp> ...
"""

import datetime
import json
import os
import sys
import time


def main(variant: str = "scannet", argv=None):
    # honor SCADE_PLATFORM=cpu|tpu|axon (the axon sitecustomize pins
    # jax_platforms, so the JAX_PLATFORMS env var alone is ignored)
    if os.environ.get("SCADE_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])

    from scade_tpu.utils.config import parse_args

    args = parse_args(variant=variant, argv=argv)

    if getattr(args, "multihost", False):
        import jax

        # cluster auto-detection (TPU pods, Slurm) when no env override;
        # explicit SCADE_COORDINATOR/SCADE_NUM_PROCESSES/SCADE_PROCESS_ID
        # env vars drive by-hand launches (and the 2-process smoke test)
        kw = {}
        if os.environ.get("SCADE_COORDINATOR"):
            kw = dict(
                coordinator_address=os.environ["SCADE_COORDINATOR"],
                num_processes=int(os.environ["SCADE_NUM_PROCESSES"]),
                process_id=int(os.environ["SCADE_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        print(
            f"multihost: process {jax.process_index()}/{jax.process_count()},"
            f" {jax.device_count()} devices total"
        )
        if args.task == "train" and args.expname is None:
            # wall-clock-derived names would skew across hosts and scatter
            # one logical run over several directories
            sys.exit("--expname is required for multihost training")

    if args.task == "train" and args.expname is None:
        stamp = datetime.datetime.fromtimestamp(time.time()).strftime(
            "%Y%m%d_%H%M%S"
        )
        args.expname = f"{stamp}_{args.scene_id}"
    if args.task != "train" and args.expname is None:
        sys.exit(f'--expname is required for task "{args.task}"')

    if args.task == "train":
        import jax

        if jax.process_index() == 0:
            run_dir = os.path.join(args.ckpt_dir, args.expname)
            os.makedirs(run_dir, exist_ok=True)
            with open(os.path.join(run_dir, "args.json"), "w") as af:
                json.dump(vars(args), af, indent=4)

    print("\n".join(f"{k}={v}" for k, v in vars(args).items()))

    import numpy as np

    from scade_tpu.data.scene import load_scene_processed, load_scene_scannet

    scene_data_dir = os.path.join(args.data_dir, args.scene_id)
    if variant == "scannet":
        scene = load_scene_scannet(
            scene_data_dir, args.cimle_dir, args.num_hypothesis,
            args.train_jsonfile,
        )
    else:
        scene = load_scene_processed(
            scene_data_dir, args.cimle_dir, args.num_hypothesis,
            args.train_jsonfile,
        )
        # the wild runner masks the RGB loss wherever a pixel mask exists
        args.mask_rgb = bool(
            getattr(args, "mask_edges", False) or args.mask_corners
        )

    if args.task == "train":
        from scade_tpu.train.loop import train_nerf

        train_nerf(scene, args)
        return

    # ---- test / test_opt / video: load newest ckpt, freeze params --------
    import jax as _jax

    if _jax.process_index() != 0 and args.task == "test_opt":
        # test_opt's per-image camera-latent optimization is a single-
        # device program with host-side control flow; extra hosts would
        # redundantly optimize and race on the latent files. Plain test/
        # video DO run on every process below: rays shard over the global
        # mesh, outputs all-gather, and only process 0 writes.
        print(
            f"process {_jax.process_index()}: test_opt runs on process 0 "
            "only; exiting"
        )
        return

    import jax.numpy as jnp

    from scade_tpu.eval.evaluate import (
        optimize_camera_embedding,
        render_images_with_metrics,
        render_video,
        write_images_with_metrics,
    )
    from scade_tpu.render.renderer import SceneVars
    from scade_tpu.train.loop import args_to_configs, compute_scene_bounds
    from scade_tpu.utils.ckpt import find_checkpoints, load_params_from_checkpoint

    rc, _ = args_to_configs(args)
    # multi-device: shard eval rays over all devices (renderer shard_map)
    import jax

    eval_mesh = None
    multihost = jax.process_count() > 1
    if jax.device_count() > 1 and (not multihost or args.task != "test_opt"):
        # test/video shard rays over the GLOBAL mesh (multihost included:
        # every process renders its stripe, the renderer all-gathers the
        # maps, process 0 writes). test_opt keeps its single-process path
        # — non-0 processes exited above.
        from scade_tpu.parallel.mesh import make_mesh

        eval_mesh = make_mesh()
        print(f"Rendering sharded over {jax.device_count()} devices")
    is_primary = jax.process_index() == 0
    ckpts = find_checkpoints(args.ckpt_dir, args.expname)
    if not ckpts:
        sys.exit(f"no checkpoints found in {args.ckpt_dir}/{args.expname}")
    print(f"Loading checkpoint {ckpts[-1]}")
    params, global_step, raw = load_params_from_checkpoint(ckpts[-1], rc)

    bb_center, bb_scale = compute_scene_bounds(scene)
    sv = SceneVars(
        params_coarse=params["coarse"],
        params_fine=params["fine"],
        bb_center=jnp.asarray(bb_center, jnp.float32),
        bb_scale=jnp.float32(bb_scale),
        embedded_cam=jnp.zeros((args.input_ch_cam,), jnp.float32),
    )

    if args.task in ("test", "test_opt"):
        i_test = scene.i_test
        if scene.gt_depths is not None:
            depths = scene.gt_depths[i_test]
            valid = scene.gt_valid_depths[i_test]
        else:
            depths = scene.depths[i_test]
            valid = scene.valid_depths[i_test]

        with_opt = args.task == "test_opt"
        embedded_cams = None
        if with_opt and args.input_ch_cam > 0:
            # per-image latent optimization (reference :266-302; upstream is
            # broken — we implement the intended behavior). Each test image
            # is then rendered with ITS OWN optimized latent.
            result_dir = os.path.join(
                args.ckpt_dir, args.expname, "test_latent_codes_" + args.scene_id
            )
            os.makedirs(result_dir, exist_ok=True)
            embedded_cams = []
            for k, idx in enumerate(i_test):
                emb = optimize_camera_embedding(
                    scene.images[idx], scene.poses[idx], scene.H, scene.W,
                    scene.intrinsics[idx], sv, rc, scene.near, scene.far,
                    args.input_ch_cam, n_rand=args.N_rand,
                )
                np.savetxt(os.path.join(result_dir, f"{k}.txt"), np.asarray(emb))
                embedded_cams.append(np.asarray(emb))

        mean_metrics, images_test = render_images_with_metrics(
            None, np.arange(len(i_test)),
            scene.images[i_test], depths, valid, scene.poses[i_test],
            scene.H, scene.W, scene.intrinsics[i_test],
            sv, rc, scene.near, scene.far, chunk=args.chunk // 2,
            embedded_cams=embedded_cams, mesh=eval_mesh,
            verbose=is_primary,
        )
        if is_primary:
            write_images_with_metrics(
                images_test, mean_metrics, scene.far, args.ckpt_dir,
                args.expname, args.scene_id,
                with_test_time_optimization=with_opt,
            )
    elif args.task == "video":
        i_video = scene.i_video
        render_video(
            scene.poses[i_video], scene.H, scene.W, scene.intrinsics[i_video],
            "0", args.ckpt_dir, args.expname, sv, rc,
            scene.near, scene.far, chunk=args.chunk // 2, mesh=eval_mesh,
        )
    else:
        sys.exit(f"unknown task {args.task}")


if __name__ == "__main__":
    main("scannet")
