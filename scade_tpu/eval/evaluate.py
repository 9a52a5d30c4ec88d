"""Test-set evaluation and video rendering.

Mirrors the reference's eval pipeline (reference: run_scade_scannet.py:
304-409 render/write_images_with_metrics, :236-264 render_video, :266-302
optimize_camera_embedding) with the render itself running as one jitted
program per image and metrics computed in jnp (SSIM included — no skimage
dependency in the hot path; LPIPS via scade_tpu.eval.lpips_jax, gated on
exported weights).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.eval.lpips_jax import LPIPSAlex
from scade_tpu.ops.losses import img2mse, mse2psnr
from scade_tpu.ops.metrics import compute_rmse, ssim, to8b, to16b
from scade_tpu.render.renderer import SceneVars, render_image
from scade_tpu.utils.logging import MeanTracker


def render_images_with_metrics(
    count: Optional[int],
    indices,
    images,
    depths,
    valid_depths,
    poses,
    H: int,
    W: int,
    intrinsics,
    scene: SceneVars,
    rc,
    near: float,
    far: float,
    chunk: int = 16384,
    lpips_fn: Optional[LPIPSAlex] = None,
    rng: Optional[np.random.Generator] = None,
    verbose: bool = True,
    embedded_cams=None,
    mesh=None,
):
    """Render `count` images (None = all, in order) and accumulate
    PSNR/SSIM/LPIPS/RMSE (reference :304-394). Returns (MeanTracker, dict of
    stacked result images, HWC numpy)."""
    if count is None:
        count = len(indices)
        img_i = np.asarray(indices)
    else:
        rng = rng or np.random.default_rng()
        img_i = rng.choice(np.asarray(indices), size=count, replace=False)

    lpips_fn = lpips_fn or LPIPSAlex()
    has_fine = rc.nerf_fine is not None

    res = {
        "rgbs": np.empty((count, H, W, 3), np.float32),
        "target_rgbs": np.empty((count, H, W, 3), np.float32),
        "depths": np.empty((count, H, W, 1), np.float32),
        "target_depths": np.empty((count, H, W, 1), np.float32),
        "target_valid_depths": np.empty((count, H, W), bool),
    }
    if has_fine:
        res["rgbs0"] = np.empty((count, H, W, 3), np.float32)
        res["depths0"] = np.empty((count, H, W, 1), np.float32)

    mean_metrics = MeanTracker()
    mean_depth_metrics = MeanTracker()
    for n, img_idx in enumerate(img_i):
        target = np.asarray(images[img_idx])
        target_depth = np.asarray(depths[img_idx])
        target_valid = np.asarray(valid_depths[img_idx]).astype(bool)

        if embedded_cams is not None:
            # per-image optimized camera latent (test_opt, reference
            # run_scade_scannet.py:404-418 embedcam handling). embedded_cams
            # is aligned with `indices`, not with the (possibly subsampled,
            # shuffled) iteration order — index by img_idx's position in
            # indices so the count=K random-subset path stays aligned.
            cam_pos = int(np.asarray(indices).tolist().index(int(img_idx)))
            scene = scene._replace(
                embedded_cam=jnp.asarray(embedded_cams[cam_pos])
            )
        out = render_image(
            scene, rc, H, W,
            jnp.asarray(intrinsics[img_idx]), jnp.asarray(poses[img_idx]),
            near, far, chunk=chunk, mesh=mesh,
            # only the read maps: the per-sample leaves (z_vals/weights/
            # pred_hyp, ~192 f32 per ray) would otherwise be stacked into
            # HBM as jit outputs — ~1 GB per full-res image
            outputs=("rgb_map", "depth_map", "rgb0", "depth0")
            if has_fine else ("rgb_map", "depth_map"),
        )
        rgb = np.asarray(out["rgb_map"])
        depth = np.asarray(out["depth_map"])

        if target_valid.any():
            depth_rmse = float(
                compute_rmse(
                    jnp.asarray(depth),
                    jnp.asarray(target_depth[..., 0]),
                    mask=jnp.asarray(target_valid),
                )
            )
            if np.isfinite(depth_rmse):
                mean_depth_metrics.add({"depth_rmse": depth_rmse})

        img_loss = float(img2mse(jnp.asarray(rgb), jnp.asarray(target)))
        psnr = float(mse2psnr(jnp.asarray(img_loss)))
        rgb_c = np.clip(rgb, 0.0, 1.0)
        ssim_val = float(ssim(jnp.asarray(rgb_c), jnp.asarray(target)))
        lpips_val = lpips_fn(rgb_c, target)

        res["rgbs"][n] = rgb_c
        res["target_rgbs"][n] = target
        res["depths"][n] = (depth / far)[..., None]
        res["target_depths"][n] = (target_depth[..., :1] / far)
        res["target_valid_depths"][n] = target_valid

        # lpips is always reported (NaN-explicit when weights are absent)
        # so metrics.txt keeps the column the reference always prints
        # (reference :371,384)
        metrics = {
            "img_loss": img_loss, "psnr": psnr, "ssim": ssim_val,
            "lpips": lpips_val,
        }
        if has_fine:
            img_loss0 = float(img2mse(jnp.asarray(out["rgb0"]), jnp.asarray(target)))
            metrics["img_loss0"] = img_loss0
            metrics["psnr0"] = float(mse2psnr(jnp.asarray(img_loss0)))
            res["rgbs0"][n] = np.clip(np.asarray(out["rgb0"]), 0, 1)
            res["depths0"][n] = (np.asarray(out["depth0"]) / far)[..., None]
        mean_metrics.add(metrics)
        if verbose:
            print(f"Render image {n + 1}/{count}  PSNR: {psnr:.2f}")

    all_mean = MeanTracker()
    all_mean.add({**mean_metrics.as_dict(), **mean_depth_metrics.as_dict()})
    return all_mean, res


def write_images_with_metrics(
    images: dict,
    mean_metrics: MeanTracker,
    far: float,
    ckpt_dir: str,
    expname: str,
    scene_id: str,
    with_test_time_optimization: bool = False,
):
    """<ckpt_dir>/<expname>/test_images_<scene>/{n_rgb.jpg, n_d.png(16b),
    metrics.txt} (reference :396-409)."""
    import cv2

    result_dir = os.path.join(
        ckpt_dir, expname,
        "test_images_"
        + ("with_optimization_" if with_test_time_optimization else "")
        + scene_id,
    )
    os.makedirs(result_dir, exist_ok=True)
    for n, (rgb, depth) in enumerate(zip(images["rgbs"], images["depths"])):
        cv2.imwrite(
            os.path.join(result_dir, f"{n}_rgb.jpg"),
            cv2.cvtColor(to8b(rgb), cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(os.path.join(result_dir, f"{n}_d.png"), to16b(depth))

    with open(os.path.join(result_dir, "metrics.txt"), "w") as f:
        mean_metrics.print(f)
    mean_metrics.print()
    return result_dir


def render_video(
    poses,
    H: int,
    W: int,
    intrinsics,
    filename: str,
    ckpt_dir: str,
    expname: str,
    scene: SceneVars,
    rc,
    near: float,
    far: float,
    chunk: int = 16384,
    fps: int = 25,
    every: int = 3,
    mesh=None,
):
    """Spiral/trajectory video: every 3rd pose, 16:9 frames of
    [rgb | turbo(depth/far) | viridis(depth_std)] → ffmpeg mp4
    (reference :236-264).

    Multihost: every process must call this (each renders its ray shard of
    every frame; the renderer all-gathers the maps), but only process 0
    touches the filesystem — frame writes, the encoder, and the directory
    reset are all guarded here so call sites stay process-agnostic."""
    import cv2

    import jax

    is_primary = jax.process_index() == 0
    video_dir = os.path.join(ckpt_dir, expname, "video_" + filename)
    if is_primary:
        if os.path.exists(video_dir):
            shutil.rmtree(video_dir)
        os.makedirs(video_dir, exist_ok=True)

    max_depth_in_video = 0.0
    for img_idx in range(0, len(poses), every):
        out = render_image(
            scene, rc, H, W,
            jnp.asarray(intrinsics[img_idx]), jnp.asarray(poses[img_idx]),
            near, far, chunk=chunk, with_5_9=True, mesh=mesh,
            outputs=("rgb_map", "depth_map", "z_vals", "weights"),
        )
        rgb8 = to8b(np.asarray(out["rgb_map"]))
        frame = cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR)

        depth = np.asarray(out["depth_map"])
        max_depth_in_video = max(max_depth_in_video, float(depth.max()))
        depth_frame = cv2.applyColorMap(to8b(depth / far), cv2.COLORMAP_TURBO)
        frame = np.concatenate((frame, depth_frame), 1)

        z_vals = np.asarray(out["z_vals"])
        weights = np.asarray(out["weights"])
        depth_var = np.sum((z_vals - depth[..., None]) ** 2 * weights, -1)
        depth_std = np.sqrt(np.clip(depth_var, 0.0, 1.0))
        frame = np.concatenate(
            (frame, cv2.applyColorMap(to8b(depth_std), cv2.COLORMAP_VIRIDIS)), 1
        )
        if is_primary:
            cv2.imwrite(os.path.join(video_dir, f"{img_idx}.jpg"), frame)

    if not is_primary:
        return None
    video_file = os.path.join(ckpt_dir, expname, filename + ".mp4")
    frame_names = sorted(
        (f for f in os.listdir(video_dir) if f.endswith(".jpg")),
        key=lambda f: int(f.split(".")[0]),
    )
    if shutil.which("ffmpeg") is not None:
        # the reference invokes ffmpeg with '%d.jpg' and '-crf str(fps)'
        # (run_scade_scannet.py:264) — but its frames are named by pose
        # index stepping `every`, so the image2 sequence demuxer stops at
        # the first gap (a 1-frame mp4), and fps lands in the CRF quality
        # knob. Both are genuinely broken; fixed here via the gap-tolerant
        # concat demuxer and a constant CRF (PARITY.md known deviations).
        list_path = os.path.join(video_dir, "frames.txt")
        with open(list_path, "w") as fp:
            for f in frame_names:
                fp.write(f"file '{os.path.abspath(os.path.join(video_dir, f))}'\n")
        subprocess.call(
            ["ffmpeg", "-y", "-r", str(fps), "-f", "concat", "-safe", "0",
             "-i", list_path, "-c:v", "libx264", "-profile:v", "high",
             "-crf", "23", "-pix_fmt", "yuv420p", video_file]
        )
    else:
        # no ffmpeg in this image: first try imageio's mp4 writer (present
        # only when an ffmpeg/pyav backend is installed), else write the
        # frames as an MJPEG AVI — a playable video file from pure Python
        # (scade_tpu/utils/video.py); the per-frame jpgs stay alongside
        try:
            import imageio.v2 as imageio

            with imageio.get_writer(video_file, fps=fps) as w:
                for f in frame_names:
                    w.append_data(imageio.imread(os.path.join(video_dir, f)))
        except Exception:
            try:
                from scade_tpu.utils.video import write_mjpeg_avi

                jpegs = []
                size = None
                for f in frame_names:
                    p = os.path.join(video_dir, f)
                    with open(p, "rb") as fp:
                        jpegs.append(fp.read())
                    if size is None:
                        img = cv2.imread(p)
                        size = (img.shape[1], img.shape[0])
                video_file = os.path.join(
                    ckpt_dir, expname, filename + ".avi"
                )
                write_mjpeg_avi(video_file, jpegs, size, fps=fps)
                print(f"no mp4 encoder: wrote MJPEG AVI {video_file}")
            except Exception as exc:  # pragma: no cover
                print(f"video encode unavailable ({exc}); "
                      f"frames left in {video_dir}")
                video_file = video_dir
    print(f"Maximal depth in video: {max_depth_in_video}")
    return video_file


def optimize_camera_embedding(
    image, pose, H, W, intrinsic, scene: SceneVars, rc, near, far,
    input_ch_cam: int, n_rand: int = 1024, steps: int = 100, lr: float = 0.5,
):
    """test_opt: per-image camera-latent optimization (reference :266-302,
    which is broken upstream — embedcam_fn is never created; we implement
    the intended behavior with optax)."""
    import optax

    from scade_tpu.ops.rays import get_rays
    from scade_tpu.render.renderer import render_rays

    rc_t = rc.test_mode()
    rays_o_full, rays_d_full = get_rays(
        H, W, jnp.asarray(intrinsic), jnp.asarray(pose)
    )
    rays_o_full = rays_o_full.reshape(-1, 3)
    rays_d_full = rays_d_full.reshape(-1, 3)
    target_full = jnp.asarray(np.asarray(image).reshape(-1, 3))

    opt = optax.adam(lr)
    emb = jnp.zeros((input_ch_cam,), jnp.float32)
    opt_state = opt.init(emb)

    # best-candidate tracking stays ON DEVICE: fetching the psnr scalar
    # every step costs a deferred-execution round trip (~40-80 ms) through
    # the tunnel — steps × images of pure latency. Semantics unchanged:
    # psnr is scored from the PRE-update loss while the stored embedding
    # is the POST-update one (matching the host-side loop this replaces).
    @jax.jit
    def step(emb, opt_state, best_emb, best_psnr, idx):
        def loss_fn(emb):
            sv = scene._replace(embedded_cam=emb)
            out = render_rays(
                sv, rc_t, rays_o_full[idx], rays_d_full[idx], near, far
            )
            return img2mse(out["rgb_map"], target_full[idx])

        loss, grads = jax.value_and_grad(loss_fn)(emb)
        updates, opt_state = opt.update(grads, opt_state, emb)
        new_emb = optax.apply_updates(emb, updates)
        psnr = mse2psnr(loss)
        # NaN-safe, matching the host-side `if psnr > best_psnr`: a NaN
        # psnr is skipped (take=False) rather than poisoning best_psnr
        # forever (jnp.maximum would propagate it).
        take = psnr > best_psnr
        best_emb = jnp.where(take, new_emb, best_emb)
        best_psnr = jnp.where(take, psnr, best_psnr)
        return new_emb, opt_state, best_emb, best_psnr

    rng = np.random.default_rng(0)
    best_emb = emb
    best_psnr = jnp.float32(-np.inf)
    for i in range(steps):
        idx = jnp.asarray(rng.choice(H * W, size=2 * n_rand, replace=False))
        emb, opt_state, best_emb, best_psnr = step(
            emb, opt_state, best_emb, best_psnr, idx
        )
    return jnp.asarray(np.asarray(best_emb))
