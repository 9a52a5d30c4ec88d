"""Hypothesis dump: the bridge from the cIMLE prior to the SCADE NeRF.

For each training image of a scene, draw K z-codes, run the prior, resize
to raw resolution, align each hypothesis to sparse SfM depth with a deg-1
polyfit, and save ``<scene>/train/leres_cimle/<dump_dir>/<img_id>_<k>.npy``
(reference: ambiguity_aware_prior/tools/output_depth_hypothesis_scannet.py
:374-574 — the K=20, minibatch-5 loop at :393-395,482-488, the per-
hypothesis metric fit at :504, the .npy writes at :528-538).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scade_tpu.prior.data import FinetuneDataset
from scade_tpu.prior.metrics import recover_metric_depth
from scade_tpu.prior.model import prior_apply


def dump_depth_hypotheses(
    model,
    variables,
    shifts,
    scene_dir: str,
    dump_dir: str,
    d_latent: int = 32,
    num_hypothesis: int = 20,
    mini_batch_size: int = 20,
    dataset_name: str = "scannet",
    sfm_mask_threshold: float = 0.1,
    default_scale: float = 0.5,
    default_shift: float = 0.0,
    seed: int = 0,
    save_previews: bool = False,
    sfm_scaling_factor: float = 1000.0,
    sfm_far_clip: Optional[float] = None,
    compute_dtype: Optional[str] = None,
    image_size: int = 448,
):
    """Write K aligned hypothesis .npy files per train image. Returns the
    output directory. `image_size` is the square crop the prior runs at —
    it must match the resolution the model (and its AdaIn stats) was
    trained with."""
    import cv2  # unconditionally required: the hypothesis resize below

    ds = FinetuneDataset(
        os.path.join(scene_dir, "train"), dataset_name,
        crop_size=(image_size, image_size),
    )
    out_dir = os.path.join(scene_dir, "train", "leres_cimle", dump_dir)
    os.makedirs(out_dir, exist_ok=True)

    key = jax.random.PRNGKey(seed)
    # ceil: enough z-minibatches to cover num_hypothesis even when it is
    # not a multiple of mini_batch_size (hyps[:num_hypothesis] trims the
    # overshoot below)
    num_sets = -(-num_hypothesis // mini_batch_size)

    # variables/shifts are jit ARGUMENTS: closed-over device arrays are
    # baked into the HLO as constants, and the 466 MB ResNeXt params then
    # overflow the axon tunnel's remote_compile request (HTTP 413).
    # full reduced-precision inference: params AND activations in
    # compute_dtype (halves HBM traffic vs the matmul-precision-only fast
    # path; eval-mode BN is a scale/shift, and the SfM polyfit realigns
    # every hypothesis downstream, so hypothesis diversity — not low-order
    # depth bits — is what survives). The ~0.5 GB param tree is cast ONCE
    # here, outside the jit, not per call; it stays a jit ARGUMENT below.
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(cd)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        variables, shifts = cast(variables), cast(shifts)

    @jax.jit
    def infer(variables, shifts, rgb, z):
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            rgb = rgb.astype(cd)
            z = z.astype(cd)
        rgb_rep = jnp.repeat(rgb, mini_batch_size, axis=0)
        out = prior_apply(model, variables, shifts, rgb_rep, z)
        return out.astype(jnp.float32)

    for idx in range(len(ds)):
        ex = ds[idx]
        img_id = os.path.basename(ex.rgb_path).split(".")[0]
        sfm_depth = ds.load_sfm_depth(idx) * (1000.0 / sfm_scaling_factor)
        if sfm_far_clip is not None:
            # wild scenes drop SfM points beyond the far plane
            # (output_depth_hypothesis_wild.py:465-467)
            sfm_depth = np.where(sfm_depth > sfm_far_clip, 0.0, sfm_depth)
        H_raw, W_raw = ex.raw_size

        hyps = []
        for _ in range(num_sets):
            key, k = jax.random.split(key)
            z = jax.random.normal(k, (mini_batch_size, d_latent), jnp.float32)
            depth = np.asarray(
                infer(variables, shifts, jnp.asarray(ex.rgb[None]), z)
            )[..., 0]
            hyps.extend(list(depth))
        hyps = hyps[:num_hypothesis]

        if save_previews:
            # loop-invariant over the K hypotheses: one decode per image,
            # not K (output_depth_hypothesis_scannet.py:548-574)
            from scade_tpu.prior.pointcloud import reconstruct_depth

            rgb_raw = cv2.imread(ex.rgb_path)[:, :, ::-1]

        for k_i, hyp in enumerate(hyps):
            hyp_raw = cv2.resize(
                hyp.astype(np.float32), (W_raw, H_raw),
                interpolation=cv2.INTER_LINEAR,
            )
            aligned, scale, shift = recover_metric_depth(
                hyp_raw, sfm_depth, mask_threshold=sfm_mask_threshold,
                default_scale=default_scale, default_shift=default_shift,
            )
            np.save(
                os.path.join(out_dir, f"{img_id}_{k_i}.npy"),
                aligned.astype(np.float32),
            )
            if save_previews:
                prev = aligned - aligned.min()
                prev = (prev / (prev.max() + 1e-8) * 255).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(out_dir, f"{img_id}_{k_i}_preview.png"),
                    cv2.applyColorMap(prev, cv2.COLORMAP_TURBO),
                )
                # colored pointcloud side artifact
                # (output_depth_hypothesis_scannet.py:548-574)
                reconstruct_depth(
                    aligned, rgb_raw, out_dir, f"{img_id}_{k_i}_pcd",
                    focal=ex.focal_length,
                )
        print(f"dumped {num_hypothesis} hypotheses for {img_id} "
              f"({idx + 1}/{len(ds)})")
    return out_dir
