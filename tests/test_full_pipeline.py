"""Full-system integration: train the cIMLE prior on a synthetic scene,
dump depth hypotheses from it, then train the SCADE NeRF on those
hypotheses — the complete two-subsystem flow whose only coupling is the
leres_cimle .npy contract (SURVEY.md preamble). Slow (~5 min CPU)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_prior_to_nerf_pipeline(tmp_path):
    scene = tmp_path / "scene"
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "make_synthetic_scene.py"),
         str(scene), "--H", "48", "--W", "64", "--K", "2",
         "--n_train", "2", "--n_val", "1", "--n_test", "1", "--n_video", "0"],
        check=True,
    )

    # --- 1. prior: init small model, AdaIn stats, one cheap train step ----
    from scade_tpu.prior.data import FinetuneDataset, collate
    from scade_tpu.prior.dump import dump_depth_hypotheses
    from scade_tpu.prior.model import PriorConfig, init_prior
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        compute_adain_stats,
        make_prior_optimizer,
        make_train_step,
        recache_z,
    )

    cfg = PriorConfig(d_latent=8).with_small()
    tc = PriorTrainConfig(
        d_latent=8, num_samples=2, mini_batch_size=2, batch_size=2,
        loss_mode="_meanstd-tanh_msgil-normal_",  # cheap-compile subset
    )
    model, variables = init_prior(jax.random.PRNGKey(0), cfg, image_size=(64, 64))
    ds = FinetuneDataset(str(scene / "train"), "scannet", crop_size=(64, 64))
    assert len(ds) == 2

    batches = lambda: iter([collate([ds[0], ds[1]])])
    # AdaIn stats consume one image per yielded batch
    stat_batches = iter([collate([ds[0]]), collate([ds[1]])])
    shifts = compute_adain_stats(
        model, variables, stat_batches, jax.random.PRNGKey(1), 8, 2
    )
    assert all(np.isfinite(np.asarray(v)).all() for v in shifts.values())
    z = recache_z(model, variables, shifts, tc, batches(), jax.random.PRNGKey(2))
    assert z.shape == (2, 8)

    opt = make_prior_optimizer(variables["params"], tc)
    opt_state = opt.init(variables["params"])
    step = make_train_step(model, tc, opt)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    params, batch_stats, opt_state, total, _ = step(
        variables["params"], variables["batch_stats"], opt_state,
        shifts, batch, jnp.asarray(z), jax.random.PRNGKey(3),
    )
    assert np.isfinite(float(total))
    variables = {"params": params, "batch_stats": batch_stats}

    # --- 2. dump hypotheses from the trained prior ------------------------
    # num_hypothesis=3 with mini_batch_size=2 regression-covers the
    # ceil num_sets fix (r3 review): integer division under-generated
    # (2 of 3 hypotheses) for non-multiple K
    out_dir = dump_depth_hypotheses(
        model, variables, shifts, str(scene), "prior_dump",
        d_latent=8, num_hypothesis=3, mini_batch_size=2, image_size=64,
    )
    assert len(os.listdir(out_dir)) == 6  # 2 images x 3 hypotheses

    # --- 3. NeRF training consumes the prior's hypotheses -----------------
    from run_scade_scannet import main

    main("scannet", [
        "train", "--data_dir", str(tmp_path), "--scene_id", "scene",
        "--ckpt_dir", str(tmp_path / "ckpt"), "--expname", "pipe",
        "--num_iterations", "6", "--N_rand", "64", "--i_weights", "6",
        "--i_img", "1000000", "--i_print", "1000000",
        "--cimle_dir", "prior_dump", "--num_hypothesis", "3",
        "--N_samples", "8", "--N_importance", "16", "--multires", "4",
        "--chunk", "2048",
    ])
    metrics = tmp_path / "ckpt" / "pipe" / "test_images_scene" / "metrics.txt"
    assert metrics.exists()
    for line in metrics.read_text().strip().splitlines():
        if line.split(":")[0] != "lpips":  # NaN-explicit without weights
            assert "nan" not in line.lower(), line
