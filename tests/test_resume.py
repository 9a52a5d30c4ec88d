"""Deterministic resume: checkpoint at step N and continuing to M must
reproduce the uninterrupted run exactly — our step keys are fold_in(base,
i) and the full optimizer state round-trips through the .tar (the reference
cannot do this: it never restores optimizer state,
run_scade_scannet.py:478-485)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax


def _make_scene(tmp_path):
    scene = tmp_path / "scene"
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "make_synthetic_scene.py"),
         str(scene), "--H", "32", "--W", "48", "--K", "2",
         "--n_train", "2", "--n_val", "1", "--n_test", "1", "--n_video", "0"],
        check=True,
    )


def _train(tmp_path, expname, iters, i_weights):
    from run_scade_scannet import main

    main("scannet", [
        "train", "--data_dir", str(tmp_path), "--scene_id", "scene",
        "--ckpt_dir", str(tmp_path / "ckpt"), "--expname", expname,
        "--num_iterations", str(iters), "--N_rand", "64",
        "--i_weights", str(i_weights), "--i_img", "1000000",
        "--i_print", "1000000", "--cimle_dir", "dump",
        "--num_hypothesis", "2", "--N_samples", "8", "--N_importance", "16",
        "--multires", "4", "--chunk", "2048",
    ])


def test_resume_is_bitwise_deterministic(tmp_path):
    if len(jax.devices()) > 1:
        # run single-device for exact reproducibility of this test
        pass
    _make_scene(tmp_path)

    # straight 24-step run
    _train(tmp_path, "straight", 24, 24)
    # 12 steps, then resume (auto-reload of the newest .tar) to 24
    _train(tmp_path, "resumed", 12, 12)
    _train(tmp_path, "resumed", 24, 12)

    from scade_tpu.utils.ckpt import load_checkpoint_raw

    a = load_checkpoint_raw(str(tmp_path / "ckpt" / "straight" / "000024.tar"))
    b = load_checkpoint_raw(str(tmp_path / "ckpt" / "resumed" / "000024.tar"))
    assert a["global_step"] == b["global_step"] == 24
    for k in a["network_fine_state_dict"]:
        np.testing.assert_array_equal(
            a["network_fine_state_dict"][k], b["network_fine_state_dict"][k],
            err_msg=f"fine param {k} diverged across resume",
        )
    np.testing.assert_array_equal(a["depth_scales"], b["depth_scales"])
    np.testing.assert_array_equal(a["depth_shifts"], b["depth_shifts"])


def test_restore_survives_ss_opt_structure_drift(tmp_path):
    """A leaf-count mismatch in ONE optimizer state (version-skewed ckpt)
    must not crash the resume or depend on the other's match: the drifted
    one reinitializes with its LR schedule fast-forwarded, the intact one
    restores bitwise."""
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from scade_tpu.render.renderer import make_render_config
    from scade_tpu.train.step import TrainConfig, create_train_state
    from scade_tpu.utils.ckpt import restore_train_state, save_checkpoint

    rc = make_render_config(multires=2, n_samples=4, n_importance=8)
    tc = TrainConfig(n_rand=16)
    state = create_train_state(jax.random.PRNGKey(0), rc, tc, n_images=2)
    # make the moments distinguishable from fresh zeros
    state = state._replace(
        step=jnp.asarray(37, jnp.int32),
        opt_state=jax.tree.map(
            lambda x: x + 1 if x.dtype != jnp.int32 else x, state.opt_state
        ),
    )
    path = str(tmp_path / "000037.tar")
    save_checkpoint(path, state, rc)

    # corrupt ONLY the ss_opt_state leaf structure in the saved file
    raw = torch.load(path, map_location="cpu", weights_only=False)
    leaves = jax.tree.leaves(raw["scade_tpu"]["ss_opt_state"])
    raw["scade_tpu"]["ss_opt_state"] = {"drifted": leaves + leaves}
    torch.save(raw, path)

    fresh = create_train_state(jax.random.PRNGKey(1), rc, tc, n_images=2)
    restored = restore_train_state(path, fresh, rc)
    # the intact nerf optimizer state restored bitwise
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the drifted ss state reinitialized with its count fast-forwarded
    counts = [
        np.asarray(leaf) for leaf in jax.tree.leaves(restored.ss_opt_state)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.int32
        and leaf.shape == ()
    ]
    assert counts and all(int(c) == 37 for c in counts)
