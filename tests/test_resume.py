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
