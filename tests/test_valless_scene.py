"""Val-less scenes: when transforms_val.json has no frames, the test split
substitutes everywhere (reference run_scade_scannet.py:843-847). The i_img
validation-render block must index depths/valid with the same substituted
split as the image tensors — regression for an out-of-bounds crash."""

import os
import subprocess
import sys


def test_train_valless_scene_i_img(tmp_path):
    scene = tmp_path / "scene"
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "make_synthetic_scene.py"),
         str(scene), "--H", "32", "--W", "48", "--K", "2",
         "--n_train", "2", "--n_val", "0", "--n_test", "2", "--n_video", "1"],
        check=True,
    )

    from run_scade_scannet import main

    # i_img=2 fires the validation-render block twice with i_val empty
    main("scannet", [
        "train", "--data_dir", str(tmp_path), "--scene_id", "scene",
        "--ckpt_dir", str(tmp_path / "ckpt"), "--expname", "novalexp",
        "--num_iterations", "4", "--N_rand", "64", "--i_weights", "4",
        "--i_img", "2", "--i_print", "2", "--cimle_dir", "dump",
        "--num_hypothesis", "2", "--N_samples", "8", "--N_importance", "16",
        "--multires", "4", "--chunk", "2048",
    ])
    result_dir = tmp_path / "ckpt" / "novalexp"
    assert (result_dir / "000004.tar").exists()
    assert (result_dir / "test_images_scene" / "metrics.txt").exists()
