"""CI stand-in for the scene0758_00 day-1 parity playbook (VERDICT r2 #5).

Builds a synthetic scene in the EXACT directory layout of the reference
README (/root/reference/README.md:57-66) — `datasets/scannet/scene0758_00`
with the `dump_1102_scene0758_sfmaligned_indv` cimle dir and a
`pretrained_models/scannet/scene758_scade` .tar bundle — then exercises
`tools/run_real_scene_parity.py` end-to-end: ours-side test render, the
REFERENCE torch test render from the same translated checkpoint, and the
metrics diff. When real data appears, the same command at default flags is
the real run.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
ARCH = ["--N_samples", "8", "--N_importance", "16", "--multires", "4",
        "--netwidth", "64", "--netdepth", "4"]


@pytest.mark.skipif(
    not os.path.isdir(os.environ.get("SCADE_REFERENCE", "/root/reference")),
    reason="reference repo not mounted",
)
def test_parity_playbook_on_standin(tmp_path):
    root = tmp_path
    scene = root / "datasets" / "scannet" / "scene0758_00"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_scene.py"),
         str(scene), "--H", "32", "--W", "48", "--K", "2",
         "--n_train", "2", "--n_val", "1", "--n_test", "1", "--n_video", "2",
         "--cimle_dir", "dump_1102_scene0758_sfmaligned_indv"],
        check=True,
    )

    # produce the "pretrained" bundle by training briefly (in-process: the
    # conftest already pins CPU)
    from run_scade_scannet import main

    main("scannet", [
        "train", "--data_dir", str(root / "datasets" / "scannet"),
        "--scene_id", "scene0758_00",
        "--ckpt_dir", str(root / "pretrained_models" / "scannet"),
        "--expname", "scene758_scade",
        "--cimle_dir", "dump_1102_scene0758_sfmaligned_indv",
        "--num_hypothesis", "2", "--num_iterations", "4", "--N_rand", "64",
        "--i_weights", "4", "--i_img", "1000000", "--i_print", "4",
        "--chunk", "2048", "--netdepth_fine", "4", "--netwidth_fine", "64",
    ] + ARCH)
    bundle = root / "pretrained_models" / "scannet" / "scene758_scade"
    assert any(f.endswith(".tar") for f in os.listdir(bundle))

    env = dict(os.environ, SCADE_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_real_scene_parity.py"),
         "--root", str(root),
         "--num_hypothesis", "2",
         "--run_reference",
         "--ours_extra",
         "--N_samples 8 --N_importance 16 --multires 4 --netwidth 64 "
         "--netdepth 4 --netwidth_fine 64 --netdepth_fine 4 --chunk 2048",
         "--ref_extra",
         "--N_samples 8 --N_importance 16 --multires 4 --netwidth 64 "
         "--netdepth 4 --chunk 2048",
         ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    sys.stdout.write(out.stdout[-4000:])
    sys.stderr.write(out.stderr[-4000:])
    assert out.returncode == 0, f"parity playbook failed rc={out.returncode}"
    assert "PARITY OK" in out.stdout

    # both metrics files exist where the playbook says they are
    ours = bundle / "test_images_scene0758_00" / "metrics.txt"
    ref = (root / "pretrained_models" / "scannet" / "scene758_scade_ref"
           / "test_images_scene0758_00" / "metrics.txt")
    assert ours.is_file() and ref.is_file()


def test_parity_playbook_layout_validation(tmp_path):
    """missing layout → clear error, exit code 2."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_real_scene_parity.py"),
         "--root", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 2
    assert "layout problems" in out.stdout
    assert "transforms_test.json" in out.stdout
