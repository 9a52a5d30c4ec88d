"""The wild dump wrapper's per-scene default splicing
(tools/output_depth_hypothesis_wild.py): user flags must win in BOTH
argparse spellings, and scene jsons lacking the meta keys must still work
when the user supplies the flags explicitly."""

import importlib
import json
import sys


def _run_wrapper(tmp_path, monkeypatch, argv, meta):
    scene = tmp_path / "scene"
    scene.mkdir(exist_ok=True)
    with open(scene / "transforms_train.json", "w") as f:
        json.dump(meta, f)

    sys.path.insert(0, "tools")
    try:
        wild = importlib.import_module("output_depth_hypothesis_wild")
    finally:
        sys.path.pop(0)

    captured = {}

    def fake_main():
        captured["argv"] = list(sys.argv[1:])

    monkeypatch.setattr(wild, "scannet_main", fake_main)
    monkeypatch.setattr(
        sys, "argv", ["x", "--scene_dir", str(scene)] + argv
    )
    wild.main()
    return captured["argv"]


def test_equals_form_user_flag_wins(tmp_path, monkeypatch):
    argv = _run_wrapper(
        tmp_path, monkeypatch,
        ["--sfm_mask_threshold=0.3"],
        {"depth_scaling_factor": 256.0, "far": 4.0},
    )
    # the default must NOT be appended after the user's '=' form value
    # (argparse lets the later occurrence win)
    assert "--sfm_mask_threshold" not in argv
    assert "--sfm_mask_threshold=0.3" in argv
    assert argv[argv.index("--sfm_scaling_factor") + 1] == "256.0"
    assert argv[argv.index("--sfm_far_clip") + 1] == "4.0"


def test_missing_meta_key_ok_when_flag_given(tmp_path, monkeypatch):
    # json lacks depth_scaling_factor/far; explicit flags must prevent the
    # wrapper from ever reading them
    argv = _run_wrapper(
        tmp_path, monkeypatch,
        ["--sfm_scaling_factor", "128", "--sfm_far_clip=9"],
        {},
    )
    assert argv[argv.index("--sfm_scaling_factor") + 1] == "128"
    assert "--sfm_far_clip=9" in argv
    assert argv[argv.index("--sfm_mask_threshold") + 1] == "0.5"
    assert argv[argv.index("--dataset_name") + 1] == "processed"
