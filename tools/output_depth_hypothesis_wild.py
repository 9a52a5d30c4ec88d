#!/usr/bin/env python
"""Hypothesis dump for In-the-Wild / Tanks&Temples scenes (reference:
ambiguity_aware_prior/tools/output_depth_hypothesis_wild.py). Differences
from the ScanNet variant: depth files live in train/depth ("processed"
layout), the SfM depth is scaled by the scene's depth_scaling_factor,
points beyond the far plane are dropped, and the alignment mask threshold
is 0.5 (:460-470).

Usage:
  python tools/output_depth_hypothesis_wild.py --scene_dir <scene> \
      --ckpt <ckpt> --mean_var <mean_var_adain.npy> --dump_dir dump_cimle
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from output_depth_hypothesis_scannet import main as scannet_main  # noqa: E402


def main():
    argv = sys.argv[1:]

    def have(flag):
        # both argparse spellings: '--flag value' and '--flag=value' — the
        # two-token check alone would append a default AFTER the user's
        # '=' form value, and argparse lets the later occurrence win
        return any(a == flag or a.startswith(flag + "=") for a in argv)

    def ensure(flag, value):
        # value is a thunk: scene jsons may lack the key it reads, which
        # must not crash when the user supplied the flag explicitly
        if not have(flag):
            argv.extend([flag, str(value())])

    peek = argparse.ArgumentParser(add_help=False)
    peek.add_argument("--scene_dir", required=True)
    known, _ = peek.parse_known_args(argv)
    with open(os.path.join(known.scene_dir, "transforms_train.json")) as fp:
        meta = json.load(fp)

    ensure("--dataset_name", lambda: "processed")
    ensure("--sfm_mask_threshold", lambda: "0.5")
    ensure("--sfm_scaling_factor", lambda: meta["depth_scaling_factor"])
    ensure("--sfm_far_clip", lambda: meta["far"])
    sys.argv = [sys.argv[0]] + argv
    scannet_main()


if __name__ == "__main__":
    main()
