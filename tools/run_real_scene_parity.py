#!/usr/bin/env python
"""The scene0758_00 day-1 parity playbook (VERDICT r2 next-round #5).

Given the reference README's exact on-disk layout
(/root/reference/README.md:57-66):

    <root>/datasets/scannet/scene0758_00/          transforms_*.json, rgb,
                                                   depth, target_depth,
                                                   leres_cimle/<cimle_dir>/
    <root>/pretrained_models/scannet/<expname>/    <iter>.tar  (torch ckpt)

this script (1) validates the layout, (2) runs OUR `test` task against the
(translated-on-load) pretrained .tar, (3) optionally runs the REFERENCE
torch `test` on the same inputs (CPU, stubbed deps — same machinery as
tools/run_reference_training.py), and (4) diffs the two metrics.txt files
with per-metric tolerances.

The moment real data + pretrained ckpts are mounted, real-scene parity is:

    python tools/run_real_scene_parity.py --root <dir-with-datasets> \
        --run_reference

CI exercises this script end-to-end against a synthetic stand-in that
mimics the exact directory layout (tests/test_real_scene_parity.py).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_TOLS = {
    # keys must be the literal metrics.txt column names (ours:
    # scade_tpu/eval/evaluate.py:119-126; reference:
    # run_scade_scannet.py:345-352)
    "psnr": 0.5,        # dB
    "ssim": 0.02,
    "depth_rmse": 0.05,  # meters (scene0758 depths are ~2-5 m)
    "psnr0": 1.0,
    "img_loss": 0.01,
    "img_loss0": 0.01,
    "lpips": 0.05,     # NaN-tolerated when weights are absent on either side
}


def parse_metrics(path):
    """Parse a `key: value` metrics.txt (ours and the reference's
    MeanTracker both write this format — run_scade_scannet.py:407-409)."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            try:
                out[k.strip()] = float(v.strip())
            except ValueError:
                pass
    return out


def validate_layout(root, scene_id, cimle_dir, ckpt_dir, expname):
    scene = os.path.join(root, "datasets", "scannet", scene_id)
    problems = []
    if not os.path.isfile(os.path.join(scene, "transforms_test.json")):
        problems.append(f"missing {scene}/transforms_test.json")
    if not os.path.isfile(os.path.join(scene, "transforms_train.json")):
        problems.append(f"missing {scene}/transforms_train.json")
    hyp_dir = os.path.join(scene, "train", "leres_cimle", cimle_dir)
    if not os.path.isdir(hyp_dir):
        problems.append(f"missing hypothesis dir {hyp_dir}")
    ckpts = []
    run_dir = os.path.join(root, ckpt_dir, expname)
    if os.path.isdir(run_dir):
        ckpts = [f for f in sorted(os.listdir(run_dir)) if f.endswith(".tar")]
    if not ckpts:
        problems.append(f"no .tar checkpoints under {run_dir}")
    return scene, run_dir, ckpts, problems


def run_ours(root, scene_id, cimle_dir, ckpt_dir, expname, extra):
    cmd = [
        sys.executable, os.path.join(REPO, "run_scade_scannet.py"), "test",
        "--data_dir", os.path.join(root, "datasets", "scannet"),
        "--scene_id", scene_id,
        "--cimle_dir", cimle_dir,
        "--ckpt_dir", os.path.join(root, ckpt_dir),
        "--expname", expname,
    ] + extra
    print("[ours]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    return os.path.join(
        root, ckpt_dir, expname, f"test_images_{scene_id}", "metrics.txt"
    )


def run_reference(root, scene_id, cimle_dir, ckpt_dir, expname,
                  num_hypothesis, ref_extra):
    """Run the reference torch `test` task on CPU with its optional GPU-only
    deps stubbed (lpips → 0, skimage SSIM → 0: those columns are then
    excluded from the diff). Writes into a sibling `<expname>_ref` run dir
    so the two metrics.txt don't collide; the .tar bundle is copied over
    (the reference's load_checkpoint needs a '000.tar' name,
    run_scade_scannet.py:412-413)."""
    import shutil

    src = os.path.join(root, ckpt_dir, expname)
    dst = os.path.join(root, ckpt_dir, expname + "_ref")
    os.makedirs(dst, exist_ok=True)
    # BOTH sides must evaluate the same checkpoint. Our loader takes the
    # sorted-last of all .tar (utils/ckpt.py find_checkpoints); the
    # reference takes the sorted-last of '000.tar'-matching names
    # (run_scade_scannet.py:412-413). Copy exactly OUR pick, clear any
    # stale copies from earlier runs, and give it a name the reference's
    # filter accepts — one file in the dir leaves no room for skew.
    for f in os.listdir(dst):
        if f.endswith(".tar"):
            os.remove(os.path.join(dst, f))
    newest = sorted(f for f in os.listdir(src) if f.endswith(".tar"))[-1]
    name = newest if "000.tar" in newest else "001000.tar"
    shutil.copy(os.path.join(src, newest), os.path.join(dst, name))

    cmd = [
        sys.executable, os.path.join(REPO, "tools", "run_reference_test.py"),
        "--data_dir", os.path.join(root, "datasets", "scannet"),
        "--scene_id", scene_id,
        "--cimle_dir", cimle_dir,
        "--ckpt_dir", os.path.join(root, ckpt_dir),
        "--expname", expname + "_ref",
        "--num_hypothesis", str(num_hypothesis),
    ] + ref_extra
    print("[reference]", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    return os.path.join(dst, f"test_images_{scene_id}", "metrics.txt")


def diff_metrics(ours, ref, tols, skip=()):
    import math

    rows, failures = [], []
    for k in sorted(set(ours) | set(ref)):
        a, b = ours.get(k), ref.get(k)
        if k in skip or a is None or b is None:
            rows.append((k, a, b, None, "skipped"))
            continue
        if math.isnan(a) or math.isnan(b):
            rows.append((k, a, b, None, "nan-skipped"))
            continue
        delta = abs(a - b)
        tol = tols.get(k, 0.05)
        ok = delta <= tol
        rows.append((k, a, b, delta, "OK" if ok else f"FAIL (tol {tol})"))
        if not ok:
            failures.append(k)
    print(f"\n{'metric':12s} {'ours':>12s} {'reference':>12s} {'delta':>10s}  status")
    for k, a, b, d, status in rows:
        fa = "-" if a is None else f"{a:.4f}"
        fb = "-" if b is None else f"{b:.4f}"
        fd = "-" if d is None else f"{d:.4f}"
        print(f"{k:12s} {fa:>12s} {fb:>12s} {fd:>10s}  {status}")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".", help="dir holding datasets/ and "
                    "pretrained_models/ in the README layout")
    ap.add_argument("--scene_id", default="scene0758_00")
    ap.add_argument("--cimle_dir", default="dump_1102_scene0758_sfmaligned_indv")
    ap.add_argument("--ckpt_dir", default="pretrained_models/scannet")
    ap.add_argument("--expname", default="scene758_scade")
    ap.add_argument("--num_hypothesis", type=int, default=20)
    ap.add_argument("--run_reference", action="store_true",
                    help="also run the reference torch test (CPU; hours at "
                    "full resolution) and diff against it")
    ap.add_argument("--ref_metrics", default=None,
                    help="diff against a precomputed reference metrics.txt "
                    "instead of running the reference")
    ap.add_argument("--ours_extra", default="",
                    help="extra flags for our CLI, space-separated "
                    "(e.g. '--N_samples 8 --N_importance 16')")
    ap.add_argument("--ref_extra", default="",
                    help="extra flags for tools/run_reference_test.py "
                    "(e.g. '--N_samples 8 --N_importance 16')")
    ap.add_argument("--tols", default=None,
                    help="JSON dict of per-metric tolerances")
    ap.add_argument("--skip_metrics", default=None,
                    help="comma-separated columns to exclude from the diff "
                    "(e.g. 'ssim,lpips' when --ref_metrics came from the "
                    "stubbed CPU reference, which reports both as 0)")
    args = ap.parse_args()
    # child processes run with cwd=REPO — a cwd-relative root would
    # validate here but resolve differently (or not at all) in them
    args.root = os.path.abspath(args.root)

    scene, run_dir, ckpts, problems = validate_layout(
        args.root, args.scene_id, args.cimle_dir, args.ckpt_dir, args.expname
    )
    if problems:
        print("layout problems (expected the reference README layout, "
              "/root/reference/README.md:57-66):")
        for p in problems:
            print("  -", p)
        sys.exit(2)
    print(f"layout OK: scene={scene}  ckpts={ckpts}")

    extra = args.ours_extra.split() if args.ours_extra else []
    extra += ["--num_hypothesis", str(args.num_hypothesis)]
    ours_path = run_ours(
        args.root, args.scene_id, args.cimle_dir, args.ckpt_dir,
        args.expname, extra,
    )
    ours = parse_metrics(ours_path)
    print(f"\nours ({ours_path}): {ours}")

    ref_path = args.ref_metrics
    skip = tuple(
        s for s in (args.skip_metrics or "").split(",") if s
    )
    if ref_path is None and args.run_reference:
        ref_path = run_reference(
            args.root, args.scene_id, args.cimle_dir, args.ckpt_dir,
            args.expname, args.num_hypothesis,
            args.ref_extra.split() if args.ref_extra else [],
        )
        # the stubbed reference reports ssim=0 and lpips=0 — not comparable
        skip = tuple(set(skip) | {"ssim", "lpips"})
    if ref_path is None:
        print("\nno reference metrics to diff (pass --run_reference or "
              "--ref_metrics); ours-side render completed OK.")
        return

    ref = parse_metrics(ref_path)
    print(f"reference ({ref_path}): {ref}")
    tols = dict(DEFAULT_TOLS)
    if args.tols:
        tols.update(json.loads(args.tols))
    failures = diff_metrics(ours, ref, tols, skip=skip)
    if failures:
        print(f"\nPARITY FAIL: {failures}")
        sys.exit(1)
    print("\nPARITY OK")


if __name__ == "__main__":
    main()
