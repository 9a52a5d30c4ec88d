#!/usr/bin/env python
"""Full-system integration ON THE CHIP: prior pretrain → AdaIn stat init →
z-recache → 20-hypothesis dump → SCADE NeRF train+test, in one scripted
run with per-stage wall-clock timing (VERDICT r2 next-round #8 — the
chip-resident counterpart of tests/test_full_pipeline.py).

Drives the PRODUCT CLIs via subprocess (tools/train_prior.py,
tools/output_depth_hypothesis_scannet.py, run_scade_scannet.py), exactly
as a user would. Default shapes are the production ones (ResNeXt101-32x8d
d_latent=32 at 448², flagship NeRF at multires 9, 64+128 samples, K=20);
``--small`` shrinks everything for a CPU smoke run.

Usage:
  python tools/run_full_pipeline_chip.py --work_dir /tmp/chip_pipe \
      [--nerf_iters 2000] [--prior_epochs 2] [--small]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, env=None):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/chip_pipe")
    ap.add_argument("--scene_id", default="scene")
    ap.add_argument("--n_train", type=int, default=8)
    ap.add_argument("--H", type=int, default=192)
    ap.add_argument("--W", type=int, default=256)
    ap.add_argument("--prior_epochs", type=int, default=2)
    ap.add_argument("--nerf_iters", type=int, default=2000)
    ap.add_argument("--nerf_n_rand", type=int, default=1024)
    ap.add_argument("--num_hypothesis", type=int, default=20)
    ap.add_argument("--small", action="store_true",
                    help="tiny models/shapes (CPU smoke run)")
    ap.add_argument("--resume_from", default=None,
                    choices=["prior_train", "dump", "nerf"],
                    help="skip already-completed stages (their artifacts "
                         "must exist under --work_dir)")
    args = ap.parse_args()
    order = [None, "prior_train", "dump", "nerf"]
    start = order.index(args.resume_from)

    def skip(stage_idx):
        return stage_idx < start

    os.makedirs(args.work_dir, exist_ok=True)
    scene = os.path.join(args.work_dir, args.scene_id)
    log_dir = os.path.join(args.work_dir, "prior_logs")
    env = dict(os.environ)
    py = sys.executable
    times = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                print(f"\n===== stage: {name} =====", flush=True)
                return self

            def __exit__(self, *a):
                times[name] = time.perf_counter() - self.t0
                print(f"===== {name}: {times[name]:.1f} s =====", flush=True)

        return _T()

    K = 4 if args.small else args.num_hypothesis
    if not skip(0):
        with stage("make_scene"):
            sh([py, "tools/make_synthetic_scene.py", scene,
                "--H", str(args.H), "--W", str(args.W), "--K", "2",
                "--n_train", str(args.n_train), "--n_val", "1",
                "--n_test", "2", "--n_video", "0"])

    prior_flags = [
        "--scene_dir", os.path.join(scene),
        "--log_dir", log_dir,
        "--epochs", str(args.prior_epochs),
        "--refresh_z", "1",
        "--seed_num", "0",
    ]
    if args.small:
        prior_flags += ["--small_model", "--d_latent", "8",
                        "--image_size", "64", "--num_samples", "2",
                        "--mini_batch_size", "2", "--batchsize", "2",
                        "--adain_subset", "2"]
    else:
        prior_flags += ["--d_latent", "32", "--num_samples", "20",
                        "--mini_batch_size", "5", "--batchsize", "4",
                        "--adain_subset", str(args.n_train)]

    if not skip(1):
        with stage("prior_train (AdaIn init + z-recache + SGD epochs)"):
            sh([py, "tools/train_prior.py"] + prior_flags, env=env)

    # numeric epoch sort: lexicographic would rank epoch8 above epoch59
    ckpts = sorted(
        (f for f in os.listdir(log_dir) if f.endswith(".msgpack")),
        key=lambda f: [int(n) for n in re.findall(r"\d+", f)],
    )
    assert ckpts, f"no prior ckpt under {log_dir}"
    ckpt = os.path.join(log_dir, ckpts[-1])
    mean_var = os.path.join(log_dir, "mean_var_adain.npy")

    dump_flags = [
        "--scene_dir", scene, "--ckpt", ckpt, "--mean_var", mean_var,
        "--dump_dir", "chip_dump", "--num_hypothesis", str(K),
    ]
    if args.small:
        dump_flags += ["--small_model", "--d_latent", "8",
                       "--image_size", "64", "--mini_batch_size", "2"]
    else:
        dump_flags += ["--d_latent", "32",
                       "--mini_batch_size", str(K)]  # all K in ONE program

    if not skip(2):
        with stage(f"hypothesis_dump ({K} per image)"):
            sh([py, "tools/output_depth_hypothesis_scannet.py"] + dump_flags,
               env=env)

    nerf_flags = [
        "train", "--data_dir", args.work_dir, "--scene_id", args.scene_id,
        "--ckpt_dir", os.path.join(args.work_dir, "nerf_ckpt"),
        "--expname", "chip_pipe",
        "--cimle_dir", "chip_dump", "--num_hypothesis", str(K),
        "--num_iterations", str(args.nerf_iters),
        "--N_rand", str(args.nerf_n_rand),
        "--i_weights", str(args.nerf_iters), "--i_img", "1000000",
        "--i_print", str(max(args.nerf_iters // 10, 1)),
    ]
    if args.small:
        nerf_flags += ["--N_samples", "8", "--N_importance", "16",
                       "--multires", "4", "--chunk", "2048", "--N_rand", "64"]

    with stage(f"nerf_train ({args.nerf_iters} iters) + test render"):
        sh([py, "run_scade_scannet.py"] + nerf_flags, env=env)

    metrics = os.path.join(args.work_dir, "nerf_ckpt", "chip_pipe",
                           f"test_images_{args.scene_id}", "metrics.txt")
    assert os.path.isfile(metrics), f"missing {metrics}"
    print("\nfinal NeRF test metrics:")
    print(open(metrics).read())

    print("per-stage wall clock:")
    print(json.dumps({k: round(v, 1) for k, v in times.items()}, indent=1))


if __name__ == "__main__":
    main()
