#!/usr/bin/env python
"""Run the REFERENCE cIMLE prior trainer (train_single.py, torch CPU) on a
synthetic corpus from a translated init — the training-dynamics oracle for
tools/train_prior.py (VERDICT r4 #3: the prior trainer's AdaIn-init →
z-recache argmin-of-K → grouped-SGD loop has forward/loss goldens but its
trajectories were never run side-by-side against the torch oracle).

The reference script is executed LITERALLY via runpy (its own AdaIn init,
z-recache, ModelOptimizer_AdaIn, TrainingStats — train_single.py:280-559);
this wrapper only:
  - stubs torchvision / CUDA movement (CPU-only image),
  - points cfg at the corpus and disables ImageNet-pretrained loading,
  - rewraps an export_prior_to_torch.py checkpoint ({model_state_dict}) as
    the {depth_model} schema train_single.py loads (:199-225),
  - patches TrainingStats.UpdateIterStats to append RAW per-step losses to
    a JSONL (the printed stats are smoothed medians),
  - patches torch.argmin bookkeeping? no — z-selection stats are computed
    post-hoc by tools/compare_prior_training.py from the saved ckpts.

Usage:
  python tools/run_reference_prior_training.py --dataroot /tmp/prior_corpus \
      --logdir /tmp/ref_prior_log --ckpt /tmp/prior_init_torch.pth \
      --epochs 6 --refresh_z 3 --crop 224 --seed 0
"""

import argparse
import json
import os
import runpy
import sys
import types


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--ckpt", required=True,
                    help=".pth from tools/export_prior_to_torch.py")
    ap.add_argument("--dataset_list", nargs="+", default=["taskonomy"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--refresh_z", type=int, default=3)
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--batchsize", type=int, default=4)
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--base_lr", type=float, default=1e-3)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--loss_jsonl", default=None,
                    help="raw per-step losses (default <logdir>/losses.jsonl)")
    flags = ap.parse_args()

    logdir = os.path.abspath(flags.logdir)  # cfg joins against OUTPUT_DIR='./'
    os.makedirs(logdir, exist_ok=True)
    loss_jsonl = flags.loss_jsonl or os.path.join(logdir, "losses.jsonl")

    # --- stubs: CPU-only, no torchvision/tensorboardX in this image --------
    import numpy as np
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    for name in ("torchvision", "torchvision.models", "torchvision.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]

    # multi_dataset.scale_torch REQUIRES working ToTensor/Normalize
    # (multi_dataset.py:432-448) — faithful minimal equivalents:
    class _ToTensor:
        def __call__(self, img):
            t = torch.from_numpy(
                np.ascontiguousarray(img.transpose(2, 0, 1)))
            return t.float().div(255) if img.dtype == np.uint8 else t.float()

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
            self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

        def __call__(self, t):
            return (t - self.mean) / self.std

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tvt = sys.modules["torchvision.transforms"]
    tvt.ToTensor, tvt.Normalize, tvt.Compose = _ToTensor, _Normalize, _Compose

    if "plyfile" not in sys.modules:  # tools/utils.py pointcloud helpers,
        ply = types.ModuleType("plyfile")  # unused by the training loop
        ply.PlyData = ply.PlyElement = object
        sys.modules["plyfile"] = ply
    if "imgaug" not in sys.modules:  # only online_aug uses it; the shipped
        ia = types.ModuleType("imgaug")  # path is load_test_data_v2
        ia.augmenters = types.ModuleType("imgaug.augmenters")
        sys.modules["imgaug"] = ia
        sys.modules["imgaug.augmenters"] = ia.augmenters

    ref_root = os.path.join(
        os.environ.get("SCADE_REFERENCE", "/root/reference"),
        "ambiguity_aware_prior",
    )
    sys.path.insert(0, ref_root)
    sys.path.insert(0, os.path.join(ref_root, "tools"))  # `from utils import`

    from lib.configs.config import cfg

    cfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
    cfg.DATASET.CROP_SIZE = (flags.crop, flags.crop)
    cfg.TRAIN.LOG_INTERVAL = 10

    # --- rewrap the exported init as the {depth_model} ckpt schema ---------
    exported = torch.load(flags.ckpt, map_location="cpu")
    sd = exported.get("model_state_dict", exported.get("depth_model"))
    assert sd is not None, f"unrecognized ckpt schema: {list(exported)}"
    # export_prior_to_torch emits flat encoder names (encoder_modules.conv1
    # — the res101.pth pretrained-ckpt scheme); train_single loads into
    # RelDepthModel_cIMLE, whose tree is depth_model.encoder_modules.encoder.*
    # + depth_model.decoder_modules.* (multi_depth_model_auxiv2.py:55-59,
    # DepthNet wrapper). Remap both prefixes.
    if not next(iter(sd)).startswith("depth_model."):
        sd = {
            "depth_model."
            + (k.replace("encoder_modules.", "encoder_modules.encoder.", 1)
               if k.startswith("encoder_modules.") else k): v
            for k, v in sd.items()
        }
    wrapped = os.path.join(logdir, "init_depth_model.pth")
    torch.save({"depth_model": sd}, wrapped)

    # --- raw per-step loss capture ------------------------------------------
    from lib.utils import training_stats as ts_mod

    fout = open(loss_jsonl, "w")
    state = {"step": 0}
    orig_update = ts_mod.TrainingStats.UpdateIterStats

    def patched(self, loss):
        rec = {"step": state["step"],
               **{k: float(v) for k, v in loss.items()}}
        fout.write(json.dumps(rec) + "\n")
        fout.flush()
        state["step"] += 1
        return orig_update(self, loss)

    ts_mod.TrainingStats.UpdateIterStats = patched

    # --- run the reference trainer literally -------------------------------
    sys.argv = [
        "train_single.py",
        "--logdir", logdir,
        "--ckpt", wrapped,
        "--epoch", str(flags.epochs),
        "--batchsize", str(flags.batchsize),
        "--base_lr", str(flags.base_lr),
        "--thread", "1",
        "--use_tfboard", "",       # type=bool: empty string → False
        "--dataroot", os.path.abspath(flags.dataroot) + "/",
        "--dataset_list", *flags.dataset_list,
        "--backbone", "resnext101",
        "--d_latent", str(flags.d_latent),
        "--num_samples", str(flags.num_samples),
        "--refresh_z", str(flags.refresh_z),
        "--seed_num", str(flags.seed),
    ]
    # backup_files does relative `cp -r lib/ ...` — run from the ref root so
    # the (harmless) backups resolve; all writes go to the absolute logdir
    os.chdir(ref_root)
    runpy.run_path(os.path.join(ref_root, "tools", "train_single.py"),
                   run_name="__main__")
    fout.close()
    print(f"reference prior training done; losses → {loss_jsonl}; "
          f"ckpts → {logdir}/ckpt/")


if __name__ == "__main__":
    main()
