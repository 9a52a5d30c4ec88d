#!/usr/bin/env python
"""Compare trained prior checkpoints — ours (flax) vs the reference oracle
(torch) — on the SAME corpus with the SAME fixed z-draws (VERDICT r4 #3:
loss trajectories, selected-z stability, post-training hypothesis spread).

For each side and each training image:
  - criterion total for each of K fixed z's (numpy seed --z_seed, shared
    across sides — the latent spaces are directly comparable because both
    trainers started from the same translated init),
  - the min-over-K ("selected-z") loss — what z-recache optimizes
    (train_single.py:470-496),
  - hypothesis spread: mean over pixels of std over K of the predicted
    depth (the cIMLE property SCADE consumes downstream).

Usage:
  python tools/compare_prior_training.py --dataroot /tmp/prior_corpus \
      --ours_ckpt /tmp/ours_log/epoch5_step0.msgpack \
      --ours_mv /tmp/ours_log/mean_var_adain.npy \
      --ref_ckpt /tmp/ref_log/ckpt/epoch5_step0.pth \
      --ref_mv /tmp/ref_log/mean_var_adain.npy --crop 224
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def eval_ours(flags, batches):
    import jax

    if os.environ.get("SCADE_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["SCADE_PLATFORM"])
    import jax.numpy as jnp
    from flax import serialization

    from scade_tpu.prior.model import backbone_config, init_prior
    from scade_tpu.prior.train import (
        PriorTrainConfig,
        load_mean_var_adain,
        make_loss_fn,
    )

    cfg = backbone_config("resnext101_32x8d", d_latent=flags.d_latent)
    model, variables = init_prior(
        jax.random.PRNGKey(0), cfg, image_size=(flags.crop, flags.crop)
    )
    with open(flags.ours_ckpt, "rb") as fp:
        variables = serialization.from_bytes(variables, fp.read())
    shifts = load_mean_var_adain(flags.ours_mv)
    tc = PriorTrainConfig(d_latent=flags.d_latent)
    loss_fn = make_loss_fn(model, tc, train=False)

    @jax.jit
    def one(params, batch_stats, batch, z):
        rep = lambda x: jnp.repeat(x, z.shape[0], axis=0)
        batch_rep = {k: rep(v) for k, v in batch.items()}
        _, (_, total_raw, _) = loss_fn(
            params, batch_stats, shifts, batch_rep, z, jax.random.PRNGKey(0)
        )
        from scade_tpu.prior.model import prior_inference

        pred = prior_inference(model, variables, shifts, batch_rep["rgb"], z)
        return total_raw, pred

    zs = np.random.default_rng(flags.z_seed).normal(
        size=(flags.num_z, flags.d_latent)).astype(np.float32)
    rows = []
    for batch in batches:
        for i in range(batch["rgb"].shape[0]):
            one_img = {k: jnp.asarray(v[i : i + 1]) for k, v in batch.items()}
            totals, preds = one(
                variables["params"], variables["batch_stats"], one_img,
                jnp.asarray(zs),
            )
            totals = np.asarray(totals)
            preds = np.asarray(preds)  # (K, H, W, 1)
            rows.append({
                "min_loss": float(totals.min()),
                "mean_loss": float(totals.mean()),
                "spread": float(preds.std(axis=0).mean()),
            })
    return rows


def eval_ref(flags, batches):
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    for n in ("torchvision", "torchvision.models", "torchvision.transforms"):
        sys.modules.setdefault(n, types.ModuleType(n))
    ply = types.ModuleType("plyfile")
    ply.PlyData = ply.PlyElement = object
    sys.modules.setdefault("plyfile", ply)
    ref_root = os.path.join(
        os.environ.get("SCADE_REFERENCE", "/root/reference"),
        "ambiguity_aware_prior",
    )
    sys.path.insert(0, ref_root)
    sys.path.insert(0, os.path.join(ref_root, "tools"))
    from lib.configs.config import cfg

    cfg.MODEL.LOAD_IMAGENET_PRETRAINED_WEIGHTS = False
    cfg.MODEL.ENCODER = "resnext101_stride32x8d"
    cfg.DATASET.CROP_SIZE = (flags.crop, flags.crop)
    # the criterion dispatches on this (multi_depth_model_auxiv2.py:281-331);
    # config.py's default '_vnl_ssil_ranking_' names NONE of the 5 losses —
    # train_single.py only gets them via merge_cfg_from_file(FLAGS)
    cfg.TRAIN.LOSS_MODE = ("_ranking-edge_pairwise-normal-regress-edge_"
                           "msgil-normal_meanstd-tanh_"
                           "pairwise-normal-regress-plane_")
    from lib.models.multi_depth_model_auxiv2 import RelDepthModel_cIMLE
    from utils import load_mean_var_adain

    model = RelDepthModel_cIMLE(d_latent=flags.d_latent, version="v2")
    # weights_only=False: the oracle's save_ckpt pickles optimizer/scheduler
    # state alongside weights (net_tools.py:73-90); we produced this file
    ck = torch.load(flags.ref_ckpt, map_location="cpu", weights_only=False)
    sd = ck.get("model_state_dict", ck.get("depth_model"))
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    if not next(iter(sd)).startswith("depth_model."):
        sd = {"depth_model." + k: v for k, v in sd.items()}
    model.load_state_dict(sd, strict=False)
    model.eval()
    mv = load_mean_var_adain(flags.ref_mv, torch.device("cpu"))
    model.set_mean_var_shifts(*mv)

    zs = torch.from_numpy(
        np.random.default_rng(flags.z_seed).normal(
            size=(flags.num_z, flags.d_latent)).astype(np.float32))
    rows = []
    with torch.no_grad():
        for batch in batches:
            B = batch["rgb"].shape[0]
            for i in range(B):
                data = {}
                for k, v in batch.items():
                    t = torch.from_numpy(np.asarray(v[i : i + 1]))
                    if k == "rgb":
                        t = t.permute(0, 3, 1, 2).repeat(flags.num_z, 1, 1, 1)
                    elif k in ("depth", "disp"):
                        t = t.permute(0, 3, 1, 2).repeat(flags.num_z, 1, 1, 1)
                    elif k == "planes":
                        t = t.repeat(flags.num_z, 1, 1)
                    else:
                        t = t.repeat(flags.num_z)
                    data[k] = t
                data["quality_flg"] = data["quality_flg"].long()
                # is_train=True ⇒ criterion returns (loss_dict, per-image
                # totals) — the same eval-mode call z-recache makes
                # (train_single.py:474; model.eval() already set)
                out = model(data, zs)
                _, total_raw = out["losses"]
                pred = out["decoder"]
                totals = total_raw.detach().numpy()
                preds = pred.detach().numpy()
                rows.append({
                    "min_loss": float(totals.min()),
                    "mean_loss": float(totals.mean()),
                    "spread": float(preds.std(axis=0).mean()),
                })
    return rows


def load_batches(flags):
    from scade_tpu.prior.multi_data import MultiDataset

    ds = MultiDataset(flags.dataroot, flags.dataset, "train",
                      crop_size=(flags.crop, flags.crop))
    items = [ds[i] for i in range(len(ds))]
    out = {}
    for k in ("rgb", "depth", "disp", "planes"):
        out[k] = np.stack([it[k] for it in items])
    out["planes"] = out["planes"].astype(np.int32)
    out["focal_length"] = np.array(
        [it["focal_length"] for it in items], np.float32)
    out["quality_flg"] = np.array(
        [int(it["quality_flg"]) for it in items], np.int32)
    return [out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--dataset", default="taskonomy")
    ap.add_argument("--ours_ckpt")
    ap.add_argument("--ours_mv")
    ap.add_argument("--ref_ckpt")
    ap.add_argument("--ref_mv")
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--d_latent", type=int, default=32)
    ap.add_argument("--num_z", type=int, default=20)
    ap.add_argument("--z_seed", type=int, default=1234)
    ap.add_argument("--out", default=None, help="write rows as JSON")
    flags = ap.parse_args()

    batches = load_batches(flags)
    result = {}
    if flags.ref_ckpt:
        result["ref"] = eval_ref(flags, batches)
    if flags.ours_ckpt:
        result["ours"] = eval_ours(flags, batches)

    for side, rows in result.items():
        m = np.array([[r["min_loss"], r["mean_loss"], r["spread"]]
                      for r in rows])
        print(f"{side:5s}: selected-z loss {m[:, 0].mean():.4f} ± "
              f"{m[:, 0].std():.4f} | mean-z loss {m[:, 1].mean():.4f} | "
              f"hyp spread {m[:, 2].mean():.5f} (n={len(rows)})")
    if flags.out:
        with open(flags.out, "w") as fp:
            json.dump(result, fp, indent=1)
        print(f"wrote {flags.out}")


if __name__ == "__main__":
    main()
