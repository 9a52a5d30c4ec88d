"""CLI smoke for tools/output_depth_hypothesis_demo.py (the reference's
ambiguity_aware_prior/tools/output_depth_hypothesis_demo.py README flow):
arbitrary RGB images in, K depth-hypothesis .npy + preview pngs out.
Regression-covers the ceil num_sets fix with K not a multiple of the
z minibatch."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_demo_dump_odd_k(tmp_path):
    import jax
    from flax import serialization

    from scade_tpu.prior.model import backbone_config, init_prior, zero_shifts_for

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        # non-square raw size: the dump must resize back to it
        bgr = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.png"), bgr)

    cfg = backbone_config("resnext101_32x8d", d_latent=4).with_small()
    model, variables = init_prior(jax.random.PRNGKey(0), cfg, image_size=(64, 64))
    ckpt = tmp_path / "prior.msgpack"
    ckpt.write_bytes(serialization.to_bytes(variables))
    shifts = {k: np.asarray(v) for k, v in zero_shifts_for(model).items()}
    mean_var = tmp_path / "mean_var_adain.npy"
    np.save(mean_var, shifts)

    out_dir = tmp_path / "dump"
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "output_depth_hypothesis_demo.py"),
         "--image_dir", str(img_dir), "--ckpt", str(ckpt),
         "--mean_var", str(mean_var), "--out_dir", str(out_dir),
         "--d_latent", "4", "--num_hypothesis", "3", "--mini_batch_size", "2",
         "--small_model", "--image_size", "64", "--precision", "ambient"],
        env=dict(os.environ, SCADE_PLATFORM="cpu"),
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]

    npys = sorted(f for f in os.listdir(out_dir) if f.endswith(".npy"))
    # 2 images x 3 hypotheses (ceil over minibatch 2 — int division gave 2)
    assert npys == [f"im{i}_{k}.npy" for i in range(2) for k in range(3)]
    for f in npys:
        d = np.load(out_dir / f)
        assert d.shape == (40, 56) and np.isfinite(d).all(), f
    previews = [f for f in os.listdir(out_dir) if f.endswith("_preview.png")]
    assert len(previews) == 6
