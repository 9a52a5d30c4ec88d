"""Prior PRETRAINING path: tools/train_prior.py --dataset multi over a
taskonomy-style annotations corpus (the reference train_single.py +
MultipleDataLoaderDistributed flow), plus the decoder-side cIMLE trainer
(--cimle_version dec)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain")
    rng = np.random.default_rng(0)
    for ds in ("taskonomy", "diml_ganet"):
        d = root / ds
        (d / "annotations").mkdir(parents=True)
        (d / "imgs").mkdir()
        annos = []
        for i in range(3):
            rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(d / "imgs" / f"{i}.png"), rgb[:, :, ::-1])
            depth = rng.integers(100, 5000, (48, 64), dtype=np.uint16)
            cv2.imwrite(str(d / "imgs" / f"{i}_d.png"), depth)
            annos.append({
                "rgb_path": f"{ds}/imgs/{i}.png",
                "depth_path": f"{ds}/imgs/{i}_d.png",
            })
        with open(d / "annotations" / "train_annotations.json", "w") as f:
            json.dump(annos, f)
    return str(root)


def _run(args, timeout=900):
    env = dict(os.environ, SCADE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_prior.py")] + args,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert p.returncode == 0, p.stdout[-2000:] + p.stderr[-2000:]
    return p.stdout


def test_pretrain_from_annotations(corpus, tmp_path):
    log = tmp_path / "log"
    out = _run([
        "--dataset", "multi", "--dataroot", corpus,
        "--dataset_list", "taskonomy", "diml_ganet",
        "--log_dir", str(log), "--epochs", "1", "--batchsize", "2",
        "--d_latent", "4", "--refresh_z", "1", "--num_samples", "2",
        "--mini_batch_size", "2", "--adain_subset", "2",
        "--small_model", "--image_size", "64",
        "--loss_mode", "_meanstd-tanh_msgil-normal_",
    ])
    # interleaved sampler: 3+3 sources extend to max → 6 total
    assert "6 training examples" in out
    assert "Epoch 0/1" in out
    assert os.path.exists(log / "mean_var_adain.npy")
    assert any(f.endswith(".msgpack") for f in os.listdir(log))


def test_only_output_adain_init(corpus, tmp_path):
    log = tmp_path / "log2"
    out = _run([
        "--dataset", "multi", "--dataroot", corpus,
        "--dataset_list", "taskonomy",
        "--log_dir", str(log), "--epochs", "3", "--batchsize", "2",
        "--d_latent", "4", "--adain_subset", "2", "--mini_batch_size", "2",
        "--small_model", "--image_size", "64", "--only_output_adain_init",
    ])
    assert "exiting" in out
    assert os.path.exists(log / "mean_var_adain.npy")
    assert not any(f.endswith(".msgpack") for f in os.listdir(log))


def test_decoder_side_trainer(tmp_path):
    # --cimle_version dec over the synthetic scene fixture
    scene = tmp_path / "scene"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synthetic_scene.py"),
         str(scene), "--H", "48", "--W", "64"],
        check=True, capture_output=True, cwd=REPO,
    )
    log = tmp_path / "log3"
    out = _run([
        "--scene_dir", str(scene), "--log_dir", str(log),
        "--epochs", "1", "--batchsize", "2", "--d_latent", "4",
        "--refresh_z", "1", "--num_samples", "2", "--mini_batch_size", "2",
        "--adain_subset", "2", "--small_model", "--image_size", "64",
        "--cimle_version", "dec", "--version", "v2",
        "--loss_mode", "_meanstd-tanh_",
    ])
    assert "Epoch 0/1" in out
    assert any(f.endswith(".msgpack") for f in os.listdir(log))
