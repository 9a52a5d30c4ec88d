"""TaskonomyDataset (depth-completion, reference data/scannet_dataset.py:
276-515): annotations json + COLMAP SQLite keypoint sparsification +
missing-depth corruption + sparse-preserving resize + rgbd normalization."""

import json
import os
import sqlite3

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from scade_tpu.data.scannet_dataset import (
    TaskonomyDataset,
    get_pretrained_normalize,
    read_depth,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("taskonomy")
    ds_dir = root / "taskonomy"
    (ds_dir / "annotations").mkdir(parents=True)
    img_dir = root / "imgs" / "scene" / "color"
    img_dir.mkdir(parents=True)
    dep_dir = root / "imgs" / "scene" / "depth"
    dep_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    annos = []
    db_path = str(root / "features.db")
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE images (name TEXT, image_id INTEGER)")
    con.execute("CREATE TABLE keypoints (image_id INTEGER, data BLOB)")
    H, W = 48, 64
    for i in range(3):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.jpg"), rgb[:, :, ::-1])
        depth = rng.integers(200, 8000, (H, W), dtype=np.uint16)
        cv2.imwrite(str(dep_dir / f"{i}.png"), depth)
        annos.append({
            "rgb_path": f"imgs/scene/color/{i}.jpg",
            "depth_path": f"imgs/scene/depth/{i}.png",
        })
        # id = last-3 path components of the rgb file sans extension
        name = f"scene/color/{i}.jpg"
        con.execute("INSERT INTO images VALUES (?, ?)", (name, i + 1))
        kp = np.zeros((40, 6), np.float32)
        kp[:, 0] = rng.uniform(0, W, 40)  # cols
        kp[:, 1] = rng.uniform(0, H, 40)  # rows
        con.execute(
            "INSERT INTO keypoints VALUES (?, ?)", (i + 1, kp.tobytes())
        )
    con.commit()
    con.close()
    with open(ds_dir / "annotations" / "train_annotations.json", "w") as f:
        json.dump(annos, f)
    return str(ds_dir), db_path


def test_basic_example(corpus):
    ds_dir, db = corpus
    ds = TaskonomyDataset(ds_dir, "train", db, load_size=(24, 32),
                          missing_depth_percent=0.0,
                          rng=np.random.default_rng(1))
    assert len(ds) == 3
    ex = ds[0]
    assert ex["found"]
    assert ex["rgbd"].shape == (24, 32, 4)
    assert ex["target_depth"].shape == (24, 32, 1)
    assert ex["valid_depth"].dtype == bool
    # sparse depth only at (resized) keypoints; strictly fewer valid than target
    assert ex["valid_depth"].sum() <= 40
    assert 0 < ex["valid_depth"].sum() < ex["target_valid_depth"].sum()
    # depth channel zero off the sparse mask
    d = ex["rgbd"][..., 3]
    assert (d[~ex["valid_depth"]] == 0).all()
    assert (d[ex["valid_depth"]] > 0).all()
    # rgb ImageNet-normalized: un-normalizing lands in [0, 1]
    norm, _ = get_pretrained_normalize()
    mean, std = norm["rgb"]
    rgb = ex["rgbd"][..., :3] * std + mean
    assert rgb.min() >= -1e-5 and rgb.max() <= 1 + 1e-5
    # target depth matches read_depth of the raw file at nearest-resize points
    assert np.isfinite(ex["target_depth"]).all()
    assert ex["target_depth"].max() <= 1.0


def test_missing_depth_corruption(corpus):
    ds_dir, db = corpus
    dense = TaskonomyDataset(ds_dir, "train", db, load_size=(24, 32),
                             missing_depth_percent=0.0,
                             rng=np.random.default_rng(2))
    sparse = TaskonomyDataset(ds_dir, "train", db, load_size=(24, 32),
                              missing_depth_percent=0.998,
                              rng=np.random.default_rng(2))
    assert sparse[1]["valid_depth"].sum() < dense[1]["valid_depth"].sum()


def test_augmentations_run(corpus):
    ds_dir, db = corpus
    ds = TaskonomyDataset(ds_dir, "train", db, load_size=(24, 32),
                          random_rot=10, horizontal_flip=True,
                          color_jitter=0.2, depth_noise=True,
                          missing_depth_percent=0.5,
                          rng=np.random.default_rng(3))
    ex = ds[2]
    assert ex["rgbd"].shape == (24, 32, 4)
    assert np.isfinite(ex["rgbd"]).all()
    assert ex["found"]


def test_missing_file_yields_zero_example(corpus):
    ds_dir, db = corpus
    ds = TaskonomyDataset(ds_dir, "train", db, load_size=(24, 32),
                          rng=np.random.default_rng(4))
    ds.rgb_files[0] = "/nonexistent/x.jpg"
    ex = ds[0]
    assert not ex["found"]
    assert (ex["rgbd"] == 0).all()


def test_missing_depth_zero_fills(corpus, tmp_path):
    """An annotation without 'depth_path' (or with a missing file) yields the
    zeroed found=False example instead of crashing mid-epoch — the reference
    zero-guards only the rgb read (:369-376) and TypeErrors in read_depth."""
    ds_dir, db = corpus
    anno_dir = tmp_path / "t" / "annotations"
    anno_dir.mkdir(parents=True)
    with open(os.path.join(ds_dir, "annotations",
                           "train_annotations.json")) as f:
        annos = json.load(f)
    annos.append({"rgb_path": annos[0]["rgb_path"]})  # no depth_path
    annos.append({"rgb_path": annos[1]["rgb_path"],
                  "depth_path": "imgs/scene/depth/missing.png"})
    # dataset resolves paths relative to <dataset_dir>/..; mirror that root
    os.symlink(os.path.join(ds_dir, "..", "imgs"), tmp_path / "imgs")
    os.symlink(db, tmp_path / "features.db")
    with open(anno_dir / "train_annotations.json", "w") as f:
        json.dump(annos, f)
    ds = TaskonomyDataset(str(tmp_path / "t"), "train",
                          str(tmp_path / "features.db"),
                          load_size=(24, 32), missing_depth_percent=0.0,
                          rng=np.random.default_rng(2))
    for idx in (3, 4):
        ex = ds[idx]
        assert ex["found"] is False
        assert not ex["rgbd"].any() and not ex["valid_depth"].any()
    assert ds[0]["found"]
