"""MultiDataset annotations/curriculum reader (prior pretraining input).

Characterization tests of the load_test_data_v2 contract (reference:
ambiguity_aware_prior/data/multi_dataset.py:136-240) on a fabricated
mini-corpus: depth↔disp synthesis, max→10 normalization, invalid −1 /
sky (0 disp, 20 depth) marking, ground→planes merge, per-source quality
flags and focal lengths, curriculum permutation. The reference module
itself cannot be imported in this image (hard imgaug/torchvision deps),
so the contract is pinned here rather than via a live golden.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from scade_tpu.prior.multi_data import (
    FOCAL_LENGTH_DICT,
    InterleavedShardedSampler,
    MultiDataset,
    MultipleDataset,
    ROAD_LABEL,
    SKY_LABEL,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("multids")
    rng = np.random.default_rng(0)

    def put(ds, idx, with_depth, with_disp, with_masks):
        d = root / ds
        (d / "annotations").mkdir(parents=True, exist_ok=True)
        (d / "imgs").mkdir(exist_ok=True)
        anno = {}
        rgb = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        rgb_p = f"{ds}/imgs/{idx}_rgb.png"
        cv2.imwrite(str(root / rgb_p), rgb[:, :, ::-1])
        anno["rgb_path"] = rgb_p
        if with_depth:
            depth = rng.integers(100, 5000, (24, 32), dtype=np.uint16)
            depth[12, 16:18] = 0  # invalid pixels (outside the sky rows)
            p = f"{ds}/imgs/{idx}_depth.png"
            cv2.imwrite(str(root / p), depth)
            anno["depth_path"] = p
        if with_disp:
            disp = rng.integers(100, 5000, (24, 32), dtype=np.uint16)
            p = f"{ds}/imgs/{idx}_disp.png"
            cv2.imwrite(str(root / p), disp)
            anno["disp_path"] = p
        if with_masks:
            sem = np.zeros((24, 32), np.uint8)
            sem[:4, :] = SKY_LABEL
            sem[-4:, :] = ROAD_LABEL
            p = f"{ds}/imgs/{idx}_sem.png"
            cv2.imwrite(str(root / p), sem)
            anno["mask_path"] = p
            ins = np.zeros((24, 32), np.uint8)
            ins[8:12, 8:16] = 1
            p2 = f"{ds}/imgs/{idx}_ins.png"
            cv2.imwrite(str(root / p2), ins)
            anno["ins_planes_path"] = p2
        return anno

    annos = [put("taskonomy", i, True, False, True) for i in range(3)]
    with open(root / "taskonomy/annotations/train_annotations.json", "w") as f:
        json.dump(annos, f)

    annos2 = [put("diml_ganet", i, False, True, False) for i in range(5)]
    with open(root / "diml_ganet/annotations/train_annotations.json", "w") as f:
        json.dump(annos2, f)
    return str(root)


def test_depth_source_contract(corpus):
    ds = MultiDataset(corpus, "taskonomy", crop_size=(32, 32),
                      rng=np.random.default_rng(1))
    assert len(ds) == 3
    assert sorted(ds.curriculum_list) == [0, 1, 2]
    ex = ds[0]
    assert ex["rgb"].shape == (32, 32, 3)
    assert ex["depth"].shape == (32, 32, 1)
    assert ex["disp"].shape == (32, 32, 1)
    assert ex["planes"].shape == (32, 32)
    # quality flag 3 + taskonomy focal (multi_dataset.py:52,229-230)
    assert int(ex["quality_flg"]) == 3
    assert float(ex["focal_length"]) == FOCAL_LENGTH_DICT["taskonomy"]
    depth = ex["depth"][..., 0]
    # sky rows → 20 in depth, 0 in disp (:210-211)
    assert (depth[:5, :] == 20).all()
    assert (ex["disp"][:5, :, 0] == 0).all()
    body = depth[7:]  # rows 0..6 of the 32-row resize map to the sky band
    # valid body normalized to max→10 with invalids at −1 (:202-208)
    assert (body[body >= 0] <= 10.0 + 1e-5).all()
    assert (depth == -1).any()  # the seeded invalid pixel survives resize
    # ground rows merged into planes as a fresh instance id (:193)
    assert ex["planes"][-3:, :].max() >= 2
    # disp synthesized from depth is consistent: ranking preserved
    v = (depth > 0) & (depth < 20) & (ex["disp"][..., 0] > 0)
    d, p = depth[v], ex["disp"][..., 0][v]
    corr = np.corrcoef(d, 1.0 / np.maximum(p, 1e-6))[0, 1]
    assert corr > 0.9


def test_disp_only_source_contract(corpus):
    ds = MultiDataset(corpus, "diml_ganet", crop_size=(32, 32),
                      rng=np.random.default_rng(2))
    assert len(ds) == 5
    ex = ds[1]
    assert int(ex["quality_flg"]) == 2
    assert float(ex["focal_length"]) == FOCAL_LENGTH_DICT["diml_ganet"]
    # depth synthesized from disp: max→10, nothing marked sky
    depth = ex["depth"][..., 0]
    assert depth.max() <= 10.0 + 1e-5
    assert (depth != 20).all()
    assert np.isfinite(ex["rgb"]).all()


def test_feeds_interleaved_sampler(corpus):
    a = MultiDataset(corpus, "taskonomy", crop_size=(32, 32),
                     rng=np.random.default_rng(3))
    b = MultiDataset(corpus, "diml_ganet", crop_size=(32, 32),
                     rng=np.random.default_rng(4))
    md = MultipleDataset([a, b])
    s = InterleavedShardedSampler(md, num_replicas=2, rank=0,
                                  rng=np.random.default_rng(5))
    idx = list(iter(s))
    assert len(idx) == len(s)
    ex = md[idx[0]]
    assert set(ex) >= {"rgb", "depth", "disp", "quality_flg", "planes",
                       "focal_length"}
