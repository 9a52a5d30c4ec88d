"""Host-side scene IO: transforms_*.json scenes + cIMLE depth hypotheses.

Keeps the reference's on-disk contracts (reference: data/load_scene.py):
``transforms_{train,val,test,video}.json`` with per-frame ``file_path``,
``depth_file_path``, ``transform_matrix``, ``fx/fy/cx/cy``; top-level
``near``/``far``/``depth_scaling_factor`` on the train split; GT depth via
the ``rgb → target_depth`` filename convention; hypothesis dumps at
``<scene>/train/leres_cimle/<cimle_dir>/<img_id>_<k>.npy``.

Everything here is numpy on the host; arrays cross to device once, at the
start of training (a single h2d transfer instead of per-step uploads).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in the image
    cv2 = None

SPLITS = ("train", "val", "test", "video")


@dataclasses.dataclass
class Scene:
    """A loaded scene. Mirrors the reference's 13-tuple
    (data/load_scene.py:243-383) as named fields."""

    images: np.ndarray  # (N, H, W, 3) float32 in [0, 1]
    depths: np.ndarray  # (N, H, W, 1) float32 meters
    valid_depths: np.ndarray  # (N, H, W) bool
    poses: np.ndarray  # (N, 4, 4) float32 camera-to-world
    H: int
    W: int
    intrinsics: np.ndarray  # (N, 4) float32 (fx, fy, cx, cy)
    near: float
    far: float
    i_split: List[np.ndarray]  # [i_train, i_val, i_test, i_video]
    gt_depths: Optional[np.ndarray]  # (N, H, W, 1) or None
    gt_valid_depths: Optional[np.ndarray]  # (N, H, W) or None
    depth_hypothesis: Optional[np.ndarray]  # (N_train, K, H, W, 1) or None
    filenames: List[str] = dataclasses.field(default_factory=list)
    scales_init: Optional[np.ndarray] = None
    shifts_init: Optional[np.ndarray] = None

    @property
    def i_train(self):
        return self.i_split[0]

    @property
    def i_val(self):
        return self.i_split[1]

    @property
    def i_test(self):
        return self.i_split[2]

    @property
    def i_video(self):
        return self.i_split[3]

    def astuple(self):
        """The reference load_scene_scannet return layout."""
        return (
            self.images, self.depths, self.valid_depths, self.poses,
            self.H, self.W, self.intrinsics, self.near, self.far,
            self.i_split, self.gt_depths, self.gt_valid_depths,
            self.depth_hypothesis,
        )


def read_files(basedir: str, rgb_file: str, depth_file: str):
    """BGR(A)→RGB(A) /255 image + raw uint16 depth (data/load_scene.py:16-26)."""
    fname = os.path.join(basedir, rgb_file)
    img = cv2.imread(fname, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(fname)
    convert = cv2.COLOR_BGRA2RGBA if img.shape[-1] == 4 else cv2.COLOR_BGR2RGB
    img = (cv2.cvtColor(img, convert) / 255.0).astype(np.float32)
    depth_fname = os.path.join(basedir, depth_file)
    depth = cv2.imread(depth_fname, cv2.IMREAD_UNCHANGED)
    if depth is None:
        raise FileNotFoundError(depth_fname)
    return img, depth.astype(np.float64)


LERES_SIZE = 448
LERES_RGB_MEANS = np.array([0.485, 0.456, 0.406], np.float32)
LERES_RGB_VARS = np.array([0.229, 0.224, 0.225], np.float32)


def read_leres_image(basedir: str, rgb_file: str) -> np.ndarray:
    """448x448 ImageNet-normalized rgb for the LeReS prior
    (data/load_scene.py:28-48). Returns HWC float32 (the reference returns
    a CHW torch tensor)."""
    img = cv2.imread(os.path.join(basedir, rgb_file))[:, :, ::-1]
    img = cv2.resize(img, (LERES_SIZE, LERES_SIZE), interpolation=cv2.INTER_LINEAR)
    img = img.astype(np.float32) / 255.0
    return (img - LERES_RGB_MEANS) / LERES_RGB_VARS


def read_leres_depth(basedir: str, rgb_file: str, depth_scaling_factor: float,
                     near: float, far: float) -> np.ndarray:
    """448x448 GT depth via the rgb→target_depth swap, clipped to
    [near, far] (data/load_scene.py:51-69). Returns (H, W, 1) float32."""
    fname = os.path.join(basedir, rgb_file)
    fname = fname.replace("rgb", "target_depth").replace(".jpg", ".png")
    depth = cv2.imread(fname, cv2.IMREAD_UNCHANGED).astype(np.float64)
    depth = (depth / depth_scaling_factor).astype(np.float32)
    depth = cv2.resize(depth, (LERES_SIZE, LERES_SIZE),
                       interpolation=cv2.INTER_NEAREST)
    return np.clip(depth, near, far)[..., None]


def load_ground_truth_depth(basedir, train_filenames, image_size, depth_scaling_factor):
    """GT depth via the rgb→target_depth filename swap (data/load_scene.py:72-91)."""
    H, W = image_size
    gt_depths, gt_valid_depths = [], []
    for filename in train_filenames:
        filename = filename.replace("rgb", "target_depth").replace(".jpg", ".png")
        path = os.path.join(basedir, filename)
        if os.path.exists(path):
            gt = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float64)
            valid = gt > 0.5
            gt = (gt / depth_scaling_factor).astype(np.float32)
        else:
            gt = np.zeros((H, W), dtype=np.float32)
            valid = np.zeros((H, W), dtype=bool)
        gt_depths.append(gt[..., None])
        gt_valid_depths.append(valid)
    return np.stack(gt_depths, 0), np.stack(gt_valid_depths, 0)


def _load_splits(basedir: str, train_json: str, depth_ext_png: bool = False):
    """Shared frame-loading core for all loader variants."""
    all_imgs, all_depths, all_valid = [], [], []
    all_poses, all_intr = [], []
    counts = [0]
    filenames = []
    near = far = depth_scaling_factor = None
    H = W = None

    for s in SPLITS:
        # the train split reads the (possibly custom) --train_jsonfile;
        # existence must be checked on the file actually loaded
        split_json = os.path.join(
            basedir, train_json if s == "train" else f"transforms_{s}.json"
        )
        if not os.path.exists(split_json):
            counts.append(counts[-1])
            continue
        with open(split_json, "r") as fp:
            meta = json.load(fp)
        if s == "train":
            near = float(meta["near"])
            far = float(meta["far"])
            depth_scaling_factor = float(meta["depth_scaling_factor"])

        poses, intrinsics = [], []
        imgs, depths, valids = [], [], []
        for frame in meta["frames"]:
            if len(frame["file_path"]) != 0 or len(frame["depth_file_path"]) != 0:
                depth_path = frame["depth_file_path"]
                if depth_ext_png:
                    depth_path = depth_path.split(".")[0] + ".png"
                img, depth = read_files(basedir, frame["file_path"], depth_path)
                if depth.ndim == 2:
                    depth = depth[..., None]
                valid = depth[:, :, 0] > 0.5  # 0 values are invalid depth
                depth = (depth / depth_scaling_factor).astype(np.float32)
                filenames.append(frame["file_path"])
                imgs.append(img)
                depths.append(depth)
                valids.append(valid)
                H, W = img.shape[:2]
            poses.append(np.array(frame["transform_matrix"]))
            intrinsics.append(
                np.array((frame["fx"], frame["fy"], frame["cx"], frame["cy"]))
            )

        counts.append(counts[-1] + len(poses))
        if imgs:
            all_imgs.append(np.array(imgs))
            all_depths.append(np.array(depths))
            all_valid.append(np.array(valids))
        if poses:  # splits may legitimately have zero frames
            all_poses.append(np.array(poses).astype(np.float32))
            all_intr.append(np.array(intrinsics).astype(np.float32))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(len(SPLITS))]
    return (
        np.concatenate(all_imgs, 0),
        np.concatenate(all_depths, 0),
        np.concatenate(all_valid, 0),
        np.concatenate(all_poses, 0),
        np.concatenate(all_intr, 0),
        H, W, near, far, depth_scaling_factor, i_split, filenames,
    )


def _load_hypotheses(basedir, cimle_dir, filenames, i_train, num_hypothesis, near, far):
    """cIMLE hypothesis .npy dumps, clipped to [near, far]
    (data/load_scene.py:316-349). Returns (N_train, K, H, W, 1) float32.

    Loads all K x N_train files through the native parallel reader
    (scade_tpu/data/native_cache.py) when built — the serial Python loop is
    the cold-start bottleneck for big scenes — with a transparent numpy
    fallback. A packed blob + sidecar index is cached next to the dump so a
    warm restart (auto-reload of a 500k-step run re-loads the scene every
    time) does ONE sequential read instead of K x N_train opens; the cache
    self-invalidates when any .npy's (mtime, size) changes."""
    import json as _json

    from scade_tpu.data import native_cache

    leres_dir = os.path.join(basedir, "train", "leres_cimle", cimle_dir)
    paths = [
        os.path.join(
            leres_dir,
            f"{filenames[idx].split('/')[-1].split('.')[0]}_{j}.npy",
        )
        for idx in i_train
        for j in range(num_hypothesis)
    ]
    if not paths:
        return np.zeros((0, num_hypothesis, 0, 0, 1), np.float32)
    # recover (H, W) from the first file (all hypothesis maps share it)
    probe = np.load(paths[0], mmap_mode="r")
    H, W = probe.shape

    blob = os.path.join(leres_dir, ".scade_hyp_cache.blob")
    meta_path = blob + ".json"
    meta = {
        "files": [
            [os.path.basename(p)] + list(_stat_sig(p)) for p in paths
        ],
        "shape": [H, W],
    }
    if os.path.exists(blob) and os.path.exists(meta_path):
        try:
            with open(meta_path) as fp:
                if _json.load(fp) == meta:
                    flats = native_cache.read_blob(blob)
                    all_hyp = np.stack(flats, 0).reshape(
                        len(i_train), num_hypothesis, H, W, 1
                    )
                    return np.clip(all_hyp, near, far)
        except (IOError, OSError, ValueError):
            pass  # stale/corrupt cache → reload from the .npy files

    flats = native_cache.load_npy_batch(paths)
    all_hyp = np.stack(flats, 0).reshape(
        len(i_train), num_hypothesis, H, W, 1
    )
    try:
        native_cache.write_blob(blob, flats)
        with open(meta_path + ".tmp", "w") as fp:
            _json.dump(meta, fp)
        os.replace(meta_path + ".tmp", meta_path)
    except (IOError, OSError):
        pass  # read-only dump dir: warm restarts just reload the files
    return np.clip(all_hyp, near, far)


def _stat_sig(path):
    st = os.stat(path)
    return int(st.st_mtime_ns), int(st.st_size)


def _load_scale_shift_init(basedir, scales_dir, filenames, i_train, gt_init):
    scale_shift_dir = os.path.join(basedir, "train", "scale_shift_inits", scales_dir)
    suffix = "_gtinit.npy" if gt_init else "_sfminit.npy"
    scales, shifts = [], []
    for idx in i_train:
        img_id = filenames[idx].split("/")[-1].split(".")[0]
        ss = np.load(os.path.join(scale_shift_dir, img_id + suffix)).astype(np.float32)
        scales.append(ss[0])
        shifts.append(ss[1])
    return np.array(scales), np.array(shifts)


def load_scene(basedir, train_json="transforms_train.json") -> Scene:
    """Plain scene with GT depth, no hypotheses (data/load_scene.py:93-165)."""
    imgs, depths, valid, poses, intr, H, W, near, far, dsf, i_split, fnames = (
        _load_splits(basedir, train_json)
    )
    gt_d, gt_v = load_ground_truth_depth(basedir, fnames, (H, W), dsf)
    return Scene(imgs, depths, valid, poses, H, W, intr, near, far, i_split,
                 gt_d, gt_v, None, fnames)


def load_scene_scannet(
    basedir,
    cimle_dir,
    num_hypothesis=20,
    train_json="transforms_train.json",
    init_scales=False,
    scales_dir=None,
    gt_init=False,
) -> Scene:
    """ScanNet scene: GT depth + cIMLE hypotheses (data/load_scene.py:243-383)."""
    imgs, depths, valid, poses, intr, H, W, near, far, dsf, i_split, fnames = (
        _load_splits(basedir, train_json)
    )
    gt_d, gt_v = load_ground_truth_depth(basedir, fnames, (H, W), dsf)
    hyp = _load_hypotheses(basedir, cimle_dir, fnames, i_split[0], num_hypothesis, near, far)
    scene = Scene(imgs, depths, valid, poses, H, W, intr, near, far, i_split,
                  gt_d, gt_v, hyp, fnames)
    if init_scales:
        scene.scales_init, scene.shifts_init = _load_scale_shift_init(
            basedir, scales_dir, fnames, i_split[0], gt_init
        )
    return scene


def load_scene_nogt(basedir, train_json="transforms_train.json") -> Scene:
    """Scene with depth files forced to .png and no GT depth / hypotheses
    (data/load_scene.py:167-240)."""
    imgs, depths, valid, poses, intr, H, W, near, far, dsf, i_split, fnames = (
        _load_splits(basedir, train_json, depth_ext_png=True)
    )
    return Scene(imgs, depths, valid, poses, H, W, intr, near, far, i_split,
                 None, None, None, fnames)


def load_scene_processed(
    basedir,
    cimle_dir,
    num_hypothesis=20,
    train_json="transforms_train.json",
    init_scales=False,
    scales_dir=None,
    gt_init=False,
) -> Scene:
    """In-the-Wild / TnT scene: hypotheses, no GT depth, depth files forced
    to .png (data/load_scene.py:386-532)."""
    imgs, depths, valid, poses, intr, H, W, near, far, dsf, i_split, fnames = (
        _load_splits(basedir, train_json, depth_ext_png=True)
    )
    hyp = _load_hypotheses(basedir, cimle_dir, fnames, i_split[0], num_hypothesis, near, far)
    scene = Scene(imgs, depths, valid, poses, H, W, intr, near, far, i_split,
                  None, None, hyp, fnames)
    if init_scales:
        scene.scales_init, scene.shifts_init = _load_scale_shift_init(
            basedir, scales_dir, fnames, i_split[0], gt_init
        )
    return scene
