"""Depth-completion data utilities (reference: data/scannet_dataset.py).

The reference's ScanNetDataset/TaskonomyDataset classes feed a depth-
completion prior that the SCADE flow itself never trains (the runners
import only these helper functions — SURVEY.md §2.1). We provide the
helpers in numpy plus a lightweight ScanNetDataset loader with the same
on-disk contract (rgb/depth file lists + optional COLMAP SQLite keypoint
sparsification of the depth).
"""

from __future__ import annotations

import os
import sqlite3
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

MAX_DEPTH_M = 16.38  # 1/4 of the 16-bit range at 512 units/m (reference :65-68)


def read_depth(depth_file: str) -> Tuple[np.ndarray, np.ndarray]:
    """uint16 depth png → (depth in [0,1] of 16.38 m, valid mask)
    (reference :51-74): values > 23000 invalid, 512 units per meter."""
    depth = cv2.imread(depth_file, cv2.IMREAD_UNCHANGED)
    depth = depth.astype(np.float64)
    depth[depth > 23000] = 0
    depth = depth / 512.0  # meters
    valid = depth.astype(bool)
    depth = depth.astype(np.float32) / MAX_DEPTH_M
    over = depth > 1.0
    depth[over] = 0.0
    valid[over] = False
    return depth, valid


def convert_depth_completion_scaling_to_m_taskonomy(depth):
    return depth * MAX_DEPTH_M


def convert_m_to_depth_completion_scaling_taskonomy(depth):
    return depth / MAX_DEPTH_M


def convert_depth_completion_scaling_to_m(depth):
    # map range 0..1 to 0..16.38 m via the 4000 units/m 16-bit convention
    return depth * (2**16 - 1) / 4000.0


def convert_m_to_depth_completion_scaling(depth):
    return depth * 4000.0 / (2**16 - 1)


def get_pretrained_normalize():
    """ImageNet (un)normalization params for rgb and rgbd stacks
    (reference :99-106). Returns dict {'rgb': (mean, std), 'rgbd': ...}."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (
        {"rgb": (mean, std), "rgbd": (np.append(mean, 0.0), np.append(std, 1.0))},
        {
            "rgb": (-mean / std, 1.0 / std),
            "rgbd": (
                np.append(-mean / std, 0.0),
                np.append(1.0 / std, 1.0),
            ),
        },
    )


def resize_sparse_depth(depths, valid_depths, size):
    """Sparsity-preserving resize: move each valid sample to its resized
    pixel-center location instead of interpolating (reference :108-125).

    depths: (B, H, W) float; valid_depths: (B, H, W) bool; size: (h, w).
    """
    depths = np.asarray(depths)
    valid = np.asarray(valid_depths)
    B, H, W = depths.shape
    h, w = size
    fh, fw = h / H, w / W
    out = np.zeros((B, h, w), depths.dtype)
    out_valid = np.zeros((B, h, w), bool)
    b_idx, r_idx, c_idx = np.nonzero(valid)
    r2 = ((r_idx + 0.5) * fh).astype(int)
    c2 = ((c_idx + 0.5) * fw).astype(int)
    keep = (r2 >= 0) & (r2 < h) & (c2 >= 0) & (c2 < w)
    out[b_idx[keep], r2[keep], c2[keep]] = depths[b_idx[keep], r_idx[keep], c_idx[keep]]
    out_valid[b_idx[keep], r2[keep], c2[keep]] = True
    return out, out_valid


def sample_depth_at_image_features(
    depth, valid_depth, db_path: str, db_image_id: int, scale=(1.0, 1.0),
    pad_height: int = 0,
):
    """Keep depth only at COLMAP SfM keypoints, read from the `keypoints`
    table of a COLMAP SQLite database (reference :248-271). depth/valid:
    (H, W). Returns sparsified (depth, valid)."""
    depth = np.array(depth, copy=True)
    valid = np.array(valid_depth, copy=True)
    con = sqlite3.connect(db_path)
    try:
        rows_db = con.execute(
            "SELECT data FROM keypoints WHERE image_id==?", (db_image_id,)
        ).fetchall()
    finally:
        con.close()
    if not rows_db or rows_db[0][0] is None:
        return np.zeros_like(depth), np.zeros_like(valid)
    kp = np.frombuffer(rows_db[0][0], dtype=np.float32).reshape(-1, 6)
    cols = (kp[:, 0] * scale[1]).astype(int)
    rows = ((kp[:, 1] + pad_height) * scale[0]).astype(int)
    keep = (rows >= 0) & (rows < depth.shape[0]) & (cols >= 0) & (cols < depth.shape[1])
    mask = np.zeros_like(valid)
    mask[rows[keep], cols[keep]] = True
    valid = valid & mask
    depth[~valid] = 0.0
    return depth, valid


class ScanNetDataset:
    """Depth-completion example loader (reference ScanNetDataset :127-274):
    rgb + sensor depth (+ optional SfM-keypoint sparsification), ImageNet-
    normalized rgbd stacks. numpy host-side; iterate and batch manually."""

    def __init__(self, rgb_files, depth_files, feature_db: Optional[str] = None,
                 db_ids=None):
        self.rgb_files = list(rgb_files)
        self.depth_files = list(depth_files)
        self.feature_db = feature_db
        self.db_ids = db_ids

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, i: int) -> dict:
        rgb = cv2.imread(self.rgb_files[i])[:, :, ::-1].astype(np.float32) / 255.0
        depth, valid = read_depth(self.depth_files[i])
        if self.feature_db is not None:
            depth, valid = sample_depth_at_image_features(
                depth, valid, self.feature_db, self.db_ids[i]
            )
        norm, _ = get_pretrained_normalize()
        mean, std = norm["rgb"]
        rgb_n = (rgb - mean) / std
        rgbd = np.concatenate([rgb_n, depth[..., None]], axis=-1)
        return {
            "rgbd": rgbd.astype(np.float32),
            "depth": depth[..., None],
            "valid_depth": valid,
        }
