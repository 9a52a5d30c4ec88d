"""Multi-dataset training input for prior pretraining.

Replicates the reference's taskonomy-style multi-dataset machinery
(reference: ambiguity_aware_prior/data/multi_dataset.py:15-97,
load_dataset_distributed.py:40-171): several datasets, each with a
curriculum list, concatenated and sampled with round-robin interleaving
(train order [A, B, C, A, B, C, ...]) and rank sharding for multi-host
runs. Host-side numpy; the per-example decode delegates to the member
datasets' __getitem__.

In the TPU build "rank" is `jax.process_index()` and "world size"
`jax.process_count()` — the same program runs single- or multi-host.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


class MultiDataset:
    """Concatenation of datasets with global indexing
    (load_dataset_distributed.py:40-57)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._sizes = np.array([len(d) for d in self.datasets])
        self._cum = np.cumsum(np.append([0], self._sizes))

    def __len__(self):
        return int(self._sizes.sum())

    def __getitem__(self, global_idx: int):
        d = int(np.searchsorted(self._cum, global_idx, side="right") - 1)
        return self.datasets[d][int(global_idx - self._cum[d])]


class InterleavedShardedSampler:
    """CustomerMultiDataSampler semantics (load_dataset_distributed.py:81-171):

    - per dataset: shuffle its curriculum, then extend by re-shuffled copies
      to the max dataset length (so small datasets repeat — :144-160);
    - train order interleaves datasets round-robin [A0, B0, C0, A1, ...];
    - pad to a multiple of world size, then each rank takes a contiguous
      shard.
    """

    def __init__(self, multi_dataset: MultiDataset, num_replicas: int = 1,
                 rank: int = 0, split: str = "train", sample_ratio: float = 1.0,
                 rng: Optional[np.random.Generator] = None):
        self.ds = multi_dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.split = split
        self.sample_ratio = sample_ratio
        self.rng = rng or np.random.default_rng()

        sizes = self.ds._sizes
        max_len = int(sizes.max())
        self._extended_len = (
            np.full(len(sizes), max_len) if split == "train" else sizes
        )
        self.num_samples = (self._extended_len * sample_ratio).astype(np.int64)
        self.total_sampled = int(self.num_samples.sum())
        self.num_dist_samples = int(
            math.ceil(self.total_sampled / self.num_replicas)
        )
        self.total_dist_size = self.num_dist_samples * self.num_replicas

    def _extended_indices(self) -> List[np.ndarray]:
        out = []
        max_len = int(self._extended_len.max()) if self.split == "train" else None
        for size in self.ds._sizes:
            perm = self.rng.permutation(size)
            if self.split != "train":
                out.append(perm)
                continue
            reps = [perm]
            filled = size
            while filled + size <= max_len:
                reps.append(self.rng.permutation(size))
                filled += size
            rem = max_len - filled
            if rem > 0:
                reps.append(self.rng.choice(size, rem, replace=False))
            out.append(np.concatenate(reps))
        return out

    def __iter__(self):
        per_ds = self._extended_indices()
        offsets = self.ds._cum[:-1]
        sampled = [
            per_ds[i][: self.num_samples[i]] + offsets[i]
            for i in range(len(per_ds))
        ]
        if self.split == "train":
            # round-robin interleave (:118-120)
            stacked = np.stack(sampled, axis=0)  # (D, n)
            indices = stacked.T.reshape(-1)
        else:
            indices = np.concatenate(sampled)

        diff = self.total_dist_size - indices.size
        if diff > 0:
            indices = np.append(indices, indices[:diff])
        start = self.num_dist_samples * self.rank
        yield from indices[start : start + self.num_dist_samples].tolist()

    def __len__(self):
        return self.num_dist_samples
