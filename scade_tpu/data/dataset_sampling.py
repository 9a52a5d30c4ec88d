"""Random index subsets (reference: data/dataset_sampling.py:12-16).

Used by test-time camera-embedding optimization to batch full-image pixel
sets (run_scade_scannet.py:278). Host-side numpy.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def create_random_subsets(
    indices, subset_size: int, rng: Optional[np.random.Generator] = None
) -> List[np.ndarray]:
    """Shuffle `indices` and split into chunks of `subset_size` (the last
    chunk may be shorter) — torch.utils.data.random_split semantics."""
    rng = rng or np.random.default_rng()
    idx = np.asarray(list(indices))
    perm = rng.permutation(len(idx))
    shuffled = idx[perm]
    return [
        shuffled[s : s + subset_size] for s in range(0, len(shuffled), subset_size)
    ]
