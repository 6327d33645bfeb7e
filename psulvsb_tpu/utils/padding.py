"""Static-shape padding helpers.

The reference resizes Eigen matrices dynamically; under XLA every distinct
correspondence count would trigger a recompile. Callers pad to size buckets
so the 1623-pair 3DMatch sweep reuses a handful of compiled programs.
"""

from __future__ import annotations

import numpy as np


def pad_to_bucket(n: int, buckets: tuple[int, ...] = (256, 512, 1024, 2048, 4096, 8192)) -> int:
    """Smallest bucket >= n (last bucket if n exceeds all)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_columns(arr: np.ndarray, target: int, fill: float = 0.0) -> np.ndarray:
    """Pad a (3, N) array to (3, target) with `fill` columns."""
    n = arr.shape[1]
    if n >= target:
        return arr[:, :target]
    out = np.full((arr.shape[0], target), fill, dtype=arr.dtype)
    out[:, :n] = arr
    return out
