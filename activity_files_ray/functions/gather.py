"""Vectorized ragged-range gather: the CSR workhorse shared by the
broadcast spatial indexes (polygon and POI lookups)."""

from __future__ import annotations

import numpy as np


def multi_range_gather(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate ``arange(starts[i], starts[i]+counts[i])`` for all i
    without a Python loop. Returns the flat index array."""
    starts = np.asarray(starts, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep_starts = np.repeat(starts, counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    return rep_starts + within
