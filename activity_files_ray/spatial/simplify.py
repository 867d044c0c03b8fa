"""Polyline simplification (Douglas–Peucker) over partitioned tracks.

The reference's track-size reducers are time/distance downsampling
(``normalize.downsample_time`` / ``downsample_distance``, M9/M10 —
activity_transformations.dart's bucket pickers); Douglas–Peucker is
the shape-preserving third member of that family every geo pipeline
ships: drop points whose deviation from the kept chord is within a
tolerance, keeping geometry rather than cadence.

Exactness (the repo's integer-parity discipline, same headroom proof
as ``knn.nearest_poi_segment``): coordinates are integer
centidegrees, the deviation test for point P against chord A→B is

    cross² > eps² · len2      (len2 = |B−A|², cross = (B−A)×(P−A))
    |P−A|² > eps²             (degenerate chord, A == B)

— all int64 (coords ≤ 36 000 cd ⇒ cross² ≤ len2·|P−A|² ≤ 2.63e18 <
2^63), so the keep set is bit-reproducible and a DuckDB recursive
CTE replays the whole recursion exactly (see ``SQL_SIMPLIFY_TRACKS``
in pipelines/queries.py). Within a span every interior point shares
the chord, hence one shared denominator: the argmax is a pure int64
comparison; ties break to the FIRST (lowest-seq) point on both
sides.

Scale shape: simplification is per-track and sequential BY DEFINITION
(the keep decision depends on the whole track's recursion), so the
distribution unit is the track — ``groupby(track).map_groups``, the
same partitioning contract as the reference's per-activity
transforms. Inside a track the per-span scan is vectorized numpy;
across tracks Ray parallelizes freely. Track length is bounded by
device recording limits (~10^5 points), never by corpus size.
"""

from __future__ import annotations

import numpy as np


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: int) -> np.ndarray:
    """Douglas–Peucker keep mask for one polyline (integer coords).

    Iterative explicit-stack form of the recursion; per-span interior
    deviations are computed vectorized. Returns a bool mask; first
    and last points are always kept."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = x.size
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = int(eps) * int(eps)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        sdx = x[j] - x[i]
        sdy = y[j] - y[i]
        len2 = sdx * sdx + sdy * sdy
        px = x[i + 1 : j]
        py = y[i + 1 : j]
        if len2 == 0:
            num = (px - x[i]) ** 2 + (py - y[i]) ** 2
            den = np.int64(1)
        else:
            cross = sdx * (py - y[i]) - sdy * (px - x[i])
            num = cross * cross
            den = len2
        k_rel = int(np.argmax(num))  # first max → deterministic ties
        if int(num[k_rel]) > eps2 * int(den):
            k = i + 1 + k_rel
            keep[k] = True
            stack.append((k, j))
            stack.append((i, k))
    return keep


def simplify_tracks(
    ds,
    eps: int,
    track_col: str,
    order_cols: list[str],
    x_col: str,
    y_col: str,
    keep_cols: list[str] | None = None,
):
    """Per-track Douglas–Peucker over a Dataset: one
    ``groupby(track).map_groups`` exchange (the track is the atomic
    unit — see module docstring), vectorized DP inside each group.
    Rows are ordered by ``order_cols`` (must be a deterministic total
    order within a track); returns the kept rows' ``keep_cols``
    (default: track + order columns)."""
    import pandas as pd

    if keep_cols is None:
        keep_cols = [track_col, *order_cols]

    def simplify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="mergesort")
        mask = dp_keep_mask(
            df[x_col].to_numpy(np.int64), df[y_col].to_numpy(np.int64), eps
        )
        return df.loc[mask, keep_cols]

    return ds.groupby(track_col).map_groups(simplify, batch_format="pandas")
