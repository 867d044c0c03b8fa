"""Spatio-temporal PROXIMITY join (encounter detection): user pairs
with at least one point pair within Chebyshev distance ``d_cd``
centidegrees AND within ``t_us`` microseconds — the contact-tracing /
co-travel primitive over trajectory corpora (the corpus lift of the
reference's single-file nearest-sample join, gpx nearest_join).

Plan — the standard grid-bucket self-join with HALF-SPACE probing so
every qualifying point pair is generated exactly once:

* every point lands as an OWN row in its (cell, tbucket) key — cell
  at a level whose lat AND lon extents are both >= d_cd (so matching
  points are never further than one cell apart), tbucket =
  ``ts_us // t_us`` (so |Δts| <= t_us implies adjacent buckets);
* every point also emits PROBE rows into the 13 lexicographically
  POSITIVE neighbor keys of the 3x3x3 offset lattice (dx wraps
  modulo the grid width). A pair in the SAME key pairs own x own
  (i < j); a pair one offset apart is found in exactly one group —
  the own side of the later key — as own x probe. Probing half the
  lattice halves the exchange volume vs symmetric 27x emission;
* per-group verification is one vectorized predicate evaluation
  (plain |Δlat|, |Δlon| — deliberately UN-wrapped, matching the SQL
  oracle's abs() semantics); same-user pairs drop;
* the verified point-pair stream aggregates to
  ``(ua, ub, n_hits)`` through the hash-partitioned two-phase
  aggregate — user-pair cardinality tracks the corpus, so the
  driver-merged tree is banned here (agg.py rule).

Skew note: candidate pairs are quadratic in the population of one
(cell, tbucket) bucket — inherent to any exact spatial self-join. At
production density pick ``level`` so cell extent ~ d_cd (the minimum
that stays complete), which bounds bucket population by local
density; a pathological single-cell corpus degrades to the exact
quadratic work the semantics demand.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..pipelines import agg

# the 13 offsets (dt, dy, dx) lexicographically above (0, 0, 0)
_POS_OFFSETS = [
    (dt, dy, dx)
    for dt in (0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
    if (dt, dy, dx) > (0, 0, 0)
]


def min_complete_level(d_cd: int) -> int:
    """Finest grid level whose lat extent (the smaller axis:
    180°/2^L = 18000/2^L cd) still covers ``d_cd`` — one-cell
    probing is complete at any level <= this."""
    lv = 0
    while (18000 >> (lv + 1)) >= d_cd and lv < 20:
        lv += 1
    return lv


def proximity_pairs(
    pts_ds,
    d_cd: int,
    t_us: int,
    level: int | None = None,
    n_buckets: int | None = None,
):
    """``pts_ds`` needs (user_id, ts_us, lat_cd, lon_cd) columns.
    Returns a Dataset of (ua, ub, n_hits): unordered user pairs with
    >= 1 qualifying point pair, and how many such point pairs.

    Radius limit: the one-neighbor-ring plan is complete only while a
    single cell covers ``d_cd``, and the half-space dedup argument
    needs a grid at least 4 cells wide (level >= 2, cell height 4500
    cd) — so the automatic ``level=None`` selection supports
    ``d_cd <= 4500`` (45° ≈ 5000 km; anything larger is not a
    "proximity" radius). Larger radii raise loudly here; they would
    need symmetric 27-offset emission plus pair dedup."""
    if level is None:
        level = min_complete_level(d_cd)
        if level < 2:
            raise ValueError(
                f"proximity_pairs: d_cd={d_cd} exceeds the supported "
                "automatic radius (d_cd <= 4500 cd, the level-2 cell "
                "height); the 1-ring plan is incomplete above that"
            )
    if (18000 >> level) < d_cd:
        raise ValueError(f"level {level} cells are thinner than d_cd={d_cd}")
    if level < 2:
        # at grid width < 4 the wrapped offset +1 equals -1 and the
        # half-space uniqueness argument breaks (pairs would be
        # generated twice)
        raise ValueError("proximity_pairs needs level >= 2")
    n_grid = 1 << level

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        # integer-exact cell coords from centidegrees
        la = df["lat_cd"].to_numpy(np.int64)
        lo = df["lon_cd"].to_numpy(np.int64)
        ix = np.clip((lo + 18000) * n_grid // 36000, 0, n_grid - 1)
        iy = np.clip((la + 9000) * n_grid // 18000, 0, n_grid - 1)
        tb = df["ts_us"].to_numpy(np.int64) // t_us
        base = {
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": df["ts_us"].to_numpy(np.int64),
            "la": la,
            "lo": lo,
        }
        frames = [
            pd.DataFrame(
                {"cx": ix, "cy": iy, "tb": tb, "own": np.int64(1), **base}
            )
        ]
        for dt, dy, dx in _POS_OFFSETS:
            ny = iy + dy
            ok = (ny >= 0) & (ny < n_grid)  # lat clamps, lon wraps
            if not ok.any():
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "cx": (ix[ok] + dx) % n_grid,
                        "cy": ny[ok],
                        "tb": tb[ok] + dt,
                        "own": np.int64(0),
                        **{k: v[ok] for k, v in base.items()},
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["own"].to_numpy() == 1]
        prb = g[g["own"].to_numpy() == 0]
        n, m = len(own), len(prb)
        ai, bi = np.triu_indices(n, 1)  # own x own, i < j
        if m:
            ci, di = np.meshgrid(np.arange(n), np.arange(m), indexing="ij")
            ai = np.concatenate([ai, ci.ravel()])
        au = own["user_id"].to_numpy(np.int64)
        ala, alo = own["la"].to_numpy(np.int64), own["lo"].to_numpy(np.int64)
        ats = own["ts_us"].to_numpy(np.int64)
        if m:
            bu = np.concatenate([au[bi], prb["user_id"].to_numpy(np.int64)[di.ravel()]])
            bla = np.concatenate([ala[bi], prb["la"].to_numpy(np.int64)[di.ravel()]])
            blo = np.concatenate([alo[bi], prb["lo"].to_numpy(np.int64)[di.ravel()]])
            bts = np.concatenate([ats[bi], prb["ts_us"].to_numpy(np.int64)[di.ravel()]])
        else:
            bu, bla, blo, bts = au[bi], ala[bi], alo[bi], ats[bi]
        aui, alai, aloi, atsi = au[ai], ala[ai], alo[ai], ats[ai]
        ok = (
            (aui != bu)
            & (np.abs(alai - bla) <= d_cd)
            & (np.abs(aloi - blo) <= d_cd)
            & (np.abs(atsi - bts) <= t_us)
        )
        return pd.DataFrame(
            {
                "ua": np.minimum(aui[ok], bu[ok]),
                "ub": np.maximum(aui[ok], bu[ok]),
            }
        )

    hits = (
        # emission multiplies rows 14x — bound the per-task frame by
        # an explicit batch_size instead of whole-block batches
        pts_ds.map_batches(emit, batch_format="pandas", batch_size=65536)
        .groupby(["cx", "cy", "tb"])
        .map_groups(verify, batch_format="pandas")
    )
    return agg.bucketed_aggregate(
        hits, ["ua", "ub"], {"n_hits": ("", "count")}, n_buckets=n_buckets
    )
