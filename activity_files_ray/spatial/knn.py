"""kNN point→POI matching via cell-ring expansion.

North_rule: "kNN matching of route segments to nearest POIs via
cell-neighbor ring expansion". The reference has no spatial search;
its closest analog is the nearest-timestamp channel cursor
(``/root/reference/lib/src/channel_mapper.dart:103-229``) — the same
"expand until a provably-nearest candidate is found" idea, lifted
from 1-D time to the 2-D cell grid.

Design (scale-first):
* The POI side is SMALL relative to the corpus (POIs ≈ 10^6–10^8 rows
  vs 10^12 points) → build a CSR cell→POI index ONCE on the driver,
  broadcast via ``ray.put``, load per actor in ``__init__``. No
  shuffle ever touches the big side.
* Per batch, all points are matched fully vectorized: radius
  r=0,1,2… gathers candidate POIs from every still-unresolved
  point's k-disk at once (numpy searchsorted over sorted cell keys +
  CSR gather); a point is resolved once its best distance is provably
  ≤ the minimum distance any cell at Chebyshev distance > r can hold
  (≥ r·cell_lat degrees), so results are EXACT nearest under
  squared-degree distance with smallest-id tie-break.
"""

from __future__ import annotations

import numpy as np

from ..functions import cells


class PoiIndex:
    """Driver-built CSR index: level-L cell id → POI rows.

    Distances are squared-Euclidean in *degrees* (compatible with the
    grid's ring geometry); callers wanting exact-integer parity keep
    coordinates on a centidegree lattice and rescale.
    """

    def __init__(
        self,
        poi_ids: np.ndarray,
        lat: np.ndarray,
        lon: np.ndarray,
        level: int = cells.LEVEL_TILE,
        metric_lat: np.ndarray | None = None,
        metric_lon: np.ndarray | None = None,
        metric_scale: float = 1.0,
    ):
        """``metric_*``: optional coordinates used for DISTANCE
        comparisons (cell placement always uses degrees). Pass
        integer-valued arrays (e.g. centidegrees) to make tie-breaks
        EXACT: float math on integers < 2^26 is lossless, while
        degree floats can order two int-metric ties differently —
        a real bug found by the 10× scale gate. ``metric_scale`` =
        metric units per degree (bounds are rescaled with it)."""
        self.level = level
        self.lat = np.asarray(lat, dtype=np.float64)
        self.lon = np.asarray(lon, dtype=np.float64)
        self.mlat = (
            np.asarray(metric_lat, dtype=np.float64) if metric_lat is not None else self.lat
        )
        self.mlon = (
            np.asarray(metric_lon, dtype=np.float64) if metric_lon is not None else self.lon
        )
        self.metric_scale = float(metric_scale) if metric_lat is not None else 1.0
        self.poi_ids = np.asarray(poi_ids)
        cid = cells.cell_id(self.lat, self.lon, level)
        order = np.argsort(cid, kind="stable")
        self.order = order
        sorted_cells = cid[order]
        # CSR: unique cells + start offsets into `order`
        self.cell_keys, starts = np.unique(sorted_cells, return_index=True)
        self.offsets = np.append(starts, len(cid))

    def pois_in_cells(self, cell_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Flattened POI row indices for a flat array of cell ids.

        Returns (counts_per_cell, flat_poi_row_indices) where the flat
        indices are the concatenation of each cell's POI rows in order.
        """
        cell_ids = np.asarray(cell_ids, dtype=np.int64)
        if len(self.cell_keys) == 0 or cell_ids.size == 0:
            return np.zeros(cell_ids.size, dtype=np.int64), np.empty(0, np.int64)
        pos = np.searchsorted(self.cell_keys, cell_ids)
        pos = np.clip(pos, 0, len(self.cell_keys) - 1)
        hit = self.cell_keys[pos] == cell_ids
        lo = np.where(hit, self.offsets[pos], 0)
        hi = np.where(hit, self.offsets[pos + 1], 0)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return counts, np.empty(0, dtype=np.int64)
        # vectorized multi-range gather: order[lo_i : hi_i] for each i
        starts = np.repeat(lo, counts)
        within = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        return counts, self.order[starts + within]


def nearest_poi(
    plat: np.ndarray,
    plon: np.ndarray,
    index: PoiIndex,
    max_ring: int = 8,
    metric_lat: np.ndarray | None = None,
    metric_lon: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact nearest POI for each point via expanding cell disks.

    Returns (poi_row_index, squared metric distance); row index −1
    where no POI exists within ``max_ring`` rings. Ties broken by
    smallest POI id (deterministic, SQL-matchable). ``metric_*``
    must match the index's metric space when it was built with one.
    """
    plat = np.asarray(plat, dtype=np.float64)
    plon = np.asarray(plon, dtype=np.float64)
    qlat = np.asarray(metric_lat, dtype=np.float64) if metric_lat is not None else plat
    qlon = np.asarray(metric_lon, dtype=np.float64) if metric_lon is not None else plon
    n = len(plat)
    best_idx = np.full(n, -1, dtype=np.int64)
    best_d2 = np.full(n, np.inf)
    cell_lat_deg = 180.0 / (1 << index.level) * index.metric_scale
    base_cell = cells.cell_id(plat, plon, index.level)
    unresolved = np.arange(n)
    r = 0
    while len(unresolved) and r <= max_ring:
        disk = cells.disk_cells(base_cell[unresolved], index.level, r)
        m, w = disk.shape
        counts, poi_rows = index.pois_in_cells(disk.ravel())
        if poi_rows.size:
            pt_of_cand = unresolved[
                np.repeat(np.arange(m * w) // w, counts)
            ]
            d2 = (index.mlat[poi_rows] - qlat[pt_of_cand]) ** 2 + (
                index.mlon[poi_rows] - qlon[pt_of_cand]
            ) ** 2
            # per-point winner: sort by (point, d2, poi_id), take first
            key = np.lexsort((index.poi_ids[poi_rows], d2, pt_of_cand))
            pts_s = pt_of_cand[key]
            first = np.ones(len(pts_s), dtype=bool)
            first[1:] = pts_s[1:] != pts_s[:-1]
            win_pts = pts_s[first]
            # disks are nested, so this round's candidates are a
            # superset of every earlier round's: the (d2, id)-lexsort
            # winner over the current disk is authoritative
            best_idx[win_pts] = poi_rows[key][first]
            best_d2[win_pts] = d2[key][first]
        # a point is final once its best distance is provably closer
        # than anything a farther disk could contain (≥ r·cell_lat°)
        resolved = np.sqrt(best_d2[unresolved]) <= r * cell_lat_deg
        unresolved = unresolved[~resolved]
        r += 1
    if len(unresolved) and index.poi_ids.size:
        # stragglers in POI deserts: brute-force against the whole
        # (broadcast-small) POI side — exact, and O(stragglers × POIs)
        # beats ever-growing disk scans. An EMPTY index keeps
        # best_idx=-1 / best_d2=inf (argmin over a zero-width axis
        # would raise), matching k_nearest_poi's kk==0 handling.
        d2_all = (index.mlat[None, :] - qlat[unresolved, None]) ** 2 + (
            index.mlon[None, :] - qlon[unresolved, None]
        ) ** 2
        # (d2, id) lexicographic argmin per row
        ordk = np.lexsort((index.poi_ids, ))  # id order
        d2o = d2_all[:, ordk]
        am = np.argmin(d2o, axis=1)  # argmin returns FIRST min → smallest id
        best_idx[unresolved] = ordk[am]
        best_d2[unresolved] = d2o[np.arange(len(unresolved)), am]
    return best_idx, best_d2


def pois_within_radius(
    plat: np.ndarray,
    plon: np.ndarray,
    index: PoiIndex,
    r2: float,
    metric_lat: np.ndarray | None = None,
    metric_lon: np.ndarray | None = None,
    max_ring: int = 64,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RANGE (radius) join: ALL POIs with squared metric distance ≤
    ``r2`` for each point — the fixed-radius sibling of
    :func:`nearest_poi`. Unlike kNN no iterative expansion is needed:
    the radius bounds the disk up front — any POI within Euclidean
    distance d lies within Chebyshev CELL distance ceil(d/cell_lat)
    (cells are at least cell_lat wide in both axes), so ONE disk
    gather + one vectorized exact filter is complete.

    Returns (point_row, poi_row, d2) candidate-pair arrays (long
    form, unordered — callers sort). Exact under the index's metric
    space (pass centidegree metrics for integer parity)."""
    import math

    plat = np.asarray(plat, dtype=np.float64)
    plon = np.asarray(plon, dtype=np.float64)
    qlat = np.asarray(metric_lat, dtype=np.float64) if metric_lat is not None else plat
    qlon = np.asarray(metric_lon, dtype=np.float64) if metric_lon is not None else plon
    n = len(plat)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
    if n == 0 or index.poi_ids.size == 0:
        return empty
    cell_metric = 180.0 / (1 << index.level) * index.metric_scale
    rings = min(max_ring, int(math.ceil(math.sqrt(max(r2, 0.0)) / cell_metric)))
    base_cell = cells.cell_id(plat, plon, index.level)
    disk = cells.disk_cells(base_cell, index.level, rings)
    # disk_cells clamps pole neighbors to the center cell and wraps
    # longitude — duplicate cell ids per row, harmless for kNN's
    # first-win but PAIR-DUPLICATING here: sort each row and blank
    # repeats with -1 (matches no cell key)
    disk = np.sort(disk, axis=1)
    dup = np.zeros_like(disk, dtype=bool)
    dup[:, 1:] = disk[:, 1:] == disk[:, :-1]
    disk = np.where(dup, np.int64(-1), disk)
    m, w = disk.shape
    counts, poi_rows = index.pois_in_cells(disk.ravel())
    if not poi_rows.size:
        return empty
    pt_of_cand = np.repeat(np.arange(m * w) // w, counts)
    d2 = (index.mlat[poi_rows] - qlat[pt_of_cand]) ** 2 + (
        index.mlon[poi_rows] - qlon[pt_of_cand]
    ) ** 2
    keep = d2 <= r2
    return pt_of_cand[keep], poi_rows[keep], d2[keep]


def k_nearest_poi(
    plat: np.ndarray,
    plon: np.ndarray,
    index: PoiIndex,
    k: int = 3,
    max_ring: int = 8,
    metric_lat: np.ndarray | None = None,
    metric_lon: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact k-nearest POIs per point via expanding cell disks.

    Returns (poi_row_indices (n, k), squared_degree_distances (n, k)),
    ordered by (distance, poi_id); −1 / inf padding where fewer than
    ``k`` POIs exist. Same stopping bound as :func:`nearest_poi`
    applied to the k-th best distance.
    """
    plat = np.asarray(plat, dtype=np.float64)
    plon = np.asarray(plon, dtype=np.float64)
    qlat = np.asarray(metric_lat, dtype=np.float64) if metric_lat is not None else plat
    qlon = np.asarray(metric_lon, dtype=np.float64) if metric_lon is not None else plon
    n = len(plat)
    best_idx = np.full((n, k), -1, dtype=np.int64)
    best_d2 = np.full((n, k), np.inf)
    cell_lat_deg = 180.0 / (1 << index.level) * index.metric_scale
    base_cell = cells.cell_id(plat, plon, index.level)
    unresolved = np.arange(n)
    r = 0
    while len(unresolved) and r <= max_ring:
        disk = cells.disk_cells(base_cell[unresolved], index.level, r)
        m, w = disk.shape
        counts, poi_rows = index.pois_in_cells(disk.ravel())
        if poi_rows.size:
            pt_of_cand = unresolved[np.repeat(np.arange(m * w) // w, counts)]
            d2 = (index.mlat[poi_rows] - qlat[pt_of_cand]) ** 2 + (
                index.mlon[poi_rows] - qlon[pt_of_cand]
            ) ** 2
            # per-point top-k over the full (nested) disk: sort by
            # (point, d2, poi_id), keep per-point rank < k
            key = np.lexsort((index.poi_ids[poi_rows], d2, pt_of_cand))
            pts_s = pt_of_cand[key]
            starts = np.ones(len(pts_s), dtype=bool)
            starts[1:] = pts_s[1:] != pts_s[:-1]
            group_start = np.maximum.accumulate(
                np.where(starts, np.arange(len(pts_s)), 0)
            )
            rank = np.arange(len(pts_s)) - group_start
            keep = rank < k
            kp, kr = pts_s[keep], rank[keep]
            best_idx[kp, kr] = poi_rows[key][keep]
            best_d2[kp, kr] = d2[key][keep]
        kth = best_d2[unresolved, k - 1]
        resolved = np.sqrt(np.where(np.isfinite(kth), kth, np.inf)) <= r * cell_lat_deg
        unresolved = unresolved[~resolved]
        r += 1
    if len(unresolved):
        d2_all = (index.mlat[None, :] - qlat[unresolved, None]) ** 2 + (
            index.mlon[None, :] - qlon[unresolved, None]
        ) ** 2
        kk = min(k, d2_all.shape[1])
        # (d2, id)-lex top-k per straggler
        order = np.lexsort(
            (np.broadcast_to(index.poi_ids, d2_all.shape), d2_all), axis=1
        )[:, :kk]
        rowsel = np.arange(len(unresolved))[:, None]
        best_idx[unresolved, :kk] = order
        best_d2[unresolved, :kk] = d2_all[rowsel, order]
    return best_idx, best_d2


def nearest_poi_segment(
    alat: np.ndarray,
    alon: np.ndarray,
    blat: np.ndarray,
    blon: np.ndarray,
    index: PoiIndex,
    max_ring: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact nearest POI for each route SEGMENT a→b by point-to-
    segment distance — the north_rule's "kNN matching of route
    segments to nearest POIs via cell-neighbor ring expansion" as a
    first-class kernel (:func:`nearest_poi` is the point form;
    reference analog: the per-point nearest-sample join the channel
    cursor performs, channel_mapper.dart:103-156, lifted to segment
    geometry).

    Inputs are the index's METRIC coordinates (integer centidegrees
    for SQL parity). Per segment, every candidate's squared distance
    is the rational ``num / den`` with one SHARED denominator
    ``den = max(len2, 1)``, so winners and exact ties reduce to
    int64 comparisons that a DuckDB HUGEINT CASE replays bit-for-bit:

    ``len2 = |b−a|²``, ``dot = (p−a)·(b−a)``, ``cross = (b−a)×(p−a)``

    - ``len2 == 0`` (degenerate): ``num = |p−a|²``, ``den = 1``
    - ``dot ≤ 0`` (foot before a): ``num = |p−a|²·len2``
    - ``dot ≥ len2`` (foot past b): ``num = |p−b|²·len2``
    - else (perpendicular foot inside): ``num = cross²``

    int64 headroom: centidegree coords ≤ 36 000, so point-point
    d2 ≤ 1.62e9 and num ≤ 2.63e18 < 2^63.

    Cell walk: expanding disks around the segment MIDPOINT cell; a
    POI beyond ring r is at metric distance ≥ r·cell from the
    midpoint, hence ≥ r·cell − |seg|/2 from the segment, so a
    segment resolves once its best distance is under that bound.
    Ties break to the smallest POI id. Returns
    ``(poi_row_index, num, den)``; row −1 where the index is empty.
    """
    alat = np.asarray(alat, dtype=np.int64)
    alon = np.asarray(alon, dtype=np.int64)
    blat = np.asarray(blat, dtype=np.int64)
    blon = np.asarray(blon, dtype=np.int64)
    n = len(alat)
    sdx = blon - alon
    sdy = blat - alat
    len2 = sdx * sdx + sdy * sdy
    den = np.where(len2 == 0, np.int64(1), len2)
    half_len = np.sqrt(len2.astype(np.float64)) / 2.0
    pid = index.poi_ids
    plon_i = index.mlon.astype(np.int64)
    plat_i = index.mlat.astype(np.int64)

    def score(seg_rows: np.ndarray, poi_rows: np.ndarray) -> np.ndarray:
        wx = plon_i[poi_rows] - alon[seg_rows]
        wy = plat_i[poi_rows] - alat[seg_rows]
        vx = plon_i[poi_rows] - blon[seg_rows]
        vy = plat_i[poi_rows] - blat[seg_rows]
        x, y, l2 = sdx[seg_rows], sdy[seg_rows], len2[seg_rows]
        dot = wx * x + wy * y
        d2a = wx * wx + wy * wy
        d2b = vx * vx + vy * vy
        cross = x * wy - y * wx
        return np.where(
            l2 == 0,
            d2a,
            np.where(dot <= 0, d2a * l2, np.where(dot >= l2, d2b * l2, cross * cross)),
        )

    best_idx = np.full(n, -1, dtype=np.int64)
    best_num = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    cell_metric = 180.0 / (1 << index.level) * index.metric_scale
    mid_lat_deg = (alat + blat) / 2.0 / (index.metric_scale or 1.0)
    mid_lon_deg = (alon + blon) / 2.0 / (index.metric_scale or 1.0)
    base_cell = cells.cell_id(mid_lat_deg, mid_lon_deg, index.level)
    unresolved = np.arange(n)
    r = 0
    while len(unresolved) and r <= max_ring:
        disk = cells.disk_cells(base_cell[unresolved], index.level, r)
        m, w = disk.shape
        counts, poi_rows = index.pois_in_cells(disk.ravel())
        if poi_rows.size:
            seg_of_cand = unresolved[np.repeat(np.arange(m * w) // w, counts)]
            num = score(seg_of_cand, poi_rows)
            # disks are nested: the (num, poi_id) lexsort winner over
            # the current disk is authoritative for its segment
            key = np.lexsort((pid[poi_rows], num, seg_of_cand))
            segs_s = seg_of_cand[key]
            first = np.ones(len(segs_s), dtype=bool)
            first[1:] = segs_s[1:] != segs_s[:-1]
            win = segs_s[first]
            best_idx[win] = poi_rows[key][first]
            best_num[win] = num[key][first]
        have = best_idx[unresolved] >= 0
        dist = np.sqrt(
            best_num[unresolved].astype(np.float64)
            / den[unresolved].astype(np.float64)
        )
        resolved = have & (dist <= r * cell_metric - half_len[unresolved])
        unresolved = unresolved[~resolved]
        r += 1
    if len(unresolved) and pid.size:
        # POI deserts: exact brute force of the stragglers against
        # the (broadcast-small) POI side, same formula
        all_pois = np.arange(pid.size, dtype=np.int64)
        for s in unresolved:
            num = score(np.full(pid.size, s, dtype=np.int64), all_pois)
            key = np.lexsort((pid, num))
            best_idx[s] = key[0]
            best_num[s] = num[key[0]]
    return best_idx, best_num, den
