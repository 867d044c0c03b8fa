"""Ray Data stages of the spatial core.

Each stage is a batch kernel usable with
``ds.map_batches(..., batch_format="pyarrow", batch_size=None)``. Broadcast-state
stages come in two equivalent forms:

* plain FUNCTIONS (``pip_join_batch`` / ``knn_join_batch``) taking the
  ``ray.put`` object ref via ``fn_kwargs`` and resolving it through a
  per-worker-process cache — Ray task workers persist across tasks,
  so each worker pays one ``ray.get`` total. Zero actor-startup cost;
  the right choice when the broadcast state is small-to-medium
  (region polygons, POI indexes).
* callable CLASSES (``PipJoiner`` / ``KnnPoiJoiner`` /
  ``RouteTileExtractor``) for actor pools, resolving the ref ONCE in
  ``__init__`` — the right choice when per-worker state is heavy
  (image codec contexts, model weights) or needs explicit pool
  sizing / GPU placement.

Scale notes (the whole point of this engine):
* the big side (points / images) only ever streams through
  ``map_batches`` — no stage here shuffles it;
* polygon and POI indexes are broadcast small sides
  (SURVEY.md §2.4 J5/J6);
* per-tile aggregation pre-aggregates inside each batch before the
  single small ``groupby`` (SURVEY.md §2.5 A9), with an optional
  explicitly-salted two-phase plan for adversarial key skew.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..functions import cells, imaging, polygons
from . import knn


def actor_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bounds that always leave CPUs for the
    upstream read + downstream shuffle stages — a pool sized to every
    CPU starves its own input and the pipeline livelocks."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return (1, max(1, n - 2))


def _resolve(ref: Any) -> Any:
    """Accept either a plain object or a ray.ObjectRef broadcast."""
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
    except ImportError:
        pass
    return ref


# per-worker-process broadcast cache: task workers persist across
# tasks within a Ray session, so each worker resolves a given object
# ref exactly once (actor-like amortization without actor startup)
_WORKER_CACHE: dict[Any, Any] = {}


def _resolve_cached(ref: Any) -> Any:
    if type(ref).__name__ == "ObjectRef":
        hit = _WORKER_CACHE.get(ref)
        if hit is None:
            hit = _resolve(ref)
            _WORKER_CACHE[ref] = hit
        return hit
    return ref


def add_cell_columns(
    batch: pa.Table,
    level: int = cells.LEVEL_TILE,
    prefix_level: int = cells.LEVEL_PREFIX,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_col: str = "cell",
    prefix_col: str = "cell_prefix",
) -> pa.Table:
    """Vectorized lat/lng→cell encoding: appends the tile cell id and
    its coarse prefix (north_rule: "batched H3/S2 cell encoding ...
    vectorized lat/lng→cell kernels")."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    cid = cells.cell_id(lat, lon, level)
    pre = cells.parent_cell_id(cid, level, prefix_level)
    return batch.append_column(cell_col, pa.array(cid)).append_column(
        prefix_col, pa.array(pre)
    )


class CellEncoder:
    """Actor-pool form of :func:`add_cell_columns` (SURVEY.md §2.3 T4
    — a real H3/S2 implementation holds per-resolution lookup tables,
    which belong in actor state; the quadtree grid needs only its
    parameters, kept here for the same lifecycle)."""

    def __init__(self, **kwargs: Any):
        self.kwargs = kwargs

    def __call__(self, batch: pa.Table) -> pa.Table:
        return add_cell_columns(batch, **self.kwargs)


class PipJoiner:
    """Point-in-polygon inner join against a broadcast PolygonIndex.

    Emits one output row per (point, containing region): all input
    columns plus ``region_id``. Points in no region are dropped
    (inner-join semantics; SURVEY.md §2.4 J5). The exact ray-cast
    runs only on candidates passing the cell-prefix pre-filter.
    """

    def __init__(self, index_ref: Any, lat_col: str = "lat", lon_col: str = "lon"):
        self.index: polygons.PolygonIndex = _resolve(index_ref)
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pip_join_impl(batch, self.index, self.lat_col, self.lon_col)


def pip_join_batch(
    batch: pa.Table, index_ref: Any, lat_col: str = "lat", lon_col: str = "lon"
) -> pa.Table:
    """Task-function form of :class:`PipJoiner` (worker-cached
    broadcast; see module docstring)."""
    return _pip_join_impl(batch, _resolve_cached(index_ref), lat_col, lon_col)


def _pip_join_impl(
    batch: pa.Table, index: polygons.PolygonIndex, lat_col: str, lon_col: str
) -> pa.Table:
    from ..functions.gather import multi_range_gather

    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    prefix = cells.cell_id(lat, lon, index.level)
    # group batch rows by prefix cell (argsort + boundaries — no
    # per-cell full-batch masks)
    order = np.argsort(prefix, kind="stable")
    sp = prefix[order]
    uniq, cell_starts = np.unique(sp, return_index=True)
    cell_ends = np.append(cell_starts[1:], sp.size)
    # vectorized candidate lookup: (cell, poly) pairs
    counts, pair_poly = index.polys_in_cells(uniq)
    pair_cell_idx = np.repeat(np.arange(uniq.size), counts)
    if pair_poly.size == 0:
        empty = batch.slice(0, 0)
        return empty.append_column("region_id", pa.array([], type=pa.string()))
    # expand each (cell, poly) pair to its candidate row indices
    rows_per_pair = cell_ends[pair_cell_idx] - cell_starts[pair_cell_idx]
    flat_pos = multi_range_gather(cell_starts[pair_cell_idx], rows_per_pair)
    cand_rows = order[flat_pos]
    cand_poly = np.repeat(pair_poly, rows_per_pair)
    # one exact ray-cast per polygon over its contiguous candidates
    take_idx: list[np.ndarray] = []
    region_ids: list[np.ndarray] = []
    psort = np.argsort(cand_poly, kind="stable")
    cand_rows = cand_rows[psort]
    cand_poly = cand_poly[psort]
    pu, pstarts = np.unique(cand_poly, return_index=True)
    pends = np.append(pstarts[1:], cand_poly.size)
    for k in range(pu.size):
        poly = index.polygons[int(pu[k])]
        rows = cand_rows[pstarts[k] : pends[k]]
        hit = polygons.points_in_polygon(lat[rows], lon[rows], poly)
        sel = rows[hit]
        if sel.size:
            take_idx.append(sel)
            region_ids.append(np.full(sel.size, poly.region_id, dtype=object))
    if not take_idx:
        empty = batch.slice(0, 0)
        return empty.append_column("region_id", pa.array([], type=pa.string()))
    idx = np.concatenate(take_idx)
    rids = np.concatenate(region_ids)
    rsort = np.argsort(idx, kind="stable")
    out = batch.take(pa.array(idx[rsort]))
    return out.append_column("region_id", pa.array(rids[rsort], type=pa.string()))


class KnnPoiJoiner:
    """Nearest-POI left join against a broadcast :class:`knn.PoiIndex`.

    Appends ``poi_id`` (null when no POI within reach — only possible
    on an empty index) and ``dist2_deg`` (squared degrees).
    """

    def __init__(self, index_ref: Any, lat_col: str = "lat", lon_col: str = "lon"):
        self.index: knn.PoiIndex = _resolve(index_ref)
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _knn_join_impl(batch, self.index, self.lat_col, self.lon_col)


def radius_join_batch(
    batch: pa.Table,
    index_ref: Any,
    r2: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    metric_lat_col: str | None = None,
    metric_lon_col: str | None = None,
) -> pa.Table:
    """RANGE join (fixed radius): one output row per (point, POI)
    with squared metric distance ≤ ``r2`` — the all-matches sibling
    of :func:`knn_join_batch`, same broadcast worker-cached index,
    same exact metric space. Output = the input row's columns (taken
    per match) + ``poi_id`` + ``dist2`` (metric units²)."""
    index: knn.PoiIndex = _resolve_cached(index_ref)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    mlat = (
        batch[metric_lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lat_col
        else None
    )
    mlon = (
        batch[metric_lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lon_col
        else None
    )
    pt_rows, poi_rows, d2 = knn.pois_within_radius(
        lat, lon, index, r2, metric_lat=mlat, metric_lon=mlon
    )
    id_type = (
        pa.string()
        if index.poi_ids.dtype == object
        else pa.from_numpy_dtype(index.poi_ids.dtype)
    )
    out = batch.take(pa.array(pt_rows))
    return out.append_column(
        "poi_id", pa.array(index.poi_ids[poi_rows].tolist(), type=id_type)
    ).append_column("dist2", pa.array(d2))


def knn_join_batch(
    batch: pa.Table, index_ref: Any, lat_col: str = "lat", lon_col: str = "lon",
    metric_lat_col: str | None = None, metric_lon_col: str | None = None,
) -> pa.Table:
    """Task-function form of :class:`KnnPoiJoiner` (worker-cached
    broadcast; see module docstring). ``metric_*_col``: columns in the
    index's exact metric space (e.g. integer centidegrees)."""
    return _knn_join_impl(
        batch, _resolve_cached(index_ref), lat_col, lon_col,
        metric_lat_col, metric_lon_col,
    )


def _knn_join_impl(
    batch: pa.Table, index: knn.PoiIndex, lat_col: str, lon_col: str,
    metric_lat_col: str | None = None, metric_lon_col: str | None = None,
) -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    mlat = (
        batch[metric_lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lat_col
        else None
    )
    mlon = (
        batch[metric_lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lon_col
        else None
    )
    rows, d2 = knn.nearest_poi(lat, lon, index, metric_lat=mlat, metric_lon=mlon)
    found = rows >= 0
    ids = np.where(found, index.poi_ids[np.clip(rows, 0, None)], None)
    id_type = (
        pa.string()
        if index.poi_ids.dtype == object
        else pa.from_numpy_dtype(index.poi_ids.dtype)
    )
    return batch.append_column(
        "poi_id", pa.array(ids.tolist(), type=id_type)
    ).append_column("dist2_deg", pa.array(np.where(found, d2, np.nan)))


class RouteTileExtractor:
    """Raster→vector tiling, fused into one actor stage (SURVEY.md
    §7.4 item 5): decode image ``bytes`` → extract route pixels →
    georeference via the caption bbox → tile-cell assign → PARTIAL
    per-(image, cell) pixel counts. Decoded pixels never cross a
    stage boundary; output is the long table
    ``(image_id, cell, n_px)`` ready for the small final groupby.

    In production the decode call is the image codec (libjpeg/PNG);
    here PNG is real and "jpeg" rows use the deterministic FJPG stub
    (functions/imaging.py docstring).
    """

    def __init__(self, level: int = cells.LEVEL_TILE):
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        return route_tile_batch(batch, self.level)


def route_tile_batch(batch: pa.Table, level: int = cells.LEVEL_TILE) -> pa.Table:
    """Task-function form of :class:`RouteTileExtractor` (the codec
    here is stateless pure-numpy; a libjpeg-backed deployment keeps
    the actor form for codec contexts)."""
    from .. import fixtures

    img_ids: list[np.ndarray] = []
    cell_out: list[np.ndarray] = []
    npx_out: list[np.ndarray] = []
    ids = batch["image_id"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    caps = batch["caption"].to_pylist()
    ws = batch["w"].to_numpy()
    hs = batch["h"].to_numpy()
    for i in range(batch.num_rows):
        rgb = imaging.decode_image(payloads[i])
        rows, colm = imaging.extract_route_pixels(rgb)
        if rows.size == 0:
            continue
        lat_min, lon_min, lat_max, lon_max = fixtures.parse_caption_bbox(caps[i])
        lat, lon = imaging.pixels_to_latlon(
            rows, colm, int(hs[i]), int(ws[i]), lat_min, lat_max, lon_min, lon_max
        )
        cid = cells.cell_id(lat, lon, level)
        uc, cnt = np.unique(cid, return_counts=True)
        img_ids.append(np.full(uc.size, ids[i], dtype=object))
        cell_out.append(uc)
        npx_out.append(cnt)
    if not img_ids:
        return pa.table(
            {
                "image_id": pa.array([], type=pa.string()),
                "cell": pa.array([], type=pa.int64()),
                "n_px": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "image_id": pa.array(np.concatenate(img_ids).tolist(), type=pa.string()),
            "cell": pa.array(np.concatenate(cell_out)),
            "n_px": pa.array(np.concatenate(npx_out).astype(np.int64)),
        }
    )


def partial_counts(
    batch: pa.Table, key_col: str, weight_col: str | None = None, out_col: str = "n"
) -> pa.Table:
    """Per-batch combiner: collapse a batch to one row per key before
    the shuffle (the partial/combiner pattern, SURVEY.md §2.5 A8/A9).
    At 100 TB this is what keeps the groupby exchange small."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    if weight_col is None:
        uk, cnt = np.unique(keys, return_counts=True)
        vals = cnt.astype(np.int64)
    else:
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        vals = np.bincount(inv, weights=w).astype(np.int64)
    return pa.table({key_col: pa.array(uk), out_col: pa.array(vals)})


def add_salt_column(
    batch: pa.Table, key_col: str, salt: int, out_col: str = "salted_key"
) -> pa.Table:
    """Explicit hot-key salting: ``salted = key * S + row_hash % S``.

    Used when per-batch partials cannot collapse a hot key (e.g. the
    aggregate state itself is large). The two-phase plan —
    groupby(salted) partial → strip salt → groupby(key) final — is
    exactly associative, so results match the unsalted plan
    (SURVEY.md §7.4 item 4).
    """
    keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h = np.arange(len(keys), dtype=np.int64)  # deterministic round-robin salt
    return batch.append_column(out_col, pa.array(keys * salt + h % salt))


def tile_counts(points_ds, level: int = cells.LEVEL_TILE, weight_col: str | None = None):
    """points Dataset (lat, lon) → per-tile counts Dataset
    ``(cell, n)``: cell-encode → per-batch partial counts → one small
    groupby-sum. The partial stage bounds the shuffle at
    (#batches × #distinct-cells-per-batch) rows regardless of skew."""
    from ray.data.aggregate import Sum

    enc = points_ds.map_batches(
        add_cell_columns, batch_format="pyarrow", fn_kwargs={"level": level},
        batch_size=None,
    )
    partial = enc.map_batches(
        partial_counts,
        batch_format="pyarrow",
        fn_kwargs={"key_col": "cell", "weight_col": weight_col},
        batch_size=None,
    )
    return partial.groupby("cell").aggregate(Sum("n", alias_name="n"))


def probe_salt_factor(
    ds, key_col: str, hot_threshold: float = 0.05, max_salt: int = 64
) -> int:
    """Choose the salting factor from a cheap count probe (SURVEY.md
    §4.2: "choose S from a cheap groupby(cell9).count() probe"): if
    the hottest key holds more than ``hot_threshold`` of all rows,
    salt it into ~hot_share/threshold sub-keys (clamped).

    The probe only needs (total, hottest) — the per-key counts run
    the distributed bucketed plan and the driver folds one tiny
    (sum, max) row per block, never the key-per-row count table."""
    import pandas as pd

    from ..pipelines import agg

    counts = agg.bucketed_aggregate(
        ds.select_columns([key_col]), [key_col], {"n": ("", "count")}
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"total": [0], "hot": [0]})
        return pd.DataFrame(
            {"total": [int(df["n"].sum())], "hot": [int(df["n"].max())]}
        )

    parts = counts.map_batches(
        fold, batch_format="pandas", batch_size=None
    ).to_pandas()
    if parts.empty:
        return 1
    total = int(parts["total"].sum())
    hot = int(parts["hot"].max())
    share = hot / max(total, 1)
    if share <= hot_threshold:
        return 1
    return int(min(max_salt, max(2, round(share / hot_threshold))))


def knn_k_join_batch(
    batch: pa.Table,
    index_ref: Any,
    k: int = 3,
    lat_col: str = "lat",
    lon_col: str = "lon",
    metric_lat_col: str | None = None,
    metric_lon_col: str | None = None,
) -> pa.Table:
    """k-nearest POI join (task-function form): emits one row per
    (point, neighbor) with ``rank`` (1-based, (distance, id)-ordered)
    — the long-form output an oracle can reproduce with ROW_NUMBER."""
    index: knn.PoiIndex = _resolve_cached(index_ref)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    mlat = (
        batch[metric_lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lat_col
        else None
    )
    mlon = (
        batch[metric_lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if metric_lon_col
        else None
    )
    rows, d2 = knn.k_nearest_poi(lat, lon, index, k=k, metric_lat=mlat, metric_lon=mlon)
    n = len(lat)
    found = rows >= 0
    pt_idx = np.repeat(np.arange(n), k)[found.ravel()]
    ranks = np.tile(np.arange(1, k + 1), n)[found.ravel()]
    poi_rows = rows.ravel()[found.ravel()]
    out = batch.take(pa.array(pt_idx))
    id_type = (
        pa.string()
        if index.poi_ids.dtype == object
        else pa.from_numpy_dtype(index.poi_ids.dtype)
    )
    return (
        out.append_column("rank", pa.array(ranks.astype(np.int64)))
        .append_column("poi_id", pa.array(index.poi_ids[poi_rows].tolist(), type=id_type))
        .append_column("dist2_deg", pa.array(d2.ravel()[found.ravel()]))
    )


def knn_segment_join_batch(
    batch: pa.Table,
    index_ref: Any,
    alat_col: str = "alat",
    alon_col: str = "alon",
    blat_col: str = "blat",
    blon_col: str = "blon",
) -> pa.Table:
    """Segment→nearest-POI join (task form, worker-cached broadcast
    index): each row is a route segment with integer-metric endpoint
    columns; appends ``poi_id`` plus the EXACT rational distance
    ``d2_num / d2_den`` from :func:`knn.nearest_poi_segment`. Rows
    with no POI (empty index) are dropped."""
    index: knn.PoiIndex = _resolve_cached(index_ref)
    row, num, den = knn.nearest_poi_segment(
        batch[alat_col].to_numpy(zero_copy_only=False),
        batch[alon_col].to_numpy(zero_copy_only=False),
        batch[blat_col].to_numpy(zero_copy_only=False),
        batch[blon_col].to_numpy(zero_copy_only=False),
        index,
    )
    found = row >= 0
    out = (
        batch.append_column(
            "poi_id",
            pa.array(
                index.poi_ids[np.clip(row, 0, None)],
                type=pa.from_numpy_dtype(index.poi_ids.dtype)
                if index.poi_ids.dtype != object
                else pa.string(),
            ),
        )
        .append_column("d2_num", pa.array(num))
        .append_column("d2_den", pa.array(den))
    )
    return out.filter(pa.array(found))


# ------------------------------------------------------------------ J5b:
# co-partitioned PIP join — the polygon side as a DATASET, for polygon
# sets too large to broadcast (the complement of PipJoiner/J5).


def polygons_to_table(polys: list[polygons.Polygon]) -> pa.Table:
    """Polygon rows as an Arrow table (region_id, vlat, vlon) — the
    Dataset-side input shape of :func:`pip_join_copartitioned`."""
    return pa.table(
        {
            "region_id": pa.array([p.region_id for p in polys], type=pa.string()),
            "vlat": pa.array([p.lat.tolist() for p in polys], type=pa.list_(pa.float64())),
            "vlon": pa.array([p.lon.tolist() for p in polys], type=pa.list_(pa.float64())),
        }
    )


def _point_salt(lat: np.ndarray, lon: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-point salt from the coordinate bits (no RNG:
    reruns and retries land every point in the same salt replica)."""
    if salt <= 1:
        return np.zeros(lat.size, dtype=np.int32)
    h = lat.astype(np.float64).view(np.int64) * np.int64(-7046029254386353131)
    h ^= lon.astype(np.float64).view(np.int64) * np.int64(7046029254386353137)
    return ((h & np.int64(0x7FFFFFFFFFFFFFFF)) % salt).astype(np.int32)



def _copart_cover_batch(t: pa.Table, level: int, salt: int) -> pa.Table:
    """Expand polygon rows to (cell, salt)-keyed cover rows carrying
    the ring vertices — one row per covering prefix cell per salt
    replica. The vertex payload crosses the exchange once per cover
    row, NOT once per candidate point."""
    vlat = t["vlat"].to_pylist()
    vlon = t["vlon"].to_pylist()
    covers = [
        cells.covering_cells_bbox(min(la), max(la), min(lo), max(lo), level)
        for la, lo in zip(vlat, vlon)
    ]
    reps = np.asarray([c.size for c in covers], dtype=np.int64)
    cell = np.concatenate(covers) if covers else np.empty(0, dtype=np.int64)
    poly_idx = np.repeat(np.arange(len(covers), dtype=np.int64), reps)
    cell = np.tile(cell, salt)
    poly_idx = np.tile(poly_idx, salt)
    saltv = np.repeat(np.arange(salt, dtype=np.int32), int(reps.sum()))
    take = pa.array(poly_idx)
    # vertices packed (lat..., lon...) float64 into ONE binary column:
    # Arrow's hash join ships binary payloads but rejects list types
    verts = [
        np.asarray(la, dtype=np.float64).tobytes()
        + np.asarray(lo, dtype=np.float64).tobytes()
        for la, lo in zip(vlat, vlon)
    ]
    return pa.table(
        {
            "_pp_cell": pa.array(cell),
            "_pp_salt": pa.array(saltv),
            "_pp_region": t["region_id"].take(take),
            "_pp_verts": pa.array(
                [verts[i] for i in poly_idx], type=pa.binary()
            ),
        }
    )


def _copart_tag_points_batch(
    t: pa.Table, level: int, salt: int, lat_col: str, lon_col: str
) -> pa.Table:
    lat = t[lat_col].to_numpy(zero_copy_only=False)
    lon = t[lon_col].to_numpy(zero_copy_only=False)
    return t.append_column(
        "_pp_cell", pa.array(cells.cell_id(lat, lon, level))
    ).append_column("_pp_salt", pa.array(_point_salt(lat, lon, salt)))


def _copart_exact_batch(t: pa.Table, lat_col: str, lon_col: str) -> pa.Table:
    """Exact ray-cast over hash-join candidate rows. Rows are (point
    columns + _pp_region/_pp_verts); each DISTINCT region in
    the batch is materialized as a Polygon once and tested against
    all its candidate rows in one vectorized call."""
    drop = ["_pp_cell", "_pp_salt", "_pp_region", "_pp_verts"]
    if t.num_rows == 0:
        return t.drop_columns(drop).append_column(
            "region_id", pa.array([], type=pa.string())
        )
    lat = t[lat_col].to_numpy(zero_copy_only=False)
    lon = t[lon_col].to_numpy(zero_copy_only=False)
    rid = np.asarray(t["_pp_region"].to_pandas(), dtype=object)
    order = np.argsort(rid, kind="stable")
    srid = rid[order]
    bounds = np.flatnonzero(np.concatenate(([True], srid[1:] != srid[:-1])))
    ends = np.append(bounds[1:], srid.size)
    verts_col = t["_pp_verts"]
    keep: list[np.ndarray] = []
    for s, e in zip(bounds, ends):
        rows = order[s:e]
        blob = verts_col[int(rows[0])].as_py()
        flat = np.frombuffer(blob, dtype=np.float64)
        nv = flat.size // 2
        poly = polygons.Polygon(
            str(srid[s]), str(srid[s]), flat[:nv], flat[nv:]
        )
        hit = polygons.points_in_polygon(lat[rows], lon[rows], poly)
        if hit.any():
            keep.append(rows[hit])
    if not keep:
        return t.slice(0, 0).drop_columns(drop).append_column(
            "region_id", pa.array([], type=pa.string())
        )
    idx = np.sort(np.concatenate(keep), kind="stable")
    out = t.take(pa.array(idx))
    region = out["_pp_region"]
    return out.drop_columns(drop).append_column(
        "region_id", region.cast(pa.string())
    )


def pip_join_copartitioned(
    points_ds,
    polys,
    *,
    level: int = cells.LEVEL_PREFIX,
    lat_col: str = "lat",
    lon_col: str = "lon",
    salt: int = 1,
    num_partitions: int | None = None,
):
    """Co-partitioned (reduce-side) PIP join for polygon sets TOO
    LARGE TO BROADCAST (the complement of J5's :class:`PipJoiner`).

    The broadcast path needs every worker to hold the whole polygon
    index; admin boundaries fit, a continental parcel/cadastre layer
    does not. Here NEITHER side is materialized anywhere:

      points   → tag (cell, salt)        [map_batches, streaming]
      polygons → cover rows (cell, salt) [one row per covering prefix
                 cell × salt replica, vertices ride along once]
      inner hash join on (cell, salt)    [Ray Data's native join —
                 the one all-to-all exchange]
      exact ray-cast per candidate row   [map_batches, vectorized per
                 distinct region in each batch]

    Every point lives in exactly one (cell, salt) partition and meets
    each covering polygon exactly once, so output rows are IDENTICAL
    to the broadcast path (pinned in tests/test_spatial.py). Skew: a
    hot cell (popular route) lands on one join partition; ``salt``
    splits its points across ``salt`` replicas at the cost of
    shipping that cell's cover rows ``salt`` times — the same
    replicate-small-side salting as the aggregate stages. The join
    output carries each candidate's vertex payload per row for one
    streaming map_batches stage, which prunes it immediately; at 10^12
    points keep ``num_partitions`` high enough that a partition's
    candidates fit in an aggregator's heap (default ≈4× cluster
    cores via ``agg.default_n_buckets``).

    ``polys``: a ``ray.data.Dataset`` with columns (region_id:string,
    vlat:list<f64>, vlon:list<f64>), or a driver-side
    ``list[Polygon]`` (converted via :func:`polygons_to_table` — the
    small-layer / parity-test path)."""
    import ray.data as rd

    from ..pipelines import agg

    if isinstance(polys, list):
        polys = rd.from_arrow(polygons_to_table(polys))
    if num_partitions is None:
        num_partitions = agg.default_n_buckets()
    reserved = {"_pp_cell", "_pp_salt", "_pp_region", "_pp_verts"}
    schema = points_ds.schema()
    if reserved & set(schema.names):
        raise ValueError(f"points columns collide with {sorted(reserved)}")

    cover = polys.map_batches(
        _copart_cover_batch,
        fn_kwargs={"level": level, "salt": salt},
        batch_format="pyarrow",
        batch_size=None,
    )
    tagged = points_ds.map_batches(
        _copart_tag_points_batch,
        fn_kwargs={
            "level": level, "salt": salt,
            "lat_col": lat_col, "lon_col": lon_col,
        },
        batch_format="pyarrow",
        batch_size=None,
    )
    joined = tagged.join(
        cover,
        "inner",
        num_partitions=num_partitions,
        on=("_pp_cell", "_pp_salt"),
    )
    return joined.map_batches(
        _copart_exact_batch,
        fn_kwargs={"lat_col": lat_col, "lon_col": lon_col},
        batch_format="pyarrow",
        batch_size=None,
    )


# ------------------------------------------------------------------ J6b:
# co-partitioned kNN join — the POI side as a DATASET, for POI sets
# too large to broadcast (the complement of KnnPoiJoiner/J6).


def pois_to_table(
    poi_ids: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    metric_lat: np.ndarray | None = None,
    metric_lon: np.ndarray | None = None,
) -> pa.Table:
    """POI rows as an Arrow table (poi_id, lat, lon, mlat, mlon) — the
    Dataset-side input shape of :func:`knn_join_copartitioned`.
    ``metric_*`` default to the degree coordinates (same contract as
    :class:`knn.PoiIndex`)."""
    mlat = np.asarray(metric_lat if metric_lat is not None else lat, dtype=np.float64)
    mlon = np.asarray(metric_lon if metric_lon is not None else lon, dtype=np.float64)
    return pa.table(
        {
            "poi_id": pa.array(np.asarray(poi_ids)),
            "lat": pa.array(np.asarray(lat, dtype=np.float64)),
            "lon": pa.array(np.asarray(lon, dtype=np.float64)),
            "mlat": pa.array(mlat),
            "mlon": pa.array(mlon),
        }
    )


def _kc_bucket_of(cell: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic cell→bucket hash, identical on both join sides
    (splitmix64-style mix so consecutive cell ids spread)."""
    with np.errstate(over="ignore"):
        h = cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
        return (h % np.uint64(n_buckets)).astype(np.int64)


def _knn_tag_points_batch(
    t: pa.Table,
    lat_col: str,
    lon_col: str,
    level: int,
    n_buckets: int,
    poi_id_type: pa.DataType,
) -> pa.Table:
    """Point side of the union: level-``level`` cell + bucket, POI
    payload columns null (schema must match the cover side exactly
    for ``Dataset.union``)."""
    lat = t[lat_col].to_numpy(zero_copy_only=False)
    lon = t[lon_col].to_numpy(zero_copy_only=False)
    cell = cells.cell_id(lat, lon, level)
    n = t.num_rows
    return (
        t.append_column("_kc_cell", pa.array(cell))
        .append_column("_kc_side", pa.array(np.zeros(n, dtype=np.int8)))
        .append_column("_kc_poi", pa.nulls(n, poi_id_type))
        .append_column("_kc_mlat", pa.nulls(n, pa.float64()))
        .append_column("_kc_mlon", pa.nulls(n, pa.float64()))
        .append_column("_kc_bucket", pa.array(_kc_bucket_of(cell, n_buckets)))
    )


def _knn_cover_batch(
    t: pa.Table,
    level: int,
    n_buckets: int,
    point_fields: list[tuple[str, pa.DataType]],
) -> pa.Table:
    """POI side of the union: replicate each POI to the 3×3 cell halo
    around its own cell at ``level`` — a CONSTANT 9× per round,
    independent of halo reach (reach grows by COARSENING the level
    instead of widening the halo). Point columns ride as nulls so the
    two sides union. Pole-clamped duplicate cells from ``disk_cells``
    merely duplicate a candidate pair; the (d2, id)-lexsort winner is
    unaffected."""
    lat = t["lat"].to_numpy(zero_copy_only=False)
    lon = t["lon"].to_numpy(zero_copy_only=False)
    halo = cells.disk_cells(cells.cell_id(lat, lon, level), level, 1)
    n, w = halo.shape
    take = pa.array(np.repeat(np.arange(n, dtype=np.int64), w))
    cell = halo.ravel()
    m = cell.size
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        name: pa.nulls(m, typ) for name, typ in point_fields
    }
    cols["_kc_cell"] = pa.array(cell)
    cols["_kc_side"] = pa.array(np.ones(m, dtype=np.int8))
    cols["_kc_poi"] = t["poi_id"].take(take)
    cols["_kc_mlat"] = t["mlat"].take(take)
    cols["_kc_mlon"] = t["mlon"].take(take)
    cols["_kc_bucket"] = pa.array(_kc_bucket_of(cell, n_buckets))
    return pa.table(cols)


_KC_DROP = ["_kc_cell", "_kc_side", "_kc_poi", "_kc_mlat", "_kc_mlon", "_kc_bucket"]


def _knn_join_group(
    g: pa.Table,
    mlat_col: str,
    mlon_col: str,
    bound2: float,
    force: bool,
    poi_id_type: pa.DataType,
) -> pa.Table:
    """Reduce side of one bucket: candidate generation (searchsorted
    on the sorted POI cells) + exact per-point (d2, poi_id)-lexsort
    winner, all vectorized. A point's cell hashes to exactly one
    bucket and the cover side replicated every POI into that cell's
    halo, so each point meets ALL its candidates here — the fold is
    total, never per-block-partial. ``_kc_done``: a winner within one
    cell width (``bound2``) provably beats anything outside the 3×3
    halo; ``force`` (level 0) marks every point final."""
    side = g["_kc_side"].to_numpy(zero_copy_only=False)
    pts = g.filter(pa.array(side == 0))
    base = pts.drop_columns(_KC_DROP)
    npts = pts.num_rows
    if npts == 0:
        return (
            base.append_column("poi_id", pa.array([], type=poi_id_type))
            .append_column("dist2_deg", pa.array([], type=pa.float64()))
            .append_column("_kc_done", pa.array([], type=pa.bool_()))
        )
    poi = g.filter(pa.array(side == 1))
    best_cand = np.full(npts, -1, dtype=np.int64)
    best_d2 = np.full(npts, np.nan)
    if poi.num_rows:
        kcell = poi["_kc_cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(kcell, kind="stable")
        kcell_s = kcell[order]
        qcell = pts["_kc_cell"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(kcell_s, qcell, "left")
        hi = np.searchsorted(kcell_s, qcell, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total:
            cand_pt = np.repeat(np.arange(npts, dtype=np.int64), cnt)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            cand = order[np.repeat(lo, cnt) + within]
            klat = poi["_kc_mlat"].to_numpy(zero_copy_only=False)[cand]
            klon = poi["_kc_mlon"].to_numpy(zero_copy_only=False)[cand]
            qlat = pts[mlat_col].to_numpy(zero_copy_only=False).astype(np.float64)
            qlon = pts[mlon_col].to_numpy(zero_copy_only=False).astype(np.float64)
            d2 = (klat - qlat[cand_pt]) ** 2 + (klon - qlon[cand_pt]) ** 2
            pid_sort = poi["_kc_poi"].to_pandas().to_numpy()[cand]
            key = np.lexsort((pid_sort, d2, cand_pt))
            pts_s = cand_pt[key]
            first = np.ones(pts_s.size, dtype=bool)
            first[1:] = pts_s[1:] != pts_s[:-1]
            win = key[first]
            best_cand[pts_s[first]] = cand[win]
            best_d2[pts_s[first]] = d2[win]
    found = best_cand >= 0
    done = (found & (best_d2 <= bound2)) | force
    import pyarrow.compute as pc

    poi_idx = pa.array(np.where(found, best_cand, 0), mask=~found)
    poi_id = pc.take(poi["_kc_poi"].combine_chunks(), poi_idx) if poi.num_rows else pa.nulls(npts, poi_id_type)
    return (
        base.append_column("poi_id", poi_id)
        .append_column("dist2_deg", pa.array(np.where(found, best_d2, np.nan)))
        .append_column("_kc_done", pa.array(done))
    )


def knn_join_copartitioned(
    points_ds,
    pois,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    metric_lat_col: str | None = None,
    metric_lon_col: str | None = None,
    metric_scale: float = 1.0,
    level: int = cells.LEVEL_TILE,
    coarsen: int = 2,
    num_partitions: int | None = None,
):
    """Exact nearest-POI join for POI sets TOO LARGE TO BROADCAST
    (the J6b complement of :class:`KnnPoiJoiner`, like
    :func:`pip_join_copartitioned` is J5b to J5).

    Hierarchical grid join: round ℓ tags the still-unresolved points
    with their level-ℓ cell, replicates each POI to its 3×3 level-ℓ
    halo (constant 9×), and joins reduce-side: both tagged streams
    union into ONE exchange keyed by ``hash(cell) % num_partitions``
    and each bucket's ``map_groups`` matches points to candidates via
    searchsorted and takes each point's (d2, poi_id)-lexsort winner —
    a point's cell lives wholly in one bucket, so the fold is total.
    (Not ``Dataset.join``: its hash aggregator crashes on partitions
    that receive build rows but no probe blocks — empty-side schema
    loss, hit whenever the shrinking point side leaves a partition
    empty.)

    A winner within one cell width is PROVABLY the global nearest
    (anything outside the halo is ≥ 2 Chebyshev cells ≥ one full cell
    width away — the same bound as the broadcast ring walk at r=1);
    everything else escalates to a round ``coarsen`` levels coarser,
    whose halo REGION is a superset, doubling reach ``2^coarsen``×
    per round at the same 9× replication. Level 0 is one cell, so the
    final round is an exact brute force and every point resolves —
    output rows equal the broadcast path bit for bit (nulls only for
    an empty POI side, pinned in tests).

    Scale shape: each round ships the (sub-linear) POI cover 9× and
    the still-unresolved points once; the point side shrinks
    geometrically, so total exchange ≈ points + rounds × 9 × POIs.
    Rounds materialize their winner table once (object store,
    spillable) so the resolved/unresolved split does not re-execute
    the join. Size ``num_partitions`` so one bucket's points + covers
    fit an aggregator heap (default ≈4× cluster cores via
    ``agg.default_n_buckets``, same contract as the aggregate stages).

    ``pois``: Dataset with columns (poi_id, lat, lon, mlat, mlon) —
    see :func:`pois_to_table` — or the table itself."""
    import ray.data as rd

    from ..pipelines import agg

    if isinstance(pois, pa.Table):
        pois = rd.from_arrow(pois)
    if num_partitions is None:
        num_partitions = agg.default_n_buckets()
    mlat_col = metric_lat_col or lat_col
    mlon_col = metric_lon_col or lon_col
    poi_id_type = dict(zip(pois.schema().names, pois.schema().types))["poi_id"]
    schema = points_ds.schema()
    reserved = set(_KC_DROP) | {"_kc_done", "poi_id", "dist2_deg"}
    if reserved & set(schema.names):
        raise ValueError(f"points columns collide with {sorted(reserved)}")
    point_fields = list(zip(schema.names, schema.types))
    pois = pois.materialize()  # re-shipped each round; never re-executed

    def split(mat, want_done: bool):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sel = b.filter(
                b["_kc_done"] if want_done else pc.invert(b["_kc_done"])
            )
            if want_done:
                return sel.drop_columns(["_kc_done"])
            return sel.drop_columns(["_kc_done", "poi_id", "dist2_deg"])

        return mat.map_batches(f, batch_format="pyarrow", batch_size=None)

    remaining = points_ds
    resolved = []
    lvl = level
    while True:
        force = lvl == 0
        bound = 180.0 / (1 << lvl) * metric_scale
        cover = pois.map_batches(
            _knn_cover_batch,
            fn_kwargs={
                "level": lvl, "n_buckets": num_partitions,
                "point_fields": point_fields,
            },
            batch_format="pyarrow", batch_size=None,
        )
        tagged = remaining.map_batches(
            _knn_tag_points_batch,
            fn_kwargs={
                "lat_col": lat_col, "lon_col": lon_col, "level": lvl,
                "n_buckets": num_partitions, "poi_id_type": poi_id_type,
            },
            batch_format="pyarrow", batch_size=None,
        )
        b2, frc = bound * bound, force
        winner = (
            tagged.union(cover)
            .groupby("_kc_bucket")
            .map_groups(
                lambda g, _b2=b2, _f=frc: _knn_join_group(
                    g, mlat_col, mlon_col, _b2, _f, poi_id_type
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        resolved.append(split(winner, True))
        if force:
            break
        remaining = split(winner, False).materialize()
        if remaining.count() == 0:
            break
        lvl = max(0, lvl - coarsen)
    out = resolved[0]
    for part in resolved[1:]:
        out = out.union(part)
    return out


# ------------------------------------------------------------------ A10:
# multi-resolution tile-count pyramid (the rollup form of the
# north-rule tile assignment: every zoom level from ONE input pass).


def cell_pyramid_counts(
    points_ds,
    levels: list[int],
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_buckets: int | None = None,
):
    """Per-cell point counts at EVERY requested grid level from one
    pass over the points — the tile-pyramid rollup every map/tile
    service materializes.

    Scale shape: the input streams through cell encoding ONCE at the
    finest level into one ``agg.bucketed_aggregate`` (the only
    exchange that sees point-cardinality keys); each coarser level is
    then rolled up from the PREVIOUS level's counts via
    ``parent_cell_id`` + a bucketed sum — sub-linear inputs all the
    way down (level ℓ−1 has ≤ ¼ the cells of ℓ under uniform data,
    and never more). Exactness: counts are associative sums and every
    fine cell has exactly one parent per level, so each level equals
    the direct groupby at that level (pinned in tests + the
    ``cell_pyramid`` SQL oracle). Each level is materialized once —
    it is consumed twice (emitted + rolled up), and Ray re-executes
    lazy branches otherwise.

    Returns a Dataset with columns (level:int64, cell:int64,
    n:int64), levels sorted finest→coarsest in the requested set."""
    import ray.data as rd  # noqa: F401 — documents the return type

    from ..pipelines import agg

    lvls = sorted(set(int(l) for l in levels), reverse=True)
    finest = lvls[0]

    def tag_level(lv: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "level": pa.array(
                        np.full(t.num_rows, lv, dtype=np.int64)
                    ),
                    "cell": t["cell"],
                    "n": t["n"],
                }
            )

        return f

    def encode(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cells.cell_id(lat, lon, finest))})

    enc = points_ds.map_batches(
        encode, batch_format="pyarrow", batch_size=None
    )
    counts = agg.bucketed_aggregate(
        enc, ["cell"], {"n": ("", "count")}, n_buckets=n_buckets
    ).materialize()
    out = counts.map_batches(
        tag_level(finest), batch_format="pyarrow", batch_size=None
    )
    prev, prev_level = counts, finest
    for lv in lvls[1:]:
        def to_parent(t: pa.Table, _from=prev_level, _to=lv) -> pa.Table:
            cid = t["cell"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cell": pa.array(cells.parent_cell_id(cid, _from, _to)),
                    "n": t["n"],
                }
            )

        rolled = agg.bucketed_aggregate(
            prev.map_batches(to_parent, batch_format="pyarrow", batch_size=None),
            ["cell"],
            {"n": ("n", "sum")},
            n_buckets=n_buckets,
        ).materialize()
        out = out.union(
            rolled.map_batches(tag_level(lv), batch_format="pyarrow", batch_size=None)
        )
        prev, prev_level = rolled, lv
    return out


# ------------------------------------------------------------------ A11:
# heatmap rasterization — cell counts rendered to PNG tiles (the
# inverse of J7's raster→vector route extraction: vector→raster).


def heatmap_tile_images(
    points_ds,
    tile_level: int = 4,
    fine_level: int = 9,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_buckets: int | None = None,
):
    """Render a per-tile density HEATMAP: one grayscale PNG per
    level-``tile_level`` tile, where pixel (row, col) is the
    clamped-to-255 point count of one level-``fine_level`` cell
    (row 0 = north). The grid hierarchy is pure bit-shift, so every
    tile holds exactly 2^d × 2^d fine cells (d = fine − tile) — a
    dense raster with no partial tiles.

    Scale shape: the POINTS see exactly one streaming cell-encode
    pass + one bucketed count exchange (key cardinality = occupied
    fine cells, sub-linear); pixels are then created per TILE inside
    a ``groupby(tile).map_groups`` over those counts — image bytes
    exist only at tile granularity and never ride on point rows.
    This is the write-side twin of ``route_tile_batch`` (J7), which
    consumes such rasters back into vector form.

    Honesty contract: the returned ``n_lit`` / ``px_sum`` stats are
    computed from the DECODED png bytes (encode→decode round trip in
    the kernel), so the SQL oracle over the raw points genuinely
    checks the rendered image content, not a parallel code path.

    Returns a Dataset with (tile:int64, w:int32, h:int32,
    n_lit:int64, px_sum:int64, png:binary)."""
    import pandas as pd

    from ..pipelines import agg

    if fine_level <= tile_level:
        raise ValueError("fine_level must be > tile_level")
    d = fine_level - tile_level
    size = 1 << d

    def encode(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cells.cell_id(lat, lon, fine_level))})

    counts = agg.bucketed_aggregate(
        points_ds.map_batches(encode, batch_format="pyarrow", batch_size=None),
        ["cell"],
        {"n": ("", "count")},
        n_buckets=n_buckets,
    )

    def add_tile(t: pa.Table) -> pa.Table:
        cid = t["cell"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "tile", pa.array(cells.parent_cell_id(cid, fine_level, tile_level))
        )

    def render(df: pd.DataFrame) -> pd.DataFrame:
        tile = int(df["tile"].iloc[0])
        ix, iy = cells.xy_from_cell_id(df["cell"].to_numpy(np.int64))
        tx, ty = cells.xy_from_cell_id(np.array([tile], dtype=np.int64))
        x = ix - (int(tx[0]) << d)
        y = iy - (int(ty[0]) << d)
        img = np.zeros((size, size), dtype=np.uint8)
        img[size - 1 - y, x] = np.minimum(
            df["n"].to_numpy(np.int64), 255
        ).astype(np.uint8)
        png = imaging.encode_png(np.repeat(img[:, :, None], 3, axis=2))
        dec = imaging.decode_png(png)[:, :, 0]
        return pd.DataFrame(
            {
                "tile": [tile],
                "w": [np.int32(size)],
                "h": [np.int32(size)],
                "n_lit": [np.int64((dec > 0).sum())],
                "px_sum": [np.int64(dec.astype(np.int64).sum())],
                "png": [png],
            }
        )

    return (
        counts.map_batches(add_tile, batch_format="pyarrow", batch_size=None)
        .groupby("tile")
        .map_groups(render, batch_format="pandas")
    )


def mosaic_downsample(tiles_ds, tile_level: int):
    """Tile-pyramid OVERVIEW build (the gdal2tiles/slippy-map step):
    parent tiles at ``tile_level - 1`` mosaicked from their ≤4 child
    heatmap tiles — each child PNG is DECODED, composed into its
    quadrant of a 2s×2s canvas (missing children stay zero), and
    2×2 average-pooled with floor back to an s×s parent PNG. Pixel
    placement keeps row 0 = north: a child with odd iy (northern
    half) lands in canvas rows [0, s).

    Scale shape: the input is the TILE table (sub-linear in points);
    one ``groupby(parent)`` co-locates ≤4 rows per group, so image
    bytes only ever move at tile granularity and per-group state is
    one 2s×2s uint8 canvas. Chained calls walk the whole pyramid —
    each level reads only the previous level's tiles, never the
    points.

    Honesty contract (same as :func:`heatmap_tile_images`): the
    returned ``n_lit`` / ``px_sum`` stats come from the DECODED
    parent png, so an oracle over the raw points checks the full
    decode→compose→pool→encode→decode chain.

    Returns (tile:int64, w:int32, h:int32, n_lit:int64,
    px_sum:int64, png:binary) at ``tile_level - 1``."""
    import pandas as pd

    if tile_level < 1:
        raise ValueError("tile_level must be >= 1")

    def add_parent(df: pd.DataFrame) -> pd.DataFrame:
        cid = df["tile"].to_numpy(np.int64)
        return df.assign(
            parent=cells.parent_cell_id(cid, tile_level, tile_level - 1)
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        parent = int(g["parent"].iloc[0])
        size = int(g["w"].iloc[0])
        canvas = np.zeros((2 * size, 2 * size), dtype=np.int64)
        for tile, png in zip(g["tile"].to_numpy(np.int64), g["png"]):
            ix, iy = cells.xy_from_cell_id(np.array([tile], dtype=np.int64))
            qx, qy = int(ix[0]) & 1, int(iy[0]) & 1
            img = imaging.decode_png(png)[:, :, 0].astype(np.int64)
            canvas[(1 - qy) * size : (2 - qy) * size, qx * size : (qx + 1) * size] = img
        pooled = (
            canvas[0::2, 0::2] + canvas[0::2, 1::2]
            + canvas[1::2, 0::2] + canvas[1::2, 1::2]
        ) // 4
        png = imaging.encode_png(
            np.repeat(pooled.astype(np.uint8)[:, :, None], 3, axis=2)
        )
        dec = imaging.decode_png(png)[:, :, 0]
        return pd.DataFrame(
            {
                "tile": [parent],
                "w": [np.int32(size)],
                "h": [np.int32(size)],
                "n_lit": [np.int64((dec > 0).sum())],
                "px_sum": [np.int64(dec.astype(np.int64).sum())],
                "png": [png],
            }
        )

    return (
        tiles_ds.map_batches(add_parent, batch_format="pandas", batch_size=None)
        .groupby("parent")
        .map_groups(assemble, batch_format="pandas")
    )


def decode_tile_pixels(df, tile_level: int, fine_level: int):
    """Raster→points: DECODE each heatmap tile PNG and emit one row
    per LIT pixel — the fine cell's center (lat, lon) plus the pixel
    value ``v``. The read-side inverse of :func:`heatmap_tile_images`
    (and the point-shaped sibling of ``route_tile_batch``): zonal
    statistics, raster re-vectorization and raster×vector joins all
    start here. Output volume is bounded by LIT pixels (≤ occupied
    fine cells), never by tile count × tile area."""
    import pandas as pd

    d = fine_level - tile_level
    size = 1 << d
    las, los, vs = [], [], []
    for tile, png in zip(df["tile"].to_numpy(np.int64), df["png"]):
        img = imaging.decode_png(png)[:, :, 0]
        rr, cc = np.nonzero(img)
        if not len(rr):
            continue
        tx, ty = cells.xy_from_cell_id(np.array([tile], dtype=np.int64))
        ix = (int(tx[0]) << d) + cc
        iy = (int(ty[0]) << d) + (size - 1 - rr)  # row 0 = north
        la, lo = cells.cell_center(cells.cell_id_from_xy(ix, iy), fine_level)
        las.append(la)
        los.append(lo)
        vs.append(img[rr, cc].astype(np.int64))
    if not las:
        return pd.DataFrame(
            {
                "lat": np.array([], dtype=np.float64),
                "lon": np.array([], dtype=np.float64),
                "v": np.array([], dtype=np.int64),
            }
        )
    return pd.DataFrame(
        {
            "lat": np.concatenate(las),
            "lon": np.concatenate(los),
            "v": np.concatenate(vs),
        }
    )
