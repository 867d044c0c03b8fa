"""Ray Data stages of the spatial core.

Each stage is a batch kernel usable with
``ds.map_batches(..., batch_format="pyarrow")``; stateful ones are
callable CLASSES (actor pools) that resolve their broadcast index
(``ray.put`` object ref) ONCE in ``__init__`` — never per batch.

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
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        prefix = cells.cell_id(lat, lon, self.index.level)
        take_idx: list[np.ndarray] = []
        region_ids: list[np.ndarray] = []
        for c, poly_idx in self.index.candidates(prefix).items():
            in_cell = np.nonzero(prefix == c)[0]
            for pi in poly_idx:
                poly = self.index.polygons[pi]
                hit = polygons.points_in_polygon(lat[in_cell], lon[in_cell], poly)
                rows = in_cell[hit]
                if rows.size:
                    take_idx.append(rows)
                    region_ids.append(np.full(rows.size, poly.region_id, dtype=object))
        if not take_idx:
            empty = batch.slice(0, 0)
            return empty.append_column("region_id", pa.array([], type=pa.string()))
        idx = np.concatenate(take_idx)
        rids = np.concatenate(region_ids)
        order = np.argsort(idx, kind="stable")
        out = batch.take(pa.array(idx[order]))
        return out.append_column("region_id", pa.array(rids[order], type=pa.string()))


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
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        rows, d2 = knn.nearest_poi(lat, lon, self.index)
        found = rows >= 0
        ids = np.where(found, self.index.poi_ids[np.clip(rows, 0, None)], None)
        return batch.append_column(
            "poi_id", pa.array(ids.tolist(), type=pa.from_numpy_dtype(self.index.poi_ids.dtype) if self.index.poi_ids.dtype != object else pa.string())
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
            cid = cells.cell_id(lat, lon, self.level)
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
        add_cell_columns, batch_format="pyarrow", fn_kwargs={"level": level}
    )
    partial = enc.map_batches(
        partial_counts,
        batch_format="pyarrow",
        fn_kwargs={"key_col": "cell", "weight_col": weight_col},
    )
    return partial.groupby("cell").aggregate(Sum("n", alias_name="n"))
