"""Vectorized spatial cell index (S2/H3-style discrete global grid).

The reference package has no spatial index; BASELINE.json's north_rule
requires "batched H3/S2 cell encoding of trackpoints via vectorized
lat/lng→cell kernels". Neither the ``h3`` nor ``s2`` libraries exist
in this environment, so this module implements a from-scratch
equirectangular quadtree grid with the same *role* (uniform discrete
cells, parent/child hierarchy, k-ring neighborhoods, prefix
pre-filtering), built entirely from public knowledge and fully
vectorized in numpy:

* level L splits the world into 2^L × 2^L cells:
  ``ix = floor((lon+180) * 2^L / 360)``, ``iy = floor((lat+90) * 2^L / 180)``
* ``cell_id = ix * 2^29 + iy`` — a flat int64, deliberately NOT
  Morton-interleaved so the identical formula is expressible in ANSI
  SQL for the DuckDB correctness oracle (see :func:`cell_sql_expr`).
* parent at coarser level = integer right-shift of (ix, iy) — used as
  the "cell prefix" pre-filter for PIP joins.
* k-ring / k-disk neighborhoods = box offsets with longitude wrap and
  latitude clamp.

Default ``LEVEL_TILE = 15`` gives cells of 360/2^15 ≈ 0.011° ≈ 1.2 km
(equator) — the working analog of "H3 resolution 9" for tiling;
``LEVEL_PREFIX = 9`` (≈ 0.7° ≈ 78 km) is the coarse prefix used for
polygon covering / candidate pre-filtering.
"""

from __future__ import annotations

import numpy as np

# cell_id packing: ix * 2^29 + iy supports levels up to 28.
_IY_BITS = 29
_IY_MOD = 1 << _IY_BITS

LEVEL_TILE = 15  # ~1.2 km cells — the "res 9" analog for tile assignment
LEVEL_PREFIX = 9  # ~78 km cells — the coarse prefix for PIP pre-filtering

MAX_LEVEL = 28


def cell_xy(
    lat: np.ndarray, lon: np.ndarray, level: int = LEVEL_TILE
) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) → integer cell coordinates (ix, iy) at ``level``.

    Pure float64 arithmetic in a fixed expression order so the DuckDB
    oracle (:func:`cell_sql_expr`) computes bit-identical results.
    Out-of-range coordinates clamp into the valid grid.
    """
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    n = float(1 << level)
    # non-finite coordinates map deterministically to cell (0, 0)
    # instead of an undefined float→int cast; the normalize stage
    # drops such points before any spatial stage anyway.
    lon = np.nan_to_num(
        np.asarray(lon, dtype=np.float64), nan=-180.0, posinf=180.0, neginf=-180.0
    )
    lat = np.nan_to_num(
        np.asarray(lat, dtype=np.float64), nan=-90.0, posinf=90.0, neginf=-90.0
    )
    ix = np.floor((lon + 180.0) * n / 360.0).astype(np.int64)
    iy = np.floor((lat + 90.0) * n / 180.0).astype(np.int64)
    hi = (1 << level) - 1
    return np.clip(ix, 0, hi), np.clip(iy, 0, hi)


def cell_id(
    lat: np.ndarray, lon: np.ndarray, level: int = LEVEL_TILE
) -> np.ndarray:
    """(lat, lon) → flat int64 cell id ``ix * 2^29 + iy``."""
    ix, iy = cell_xy(lat, lon, level)
    return ix * _IY_MOD + iy


def cell_id_from_xy(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return np.asarray(ix, dtype=np.int64) * _IY_MOD + np.asarray(
        iy, dtype=np.int64
    )


def xy_from_cell_id(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cid = np.asarray(cid, dtype=np.int64)
    return cid // _IY_MOD, cid % _IY_MOD


def parent_cell_id(cid: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Coarsen a cell id from ``level`` to ``parent_level`` (the prefix)."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    d = level - parent_level
    ix, iy = xy_from_cell_id(cid)
    return cell_id_from_xy(ix >> d, iy >> d)


def cell_bounds(
    cid: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Cell id → (lat_min, lat_max, lon_min, lon_max) arrays."""
    ix, iy = xy_from_cell_id(cid)
    n = float(1 << level)
    lon_min = ix.astype(np.float64) * 360.0 / n - 180.0
    lat_min = iy.astype(np.float64) * 180.0 / n - 90.0
    return lat_min, lat_min + 180.0 / n, lon_min, lon_min + 360.0 / n


def cell_center(cid: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    lat_min, lat_max, lon_min, lon_max = cell_bounds(cid, level)
    return (lat_min + lat_max) * 0.5, (lon_min + lon_max) * 0.5


def disk_cells(cid: np.ndarray, level: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of each input cell.

    Returns shape ``(len(cid), (2k+1)^2)`` int64. Longitude wraps
    modulo 2^level; latitude neighbors outside the poles are clamped
    to the input cell's own id (so they dedupe away in set lookups).
    Used for kNN ring expansion (ring k = disk k minus disk k-1).
    """
    cid = np.atleast_1d(np.asarray(cid, dtype=np.int64))
    ix, iy = xy_from_cell_id(cid)
    n = 1 << level
    off = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(off, off, indexing="ij")
    dx = dx.ravel()[None, :]
    dy = dy.ravel()[None, :]
    nx = (ix[:, None] + dx) % n
    ny = iy[:, None] + dy
    valid = (ny >= 0) & (ny < n)
    ny = np.where(valid, ny, iy[:, None])
    nx = np.where(valid, nx, ix[:, None])
    return cell_id_from_xy(nx, ny)


def ring_cells(cid: int, level: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``k`` from one cell (the
    ring walked outward during kNN search)."""
    if k == 0:
        return np.asarray([cid], dtype=np.int64)
    full = disk_cells(np.asarray([cid]), level, k)[0]
    inner = set(disk_cells(np.asarray([cid]), level, k - 1)[0].tolist())
    out = np.asarray(
        [c for c in dict.fromkeys(full.tolist()) if c not in inner],
        dtype=np.int64,
    )
    return out


def covering_cells_bbox(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    level: int = LEVEL_PREFIX,
) -> np.ndarray:
    """All cells at ``level`` intersecting a bounding box (no lon
    wrap-around split: callers pass already-normalized boxes).

    Used to build the polygon → covering-prefix index on the driver
    before a PIP join (SURVEY.md §2.4 J5).
    """
    ix0, iy0 = cell_xy(np.asarray([lat_min]), np.asarray([lon_min]), level)
    ix1, iy1 = cell_xy(np.asarray([lat_max]), np.asarray([lon_max]), level)
    xs = np.arange(ix0[0], ix1[0] + 1, dtype=np.int64)
    ys = np.arange(iy0[0], iy1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return cell_id_from_xy(gx.ravel(), gy.ravel())


def cell_xy_sql_exprs(
    lat_expr: str, lon_expr: str, level: int = LEVEL_TILE
) -> tuple[str, str]:
    """ANSI-SQL (ix, iy) expressions computing the identical integer
    cell coordinates as :func:`cell_xy` (same float64 expression
    order → bit-identical). Single source for every cell oracle."""
    n = float(1 << level)
    hi = (1 << level) - 1
    ix = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_expr}) + 180.0) * {n} / 360.0) "
        f"AS BIGINT), 0), {hi})"
    )
    iy = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_expr}) + 90.0) * {n} / 180.0) "
        f"AS BIGINT), 0), {hi})"
    )
    return ix, iy


def cell_sql_expr(lat_expr: str, lon_expr: str, level: int = LEVEL_TILE) -> str:
    """ANSI-SQL expression computing the identical cell id.

    Single source of truth shared with the DuckDB oracle so the Ray
    kernel and the SQL produce bit-identical int64 cell ids.
    """
    ix, iy = cell_xy_sql_exprs(lat_expr, lon_expr, level)
    return f"({ix} * {_IY_MOD} + {iy})"


# ---------------------------------------------------------------------------
# Z-order (Morton) linearization (r5): the space-filling-curve sort
# key behind spatially-ordered corpus exports — neighbors in (lat,
# lon) stay close in the 1-D order, so a range-partitioned sorted
# export by morton key gives spatial locality per partition file.
# Shared-source-of-truth idiom: the numpy kernel and the generated
# SQL perform the identical mask-spread bit sequence.
# ---------------------------------------------------------------------------

_MORTON_MASKS = (
    (16, 281470681808895),        # 0x0000FFFF0000FFFF
    (8, 71777214294589695),       # 0x00FF00FF00FF00FF
    (4, 1085102592571150095),     # 0x0F0F0F0F0F0F0F0F
    (2, 3689348814741910323),     # 0x3333333333333333
    (1, 6148914691236517205),     # 0x5555555555555555
)


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of v into the even bit positions."""
    v = v.astype(np.int64)
    for sh, mask in _MORTON_MASKS:
        v = (v | (v << sh)) & np.int64(mask)
    return v


def morton_cd(lat_cd: np.ndarray, lon_cd: np.ndarray) -> np.ndarray:
    """Morton key of integer centidegree coordinates: x = lon_cd +
    18000 (16 bits), y = lat_cd + 9000 (15 bits), x on even bits."""
    x = np.asarray(lon_cd, dtype=np.int64) + 18000
    y = np.asarray(lat_cd, dtype=np.int64) + 9000
    return _spread_bits16(x) | (_spread_bits16(y) << 1)


def morton_sql_expr(lat_cd_expr: str, lon_cd_expr: str) -> str:
    """ANSI-SQL expression computing the identical morton key
    (DuckDB BIGINT bit ops mirror the numpy mask spreads exactly)."""

    def spread(e: str) -> str:
        for sh, mask in _MORTON_MASKS:
            e = f"((({e}) | (({e}) << {sh})) & {mask})"
        return e

    x = f"(({lon_cd_expr}) + 18000)"
    y = f"(({lat_cd_expr}) + 9000)"
    return f"({spread(x)} | ({spread(y)} << 1))"
