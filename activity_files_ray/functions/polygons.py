"""Vectorized polygon kernels: point-in-polygon + covering index.

The reference has no polygon operations; these implement the new
engine's PIP join (BASELINE.json north_rule: "point-in-polygon joins
(ray-casting with cell-prefix pre-filtering)"). Public-knowledge
algorithms only: the even-odd ray-casting rule and convex half-plane
tests.

A polygon is a closed exterior ring given CCW as parallel float64
arrays (the last vertex need not repeat the first). Points exactly on
an edge are not guaranteed a side — fixture polygons are constructed
so that no synthetic point is ever collinear with an edge
(FIXTURES.md §6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import cells


@dataclass(frozen=True)
class Polygon:
    region_id: str
    name: str
    lat: np.ndarray  # ring vertex latitudes, CCW
    lon: np.ndarray
    # derived, filled in __post_init__
    lat_min: float = field(default=0.0, compare=False)
    lat_max: float = field(default=0.0, compare=False)
    lon_min: float = field(default=0.0, compare=False)
    lon_max: float = field(default=0.0, compare=False)

    def __post_init__(self) -> None:
        la = np.asarray(self.lat, dtype=np.float64)
        lo = np.asarray(self.lon, dtype=np.float64)
        object.__setattr__(self, "lat", la)
        object.__setattr__(self, "lon", lo)
        object.__setattr__(self, "lat_min", float(la.min()))
        object.__setattr__(self, "lat_max", float(la.max()))
        object.__setattr__(self, "lon_min", float(lo.min()))
        object.__setattr__(self, "lon_max", float(lo.max()))

    def is_convex_ccw(self) -> bool:
        x, y = self.lon, self.lat
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        x3, y3 = np.roll(x, -2), np.roll(y, -2)
        cross = (x2 - x) * (y3 - y2) - (y2 - y) * (x3 - x2)
        return bool(np.all(cross > 0))


def points_in_polygon(
    plat: np.ndarray, plon: np.ndarray, poly: Polygon
) -> np.ndarray:
    """Even-odd ray-casting PIP test, vectorized over points.

    Casts a ray toward +lon; counts edge crossings. O(points × edges)
    numpy ops — called only on cell-prefix-prefiltered candidates.
    """
    px = np.asarray(plon, dtype=np.float64)
    py = np.asarray(plat, dtype=np.float64)
    vx, vy = poly.lon, poly.lat
    wx, wy = np.roll(vx, -1), np.roll(vy, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(vx.size):
        x1, y1, x2, y2 = vx[i], vy[i], wx[i], wy[i]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray rule
        cond = (y1 > py) != (y2 > py)
        # x coordinate where the edge crosses the point's latitude
        with np.errstate(invalid="ignore"):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (px < xint)
    return inside


def points_in_convex_polygon(
    plat: np.ndarray, plon: np.ndarray, poly: Polygon
) -> np.ndarray:
    """Half-plane conjunction for convex CCW rings (strict interior).

    This is the form the DuckDB oracle mirrors (see
    :func:`convex_pip_sql_expr`); for points not on an edge it agrees
    with :func:`points_in_polygon`.
    """
    px = np.asarray(plon, dtype=np.float64)
    py = np.asarray(plat, dtype=np.float64)
    vx, vy = poly.lon, poly.lat
    wx, wy = np.roll(vx, -1), np.roll(vy, -1)
    ok = np.ones(px.shape, dtype=bool)
    for i in range(vx.size):
        cross = (wx[i] - vx[i]) * (py - vy[i]) - (wy[i] - vy[i]) * (px - vx[i])
        ok &= cross > 0.0
    return ok


def convex_pip_sql_expr(poly: Polygon, lat_expr: str, lon_expr: str) -> str:
    """ANSI-SQL predicate equivalent to
    :func:`points_in_convex_polygon` — generated from the same vertex
    constants so the Ray kernel and the oracle cannot drift."""
    vx, vy = poly.lon, poly.lat
    wx, wy = np.roll(vx, -1), np.roll(vy, -1)
    terms = []
    for i in range(vx.size):
        terms.append(
            f"(({wx[i]!r} - {vx[i]!r}) * (({lat_expr}) - {vy[i]!r}) - "
            f"({wy[i]!r} - {vy[i]!r}) * (({lon_expr}) - {vx[i]!r}) > 0.0)"
        )
    return "(" + " AND ".join(terms) + ")"


class PolygonIndex:
    """Driver-built broadcast index: coarse cell prefix → candidate
    polygons (SURVEY.md §2.4 J5).

    Built once on the driver, shipped to actors via ``ray.put``; a
    batch looks up candidates by each point's prefix cell, then runs
    the exact ray-cast only against those candidates. At 100 TB scale
    this avoids any shuffle as long as the polygon side fits in
    memory (regions/admin boundaries always do).
    """

    def __init__(self, polygons: list[Polygon], level: int = cells.LEVEL_PREFIX):
        self.level = level
        self.polygons = list(polygons)
        cover_cells: list[np.ndarray] = []
        cover_poly: list[np.ndarray] = []
        for idx, poly in enumerate(self.polygons):
            cover = cells.covering_cells_bbox(
                poly.lat_min, poly.lat_max, poly.lon_min, poly.lon_max, level
            )
            cover_cells.append(cover)
            cover_poly.append(np.full(cover.size, idx, dtype=np.int64))
        if cover_cells:
            flat_cells = np.concatenate(cover_cells)
            flat_poly = np.concatenate(cover_poly)
        else:
            flat_cells = np.empty(0, dtype=np.int64)
            flat_poly = np.empty(0, dtype=np.int64)
        order = np.argsort(flat_cells, kind="stable")
        sorted_cells = flat_cells[order]
        self.flat_poly = flat_poly[order]
        # CSR: distinct covering cells → ranges into flat_poly
        self.cell_keys, starts = np.unique(sorted_cells, return_index=True)
        self.offsets = np.append(starts, len(sorted_cells))
        self.cell_to_polys: dict[int, np.ndarray] = {
            int(c): self.flat_poly[self.offsets[i] : self.offsets[i + 1]]
            for i, c in enumerate(self.cell_keys)
        }

    def polys_in_cells(self, cell_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized CSR lookup: flat candidate polygon indices for a
        flat array of prefix cells. Returns (counts_per_cell,
        flat_poly_indices)."""
        from .gather import multi_range_gather

        cell_ids = np.asarray(cell_ids, dtype=np.int64)
        if self.cell_keys.size == 0 or cell_ids.size == 0:
            return np.zeros(cell_ids.size, dtype=np.int64), np.empty(0, np.int64)
        pos = np.searchsorted(self.cell_keys, cell_ids)
        pos = np.clip(pos, 0, self.cell_keys.size - 1)
        hit = self.cell_keys[pos] == cell_ids
        lo = np.where(hit, self.offsets[pos], 0)
        hi = np.where(hit, self.offsets[pos + 1], 0)
        counts = hi - lo
        return counts, self.flat_poly[multi_range_gather(lo, counts)]

    def candidates(self, prefix_cells: np.ndarray) -> dict[int, np.ndarray]:
        """Map each distinct prefix cell present in a batch to its
        candidate polygon indices (empty cells omitted)."""
        out: dict[int, np.ndarray] = {}
        for c in np.unique(prefix_cells).tolist():
            hit = self.cell_to_polys.get(int(c))
            if hit is not None:
                out[int(c)] = hit
        return out
