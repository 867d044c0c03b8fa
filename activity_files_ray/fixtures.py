"""Deterministic synthetic fixture tables (FIXTURES.md).

Mirrors the reference's test fixtures
(``/root/reference/test/fixtures/builders.dart:21-89`` canonical
3-point activity, ``sample_data.dart:20-62`` inline samples) plus the
new-engine tables mandated by BASELINE.json ``input_hint``: the
image+caption table, region polygons, and POIs. Everything is seeded
(`numpy.random.default_rng`) or pure integer arithmetic — identical
inputs yield identical bytes, as required for round-trip and
resume-from-checkpoint tests.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from .functions import imaging
from .functions.polygons import Polygon

EPOCH = _dt.datetime(1970, 1, 1)


def _us(iso: str) -> int:
    return int(
        (_dt.datetime.fromisoformat(iso.replace("Z", "")) - EPOCH).total_seconds()
        * 1_000_000
    )


# --- canonical fixtures (builders.dart:21-89 values) -------------------------

BUILDERS_T0 = _us("2024-04-01T06:00:00")  # builders.dart base time
SAMPLE_T0 = _us("2024-03-01T10:00:00")  # sample_data.dart base time


def canonical_trackpoints(variant: str = "builders") -> pa.Table:
    """The reference's deterministic 3-point activity.

    ``builders``: 2024-04-01T06Z, 5 s steps (builders.dart:21-89);
    ``sample``: 2024-03-01T10Z, 10 s steps (sample_data.dart:20-62).
    Base (40.0, −105.0), +0.0005°/point, elevation 1600+i.
    """
    t0, step = (BUILDERS_T0, 5) if variant == "builders" else (SAMPLE_T0, 10)
    i = np.arange(3, dtype=np.float64)
    return pa.table(
        {
            "activity_id": pa.array(["act_000000"] * 3),
            "seq": pa.array(np.arange(3, dtype=np.int32)),
            "ts_us": pa.array(
                t0 + np.arange(3, dtype=np.int64) * step * 1_000_000,
                type=pa.timestamp("us"),
            ),
            "lat": pa.array(40.0 + 0.0005 * i),
            "lon": pa.array(-105.0 - 0.0005 * i),
            "ele": pa.array(1600.0 + i),
        }
    )


def canonical_channels(variant: str = "builders") -> pa.Table:
    """HR 140/142/145, cadence 80/82/84 (82/84/86 in sample_data),
    power 200/210/220, temperature 21/22/23 — builders.dart:43-62."""
    t0, step = (BUILDERS_T0, 5) if variant == "builders" else (SAMPLE_T0, 10)
    ts = t0 + np.arange(3, dtype=np.int64) * step * 1_000_000
    vals = {
        "heart_rate": [140.0, 142.0, 145.0],
        "cadence": [80.0, 82.0, 84.0] if variant == "builders" else [82.0, 84.0, 86.0],
        "power": [200.0, 210.0, 220.0],
        "temperature": [21.0, 22.0, 23.0],
    }
    chans, tss, vs = [], [], []
    for ch, v in vals.items():
        chans += [ch] * 3
        tss += ts.tolist()
        vs += v
    return pa.table(
        {
            "activity_id": pa.array(["act_000000"] * len(chans)),
            "channel": pa.array(chans).dictionary_encode(),
            "ts_us": pa.array(tss, type=pa.timestamp("us")),
            "value": pa.array(vs, type=pa.float64()),
        }
    )


# --- synthetic corpus --------------------------------------------------------

TRACKPOINT_SCHEMA = pa.schema(
    [
        ("activity_id", pa.string()),
        ("seq", pa.int32()),
        ("ts_us", pa.timestamp("us")),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("ele", pa.float64()),
    ]
)

SPORTS = ["running", "cycling", "hiking", "walking", "swimming"]


def make_trackpoints(
    n_activities: int = 10, points_per_activity: int = 50, seed: int = 42
) -> pa.Table:
    """Seeded random-walk tracks near the canonical fixture area."""
    rng = np.random.default_rng(seed)
    ids, seqs, tss, lats, lons, eles = [], [], [], [], [], []
    for a in range(n_activities):
        n = points_per_activity
        base_lat = 39.5 + rng.uniform(0, 1.0)
        base_lon = -105.5 + rng.uniform(0, 1.0)
        lat = base_lat + np.cumsum(rng.uniform(-1, 1, n)) * 2e-4
        lon = base_lon + np.cumsum(rng.uniform(-1, 1, n)) * 2e-4
        t0 = BUILDERS_T0 + a * 3_600_000_000
        ids.append(np.full(n, f"act_{a:06d}"))
        seqs.append(np.arange(n, dtype=np.int32))
        tss.append(t0 + np.arange(n, dtype=np.int64) * 5_000_000)
        lats.append(lat)
        lons.append(lon)
        eles.append(1600.0 + np.cumsum(rng.uniform(-1, 1, n)))
    return pa.table(
        {
            "activity_id": pa.array(np.concatenate(ids)),
            "seq": pa.array(np.concatenate(seqs)),
            "ts_us": pa.array(np.concatenate(tss), type=pa.timestamp("us")),
            "lat": pa.array(np.concatenate(lats)),
            "lon": pa.array(np.concatenate(lons)),
            "ele": pa.array(np.concatenate(eles)),
        },
        schema=TRACKPOINT_SCHEMA,
    )


def make_regions() -> list[Polygon]:
    """Fixture region polygons (FIXTURES.md §6): one fully containing
    the canonical track area, one disjoint, one crossing it. Convex
    CCW rings; vertices at .0005-offset coordinates so no fixture
    point is ever collinear with an edge."""
    return [
        Polygon(  # contains the canonical 3-point track at (40.0, -105.0)
            "reg_contain",
            "boulder-box",
            lat=np.array([39.0005, 39.0005, 41.0005, 41.0005]),
            lon=np.array([-106.0005, -104.0005, -104.0005, -106.0005]),
        ),
        Polygon(  # disjoint: far east
            "reg_disjoint",
            "atlantic-box",
            lat=np.array([10.0005, 10.0005, 20.0005, 20.0005]),
            lon=np.array([-40.0005, -30.0005, -30.0005, -40.0005]),
        ),
        Polygon(  # diagonal pentagon crossing the fixture area boundary
            "reg_cross",
            "front-range-pentagon",
            lat=np.array([39.9005, 40.0005, 40.2005, 40.1005, 39.9505]),
            lon=np.array([-105.2005, -104.8005, -104.9005, -105.3005, -105.3005]),
        ),
    ]


def regions_table(polys: list[Polygon]) -> pa.Table:
    ring_type = pa.list_(
        pa.struct([("lat", pa.float64()), ("lon", pa.float64())])
    )
    rings = [
        [{"lat": float(la), "lon": float(lo)} for la, lo in zip(p.lat, p.lon)]
        for p in polys
    ]
    return pa.table(
        {
            "region_id": pa.array([p.region_id for p in polys]),
            "name": pa.array([p.name for p in polys]),
            "ring": pa.array(rings, type=ring_type),
        }
    )


def make_pois(n: int = 200, seed: int = 42) -> pa.Table:
    """Seeded POIs in the fixture bbox; ~30% clustered inside one tile
    cell to exercise hot-cell handling (FIXTURES.md §7)."""
    rng = np.random.default_rng(seed)
    n_hot = int(n * 0.3)
    n_uni = n - n_hot
    lat = np.concatenate(
        [
            39.0 + rng.uniform(0, 2.0, n_uni),
            40.0001 + rng.uniform(0, 0.004, n_hot),  # one ~1.2 km cell
        ]
    )
    lon = np.concatenate(
        [
            -106.0 + rng.uniform(0, 2.0, n_uni),
            -105.0049 + rng.uniform(0, 0.004, n_hot),
        ]
    )
    cats = np.array(["cafe", "summit", "trailhead", "water"])[
        np.arange(n) % 4
    ]
    return pa.table(
        {
            "poi_id": pa.array([f"poi_{i:06d}" for i in range(n)]),
            "lat": pa.array(lat),
            "lon": pa.array(lon),
            "category": pa.array(cats).dictionary_encode(),
        }
    )


def make_region_grid(n_lat: int = 12, n_lon: int = 24, seed: int = 7) -> list[Polygon]:
    """A world-tiling set of ~n_lat×n_lon seeded convex polygons (the
    admin-boundary-scale polygon corpus for PIP benchmarks — real
    region joins test hundreds of polygons, not a handful)."""
    rng = np.random.default_rng(seed)
    polys: list[Polygon] = []
    dlat = 144.0 / n_lat  # cover [-72, 72]
    dlon = 360.0 / n_lon
    for i in range(n_lat):
        for j in range(n_lon):
            c_lat = -72.0 + (i + 0.5) * dlat
            c_lon = -180.0 + (j + 0.5) * dlon
            n_vert = int(rng.integers(5, 9))
            # evenly-spaced angles with bounded jitter + per-polygon
            # constant radii → an affine circle → always convex CCW
            base = np.arange(n_vert) * (2 * np.pi / n_vert)
            angles = base + rng.uniform(0.05, 0.95, n_vert) * (2 * np.pi / n_vert) * 0.5
            r_lat = dlat * float(rng.uniform(0.3, 0.45))
            r_lon = dlon * float(rng.uniform(0.3, 0.45))
            lat = c_lat + r_lat * np.sin(angles) + 0.0005
            lon = c_lon + r_lon * np.cos(angles) + 0.0005
            p = Polygon(f"grid_{i:02d}_{j:02d}", f"cell {i},{j}", lat=lat, lon=lon)
            if p.is_convex_ccw():
                polys.append(p)
    return polys


# --- the image+caption input table (BASELINE.json input_hint) ----------------

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _image_track(i: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    n = 10 + (i % 20)
    if i % 3 == 0:
        # every third tile is anchored in the fixture-region area so
        # the PIP join always has hits (and its hot cells overlap)
        base_lat = 39.5 + float(rng.uniform(0, 1.0))
        base_lon = -105.5 + float(rng.uniform(0, 1.0))
    else:
        base_lat = -60.0 + float(rng.uniform(0, 120.0))
        base_lon = -170.0 + float(rng.uniform(0, 340.0))
    lat = base_lat + np.cumsum(rng.uniform(-1, 1, n)) * 3e-4
    lon = base_lon + np.cumsum(rng.uniform(-1, 1, n)) * 3e-4
    return lat, lon


def render_tile(
    lat: np.ndarray, lon: np.ndarray, w: int, h: int
) -> tuple[np.ndarray, tuple[float, float, float, float]]:
    """Render a route polyline into a white w×h tile; returns the
    pixel array and the tile's geo bbox (lat_min, lon_min, lat_max,
    lon_max) with 10% padding around the track."""
    pad_lat = (lat.max() - lat.min()) * 0.1 + 1e-5
    pad_lon = (lon.max() - lon.min()) * 0.1 + 1e-5
    lat_min, lat_max = float(lat.min() - pad_lat), float(lat.max() + pad_lat)
    lon_min, lon_max = float(lon.min() - pad_lon), float(lon.max() + pad_lon)
    rgb = np.full((h, w, 3), 255, dtype=np.uint8)
    rows = (lat_max - lat) / (lat_max - lat_min) * h - 0.5
    cols = (lon - lon_min) / (lon_max - lon_min) * w - 0.5
    imaging.draw_polyline(rgb, rows, cols)
    return rgb, (lat_min, lon_min, lat_max, lon_max)


def make_images(n: int = 100, seed: int = 42) -> pa.Table:
    """The Lance-shaped input table (FIXTURES.md §1): PNG for even i,
    the FJPG lossy stub (standing in for JPEG q=90) for odd i; caption
    is the serialized activity descriptor; phash is the aHash of the
    *decoded* pixels."""
    rng = np.random.default_rng(seed)
    rows: dict[str, list] = {k: [] for k in IMAGES_SCHEMA.names}
    for i in range(n):
        w = [64, 128, 256][i % 3]
        lat, lon = _image_track(i, rng)
        rgb, (lat_min, lon_min, lat_max, lon_max) = render_tile(lat, lon, w, w)
        if i % 2 == 0:
            fmt, payload = "png", imaging.encode_png(rgb)
        else:
            fmt, payload = "jpeg", imaging.encode_fake_jpeg(rgb)
        decoded = imaging.decode_image(payload)
        start = _dt.datetime.utcfromtimestamp(
            (BUILDERS_T0 + i * 3_600_000_000) / 1e6
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        caption = (
            f"{SPORTS[i % len(SPORTS)]} {len(lat)}pts {start} "
            f"bbox={lat_min:.6f},{lon_min:.6f},{lat_max:.6f},{lon_max:.6f}"
        )
        rows["image_id"].append(f"img_{i:012d}")
        rows["bytes"].append(payload)
        rows["w"].append(w)
        rows["h"].append(w)
        rows["fmt"].append(fmt)
        rows["caption"].append(caption)
        rows["phash"].append(imaging.ahash64(decoded))
    return pa.table(
        {k: pa.array(v, type=IMAGES_SCHEMA.field(k).type) for k, v in rows.items()},
        schema=IMAGES_SCHEMA,
    )


def parse_caption_bbox(caption: str) -> tuple[float, float, float, float]:
    """Caption descriptor → (lat_min, lon_min, lat_max, lon_max)."""
    bbox = caption.rsplit("bbox=", 1)[1]
    a, b, c, d = (float(x) for x in bbox.split(","))
    return a, b, c, d


def make_geo_images(n: int = 180, seed: int = 11) -> pa.Table:
    """Image table with PLANTED geo-localized near-duplicates for the
    spatial near-dup pipeline (`multimodal.geo_phash_near_dup`).

    Base images are rendered tracks like :func:`make_images` (same
    IMAGES_SCHEMA; bbox in the caption is the geo metadata). Every
    4th base image gets a re-encoded variant (``_v1``: identical
    pixels through the OTHER codec — the real-world "re-upload
    re-compressed" case, so its aHash lands within a few bits), with
    the caption bbox shifted ~0.6 level-15 cells east/west (GPS-tag
    jitter — the variant may land in the NEIGHBOR cell, exercising
    the cross-boundary candidate path). Every 8th base image also
    gets ``_v2`` shifted ~1.2 cells: ≥1 cell from the base (possibly
    2 — then base↔v2 is NOT a candidate pair and the cluster only
    closes transitively through v1). Base centers are spread over a
    ±60° box, ≫ the 0.011° cell, so unrelated images are never
    neighbors."""
    rng = np.random.default_rng(seed)
    cell_w = 360.0 / (1 << 15)  # level-15 cell width in degrees lon
    rows: dict[str, list] = {k: [] for k in IMAGES_SCHEMA.names}

    def emit(image_id: str, rgb: np.ndarray, fmt: str,
             bbox: tuple[float, float, float, float], n_pts: int, i: int) -> None:
        payload = (
            imaging.encode_png(rgb) if fmt == "png" else imaging.encode_fake_jpeg(rgb)
        )
        decoded = imaging.decode_image(payload)
        start = _dt.datetime.utcfromtimestamp(
            (BUILDERS_T0 + i * 3_600_000_000) / 1e6
        ).strftime("%Y-%m-%dT%H:%M:%SZ")
        lat_min, lon_min, lat_max, lon_max = bbox
        caption = (
            f"{SPORTS[i % len(SPORTS)]} {n_pts}pts {start} "
            f"bbox={lat_min:.6f},{lon_min:.6f},{lat_max:.6f},{lon_max:.6f}"
        )
        rows["image_id"].append(image_id)
        rows["bytes"].append(payload)
        rows["w"].append(rgb.shape[1])
        rows["h"].append(rgb.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(caption)
        rows["phash"].append(imaging.ahash64(decoded))

    for i in range(n):
        w = 64
        lat, lon = _image_track(i, rng)
        rgb, (lat_min, lon_min, lat_max, lon_max) = render_tile(lat, lon, w, w)
        fmt = "png" if i % 2 == 0 else "jpeg"
        emit(f"img_{i:012d}", rgb, fmt, (lat_min, lon_min, lat_max, lon_max), len(lat), i)
        if i % 4 == 0:
            other = "jpeg" if fmt == "png" else "png"
            # near-identical pixels (other codec + one aHash block
            # dimmed — a real near-dup, Hamming ≥ 1, not an exact
            # re-encode), bbox nudged ~0.6 cells
            sign = 1.0 if i % 8 == 0 else -1.0
            d1 = sign * 0.6 * cell_w
            decoded = imaging.decode_image(rows["bytes"][-1]).copy()
            bh, bw = decoded.shape[0] // 8, decoded.shape[1] // 8
            decoded[:bh, :bw] = 235  # flips aHash block (0,0)
            emit(
                f"img_{i:012d}_v1", decoded, other,
                (lat_min, lon_min + d1, lat_max, lon_max + d1), len(lat), i,
            )
            if i % 8 == 0:
                d2 = sign * 1.2 * cell_w
                v2 = decoded.copy()
                v2[:bh, bw : 2 * bw] = 235  # second block → one more bit
                emit(
                    f"img_{i:012d}_v2", v2, other,
                    (lat_min, lon_min + d2, lat_max, lon_max + d2), len(lat), i,
                )
    return pa.table(
        {k: pa.array(v, type=IMAGES_SCHEMA.field(k).type) for k, v in rows.items()},
        schema=IMAGES_SCHEMA,
    )
