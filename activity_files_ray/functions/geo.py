"""Vectorized geodesy kernels.

Semantics mirror the reference's scalar helpers (all citations are
into /root/reference):

* haversine: ``lib/src/geo_math.dart:8-20`` — spherical earth,
  R = 6371.0 km, great-circle meters.
* semicircles↔degrees: ``lib/src/parse/fit_parser.dart:1232-1248`` and
  ``lib/src/encode/fit_encoder.dart:554-559`` — degrees = sc × 180 / 2^31.
* FIT altitude: ``lib/src/parse/fit_parser.dart:1334-1343`` —
  meters = raw / 5 − 500 (encode is the inverse,
  ``fit_encoder.dart:623-635``).
* FIT scale/offset families: ``fit_parser.dart:1345-1365``.

Everything here is a pure numpy kernel over float64/int arrays so it
can run inside ``map_batches`` on zero-copy Arrow columns.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_000.0  # reference uses R=6371 km (geo_math.dart:9)
SEMICIRCLE_TO_DEG = 180.0 / 2_147_483_648.0  # 180 / 2^31

# FIT epoch: seconds since 1989-12-31T00:00:00Z (fit_parser.dart:1213-1230)
FIT_EPOCH_UNIX_S = 631_065_600


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters between coordinate arrays.

    Vectorized equivalent of ``geo_math.dart:8-20``.
    """
    lat1r = np.radians(np.asarray(lat1, dtype=np.float64))
    lat2r = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2r - lat1r
    dlon = np.radians(np.asarray(lon2, dtype=np.float64)) - np.radians(
        np.asarray(lon1, dtype=np.float64)
    )
    a = (
        np.sin(dlat * 0.5) ** 2
        + np.cos(lat1r) * np.cos(lat2r) * np.sin(dlon * 0.5) ** 2
    )
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def cumulative_distance_m(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Cumulative haversine distance along an ordered track.

    Mirrors ``raw_editor.dart:656-671`` / ``raw_transforms.dart:73-90``:
    element 0 is 0.0; element i is the running sum of pairwise
    haversine distances.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    if lat.size == 0:
        return np.zeros(0, dtype=np.float64)
    seg = haversine_m(lat[:-1], lon[:-1], lat[1:], lon[1:])
    out = np.empty(lat.size, dtype=np.float64)
    out[0] = 0.0
    np.cumsum(seg, out=out[1:])
    return out


def segment_speed_mps(dist_m: np.ndarray, ts_us: np.ndarray) -> np.ndarray:
    """Per-segment speed: Δdistance / Δtime, 0 where Δt ≤ 0.

    Mirrors ``raw_editor.dart:672-679`` (speed of point i computed
    from segment (i-1, i); first point gets 0).
    """
    dist_m = np.asarray(dist_m, dtype=np.float64)
    ts_s = np.asarray(ts_us, dtype=np.int64).astype(np.float64) * 1e-6
    out = np.zeros(dist_m.size, dtype=np.float64)
    if dist_m.size < 2:
        return out
    dt = ts_s[1:] - ts_s[:-1]
    dd = dist_m[1:] - dist_m[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sp = np.where(dt > 0.0, dd / np.where(dt > 0.0, dt, 1.0), 0.0)
    out[1:] = sp
    return out


def semicircles_to_degrees(sc: np.ndarray) -> np.ndarray:
    """FIT semicircles → degrees (fit_parser.dart:1232-1248)."""
    return np.asarray(sc, dtype=np.float64) * SEMICIRCLE_TO_DEG


def degrees_to_semicircles(deg: np.ndarray) -> np.ndarray:
    """Degrees → FIT semicircles, rounded to nearest int32
    (fit_encoder.dart:554-559)."""
    return np.round(
        np.asarray(deg, dtype=np.float64) / SEMICIRCLE_TO_DEG
    ).astype(np.int64)


def fit_altitude_to_m(raw: np.ndarray) -> np.ndarray:
    """FIT enhanced-altitude raw → meters: raw/5 − 500
    (fit_parser.dart:1334-1343)."""
    return np.asarray(raw, dtype=np.float64) / 5.0 - 500.0


def m_to_fit_altitude(m: np.ndarray) -> np.ndarray:
    """Meters → FIT raw altitude (fit_encoder.dart:623-635)."""
    return np.round((np.asarray(m, dtype=np.float64) + 500.0) * 5.0).astype(
        np.int64
    )


def fit_ts_to_unix_us(fit_seconds: np.ndarray) -> np.ndarray:
    """FIT timestamp (s since 1989-12-31) → unix microseconds."""
    return (
        np.asarray(fit_seconds, dtype=np.int64) + FIT_EPOCH_UNIX_S
    ) * 1_000_000


def unix_us_to_fit_ts(ts_us: np.ndarray) -> np.ndarray:
    """Unix microseconds → FIT timestamp seconds (floor division)."""
    return np.asarray(ts_us, dtype=np.int64) // 1_000_000 - FIT_EPOCH_UNIX_S
