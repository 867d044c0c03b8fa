"""GeoJSON parser + encoder kernels.

Semantics from the reference (``/root/reference/lib/src/parse/
geojson_parser.dart:18-545``, encoder ``lib/src/encode/
geojson_encoder.dart:12-126``), re-implemented from RFC 7946:

* Feature / FeatureCollection; LineString (and MultiLineString /
  Polygon exterior ring) as the track; Point-collection mode when the
  collection is all Points (geojson_parser.dart:101-161).
* ``properties.coordinateProperties.times`` supplies per-coordinate
  timestamps (geojson_parser.dart:370-379).
* numeric per-feature properties → channels (``:504-519``); scalar
  string properties → metadata (``:356-366``).
* Encoder: LineString feature + computed properties (start_time,
  duration); preserved metadata wins over computed values
  (geojson_encoder.dart:78-82); ``coordinateProperties.times``
  regenerated (``:83-88``).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from .model import ParsedActivity, iso_to_us, us_to_iso

_CH_RENAME = {"heartrate": "heart_rate", "hr": "heart_rate"}

# numeric properties under these keys stay metadata-only; every OTHER
# numeric property becomes a channel sample (custom channels for
# unknown names — geojson_parser.dart:483-516)
_META_PROP_KEYS = frozenset({
    "timestamp", "altitude", "activity_type", "start_time", "duration",
    "total_calories", "total_steps", "num_laps", "avg_heart_rate",
    "max_heart_rate", "device_manufacturer", "coordinateProperties",
    "duration_s",  # this encoder's computed duration property
})


def _collect_channel_samples(ts: int, props: dict, out: ParsedActivity) -> None:
    for k, v in props.items():
        if (
            not isinstance(v, (int, float))
            or isinstance(v, bool)
            or not isinstance(k, str)
            or k in _META_PROP_KEYS
        ):
            continue
        kl = k.strip().lower()
        out.add_sample(_CH_RENAME.get(kl, kl), ts, float(v))


def parse_geojson(data: bytes, activity_id: str) -> ParsedActivity:
    out = ParsedActivity(activity_id)
    try:
        obj = json.loads(data)
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        out.diag("error", "geojson.parse.invalid_json", str(e), "")
        return out
    t = obj.get("type") if isinstance(obj, dict) else None
    if t == "FeatureCollection":
        feats = obj.get("features", [])
        if feats and all(
            isinstance(f, dict)
            and (f.get("geometry") or {}).get("type") == "Point"
            for f in feats
        ):
            _parse_point_collection(feats, out)
        else:
            for i, f in enumerate(feats):
                _parse_feature(f, out, f"features[{i}]")
    elif t == "Feature":
        _parse_feature(obj, out, "feature")
    elif t in ("LineString", "MultiLineString", "Polygon", "Point"):
        _parse_geometry(obj, {}, out, "geometry")
    else:
        out.diag("error", "geojson.parse.unsupported_root", str(t), "")
    return out


def _parse_point_collection(feats: list, out: ParsedActivity) -> None:
    """All-Points mode: each feature is one trackpoint; numeric
    properties become channel samples."""
    for i, f in enumerate(feats):
        coords = (f.get("geometry") or {}).get("coordinates") or []
        props = f.get("properties") or {}
        raw_time = props.get("time") or props.get("timestamp")
        ts = iso_to_us(str(raw_time)) if raw_time else None
        if len(coords) < 2 or ts is None:
            out.diag(
                "warning", "geojson.point.skipped",
                "point without coordinates/time", f"features[{i}]",
            )
            continue
        ele = float(coords[2]) if len(coords) > 2 else None
        out.add_point(ts, float(coords[1]), float(coords[0]), ele)
        _collect_channel_samples(ts, props, out)
        at = props.get("activity_type")
        if out.sport is None and isinstance(at, str):
            out.sport = at.strip().lower()


def _parse_feature(f: dict, out: ParsedActivity, path: str) -> None:
    geom = f.get("geometry")
    props = f.get("properties") or {}
    if not isinstance(geom, dict):
        out.diag("warning", "geojson.feature.no_geometry", "skipped", path)
        return
    _parse_geometry(geom, props, out, path)


def _parse_geometry(geom: dict, props: dict, out: ParsedActivity, path: str) -> None:
    gtype = geom.get("type")
    if gtype == "LineString":
        rings = [geom.get("coordinates") or []]
    elif gtype == "MultiLineString":
        rings = geom.get("coordinates") or []
    elif gtype == "Polygon":
        rings = (geom.get("coordinates") or [])[:1]  # exterior only
    elif gtype == "Point":
        rings = [[geom.get("coordinates") or []]]
    else:
        out.diag("warning", "geojson.geometry.unsupported", str(gtype), path)
        return
    times = (props.get("coordinateProperties") or {}).get("times")
    # ALL scalar props → metadata with their JSON types preserved
    # (string/int/float/bool — geojson_parser.dart:358-366); sport
    # hint from the usual keys incl. activity_type
    for k, v in props.items():
        if k == "coordinateProperties":
            continue
        if v is None or isinstance(v, (dict, list)):
            continue
        out.metadata[str(k)] = v
        if isinstance(v, str) and str(k).lower() in (
            "sport", "type", "activity", "activity_type"
        ):
            out.sport = v.strip().lower()
    # shared per-feature timestamp (properties.timestamp); invalid →
    # epoch fallback with a diagnostic (geojson_parser.dart:386-403)
    shared_ts = None
    raw_ts = props.get("timestamp")
    if raw_ts is not None:
        shared_ts = iso_to_us(str(raw_ts))
        if shared_ts is None:
            out.diag(
                "warning", "geojson.point.invalid_timestamp",
                "properties.timestamp is not a date; epoch fallback", path,
            )
    if gtype == "Polygon" and len(geom.get("coordinates") or []) > 1:
        n_holes = len(geom["coordinates"]) - 1
        out.diag(
            "warning", "geojson.polygon_holes_dropped",
            f"{n_holes} interior ring(s) not representable as a track", path,
        )
    flat_idx = 0
    for ring in rings:
        seg_start = len(out.ts_us)
        added = False
        for c in ring:
            if not isinstance(c, (list, tuple)) or len(c) < 2:
                out.diag(
                    "warning", "geojson.point.invalid",
                    "coordinate not [lon, lat, ...]", f"{path}[{flat_idx}]",
                )
                flat_idx += 1
                continue
            ts = None
            if isinstance(times, list) and flat_idx < len(times):
                ts = iso_to_us(str(times[flat_idx]))
            if ts is None:
                ts = shared_ts
            if ts is None:
                # timeless geometry keeps its points with the epoch
                # fallback (geojson_parser.dart:7-10,410-411) rather
                # than dropping the track
                ts = 0
            ele = float(c[2]) if len(c) > 2 else None
            out.add_point(ts, float(c[1]), float(c[0]), ele)
            _collect_channel_samples(ts, props, out)
            added = True
            flat_idx += 1
        if added:
            out.segment_starts.append(seg_start)


def encode_geojson(
    points: pd.DataFrame,
    channels: pd.DataFrame | None = None,
    metadata: dict | None = None,
    mode: str = "linestring",
) -> bytes:
    """points → GeoJSON bytes. ``linestring`` mode emits one Feature
    with coordinateProperties.times (+ computed start_time/duration,
    preserved metadata winning, geojson_encoder.dart:78-88);
    ``points`` mode emits one Point feature per trackpoint with
    exact-timestamp channel values (encoder_utils.dart:9-19)."""
    ts = points["ts_us"].to_numpy(np.int64)
    lat = points["lat"].to_numpy(np.float64)
    lon = points["lon"].to_numpy(np.float64)
    ele = (
        points["ele"].to_numpy(np.float64)
        if "ele" in points
        else np.full(ts.size, np.nan)
    )
    meta = dict(metadata or {})
    if mode == "points":
        feats = []
        ch_by_ts: dict[str, dict[int, float]] = {}
        if channels is not None and len(channels):
            for ch, g in channels.groupby("channel", observed=True):
                # exact-timestamp join, last wins (encoder_utils.dart:9-19)
                ch_by_ts[str(ch)] = dict(
                    zip(g["ts_us"].astype("int64"), g["value"].astype(float))
                )
        for i in range(ts.size):
            coords = [lon[i], lat[i]] + ([ele[i]] if np.isfinite(ele[i]) else [])
            props: dict = {"time": us_to_iso(int(ts[i]))}
            for ch in sorted(ch_by_ts):
                v = ch_by_ts[ch].get(int(ts[i]))
                if v is not None:
                    props[ch] = v
            feats.append(
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": coords},
                    "properties": props,
                }
            )
        doc: dict = {"type": "FeatureCollection", "features": feats}
    else:
        coords = [
            [lon[i], lat[i]] + ([ele[i]] if np.isfinite(ele[i]) else [])
            for i in range(ts.size)
        ]
        props = {
            "coordinateProperties": {"times": [us_to_iso(int(t)) for t in ts]},
        }
        computed = {}
        if ts.size:
            computed["start_time"] = us_to_iso(int(ts[0]))
            computed["duration_s"] = float((ts[-1] - ts[0]) / 1e6)
        # preserved metadata wins over computed (geojson_encoder.dart:78-82)
        props.update({**computed, **meta})
        doc = {
            "type": "Feature",
            "geometry": {"type": "LineString", "coordinates": coords},
            "properties": props,
        }
    return json.dumps(doc, separators=(",", ":"), sort_keys=False).encode()
