"""Whole-activity JSON (de)serialization — the analog of the
reference's isolate-transport serialization
(``/root/reference/lib/src/api/export_serialization.dart:12-358``,
``activityToJson`` / ``activityFromJson``).

In the Ray engine the WIRE format between stages is Arrow (columnar
tables through the object store), so this surface exists for the
same reasons the reference's does: handing a complete parsed
activity across a process/API boundary as one self-contained JSON
document (CLI output, HTTP payloads, golden files). Round-trip is
lossless for every field the model carries (points incl. the open
``ext`` trees, channels, spans incl. stat columns and FIT extras,
waypoints/routes, metadata, diagnostics).
"""

from __future__ import annotations

import json
import math

from .model import ParsedActivity

_SCHEMA_VERSION = 1


def _nan_to_none(v):
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def activity_to_json(parsed: ParsedActivity) -> dict:
    """ParsedActivity → plain-JSON-safe dict (NaN → null; stable key
    order within each record)."""
    return {
        "schema_version": _SCHEMA_VERSION,
        "activity_id": parsed.activity_id,
        "sport": parsed.sport,
        "creator": parsed.creator,
        "name": parsed.name,
        "metadata": dict(parsed.metadata),
        "points": {
            "ts_us": [int(t) for t in parsed.ts_us],
            "lat": [float(v) for v in parsed.lat],
            "lon": [float(v) for v in parsed.lon],
            "ele": [_nan_to_none(None if e is None else float(e)) for e in parsed.ele],
        },
        "segment_starts": [int(i) for i in parsed.segment_starts],
        "point_ext": {str(k): v for k, v in parsed.point_ext.items()},
        "point_attrs": {str(k): v for k, v in parsed.point_attrs.items()},
        "channels": {
            "name": list(parsed.ch_name),
            "ts_us": [int(t) for t in parsed.ch_ts_us],
            "value": [float(v) for v in parsed.ch_value],
        },
        "spans": [
            {
                "kind": parsed.span_kind[i],
                "start_us": int(parsed.span_start_us[i]),
                "end_us": int(parsed.span_end_us[i]),
                "sport": parsed.span_sport[i],
                "dist_m": _nan_to_none(
                    None
                    if parsed.span_dist_m[i] is None
                    else float(parsed.span_dist_m[i])
                ),
                "stats": _stats_to_json(
                    parsed.span_stats[i] if i < len(parsed.span_stats) else {}
                ),
            }
            for i in range(len(parsed.span_kind))
        ],
        "waypoints": list(parsed.waypoints),
        "routes": list(parsed.routes),
        "n_waypoints": parsed.n_waypoints,
        "n_routes": parsed.n_routes,
        "diagnostics": [list(d) for d in parsed.diags],
    }


def _stats_to_json(stats: dict) -> dict:
    out = {}
    for k, v in (stats or {}).items():
        if k in ("extra_fields", "extra_arrays"):
            out[k] = {str(n): v2 for n, v2 in v.items()}
        else:
            out[k] = _nan_to_none(float(v))
    return out


def _stats_from_json(d: dict) -> dict:
    out = {}
    for k, v in (d or {}).items():
        if k in ("extra_fields", "extra_arrays"):
            out[k] = {int(n): v2 for n, v2 in v.items()}
        elif v is not None:
            out[k] = float(v)
    return out


def activity_from_json(data: dict) -> ParsedActivity:
    """Inverse of :func:`activity_to_json` (export_serialization.dart:60
    analog); tolerant of missing optional sections."""
    out = ParsedActivity(str(data.get("activity_id", "")))
    out.sport = data.get("sport")
    out.creator = data.get("creator")
    out.name = data.get("name")
    out.metadata = dict(data.get("metadata") or {})
    pts = data.get("points") or {}
    out.ts_us = [int(t) for t in pts.get("ts_us", [])]
    out.lat = [float(v) for v in pts.get("lat", [])]
    out.lon = [float(v) for v in pts.get("lon", [])]
    out.ele = [None if e is None else float(e) for e in pts.get("ele", [])]
    out.segment_starts = [int(i) for i in data.get("segment_starts", [])]
    out.point_ext = {int(k): v for k, v in (data.get("point_ext") or {}).items()}
    out.point_attrs = {int(k): v for k, v in (data.get("point_attrs") or {}).items()}
    ch = data.get("channels") or {}
    out.ch_name = list(ch.get("name", []))
    out.ch_ts_us = [int(t) for t in ch.get("ts_us", [])]
    out.ch_value = [float(v) for v in ch.get("value", [])]
    for sp in data.get("spans", []):
        out.span_kind.append(sp["kind"])
        out.span_start_us.append(int(sp["start_us"]))
        out.span_end_us.append(int(sp["end_us"]))
        out.span_sport.append(sp.get("sport"))
        d = sp.get("dist_m")
        out.span_dist_m.append(None if d is None else float(d))
        out.span_stats.append(_stats_from_json(sp.get("stats")))
    out.waypoints = list(data.get("waypoints", []))
    out.routes = list(data.get("routes", []))
    out.n_waypoints = int(data.get("n_waypoints", 0))
    out.n_routes = int(data.get("n_routes", 0))
    out.diags = [tuple(d) for d in data.get("diagnostics", [])]
    return out


def dumps(parsed: ParsedActivity) -> str:
    return json.dumps(activity_to_json(parsed), sort_keys=True, allow_nan=False)


def loads(s: str) -> ParsedActivity:
    return activity_from_json(json.loads(s))
