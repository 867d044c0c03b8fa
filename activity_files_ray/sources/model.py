"""The parse-result interchange shape shared by all format kernels.

Mirrors the reference's ``ActivityParseResult`` (``/root/reference/
lib/src/parse/parse_result.dart:188-236``): parsed content + a
diagnostics list; parsers NEVER throw on malformed content — errors
become diagnostics (§7.1 invariant 1).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

EPOCH = _dt.datetime(1970, 1, 1)

# Fixed per-span stat columns (float64, NaN = absent). Mirrors the
# reference's dedicated Lap / ActivitySummary properties
# (models.dart:560-700,732-860): HR/cadence/power/speed stats, swim
# metrics, FIT event ids, strength-set fields. Open-ended FIT extras
# ride in the JSON columns ``extra_fields`` / ``extra_arrays``.
SPAN_STAT_COLS = (
    "calories", "avg_hr", "max_hr", "reps", "weight_kg",
    "avg_speed", "max_speed", "avg_cadence", "max_cadence",
    "avg_power", "max_power", "event", "event_type",
    "num_active_lengths", "swim_stroke",
    "timer_time_s", "pool_length_m", "avg_stroke_count",
    "sub_sport", "total_cycles",
    # length/set kinds (SwimLength/WorkoutSet, models.dart:365-540):
    # is_active = length_type!=0 / set_type!=0; category = exercise id
    "total_strokes", "is_active", "category",
)


def dumps_extras(extras: dict | None) -> str | None:
    """{field_num: scalar-or-list} → canonical JSON (sorted int keys)
    or None when empty — the wire form of the reference's
    extraFitFields / extraFitArrays maps (models.dart:632-637)."""
    import json

    if not extras:
        return None
    return json.dumps(
        {str(int(k)): v for k, v in sorted(extras.items())}, separators=(",", ":")
    )


def loads_extras(s) -> dict:
    """JSON extras column → {int field_num: value}; tolerant of
    None/NaN/empty."""
    import json

    if s is None or (isinstance(s, float)) or not s:
        return {}
    try:
        return {int(k): v for k, v in json.loads(s).items()}
    except (ValueError, TypeError):
        return {}


def iso_to_us(s: str) -> int | None:
    """Lenient ISO-8601 → unix µs, always UTC-normalized (the
    reference calls .toUtc() on every parsed time, models.dart:280)."""
    if not s:
        return None
    s = s.strip()
    try:
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        dt = _dt.datetime.fromisoformat(s)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    td = dt - EPOCH
    # exact integer microseconds — total_seconds() is a float and
    # loses the last microsecond (found by hypothesis round-trip)
    return td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds


def us_to_iso(ts_us: int) -> str:
    dt = EPOCH + _dt.timedelta(microseconds=int(ts_us))
    if ts_us % 1_000_000 == 0:
        return dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0") + "Z"


def _json_dumps_sorted(d: dict) -> str:
    import json

    return json.dumps(d, sort_keys=True, separators=(",", ":"))


@dataclass
class ParsedActivity:
    """One payload's parse output, columnar-ready."""

    activity_id: str
    # points: parallel lists
    ts_us: list = field(default_factory=list)
    lat: list = field(default_factory=list)
    lon: list = field(default_factory=list)
    ele: list = field(default_factory=list)  # None allowed
    segment_starts: list = field(default_factory=list)  # point indices
    # channels: long form
    ch_name: list = field(default_factory=list)
    ch_ts_us: list = field(default_factory=list)
    ch_value: list = field(default_factory=list)
    # spans (laps etc.)
    span_kind: list = field(default_factory=list)
    span_start_us: list = field(default_factory=list)
    span_end_us: list = field(default_factory=list)
    span_sport: list = field(default_factory=list)
    span_dist_m: list = field(default_factory=list)  # None allowed
    span_stats: list = field(default_factory=list)  # dict per span (may lag; padded)
    # activity-level
    sport: str | None = None
    creator: str | None = None
    name: str | None = None
    metadata: dict = field(default_factory=dict)
    n_waypoints: int = 0
    n_routes: int = 0
    # lossless GPX extras: waypoints [{lat, lon, ele?, time_us?, name?}],
    # routes [{name?, points: [{lat, lon, ele?}]}] (models.dart:324-353)
    waypoints: list = field(default_factory=list)
    routes: list = field(default_factory=list)
    # point index → JSON of foreign extension-node trees (the open
    # ``ext`` column, SURVEY §1.2)
    point_ext: dict = field(default_factory=dict)
    # point index → {standard GPX child element: raw text} (hdop/sat/
    # fix/name/sym/…, gpx_parser.dart:14-31 gpxAttributes analog)
    point_attrs: dict = field(default_factory=dict)
    # diagnostics: (severity, code, message, path)
    diags: list = field(default_factory=list)

    def diag(self, severity: str, code: str, message: str, path: str = "") -> None:
        self.diags.append((severity, code, message, path))

    def add_point(self, ts_us, lat, lon, ele=None) -> None:
        self.ts_us.append(ts_us)
        self.lat.append(lat)
        self.lon.append(lon)
        self.ele.append(ele)

    def add_sample(self, name: str, ts_us, value: float) -> None:
        # channel-id normalization: trim + lowercase (models.dart:262)
        self.ch_name.append(name.strip().lower())
        self.ch_ts_us.append(ts_us)
        self.ch_value.append(float(value))

    def points_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "activity_id": self.activity_id,
                "seq": np.arange(len(self.ts_us), dtype=np.int32),
                "ts_us": np.asarray(self.ts_us, dtype=np.int64)
                if self.ts_us
                else np.array([], dtype=np.int64),
                "lat": np.asarray(self.lat, dtype=np.float64),
                "lon": np.asarray(self.lon, dtype=np.float64),
                "ele": np.asarray(
                    [np.nan if e is None else e for e in self.ele], dtype=np.float64
                ),
                "ext": [self.point_ext.get(i) for i in range(len(self.ts_us))],
                "attrs": [
                    (_json_dumps_sorted(self.point_attrs[i])
                     if i in self.point_attrs else None)
                    for i in range(len(self.ts_us))
                ],
            }
        )

    def channels_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "activity_id": self.activity_id,
                "channel": self.ch_name,
                "ts_us": np.asarray(self.ch_ts_us, dtype=np.int64)
                if self.ch_ts_us
                else np.array([], dtype=np.int64),
                "value": np.asarray(self.ch_value, dtype=np.float64),
            }
        )

    def spans_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "activity_id": self.activity_id,
                "kind": self.span_kind,
                "start_us": np.asarray(self.span_start_us, dtype=np.int64)
                if self.span_start_us
                else np.array([], dtype=np.int64),
                "end_us": np.asarray(self.span_end_us, dtype=np.int64)
                if self.span_end_us
                else np.array([], dtype=np.int64),
                "sport": self.span_sport,
                "dist_m": np.asarray(
                    [np.nan if d is None else d for d in self.span_dist_m],
                    dtype=np.float64,
                ),
                **{
                    col: np.asarray(
                        [
                            (self.span_stats[i].get(col) if i < len(self.span_stats) and self.span_stats[i] else np.nan)
                            for i in range(len(self.span_kind))
                        ],
                        dtype=np.float64,
                    )
                    for col in SPAN_STAT_COLS
                },
                # open FIT extras (lossless round-trip of unmodeled
                # lap/session fields): canonical JSON or None
                **{
                    col: [
                        dumps_extras(
                            self.span_stats[i].get(col)
                            if i < len(self.span_stats) and self.span_stats[i]
                            else None
                        )
                        for i in range(len(self.span_kind))
                    ]
                    for col in ("extra_fields", "extra_arrays")
                },
                # TCX lap strings (models.dart tcxIntensity /
                # tcxTriggerMethod): nullable object columns
                **{
                    col: [
                        (self.span_stats[i].get(col)
                         if i < len(self.span_stats) and self.span_stats[i]
                         else None)
                        for i in range(len(self.span_kind))
                    ]
                    for col in ("tcx_intensity", "tcx_trigger_method")
                },
            }
        )

    def diags_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            self.diags, columns=["severity", "code", "message", "path"]
        ).assign(activity_id=self.activity_id)[
            ["activity_id", "severity", "code", "message", "path"]
        ]
