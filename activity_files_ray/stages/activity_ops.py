"""Activity-level set operations + projections (reference O5/O6,
M18/M19/M20).

* merge (``facade:751-803``): n-way union of activities' collections,
  re-keyed to one activity id, re-sorted chronologically; optional
  per-lap sport stamping.
* split_by_sport (``facade:832-911``): partition one activity into
  per-sport activities by lap time ranges (J3 containment join).
* flattened (``models.dart:1385-1430``): merge additional tracks into
  one chronological track, clearing segment indices.
* lossiness projection (``facade:299-382``): pure function
  (activity stats, target format) → ``lossy.*`` info diagnostics.
* sport inference (``facade:386-404,1012-1093``): registered mapper
  chain (LIFO) + keyword tokens + numeric-id table.
"""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np
import pandas as pd

# --- sport inference (M20) ---------------------------------------------------

_SPORT_KEYWORDS = {
    "run": "running", "running": "running", "jog": "running",
    "ride": "cycling", "bike": "cycling", "biking": "cycling",
    "cycling": "cycling", "cycle": "cycling",
    "swim": "swimming", "swimming": "swimming",
    "hike": "hiking", "hiking": "hiking",
    "walk": "walking", "walking": "walking",
}
# FIT sport enum ids (public FIT profile subset)
_SPORT_IDS = {0: "unknown", 1: "running", 2: "cycling", 5: "swimming",
              11: "walking", 17: "hiking"}

SportMapper = Callable[[object], str | None]
_MAPPERS: list[SportMapper] = []


def register_sport_mapper(fn: SportMapper) -> None:
    """User-extension hook: LIFO mapper chain (facade:27,36,386-398)."""
    _MAPPERS.insert(0, fn)


def clear_sport_mappers() -> None:
    _MAPPERS.clear()


def infer_sport(value: object) -> str:
    """Mapper chain → keyword tokens → numeric ids → recursive descent
    into mappings/iterables (facade:1012-1093 semantics)."""
    for mapper in _MAPPERS:
        got = mapper(value)
        if got:
            return got
    if isinstance(value, str):
        for tok in re.findall(r"\w+", value.lower()):
            if tok in _SPORT_KEYWORDS:
                return _SPORT_KEYWORDS[tok]
            if tok.isdigit() and int(tok) in _SPORT_IDS:
                return _SPORT_IDS[int(tok)]
        return "unknown"
    if isinstance(value, (int, np.integer)):
        return _SPORT_IDS.get(int(value), "unknown")
    if isinstance(value, dict):
        for v in value.values():
            got = infer_sport(v)
            if got != "unknown":
                return got
        return "unknown"
    if isinstance(value, (list, tuple)):
        for v in value:
            got = infer_sport(v)
            if got != "unknown":
                return got
        return "unknown"
    return "unknown"


# --- merge / split / flatten -------------------------------------------------


def merge_activities(
    frames: list[pd.DataFrame], new_id: str = "merged"
) -> pd.DataFrame:
    """O5: union points of several activities under one id, re-sorted
    chronologically; last-wins on exact duplicate timestamps (the
    normalize invariant applies to the merged stream too)."""
    if not frames:
        return pd.DataFrame()
    out = pd.concat(frames, ignore_index=True)
    out["activity_id"] = new_id
    out = out.sort_values("ts_us", kind="mergesort")
    out = out[~out["ts_us"].duplicated(keep="last")].reset_index(drop=True)
    if "seq" in out.columns:
        out["seq"] = np.arange(len(out), dtype=np.int32)
    return out


def merge_full(
    activities: list[dict],
    new_id: str = "merged",
    preserve_sport_per_lap: bool = False,
    normalize: bool = True,
    creator: str | None = None,
) -> dict:
    """O5, full form (``facade:751-803``): n-way union of ALL SIX
    collections — points, channels, laps, sets, events, lengths (the
    four span kinds live in one ``spans`` table here, ``kind`` column)
    — not just points. Each input: ``{"points": df, "channels": df,
    "spans": df, "sport": str|None, "creator": str|None}`` (missing
    tables = empty).

    Reference semantics: sources are flattened first
    (``flattened()``); ``preserve_sport_per_lap`` stamps the SOURCE
    activity's sport onto its laps that lack one, so per-lap sport
    survives a multi-sport merge (``facade:787-792``, exercised by
    ``test/integration/multi_sport_test.dart``); activity-level sport/
    creator/device come from the FIRST source; ``normalize`` applies
    the sort + last-wins-dedup invariant to the merged streams."""
    if not activities:
        raise ValueError(
            "Cannot merge activities: the input list is empty. "
            "Provide at least one activity."
        )

    def _tbl(a: dict, key: str) -> pd.DataFrame:
        t = a.get(key)
        return t if t is not None and len(t) else pd.DataFrame()

    if len(activities) == 1:
        return dict(activities[0])

    pts_frames, ch_frames, span_frames = [], [], []
    for a in activities:
        p = _tbl(a, "points")
        if len(p):
            pts_frames.append(flatten_tracks(p))
        c = _tbl(a, "channels")
        if len(c):
            ch_frames.append(c)
        s = _tbl(a, "spans")
        if len(s):
            s = s.copy()
            if preserve_sport_per_lap and "kind" in s.columns and "sport" in s.columns:
                is_lap = (s["kind"] == "lap").to_numpy()
                no_sport = s["sport"].isna().to_numpy() | (s["sport"] == "").to_numpy()
                s.loc[is_lap & no_sport, "sport"] = a.get("sport")
            span_frames.append(s)

    points = (
        pd.concat(pts_frames, ignore_index=True) if pts_frames else pd.DataFrame()
    )
    if len(points):
        points["activity_id"] = new_id
        if normalize:
            points = points.sort_values("ts_us", kind="mergesort")
            points = points[~points["ts_us"].duplicated(keep="last")]
        points = points.reset_index(drop=True)
        if "seq" in points.columns:
            points["seq"] = np.arange(len(points), dtype=np.int32)

    channels = (
        pd.concat(ch_frames, ignore_index=True) if ch_frames else pd.DataFrame()
    )
    if len(channels):
        channels["activity_id"] = new_id
        if normalize:
            channels = channels.sort_values(
                ["channel", "ts_us"], kind="mergesort"
            )
            channels = channels[
                ~channels.duplicated(["channel", "ts_us"], keep="last")
            ]
        channels = channels.reset_index(drop=True)

    spans = (
        pd.concat(span_frames, ignore_index=True) if span_frames else pd.DataFrame()
    )
    if len(spans):
        spans["activity_id"] = new_id
        spans = spans.reset_index(drop=True)  # source order, like the reference

    first = activities[0]
    return {
        "points": points,
        "channels": channels,
        "spans": spans,
        "sport": first.get("sport"),
        "creator": creator if creator is not None else first.get("creator"),
        "device": first.get("device"),
    }


def split_by_sport_full(
    activity: dict,
    normalize: bool = True,
) -> dict:
    """O6, full form (``facade:832-911``): split one activity into
    per-sport ACTIVITIES — points, channels and laps each filtered to
    the sport's lap time range — not just sport-stamped points
    (:func:`split_by_sport` remains the point-level columnar form).

    Reference semantics: laps without an explicit sport group under
    the activity's overall sport; no laps → whole activity under its
    sport; a single sport → returned as-is; per sport, the time range
    is [min lap start, max lap end] INCLUSIVE on both ends, channels
    that end up empty are dropped, laps are stripped of their sport
    field, activity-level creator/device carry over, and ``normalize``
    re-applies sort + last-wins dedup. Returns {sport: activity dict}.
    """
    points = activity.get("points")
    channels = activity.get("channels")
    spans = activity.get("spans")
    overall = activity.get("sport")
    points = points if points is not None else pd.DataFrame()
    channels = channels if channels is not None else pd.DataFrame()
    spans = spans if spans is not None else pd.DataFrame()
    laps = (
        spans[spans["kind"] == "lap"]
        if len(spans) and "kind" in spans.columns
        else spans
    )
    if not len(laps):
        return {overall: dict(activity)}
    lap_sport = (
        laps["sport"].where(laps["sport"].notna() & (laps["sport"] != ""), overall)
        if "sport" in laps.columns
        else pd.Series([overall] * len(laps), index=laps.index)
    )
    sports = list(dict.fromkeys(lap_sport))
    if len(sports) == 1:
        return {sports[0]: dict(activity)}

    out: dict = {}
    for sport in sports:
        sl = laps[(lap_sport == sport).to_numpy()]
        t0 = int(sl["start_us"].min())
        t1 = int(sl["end_us"].max())
        pts = points
        if len(points):
            m = (points["ts_us"] >= t0) & (points["ts_us"] <= t1)
            pts = points[m].reset_index(drop=True)
            if normalize and len(pts):
                pts = pts.sort_values("ts_us", kind="mergesort")
                pts = pts[~pts["ts_us"].duplicated(keep="last")].reset_index(drop=True)
                if "seq" in pts.columns:
                    pts["seq"] = np.arange(len(pts), dtype=np.int32)
        ch = channels
        if len(channels):
            m = (channels["ts_us"] >= t0) & (channels["ts_us"] <= t1)
            ch = channels[m].reset_index(drop=True)
            if normalize and len(ch):
                ch = ch.sort_values(["channel", "ts_us"], kind="mergesort")
                ch = ch[~ch.duplicated(["channel", "ts_us"], keep="last")]
                ch = ch.reset_index(drop=True)
        # laps keep all metadata but lose their per-lap sport
        # (lap.copyWithoutSport — the split activity owns the sport)
        sl = sl.copy()
        if "sport" in sl.columns:
            sl["sport"] = None
        out[sport] = {
            "points": pts,
            "channels": ch,
            "spans": sl.reset_index(drop=True),
            "sport": sport,
            "creator": activity.get("creator"),
            "device": activity.get("device"),
        }
    return out


def split_by_sport(
    points: pd.DataFrame, spans: pd.DataFrame
) -> pd.DataFrame:
    """O6: stamp each point with the sport of the lap containing it
    (containment join), then re-key activity_id per sport run. Points
    outside every lap keep the original id with sport 'unknown'."""
    ts = points["ts_us"].to_numpy(np.int64)
    sport = np.full(ts.size, "unknown", dtype=object)
    laps = spans[spans["kind"] == "lap"] if "kind" in spans.columns else spans
    for _, r in laps.iterrows():
        m = (ts >= int(r["start_us"])) & (ts <= int(r["end_us"]))
        sp = r.get("sport")
        if isinstance(sp, str) and sp:
            sport[m] = sp
    out = points.copy()
    base = out["activity_id"].iloc[0] if len(out) else ""
    out["sport"] = sport
    out["activity_id"] = [f"{base}#{s}" for s in sport]
    return out.reset_index(drop=True)


def flatten_tracks(points: pd.DataFrame) -> pd.DataFrame:
    """M18: merge multi-segment/multi-track points into one ordered
    track (chronological re-sort, segment boundaries cleared — here:
    the seq column re-numbered globally)."""
    out = points.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
    if "seq" in out.columns:
        out["seq"] = np.arange(len(out), dtype=np.int32)
    return out


# --- lossiness projection (M19) ----------------------------------------------

# format → capabilities (what survives an encode), mirroring the
# reference's per-format feature matrix (facade:299-382)
_FORMAT_CAPS = {
    "gpx": {"points", "channels", "segments", "waypoints", "routes"},
    "tcx": {"points", "channels", "laps", "sports"},
    "fit": {"points", "channels", "laps", "sessions", "events", "sports",
            "sets", "lengths"},
    "csv": {"points", "channels"},
    "geojson": {"points", "channels", "metadata"},
}


def lossy_diagnostics(
    stats: dict, target_fmt: str, activity_id: str = ""
) -> pd.DataFrame:
    """DataFrame wrapper over :func:`lossy_diag_rows`."""
    return pd.DataFrame(
        lossy_diag_rows(stats, target_fmt, activity_id),
        columns=["activity_id", "severity", "code", "message", "path"],
    )


def lossy_diag_rows(
    stats: dict, target_fmt: str, activity_id: str = ""
) -> list[tuple]:
    """Pure projection: activity content stats + target format →
    ``lossy.*`` info diagnostic tuples. ``stats`` keys: n_laps,
    n_events, n_sessions, n_segments, n_waypoints, n_routes
    (missing = 0). Tuple form so per-payload hot paths skip pandas
    construction (the convert kernel's dominant cost)."""
    caps = _FORMAT_CAPS.get(target_fmt, set())
    rows = []

    def note(feature: str, count: int, needs: str):
        if count > 0 and needs not in caps:
            rows.append(
                (
                    activity_id, "info", f"lossy.{feature}_dropped",
                    f"{count} {feature} not representable in {target_fmt}",
                    feature,
                )
            )

    note("laps", int(stats.get("n_laps", 0)), "laps")
    note("events", int(stats.get("n_events", 0)), "events")
    note("sessions", int(stats.get("n_sessions", 0)), "sessions")
    note("sets", int(stats.get("n_sets", 0)), "sets")
    note("lengths", int(stats.get("n_lengths", 0)), "lengths")
    note("waypoints", int(stats.get("n_waypoints", 0)), "waypoints")
    note("routes", int(stats.get("n_routes", 0)), "routes")
    if int(stats.get("n_segments", 0)) > 1 and "segments" not in caps:
        rows.append(
            (
                activity_id, "info", "lossy.tracks_flattened",
                f"{stats['n_segments']} segments flattened into one in {target_fmt}",
                "segments",
            )
        )
    return rows
