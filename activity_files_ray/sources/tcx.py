"""TCX parser + encoder kernels.

Semantics from the reference (``/root/reference/lib/src/parse/
tcx_parser.dart:27-426``, encoder ``lib/src/encode/tcx_encoder.dart:
14-553``), re-implemented from the public Garmin
TrainingCenterDatabase v2 schema:

* multiple ``<Activity>`` elements merge into one activity with
  per-lap sport preserved (tcx_parser.dart:71-124).
* Lap stats: TotalTimeSeconds, DistanceMeters, Calories, AvgHeartRate,
  MaxHeartRate, incl. LX extensions (``:146-177``).
* Trackpoint: Time, Position, AltitudeMeters, DistanceMeters,
  HeartRateBpm/Value, Cadence; TPX Speed/Watts/RunCadence
  (``:342-364``); Creator name (``:448-520``).
* Encoder: laps re-grouped into one ``<Activity>`` per consecutive
  same-sport run (tcx_encoder.dart:457-468,93-101); a synthetic lap
  covering all points when none exist (``:37-46``); per-point channel
  values joined with the per-channel-tolerance as-of join
  (``:47-62,192-230``).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

from .gpx import DEFAULT_TOLERANCE_US, nearest_join
from .model import ParsedActivity, iso_to_us, us_to_iso

# tcx_parser.dart:16-25 alias map; unknown labels fall through as
# their lowercased raw value (reference falls back to sport mappers)
_TCX_SPORTS = {
    "running": "running",
    "biking": "cycling",
    "cycling": "cycling",
    "bike": "cycling",
    "swimming": "swimming",
    "swim": "swimming",
    "walking": "walking",
    "other": "other",
}
# tcx_encoder.dart:440-445: Running/Biking/Walking are the named TCX
# sports; everything else (incl. swimming) encodes as "Other"
_SPORT_TO_TCX = {"running": "Running", "cycling": "Biking", "walking": "Walking"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xml_escape(s: str) -> str:
    from xml.sax.saxutils import escape

    return escape(s)


def parse_tcx(data: bytes, activity_id: str) -> ParsedActivity:
    out = ParsedActivity(activity_id)
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, LookupError, ValueError) as e:
        # LookupError: corrupted encoding= declaration (fuzz-found)
        out.diag("error", "tcx.parse.invalid_xml", str(e), "")
        return out
    if _local(root.tag) != "TrainingCenterDatabase":
        out.diag("error", "tcx.parse.not_tcx", f"root {root.tag}", "")
        return out
    n_activities = 0
    for acts in root.iter():
        if _local(acts.tag) == "Activity":
            n_activities += 1
            _parse_activity(acts, out)
        elif _local(acts.tag) == "Creator" and out.creator is None:
            for c in acts:
                if _local(c.tag) == "Name" and c.text:
                    out.creator = c.text
        elif _local(acts.tag) == "Author" and "tcx_author" not in out.metadata:
            # <Author> lives at the TrainingCenterDatabase root
            # (tcx_parser.dart:87-91); first Name wins
            for c in acts:
                if _local(c.tag) == "Name" and c.text:
                    out.metadata["tcx_author"] = c.text
    if n_activities > 1:
        # merged into one activity with sport-specific laps, re-split
        # by sport on encode (tcx_parser.dart:93-105)
        out.diag(
            "info", "tcx.multi_activity",
            f"Multi-activity TCX file ({n_activities} activities) merged "
            "into one activity with sport-specific laps", "tcx.activities",
        )
    return out


def _parse_activity(act, out: ParsedActivity) -> None:
    sport_raw = (act.get("Sport") or "").strip().lower()
    sport = _TCX_SPORTS.get(sport_raw, sport_raw or None)
    if out.sport is None:
        out.sport = sport
    for child in act:
        loc = _local(child.tag)
        if loc == "Lap":
            _parse_lap(child, sport, out)
        elif loc == "Creator":
            for c in child:
                if _local(c.tag) == "Name" and c.text:
                    out.creator = c.text
        elif (
            loc == "Notes" and child.text and "tcx_notes" not in out.metadata
        ):
            # first activity's Notes wins (tcx_parser.dart:112 `??=`)
            out.metadata["tcx_notes"] = child.text


def _parse_lap(lap, sport: str | None, out: ParsedActivity) -> None:
    start = iso_to_us(lap.get("StartTime") or "")
    total_s = None
    dist = None
    stats: dict = {}
    for child in lap:
        loc = _local(child.tag)
        if loc == "TotalTimeSeconds" and child.text:
            try:
                total_s = float(child.text)
            except ValueError:
                pass
        elif loc == "DistanceMeters" and child.text:
            try:
                dist = float(child.text)
            except ValueError:
                pass
        elif loc == "Calories" and child.text:
            try:
                stats["calories"] = float(child.text)
            except ValueError:
                pass
        elif loc == "Intensity" and child.text:
            stats["tcx_intensity"] = child.text.strip()
        elif loc == "TriggerMethod" and child.text:
            stats["tcx_trigger_method"] = child.text.strip()
        elif loc in ("AverageHeartRateBpm", "MaximumHeartRateBpm"):
            for v in child:
                if _local(v.tag) == "Value" and v.text:
                    try:
                        key = "avg_hr" if loc.startswith("Average") else "max_hr"
                        stats[key] = float(v.text)
                    except ValueError:
                        pass
        elif loc == "Track":
            seg_start = len(out.ts_us)
            n0 = len(out.ts_us)
            for tp in child:
                if _local(tp.tag) == "Trackpoint":
                    _parse_trackpoint(tp, out)
            if len(out.ts_us) > n0:
                out.segment_starts.append(seg_start)
    if start is not None:
        end = start + int((total_s or 0.0) * 1e6)
        while len(out.span_stats) < len(out.span_kind):
            out.span_stats.append({})
        out.span_kind.append("lap")
        out.span_start_us.append(start)
        out.span_end_us.append(end)
        out.span_sport.append(sport)
        out.span_dist_m.append(dist)
        out.span_stats.append(stats)
    else:
        out.diag("warning", "tcx.lap.missing_start", "lap without StartTime", "laps")


def _parse_trackpoint(tp, out: ParsedActivity) -> None:
    ts = None
    lat = lon = ele = None
    samples: list[tuple[str, float]] = []
    for c in tp:
        loc = _local(c.tag)
        if loc == "Time" and c.text:
            ts = iso_to_us(c.text)
        elif loc == "Position":
            for p in c:
                pl = _local(p.tag)
                try:
                    if pl == "LatitudeDegrees" and p.text:
                        lat = float(p.text)
                    elif pl == "LongitudeDegrees" and p.text:
                        lon = float(p.text)
                except ValueError:
                    pass
        elif loc == "AltitudeMeters" and c.text:
            try:
                ele = float(c.text)
            except ValueError:
                pass
        elif loc == "DistanceMeters" and c.text:
            try:
                samples.append(("distance", float(c.text)))
            except ValueError:
                pass
        elif loc == "HeartRateBpm":
            for v in c:
                if _local(v.tag) == "Value" and v.text:
                    try:
                        samples.append(("heart_rate", float(v.text)))
                    except ValueError:
                        pass
        elif loc == "Cadence" and c.text:
            try:
                samples.append(("cadence", float(c.text)))
            except ValueError:
                pass
        elif loc == "Extensions":
            for tpx in c.iter():
                tl = _local(tpx.tag)
                name = {"Speed": "speed", "Watts": "power", "RunCadence": "cadence"}.get(tl)
                if name and tpx.text:
                    try:
                        samples.append((name, float(tpx.text)))
                    except ValueError:
                        pass
    if ts is None:
        out.diag(
            "warning", "tcx.point.missing_time",
            "Trackpoint without Time skipped", f"points[{len(out.ts_us)}]",
        )
        return
    if lat is not None and lon is not None:
        out.add_point(ts, lat, lon, ele)
    for name, val in samples:
        out.add_sample(name, ts, val)


# --- encoder -----------------------------------------------------------------


def encode_tcx(
    points: pd.DataFrame,
    channels: pd.DataFrame | None = None,
    spans: pd.DataFrame | None = None,
    sport: str | None = None,
    creator: str = "activity_files_ray",
    tolerance_us: int = DEFAULT_TOLERANCE_US,
    channel_tolerances_us: dict[str, int] | None = None,
    notes: str | None = None,
    author: str | None = None,
    version: str = "2",
) -> bytes:
    """points/channels/laps → TCX bytes. Laps grouped into consecutive
    same-sport Activities; synthetic whole-track lap when none.
    ``notes`` is emitted on the FIRST activity only and ``author`` as
    the file-level <Author> after </Activities>
    (tcx_encoder.dart:362-368,404-414 parity)."""
    ts = points["ts_us"].to_numpy(np.int64)
    lat = points["lat"].to_numpy(np.float64)
    lon = points["lon"].to_numpy(np.float64)
    ele = (
        points["ele"].to_numpy(np.float64)
        if "ele" in points
        else np.full(ts.size, np.nan)
    )
    joined: dict[str, np.ndarray] = {}
    if channels is not None and len(channels):
        tol = channel_tolerances_us or {}
        for ch, g in channels.groupby("channel", observed=True):
            joined[str(ch)] = nearest_join(
                ts, g["ts_us"].to_numpy(np.int64), g["value"].to_numpy(np.float64),
                tol.get(str(ch), tolerance_us),
            )
    def _stat(r, key):
        v = r.get(key)
        try:
            return float(v) if v is not None and np.isfinite(float(v)) else None
        except (TypeError, ValueError):
            return None

    laps: list[tuple] = []
    if spans is not None and len(spans):
        lp = spans[spans["kind"] == "lap"] if "kind" in spans.columns else spans
        for _, r in lp.iterrows():
            laps.append(
                (
                    int(r["start_us"]), int(r["end_us"]),
                    r.get("sport") if isinstance(r.get("sport"), str) else None,
                    _stat(r, "dist_m"),
                    _stat(r, "calories"), _stat(r, "avg_hr"), _stat(r, "max_hr"),
                    r.get("tcx_intensity") if isinstance(r.get("tcx_intensity"), str) else None,
                    r.get("tcx_trigger_method") if isinstance(r.get("tcx_trigger_method"), str) else None,
                )
            )
    if not laps and ts.size:
        laps = [(int(ts[0]), int(ts[-1]), sport, None, None, None, None,
                 None, None)]  # tcx_encoder.dart:37-46
    # group consecutive same-sport laps into one Activity each
    groups: list[list[tuple]] = []
    for lap in laps:
        if groups and (groups[-1][-1][2] or sport) == (lap[2] or sport):
            groups[-1].append(lap)
        else:
            groups.append([lap])
    ns = (
        "http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v1"
        if version == "1"
        else "http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2"
    )  # TCX v1/v2 output (tcx_version_test.dart parity)
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<TrainingCenterDatabase xmlns="{ns}">\n'
        "<Activities>\n"
    ]
    for gi, grp in enumerate(groups):
        gsport = _SPORT_TO_TCX.get((grp[0][2] or sport or "other"), "Other")
        start_iso = us_to_iso(grp[0][0])
        parts.append(f'<Activity Sport="{gsport}"><Id>{start_iso}</Id>\n')
        for s_us, e_us, _sp, dist, cal, ahr, mhr, inten, trig in grp:
            parts.append(
                f'<Lap StartTime="{us_to_iso(s_us)}">'
                f"<TotalTimeSeconds>{(e_us - s_us) / 1e6:.1f}</TotalTimeSeconds>"
            )
            if dist is not None:
                parts.append(f"<DistanceMeters>{dist:.1f}</DistanceMeters>")
            if cal is not None:
                parts.append(f"<Calories>{int(round(cal))}</Calories>")
            if ahr is not None:
                parts.append(
                    f"<AverageHeartRateBpm><Value>{int(round(ahr))}</Value></AverageHeartRateBpm>"
                )
            if mhr is not None:
                parts.append(
                    f"<MaximumHeartRateBpm><Value>{int(round(mhr))}</Value></MaximumHeartRateBpm>"
                )
            # Intensity precedes TriggerMethod precedes Track in the
            # TCX schema (tcx_encoder.dart:155-168)
            if inten:
                parts.append(f"<Intensity>{_xml_escape(inten)}</Intensity>")
            if trig:
                parts.append(f"<TriggerMethod>{_xml_escape(trig)}</TriggerMethod>")
            parts.append("<Track>\n")
            in_lap = (ts >= s_us) & (ts <= e_us)  # J3 containment join
            for i in np.nonzero(in_lap)[0]:
                parts.append(f"<Trackpoint><Time>{us_to_iso(int(ts[i]))}</Time>")
                parts.append(
                    "<Position>"
                    f"<LatitudeDegrees>{lat[i]:.7f}</LatitudeDegrees>"
                    f"<LongitudeDegrees>{lon[i]:.7f}</LongitudeDegrees>"
                    "</Position>"
                )
                if np.isfinite(ele[i]):
                    parts.append(f"<AltitudeMeters>{ele[i]:.2f}</AltitudeMeters>")
                d = joined.get("distance")
                if d is not None and np.isfinite(d[i]):
                    parts.append(f"<DistanceMeters>{d[i]:.2f}</DistanceMeters>")
                hr = joined.get("heart_rate")
                if hr is not None and np.isfinite(hr[i]):
                    parts.append(
                        f"<HeartRateBpm><Value>{int(round(hr[i]))}</Value></HeartRateBpm>"
                    )
                cad = joined.get("cadence")
                if cad is not None and np.isfinite(cad[i]):
                    parts.append(f"<Cadence>{int(round(cad[i]))}</Cadence>")
                pw = joined.get("power")
                sp_ = joined.get("speed")
                if (pw is not None and np.isfinite(pw[i])) or (
                    sp_ is not None and np.isfinite(sp_[i])
                ):
                    parts.append(
                        '<Extensions><TPX xmlns="http://www.garmin.com/xmlschemas/ActivityExtension/v2">'
                    )
                    if sp_ is not None and np.isfinite(sp_[i]):
                        parts.append(f"<Speed>{sp_[i]:.3f}</Speed>")
                    if pw is not None and np.isfinite(pw[i]):
                        parts.append(f"<Watts>{int(round(pw[i]))}</Watts>")
                    parts.append("</TPX></Extensions>")
                parts.append("</Trackpoint>\n")
            parts.append("</Track></Lap>\n")
        if gi == 0 and notes and notes.strip():
            parts.append(f"<Notes>{_xml_escape(notes.strip())}</Notes>")
        parts.append(
            f"<Creator xsi:type=\"Device_t\" xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\"><Name>{creator}</Name></Creator>"
            "</Activity>\n"
        )
    parts.append("</Activities>\n")
    if author and author.strip():
        parts.append(
            '<Author xsi:type="Application_t" '
            'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
            f"<Name>{_xml_escape(author.strip())}</Name></Author>\n"
        )
    parts.append("</TrainingCenterDatabase>\n")
    return "".join(parts).encode()
