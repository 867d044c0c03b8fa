"""Validation stage: pure projection activity → diagnostics rows.

Re-expresses the reference's validator (``/root/reference/lib/src/
validation.dart``) as vectorized per-activity kernels producing the
diagnostics table (SURVEY.md §2.8). Checks carried over:

* V1 series order (``validation.dart:346-388,535-548``): out_of_order
  (error), duplicate_timestamp (error), gap > threshold (warn,
  default 5 min) — for points and every channel.
* V2 coordinate ranges + finite elevation (``:390-422``).
* V3 channel values (``:474-533``): non-finite (error), negative
  distance (error), distance decrease > 1e-9 (warn), heart rate
  outside [20, 260] (warn), negative power (error).
* V4 lap boundaries (``:185-288``): inverted times, out-of-order,
  overlap (errors); extends before/after the point window (warns).
* V5 channel coverage outside the track window (``:433-472``).
* V7 channel edge cases (``:653-698``): empty, single sample.

Diagnostics schema (parse_result.dart:69-100 shape):
``activity_id, severity ∈ {error, warning, info}, code, message, path``.
Kernels never throw on malformed data (§7.1 invariant 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GAP_THRESHOLD_US = 5 * 60 * 1_000_000  # 5 min (validation.dart:535-548)
HR_MIN, HR_MAX = 20.0, 260.0  # validation.dart:506-516
DIST_DECREASE_EPS = 1e-9  # validation.dart:497-504

DIAG_COLUMNS = ["activity_id", "severity", "code", "message", "path"]


def _diag(rows: list, activity_id: str, severity: str, code: str, message: str, path: str) -> None:
    rows.append((activity_id, severity, code, message, path))


def _series_order_diags(
    rows: list, activity_id: str, ts_us: np.ndarray, path: str, code_prefix: str
) -> None:
    if ts_us.size < 2:
        return
    d = np.diff(ts_us)
    n_ooo = int((d < 0).sum())
    n_dup = int((d == 0).sum())
    gaps = np.nonzero(d > GAP_THRESHOLD_US)[0]
    if n_ooo:
        _diag(rows, activity_id, "error", f"{code_prefix}.out_of_order",
              f"{n_ooo} out-of-order timestamps", path)
    if n_dup:
        _diag(rows, activity_id, "error", f"{code_prefix}.duplicate_timestamp",
              f"{n_dup} duplicate timestamps", path)
    for g in gaps[:5]:  # first-5 cap, mirrors fit_parser.dart:270 idiom
        _diag(rows, activity_id, "warning", f"{code_prefix}.gap",
              f"gap of {int(d[g]) / 1e6:.0f}s after index {int(g)}", path)


def validate_points_group(df: pd.DataFrame) -> pd.DataFrame:
    """V1 + V2 for one activity's trackpoints (DataFrame wrapper)."""
    return pd.DataFrame(validate_points_rows(df), columns=DIAG_COLUMNS)


def validate_points_rows(df: pd.DataFrame) -> list:
    """V1 + V2 as diagnostic tuples (hot-path form: the convert
    kernel aggregates tuples per batch, one DataFrame per batch)."""
    rows: list = []
    aid = str(df["activity_id"].iloc[0]) if len(df) else ""
    ts = df["ts_us"].astype("int64").to_numpy()
    _series_order_diags(rows, aid, ts, "points", "validation.points")
    lat = df["lat"].to_numpy(np.float64)
    lon = df["lon"].to_numpy(np.float64)
    bad_lat = ~np.isfinite(lat) | (lat < -90) | (lat > 90)
    bad_lon = ~np.isfinite(lon) | (lon < -180) | (lon > 180)
    if bad_lat.any():
        _diag(rows, aid, "error", "validation.coordinate.latitude",
              f"{int(bad_lat.sum())} invalid latitudes", "points")
    if bad_lon.any():
        _diag(rows, aid, "error", "validation.coordinate.longitude",
              f"{int(bad_lon.sum())} invalid longitudes", "points")
    if "ele" in df.columns:
        ele = df["ele"].to_numpy(np.float64)
        inf_ele = np.isinf(ele)  # NaN = absent (valid); ±inf = error
        if inf_ele.any():
            _diag(rows, aid, "error", "validation.coordinate.elevation",
                  f"{int(inf_ele.sum())} non-finite elevations", "points")
    return rows


def validate_channels_group(df: pd.DataFrame, track_window: tuple[int, int] | None = None) -> pd.DataFrame:
    """V1 (per channel) + V3 + V5 + V7 (DataFrame wrapper)."""
    return pd.DataFrame(validate_channels_rows(df, track_window), columns=DIAG_COLUMNS)


def validate_channels_rows(df: pd.DataFrame, track_window: tuple[int, int] | None = None) -> list:
    """V1 (per channel) + V3 + V5 + V7 for one activity's samples
    (long form: channel, ts_us, value) as diagnostic tuples."""
    rows: list = []
    aid = str(df["activity_id"].iloc[0]) if len(df) else ""
    for ch, g in df.groupby("channel", observed=True):
        path = f"channels.{ch}"
        ts = g["ts_us"].astype("int64").to_numpy()
        v = g["value"].to_numpy(np.float64)
        if ts.size == 0:
            _diag(rows, aid, "warning", "validation.channel.empty", "no samples", path)
            continue
        if ts.size == 1:
            _diag(rows, aid, "warning", "validation.channel.single_sample",
                  "single sample", path)
        _series_order_diags(rows, aid, ts, path, "validation.channel")
        nonfinite = ~np.isfinite(v)
        if nonfinite.any():
            _diag(rows, aid, "error", "validation.channel.non_finite",
                  f"{int(nonfinite.sum())} non-finite values", path)
        if ch == "distance":
            if (v[np.isfinite(v)] < 0).any():
                _diag(rows, aid, "error", "validation.channel.negative_distance",
                      "negative distance values", path)
            if v.size > 1:
                dec = np.diff(v) < -DIST_DECREASE_EPS
                if dec.any():
                    _diag(rows, aid, "warning", "validation.channel.distance_decrease",
                          f"{int(dec.sum())} decreasing distance steps", path)
        if ch == "heart_rate":
            out = np.isfinite(v) & ((v < HR_MIN) | (v > HR_MAX))
            if out.any():
                _diag(rows, aid, "warning", "validation.channel.heart_rate_range",
                      f"{int(out.sum())} samples outside [{HR_MIN:.0f},{HR_MAX:.0f}]", path)
        if ch == "power" and (v[np.isfinite(v)] < 0).any():
            _diag(rows, aid, "error", "validation.channel.negative_power",
                  "negative power values", path)
        if track_window is not None:
            lo, hi = track_window
            before = int((ts < lo).sum())
            after = int((ts > hi).sum())
            if before:
                _diag(rows, aid, "warning", "validation.channel.samples_before_track",
                      f"{before} samples before track start", path)
            if after:
                _diag(rows, aid, "warning", "validation.channel.samples_after_track",
                      f"{after} samples after track end", path)
    return rows


def validate_spans_group(spans: pd.DataFrame, track_window: tuple[int, int] | None = None) -> pd.DataFrame:
    """V4 lap-boundary checks (DataFrame wrapper)."""
    return pd.DataFrame(validate_spans_rows(spans, track_window), columns=DIAG_COLUMNS)


def validate_spans_rows(spans: pd.DataFrame, track_window: tuple[int, int] | None = None) -> list:
    """V4 lap-boundary checks for one activity's spans as tuples."""
    rows: list = []
    aid = str(spans["activity_id"].iloc[0]) if len(spans) else ""
    laps = spans[spans["kind"] == "lap"] if "kind" in spans.columns else spans
    s = laps["start_us"].astype("int64").to_numpy()
    e = laps["end_us"].astype("int64").to_numpy()
    inv = e < s
    if inv.any():
        _diag(rows, aid, "error", "validation.laps.inverted_times",
              f"{int(inv.sum())} laps end before start", "laps")
    if s.size > 1:
        if (np.diff(s) < 0).any():
            _diag(rows, aid, "error", "validation.laps.out_of_order",
                  "laps not in chronological order", "laps")
        overlap = s[1:] < e[:-1]
        if overlap.any():
            _diag(rows, aid, "error", "validation.laps.overlap",
                  f"{int(overlap.sum())} overlapping lap pairs", "laps")
    if track_window is not None and s.size:
        lo, hi = track_window
        if (s < lo).any():
            _diag(rows, aid, "warning", "validation.laps.extends_before_points",
                  "lap starts before first point", "laps")
        if (e > hi).any():
            _diag(rows, aid, "warning", "validation.laps.extends_after_points",
                  "lap ends after last point", "laps")
    return rows


def validate_points(ds):
    """Dataset wrapper: trackpoints → diagnostics Dataset."""
    return ds.groupby("activity_id").map_groups(
        validate_points_group, batch_format="pandas"
    )


def diagnostics_summary(diags_ds):
    """A6: diagnostic counts by severity (parse_result.dart:113-137)."""
    from ray.data.aggregate import Count

    return diags_ds.groupby("severity").aggregate(Count(alias_name="n"))


# V6: device metadata checks (validation.dart:564-646)
FIT_ID_MIN, FIT_ID_MAX = 1, 65534


def validate_device(device: dict, activity_id: str = "") -> pd.DataFrame:
    """V6: blank fields, FIT id ranges (1-65534), name<->id mismatch
    against the FULL public FIT manufacturer table (validation.dart:
    598-630 parity — 179 entries, case-insensitive compare)."""
    from ..sources import fit_profile

    rows: list = []
    known = {k: v.lower() for k, v in fit_profile.MANUFACTURERS.items()}
    for key in ("manufacturer", "model", "product"):
        val = device.get(key)
        if val is not None and str(val).strip() == "":
            _diag(rows, activity_id, "warning", f"validation.device.blank_{key}",
                  f"{key} is blank", "device")
    for key in ("fit_manufacturer_id", "fit_product_id"):
        val = device.get(key)
        if val is not None and not (FIT_ID_MIN <= int(val) <= FIT_ID_MAX):
            _diag(rows, activity_id, "error", f"validation.device.{key}_range",
                  f"{key}={val} outside [{FIT_ID_MIN},{FIT_ID_MAX}]", "device")
    man, mid = device.get("manufacturer"), device.get("fit_manufacturer_id")
    if man and mid is not None and int(mid) in known:
        if str(man).strip().lower() != known[int(mid)]:
            _diag(rows, activity_id, "warning", "validation.device.name_id_mismatch",
                  f"manufacturer {man!r} != id {mid} ({known[int(mid)]})", "device")
    return pd.DataFrame(rows, columns=DIAG_COLUMNS)
