"""Normalization + point-edit kernels (reference: RawEditor /
RawTransforms, ``/root/reference/lib/src/transforms/``).

Semantics carried over (SURVEY.md §2.2, §7.1) — all citations into
/root/reference:

* M1 sortAndDedup (``raw_editor.dart:21-67``): chronological sort;
  duplicate timestamps keep the LAST occurrence.
* M2 trimInvalid (``raw_editor.dart:82-195``): drop non-finite /
  out-of-range coordinates, drop Null-Island points
  (|lat|,|lon| < 1e-6), clear sentinel elevations ≤ −499 keeping the
  point; channels/spans then trimmed to the surviving time window.
* M3 crop (``raw_editor.dart:201-241``): inclusive time window.
* M4 shiftTime (``raw_editor.dart:244-290``).
* M6 deleteRange (``raw_editor.dart:367-405,822-851``): inclusive
  removal; spans clipped by the 5-case rule (a span strictly
  containing the range keeps its original bounds).
* M7 insertPause (``raw_editor.dart:412-449,908-927``): shift t>at;
  straddling spans extend end only.
* M8 removePause (``raw_editor.dart:456-503,858-903``): delete
  strictly-inside, shift ≥to back by the gap; spans via the 6-case
  clip/shift; zero-duration results dropped.
* M9/M10 downsample by time/distance (``raw_editor.dart:506-613``):
  deterministic decimation keeping first and last.
* M11 smooth (``raw_editor.dart:616-643``): centered moving average
  via prefix sums.
* M12/M14 recomputeDistanceAndSpeed (``raw_editor.dart:646-680``,
  ``raw_transforms.dart:59-91``): cumulative haversine; speed=Δd/Δt,
  0 when Δt ≤ 0.
* M13 resample (``raw_transforms.dart:9-56``): fixed step grid
  start..end plus exact end; linear interpolation.

Every kernel is a pure function of one activity's arrays (activities
are independent → ``activity_id`` is the universal narrow partition
key, SURVEY.md §3.3); Dataset wrappers run them under
``groupby("activity_id").map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import geo

ELE_SENTINEL = -499.0  # raw_editor.dart:108-119
NULL_ISLAND_EPS = 1e-6  # raw_editor.dart:101-105


def sort_and_dedup(df: pd.DataFrame, ts_col: str = "ts_us") -> pd.DataFrame:
    """M1: stable chronological sort, duplicate timestamp → last wins.
    Already-clean input (strictly increasing — the overwhelmingly
    common case, facade:649-706 skip-work idiom) returns unchanged."""
    ts = df[ts_col].to_numpy()
    if len(ts) < 2 or bool((np.diff(ts) > 0).all()):
        return df
    df = df.sort_values(ts_col, kind="mergesort")
    return df[~df[ts_col].duplicated(keep="last")].reset_index(drop=True)


def trim_invalid(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, int]]:
    """M2: returns (clean points, repair stats). Elevation sentinel is
    cleared (set null) but the point survives."""
    lat = df["lat"].to_numpy(dtype=np.float64)
    lon = df["lon"].to_numpy(dtype=np.float64)
    finite = np.isfinite(lat) & np.isfinite(lon)
    in_range = (lat >= -90.0) & (lat <= 90.0) & (lon >= -180.0) & (lon <= 180.0)
    null_island = (np.abs(lat) < NULL_ISLAND_EPS) & (np.abs(lon) < NULL_ISLAND_EPS)
    keep = finite & in_range & ~null_island
    if keep.all():
        # clean fast path: no row drop → only elevation clearing may
        # still need a copy below
        ele_clean = True
        if "ele" in df.columns:
            ele_v = df["ele"].to_numpy(dtype=np.float64)
            ele_clean = not (np.isfinite(ele_v) & (ele_v <= ELE_SENTINEL)).any()
        if ele_clean:
            stats = {
                "dropped_nonfinite": 0, "dropped_out_of_range": 0,
                "dropped_null_island": 0, "cleared_elevation": 0,
            }
            return df, stats
    out = df[keep].copy()
    n_ele = 0
    if "ele" in out.columns:
        ele = out["ele"].to_numpy(dtype=np.float64)
        bad_ele = np.isfinite(ele) & (ele <= ELE_SENTINEL)
        n_ele = int(bad_ele.sum())
        if n_ele:
            out.loc[bad_ele, "ele"] = np.nan
    stats = {
        "dropped_nonfinite": int((~finite).sum()),
        "dropped_out_of_range": int((finite & ~in_range).sum()),
        "dropped_null_island": int((finite & in_range & null_island).sum()),
        "cleared_elevation": n_ele,
    }
    return out.reset_index(drop=True), stats


def trim_to_window(
    samples: pd.DataFrame, start_us: int, end_us: int, ts_col: str = "ts_us"
) -> pd.DataFrame:
    """M2's channel trim: semi-join of samples against the surviving
    point time range (raw_editor.dart:155-188)."""
    ts = samples[ts_col].astype("int64")
    return samples[(ts >= start_us) & (ts <= end_us)].reset_index(drop=True)


def crop(df: pd.DataFrame, start_us: int, end_us: int, ts_col: str = "ts_us") -> pd.DataFrame:
    """M3: inclusive [start, end] time-window filter."""
    ts = df[ts_col].astype("int64")
    return df[(ts >= start_us) & (ts <= end_us)].reset_index(drop=True)


def clip_spans_crop(
    start_us: np.ndarray, end_us: np.ndarray, lo_us: int, hi_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """M3's span rule (raw_editor.dart:222-233): spans overlapping the
    crop window survive with boundaries CLAMPED into [lo, hi]; fully
    outside → dropped. Returns (new_start, new_end, keep_mask)."""
    s = start_us.astype(np.int64).copy()
    e = end_us.astype(np.int64).copy()
    keep = (e >= lo_us) & (s <= hi_us)
    s = np.clip(s, lo_us, None)
    e = np.clip(e, None, hi_us)
    return s, e, keep


def shift_time(df: pd.DataFrame, delta_us: int, ts_col: str = "ts_us") -> pd.DataFrame:
    """M4: add delta to every timestamp."""
    out = df.copy()
    out[ts_col] = (out[ts_col].astype("int64") + delta_us).astype(out[ts_col].dtype)
    return out


def delete_range(df: pd.DataFrame, from_us: int, to_us: int, ts_col: str = "ts_us") -> pd.DataFrame:
    """M6: remove the inclusive [from, to] range (no time shift)."""
    ts = df[ts_col].astype("int64")
    return df[(ts < from_us) | (ts > to_us)].reset_index(drop=True)


def clip_spans_delete_range(
    start_us: np.ndarray, end_us: np.ndarray, from_us: int, to_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """M6 span rule (raw_editor.dart:822-851), 5 cases:
    1. disjoint → unchanged; 2. range covers span → drop;
    3. overlaps span head → start := to; 4. overlaps span tail →
    end := from; 5. range strictly inside span → ORIGINAL bounds kept.
    Returns (new_start, new_end, keep_mask)."""
    s = start_us.astype(np.int64).copy()
    e = end_us.astype(np.int64).copy()
    covered = (s >= from_us) & (e <= to_us)
    head = (s >= from_us) & (s <= to_us) & (e > to_us)
    tail = (s < from_us) & (e >= from_us) & (e <= to_us)
    s[head] = to_us
    e[tail] = from_us
    return s, e, ~covered


def insert_pause(
    df: pd.DataFrame, at_us: int, dur_us: int, ts_col: str = "ts_us"
) -> pd.DataFrame:
    """M7: shift every timestamp strictly after ``at`` forward."""
    out = df.copy()
    ts = out[ts_col].astype("int64")
    out[ts_col] = np.where(ts > at_us, ts + dur_us, ts).astype("int64")
    return out


def shift_spans_insert_pause(
    start_us: np.ndarray, end_us: np.ndarray, at_us: int, dur_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """M7 span rule (raw_editor.dart:905-927): spans straddling the
    pause extend END only; later spans shift whole."""
    s = start_us.astype(np.int64).copy()
    e = end_us.astype(np.int64).copy()
    straddle = (s <= at_us) & (e > at_us)
    after = s > at_us
    e[straddle] += dur_us
    s[after] += dur_us
    e[after & ~straddle] += dur_us
    return s, e


def remove_pause(
    df: pd.DataFrame, from_us: int, to_us: int, ts_col: str = "ts_us"
) -> pd.DataFrame:
    """M8: delete points strictly inside (from, to); shift t ≥ to back
    by the gap."""
    gap = to_us - from_us
    ts = df[ts_col].astype("int64")
    keep = (ts <= from_us) | (ts >= to_us)
    out = df[keep].copy()
    ts2 = out[ts_col].astype("int64")
    out[ts_col] = np.where(ts2 >= to_us, ts2 - gap, ts2).astype("int64")
    return out.reset_index(drop=True)


def shift_spans_remove_pause(
    start_us: np.ndarray, end_us: np.ndarray, from_us: int, to_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """M8 span rule (raw_editor.dart:858-903), 6 cases; spans whose
    clipped duration hits zero are dropped."""
    gap = to_us - from_us
    s = start_us.astype(np.int64).copy()
    e = end_us.astype(np.int64).copy()
    # clip endpoints into the pause window, then shift the post-pause part
    s_in = (s > from_us) & (s < to_us)
    e_in = (e > from_us) & (e < to_us)
    s[s_in] = from_us
    e[e_in] = from_us
    s[s >= to_us] -= gap
    e[e >= to_us] -= gap
    keep = e > s
    return s, e, keep


def downsample_time(df: pd.DataFrame, step_s: float, ts_col: str = "ts_us") -> pd.DataFrame:
    """M9: keep the first point, then the next ≥ step later; ALWAYS
    keep the last point. Sequential by nature — per-activity kernel."""
    ts = df[ts_col].astype("int64").to_numpy()
    n = len(ts)
    if n == 0:
        return df
    step_us = int(step_s * 1e6)
    keep = np.zeros(n, dtype=bool)
    last_kept = ts[0]
    keep[0] = True
    for i in range(1, n):
        if ts[i] - last_kept >= step_us:
            keep[i] = True
            last_kept = ts[i]
    keep[n - 1] = True
    return df[keep].reset_index(drop=True)


def filter_channels_to_times(
    channels: pd.DataFrame, kept_ts: np.ndarray, tolerance_us: int,
    ts_col: str = "ts_us",
) -> pd.DataFrame:
    """M9's channel companion (raw_editor.dart:525-560): after a point
    downsample, keep only channel samples within ``tolerance_us`` of a
    retained point time (nearest-retained via searchsorted; the
    reference uses tolerance = max(1, step/2))."""
    if not len(channels):
        return channels
    ts = channels[ts_col].astype("int64").to_numpy()
    kept = np.sort(np.asarray(kept_ts, dtype=np.int64))
    if kept.size == 0:
        return channels.iloc[0:0].reset_index(drop=True)
    idx = np.searchsorted(kept, ts)
    left = kept[np.clip(idx - 1, 0, kept.size - 1)]
    right = kept[np.clip(idx, 0, kept.size - 1)]
    near = np.minimum(np.abs(ts - left), np.abs(ts - right))
    return channels[near <= tolerance_us].reset_index(drop=True)


def downsample_distance(df: pd.DataFrame, min_m: float) -> pd.DataFrame:
    """M10: keep points ≥ min_m haversine meters from the last kept;
    always keep the last point."""
    n = len(df)
    if n == 0:
        return df
    lat = df["lat"].to_numpy(dtype=np.float64)
    lon = df["lon"].to_numpy(dtype=np.float64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = True
    anchor = 0
    for i in range(1, n):
        d = geo.haversine_m(
            np.asarray([lat[anchor]]), np.asarray([lon[anchor]]),
            np.asarray([lat[i]]), np.asarray([lon[i]]),
        )[0]
        if d >= min_m:
            keep[i] = True
            anchor = i
    keep[n - 1] = True
    return df[keep].reset_index(drop=True)


def smooth_moving_average(values: np.ndarray, window: int) -> np.ndarray:
    """M11: centered moving average via prefix sums
    (raw_editor.dart:624-638); window is the half-width in samples."""
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    if n == 0 or window <= 0:
        return v.copy()
    csum = np.concatenate([[0.0], np.cumsum(v)])
    i = np.arange(n)
    lo = np.maximum(i - window, 0)
    hi = np.minimum(i + window, n - 1)
    return (csum[hi + 1] - csum[lo]) / (hi - lo + 1)


def smooth_channel(values: np.ndarray, window: int) -> np.ndarray:
    """M11 in the reference's EXACT parameterization
    (raw_editor.dart:616-643): ``window`` is the TOTAL window size,
    split left = (window-1)//2, right = window-left-1 — asymmetric
    for even windows (e.g. window=4 averages [i-1 .. i+2]); window ≤ 1
    returns the input unchanged. ``smooth_moving_average`` above is
    the symmetric half-width convenience form."""
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    if n == 0 or window <= 1:
        return v.copy()
    left = (window - 1) // 2
    right = window - left - 1
    csum = np.concatenate([[0.0], np.cumsum(v)])
    i = np.arange(n)
    lo = np.maximum(i - left, 0)
    hi = np.minimum(i + right, n - 1)
    return (csum[hi + 1] - csum[lo]) / (hi - lo + 1)


def recompute_distance_speed(df: pd.DataFrame) -> pd.DataFrame:
    """M12/M14: append cumulative haversine ``distance_m`` and
    per-segment ``speed_mps`` columns; auto sort+dedup first when
    timestamps are not strictly increasing (raw_editor.dart:650-652)."""
    ts = df["ts_us"].astype("int64").to_numpy()
    if len(ts) > 1 and not np.all(np.diff(ts) > 0):
        df = sort_and_dedup(df)
        ts = df["ts_us"].astype("int64").to_numpy()
    dist = geo.cumulative_distance_m(
        df["lat"].to_numpy(np.float64), df["lon"].to_numpy(np.float64)
    )
    speed = geo.segment_speed_mps(dist, ts)
    out = df.copy()
    out["distance_m"] = dist
    out["speed_mps"] = speed
    return out


def resample(df: pd.DataFrame, step_s: float) -> pd.DataFrame:
    """M13: fixed-step grid start..end plus the exact end; lat/lon/ele
    linearly interpolated (raw_transforms.dart:27-53)."""
    ts = df["ts_us"].astype("int64").to_numpy()
    n = len(ts)
    if n == 0:
        return df
    step_us = int(step_s * 1e6)
    grid = np.arange(ts[0], ts[-1] + 1, step_us, dtype=np.int64)
    if grid[-1] != ts[-1]:
        grid = np.append(grid, ts[-1])
    out = {"ts_us": grid}
    for col in ("lat", "lon"):
        if col in df.columns:
            out[col] = np.interp(grid, ts, df[col].to_numpy(np.float64))
    if "ele" in df.columns:
        # elevation may be absent (NaN) per point; the reference's
        # _interpolateOptional takes the non-null endpoint instead of
        # poisoning the segment (transform_utils.dart:178-189)
        ele = df["ele"].to_numpy(np.float64)
        hi = np.clip(np.searchsorted(ts, grid, side="left"), 0, n - 1)
        lo = np.clip(hi - (ts[hi] > grid), 0, n - 1)
        hi = np.where(ts[lo] == grid, lo, np.clip(lo + 1, 0, n - 1))
        span = (ts[hi] - ts[lo]).astype(np.float64)
        frac = np.where(span > 0, (grid - ts[lo]) / np.where(span > 0, span, 1.0), 0.0)
        e_lo, e_hi = ele[lo], ele[hi]
        lerp = e_lo + (e_hi - e_lo) * frac
        out["ele"] = np.where(
            np.isnan(e_lo) & np.isnan(e_hi), np.nan,
            np.where(np.isnan(e_lo), e_hi, np.where(np.isnan(e_hi), e_lo, lerp)),
        )
    res = pd.DataFrame(out)
    for col in df.columns:
        if col not in res.columns and df[col].nunique(dropna=False) <= 1 and n > 0:
            res[col] = df[col].iloc[0]
    res["seq"] = np.arange(len(res), dtype=np.int32)
    return res[[c for c in df.columns if c in res.columns]]


def normalize_points_group(df: pd.DataFrame) -> pd.DataFrame:
    """The reference's ``_normalize`` (facade:591-646): sortAndDedup +
    trimInvalid, skipping work when already clean (facade:649-706)."""
    ts = df["ts_us"].astype("int64").to_numpy()
    clean_order = len(ts) < 2 or bool(np.all(np.diff(ts) > 0))
    if not clean_order:
        df = sort_and_dedup(df)
    out, _stats = trim_invalid(df)
    return out


def normalize_points(ds):
    """Dataset wrapper: per-activity normalize (narrow shuffle keyed
    by activity_id only)."""
    return ds.groupby("activity_id").map_groups(
        normalize_points_group, batch_format="pandas"
    )


def largest_contiguous_group(
    df: pd.DataFrame,
    max_gap_s: float = 24 * 3600,
    max_endpoint_km: float = 100.0,
) -> pd.DataFrame:
    """O4: keep the largest time-contiguous point cluster (gaps above
    ``max_gap_s`` split clusters), then drop endpoint outliers more
    than ``max_endpoint_km`` from their neighbor — the reference's FIT
    recovery filter (fit_parser.dart:1252-1332 semantics: corrupt
    timestamps / GPS spikes isolate into small clusters or endpoint
    jumps; an anti-join against those keeps the real ride)."""
    if len(df) < 2:
        return df
    df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
    ts = df["ts_us"].to_numpy(np.int64)
    gap_us = int(max_gap_s * 1e6)
    starts = np.concatenate([[0], np.nonzero(np.diff(ts) > gap_us)[0] + 1])
    ends = np.concatenate([starts[1:], [len(ts)]])
    sizes = ends - starts
    k = int(np.argmax(sizes))
    out = df.iloc[starts[k] : ends[k]].reset_index(drop=True)
    # endpoint outlier trim: drop first/last while they jump too far
    max_m = max_endpoint_km * 1000.0
    while len(out) >= 2:
        d = geo.haversine_m(
            np.asarray([out["lat"].iloc[0]]), np.asarray([out["lon"].iloc[0]]),
            np.asarray([out["lat"].iloc[1]]), np.asarray([out["lon"].iloc[1]]),
        )[0]
        if d <= max_m:
            break
        out = out.iloc[1:].reset_index(drop=True)
    while len(out) >= 2:
        d = geo.haversine_m(
            np.asarray([out["lat"].iloc[-1]]), np.asarray([out["lon"].iloc[-1]]),
            np.asarray([out["lat"].iloc[-2]]), np.asarray([out["lon"].iloc[-2]]),
        )[0]
        if d <= max_m:
            break
        out = out.iloc[:-1].reset_index(drop=True)
    if "seq" in out.columns:
        out["seq"] = np.arange(len(out), dtype=np.int32)
    return out


def insert_point(df: pd.DataFrame, row: dict) -> pd.DataFrame:
    """M5 insertPoint (raw_editor.dart:296-341): add a point and
    restore chronological order."""
    return sort_and_dedup(
        pd.concat([df, pd.DataFrame([{**{"activity_id": df["activity_id"].iloc[0] if len(df) else ""}, **row}])],
                  ignore_index=True)
    )


def delete_point_at(df: pd.DataFrame, index: int) -> pd.DataFrame:
    """M5 deletePointAt: positional removal; out-of-range is a no-op
    (never-throw)."""
    if not 0 <= index < len(df):
        return df.reset_index(drop=True)
    out = df.drop(df.index[index]).reset_index(drop=True)
    if "seq" in out.columns:
        out["seq"] = np.arange(len(out), dtype=np.int32)
    return out


def update_point(df: pd.DataFrame, index: int, **changes) -> pd.DataFrame:
    """M5 updatePoint: positional field update; re-sorts when the
    timestamp changed (raw_editor.dart:296-341 semantics)."""
    if not 0 <= index < len(df):
        return df.reset_index(drop=True)
    out = df.copy().reset_index(drop=True)
    ts_changed = "ts_us" in changes and changes["ts_us"] != out.loc[index, "ts_us"]
    for k, v in changes.items():
        out.loc[index, k] = v
    return sort_and_dedup(out) if ts_changed else out


def channel_snapshot(
    channels: pd.DataFrame, at_us: int, tolerance_us: int = 5_000_000
) -> dict[str, float]:
    """The facade's channelSnapshot (facade:715-719): nearest sample
    per channel at a given time, within tolerance."""
    from ..sources.gpx import nearest_join

    out: dict[str, float] = {}
    at = np.asarray([at_us], dtype=np.int64)
    for ch, g in channels.groupby("channel", observed=True):
        v = nearest_join(
            at, g["ts_us"].to_numpy(np.int64), g["value"].to_numpy(np.float64),
            tolerance_us,
        )[0]
        if np.isfinite(v):
            out[str(ch)] = float(v)
    return out


def resample_channels(
    channels: pd.DataFrame, grid_us: np.ndarray, step_s: float
) -> pd.DataFrame:
    """M13's channel rule (raw_transforms.dart:49-53): continuous
    channels linearly interpolated onto the grid; heart_rate snapped
    to the NEAREST sample within step/2 (absent otherwise)."""
    half_us = int(step_s * 1e6 / 2)
    frames = []
    for ch, g in channels.groupby("channel", observed=True):
        ts = g["ts_us"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        order = np.argsort(ts, kind="stable")
        ts, v = ts[order], v[order]
        if str(ch) == "heart_rate":
            from ..sources.gpx import nearest_join

            nv = nearest_join(grid_us, ts, v, tolerance_us=half_us)
            mask = np.isfinite(nv)
        else:
            # reference emits a value at EVERY grid time
            # (transform_utils.dart:35-72,191-200): inside → linear;
            # past the last sample → last value (np.interp clamps);
            # BEFORE the first sample → linear extrapolation from the
            # first segment (the lerp factor is not clamped)
            nv = np.interp(grid_us, ts, v)
            before = grid_us < ts[0]
            if before.any() and ts.size >= 2 and ts[1] != ts[0]:
                slope = (v[1] - v[0]) / float(ts[1] - ts[0])
                nv[before] = v[0] + slope * (grid_us[before] - ts[0]).astype(np.float64)
            mask = np.ones(grid_us.size, dtype=bool)
        if mask.any():
            frames.append(
                pd.DataFrame(
                    {
                        "activity_id": g["activity_id"].iloc[0],
                        "channel": str(ch),
                        "ts_us": grid_us[mask],
                        "value": nv[mask],
                    }
                )
            )
    if not frames:
        return pd.DataFrame(columns=["activity_id", "channel", "ts_us", "value"])
    return pd.concat(frames, ignore_index=True)
