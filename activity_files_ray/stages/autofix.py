"""Auto-fix pipeline + lap marking (reference M15/M17).

Semantics (``/root/reference/lib/src/api/activity_files_facade.dart:
2167-2350``, options ``lib/src/api/pipeline_options.dart:40-104``):

* auto-fix = sortAndDedup + trimInvalid + recompute distance/speed +
  GAP FILL (linear interpolation across gaps larger than a threshold,
  capped at max inserted points, facade:2293-2350) + AUTO-LAP with
  sport-specific split distances (facade:2217-2235), each behind a
  config flag; emits ``autofix.*`` diagnostics (facade:2237-2288).
* markLapsByDistance (``raw_editor.dart:683-750``): split laps every
  N meters of the monotonicized distance channel (negative deltas
  ignored, ``:703-709``); names ``Split N``; remainder lap; fallback
  single lap.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..functions import geo
from . import normalize as nz

# sport → auto-lap split distance in meters (facade:2217-2235 idea:
# running splits by km, cycling by 5 km, else 1 km)
AUTO_LAP_DISTANCE_M = {
    "running": 1000.0,
    "walking": 1000.0,
    "hiking": 1000.0,
    "cycling": 5000.0,
    "swimming": 100.0,
}
DEFAULT_LAP_DISTANCE_M = 1000.0


@dataclass
class AutoFixOptions:
    """Mirror of ActivityAutoFixOptions (pipeline_options.dart:40-104)."""

    sort_and_dedup: bool = True
    trim_invalid: bool = True
    recompute_distance: bool = True
    fill_gaps: bool = False
    gap_threshold_s: float = 60.0
    gap_fill_step_s: float = 5.0
    max_inserted_points: int = 100
    auto_lap: bool = False
    sport: str | None = None
    diags: list = field(default_factory=list)


def fill_gaps(
    df: pd.DataFrame,
    gap_threshold_s: float = 60.0,
    step_s: float = 5.0,
    max_inserted: int = 100,
) -> tuple[pd.DataFrame, int]:
    """Linear-interpolation gap fill (facade:2293-2350): for each gap
    larger than the threshold, insert points every ``step_s`` up to a
    global cap. Returns (new_df, n_inserted)."""
    ts = df["ts_us"].to_numpy(np.int64)
    if ts.size < 2:
        return df, 0
    gap_us = int(gap_threshold_s * 1e6)
    step_us = int(step_s * 1e6)
    pieces = []
    inserted = 0
    lat = df["lat"].to_numpy(np.float64)
    lon = df["lon"].to_numpy(np.float64)
    ele = df["ele"].to_numpy(np.float64) if "ele" in df else np.full(ts.size, np.nan)
    aid = df["activity_id"].iloc[0] if "activity_id" in df and len(df) else ""
    for i in range(ts.size - 1):
        pieces.append(df.iloc[[i]])
        dt = ts[i + 1] - ts[i]
        if dt > gap_us and inserted < max_inserted:
            n_new = min(int(dt // step_us) - 1, max_inserted - inserted)
            if n_new > 0:
                new_ts = ts[i] + step_us * np.arange(1, n_new + 1, dtype=np.int64)
                frac = (new_ts - ts[i]) / dt
                fill = pd.DataFrame(
                    {
                        "activity_id": aid,
                        "seq": np.int32(-1),  # re-sequenced below
                        "ts_us": new_ts,
                        "lat": lat[i] + frac * (lat[i + 1] - lat[i]),
                        "lon": lon[i] + frac * (lon[i + 1] - lon[i]),
                        "ele": ele[i] + frac * (ele[i + 1] - ele[i]),
                    }
                )
                pieces.append(fill[df.columns.intersection(fill.columns)])
                inserted += n_new
    pieces.append(df.iloc[[ts.size - 1]])
    out = pd.concat(pieces, ignore_index=True)
    if "seq" in out.columns:
        out["seq"] = np.arange(len(out), dtype=np.int32)
    return out, inserted


def mark_laps_by_distance(
    df: pd.DataFrame, split_m: float, distance: np.ndarray | None = None
) -> pd.DataFrame:
    """M15: spans DataFrame with one lap per ``split_m`` meters of
    monotonicized cumulative distance; remainder lap; single fallback
    lap when no distance can be derived."""
    ts = df["ts_us"].to_numpy(np.int64)
    aid = df["activity_id"].iloc[0] if "activity_id" in df and len(df) else ""
    if distance is None:
        distance = geo.cumulative_distance_m(
            df["lat"].to_numpy(np.float64), df["lon"].to_numpy(np.float64)
        )
    raw = np.nan_to_num(np.asarray(distance, dtype=np.float64), nan=0.0)
    if ts.size == 0:
        return pd.DataFrame(
            columns=["activity_id", "kind", "name", "start_us", "end_us", "dist_m"]
        )
    # monotonicize by DROPPING negative deltas and keeping positive
    # ones (raw_editor.dart:700-709 — NOT a running max: a dip
    # followed by a partial recovery still accumulates the recovery)
    mono = np.empty_like(raw)
    mono[0] = raw[0]
    if raw.size > 1:
        mono[1:] = raw[0] + np.cumsum(np.clip(np.diff(raw), 0.0, None))
    rows = []
    # split thresholds are RELATIVE to the first sample's distance —
    # a channel starting at a nonzero cumulative offset must not fire
    # spurious splits (raw_editor.dart:693-696; advisor finding)
    lap_start_idx = 0
    lap_start_dist = mono[0]
    next_cut = mono[0] + split_m
    n = 1
    for i in range(ts.size):
        # while-loop: one sample can close SEVERAL whole splits; each
        # full split records exactly split_m (raw_editor.dart:710-723)
        while mono[i] >= next_cut:
            lap_d = next_cut - lap_start_dist
            rows.append(
                (aid, "lap", f"Split {n}", int(ts[lap_start_idx]), int(ts[i]),
                 float(lap_d) if lap_d > 0 else np.nan)
            )
            lap_start_idx = i
            lap_start_dist = next_cut
            n += 1
            next_cut += split_m
    remaining = mono[-1] - lap_start_dist
    if remaining > 0:
        rows.append(
            (aid, "lap", f"Split {n}", int(ts[lap_start_idx]), int(ts[-1]),
             float(remaining))
        )
    if not rows:
        # zero-distance track: single whole-track fallback lap
        # (raw_editor.dart:737-747)
        rows.append(
            (aid, "lap", "Split 1", int(ts[0]), int(ts[-1]),
             float(raw[-1] - raw[0]))
        )
    return pd.DataFrame(
        rows, columns=["activity_id", "kind", "name", "start_us", "end_us", "dist_m"]
    )


def autofix_group(df: pd.DataFrame, options: AutoFixOptions | None = None) -> pd.DataFrame:
    """M17 composition for one activity (points only; spans handled
    by the caller via mark_laps_by_distance)."""
    opt = options or AutoFixOptions()
    out = df
    if opt.sort_and_dedup:
        out = nz.sort_and_dedup(out)
    if opt.trim_invalid:
        out, _stats = nz.trim_invalid(out)
    if opt.fill_gaps:
        out, _n = fill_gaps(
            out, opt.gap_threshold_s, opt.gap_fill_step_s, opt.max_inserted_points
        )
    if opt.recompute_distance:
        out = nz.recompute_distance_speed(out)
    return out


def autofix_points(ds, options: AutoFixOptions | None = None):
    """Dataset wrapper (per-activity groups)."""
    opt = options or AutoFixOptions()
    return ds.groupby("activity_id").map_groups(
        lambda df: autofix_group(df, opt), batch_format="pandas"
    )
