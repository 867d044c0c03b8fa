"""CSV parser + encoder kernels.

Semantics from the reference (``/root/reference/lib/src/parse/
csv_parser.dart:13-286``, encoder ``lib/src/encode/csv_encoder.dart:
23-93``):

* header-mapped columns: time, lat(itude), lon(gitude), ele(vation)
  → points; known channel names → fixed channels; any other NUMERIC
  column → a custom channel named by its (normalized) header
  (csv_parser.dart:144-153).
* row-level skip diagnostics for unparseable rows.
* Encoder: one row per point; channels joined by EXACT timestamp
  (encoder_utils.dart:9-19); extra channels as sorted extra columns
  (csv_encoder.dart:50-58); RFC-4180 quoting (csv_encoder.dart:84-92).
"""

from __future__ import annotations

import csv
import io

import numpy as np
import pandas as pd

from .model import ParsedActivity, iso_to_us, us_to_iso

_COL_ALIASES = {
    "time": "time", "timestamp": "time", "datetime": "time",
    "lat": "lat", "latitude": "lat",
    "lon": "lon", "lng": "lon", "longitude": "lon",
    "ele": "ele", "elevation": "ele", "alt": "ele", "altitude": "ele",
}
_KNOWN_CHANNELS = {
    "heart_rate", "heartrate", "hr", "cadence", "power", "temperature",
    "speed", "distance", "depth", "course", "bearing",
}
_CH_RENAME = {"heartrate": "heart_rate", "hr": "heart_rate"}


def parse_csv(data: bytes, activity_id: str) -> ParsedActivity:
    out = ParsedActivity(activity_id)
    try:
        text_data = data.decode("utf-8-sig")
    except UnicodeDecodeError as e:
        out.diag("error", "csv.parse.invalid_encoding", str(e), "")
        return out
    reader = csv.reader(io.StringIO(text_data))
    try:
        header = next(reader)
    except StopIteration:
        out.diag("error", "csv.parse.empty", "no header row", "")
        return out
    except csv.Error as e:  # e.g. bare \r in an unquoted field
        out.diag("error", "csv.parse.malformed", str(e), "")
        return out
    norm = [h.strip().lower() for h in header]
    roles: list[str] = []
    for h in norm:
        if h in _COL_ALIASES:
            roles.append(_COL_ALIASES[h])
        elif h in _KNOWN_CHANNELS:
            roles.append("ch:" + _CH_RENAME.get(h, h))
        elif h == "sport":
            roles.append("sport")  # activity sport column (csv_parser.dart:86-89)
        else:
            roles.append("maybe:" + h)  # custom channel iff numeric
    if "time" not in roles:
        out.diag("error", "csv.parse.missing_time_column", str(header), "")
        return out
    rownum = 1
    while True:
        rownum += 1
        try:
            row = next(reader)
        except StopIteration:
            break
        except csv.Error as e:
            out.diag("warning", "csv.row.malformed", f"row {rownum}: {e}",
                     f"rows[{rownum}]")
            continue
        if not row or all(not c.strip() for c in row):
            continue
        vals = dict(zip(roles, row))
        ts = iso_to_us(vals.get("time", ""))
        if ts is None:
            out.diag(
                "warning", "csv.row.invalid_time",
                f"row {rownum}: {vals.get('time')!r}", f"rows[{rownum}]",
            )
            continue
        lat = _f(vals.get("lat"))
        lon = _f(vals.get("lon"))
        if lat is not None and lon is not None:
            out.add_point(ts, lat, lon, _f(vals.get("ele")))
        elif "lat" in vals or "lon" in vals:
            out.diag(
                "warning", "csv.row.invalid_coordinate",
                f"row {rownum} skipped", f"rows[{rownum}]",
            )
        sp = vals.get("sport")
        if sp and sp.strip() and out.sport is None:
            out.sport = sp.strip().lower()
        for role, raw in vals.items():
            if role.startswith("ch:"):
                v = _f(raw)
                if v is not None:
                    out.add_sample(role[3:], ts, v)
            elif role.startswith("maybe:"):
                v = _f(raw)
                if v is not None:
                    out.add_sample(role[6:], ts, v)  # custom channel
    return out


def _f(s) -> float | None:
    if s is None or s == "":
        return None
    try:
        v = float(s)
    except (TypeError, ValueError):
        return None
    return v


def encode_csv(
    points: pd.DataFrame, channels: pd.DataFrame | None = None,
    sport: str | None = None,
) -> bytes:
    """points + channels → CSV bytes, deterministic column order:
    time,lat,lon,ele then sorted channel names, then sport when given
    (csv_encoder.dart:8,76)."""
    ts = points["ts_us"].to_numpy(np.int64)
    lat = points["lat"].to_numpy(np.float64)
    lon = points["lon"].to_numpy(np.float64)
    ele = (
        points["ele"].to_numpy(np.float64)
        if "ele" in points
        else np.full(ts.size, np.nan)
    )
    ch_maps: dict[str, dict[int, float]] = {}
    if channels is not None and len(channels):
        for ch, g in channels.groupby("channel", observed=True):
            ch_maps[str(ch)] = dict(
                zip(g["ts_us"].astype("int64"), g["value"].astype(float))
            )
    names = sorted(ch_maps)
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["time", "lat", "lon", "ele"] + names + (["sport"] if sport else []))
    for i in range(ts.size):
        row = [
            us_to_iso(int(ts[i])),
            f"{lat[i]:.7f}",
            f"{lon[i]:.7f}",
            f"{ele[i]:.2f}" if np.isfinite(ele[i]) else "",
        ]
        for ch in names:
            v = ch_maps[ch].get(int(ts[i]))
            row.append(_numstr(v) if v is not None else "")
        if sport:
            row.append(sport)
        w.writerow(row)
    return buf.getvalue().encode()


def _numstr(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))
