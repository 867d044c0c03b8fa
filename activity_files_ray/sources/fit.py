"""FIT binary parser + encoder kernels.

Re-implemented from the PUBLIC Garmin FIT protocol description (file
header + CRC-16, definition/data record framing, base types, scale/
offset conventions) — NOT a port of the reference's 1.9k-line Dart
parser (``/root/reference/lib/src/parse/fit_parser.dart``), but
covering the same wire semantics the reference exercises
(SURVEY.md §2.1 S3/S9, §2.7):

* 12/14-byte header (+header CRC when present), trailing CRC-16
  (fit_parser.dart:59-233 analog; CRC table algorithm is the public
  FIT CRC, fit_crc.dart:7-46 analog).
* definition messages (local→global mapping, endianness, field list),
  data messages, compressed-timestamp headers
  (fit_parser.dart:243-253,1134-1142 analog).
* invalid-value sentinels decode to null and re-encode as sentinels
  (fit_parser.dart:1367-1381 / fit_encoder.dart:851-874 analog).
* unit conversions: semicircles→degrees ×180/2^31; altitude raw/5−500;
  speed raw/1000 m/s; distance raw/100 m; FIT epoch 1989-12-31
  (fit_parser.dart:1232-1365 analog; shared with functions/geo.py).

Message subset: file_id(0), session(18), lap(19), record(20),
event(21), device_info(23). Unknown globals/fields are skipped
field-accurately (never throws; diagnostics instead).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..functions import geo
from . import fit_profile
from .model import ParsedActivity

FIT_EPOCH_US = geo.FIT_EPOCH_UNIX_S * 1_000_000

# base type number → (struct char, size, invalid sentinel)
_BASE_TYPES = {
    0x00: ("B", 1, 0xFF),  # enum
    0x01: ("b", 1, 0x7F),  # sint8
    0x02: ("B", 1, 0xFF),  # uint8
    0x83: ("h", 2, 0x7FFF),  # sint16
    0x84: ("H", 2, 0xFFFF),  # uint16
    0x85: ("i", 4, 0x7FFFFFFF),  # sint32
    0x86: ("I", 4, 0xFFFFFFFF),  # uint32
    0x07: ("s", 1, None),  # string
    0x88: ("f", 4, None),  # float32
    0x89: ("d", 8, None),  # float64
    0x0A: ("B", 1, 0x00),  # uint8z
    0x8B: ("H", 2, 0x0000),  # uint16z
    0x8C: ("I", 4, 0x00000000),  # uint32z
    0x0D: ("B", 1, 0xFF),  # byte array
    0x8E: ("q", 8, 0x7FFFFFFFFFFFFFFF),  # sint64
    0x8F: ("Q", 8, 0xFFFFFFFFFFFFFFFF),  # uint64
    0x90: ("Q", 8, 0x0),  # uint64z
}

GLOBAL_FILE_ID = 0
GLOBAL_SESSION = 18
GLOBAL_LAP = 19
GLOBAL_RECORD = 20
GLOBAL_EVENT = 21
GLOBAL_DEVICE_INFO = 23
GLOBAL_ACTIVITY = 34
GLOBAL_FILE_CREATOR = 49
GLOBAL_LENGTH = 101  # per-pool-length record (SwimLength analog)
GLOBAL_SET = 225  # strength workout set (WorkoutSet analog)
GLOBAL_FIELD_DESCRIPTION = 206
GLOBAL_DEVELOPER_DATA_ID = 207

# channels with native record fields; anything else round-trips as a
# developer field (fit_parser.dart:805-835 / fit_encoder.dart:477-516
# semantics)
NATIVE_CHANNELS = {"heart_rate", "cadence", "power", "temperature", "speed", "distance"}


def _sanitize_field_name(name: str) -> str:
    """Developer-field name → snake_case channel id
    (fit_parser.dart:1167-1174 analog)."""
    import re as _re

    s = _re.sub(r"[^0-9a-zA-Z]+", "_", name.strip().lower()).strip("_")
    return s or "dev_field"

# record (global 20) field num → (name, kind)
_RECORD_FIELDS = {
    253: ("timestamp", "ts"),
    0: ("position_lat", "semicircles"),
    1: ("position_long", "semicircles"),
    2: ("altitude", "altitude"),
    78: ("enhanced_altitude", "altitude"),
    3: ("heart_rate", "raw"),
    4: ("cadence", "raw"),
    5: ("distance", "d100"),
    6: ("speed", "d1000"),
    73: ("enhanced_speed", "d1000"),
    7: ("power", "raw"),
    13: ("temperature", "raw"),
}

_SPORT_ENUM = {
    0: "unknown", 1: "running", 2: "cycling", 5: "swimming",
    11: "walking", 17: "hiking",
}
_SPORT_TO_ENUM = {v: k for k, v in _SPORT_ENUM.items()}


def crc16(data: bytes, crc: int = 0) -> int:
    """The public FIT CRC-16 (nibble-table) algorithm."""
    table = (
        0x0000, 0xCC01, 0xD801, 0x1400, 0xF001, 0x3C00, 0x2800, 0xE401,
        0xA001, 0x6C00, 0x7800, 0xB401, 0x5000, 0x9C01, 0x8801, 0x4400,
    )
    for b in data:
        tmp = table[crc & 0xF]
        crc = (crc >> 4) & 0x0FFF
        crc = crc ^ tmp ^ table[b & 0xF]
        tmp = table[crc & 0xF]
        crc = (crc >> 4) & 0x0FFF
        crc = crc ^ tmp ^ table[(b >> 4) & 0xF]
    return crc


class _FieldDef:
    __slots__ = ("num", "size", "base")

    def __init__(self, num: int, size: int, base: int):
        self.num = num
        self.size = size
        self.base = base & 0x9F  # mask endian-ability bit


class _MsgDef:
    __slots__ = ("global_num", "big_endian", "fields", "dev_fields", "total")

    def __init__(
        self,
        global_num: int,
        big_endian: bool,
        fields: list[_FieldDef],
        dev_fields: list[tuple[int, int, int]] | None = None,  # (num, size, ddi)
    ):
        self.global_num = global_num
        self.big_endian = big_endian
        self.fields = fields
        self.dev_fields = dev_fields or []
        self.total = sum(f.size for f in fields) + sum(
            sz for _n, sz, _d in self.dev_fields
        )


def parse_fit(
    data: bytes, activity_id: str, integrity: str = "report"
) -> ParsedActivity:
    """``integrity`` ∈ strict|report|silent (integrity_mode.dart:7-21):
    strict → CRC mismatch is an ERROR and parsing stops; report →
    warning diagnostics, parse continues (default); silent → CRC not
    checked."""
    assert integrity in ("strict", "report", "silent"), integrity
    out = ParsedActivity(activity_id)
    if len(data) < 12:
        out.diag("error", "fit.header.too_short", f"{len(data)} bytes", "")
        return out
    hdr_size = data[0]
    if hdr_size not in (12, 14) or data[8:12] != b".FIT":
        out.diag("error", "fit.header.invalid", "not a FIT header", "")
        return out
    if len(data) < hdr_size:
        # 12-byte buffer claiming a 14-byte header (fuzz-found)
        out.diag("error", "fit.header.too_short",
                 f"{len(data)} bytes < header size {hdr_size}", "")
        return out
    data_size = struct.unpack_from("<I", data, 4)[0]
    sev = "error" if integrity == "strict" else "warning"
    if hdr_size == 14 and integrity != "silent":
        hcrc = struct.unpack_from("<H", data, 12)[0]
        if hcrc != 0 and crc16(data[:12]) != hcrc:
            out.diag(sev, "fit.header.crc_mismatch", "header CRC invalid", "")
            if integrity == "strict":
                return out
    end = hdr_size + data_size
    if end + 2 <= len(data):
        if integrity != "silent":
            file_crc = struct.unpack_from("<H", data, end)[0]
            if crc16(data[:end]) != file_crc:
                out.diag(sev, "fit.trailer.crc_mismatch", "file CRC invalid", "")
                if integrity == "strict":
                    return out
    else:
        out.diag("warning", "fit.trailer.truncated", "missing trailing CRC", "")
        end = len(data)
    pos = hdr_size
    defs: dict[int, _MsgDef] = {}
    # (developer_data_index, field_num) → (channel_name, base_type) —
    # built IN STREAM ORDER from field_description messages
    # (fit_parser.dart:174-178,805-835 analog)
    dev_registry: dict[tuple[int, int], tuple[str, int]] = {}
    last_ts: int | None = None
    # compressed speed-distance accumulator state (one per file)
    csd = {"seen": False, "last_raw": 0, "accum": 0}
    while pos < end:
        hdr = data[pos]
        pos += 1
        if hdr & 0x80:  # compressed timestamp header
            local = (hdr >> 5) & 0x3
            offset = hdr & 0x1F
            mdef = defs.get(local)
            if mdef is None:
                out.diag("error", "fit.record.unknown_definition",
                         f"local {local} (compressed)", f"offset {pos}")
                break
            if last_ts is not None:
                # 5-bit rollover (public FIT compressed-timestamp rule)
                last_ts = last_ts + ((offset - (last_ts & 0x1F)) & 0x1F)
            pos, seen = _parse_data(data, pos, mdef, out, last_ts, dev_registry, csd)
            if pos < 0:
                break
            if seen is not None:
                last_ts = seen
            continue
        is_def = bool(hdr & 0x40)
        local = hdr & 0x0F
        if is_def:
            has_dev = bool(hdr & 0x20)
            if pos + 5 > end:
                out.diag("error", "fit.definition.truncated", "", f"offset {pos}")
                break
            big_endian = data[pos + 1] == 1
            endc = ">" if big_endian else "<"
            global_num = struct.unpack_from(endc + "H", data, pos + 2)[0]
            n_fields = data[pos + 4]
            pos += 5
            fields = []
            for _ in range(n_fields):
                if pos + 3 > end:
                    out.diag("error", "fit.definition.truncated", "", f"offset {pos}")
                    return out
                fields.append(_FieldDef(data[pos], data[pos + 1], data[pos + 2]))
                pos += 3
            dev_fields: list[tuple[int, int, int]] = []
            if has_dev:
                if pos >= end:
                    out.diag("error", "fit.definition.truncated", "", f"offset {pos}")
                    return out
                n_dev = data[pos]
                pos += 1
                for _ in range(n_dev):
                    # same truncation guard as the regular field loop:
                    # a file ending mid-dev-field-list must not read
                    # CRC bytes as definition bytes
                    if pos + 3 > end:
                        out.diag("error", "fit.definition.truncated", "", f"offset {pos}")
                        return out
                    # (field_num, size, developer_data_index)
                    dev_fields.append((data[pos], data[pos + 1], data[pos + 2]))
                    pos += 3
            defs[local] = _MsgDef(global_num, big_endian, fields, dev_fields)
        else:
            mdef = defs.get(local)
            if mdef is None:
                out.diag("error", "fit.record.unknown_definition",
                         f"local {local}", f"offset {pos}")
                break
            pos, seen = _parse_data(data, pos, mdef, out, None, dev_registry, csd)
            if pos < 0:
                break
            if seen is not None:
                last_ts = seen
    n_sessions = sum(1 for k in out.span_kind if k == "session")
    if n_sessions > 1:
        out.diag(
            "info", "fit.multi_session",
            f"Multi-session FIT file ({n_sessions} sessions); all sessions "
            "preserved as span rows", "fit.session",
        )
    return out


def _read_field(data: bytes, pos: int, f: _FieldDef, big_endian: bool):
    info = _BASE_TYPES.get(f.base)
    if info is None:
        return None
    ch, unit, invalid = info
    endc = ">" if big_endian else "<"
    if ch == "s":
        raw = data[pos : pos + f.size].split(b"\x00", 1)[0]
        try:
            return raw.decode("utf-8") or None
        except UnicodeDecodeError:
            return None
    n = f.size // unit
    if n * unit != f.size:
        return None
    try:
        vals = struct.unpack_from(endc + ch * n, data, pos)
    except struct.error:
        return None
    if f.base == 0x0D:
        # byte arrays keep RAW bytes (no per-element sentinel-nulling):
        # packed fields like compressed_speed_distance need every byte,
        # and the all-0xFF invalid check happens at the consumer
        # (fit_parser.dart:452-455 semantics)
        return list(vals) if n > 1 else vals[0]
    dec = [None if (invalid is not None and v == invalid) else v for v in vals]
    if n == 1:
        return dec[0]
    return dec


def _parse_data(
    data: bytes,
    pos: int,
    mdef: _MsgDef,
    out: ParsedActivity,
    comp_ts: int | None,
    dev_registry: dict[tuple[int, int], tuple[str, int]] | None = None,
    csd: dict | None = None,
) -> tuple[int, int | None]:
    """Returns (next_pos_or_-1, timestamp_seconds_seen_or_None)."""
    if pos + mdef.total > len(data):
        out.diag("error", "fit.record.truncated", "", f"offset {pos}")
        return -1, None
    vals: dict[int, object] = {}
    p = pos
    for f in mdef.fields:
        if f.num != 255:
            vals[f.num] = _read_field(data, p, f, mdef.big_endian)
        p += f.size
    dev_vals: dict[str, float] = {}
    registry = dev_registry or {}
    for num, size, ddi in mdef.dev_fields:
        entry = registry.get((ddi, num))
        if entry is not None:
            name, base = entry
            v = _read_field(data, p, _FieldDef(num, size, base), mdef.big_endian)
            if isinstance(v, (int, float)) and not (
                isinstance(v, float) and v != v  # NaN sentinel
            ):
                dev_vals[name] = float(v)
        p += size
    g = mdef.global_num
    if g == GLOBAL_FIELD_DESCRIPTION and dev_registry is not None:
        ddi_v, num_v, base_v = vals.get(0), vals.get(1), vals.get(2)
        name_v = vals.get(3)
        if (
            isinstance(ddi_v, int) and isinstance(num_v, int)
            and isinstance(base_v, int) and isinstance(name_v, str)
        ):
            dev_registry[(ddi_v, num_v)] = (
                _sanitize_field_name(name_v), base_v & 0x9F
            )
    elif g == GLOBAL_RECORD:
        _emit_record(vals, out, comp_ts, dev_vals, csd)
    elif g == GLOBAL_SESSION:
        _emit_span(vals, "session", out)
        sp = vals.get(5)
        # multi-session files (triathlons): the FIRST session's sport
        # becomes the activity sport; later sessions keep their own
        # per-span sport (fit_parser.dart:603-617 primarySessionSeen).
        # Unmapped FIT sport ids decode as 'other' (fit_sport.dart:24).
        if isinstance(sp, int) and csd is not None and not csd.get("primary_session"):
            csd["primary_session"] = True
            out.sport = _SPORT_ENUM.get(sp, "other")
    elif g == GLOBAL_LAP:
        _emit_span(vals, "lap", out)
    elif g == GLOBAL_EVENT:
        ts = vals.get(253)
        if isinstance(ts, int):
            out.span_kind.append("event")
            t_us = FIT_EPOCH_US + ts * 1_000_000
            out.span_start_us.append(t_us)
            out.span_end_us.append(t_us)
            out.span_sport.append(None)
            out.span_dist_m.append(None)
    elif g == GLOBAL_LENGTH:
        # start_time(2) + total_elapsed_time(3, ms/1000); per-length
        # swim stats: total_strokes(5), avg_speed(6, /1000),
        # swim_stroke(7), length_type(12; 0 idle, 1 active) —
        # SwimLength parity (fit_parser.dart:675-699)
        start = vals.get(2)
        if isinstance(start, int):
            elapsed = vals.get(3)
            s_us = FIT_EPOCH_US + start * 1_000_000
            e_us = s_us + (
                int(elapsed / 1000.0 * 1e6) if isinstance(elapsed, (int, float)) else 0
            )
            stats: dict = {}
            _put(stats, "total_strokes", vals.get(5))
            _put(stats, "avg_speed", vals.get(6), 1000.0)
            _put(stats, "swim_stroke", vals.get(7))
            lt = _num(vals.get(12))
            if lt is not None:
                stats["is_active"] = 1.0 if lt != 0 else 0.0
            while len(out.span_stats) < len(out.span_kind):
                out.span_stats.append({})
            out.span_kind.append("length")
            out.span_start_us.append(s_us)
            out.span_end_us.append(e_us)
            out.span_sport.append(None)
            out.span_dist_m.append(None)
            out.span_stats.append(stats)
    elif g == GLOBAL_SET:
        # start_time(6) + duration(0, ms/1000); repetitions(3) u16,
        # weight(4) u16 kg/16, set_type(5; 0 = rest), category(7)
        # (WorkoutSet reps/weightKg/isRest/exerciseCategoryId,
        # models.dart:365-437, fit_parser.dart:701-733)
        start = vals.get(6)
        if isinstance(start, int):
            dur = vals.get(0)
            s_us = FIT_EPOCH_US + start * 1_000_000
            e_us = s_us + (
                int(dur / 1000.0 * 1e6) if isinstance(dur, (int, float)) else 0
            )
            stats: dict = {}
            if isinstance(vals.get(3), int):
                stats["reps"] = float(vals[3])
            if isinstance(vals.get(4), int):
                stats["weight_kg"] = vals[4] / 16.0
            st = _num(vals.get(5))
            if st is not None:
                stats["is_active"] = 1.0 if st != 0 else 0.0
            _put(stats, "category", vals.get(7))
            while len(out.span_stats) < len(out.span_kind):
                out.span_stats.append({})
            out.span_kind.append("set")
            out.span_start_us.append(s_us)
            out.span_end_us.append(e_us)
            out.span_sport.append(None)
            out.span_dist_m.append(None)
            out.span_stats.append(stats)
    elif g == GLOBAL_FILE_ID:
        # manufacturer(1) u16, product(2) u16, serial(3) u32z,
        # product_name(8) string — resolved through the public FIT
        # manufacturer enum both for metadata and the creator string
        # (fit_parser.dart:517-556 analog)
        man = vals.get(1)
        product = vals.get(2)
        serial = vals.get(3)
        pname = vals.get(8)
        parts = ["FIT Device"]
        if isinstance(man, int):
            out.metadata["fit_manufacturer_id"] = str(man)
            name = fit_profile.manufacturer_name(man)
            out.metadata["manufacturer"] = name
            parts.append(name)
        if isinstance(product, int):
            out.metadata["fit_product_id"] = str(product)
            parts.append(f"p{product}")
        if isinstance(serial, int):
            out.metadata["fit_serial_number"] = str(serial)
            parts.append(f"s{serial}")
        if isinstance(pname, str) and pname.strip():
            out.metadata["model"] = pname.strip()
        out.creator = " ".join(parts)
    elif g == GLOBAL_DEVICE_INFO:
        # official profile: 0 device_index, 2 manufacturer,
        # 3 serial_number, 4 product, 5 software_version (scale 100),
        # 27 product_name. Only device_index 0 (the recording head
        # unit) — or messages omitting it — describes the device; a
        # paired sensor must not overwrite the head unit
        # (fit_parser.dart:730-768 parity).
        didx = vals.get(0)
        if not (isinstance(didx, int) and didx != 0):
            man = vals.get(2)
            if isinstance(man, int):
                out.metadata["fit_manufacturer_id"] = str(man)
                out.metadata["manufacturer"] = fit_profile.manufacturer_name(man)
            if isinstance(vals.get(3), int):
                out.metadata["fit_serial_number"] = str(vals[3])
            if isinstance(vals.get(4), int):
                out.metadata["fit_product_id"] = str(vals[4])
            sw = _format_sw_version(vals.get(5))
            if sw is not None:
                out.metadata["software_version"] = sw
            pname = vals.get(27)
            if isinstance(pname, str) and pname.strip():
                out.metadata["model"] = pname.strip()
    elif g == GLOBAL_ACTIVITY:
        # activity (34): field 0 is total_timer_time (s, scale 1000);
        # kept so files whose sessions lack a timer still round-trip
        # it (fit_parser.dart:769-776 analog)
        tt = _num(vals.get(0))
        if tt is not None and "fit_total_timer_s" not in out.metadata:
            out.metadata["fit_total_timer_s"] = repr(tt / 1000.0)
    elif g == GLOBAL_FILE_CREATOR:
        # file_creator (49): software_version(0) scale 100 overwrites
        # device_info's (fit_parser.dart:777-790)
        sw = _format_sw_version(vals.get(0))
        if sw is not None:
            out.metadata["software_version"] = sw
    ts_seen = vals.get(253)
    if g == GLOBAL_RECORD and ts_seen is None and comp_ts is not None:
        ts_seen = comp_ts
    return pos + mdef.total, (ts_seen if isinstance(ts_seen, int) else None)


def _emit_record(
    vals: dict, out: ParsedActivity, comp_ts: int | None,
    dev_vals: dict[str, float] | None = None,
    csd: dict | None = None,
) -> None:
    ts = vals.get(253)
    if ts is None:
        ts = comp_ts
    if not isinstance(ts, int):
        out.diag("warning", "fit.record.missing_timestamp", "record skipped", "")
        return
    ts_us = FIT_EPOCH_US + ts * 1_000_000
    lat_sc, lon_sc = vals.get(0), vals.get(1)
    if isinstance(lat_sc, int) and isinstance(lon_sc, int):
        lat = lat_sc * geo.SEMICIRCLE_TO_DEG
        lon = lon_sc * geo.SEMICIRCLE_TO_DEG
        alt = vals.get(78, vals.get(2))
        ele = (alt / 5.0 - 500.0) if isinstance(alt, (int, float)) else None
        out.add_point(ts_us, lat, lon, ele)
    for num, (name, kind) in _RECORD_FIELDS.items():
        if num in (253, 0, 1, 2, 78):
            continue
        v = vals.get(num)
        if v is None or not isinstance(v, (int, float)):
            continue
        if kind == "d100":
            out.add_sample("distance", ts_us, v / 100.0)
        elif kind == "d1000":
            out.add_sample("speed", ts_us, v / 1000.0)
        else:
            out.add_sample(name, ts_us, float(v))
    # legacy compressed_speed_distance (field 8, fit_parser.dart:448-472
    # analog): 3 bytes packing a 12-bit speed (scale 100, m/s) and a
    # 12-bit rolling distance-delta accumulator (scale 16, m). Used by
    # older ANT+/Garmin devices instead of the separate speed (6) and
    # distance (5) fields; explicit fields win.
    v8 = vals.get(8)
    if (
        csd is not None
        and isinstance(v8, list)
        and len(v8) >= 3
        and all(isinstance(b, int) for b in v8[:3])
        and not (v8[0] == 0xFF and v8[1] == 0xFF and v8[2] == 0xFF)
    ):
        packed = v8[0] | (v8[1] << 8) | (v8[2] << 16)
        speed_raw = packed & 0x0FFF
        dist_raw = (packed >> 12) & 0x0FFF
        if csd["seen"]:
            csd["accum"] += (dist_raw - csd["last_raw"]) & 0x0FFF
        csd["last_raw"] = dist_raw
        csd["seen"] = True
        has_speed = isinstance(vals.get(6), (int, float)) or isinstance(
            vals.get(73), (int, float)
        )
        if not has_speed and speed_raw != 0x0FFF:
            out.add_sample("speed", ts_us, speed_raw / 100.0)
        if not isinstance(vals.get(5), (int, float)):
            out.add_sample("distance", ts_us, csd["accum"] / 16.0)
    lrb = vals.get(120)
    if isinstance(lrb, (int, float)):
        out.add_sample("left_right_balance", ts_us, float(lrb))
    # unknown native record fields (e.g. running dynamics) are
    # preserved generically as fit_field_<n> channels with raw
    # unscaled values — no sensor data silently dropped; the encoder
    # re-emits them as native fields (fit_parser.dart:507-513 analog)
    for fnum, v in vals.items():
        if fnum in fit_profile.DEDICATED_RECORD_FIELDS:
            continue
        if isinstance(v, (int, float)):
            out.add_sample(f"fit_field_{fnum}", ts_us, float(v))
    for name, v in (dev_vals or {}).items():
        out.add_sample(name, ts_us, v)  # developer field → custom channel


def _num(v) -> float | None:
    return float(v) if isinstance(v, (int, float)) else None


def _format_sw_version(raw) -> str | None:
    """Scale-100 software version → display string ("9.75", "5.7",
    "21") — fit_parser.dart:1187-1204 formatting parity."""
    v = _num(raw)
    if v is None:
        return None
    scaled = v / 100.0
    if not np.isfinite(scaled) or scaled <= 0:
        return None
    s = f"{scaled:.2f}"
    if s.endswith("00"):
        return f"{scaled:.0f}"
    if s.endswith("0"):
        return f"{scaled:.1f}"
    return s


def _put(stats: dict, key: str, v, scale: float = 1.0) -> None:
    f = _num(v)
    if f is not None:
        stats[key] = f / scale


def _emit_span(vals: dict, kind: str, out: ParsedActivity) -> None:
    """Lap (global 19) / session (global 18) → span row with the FULL
    dedicated stat set of the public FIT profile plus open extras —
    the reference's Lap/ActivitySummary losslessness invariant
    (fit_parser.dart:558-656, models.dart:632-637,818-832). Field
    numbers DIFFER between the two messages (e.g. avg/max HR is 15/16
    on laps but 16/17 on sessions, where 15 is max_speed)."""
    start = vals.get(2)  # start_time
    total_elapsed = vals.get(7)  # ms /1000
    elapsed_us = (
        int(total_elapsed / 1000.0 * 1e6)
        if isinstance(total_elapsed, (int, float))
        else 0
    )
    if isinstance(start, int):
        s_us = FIT_EPOCH_US + start * 1_000_000
        e_us = s_us + elapsed_us
    elif kind == "session" and isinstance(vals.get(253), int):
        # session without start_time: the reference's ActivitySummary
        # is duration-only, so a real-world session carrying just
        # timestamp(253)+stats must not lose its summary
        # (fit_definition_robustness_test.dart) — derive the window
        # from the end timestamp
        e_us = FIT_EPOCH_US + vals[253] * 1_000_000
        s_us = e_us - elapsed_us
    else:
        return
    dist = vals.get(9)
    stats: dict = {}
    _put(stats, "calories", vals.get(11))  # total_calories kcal
    if kind == "session":
        sp = vals.get(5)
        dedicated = fit_profile.DEDICATED_SESSION_FIELDS
        _put(stats, "timer_time_s", vals.get(8), 1000.0)
        _put(stats, "avg_speed", vals.get(14), 1000.0)
        _put(stats, "max_speed", vals.get(15), 1000.0)
        _put(stats, "avg_hr", vals.get(16))
        _put(stats, "max_hr", vals.get(17))
        _put(stats, "avg_cadence", vals.get(18))
        _put(stats, "max_cadence", vals.get(19))
        _put(stats, "avg_power", vals.get(20))
        _put(stats, "max_power", vals.get(21))
        _put(stats, "total_cycles", vals.get(10))
        _put(stats, "avg_stroke_count", vals.get(41), 10.0)
        _put(stats, "swim_stroke", vals.get(43))
        _put(stats, "pool_length_m", vals.get(44), 100.0)
        _put(stats, "num_active_lengths", vals.get(47))
        sub = _num(vals.get(6))
        if sub is not None and sub != 0:  # 0 = generic → absent
            stats["sub_sport"] = sub
    else:
        sp = vals.get(25)
        dedicated = fit_profile.DEDICATED_LAP_FIELDS
        _put(stats, "avg_speed", vals.get(13), 1000.0)
        _put(stats, "max_speed", vals.get(14), 1000.0)
        _put(stats, "avg_hr", vals.get(15))
        _put(stats, "max_hr", vals.get(16))
        _put(stats, "avg_cadence", vals.get(17))
        _put(stats, "max_cadence", vals.get(18))
        _put(stats, "avg_power", vals.get(19))
        _put(stats, "max_power", vals.get(20))
        _put(stats, "event", vals.get(0))
        _put(stats, "event_type", vals.get(1))
        _put(stats, "swim_stroke", vals.get(38))
        _put(stats, "num_active_lengths", vals.get(40))
    # open catch-all: every numeric native field with no dedicated
    # property is preserved raw (unscaled wire value), scalars and
    # arrays separately (fit_parser.dart:1057-1089 analog)
    extra_fields: dict[int, float] = {}
    extra_arrays: dict[int, list[float]] = {}
    for fnum, v in vals.items():
        if fnum in dedicated:
            continue
        if isinstance(v, (int, float)):
            extra_fields[fnum] = float(v)
        elif isinstance(v, list):
            elems = [float(x) for x in v if isinstance(x, (int, float))]
            if elems and len(elems) == len(v):
                extra_arrays[fnum] = elems
    if extra_fields:
        stats["extra_fields"] = extra_fields
    if extra_arrays:
        stats["extra_arrays"] = extra_arrays
    while len(out.span_stats) < len(out.span_kind):
        out.span_stats.append({})
    out.span_kind.append(kind)
    out.span_start_us.append(s_us)
    out.span_end_us.append(e_us)
    out.span_sport.append(_SPORT_ENUM.get(sp) if isinstance(sp, int) else None)
    out.span_dist_m.append(dist / 100.0 if isinstance(dist, (int, float)) else None)
    out.span_stats.append(stats)


# --- encoder -----------------------------------------------------------------


# (size, base) → (struct char, invalid sentinel, max encodable)
_ENC_TYPES = {
    (1, 0x00): ("B", 0xFF, 0xFE),  # enum
    (1, 0x02): ("B", 0xFF, 0xFE),  # uint8
    (2, 0x84): ("H", 0xFFFF, 0xFFFE),  # uint16
    (4, 0x86): ("I", 0xFFFFFFFF, 0xFFFFFFFE),  # uint32
    (4, 0x85): ("i", 0x7FFFFFFF, 0x7FFFFFFE),  # sint32
}


# dedicated stat layouts: (field_num, size, base, stat_key, wire_scale)
# — stat values are stored in engine units (m/s, s, m, strokes); the
# wire carries value × scale per the public profile
_LAP_STATS = (
    (11, 2, 0x84, "calories", 1.0),
    (13, 2, 0x84, "avg_speed", 1000.0),
    (14, 2, 0x84, "max_speed", 1000.0),
    (15, 1, 0x02, "avg_hr", 1.0),
    (16, 1, 0x02, "max_hr", 1.0),
    (17, 1, 0x02, "avg_cadence", 1.0),
    (18, 1, 0x02, "max_cadence", 1.0),
    (19, 2, 0x84, "avg_power", 1.0),
    (20, 2, 0x84, "max_power", 1.0),
    (0, 1, 0x00, "event", 1.0),
    (1, 1, 0x00, "event_type", 1.0),
    (38, 1, 0x00, "swim_stroke", 1.0),
    (40, 2, 0x84, "num_active_lengths", 1.0),
)
_SESSION_STATS = (
    (8, 4, 0x86, "timer_time_s", 1000.0),
    (11, 2, 0x84, "calories", 1.0),
    (14, 2, 0x84, "avg_speed", 1000.0),
    (15, 2, 0x84, "max_speed", 1000.0),
    (16, 1, 0x02, "avg_hr", 1.0),
    (17, 1, 0x02, "max_hr", 1.0),
    (18, 1, 0x02, "avg_cadence", 1.0),
    (19, 1, 0x02, "max_cadence", 1.0),
    (20, 2, 0x84, "avg_power", 1.0),
    (21, 2, 0x84, "max_power", 1.0),
    (10, 4, 0x86, "total_cycles", 1.0),
    (41, 2, 0x84, "avg_stroke_count", 10.0),
    (43, 1, 0x00, "swim_stroke", 1.0),
    (44, 2, 0x84, "pool_length_m", 100.0),
    (47, 2, 0x84, "num_active_lengths", 1.0),
    (6, 1, 0x00, "sub_sport", 1.0),
)


def _pack_stat(value, size: int, base: int, scale: float = 1.0) -> bytes:
    """One stat → wire bytes; None/NaN/unencodable → invalid sentinel."""
    ch, invalid, vmax = _ENC_TYPES[(size, base)]
    try:
        fv = float(value) * scale
    except (TypeError, ValueError):
        return struct.pack("<" + ch, invalid)
    if not np.isfinite(fv):
        return struct.pack("<" + ch, invalid)
    iv = int(round(fv))
    lo = -0x7FFFFFFF if ch == "i" else 0
    iv = max(lo, min(vmax, iv))
    return struct.pack("<" + ch, iv)


def _span_extras_layout(rows) -> tuple[list, list]:
    """Union-of-keys shared field layout for a set of span rows'
    extra_fields / extra_arrays JSON maps (fit_encoder.dart:1293-1346
    analog): scalar extras → one 4-byte int each (signed when any
    source value is negative), array extras → count contiguous 4-byte
    ints sized to the longest array (shorter messages pad with
    sentinels). Returns (scalar_layout [(num, base)], array_layout
    [(num, base, count)]), both sorted by field number."""
    from .model import loads_extras

    signed: dict[int, bool] = {}
    asigned: dict[int, bool] = {}
    acount: dict[int, int] = {}
    for r in rows:
        for num, v in loads_extras(r.get("extra_fields")).items():
            signed[num] = signed.get(num, False) or float(v) < 0
        for num, arr in loads_extras(r.get("extra_arrays")).items():
            asigned[num] = asigned.get(num, False) or any(float(x) < 0 for x in arr)
            acount[num] = max(acount.get(num, 0), len(arr))
    scalar = [(n, 0x85 if signed[n] else 0x86) for n in sorted(signed)]
    arrays = [
        (n, 0x85 if asigned[n] else 0x86, acount[n]) for n in sorted(acount)
    ]
    return scalar, arrays


def _pack_extras(r, scalar_layout, array_layout) -> bytes:
    from .model import loads_extras

    out = bytearray()
    ef = loads_extras(r.get("extra_fields"))
    for num, base in scalar_layout:
        out += _pack_stat(ef.get(num), 4, base)
    ea = loads_extras(r.get("extra_arrays"))
    for num, base, count in array_layout:
        arr = ea.get(num) or []
        for i in range(count):
            out += _pack_stat(arr[i] if i < len(arr) else None, 4, base)
    return bytes(out)


def encode_fit(
    points: pd.DataFrame,
    channels: pd.DataFrame | None = None,
    sport: str | None = None,
    manufacturer_id: int = 255,  # 'development'
    spans: pd.DataFrame | None = None,
    device: dict | None = None,
) -> bytes:
    """points + channels → FIT bytes (file_id + record stream +
    session + CRC). Channels are joined per exact record timestamp;
    nulls encode as sentinels."""
    ts = points["ts_us"].to_numpy(np.int64)
    lat = points["lat"].to_numpy(np.float64)
    lon = points["lon"].to_numpy(np.float64)
    ele = (
        points["ele"].to_numpy(np.float64)
        if "ele" in points
        else np.full(ts.size, np.nan)
    )
    ch: dict[str, dict[int, float]] = {}
    if channels is not None and len(channels):
        for name, g in channels.groupby("channel", observed=True):
            ch[str(name)] = dict(
                zip(g["ts_us"].astype("int64"), g["value"].astype(float))
            )
    if ts.size == 0 and ch:
        # O2 (fit_encoder.dart:649-658): no points → the record grid
        # is the sorted UNION of all channel timestamps; positions
        # encode as invalid sentinels
        ts = np.unique(
            np.concatenate([np.fromiter(m.keys(), dtype=np.int64) for m in ch.values()])
        )
        lat = np.full(ts.size, np.nan)
        lon = np.full(ts.size, np.nan)
        ele = np.full(ts.size, np.nan)
    body = bytearray()
    # file_id definition (local 0): type(0) enum, manufacturer(1) u16
    body += bytes([0x40, 0, 0, 0, 0, 2, 0, 1, 0x00, 1, 2, 0x84])
    body += bytes([0x00, 4])  # type=4 activity
    body += struct.pack("<H", manufacturer_id)
    if device:
        # device_info (global 23, local 9): device_index(0)=0 head
        # unit, manufacturer(2), serial(3), product(4),
        # software_version(5, ×100), product_name(27) — so device
        # metadata (incl. V6 inputs) survives FIT->FIT
        body += bytes([0x49, 0, 0, 23, 0, 6,
                       0, 1, 0x02, 2, 2, 0x84, 3, 4, 0x8C,
                       4, 2, 0x84, 5, 2, 0x84, 27, 32, 0x07])
        body += bytes([0x09, 0])  # device_index 0
        mid = device.get("fit_manufacturer_id", manufacturer_id)
        body += _pack_stat(mid, 2, 0x84)
        serial = device.get("fit_serial_number")
        try:
            body += struct.pack("<I", int(serial) & 0xFFFFFFFF)
        except (TypeError, ValueError):
            body += struct.pack("<I", 0)  # uint32z invalid
        body += _pack_stat(device.get("fit_product_id"), 2, 0x84)
        sw = device.get("software_version")
        try:
            body += _pack_stat(float(sw), 2, 0x84, 100.0)
        except (TypeError, ValueError):
            body += struct.pack("<H", 0xFFFF)
        nb = str(device.get("model") or "").encode("utf-8")[:31]
        body += nb + b"\x00" * (32 - len(nb))
    # ``fit_field_<n>`` channels are captured native record fields —
    # re-emitted as native 4-byte int fields at their original field
    # number, NOT as developer fields (fit_encoder.dart:1246-1279
    # analog); signed when any value is negative
    native_extra: list[tuple[int, int]] = []  # (field_num, base)
    for name in sorted(ch):
        if name.startswith("fit_field_"):
            try:
                fnum = int(name[len("fit_field_"):])
            except ValueError:
                continue
            if 0 <= fnum <= 255 and fnum not in fit_profile.DEDICATED_RECORD_FIELDS:
                has_neg = any(v < 0 for v in ch[name].values())
                native_extra.append((fnum, 0x85 if has_neg else 0x86))
    # custom (non-native) channels become developer fields
    # (fit_encoder.dart:477-516,745-762 analog): declare a
    # developer_data_id + one field_description per custom channel,
    # then extend the record definition with float64 dev fields
    custom = sorted(
        name
        for name in ch
        if name not in NATIVE_CHANNELS
        and not (
            name.startswith("fit_field_")
            and any(f"fit_field_{n}" == name for n, _b in native_extra)
        )
    )
    if custom:
        # developer_data_id (global 207): developer_data_index(3) u8
        body += bytes([0x45, 0, 0, 207, 0, 1, 3, 1, 0x02])
        body += bytes([0x05, 0])
        # field_description (global 206): ddi(0) u8, field_num(1) u8,
        # base_type(2) u8, field_name(3) string[32], units(8) string[8]
        body += bytes(
            [0x46, 0, 0, 206, 0, 5, 0, 1, 0x02, 1, 1, 0x02, 2, 1, 0x02,
             3, 32, 0x07, 8, 8, 0x07]
        )
        for i, name in enumerate(custom):
            body += bytes([0x06, 0, i, 0x89])  # ddi=0, num=i, float64
            nb = name.encode("utf-8")[:31]
            body += nb + b"\x00" * (32 - len(nb))
            body += b"\x00" * 8  # units blank
    # record definition (local 1): ts u32, lat i32, lon i32, alt u16,
    # dist u32, speed u16, hr u8, cad u8, power u16, temp i8
    rec_fields = [
        (253, 4, 0x86), (0, 4, 0x85), (1, 4, 0x85), (2, 2, 0x84),
        (5, 4, 0x86), (6, 2, 0x84), (3, 1, 0x02), (4, 1, 0x02),
        (7, 2, 0x84), (13, 1, 0x01),
    ] + [(fnum, 4, base) for fnum, base in native_extra]
    hdr_bits = 0x61 if custom else 0x41  # dev-data bit when needed
    body += bytes([hdr_bits, 0, 0, 20, 0, len(rec_fields)])
    for num, size, base in rec_fields:
        body += bytes([num, size, base])
    if custom:
        body += bytes([len(custom)])
        for i in range(len(custom)):
            body += bytes([i, 8, 0])  # (field_num=i, size=8, ddi=0)
    for i in range(ts.size):
        t = int(ts[i])
        fit_ts = (t - FIT_EPOCH_US) // 1_000_000
        body += bytes([0x01])
        body += struct.pack("<I", fit_ts & 0xFFFFFFFF)
        if np.isfinite(lat[i]) and np.isfinite(lon[i]):
            body += struct.pack("<i", int(round(lat[i] / geo.SEMICIRCLE_TO_DEG)))
            body += struct.pack("<i", int(round(lon[i] / geo.SEMICIRCLE_TO_DEG)))
        else:
            body += struct.pack("<i", 0x7FFFFFFF)  # invalid sentinels
            body += struct.pack("<i", 0x7FFFFFFF)
        body += struct.pack(
            "<H",
            0xFFFF
            if not np.isfinite(ele[i])
            else max(0, min(0xFFFE, int(round((ele[i] + 500.0) * 5.0)))),
        )
        d = ch.get("distance", {}).get(t)
        body += struct.pack(
            "<I", 0xFFFFFFFF if d is None else int(round(d * 100.0)) & 0xFFFFFFFF
        )
        s = ch.get("speed", {}).get(t)
        body += struct.pack(
            "<H", 0xFFFF if s is None else max(0, min(0xFFFE, int(round(s * 1000.0))))
        )
        hr = ch.get("heart_rate", {}).get(t)
        body += bytes([0xFF if hr is None else max(0, min(0xFE, int(round(hr))))])
        cad = ch.get("cadence", {}).get(t)
        body += bytes([0xFF if cad is None else max(0, min(0xFE, int(round(cad))))])
        pw = ch.get("power", {}).get(t)
        body += struct.pack(
            "<H", 0xFFFF if pw is None else max(0, min(0xFFFE, int(round(pw))))
        )
        tmp = ch.get("temperature", {}).get(t)
        body += struct.pack(
            "<b", 0x7F if tmp is None else max(-127, min(126, int(round(tmp))))
        )
        for fnum, base in native_extra:
            body += _pack_stat(ch.get(f"fit_field_{fnum}", {}).get(t), 4, base)
        for name in custom:
            v = ch.get(name, {}).get(t)
            body += struct.pack("<d", float("nan") if v is None else float(v))
    # lap messages (local 3) + event messages (local 4) from spans
    if spans is not None and len(spans):
        laps = spans[spans["kind"] == "lap"] if "kind" in spans.columns else spans
        if len(laps):
            # lap def (local 3): start_time(2), total_elapsed(7) ms,
            # total_distance(9) cm, sport(25), then the FULL dedicated
            # lap stat set of the public profile plus the union-of-keys
            # extras layout (fit_encoder.dart:1293-1346 parity)
            lap_rows = [r for _, r in laps.iterrows()]
            ex_scalar, ex_arrays = _span_extras_layout(lap_rows)
            def_fields = (
                [(2, 4, 0x86), (7, 4, 0x86), (9, 4, 0x86), (25, 1, 0x00)]
                + [(num, size, base) for num, size, base, _k, _s in _LAP_STATS]
                + [(num, 4, base) for num, base in ex_scalar]
                + [(num, 4 * count, base) for num, base, count in ex_arrays]
            )
            body += bytes([0x43, 0, 0, 19, 0, len(def_fields)])
            for num, size, base in def_fields:
                body += bytes([num, size, base])
            for r in lap_rows:
                s_us, e_us = int(r["start_us"]), int(r["end_us"])
                body += bytes([0x03])
                body += struct.pack("<I", ((s_us - FIT_EPOCH_US) // 1_000_000) & 0xFFFFFFFF)
                body += struct.pack("<I", ((e_us - s_us) // 1000) & 0xFFFFFFFF)
                body += _pack_stat(r.get("dist_m"), 4, 0x86, 100.0)
                sp = r.get("sport")
                body += bytes([_SPORT_TO_ENUM.get(sp if isinstance(sp, str) else "", 0)])
                for _num, size, base, key, scale in _LAP_STATS:
                    body += _pack_stat(r.get(key), size, base, scale)
                body += _pack_extras(r, ex_scalar, ex_arrays)
        lengths = spans[spans["kind"] == "length"] if "kind" in spans.columns else spans.iloc[0:0]
        if len(lengths):
            # length def (local 7): start_time(2) u32, total_elapsed(3)
            # u32 ms, total_strokes(5) u16, avg_speed(6) u16/1000,
            # swim_stroke(7) enum, length_type(12) enum
            body += bytes([0x47, 0, 0, 101, 0, 6, 2, 4, 0x86, 3, 4, 0x86,
                           5, 2, 0x84, 6, 2, 0x84, 7, 1, 0x00, 12, 1, 0x00])
            for _, r in lengths.iterrows():
                s_us, e_us = int(r["start_us"]), int(r["end_us"])
                body += bytes([0x07])
                body += struct.pack("<I", ((s_us - FIT_EPOCH_US) // 1_000_000) & 0xFFFFFFFF)
                body += struct.pack("<I", ((e_us - s_us) // 1000) & 0xFFFFFFFF)
                body += _pack_stat(r.get("total_strokes"), 2, 0x84)
                body += _pack_stat(r.get("avg_speed"), 2, 0x84, 1000.0)
                body += _pack_stat(r.get("swim_stroke"), 1, 0x00)
                body += _pack_stat(r.get("is_active"), 1, 0x00)
        sets_df = spans[spans["kind"] == "set"] if "kind" in spans.columns else spans.iloc[0:0]
        if len(sets_df):
            # set def (local 8): start_time(6) u32, duration(0) u32 ms,
            # repetitions(3) u16, weight(4) u16 (kg*16),
            # set_type(5) enum, category(7) u16
            body += bytes([0x48, 0, 0, 225, 0, 6, 6, 4, 0x86, 0, 4, 0x86,
                           3, 2, 0x84, 4, 2, 0x84, 5, 1, 0x00, 7, 2, 0x84])
            for _, r in sets_df.iterrows():
                s_us, e_us = int(r["start_us"]), int(r["end_us"])
                body += bytes([0x08])
                body += struct.pack("<I", ((s_us - FIT_EPOCH_US) // 1_000_000) & 0xFFFFFFFF)
                body += struct.pack("<I", ((e_us - s_us) // 1000) & 0xFFFFFFFF)

                def _u16(v, scale=1.0):
                    try:
                        fv = float(v)
                    except (TypeError, ValueError):
                        return 0xFFFF
                    if not np.isfinite(fv):
                        return 0xFFFF
                    return min(0xFFFE, int(round(fv * scale)))

                body += struct.pack("<H", _u16(r.get("reps")))
                body += struct.pack("<H", _u16(r.get("weight_kg"), 16.0))
                body += _pack_stat(r.get("is_active"), 1, 0x00)
                body += _pack_stat(r.get("category"), 2, 0x84)
        events = spans[spans["kind"] == "event"] if "kind" in spans.columns else spans.iloc[0:0]
        if len(events):
            # event def: timestamp(253) u32, event(0) enum, event_type(1) enum
            body += bytes([0x44, 0, 0, 21, 0, 3, 253, 4, 0x86, 0, 1, 0x00, 1, 1, 0x00])
            for _, r in events.iterrows():
                body += bytes([0x04])
                body += struct.pack(
                    "<I", ((int(r["start_us"]) - FIT_EPOCH_US) // 1_000_000) & 0xFFFFFFFF
                )
                body += bytes([0, 0])  # timer start
    # session definition (local 2): start_time(2), total_elapsed(7) ms,
    # total_distance(9) cm, sport(5), then the full dedicated session
    # stat set (NOTE the shifted field numbers vs laps: avg/max HR is
    # 16/17 here; 15 is max_speed) plus the shared extras layout
    explicit_sessions = (
        spans[spans["kind"] == "session"]
        if spans is not None and len(spans) and "kind" in spans.columns
        else None
    )
    sess_rows = (
        [r for _, r in explicit_sessions.iterrows()]
        if explicit_sessions is not None and len(explicit_sessions)
        else []
    )
    ex_scalar, ex_arrays = _span_extras_layout(sess_rows)
    def_fields = (
        [(2, 4, 0x86), (7, 4, 0x86), (9, 4, 0x86), (5, 1, 0x00)]
        + [(num, size, base) for num, size, base, _k, _s in _SESSION_STATS]
        + [(num, 4, base) for num, base in ex_scalar]
        + [(num, 4 * count, base) for num, base, count in ex_arrays]
    )
    body += bytes([0x42, 0, 0, 18, 0, len(def_fields)])
    for num, size, base in def_fields:
        body += bytes([num, size, base])
    if sess_rows:
        # multi-session files (additionalSessions analog,
        # models.dart:1253): one session message per span row
        for r in sess_rows:
            s_us, e_us = int(r["start_us"]), int(r["end_us"])
            body += bytes([0x02])
            body += struct.pack("<I", ((s_us - FIT_EPOCH_US) // 1_000_000) & 0xFFFFFFFF)
            body += struct.pack("<I", ((e_us - s_us) // 1000) & 0xFFFFFFFF)
            body += _pack_stat(r.get("dist_m"), 4, 0x86, 100.0)
            sp_v = r.get("sport")
            body += bytes([_SPORT_TO_ENUM.get(sp_v if isinstance(sp_v, str) else "", 0)])
            for _num, size, base, key, scale in _SESSION_STATS:
                body += _pack_stat(r.get(key), size, base, scale)
            body += _pack_extras(r, ex_scalar, ex_arrays)
    elif ts.size:
        start_fit = (int(ts[0]) - FIT_EPOCH_US) // 1_000_000
        elapsed_ms = int((ts[-1] - ts[0]) // 1000)
        dist_vals = ch.get("distance", {})
        total_d = max(dist_vals.values()) if dist_vals else None
        body += bytes([0x02])
        body += struct.pack("<I", start_fit & 0xFFFFFFFF)
        body += struct.pack("<I", elapsed_ms & 0xFFFFFFFF)
        body += _pack_stat(total_d, 4, 0x86, 100.0)
        body += bytes([_SPORT_TO_ENUM.get(sport or "", 0)])
        for _num, size, base, _key, _scale in _SESSION_STATS:
            body += _pack_stat(None, size, base)
    header = struct.pack("<BBHI4s", 14, 0x10, 2140, len(body), b".FIT")
    header += struct.pack("<H", crc16(header))
    blob = header + bytes(body)
    return blob + struct.pack("<H", crc16(blob))
