"""GPX parser + encoder kernels.

Semantics from the reference's GPX handling (``/root/reference/lib/
src/parse/gpx_parser.dart:60-450``, encoder ``lib/src/encode/
gpx_encoder.dart:13-491``), re-implemented from the public GPX 1.1
spec — NOT a port:

* trk/trkseg/trkpt with lat/lon attributes, ele, time children;
  multi-segment tracking via segment-start indices
  (models.dart:1270); skip-and-diagnose on missing lat/lon.
* Garmin TPX extensions → channels (hr, cad, atemp, power — the
  reference maps TPX tags to channels, gpx_parser.dart:34-46).
* waypoints (wpt) and routes (rte) counted/preserved.
* Encoder: GPX 1.1, points re-split by segments, channels re-joined
  onto points by nearest-timestamp within tolerance (the J1 as-of
  join, gpx_encoder.dart:139-156,205-215), 7-decimal lat/lon and
  2-decimal ele rounding (gpx_encoder.dart:219-231,429).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

from .model import ParsedActivity, iso_to_us, us_to_iso

# TPX/extension tag (localname, lowercased) → channel id
_EXT_CHANNELS = {
    "hr": "heart_rate",
    "heartrate": "heart_rate",
    "cad": "cadence",
    "cadence": "cadence",
    "atemp": "temperature",
    "temp": "temperature",
    "wtemp": "water_temperature",
    "power": "power",
    "watts": "power",
    "speed": "speed",
    "depth": "depth",
    "course": "course",
    "bearing": "bearing",
}

_SPORT_WORDS = {
    "running": "running", "run": "running",
    "cycling": "cycling", "biking": "cycling", "bike": "cycling", "ride": "cycling",
    "swimming": "swimming", "swim": "swimming",
    "hiking": "hiking", "hike": "hiking",
    "walking": "walking", "walk": "walking",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_gpx(data: bytes, activity_id: str) -> ParsedActivity:
    out = ParsedActivity(activity_id)
    try:
        root = ET.fromstring(data)
    except (ET.ParseError, LookupError, ValueError) as e:
        # LookupError: corrupted encoding= declaration (fuzz-found)
        out.diag("error", "gpx.parse.invalid_xml", str(e), "")
        return out
    if _local(root.tag) != "gpx":
        out.diag("error", "gpx.parse.not_gpx", f"root element {root.tag}", "")
        return out
    out.creator = root.get("creator")
    meta_trees: list = []
    trk_trees: list = []
    for child in root:
        loc = _local(child.tag)
        if loc == "metadata":
            for m in child:
                if _local(m.tag) == "name" and m.text:
                    out.name = m.text
                elif _local(m.tag) == "time" and m.text:
                    out.metadata["time"] = m.text
                elif _local(m.tag) == "extensions":
                    # file-level foreign extensions survive losslessly
                    # (gpxMetadataExtensions, gpx_parser.dart:101-116)
                    meta_trees.extend(_node_to_tree(c) for c in m)
        elif loc == "extensions":
            # top-level <gpx><extensions> also belongs to the file
            meta_trees.extend(_node_to_tree(c) for c in child)
        elif loc == "wpt":
            out.n_waypoints += 1
            wp = _parse_simple_point(child)
            if wp is not None:
                out.waypoints.append(wp)
        elif loc == "rte":
            out.n_routes += 1
            out.routes.append(_parse_rte(child))
        elif loc == "trk":
            _parse_trk(child, out, trk_trees)
    if meta_trees:
        import json as _json

        out.metadata["gpx_meta_ext"] = _json.dumps(meta_trees)
    if trk_trees:
        import json as _json

        out.metadata["gpx_trk_ext"] = _json.dumps(trk_trees)
    if out.sport is None and out.name:
        for w in re.findall(r"\w+", out.name.lower()):
            if w in _SPORT_WORDS:
                out.sport = _SPORT_WORDS[w]
                break
    _add_segment_pseudo_laps(out)
    return out


def _add_segment_pseudo_laps(out: ParsedActivity) -> None:
    """Per-segment pseudo-laps with haversine distance (the
    reference's GPX lap synthesis, gpx_parser.dart:320-329 / A3):
    each trkseg becomes one lap span spanning its points."""
    if len(out.segment_starts) < 2:
        return  # single segment: no pseudo-laps (whole track is one)
    from ..functions import geo

    bounds = sorted(out.segment_starts) + [len(out.ts_us)]
    lat = np.asarray(out.lat, dtype=np.float64)
    lon = np.asarray(out.lon, dtype=np.float64)
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        if hi - lo < 1:
            continue
        seg_d = float(
            geo.haversine_m(lat[lo : hi - 1], lon[lo : hi - 1], lat[lo + 1 : hi], lon[lo + 1 : hi]).sum()
        ) if hi - lo > 1 else 0.0
        while len(out.span_stats) < len(out.span_kind):
            out.span_stats.append({})
        out.span_kind.append("lap")
        out.span_start_us.append(int(out.ts_us[lo]))
        out.span_end_us.append(int(out.ts_us[hi - 1]))
        out.span_sport.append(out.sport)
        out.span_dist_m.append(seg_d)
        out.span_stats.append({})


def _parse_trk(trk, out: ParsedActivity, trk_trees: list | None = None) -> None:
    for child in trk:
        loc = _local(child.tag)
        if loc == "name" and child.text and out.name is None:
            out.name = child.text
        elif loc == "type" and child.text:
            out.sport = _SPORT_WORDS.get(child.text.strip().lower(), out.sport)
        elif loc == "extensions" and trk_trees is not None:
            # track-level foreign extensions (trackExtensions analog)
            trk_trees.extend(_node_to_tree(c) for c in child)
        elif loc == "trkseg":
            seg_start = len(out.ts_us)
            n_before = len(out.ts_us)
            for pt in child:
                if _local(pt.tag) == "trkpt":
                    _parse_trkpt(pt, out)
            if len(out.ts_us) > n_before:
                out.segment_starts.append(seg_start)


def _parse_trkpt(pt, out: ParsedActivity) -> None:
    lat_s, lon_s = pt.get("lat"), pt.get("lon")
    if lat_s is None or lon_s is None:
        out.diag(
            "warning", "gpx.point.missing_coordinate",
            "trkpt without lat/lon skipped", f"points[{len(out.ts_us)}]",
        )
        return
    try:
        lat, lon = float(lat_s), float(lon_s)
    except ValueError:
        out.diag(
            "warning", "gpx.point.invalid_coordinate",
            f"unparseable lat/lon {lat_s!r},{lon_s!r}", f"points[{len(out.ts_us)}]",
        )
        return
    ele = None
    ts = None
    ext_samples: list[tuple[str, float]] = []
    foreign: list = []
    attrs: dict = {}
    bad_ext: list = []
    for c in pt:
        loc = _local(c.tag)
        if loc == "ele" and c.text:
            try:
                ele = float(c.text)
            except ValueError:
                out.diag("warning", "gpx.point.invalid_elevation", c.text, "")
        elif loc == "time" and c.text:
            ts = iso_to_us(c.text)
            if ts is None:
                out.diag("warning", "gpx.point.invalid_time", c.text, "")
        elif loc == "extensions":
            _collect_ext(c, ext_samples, foreign, bad=bad_ext)
        elif loc in _POINT_ATTR_TAGS and c.text and c.text.strip():
            attrs[loc] = c.text.strip()
    if ts is None:
        # pointless without time for a time-series engine: keep the
        # point with a synthetic monotone time? The reference keeps
        # points without time only for route-like data; we mirror the
        # skip-and-diagnose path.
        out.diag(
            "warning", "gpx.point.missing_time",
            "trkpt without <time> skipped", f"points[{len(out.ts_us)}]",
        )
        return
    out.add_point(ts, lat, lon, ele)
    if foreign:
        import json as _json

        out.point_ext[len(out.ts_us) - 1] = _json.dumps(
            foreign, sort_keys=True, separators=(",", ":")
        )
    if attrs:
        out.point_attrs[len(out.ts_us) - 1] = attrs
    for tag, txt in bad_ext:
        out.diag(
            "warning", "gpx.extension.invalid_number",
            f"unparsable extension value {txt!r} for {tag}",
            f"points[{len(out.ts_us) - 1}].extensions.{tag}",
        )
    for name, val in ext_samples:
        out.add_sample(name, ts, val)


_CONTAINER_TAGS = {"trackpointextension"}  # known channel wrappers

# standard GPX wpt_t child elements preserved verbatim per point
# (gpx_parser.dart:14-31 gpxAttributes), in SCHEMA ORDER for
# deterministic re-emission (ele/time/extensions handled separately)
_POINT_ATTR_ORDER = (
    "magvar", "geoidheight", "name", "cmt", "desc", "src", "sym",
    "type", "fix", "sat", "hdop", "vdop", "pdop", "ageofdgpsdata",
    "dgpsid",
)
_POINT_ATTR_TAGS = frozenset(_POINT_ATTR_ORDER)


def _collect_ext(
    node,
    acc: list,
    foreign: list | None = None,
    in_container: bool = False,
    bad: list | None = None,
) -> None:
    for c in node:
        loc = _local(c.tag)
        ch = _EXT_CHANNELS.get(loc)
        if ch is not None and c.text:
            try:
                acc.append((ch, float(c.text)))
            except ValueError:
                pass
        elif loc in _CONTAINER_TAGS:
            # known channel wrapper: recurse for channel tags
            _collect_ext(c, acc, foreign, True, bad)
        elif in_container:
            # INSIDE TrackPointExtension every numeric-text tag is a
            # channel (custom for unknown names); non-numeric text
            # diagnoses and is skipped (gpx_parser.dart:263-291)
            txt = (c.text or "").strip()
            if not txt:
                continue
            try:
                acc.append((loc.strip().lower(), float(txt)))
            except ValueError:
                if bad is not None:
                    bad.append((loc, txt))
        elif foreign is not None:
            # unknown element OUTSIDE the container → the WHOLE
            # subtree is preserved (GpxExtensionNode analog,
            # models.dart:978-1026)
            foreign.append(_node_to_tree(c))
        elif len(c) > 0:
            _collect_ext(c, acc, None, in_container, bad)


def _node_to_tree(node) -> dict:
    """XML element → lossless dict tree {tag, ns?, attrs?, text?,
    children?}. The namespace URI is preserved (prefixes are
    serialization detail per the XML spec; re-emission binds the URI
    as the element's default namespace)."""
    raw = node.tag
    out: dict = {}
    if raw.startswith("{"):
        uri, _, local = raw[1:].partition("}")
        out["ns"] = uri
        out["tag"] = local
    else:
        out["tag"] = raw
    if node.attrib:
        out["attrs"] = dict(node.attrib)
    if node.text and node.text.strip():
        out["text"] = node.text.strip()
    kids = [_node_to_tree(c) for c in node]
    if kids:
        out["children"] = kids
    return out


def _tree_to_xml(tree: dict, parent_ns: str | None = None) -> str:
    ns = tree.get("ns")
    attrs = ""
    if ns and ns != parent_ns:
        # bind the preserved URI as the default namespace — prefixes
        # are arbitrary; URI equality is what XML semantics require
        attrs += f' xmlns="{_esc(ns)}"'
    elif not ns and parent_ns:
        # an un-namespaced node under a defaulted parent must unbind
        # the default or reparse would absorb the parent namespace
        attrs += ' xmlns=""'
    attrs += "".join(
        f' {k}="{_esc(str(v))}"' for k, v in sorted((tree.get("attrs") or {}).items())
    )
    inner = _esc(tree.get("text", "")) + "".join(
        _tree_to_xml(c, ns if ns else parent_ns) for c in tree.get("children", [])
    )
    tag = tree["tag"]
    return f"<{tag}{attrs}>{inner}</{tag}>" if inner else f"<{tag}{attrs}/>"


# --- extension-node builders (facade:913-1010) ------------------------------

# the reference's default namespace for its own extension vocabulary
GPX_DEFAULT_EXT_NAMESPACE = "https://schemas.activityfiles.dev/extensions"


def gpx_activity_label_node(
    label: str,
    namespace_uri: str | None = None,
    attributes: dict | None = None,
) -> dict:
    """``gpxActivityLabelNode`` analog (facade:913-925): an
    ``<activity>label</activity>`` extension tree in the reference's
    extension namespace. Prefixes are serialization detail in this
    engine's tree model (URI-only, see :func:`_node_to_tree`), so
    there is no prefix parameter. Feed the result to
    ``encode_gpx(meta_ext=[...])`` / ``trk_ext``."""
    out: dict = {
        "tag": "activity",
        "ns": namespace_uri or GPX_DEFAULT_EXT_NAMESPACE,
        "text": label,
    }
    if attributes:
        out["attrs"] = {str(k): str(v) for k, v in attributes.items()}
    return out


_DEVICE_CHILD_ORDER = (
    ("manufacturer", "manufacturer"),
    ("model", "model"),
    ("product", "product"),
    ("serialNumber", "serial_number"),
    ("softwareVersion", "software_version"),
    ("fitManufacturerId", "fit_manufacturer_id"),
    ("fitProductId", "fit_product_id"),
)


def _device_children(metadata: dict, uri: str, extras: dict | None) -> list:
    """facade:974-1010 child order; None/blank values skipped;
    datetimes ISO-8601 UTC."""
    import datetime as _dtm

    kids: list = []

    def add(name: str, value) -> None:
        if value is None:
            return
        text = (
            value.astimezone(_dtm.timezone.utc).isoformat().replace("+00:00", "Z")
            if isinstance(value, _dtm.datetime) and value.tzinfo is not None
            else value.isoformat() + "Z"
            if isinstance(value, _dtm.datetime)
            else str(value)
        )
        if not text.strip():
            return
        kids.append({"tag": name, "ns": uri, "text": text})

    for tag, key in _DEVICE_CHILD_ORDER:
        add(tag, metadata.get(key, metadata.get(tag)))
    for k, v in (extras or {}).items():
        add(str(k), v)
    return kids


def gpx_device_node(
    metadata: dict,
    namespace_uri: str | None = None,
    attributes: dict | None = None,
    extras: dict | None = None,
) -> dict:
    """``gpxDeviceNode`` analog (facade:928-948): a ``<device>`` tree
    whose children carry the device metadata fields (snake_case or
    reference-camelCase keys accepted)."""
    uri = namespace_uri or GPX_DEFAULT_EXT_NAMESPACE
    out: dict = {"tag": "device", "ns": uri}
    if attributes:
        out["attrs"] = {str(k): str(v) for k, v in attributes.items()}
    kids = _device_children(metadata, uri, extras)
    if kids:
        out["children"] = kids
    return out


def gpx_device_summary_node(
    metadata: dict,
    namespace_uri: str | None = None,
    extras: dict | None = None,
) -> dict:
    """``gpxDeviceSummaryNode`` analog (facade:951-969):
    ``<deviceSummary>`` tree with the same child layout."""
    uri = namespace_uri or GPX_DEFAULT_EXT_NAMESPACE
    out: dict = {"tag": "deviceSummary", "ns": uri}
    kids = _device_children(metadata, uri, extras)
    if kids:
        out["children"] = kids
    return out


def _parse_simple_point(node) -> dict | None:
    """wpt / rtept: lat/lon attrs + optional ele/time/name children."""
    lat_s, lon_s = node.get("lat"), node.get("lon")
    try:
        pt: dict = {"lat": float(lat_s), "lon": float(lon_s)}
    except (TypeError, ValueError):
        return None
    for c in node:
        loc = _local(c.tag)
        if loc == "ele" and c.text:
            try:
                pt["ele"] = float(c.text)
            except ValueError:
                pass
        elif loc == "time" and c.text:
            ts = iso_to_us(c.text)
            if ts is not None:
                pt["time_us"] = ts
        elif loc == "sym" and c.text:
            pt["sym"] = c.text
        elif loc == "name" and c.text:
            pt["name"] = c.text
    return pt


def _parse_rte(node) -> dict:
    route: dict = {"points": []}
    for c in node:
        loc = _local(c.tag)
        if loc == "name" and c.text:
            route["name"] = c.text
        elif loc == "rtept":
            pt = _parse_simple_point(c)
            if pt is not None:
                route["points"].append(pt)
    return route


# --- encoder -----------------------------------------------------------------

GPX_NS = "http://www.topografix.com/GPX/1/1"
GPX10_NS = "http://www.topografix.com/GPX/1/0"
TPX_NS = "http://www.garmin.com/xmlschemas/TrackPointExtension/v2"
# full TPX v2 field set (gpx_encoder.dart:395-408); hr/cad are whole
# numbers per the schema, the rest keep decimals
_TPX_TAGS = {
    "heart_rate": "hr", "cadence": "cad", "power": "power",
    "temperature": "atemp", "water_temperature": "wtemp",
    "depth": "depth", "speed": "speed", "course": "course",
    "bearing": "bearing",
}

DEFAULT_TOLERANCE_US = 5_000_000  # 5 s default channel join tolerance
# (encoder_options.dart:13,41-42)


def nearest_join(
    point_ts: np.ndarray, sample_ts: np.ndarray, sample_val: np.ndarray,
    tolerance_us: int = DEFAULT_TOLERANCE_US,
) -> np.ndarray:
    """J1 as-of/nearest join: for each point timestamp, the nearest
    sample value within tolerance, NaN otherwise
    (channel_mapper.dart:103-156 semantics via searchsorted)."""
    if sample_ts.size == 0:
        return np.full(point_ts.size, np.nan)
    order = np.argsort(sample_ts, kind="stable")
    sts, sval = sample_ts[order], sample_val[order]
    pos = np.searchsorted(sts, point_ts)
    left = np.clip(pos - 1, 0, sts.size - 1)
    right = np.clip(pos, 0, sts.size - 1)
    dl = np.abs(point_ts - sts[left])
    dr = np.abs(sts[right] - point_ts)
    # exact half-way ties go to the LATER sample: the reference
    # considers the >=-target cursor first and only replaces it on a
    # STRICTLY smaller delta (channel_mapper.dart:199-211)
    use_right = dr <= dl
    best = np.where(use_right, right, left)
    dist = np.where(use_right, dr, dl)
    out = np.where(dist <= tolerance_us, sval[best], np.nan)
    return out


def encode_gpx(
    points: pd.DataFrame,
    channels: pd.DataFrame | None = None,
    name: str | None = None,
    creator: str = "activity_files_ray",
    segment_starts: list[int] | None = None,
    tolerance_us: int = DEFAULT_TOLERANCE_US,
    waypoints: list | None = None,
    routes: list | None = None,
    version: str = "1.1",
    channel_tolerances_us: dict[str, int] | None = None,
    meta_ext: list | None = None,
    trk_ext: list | None = None,
) -> bytes:
    """points (sorted by ts_us) + long-form channels → GPX 1.1 bytes.

    Deterministic output: fixed attribute order, 7-decimal lat/lon,
    2-decimal ele (gpx_encoder.dart:219-231), sorted channel tags.
    """
    ts = points["ts_us"].to_numpy(np.int64)
    lat = points["lat"].to_numpy(np.float64)
    lon = points["lon"].to_numpy(np.float64)
    ele = points["ele"].to_numpy(np.float64) if "ele" in points else np.full(ts.size, np.nan)
    ext_col = points["ext"].tolist() if "ext" in points else None
    attrs_col = points["attrs"].tolist() if "attrs" in points else None
    joined: dict[str, np.ndarray] = {}
    if channels is not None and len(channels):
        tol = channel_tolerances_us or {}
        for ch, g in channels.groupby("channel", observed=True):
            # per-channel tolerance override (encoder_options.dart:
            # 11-62: per-channel tolerances with a shared default)
            joined[str(ch)] = nearest_join(
                ts, g["ts_us"].to_numpy(np.int64), g["value"].to_numpy(np.float64),
                tol.get(str(ch), tolerance_us),
            )
    segs = sorted(set(segment_starts or [0])) or [0]
    ns = GPX_NS if version == "1.1" else GPX10_NS  # GPX 1.0/1.1 output
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<gpx version="{version}" creator="{_esc(creator)}" xmlns="{ns}" '
        f'xmlns:gpxtpx="{TPX_NS}">\n'
    ]
    if meta_ext:
        parts.append(
            "<metadata><extensions>"
            + "".join(_tree_to_xml(t, ns) for t in meta_ext)
            + "</extensions></metadata>\n"
        )
    wpt_parts = []
    for wp in waypoints or []:
        wpt_parts.append(f'<wpt lat="{wp["lat"]:.7f}" lon="{wp["lon"]:.7f}">')
        if wp.get("ele") is not None:
            wpt_parts.append(f"<ele>{wp['ele']:.2f}</ele>")
        if wp.get("time_us") is not None:
            wpt_parts.append(f"<time>{us_to_iso(int(wp['time_us']))}</time>")
        if wp.get("name"):
            wpt_parts.append(f"<name>{_esc(wp['name'])}</name>")
        if wp.get("sym"):
            wpt_parts.append(f"<sym>{_esc(wp['sym'])}</sym>")
        wpt_parts.append("</wpt>\n")
    for rt in routes or []:
        wpt_parts.append("<rte>")
        if rt.get("name"):
            wpt_parts.append(f"<name>{_esc(rt['name'])}</name>")
        for rp in rt.get("points", []):
            wpt_parts.append(f'<rtept lat="{rp["lat"]:.7f}" lon="{rp["lon"]:.7f}">')
            if rp.get("ele") is not None:
                wpt_parts.append(f"<ele>{rp['ele']:.2f}</ele>")
            wpt_parts.append("</rtept>")
        wpt_parts.append("</rte>\n")
    parts.extend(wpt_parts)
    parts.append("<trk>\n")
    if name:
        parts.append(f"<name>{_esc(name)}</name>\n")
    if trk_ext:
        parts.append(
            "<extensions>"
            + "".join(_tree_to_xml(t, ns) for t in trk_ext)
            + "</extensions>\n"
        )
    bounds = segs + [ts.size]
    for si in range(len(segs)):
        parts.append("<trkseg>\n")
        for i in range(bounds[si], bounds[si + 1]):
            parts.append(f'<trkpt lat="{lat[i]:.7f}" lon="{lon[i]:.7f}">')
            if np.isfinite(ele[i]):
                parts.append(f"<ele>{ele[i]:.2f}</ele>")
            parts.append(f"<time>{us_to_iso(int(ts[i]))}</time>")
            if attrs_col is not None and isinstance(attrs_col[i], str) and attrs_col[i]:
                import json as _json

                pa_ = _json.loads(attrs_col[i])
                for tag in _POINT_ATTR_ORDER:
                    if tag in pa_:
                        parts.append(f"<{tag}>{_esc(str(pa_[tag]))}</{tag}>")
            exts = []
            for ch in sorted(joined):
                v = joined[ch][i]
                if not np.isfinite(v):
                    continue
                tag = _TPX_TAGS.get(ch)
                if tag is not None:
                    exts.append(f"<gpxtpx:{tag}>{_num(v)}</gpxtpx:{tag}>")
            foreign_xml = ""
            if ext_col is not None and isinstance(ext_col[i], str) and ext_col[i]:
                import json as _json

                foreign_xml = "".join(
                    _tree_to_xml(t, ns) for t in _json.loads(ext_col[i])
                )
            if exts or foreign_xml:
                parts.append("<extensions>")
                if exts:
                    parts.append(
                        "<gpxtpx:TrackPointExtension>"
                        + "".join(exts)
                        + "</gpxtpx:TrackPointExtension>"
                    )
                parts.append(foreign_xml)
                parts.append("</extensions>")
            parts.append("</trkpt>\n")
        parts.append("</trkseg>\n")
    parts.append("</trk>\n</gpx>\n")
    return "".join(parts).encode()


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))
