"""Content-based format detection.

Mirrors the reference's sniffing chain (``/root/reference/lib/src/api/
activity_files_facade.dart:1598-2141``): 128 KB prefix budget; JSON /
GeoJSON keys, ``<gpx`` / ``TrainingCenterDatabase`` markers, FIT
header magic (incl. base64-wrapped FIT), CSV header heuristic,
BOM-aware text decoding.
"""

from __future__ import annotations

import base64
import binascii

SNIFF_BYTES = 128 * 1024  # facade:30


def detect_format(data: bytes) -> str:
    """Returns one of gpx|tcx|fit|csv|geojson|unknown."""
    head = data[:SNIFF_BYTES]
    if len(head) >= 12 and head[8:12] == b".FIT" and head[0] in (12, 14):
        return "fit"
    # BOM-aware decode (facade:2051-2126)
    text = None
    for enc, bom in (
        ("utf-32-le", b"\xff\xfe\x00\x00"), ("utf-32-be", b"\x00\x00\xfe\xff"),
        ("utf-16-le", b"\xff\xfe"), ("utf-16-be", b"\xfe\xff"),
    ):
        if head.startswith(bom):
            try:
                text = head.decode(enc)
            except UnicodeDecodeError:
                pass
            break
    if text is None:
        try:
            text = head.decode("utf-8-sig")
        except UnicodeDecodeError:
            return "unknown"
    t = text.lstrip()
    tl = t.lower()
    if tl.startswith("{") or tl.startswith("["):
        if '"featurecollection"' in tl or '"feature"' in tl or '"geometry"' in tl or '"coordinates"' in tl:
            return "geojson"
        return "unknown"
    if "<gpx" in tl[:2048]:
        return "gpx"
    if "trainingcenterdatabase" in tl[:2048]:
        return "tcx"
    # base64-wrapped FIT (facade:1922-1936)
    compact = "".join(t.split())[:64]
    if len(compact) >= 20:
        try:
            raw = base64.b64decode(compact[: len(compact) // 4 * 4], validate=True)
            if len(raw) >= 12 and raw[8:12] == b".FIT":
                return "fit"
        except (binascii.Error, ValueError):
            pass
    # CSV heuristic: first line looks like a header containing a time col
    first = t.splitlines()[0] if t.splitlines() else ""
    cols = [c.strip().lower() for c in first.split(",")]
    if len(cols) >= 2 and any(c in ("time", "timestamp", "datetime") for c in cols):
        return "csv"
    return "unknown"
