"""The Ray Data parse stage: payload batches → normalized tables.

``parse_batch(batch, output=...)`` is a stateless ``map_batches``
kernel over a table with ``(activity_id, bytes[, fmt])`` columns —
the Ray-side shape of the reference's load pipeline (SURVEY.md §3.1:
resolve → detect → parse → fan out). One stage invocation emits ONE
of the logical tables (points / channels / spans / diagnostics /
activities); a pipeline needing several fans the same payload
Dataset into several streams (each re-parses — at 100 TB the usual
trade is re-decode CPU for zero cross-stage pixel/row materialization;
a fused union-table variant is a straightforward extension).

Parsers never throw: malformed payloads yield zero rows plus
diagnostics rows (§7.1 invariant 1).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from . import csv_fmt, detect, geojson, gpx, tcx
from . import fit as fit_mod
from .model import ParsedActivity

_PARSERS = {
    "gpx": gpx.parse_gpx,
    "tcx": tcx.parse_tcx,
    "csv": csv_fmt.parse_csv,
    "geojson": geojson.parse_geojson,
    "fit": fit_mod.parse_fit,
}

_ENCODERS = {
    "gpx": lambda p, c, **kw: gpx.encode_gpx(p, c, **kw),
    "tcx": lambda p, c, **kw: tcx.encode_tcx(
        p, c, **{k: v for k, v in kw.items()
                 if k in ("spans", "sport", "creator", "tolerance_us",
                          "notes", "author")}
    ),
    "csv": lambda p, c, **kw: csv_fmt.encode_csv(
        p, c, **{k: v for k, v in kw.items() if k in ("sport",)}
    ),
    "geojson": lambda p, c, **kw: geojson.encode_geojson(
        p, c, **{k: v for k, v in kw.items() if k in ("metadata", "mode")}
    ),
    "fit": lambda p, c, **kw: fit_mod.encode_fit(
        p, c, **{k: v for k, v in kw.items()
                 if k in ("sport", "manufacturer_id", "spans", "device")}
    ),
}

OUTPUTS = ("points", "channels", "spans", "diagnostics", "activities")


def parse_payload(data: bytes, activity_id: str, fmt: str | None = None) -> ParsedActivity:
    """One payload → ParsedActivity; auto-detects when fmt is absent."""
    f = (fmt or "").strip().lower() or detect.detect_format(data)
    parser = _PARSERS.get(f)
    if parser is None:
        out = ParsedActivity(activity_id)
        out.diag("error", "parse.unknown_format", f"format {f!r}", "")
        return out
    try:
        return parser(data, activity_id)
    except Exception as e:  # noqa: BLE001 — the never-throw boundary:
        # a parser bug must cost one diagnostic row, never a corpus run
        out = ParsedActivity(activity_id)
        out.diag("error", "parse.internal_error", f"{type(e).__name__}: {e}", f)
        return out


def parse_batch(batch: pa.Table, output: str = "points") -> pa.Table:
    """map_batches kernel: (activity_id, bytes[, fmt]) → one logical
    table per the ``output`` selector."""
    assert output in OUTPUTS, output
    ids = batch["activity_id"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else [None] * len(ids)
    frames: list[pd.DataFrame] = []
    for aid, data, f in zip(ids, payloads, fmts):
        parsed = parse_payload(data, aid, f)
        if output == "points":
            frames.append(parsed.points_df())
        elif output == "channels":
            frames.append(parsed.channels_df())
        elif output == "spans":
            frames.append(parsed.spans_df())
        elif output == "diagnostics":
            frames.append(parsed.diags_df())
        else:
            frames.append(
                pd.DataFrame(
                    {
                        "activity_id": [aid],
                        "fmt": [f or detect.detect_format(data)],
                        "sport": [parsed.sport],
                        "creator": [parsed.creator],
                        "name": [parsed.name],
                        "n_points": [len(parsed.ts_us)],
                        "n_samples": [len(parsed.ch_ts_us)],
                        "n_diags": [len(parsed.diags)],
                    }
                )
            )
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return pa.Table.from_pandas(df, preserve_index=False)


def encode_activity(
    fmt: str,
    points: pd.DataFrame,
    channels: pd.DataFrame | None = None,
    **kwargs,
) -> bytes:
    """points/channels (one activity, sorted) → payload bytes."""
    enc = _ENCODERS.get(fmt)
    if enc is None:
        raise ValueError(f"no encoder for format {fmt!r}")
    return enc(points, channels, **kwargs)


def encode_group(df: pd.DataFrame, fmt: str, channels_by_id: dict | None = None) -> pd.DataFrame:
    """groupby(activity_id).map_groups kernel: one activity's points
    → one (activity_id, fmt, bytes) row (SURVEY.md S7-S11: encoders
    are MG per activity because they need the whole ordered track)."""
    aid = df["activity_id"].iloc[0] if len(df) else ""
    df = df.sort_values("ts_us", kind="mergesort")
    ch = (channels_by_id or {}).get(aid)
    payload = encode_activity(fmt, df, ch)
    return pd.DataFrame({"activity_id": [aid], "fmt": [fmt], "bytes": [payload]})


# --- fused union-table parse (single decode for all outputs) -----------------

UNION_KINDS = ("point", "channel", "span", "diag", "activity")


def parse_batch_union(batch: pa.Table) -> pa.Table:
    """Fused parse: decode each payload ONCE and emit every logical
    table's rows tagged by ``kind`` in one union-schema table
    (decode-bound corpora pay 1× decode instead of one pass per
    output; split back with :func:`union_select`)."""
    ids = batch["activity_id"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist() if "fmt" in batch.column_names else [None] * len(ids)
    frames: list[pd.DataFrame] = []
    for aid, data, f in zip(ids, payloads, fmts):
        parsed = parse_payload(data, aid, f)
        p = parsed.points_df().assign(kind="point")
        c = parsed.channels_df().assign(kind="channel")
        sp = parsed.spans_df().rename(columns={"kind": "span_kind"}).assign(kind="span")
        d = parsed.diags_df().assign(kind="diag")
        a = pd.DataFrame(
            {
                "activity_id": [aid],
                "kind": "activity",
                "fmt": [f or detect.detect_format(data)],
                "sport": [parsed.sport],
                "creator": [parsed.creator],
                "name": [parsed.name],
                "n_points": [len(parsed.ts_us)],
            }
        )
        frames.extend(x for x in (p, c, sp, d, a) if len(x))
    if not frames:
        return pa.Table.from_pandas(pd.DataFrame({"kind": []}), preserve_index=False)
    df = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(df, preserve_index=False)


_UNION_COLUMNS = {
    "point": ["activity_id", "seq", "ts_us", "lat", "lon", "ele", "ext", "attrs"],
    "channel": ["activity_id", "channel", "ts_us", "value"],
    "span": ["activity_id", "span_kind", "start_us", "end_us", "sport", "dist_m"],
    "diag": ["activity_id", "severity", "code", "message", "path"],
    "activity": ["activity_id", "fmt", "sport", "creator", "name", "n_points"],
}


def union_select(union_ds, kind: str):
    """Filter one logical table back out of a union-parse Dataset."""
    cols = _UNION_COLUMNS[kind]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["kind"] == kind]
        return out[[c for c in cols if c in out.columns]]

    return union_ds.map_batches(pick, batch_format="pandas", batch_size=None)
