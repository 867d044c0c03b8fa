"""The corpus convert pipeline — the reference's flagship
``ActivityFiles.convert`` (``/root/reference/lib/src/api/
activity_files_facade.dart:183-292``, SURVEY.md §3.2) lifted from
one-file-at-a-time to a streaming Ray Data corpus run:

payloads (activity_id, bytes[, fmt])
  → parse (stateless MB, never throws)
  → normalize (sortAndDedup + trimInvalid per activity, MG)
  → optional auto-fix (gap fill / recompute, MG)
  → validate (diagnostics MB)
  → lossiness projection (per target format)
  → encode (MG per activity — encoders need the whole ordered track)
  → (payloads out, diagnostics, stats)

Diagnostics from every stage are unioned into one table, mirroring
the reference's merged diagnostics stream (facade:244-255).
"""

from __future__ import annotations

import pandas as pd

from ..sources import stage as src_stage
from ..stages import activity_ops, autofix as af, normalize as nz, validate as vd


def convert_corpus(
    payloads_ds,
    to_fmt: str,
    autofix: af.AutoFixOptions | None = None,
    validate: bool = True,
):
    """payloads Dataset → (encoded Dataset, diagnostics Dataset).

    ``encoded``: (activity_id, fmt, bytes); ``diagnostics``: the
    union of parse + validation diagnostics.
    """
    points = payloads_ds.map_batches(
        src_stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "points"}
    )
    parse_diags = payloads_ds.map_batches(
        src_stage.parse_batch,
        batch_format="pyarrow",
        fn_kwargs={"output": "diagnostics"},
    )
    opt = autofix or af.AutoFixOptions()

    def fix_group(df: pd.DataFrame) -> pd.DataFrame:
        return af.autofix_group(df, opt)

    fixed = points.groupby("activity_id").map_groups(fix_group, batch_format="pandas")
    diags = parse_diags
    if validate:
        val_diags = fixed.groupby("activity_id").map_groups(
            vd.validate_points_group, batch_format="pandas"
        )
        diags = diags.union(val_diags)

    def enc_group(df: pd.DataFrame) -> pd.DataFrame:
        return src_stage.encode_group(df, to_fmt)

    encoded = fixed.groupby("activity_id").map_groups(
        enc_group, batch_format="pandas"
    )
    return encoded, diags


def convert_one(
    data: bytes,
    to_fmt: str,
    activity_id: str = "a",
    fmt: str | None = None,
    autofix: af.AutoFixOptions | None = None,
) -> tuple[bytes, pd.DataFrame]:
    """Single-payload convenience path (the CLI / ActivityConverter
    analog, ``lib/src/convert/converter.dart:18-45``): parse →
    normalize(+autofix) → lossy projection → encode. Pure local —
    no Ray session required."""
    parsed = src_stage.parse_payload(data, activity_id, fmt)
    pts = parsed.points_df()
    opt = autofix or af.AutoFixOptions()
    fixed = af.autofix_group(pts, opt) if len(pts) else pts
    diags = [parsed.diags_df()]
    diags.append(
        activity_ops.lossy_diagnostics(
            {
                "n_laps": sum(1 for k in parsed.span_kind if k == "lap"),
                "n_events": sum(1 for k in parsed.span_kind if k == "event"),
                "n_sessions": sum(1 for k in parsed.span_kind if k == "session"),
                "n_segments": max(1, len(parsed.segment_starts)),
                "n_waypoints": parsed.n_waypoints,
                "n_routes": parsed.n_routes,
            },
            to_fmt,
            activity_id,
        )
    )
    diags.append(vd.validate_points_group(fixed) if len(fixed) else pd.DataFrame(
        columns=vd.DIAG_COLUMNS + []
    ))
    channels = parsed.channels_df()
    spans = parsed.spans_df()
    payload = src_stage.encode_activity(
        to_fmt,
        fixed,
        channels if len(channels) else None,
        **({"spans": spans, "sport": parsed.sport} if to_fmt in ("tcx", "fit") else {}),
    )
    dd = pd.concat([d for d in diags if len(d)], ignore_index=True) if any(
        len(d) for d in diags
    ) else pd.DataFrame(columns=["activity_id", "severity", "code", "message", "path"])
    return payload, dd
