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
    checkpoint_dir: str | None = None,
):
    """payloads Dataset → (encoded Dataset, diagnostics Dataset).

    ``encoded``: (activity_id, fmt, bytes, n_errors); ``diagnostics``:
    parse (+lossiness+validation when ``validate``) diagnostics.

    SHUFFLE-FREE and SINGLE-PARSE: one payload row IS one activity
    (SURVEY §3.3 — activities are embarrassingly parallel), so the
    whole parse→normalize→autofix→validate→encode chain runs inside a
    single ``map_batches`` kernel per row, which emits the encoded
    bytes AND that payload's diagnostics (as a JSON cell) in ONE
    pass — an earlier version re-parsed every payload up to three
    times across the encoded/diagnostics/validation streams.

    The fork into the two result Datasets must not re-execute the
    parse, so the combined table is pinned exactly once — two ways:

    * ``checkpoint_dir=None``: ``.materialize()`` (object-store
      blocks, spillable) — right at bench scale;
    * ``checkpoint_dir=...``: the 100 TB shape — the combined table
      is written ONCE as parquet (atomic: tmp dir + rename + marker)
      and the two results are COLUMN-PRUNED reads of it; a rerun
      pointing at the same directory skips the convert entirely and
      serves both datasets from the checkpoint (resumed == fresh is
      tested), matching ``jobs/convert_corpus_job.py``'s
      per-partition manifests in-library.
    """
    import json

    opt = autofix or af.AutoFixOptions()
    level = "full" if validate else "parse"

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        ids, fmts, payloads, n_errs, diag_cells = [], [], [], [], []
        fmts_in = df["fmt"] if "fmt" in df.columns else [None] * len(df)
        for aid, data, f in zip(df["activity_id"], df["bytes"], fmts_in):
            try:
                payload, n_err, rows = _convert_core(
                    data, to_fmt, str(aid), f, opt, diag_level=level
                )
            except Exception:  # noqa: BLE001 — never-throw contract
                payload, n_err, rows = b"", 1, []
            ids.append(aid)
            fmts.append(to_fmt)
            payloads.append(payload)
            n_errs.append(n_err)
            diag_cells.append(json.dumps(rows) if rows else "")
        return pd.DataFrame(
            {
                "activity_id": ids,
                "fmt": fmts,
                "bytes": payloads,
                "n_errors": n_errs,
                "diags": diag_cells,
            }
        )

    from .tune import coalesce_small

    # ~3 ms/payload kernel: right-size blocks so each task amortizes
    # launch overhead (no-op for big many-file corpora)
    payloads_ds = coalesce_small(payloads_ds, target_rows_per_block=64)
    combined_pipe = payloads_ds.map_batches(
        conv, batch_format="pandas", batch_size=None
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows: list = []
        for cell in df["diags"]:
            if cell:
                rows.extend(tuple(r) for r in json.loads(cell))
        return pd.DataFrame(rows, columns=vd.DIAG_COLUMNS)

    if checkpoint_dir is None:
        combined = combined_pipe.materialize()
        encoded = combined.drop_columns(["diags"])
        diags_src = combined.select_columns(["diags"])
    else:
        import os

        import ray.data as rd

        marker = os.path.join(checkpoint_dir, "_SUCCESS")
        if not os.path.exists(marker):
            import shutil

            tmp = checkpoint_dir.rstrip("/") + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)  # leftover from a crashed attempt
            combined_pipe.write_parquet(tmp)
            if os.path.exists(checkpoint_dir):
                shutil.rmtree(checkpoint_dir)
            os.replace(tmp, checkpoint_dir)
            open(marker, "w").close()
        encoded = rd.read_parquet(
            checkpoint_dir, columns=["activity_id", "fmt", "bytes", "n_errors"]
        )
        diags_src = rd.read_parquet(checkpoint_dir, columns=["diags"])
    diags = diags_src.map_batches(
        explode, batch_format="pandas", batch_size=None
    )
    return encoded, diags


def convert_points_corpus(points_ds, to_fmt: str):
    """Encode from an already-parsed points table where one activity
    spans multiple rows — HERE the per-activity groupby is genuinely
    required (encoders need the whole ordered track)."""
    def enc_group(df: pd.DataFrame) -> pd.DataFrame:
        return src_stage.encode_group(df, to_fmt)

    return points_ds.groupby("activity_id").map_groups(
        enc_group, batch_format="pandas"
    )


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
    payload, _n_err, rows = _convert_core(
        data, to_fmt, activity_id, fmt, autofix or af.AutoFixOptions(), "full"
    )
    return payload, pd.DataFrame(rows, columns=vd.DIAG_COLUMNS)


def _convert_core(
    data: bytes,
    to_fmt: str,
    activity_id: str,
    fmt: str | None,
    opt: af.AutoFixOptions,
    diag_level: str = "full",
) -> tuple[bytes, int, list]:
    """One payload through parse → autofix → (diagnose) → encode in a
    SINGLE parse, returning ``(payload, n_errors, diag_tuples)``.

    ``diag_level``: ``full`` = parse + lossiness + validation rows
    (the reference's merged diagnostics stream, facade:244-255);
    ``parse`` = parse diagnostics only (skips all validation work —
    the fast corpus path when the caller doesn't want validation).
    Diagnostics are TUPLES, not DataFrames: per-payload pandas
    construction was ~50% of convert wall time (profiled)."""
    parsed = src_stage.parse_payload(data, activity_id, fmt)
    pts = parsed.points_df()
    parse_rows = [(activity_id, s, c, m, p) for s, c, m, p in parsed.diags]
    if not len(pts) and any(d[0] == "error" for d in parsed.diags):
        # unparseable payload: no output document (the reference's
        # convert errors out rather than emitting an empty skeleton)
        return b"", sum(1 for r in parse_rows if r[1] == "error"), parse_rows
    fixed = af.autofix_group(pts, opt) if len(pts) else pts
    rows = parse_rows
    needs_spans = to_fmt in ("tcx", "fit")
    spans = None
    if diag_level == "full":
        rows = rows + activity_ops.lossy_diag_rows(
            {
                "n_laps": sum(1 for k in parsed.span_kind if k == "lap"),
                "n_events": sum(1 for k in parsed.span_kind if k == "event"),
                "n_sessions": sum(1 for k in parsed.span_kind if k == "session"),
                "n_sets": sum(1 for k in parsed.span_kind if k == "set"),
                "n_lengths": sum(1 for k in parsed.span_kind if k == "length"),
                "n_segments": max(1, len(parsed.segment_starts)),
                "n_waypoints": parsed.n_waypoints,
                "n_routes": parsed.n_routes,
            },
            to_fmt,
            activity_id,
        )
        if len(fixed):
            rows = rows + vd.validate_points_rows(fixed)
        # V6: device metadata checks when the payload carried any
        dev = {
            "manufacturer": parsed.metadata.get("manufacturer"),
            "model": parsed.metadata.get("model"),
        }
        for key in ("fit_manufacturer_id", "fit_product_id"):
            raw = parsed.metadata.get(key)
            try:
                dev[key] = int(raw)
            except (TypeError, ValueError):
                dev[key] = None
        if any(v is not None for v in dev.values()):
            rows = rows + [
                tuple(r)
                for r in vd.validate_device(dev, activity_id).itertuples(index=False)
            ]
    channels = parsed.channels_df()
    if needs_spans or (diag_level == "full" and parsed.span_kind):
        spans = parsed.spans_df()
        if opt.sort_and_dedup and len(spans):
            # normalize sorts laps chronologically (raw_transforms
            # sortAndDedup, 'sorts laps by start time'); other span
            # kinds keep their relative order
            laps_mask = spans["kind"] == "lap"
            if laps_mask.any():
                spans = pd.concat(
                    [
                        spans[laps_mask].sort_values("start_us", kind="mergesort"),
                        spans[~laps_mask],
                    ],
                    ignore_index=True,
                )
    if diag_level == "full" and len(fixed):
        window = (int(fixed["ts_us"].min()), int(fixed["ts_us"].max()))
        if len(channels):
            rows = rows + vd.validate_channels_rows(channels, window)
        if spans is not None and len(spans):
            rows = rows + vd.validate_spans_rows(spans, window)
    extra: dict = {}
    if to_fmt == "csv":
        if parsed.sport:
            extra = {"sport": parsed.sport}
    elif to_fmt == "tcx":
        extra = {"spans": spans, "sport": parsed.sport}
        if parsed.creator:
            extra["creator"] = parsed.creator
        # tcxNotes / tcxAuthor survive TCX->TCX (models.dart:1273-1276)
        if parsed.metadata.get("tcx_notes"):
            extra["notes"] = parsed.metadata["tcx_notes"]
        if parsed.metadata.get("tcx_author"):
            extra["author"] = parsed.metadata["tcx_author"]
    elif to_fmt == "fit":
        extra = {"spans": spans, "sport": parsed.sport}
        mid = parsed.metadata.get("fit_manufacturer_id")
        try:
            extra["manufacturer_id"] = int(mid)
        except (TypeError, ValueError):
            # name-only metadata (e.g. from TCX Creator) resolves
            # through the public manufacturer table
            from ..sources import fit_profile

            rid = fit_profile.manufacturer_id(parsed.metadata.get("manufacturer"))
            if rid is not None:
                extra["manufacturer_id"] = rid
        device = {
            k: parsed.metadata[k]
            for k in ("fit_manufacturer_id", "fit_serial_number",
                      "fit_product_id", "software_version", "model")
            if parsed.metadata.get(k)
        }
        if device:
            extra["device"] = device
    elif to_fmt == "geojson":
        meta = dict(parsed.metadata)
        if parsed.sport:
            meta.setdefault("sport", parsed.sport)
        if meta:
            extra = {"metadata": meta}
    elif to_fmt == "gpx":
        # fidelity: name / creator / waypoints / routes survive the
        # convert (models.dart losslessness invariant)
        extra = {
            "name": parsed.name,
            "waypoints": parsed.waypoints,
            "routes": parsed.routes,
        }
        if parsed.creator:
            extra["creator"] = parsed.creator
        # file- and track-level foreign extension trees survive
        # GPX->GPX (gpxMetadataExtensions / trackExtensions analog)
        import json as _json

        for meta_key, kwarg in (("gpx_meta_ext", "meta_ext"),
                                ("gpx_trk_ext", "trk_ext")):
            raw = parsed.metadata.get(meta_key)
            if raw:
                try:
                    extra[kwarg] = _json.loads(raw)
                except ValueError:
                    pass
    payload = src_stage.encode_activity(
        to_fmt, fixed, channels if len(channels) else None, **extra
    )
    n_errors = sum(1 for r in rows if r[1] == "error")
    return payload, n_errors, rows


def load_batch(
    payloads: list[tuple[str, bytes]],
    fmt: str | None = None,
    stop_on_error: bool = False,
    on_progress=None,
):
    """The facade's loadBatch analog (facade:546-589): sequential
    local import with per-payload error capture and a
    ``on_progress(done, total)`` callback — the small-scale
    convenience path next to the Ray ``convert_corpus``/parse stages.

    Returns a list of (activity_id, ParsedActivity | None, error_str
    | None)."""
    out = []
    total = len(payloads)
    for i, (aid, data) in enumerate(payloads, start=1):
        parsed = src_stage.parse_payload(data, aid, fmt)
        errors = [d for d in parsed.diags if d[0] == "error"]
        err = errors[0][2] if errors and not parsed.ts_us else None
        out.append((aid, parsed, err))
        if on_progress is not None:
            on_progress(i, total)
        if err and stop_on_error:
            break
    return out
