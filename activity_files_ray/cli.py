"""CLI: convert / validate over files or directories (reference S13,
``/root/reference/bin/activity_files.dart:37-394``; full exit-code
parity: 64 usage error, 65 data error, 66 missing input file
(``activity_files.dart:171``), 70 internal/unimplemented error
(``activity_files.dart:213,289``)).

Single file → pure local path (no Ray). Directory → corpus pipeline
on a local Ray session (the ``ray job submit`` entry point would
invoke exactly this module on the cluster).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="activity-files-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="convert activity payload(s)")
    c.add_argument("input")
    c.add_argument("-o", "--output", required=True)
    c.add_argument("-t", "--to", required=True,
                   choices=["gpx", "tcx", "csv", "geojson", "fit"])
    c.add_argument("--from", dest="from_fmt", default=None)
    v = sub.add_parser("validate", help="validate activity payload(s)")
    v.add_argument("input")
    e = sub.add_parser(
        "export", help="parse a payload to whole-activity JSON "
        "(export_serialization analog)"
    )
    e.add_argument("input")
    e.add_argument("-o", "--output", required=True)
    e.add_argument("--from", dest="from_fmt", default=None)
    i = sub.add_parser(
        "import", help="encode a whole-activity JSON back to a format"
    )
    i.add_argument("input")
    i.add_argument("-o", "--output", required=True)
    i.add_argument("-t", "--to", required=True,
                   choices=["gpx", "tcx", "csv", "geojson", "fit"])
    try:
        args = ap.parse_args(argv)
    except SystemExit as e:  # argparse usage error → sysexits EX_USAGE
        return 0 if e.code in (0, None) else 64
    from_fmt = getattr(args, "from_fmt", None)
    if from_fmt is not None and from_fmt not in (
        "gpx", "tcx", "csv", "geojson", "fit"
    ):
        print(f"error: unknown format {from_fmt!r}", file=sys.stderr)
        return 64

    if not os.path.exists(args.input):
        # EX_NOINPUT, distinct from usage/data errors so scripts can
        # tell "file missing" from "bad data" (activity_files.dart:171)
        print(f"error: input file not found: {args.input}", file=sys.stderr)
        return 66

    try:
        if args.cmd == "convert":
            return _convert(args)
        if args.cmd == "export":
            return _export(args)
        if args.cmd == "import":
            return _import(args)
        return _validate(args)
    except NotImplementedError as e:  # EX_SOFTWARE (dart:213,289)
        print(f"error: not implemented: {e}", file=sys.stderr)
        return 70
    except Exception as e:  # noqa: BLE001 — CLI boundary: EX_SOFTWARE
        print(f"error: internal error: {e}", file=sys.stderr)
        return 70


def _export(args) -> int:
    from .sources import model_json
    from .sources import stage as src_stage

    data = open(args.input, "rb").read()
    parsed = src_stage.parse_payload(
        data, os.path.basename(args.input), args.from_fmt
    )
    if not parsed.ts_us and any(d[0] == "error" for d in parsed.diags):
        for d in parsed.diags:
            print(f"[{d[0]}] {d[1]}: {d[2]}", file=sys.stderr)
        return 65
    with open(args.output, "w") as f:
        f.write(model_json.dumps(parsed))
    print(f"wrote {args.output}")
    return 0


def _import(args) -> int:
    from .sources import model_json
    from .sources import stage as src_stage

    parsed = model_json.loads(open(args.input).read())
    extra: dict = {"sport": parsed.sport, "spans": parsed.spans_df()}
    if parsed.creator:
        extra["creator"] = parsed.creator
    if args.to == "gpx":
        extra = {"name": parsed.name, "waypoints": parsed.waypoints,
                 "routes": parsed.routes}
    payload = src_stage.encode_activity(
        args.to, parsed.points_df(),
        parsed.channels_df() if parsed.ch_name else None, **extra
    )
    with open(args.output, "wb") as f:
        f.write(payload)
    print(f"wrote {args.output} ({len(payload)} bytes)")
    return 0


def _convert(args) -> int:
    from .pipelines import convert as cv

    if os.path.isdir(args.input):
        return _convert_dir(args)
    data = open(args.input, "rb").read()
    payload, diags = cv.convert_one(
        data, args.to, activity_id=os.path.basename(args.input), fmt=args.from_fmt
    )
    errors = diags[diags["severity"] == "error"] if len(diags) else diags
    for _, d in (diags.iterrows() if len(diags) else []):
        print(f"[{d['severity']}] {d['code']}: {d['message']}", file=sys.stderr)
    if len(errors):
        return 65
    with open(args.output, "wb") as f:
        f.write(payload)
    print(f"wrote {args.output} ({len(payload)} bytes)")
    return 0


def _convert_dir(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa
    import ray.data as rd

    from .pipelines import convert as cv

    files = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if not f.startswith(".")
    )
    rows = {
        "activity_id": [os.path.basename(f) for f in files],
        "bytes": [open(f, "rb").read() for f in files],
    }
    ds = rd.from_arrow(pa.table(rows))
    encoded, diags = cv.convert_corpus(ds, args.to)
    os.makedirs(args.output, exist_ok=True)
    n = 0
    for row in encoded.iter_rows():
        if not row["bytes"]:  # unparseable payload → no output file
            continue
        out = os.path.join(args.output, f"{row['activity_id']}.{args.to}")
        with open(out, "wb") as f:
            f.write(row["bytes"])
        n += 1
    dd = diags.to_pandas()
    for _, d in dd.iterrows():
        print(f"[{d['severity']}] {d['activity_id']} {d['code']}", file=sys.stderr)
    print(f"converted {n} activities -> {args.output}")
    ray.shutdown()
    return 0 if not (dd["severity"] == "error").any() else 65


def _validate(args) -> int:
    from .sources import stage as src_stage
    from .stages import validate as vd

    data = open(args.input, "rb").read()
    parsed = src_stage.parse_payload(data, os.path.basename(args.input))
    pts = parsed.points_df()
    diags = parsed.diags_df()
    if len(pts):
        import pandas as pd

        frames = [diags, vd.validate_points_group(pts)]
        window = (int(pts["ts_us"].min()), int(pts["ts_us"].max()))
        ch = parsed.channels_df()
        if len(ch):
            frames.append(vd.validate_channels_group(ch, window))
        sp = parsed.spans_df()
        if len(sp):
            frames.append(vd.validate_spans_group(sp, window))
        diags = pd.concat(frames, ignore_index=True)
    for _, d in diags.iterrows():
        print(f"[{d['severity']}] {d['code']}: {d['message']}")
    n_err = int((diags["severity"] == "error").sum()) if len(diags) else 0
    print(f"{len(pts)} points, {len(diags)} diagnostics, {n_err} errors")
    return 65 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
