"""The corpus-convert JOB: payload shards → encoded payloads +
diagnostics, resumable per partition (the reference's flagship
`convert` workload at fleet scale, SURVEY.md §3.2).

Run locally:
    python jobs/convert_corpus_job.py --payloads <dir-or-file> \
        --out /tmp/convert_out --to geojson [--partitions 8] [--no-validate]

On a cluster the identical script is the `ray job submit` entrypoint:
    ray job submit --working-dir . -- python jobs/convert_corpus_job.py ...

Per input partition (resumable via `state/checkpoint.py` — a rerun
skips committed partitions; a changed --stage-version invalidates
them):

  payload parquet shard(s) (activity_id, bytes[, fmt])
    → single-parse convert kernel (parse → autofix → diagnose →
      encode, pipelines/convert.py)
    → `encoded.parquet` (activity_id, fmt, bytes, n_errors)
    → `diagnostics.parquet` (activity_id, severity, code, message, path)
    under ``out/part=<id>/`` (atomic rename)

plus lineage JSON per partition and a per-stage metrics JSONL.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--payloads", required=True, help="parquet file or directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--to", required=True,
                    choices=["gpx", "tcx", "csv", "geojson", "fit"])
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--no-validate", action="store_true")
    ap.add_argument("--stage-version", default="convert-v1")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from activity_files_ray.pipelines import convert as cv
    from activity_files_ray.state import checkpoint, metrics

    files = (
        sorted(glob.glob(os.path.join(args.payloads, "*.parquet")))
        if os.path.isdir(args.payloads)
        else [args.payloads]
    )
    if not files:
        print(f"error: no parquet under {args.payloads}", file=sys.stderr)
        return 64
    # append-stable: new shards re-run only their own partitions
    parts = checkpoint.partition_input_files_stable(files, args.partitions)
    m = metrics.StageMetrics()

    def process(part_id: str, inputs: list[str], out_dir: str) -> dict:
        ds = rd.read_parquet(inputs)
        n_in = ds.count()
        encoded, diags = cv.convert_corpus(
            ds, args.to, validate=not args.no_validate
        )
        enc_pd = encoded.to_pandas()
        dg_pd = diags.to_pandas()
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(enc_pd, preserve_index=False),
            os.path.join(out_dir, "encoded.parquet"),
        )
        pq.write_table(
            pa.Table.from_pandas(dg_pd, preserve_index=False),
            os.path.join(out_dir, "diagnostics.parquet"),
        )
        n_err = int(enc_pd["n_errors"].sum())
        m.record(
            "parse_convert_encode", part_id,
            rows_in=n_in, rows_out=len(enc_pd),
        )
        return {"rows_in": int(n_in), "rows_out": len(enc_pd),
                "n_errors": n_err, "n_diags": len(dg_pd)}

    summary = checkpoint.run_resumable(
        parts, args.out, process, stage_version=args.stage_version
    )
    m.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
    print(json.dumps({"partitions": {k: len(v) for k, v in parts.items()},
                      **summary}, default=str))
    if owns_session:
        ray.shutdown()
    return 0 if not summary["failed"] else 70


if __name__ == "__main__":
    raise SystemExit(main())
