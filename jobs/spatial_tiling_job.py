"""The spatial-join + tiling JOB (north_rule operational shape).

Run locally:
    python jobs/spatial_tiling_job.py --images <dir-or-file> \
        --out /tmp/tiles_out [--partitions 8] [--regions grid]

On a cluster the identical script is the `ray job submit` entrypoint:
    ray job submit --working-dir . -- python jobs/spatial_tiling_job.py ...

What it does, per input partition (resumable via the manifest in
``state/checkpoint.py`` — a rerun skips committed partitions):

  images parquet shard(s)
    → fused decode → route-pixel extract → georef (caption bbox)
    → tile-cell assign (level-15) + per-image partial counts
    → PIP membership of tile centers against the region polygons
    → per-(region, cell) aggregate
    → partitioned parquet under ``out/part=<id>/`` (atomic rename)

plus lineage JSON per partition and a per-stage metrics JSONL —
"resumable from per-partition checkpoints with lineage and per-stage
metrics emitted" end-to-end.
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
    ap.add_argument("--images", required=True, help="parquet file or directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--regions", choices=["fixture", "grid"], default="grid")
    ap.add_argument("--stage-version", default="tiling-v1")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from activity_files_ray import fixtures
    from activity_files_ray.functions import cells, polygons
    from activity_files_ray.spatial import stages
    from activity_files_ray.state import checkpoint, metrics

    files = (
        sorted(glob.glob(os.path.join(args.images, "*.parquet")))
        if os.path.isdir(args.images)
        else [args.images]
    )
    if not files:
        print(f"error: no parquet under {args.images}", file=sys.stderr)
        return 64
    # append-stable: new shards re-run only their own partitions
    parts = checkpoint.partition_input_files_stable(files, args.partitions)
    polys = (
        fixtures.make_region_grid()
        if args.regions == "grid"
        else fixtures.make_regions()
    )
    idx_ref = ray.put(polygons.PolygonIndex(polys))
    m = metrics.StageMetrics()

    def process(part_id: str, inputs: list[str], out_dir: str) -> dict:
        ds = rd.read_parquet(inputs)
        n_in = ds.count()
        tiles = ds.map_batches(
            stages.route_tile_batch, batch_format="pyarrow", batch_size=None
        )

        def add_region(batch: pa.Table) -> pa.Table:
            # PIP membership of each tile's center against the regions
            clat, clon = cells.cell_center(
                batch["cell"].to_numpy(), cells.LEVEL_TILE
            )
            pts = pa.table(
                {"cell": batch["cell"], "n_px": batch["n_px"],
                 "lat": pa.array(clat), "lon": pa.array(clon)}
            )
            joined = stages.pip_join_batch(pts, idx_ref)
            return pa.table(
                {
                    "region_id": joined["region_id"],
                    "cell": joined["cell"],
                    "n_px": joined["n_px"],
                }
            )

        from activity_files_ray.pipelines import agg

        result = agg.tree_aggregate(
            tiles.map_batches(add_region, batch_format="pyarrow", batch_size=None),
            ["region_id", "cell"],
            {"n_px": ("n_px", "sum"), "n_images": ("", "count")},
        )
        table = pa.Table.from_pandas(result, preserve_index=False)
        pq.write_table(table, os.path.join(out_dir, "tiles.parquet"))
        m.record(
            "decode_extract_tile_pip", part_id,
            rows_in=n_in, rows_out=table.num_rows,
        )
        return {"rows_in": int(n_in), "rows_out": int(table.num_rows),
                "n_regions": int(result["region_id"].nunique())}

    summary = checkpoint.run_resumable(
        parts, args.out, process, stage_version=args.stage_version
    )
    m.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
    print(json.dumps({"partitions": {k: len(v) for k, v in parts.items()},
                      **{k: (v if isinstance(v, list) else v) for k, v in summary.items()}},
                     default=str))
    if owns_session:
        ray.shutdown()
    return 0 if not summary["failed"] else 70


if __name__ == "__main__":
    raise SystemExit(main())
