"""Resumable corpus-dedup JOB (`ray job submit` entrypoint).

Run locally:
    python jobs/dedup_corpus_job.py --docs <dir-or-file> \
        --out /tmp/dedup_out [--partitions 8] [--mode exact|minhash]

On a cluster the identical script is the `ray job submit` entrypoint:
    ray job submit --working-dir . -- python jobs/dedup_corpus_job.py ...

Two-phase plan, shaped so the EXPENSIVE pass is the resumable one:

  Phase 1 (per input partition, checkpointed via state/checkpoint.py —
  a rerun skips committed partitions): stream the docs shard, emit one
  signature row per doc — (doc_id, content_hash) for exact mode, plus
  the serialized minhash signature AND shingle sketch for minhash
  mode — to ``out/part=<id>/signatures.parquet`` with lineage JSON.
  This is the only pass that touches document BODIES; at 100 TB it is
  ~all of the job's IO and CPU, which is exactly what resume must
  protect.

  Phase 2 (global, sketch-volume only — reruns cheaply from phase-1
  output, never re-reading texts):
    exact   — hash-partitioned first-wins (`agg.bucketed_aggregate`
              min(doc_id) per content hash) → winners + dropped.
    minhash — band keys from the STORED signatures → the same
              `groupby(band_key)` candidate shuffle as the library
              path → exact-Jaccard verify from the STORED sketches
              (``_verify_jaccard_distributed(sketch_col=...)``) →
              clusters. Identical pairs/clusters to running
              `dedup.minhash_dedup` over the corpus directly
              (pinned by tests/test_dedup_job.py).

Per-stage metrics JSONL lands next to the outputs — "resumable from
per-partition checkpoints with lineage and per-stage metrics emitted"
for the dedup workload, alongside the convert + tiling jobs.

INCREMENTAL APPENDS: input files hash to partitions by basename
(append-stable), and a committed partition is revalidated against its
recorded input list — so when new corpus shards land, a rerun
re-signs only the partitions containing new files and rebuilds the
global answer from ALL stored signatures, never re-reading old
bodies. Append == from-scratch equality is pinned in
tests/test_dedup_job.py.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet file or directory")
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--mode", choices=["exact", "minhash"], default="exact")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--n-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--stage-version", default=None)
    args = ap.parse_args(argv)
    stage_version = args.stage_version or (
        f"dedup-{args.mode}-v1-k{args.shingle_k}-p{args.n_perm}-b{args.bands}"
    )

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from activity_files_ray.pipelines import agg, dedup
    from activity_files_ray.state import checkpoint, metrics

    files = (
        sorted(glob.glob(os.path.join(args.docs, "*.parquet")))
        if os.path.isdir(args.docs)
        else [args.docs]
    )
    if not files:
        print(f"error: no parquet under {args.docs}", file=sys.stderr)
        return 64
    # append-stable assignment: re-running after new shards land
    # re-signs ONLY the partitions containing new files (incremental
    # corpus appends); phase 2 always reruns from signatures only
    parts = checkpoint.partition_input_files_stable(files, args.partitions)
    m = metrics.StageMetrics()
    hasher = (
        dedup.FastMinHasher(args.n_perm, seed=42) if args.mode == "minhash" else None
    )

    # ---- phase 1: per-partition signature extraction (resumable) ----
    def process(part_id: str, inputs: list[str], out_dir: str) -> dict:
        ds = rd.read_parquet(inputs, columns=[args.id_col, args.text_col])

        def sig_batch(df: pd.DataFrame) -> pd.DataFrame:
            texts = df[args.text_col].fillna("")
            out = {
                "doc_id": df[args.id_col],
                "content_hash": [
                    hashlib.sha256(t.encode()).hexdigest() for t in texts
                ],
            }
            if hasher is not None:
                sigs, sketches = [], []
                for t in texts:
                    sh = dedup.shingle_set(t, args.shingle_k)
                    sigs.append(hasher.signature(sh).tobytes())
                    sketches.append(sh.tobytes())
                out["sig"] = pd.Series(sigs, dtype=object, index=df.index)
                out["sketch"] = pd.Series(sketches, dtype=object, index=df.index)
            return pd.DataFrame(out)

        sigs = ds.map_batches(sig_batch, batch_format="pandas", batch_size=None)
        path = os.path.join(out_dir, "signatures")
        sigs.write_parquet(path)
        import pyarrow.dataset as pads

        n_out = pads.dataset(path, format="parquet").count_rows()
        m.record("signatures", part_id, rows_out=n_out)
        return {"rows_out": int(n_out)}

    summary = checkpoint.run_resumable(
        parts, args.out, process, stage_version=stage_version
    )
    if summary["failed"]:
        m.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
        print(json.dumps({"phase": 1, **{k: summary[k] for k in ("ran", "failed")}},
                         default=str))
        if owns_session:
            ray.shutdown()
        return 70

    # ---- phase 2: global dedup over signatures only ----
    sig_files = sorted(
        f
        for pid in parts
        for f in glob.glob(
            os.path.join(args.out, f"part={pid}", "signatures", "*.parquet")
        )
    )
    sig_ds = rd.read_parquet(sig_files)

    if args.mode == "exact":
        winners = agg.bucketed_aggregate(
            sig_ds.map_batches(
                lambda df: df[["content_hash", "doc_id"]],
                batch_format="pandas", batch_size=None,
            ),
            ["content_hash"],
            {"keep_doc_id": ("doc_id", "min"), "n_copies": ("", "count")},
        )
        out_path = os.path.join(args.out, "winners")
        # phase 2 is cheap and always regenerated; a stale dir would
        # make write_parquet APPEND beside the old files
        shutil.rmtree(out_path, ignore_errors=True)
        winners.write_parquet(out_path)
        import pyarrow.dataset as pads

        t = pads.dataset(out_path, format="parquet").to_table()
        n_groups = t.num_rows
        n_dropped = int(
            pd.Series(t["n_copies"].to_numpy(zero_copy_only=False)).sum() - n_groups
        )
        m.record("exact_first_wins", "-", rows_out=n_groups)
        result = {"mode": "exact", "n_distinct": int(n_groups),
                  "n_dropped": n_dropped, "winners": out_path}
    else:
        def band_batch(df: pd.DataFrame) -> pd.DataFrame:
            rows_id, rows_key = [], []
            for did, sb in zip(df["doc_id"], df["sig"]):
                sig = np.frombuffer(sb, dtype=np.uint64)
                for k in dedup.band_keys(sig, args.bands):
                    rows_id.append(did)
                    rows_key.append(k)
            return pd.DataFrame(
                {"doc_id": rows_id,
                 "band_key": np.asarray(rows_key, dtype=np.int64)}
            )

        bucket_rows = sig_ds.map_batches(
            band_batch, batch_format="pandas", batch_size=None
        )
        pair_df = dedup._pairs_via_shuffle(bucket_rows)
        m.record("lsh_candidates", "-", rows_out=len(pair_df))
        if len(pair_df):
            vp = dedup._verify_jaccard_distributed(
                sig_ds, "doc_id", args.text_col, pair_df[["a", "b"]],
                args.shingle_k, args.threshold, sketch_col="sketch",
            )
        else:
            vp = pd.DataFrame(columns=["a", "b", "jaccard"])
        m.record("sketch_verify", "-", rows_out=len(vp))
        clusters = dedup._assemble_clusters(vp, "doc_id", False)
        out_path = os.path.join(args.out, "clusters")
        shutil.rmtree(out_path, ignore_errors=True)
        os.makedirs(out_path, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(clusters, preserve_index=False),
            os.path.join(out_path, "clusters.parquet"),
        )
        result = {"mode": "minhash", "n_candidates": int(len(pair_df)),
                  "n_verified_pairs": int(len(vp)),
                  "n_clustered_docs": int(len(clusters)), "clusters": out_path}

    m.to_jsonl(os.path.join(args.out, "metrics.jsonl"))
    print(json.dumps(
        {"partitions": {k: len(v) for k, v in parts.items()},
         "skipped": summary.get("skipped", []), **result}, default=str))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
