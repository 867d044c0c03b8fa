"""Resumable corpus-dedup job tests (jobs/dedup_corpus_job.py).

Pins the job's two-phase plan: phase 1 (signature extraction) is the
per-partition checkpointed pass; phase 2 (global dedup) runs over the
stored signatures only and must produce EXACTLY what the in-library
operators produce over the raw corpus — `bucketed_aggregate`
first-wins for exact mode, `dedup.minhash_dedup` clusters for minhash
mode (same pairs, same cluster ids), even when duplicates straddle
partition boundaries."""

import json
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from activity_files_ray.pipelines import dedup

BASE_DOCS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "ray data pipelines stream arrow batches through the object store with backpressure",
    "spatial joins assign trackpoints to hexagonal cells before aggregation at scale",
    "completely unrelated text about cooking pasta with tomato sauce and fresh basil leaves",
    "minhash signatures approximate jaccard similarity between shingled token sets efficiently",
    "checkpointed jobs restart from committed partitions without repeating expensive work",
]


def _corpus() -> pd.DataFrame:
    """Bases + near-copies + exact copies; ids interleave so that when
    split into files, dup pairs land in DIFFERENT partitions."""
    docs = list(BASE_DOCS)
    docs.append(BASE_DOCS[0].replace("lazy", "sleepy"))  # near-dup of 0
    docs.append(BASE_DOCS[1] + " reliably")  # near-dup of 1
    docs.append(BASE_DOCS[2])  # exact dup of 2
    docs.append(BASE_DOCS[3])  # exact dup of 3
    docs.append(BASE_DOCS[4].replace("efficiently", "cheaply"))
    return pd.DataFrame(
        {"doc_id": [f"d{i:03d}" for i in range(len(docs))], "text": docs}
    )


def _write_sharded(df: pd.DataFrame, d, n_files=3):
    d.mkdir()
    per = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = df.iloc[i * per : (i + 1) * per]
        pq.write_table(
            pa.Table.from_pandas(chunk, preserve_index=False),
            str(d / f"docs-{i}.parquet"),
        )


@pytest.mark.usefixtures("ray_session")
class TestDedupJobExact:
    def test_global_first_wins_across_partitions(self, tmp_path):
        sys.path.insert(0, "/root/repo/jobs")
        import dedup_corpus_job as job

        df = _corpus()
        docs = tmp_path / "docs"
        _write_sharded(df, docs)
        out = str(tmp_path / "out")
        rc = job.main(
            ["--docs", str(docs), "--out", out, "--partitions", "3", "--mode", "exact"]
        )
        assert rc == 0
        winners = pd.read_parquet(os.path.join(out, "winners"))
        # driver oracle: first (min doc_id) per distinct text
        exp = (
            df.groupby("text", as_index=False)
            .agg(keep_doc_id=("doc_id", "min"), n_copies=("doc_id", "count"))
        )
        assert len(winners) == len(exp)
        got = winners.sort_values("keep_doc_id").reset_index(drop=True)
        want = exp[["keep_doc_id", "n_copies"]].sort_values("keep_doc_id")
        pd.testing.assert_frame_equal(
            got[["keep_doc_id", "n_copies"]].astype({"n_copies": "int64"}),
            want.reset_index(drop=True).astype({"n_copies": "int64"}),
        )
        # the two planted exact dups straddle partitions and are dropped
        assert int(winners["n_copies"].sum()) - len(winners) == 2

    def test_resume_skips_committed_partitions(self, tmp_path):
        sys.path.insert(0, "/root/repo/jobs")
        import dedup_corpus_job as job

        docs = tmp_path / "docs"
        _write_sharded(_corpus(), docs)
        out = str(tmp_path / "out")
        args = ["--docs", str(docs), "--out", out, "--partitions", "3"]
        assert job.main(args) == 0
        # manifests + lineage present for every partition
        for pid in ("00000", "00001", "00002"):
            man = json.load(open(os.path.join(out, "_MANIFEST", f"{pid}.json")))
            assert man["rows_out"] > 0 and man["inputs"]
        first = pd.read_parquet(os.path.join(out, "winners"))
        # poison one input shard: a resume must NOT re-read it
        shard = sorted(docs.glob("*.parquet"))[0]
        shard.write_bytes(b"not parquet")
        assert job.main(args) == 0
        second = pd.read_parquet(os.path.join(out, "winners"))
        assert sorted(first["keep_doc_id"]) == sorted(second["keep_doc_id"])
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))


@pytest.mark.usefixtures("ray_session")
class TestDedupJobMinhash:
    def test_clusters_match_library_path(self, tmp_path):
        """Job phase 2 (stored signatures + stored sketches, never the
        texts) reproduces `dedup.minhash_dedup` over the raw corpus
        bit-for-bit: same verified pairs, same cluster assignment."""
        sys.path.insert(0, "/root/repo/jobs")
        import ray.data as rd

        import dedup_corpus_job as job

        df = _corpus()
        docs = tmp_path / "docs"
        _write_sharded(df, docs)
        out = str(tmp_path / "out")
        rc = job.main(
            [
                "--docs", str(docs), "--out", out, "--partitions", "3",
                "--mode", "minhash", "--threshold", "0.5",
            ]
        )
        assert rc == 0
        got = (
            pd.read_parquet(os.path.join(out, "clusters", "clusters.parquet"))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        lib_clusters, lib_pairs = dedup.minhash_dedup(
            rd.from_pandas(df), threshold=0.5, use_shuffle=False
        )
        want = lib_clusters.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[want.columns].astype({c: want[c].dtype for c in want.columns}),
            want,
        )
        # all three planted near/exact dup pairs found and clustered
        cid = dict(zip(got["doc_id"], got["cluster_id"]))
        for a, b in (("d000", "d006"), ("d001", "d007"), ("d002", "d008")):
            assert cid[a] == cid[b]

    def test_phase2_rerun_reuses_signatures(self, tmp_path):
        sys.path.insert(0, "/root/repo/jobs")
        import dedup_corpus_job as job

        docs = tmp_path / "docs"
        _write_sharded(_corpus(), docs)
        out = str(tmp_path / "out")
        args = [
            "--docs", str(docs), "--out", out, "--partitions", "3",
            "--mode", "minhash", "--threshold", "0.5",
        ]
        assert job.main(args) == 0
        sig = os.path.join(out, "part=00000", "signatures")
        mtimes = {
            f: os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
        }
        assert job.main(args) == 0  # resume: phase 1 skipped wholesale
        assert mtimes == {
            f: os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
        }
