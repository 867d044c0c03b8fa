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
        # manifests + lineage present for every (hash-stable) partition
        mans = sorted(os.listdir(os.path.join(out, "_MANIFEST")))
        assert mans  # at least one committed partition
        covered = []
        for name in mans:
            man = json.load(open(os.path.join(out, "_MANIFEST", name)))
            assert man["rows_out"] > 0 and man["inputs"]
            covered += man["inputs"]
        assert sorted(covered) == sorted(str(p) for p in docs.glob("*.parquet"))
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
        first_part = sorted(
            d for d in os.listdir(out) if d.startswith("part=")
        )[0]
        sig = os.path.join(out, first_part, "signatures")
        mtimes = {
            f: os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
        }
        assert job.main(args) == 0  # resume: phase 1 skipped wholesale
        assert mtimes == {
            f: os.path.getmtime(os.path.join(sig, f)) for f in os.listdir(sig)
        }


@pytest.mark.usefixtures("ray_session")
class TestDedupJobIncrementalAppend:
    def test_append_shard_runs_only_new_partitions(self, tmp_path):
        """Incremental corpus append: after new shards land, a rerun
        re-signs ONLY the partitions containing new files (the rest
        skip via checkpoint + input-list revalidation), and the global
        answer equals a from-scratch run over the full corpus."""
        sys.path.insert(0, "/root/repo/jobs")
        import dedup_corpus_job as job

        df = _corpus()
        docs = tmp_path / "docs"
        _write_sharded(df, docs)
        out = str(tmp_path / "out")
        args = [
            "--docs", str(docs), "--out", out, "--partitions", "3",
            "--mode", "minhash", "--threshold", "0.5",
        ]
        assert job.main(args) == 0
        n_parts_before = len(os.listdir(os.path.join(out, "_MANIFEST")))
        # a new shard arrives: one fresh doc + a near-dup of base 5
        new = pd.DataFrame(
            {
                "doc_id": ["d100", "d101"],
                "text": [
                    "entirely new content about sailing across the northern sea at dawn",
                    BASE_DOCS[5].replace("expensive", "costly"),
                ],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(new, preserve_index=False),
            str(docs / "docs-new.parquet"),
        )
        assert job.main(args) == 0
        got = (
            pd.read_parquet(os.path.join(out, "clusters", "clusters.parquet"))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # only the new file's bucket was (re-)signed: manifests show
        # every old partition's inputs unchanged, and the appended
        # file sits in exactly one partition
        mans = [
            json.load(open(os.path.join(out, "_MANIFEST", f)))
            for f in os.listdir(os.path.join(out, "_MANIFEST"))
        ]
        with_new = [
            m for m in mans
            if any(i.endswith("docs-new.parquet") for i in m["inputs"])
        ]
        assert len(with_new) == 1
        assert len(mans) <= n_parts_before + 1
        # from-scratch over the full corpus gives the identical answer
        out2 = str(tmp_path / "out2")
        args2 = [
            "--docs", str(docs), "--out", out2, "--partitions", "3",
            "--mode", "minhash", "--threshold", "0.5",
        ]
        assert job.main(args2) == 0
        want = (
            pd.read_parquet(os.path.join(out2, "clusters", "clusters.parquet"))
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # the planted cross-shard near-dup clustered with its base
        cid = dict(zip(got["doc_id"], got["cluster_id"]))
        assert cid.get("d101") == cid.get("d005")
