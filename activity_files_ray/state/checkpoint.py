"""Resumable partitioned runs: per-partition checkpoints + lineage.

North_rule: "Runs are resumable from per-partition checkpoints with
lineage and per-stage metrics emitted." The reference has no resume
machinery (SURVEY.md §4.1) — this is the batch-pipeline meaning of
checkpointing (ray_guide.md "Sources & sinks"):

* output is laid out one directory per INPUT partition
  (``out_dir/part=<id>/``), written atomically (temp dir + rename);
* a manifest entry ``_MANIFEST/<id>.json`` is written after the
  partition commits, recording lineage: input files, a caller-supplied
  stage-version string, row counts, wall seconds;
* a rerun loads the manifest first and SKIPS committed partitions —
  so a crashed 100 TB run redoes only in-flight partitions. A changed
  ``stage_version`` invalidates prior parts (they rerun).

Deterministic kernels (§7.1 invariant 4) make redone partitions
byte-identical, so resume cannot change results.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable
from typing import Any

MANIFEST_DIR = "_MANIFEST"


def _manifest_path(out_dir: str, part_id: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{part_id}.json")


def committed_partitions(out_dir: str, stage_version: str | None = None) -> dict[str, dict]:
    """Manifest entries of committed partitions (optionally only those
    produced by the given stage_version)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: dict[str, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                entry = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write → treated as not committed
        if stage_version is not None and entry.get("stage_version") != stage_version:
            continue
        out[entry["partition"]] = entry
    return out


def run_resumable(
    partitions: dict[str, list[str]],
    out_dir: str,
    process: Callable[[str, list[str], str], dict[str, Any]],
    stage_version: str = "v1",
) -> dict:
    """Run ``process(part_id, input_files, part_out_dir)`` for every
    partition not already committed.

    ``process`` writes its output files under ``part_out_dir`` (a
    temp dir; atomically renamed to ``out_dir/part=<id>`` on success)
    and returns lineage fields (e.g. rows_in / rows_out). Returns a
    summary {ran, skipped, failed}.
    """
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    done = committed_partitions(out_dir, stage_version)
    ran, skipped, failed = [], [], []
    for part_id, inputs in partitions.items():
        # a committed partition is only valid for the EXACT input list
        # it recorded — under corpus APPENDS a partition's composition
        # can change (new file hashed into it), and skipping it then
        # would silently serve stale output; mismatched inputs re-run
        if part_id in done and done[part_id].get("inputs") == inputs:
            skipped.append(part_id)
            continue
        final_dir = os.path.join(out_dir, f"part={part_id}")
        tmp_dir = final_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)  # leftover from a crashed attempt
        os.makedirs(tmp_dir)
        t0 = time.perf_counter()
        try:
            lineage = process(part_id, inputs, tmp_dir) or {}
        except Exception as e:  # noqa: BLE001 — record, continue others
            shutil.rmtree(tmp_dir, ignore_errors=True)
            failed.append((part_id, repr(e)))
            continue
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)
        entry = {
            "partition": part_id,
            "inputs": inputs,
            "stage_version": stage_version,
            "wall_s": round(time.perf_counter() - t0, 3),
            "output_dir": f"part={part_id}",
            **lineage,
        }
        tmp_manifest = _manifest_path(out_dir, part_id) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(entry, f, sort_keys=True)
        os.replace(tmp_manifest, _manifest_path(out_dir, part_id))
        ran.append(part_id)
    return {"ran": ran, "skipped": skipped, "failed": failed}


def partition_input_files(files: list[str], n_partitions: int) -> dict[str, list[str]]:
    """Deterministic round-robin file → partition assignment.

    NOTE: round-robin is INDEX-based, so appending one file to the
    corpus shifts ~every partition's composition — combined with the
    inputs-mismatch invalidation above, an append re-runs almost the
    whole phase. Use :func:`partition_input_files_stable` when the
    corpus grows over time."""
    parts: dict[str, list[str]] = {f"{i:05d}": [] for i in range(n_partitions)}
    for i, f in enumerate(sorted(files)):
        parts[f"{i % n_partitions:05d}"].append(f)
    return {k: v for k, v in parts.items() if v}


def partition_input_files_stable(
    files: list[str], n_partitions: int
) -> dict[str, list[str]]:
    """APPEND-STABLE file → partition assignment: each file hashes to
    its partition by basename (md5 — process-seed independent), so
    adding new corpus shards changes ONLY the partitions the new files
    land in; every other partition keeps its exact input list and its
    checkpoint stays valid. This is what makes incremental corpus
    appends cheap: a rerun re-signs the new shards' partitions and
    skips the rest (tested in tests/test_dedup_job.py)."""
    import hashlib

    parts: dict[str, list[str]] = {f"{i:05d}": [] for i in range(n_partitions)}
    for f in sorted(files):
        h = int.from_bytes(
            hashlib.md5(os.path.basename(f).encode()).digest()[:8], "big"
        )
        parts[f"{h % n_partitions:05d}"].append(f)
    return {k: v for k, v in parts.items() if v}
