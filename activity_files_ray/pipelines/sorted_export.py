"""Global total-order sorted export (r4 verdict item 2, SURVEY §7.3
"global sorted outputs"): a corpus-scale ORDER BY realized as a
RANGE-PARTITIONED, ordered write — the only shape that works at
100 TB, where a monolithic sort output is useless and a single file
impossible.

Plan:
  1. BOUNDARIES — a seeded hash-rank row sample (layout-independent,
     same scheme as ``ann.ivf_build``) collects ``sample_n`` key
     values; the driver takes n_parts−1 evenly-spaced order
     statistics as range boundaries. Sampling error only skews
     partition SIZES (bounded, see SCALE.md), never correctness:
     assignment is exact by searchsorted, so ranges are DISJOINT and
     ORDERED by construction, and equal keys always land in one
     partition.
  2. ASSIGN + LOCAL SORT — one ``map_batches`` tags each row with its
     partition id; ``groupby(part)`` co-locates each range and sorts
     it by (key, *tiebreak) inside the group (partition-local,
     memory-bounded, parallel — the all-to-all exchange here is the
     same volume as any shuffle, but the SORT itself never happens
     globally).
  3. WRITE + MANIFEST — hive-partitioned parquet ``part=<i>/`` plus
     ``manifest.json``: partitions in global order with per-partition
     key min/max and row counts read from the PARQUET FOOTERS
     (metadata-only — no second data pass). A consumer streams
     part=0, part=1, … and has the corpus in total order; a failed
     export (no manifest yet) resumes by re-running with
     ``only_parts`` = the missing partition ids — boundaries are
     deterministic, so the re-run rebuilds exactly those ranges.

``sorted_read_ranked`` is the proving consumer: it reads partitions
in manifest order, re-sorts WITHIN each partition (partition-local —
robust to multi-file partitions), and attaches the explicit global
``rank`` from the manifest's cumulative offsets. ROW_NUMBER() in SQL
replays it exactly.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def plan_boundaries(
    ds, key: str, n_parts: int, sample_n: int = 8192, seed: int = 42,
    id_col: str | None = None,
) -> np.ndarray:
    """n_parts−1 ascending range boundaries from a seeded hash-rank
    sample of ``key``. ``id_col`` seeds the row hash (defaults to the
    key itself — fine unless keys are heavily duplicated)."""
    from .dedup import _md5_64_many

    hash_col = id_col or key

    def sample_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5_64_many([f"{seed}:{v}" for v in df[hash_col]]).astype(np.uint64)
        keep = np.argsort(h, kind="stable")[:sample_n]
        return pd.DataFrame(
            {"_h": h[keep].astype(np.int64), key: df[key].iloc[keep].to_numpy()}
        )

    parts = ds.map_batches(
        sample_partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    order = np.argsort(
        parts["_h"].to_numpy(np.int64).astype(np.uint64), kind="stable"
    )[:sample_n]
    sample = np.sort(parts[key].to_numpy(np.int64)[order])
    if len(sample) == 0:
        return np.empty(0, dtype=np.int64)
    cuts = [
        sample[min(int(np.ceil(i * len(sample) / n_parts)), len(sample) - 1)]
        for i in range(1, n_parts)
    ]
    return np.unique(np.asarray(cuts, dtype=np.int64))


def sorted_export(
    ds,
    out_dir: str,
    key: str,
    tiebreak: tuple[str, ...] = (),
    n_parts: int = 32,
    sample_n: int = 8192,
    seed: int = 42,
    only_parts: set[int] | None = None,
) -> list[dict]:
    """Range-partitioned ordered export of ``ds`` by (key, *tiebreak).
    Writes ``part=<i>/`` parquet + ``manifest.json``; returns the
    manifest entries (part, n_rows, key_min, key_max) in global
    order.

    RESUME: the range boundaries are a deterministic function of
    (input, seed), so a re-run reproduces the identical layout;
    ``only_parts`` restricts the write to the named partition ids
    (rows outside them are dropped at the assign stage, before the
    shuffle). A failed export — detectable by the missing
    ``manifest.json`` — is completed by re-running with
    ``only_parts`` = the missing/incomplete partition ids; the
    manifest is always rebuilt from ALL ``part=<i>/`` dirs on disk,
    so the finished layout is indistinguishable from a one-shot run
    (equality is tested)."""
    import pyarrow.parquet as pq

    bounds = plan_boundaries(ds, key, n_parts, sample_n, seed)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["part"] = np.searchsorted(
            bounds, df[key].to_numpy(np.int64), side="right"
        ).astype(np.int64)
        if only_parts is not None:
            out = out[out["part"].isin(list(only_parts))]
        # hive partitioning strips the partition col from the files;
        # keep a data copy so per-partition readers stay self-describing
        out["part_id"] = out["part"]
        return out

    sort_cols = [key, *tiebreak]

    def local_sort(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_cols, kind="mergesort")

    (
        ds.map_batches(assign, batch_format="pandas", batch_size=None)
        .groupby("part")
        .map_groups(local_sort, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["part"])
    )

    # manifest from parquet FOOTERS only (no data pass)
    entries = []
    for d in sorted(
        (p for p in os.listdir(out_dir) if p.startswith("part=")),
        key=lambda p: int(p.split("=", 1)[1]),
    ):
        full = os.path.join(out_dir, d)
        n_rows, kmin, kmax = 0, None, None
        for f in sorted(os.listdir(full)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(full, f)).metadata
            n_rows += md.num_rows
            ci = md.schema.to_arrow_schema().get_field_index(key)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    kmin = st.min if kmin is None else min(kmin, st.min)
                    kmax = st.max if kmax is None else max(kmax, st.max)
        entries.append(
            {
                "part": int(d.split("=", 1)[1]),
                "n_rows": int(n_rows),
                "key_min": int(kmin) if kmin is not None else None,
                "key_max": int(kmax) if kmax is not None else None,
            }
        )
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump({"key": key, "tiebreak": list(tiebreak), "parts": entries}, fh)
    return entries


def sorted_read_ranked(out_dir: str, columns: list[str] | None = None):
    """Read a :func:`sorted_export` layout back as a Dataset with an
    explicit global ``rank`` column (0-based, dense): partitions in
    manifest order, partition-local re-sort by (key, *tiebreak), rank
    = manifest cumulative offset + local position. Each partition is
    one independent read+sort task — the global order costs no global
    exchange on the way back out either."""
    import ray.data as rd

    with open(os.path.join(out_dir, "manifest.json")) as fh:
        man = json.load(fh)
    key, tiebreak = man["key"], man["tiebreak"]
    offsets, cum = {}, 0
    for e in man["parts"]:
        offsets[e["part"]] = cum
        cum += e["n_rows"]

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["part_id"].iloc[0])
        out = df.sort_values([key, *tiebreak], kind="mergesort").reset_index(
            drop=True
        )
        out["rank"] = offsets[part] + np.arange(len(out), dtype=np.int64)
        keep = [
            "rank",
            *(columns or [c for c in out.columns if c not in ("part_id", "rank")]),
        ]
        return out[keep]

    paths = [
        os.path.join(out_dir, f"part={e['part']}", f)
        for e in man["parts"]
        for f in sorted(os.listdir(os.path.join(out_dir, f"part={e['part']}")))
        if f.endswith(".parquet")
    ]
    return (
        rd.read_parquet(paths)
        .groupby("part_id")
        .map_groups(rank_part, batch_format="pandas")
    )
