"""Combiner-tree aggregation: per-batch partials + small final merge.

Ray Data's ``groupby().aggregate()`` is a full sort-based shuffle with
a multi-second constant cost regardless of data size (measured: ~5 s
for 64k pre-aggregated rows at 8 CPUs). For aggregates whose RESULT
cardinality is bounded (per-tile counts, per-region stats, per-type
windows — everything but key-per-row dedup), the scalable plan is the
classic combiner tree:

1. ``map_batches(partial)``: collapse each batch to one row per key —
   fully parallel, this is where ~all compute happens;
2. merge the (small) partials with one pandas groupby.

Here the merge runs on the driver (partials are ≤ a few hundred k
rows at bench scale). On a multi-node 100 TB run the same partials
would first be coalesced per node (``repartition`` + a second
``map_batches(merge)`` level) so the driver only merges
nodes × keys rows; the associativity of sum/min/max/count makes every
level exact. Use ``ds.groupby`` instead when the key cardinality is
of the order of the row count (e.g. exact dedup) — then a real
shuffle is unavoidable.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

_MERGE_FN = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def default_n_buckets(cluster_cpus: int | None = None) -> int:
    """Merge-bucket count ≈ 4× total cluster cores (so per-bucket
    merge groups stay parallel across the whole cluster), floored at
    16 and capped at 4096 (beyond that per-group scheduling overhead
    dominates the pandas merges). ``cluster_cpus`` overrides probing
    — callers on a job driver can thread the known cluster width."""
    cpus = cluster_cpus
    if cpus is None:
        try:
            import ray

            if ray.is_initialized():
                cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:  # noqa: BLE001 — probe failure → local fallback
            cpus = None
    if not cpus or cpus <= 0:
        cpus = os.cpu_count() or 8
    return max(16, min(4096, 4 * int(cpus)))


def bucketed_aggregate(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_buckets: int | None = None,
    having=None,
):
    """Distributed grouped aggregate for KEY-PER-ROW cardinalities —
    the hash-partitioned two-phase plan:

    1. ``map_batches(partial)``: collapse each batch to one row per
       key (all compute, fully parallel) and attach a deterministic
       ``bucket = hash(keys) % n_buckets`` column;
    2. ``groupby(bucket).map_groups(merge)``: ONE small-key shuffle
       (n_buckets groups, not one sort key per distinct value) where
       each bucket merges its partials with a pandas groupby.

    Exactness: same associative fns as :func:`tree_aggregate`; every
    key lands in exactly one bucket, so the merge is total. Compared
    with ``ds.groupby(keys).aggregate(...)`` this replaces the full
    sort-based exchange with a hash fan-out — measured ~2× faster at
    bench scale and the shuffle volume is identical (the partials).
    Skew: partials collapse hot keys per batch first; the bucket hash
    spreads distinct keys uniformly. ``n_buckets`` defaults to
    :func:`default_n_buckets` (≈ 4× total cluster cores, probed from
    ``ray.cluster_resources()``) so merge parallelism tracks cluster
    width instead of a fixed constant. Returns a DATASET (keys + agg
    columns) — the result is key-per-row sized and must stay
    distributed.

    ``having(df) -> df`` runs INSIDE each bucket's merge, after the
    final per-key values exist — post-aggregation filters (HAVING)
    prune in the cluster instead of on a driver frame.
    """
    if n_buckets is None:
        n_buckets = default_n_buckets()
    spec = dict(aggs)

    # Arrow-native partial (r4 verdict item 4): the per-batch collapse
    # is the single hottest pass in the engine (every corpus row
    # transits it), so it runs on zero-copy pyarrow batches with the
    # multithreaded C++ hash-groupby — no per-batch DataFrame build.
    # Only the COLLAPSED key rows (distinct keys per batch) touch
    # pandas, for the row-hash that picks the merge bucket.
    arrow_aggs: list[tuple] = []
    renames: dict[str, list[str]] = {}
    for out, (src, fn) in spec.items():
        arrow_name = "count_all" if fn == "count" else f"{src}_{fn}"
        if arrow_name not in renames:
            arrow_aggs.append(([], "count_all") if fn == "count" else (src, fn))
            renames[arrow_name] = []
        renames[arrow_name].append(out)

    def partial(t: "pa.Table") -> "pa.Table":
        part = t.group_by(keys).aggregate(arrow_aggs)
        cols: dict[str, Any] = {k: part[k] for k in keys}
        for arrow_name, outs in renames.items():
            for out in outs:
                cols[out] = part[arrow_name]
        h = pd.util.hash_pandas_object(
            part.select(keys).to_pandas(), index=False
        ).to_numpy(np.uint64)
        cols["_bucket"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        return pa.table(cols)

    merge_named = {
        out: pd.NamedAgg(column=out, aggfunc=_MERGE_FN[fn])
        for out, (_src, fn) in spec.items()
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop(columns=["_bucket"])
            .groupby(keys, as_index=False, observed=True)
            .agg(**merge_named)
        )
        return having(out) if having is not None else out

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def bucketed_topk(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    sort_by: list[str],
    ascending: list[bool],
    k: int,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Grouped aggregate + global top-k for KEY-PER-ROW key
    cardinalities: the hash-partitioned two-phase plan with the top-k
    folded INTO each bucket's merge. Every distinct key lands in
    exactly one bucket, so a row in the global top-k is necessarily in
    its own bucket's top-k — each bucket emits ≤ k candidate rows and
    the driver merges ≤ k × n_buckets rows TOTAL, independent of key
    count (vs :func:`tree_aggregate`, whose driver frame is one row
    per distinct key). ``sort_by``/``ascending`` must order
    deterministically (include a tie-break key). Returns the k-row
    pandas result — bounded by construction."""
    if n_buckets is None:
        n_buckets = default_n_buckets()

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_by, ascending=ascending, kind="mergesort").head(k)

    parts = bucketed_aggregate(ds, keys, aggs, n_buckets, having=bucket_topk)
    df = parts.to_pandas()
    if len(df) == 0:  # all-empty input loses the schema entirely
        return pd.DataFrame(columns=[*keys, *aggs])
    return (
        df.sort_values(sort_by, ascending=ascending, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def bucketed_cap_rows(
    ds,
    keys: list[str],
    sort_by: list[str],
    ascending: list[bool],
    k: int,
    n_buckets: int | None = None,
):
    """Per-key row CAP: keep each key's first ``k`` ROWS under the
    ``sort_by`` order — the grouped-top-k-of-ROWS sibling of
    :func:`bucketed_topk` (which keeps aggregate rows). The training-
    data-curation use is per-tile corpus capping: bound how many
    samples any one hot cell contributes (balanced spatial sampling).

    Two exact phases: a per-batch combiner keeps ≤ k rows per key
    (rows outside a batch's per-key top-k can never enter that key's
    GLOBAL top-k — the order is a total order when ``sort_by``
    includes a tie-break), then the usual hash-bucket exchange merges
    per key. Shuffle volume is min(input, keys × k); returns a
    DATASET (keys × k rows can track input size — stays
    distributed). ``sort_by`` must order deterministically."""
    if n_buckets is None:
        n_buckets = default_n_buckets()

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_by, ascending=ascending, kind="mergesort")
            .groupby(keys, observed=True, sort=False)
            .head(k)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        part = cap(df)
        h = pd.util.hash_pandas_object(part[keys], index=False).to_numpy(np.uint64)
        return part.assign(
            _bucket=(h % np.uint64(n_buckets)).astype(np.int64)
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return cap(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
    )


def bucketed_distinct_count(ds, col: str, n_buckets: int | None = None) -> int:
    """Global COUNT(DISTINCT col) for KEY-PER-ROW cardinalities.
    Per-batch partials collapse to the batch's unique values (+ the
    deterministic hash bucket), the bucket merge emits ONE count row
    per bucket, and the driver sums ≤ n_buckets rows — the full
    distinct-value frame never exists anywhere: each bucket sees only
    its own hash slice of the value space."""
    if n_buckets is None:
        n_buckets = default_n_buckets()

    def partial(t: "pa.Table") -> "pa.Table":
        # zero-copy unique via the Arrow C++ kernel (r5, same
        # treatment as the grouped partials); only the collapsed
        # distinct values touch pandas, for the bucket row-hash
        import pyarrow.compute as pc

        uniq = pc.unique(t[col])
        h = pd.util.hash_pandas_object(
            pd.Series(uniq.to_pandas()), index=False
        ).to_numpy(np.uint64)
        return pa.table(
            {
                col: uniq,
                "_bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g[col].nunique())]})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    return int(counts["n"].sum()) if len(counts) else 0


def tree_aggregate(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    combine_partitions: int = 0,
) -> pd.DataFrame:
    """Grouped aggregate via combiner tree.

    ``aggs``: ``{out_col: (src_col, fn)}`` with fn ∈ sum|min|max|count
    (count ignores src_col). Returns a pandas DataFrame with columns
    ``keys + list(aggs)``; exact for any batch split because all fns
    are associative-mergeable.

    ``combine_partitions > 0`` inserts a middle merge level (the
    per-node combiner from SCALE.md §4): partials are coalesced into
    that many blocks and merged BEFORE the driver, bounding driver
    input at partitions × keys rows. Off by default — at single-host
    bench scale the extra exchange costs more than it saves; on a
    multi-node run set it ≈ node count.
    """
    spec = dict(aggs)

    # Arrow-native partial (r5, same treatment as bucketed_aggregate):
    # the per-batch collapse runs on zero-copy pyarrow batches with the
    # C++ hash-groupby — every corpus row transits this pass.
    arrow_aggs: list[tuple] = []
    renames: dict[str, list[str]] = {}
    for out, (src, fn) in spec.items():
        arrow_name = "count_all" if fn == "count" else f"{src}_{fn}"
        if arrow_name not in renames:
            arrow_aggs.append(([], "count_all") if fn == "count" else (src, fn))
            renames[arrow_name] = []
        renames[arrow_name].append(out)

    def partial(t: "pa.Table") -> "pa.Table":
        part = t.group_by(keys).aggregate(arrow_aggs)
        cols: dict[str, Any] = {k: part[k] for k in keys}
        for arrow_name, outs in renames.items():
            for out in outs:
                cols[out] = part[arrow_name]
        return pa.table(cols)

    merge_named = {
        out: pd.NamedAgg(column=out, aggfunc=_MERGE_FN[fn])
        for out, (_src, fn) in spec.items()
    }
    # stream partial batches and fold them into a running accumulator:
    # the driver-side merge overlaps with pipeline execution instead of
    # serializing after it (Amdahl guard for the scaling runs)
    acc: pd.DataFrame | None = None
    pending: list[pd.DataFrame] = []
    pending_rows = 0
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    if combine_partitions > 0:
        def merge_block(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(keys, as_index=False, observed=True).agg(**merge_named)

        parts = parts.repartition(combine_partitions).map_batches(
            merge_block, batch_format="pandas", batch_size=None
        )
    for b in parts.iter_batches(batch_size=65536, batch_format="pandas"):
        pending.append(b)
        pending_rows += len(b)
        if pending_rows >= 262_144:
            frames = ([acc] if acc is not None else []) + pending
            acc = pd.concat(frames, ignore_index=True).groupby(
                keys, as_index=False, observed=True
            ).agg(**merge_named)
            pending, pending_rows = [], 0
    frames = ([acc] if acc is not None else []) + pending
    if not frames:
        return pd.DataFrame(columns=list(keys) + list(spec))
    return pd.concat(frames, ignore_index=True).groupby(
        keys, as_index=False, observed=True
    ).agg(**merge_named)
