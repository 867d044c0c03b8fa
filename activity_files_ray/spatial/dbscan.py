"""Grid-DBSCAN: density-based spatial clustering over discrete cells.

The classic DBSCAN neighborhood query is an all-pairs radius search —
quadratic and shuffle-hostile. The gridded formulation (GriDBSCAN, a
standard public reformulation) replaces the epsilon-ball with the
cell graph of the repo's quadtree grid
(:mod:`activity_files_ray.functions.cells`):

* a cell is CORE when it holds ``>= min_pts`` points;
* two core cells are connected when they are 8-neighbors (Chebyshev
  distance 1, longitude wrapping modulo the grid width — the same
  neighborhood :func:`cells.disk_cells` serves the kNN ring search);
* a cluster is a connected component of core cells, labelled by its
  MINIMUM cell id (deterministic, SQL-replayable).

This is the corpus lift of the reference's stopped-point grouping
(`raw_editor.dart` pause detection groups consecutive near-stationary
points; here the grouping is spatial over the whole corpus rather
than temporal within one file).

Distributed plan — HIERARCHICAL contraction, the geometry analog of
the two-phase aggregate (local work first, exchange only what cannot
be resolved locally):

1. per-cell counts via :func:`agg.bucketed_aggregate` (key-per-row
   safe), core filter inside ``map_batches``;
2. ONE ``groupby(block)`` shuffle co-locates each coarse block
   (parent cell at ``level - BLOCK_SHIFT``; ~1k fine cells + halo per
   group, a CONSTANT independent of corpus size). Core cells on a
   block border are replicated into the adjacent blocks as HALO rows,
   so every edge of the cell graph is visible in at least one group;
3. per-block union-find over owned+halo cells (bounded constant
   work). Pieces with no halo member cannot connect outward —
   they are FINAL clusters and their stats are emitted right there
   (at production density that is ~all of them: interior/boundary
   scales like block area/perimeter). Pieces touching the halo emit
   ``(cell, local_min)`` hook pairs; halo-only pieces are skipped
   (their owning block emits them);
4. the hook-pair graph — boundary cells only, corpus^(1/2)-shaped —
   resolves below ``BOUNDARY_FOLD_MAX`` rows in one bounded driver
   union-find (the ``SHUFFLE_THRESHOLD_DOCS`` routing pattern from
   :mod:`..pipelines.dedup`), else through the alternating-star
   Dataset CC (:func:`dedup.cluster_pairs_distributed`) plus a
   hash-bucketed vectorized label×count join — nothing driver-side
   scales with the corpus on that path.

Everything returns a ``ray.data.Dataset`` of
``(cluster_id, n_cells, n_pts)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import cells
from ..pipelines import agg

# Coarse block = parent cell BLOCK_SHIFT levels up: 2^shift × 2^shift
# fine cells per block (32×32 = 1024 interior + ≤132 halo — bounded
# per-group state regardless of corpus size).
BLOCK_SHIFT = 5
# Hook-pair rows below this fold to a driver union-find (bounded,
# same routing idea as dedup.SHUFFLE_THRESHOLD_DOCS); above, the
# Dataset CC runs and the driver never sees a row.
BOUNDARY_FOLD_MAX = 200_000

_OUT_COLS = ["cluster_id", "n_cells", "n_pts"]


def _bucket_of(col: pd.Series, n_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(col, index=False).to_numpy(np.uint64)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _local_pieces(g: pd.DataFrame, level: int) -> pd.DataFrame:
    """One coarse block: union-find over its owned+halo core cells.
    Emits final cluster rows (``is_final=1``) for halo-free pieces and
    ``(cell, local_min, n)`` hook rows (``is_final=0``) for pieces
    that might continue into a neighbor block."""
    cid = g["cell"].to_numpy(np.int64)
    # the same cell can arrive as owned (from its own block) AND as a
    # border duplicate — collapse to unique cells, owned wins
    order = np.argsort(cid, kind="stable")
    cid, n, owned = (
        cid[order],
        g["n"].to_numpy(np.int64)[order],
        g["owned"].to_numpy(np.int64)[order],
    )
    uniq, inv = np.unique(cid, return_index=False, return_inverse=True)
    un = np.zeros(len(uniq), dtype=np.int64)
    uo = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(un, inv, n)
    np.maximum.at(uo, inv, owned)

    # adjacency among present cells: 9-neighbor ids matched by binary
    # search (vectorized; no Python loop over cells)
    nbr = cells.disk_cells(uniq, level, 1)  # (m, 9)
    pos = np.searchsorted(uniq, nbr)
    pos = np.clip(pos, 0, len(uniq) - 1)
    hit = uniq[pos] == nbr
    src = np.repeat(np.arange(len(uniq)), nbr.shape[1])[hit.ravel()]
    dst = pos.ravel()[hit.ravel()]

    parent = np.arange(len(uniq), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    root = np.array([find(i) for i in range(len(uniq))], dtype=np.int64)

    piece_min = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(piece_min, root, uniq)
    has_halo = np.zeros(len(uniq), dtype=bool)
    np.logical_or.at(has_halo, root, uo == 0)
    has_owned = np.zeros(len(uniq), dtype=bool)
    np.logical_or.at(has_owned, root, uo == 1)

    final_roots = has_owned & ~has_halo & (root == np.arange(len(uniq)))
    fin_n_cells = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(fin_n_cells, root, 1)
    fin_n_pts = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(fin_n_pts, root, un)

    open_mask = has_owned[root] & has_halo[root]
    return pd.DataFrame(
        {
            "cell": np.concatenate([piece_min[final_roots], uniq[open_mask]]),
            "b": np.concatenate([fin_n_cells[final_roots], piece_min[root[open_mask]]]),
            "n": np.concatenate([fin_n_pts[final_roots], un[open_mask]]),
            "is_final": np.concatenate(
                [
                    np.ones(int(final_roots.sum()), dtype=np.int64),
                    np.zeros(int(open_mask.sum()), dtype=np.int64),
                ]
            ),
        }
    )


def grid_dbscan(cell_ds, level: int, min_pts: int, n_buckets: int | None = None):
    """Cluster a Dataset with a ``cell`` column (int64 grid cell ids
    at ``level``); returns a Dataset of
    ``(cluster_id, n_cells, n_pts)`` — one row per density cluster,
    ``cluster_id`` = the component's minimum cell id."""
    import ray.data as rd

    if n_buckets is None:
        n_buckets = agg.default_n_buckets()
    block_level = max(0, level - BLOCK_SHIFT)

    counts = agg.bucketed_aggregate(cell_ds, ["cell"], {"n": ("", "count")})

    def emit_blocks(df: pd.DataFrame) -> pd.DataFrame:
        """Core filter + block assignment: every core cell goes to its
        own block, plus halo copies into each adjacent block its 3x3
        box touches (≤ 3 extra for border cells, 0 for interior)."""
        df = df[df["n"].to_numpy() >= min_pts]
        cid = df["cell"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        nbr = cells.disk_cells(cid, level, 1)  # (m, 9); col 4 is self
        blocks = cells.parent_cell_id(nbr.ravel(), level, block_level)
        own = cells.parent_cell_id(cid, level, block_level)
        k = nbr.shape[1]
        out = pd.DataFrame(
            {
                "block": blocks,
                "cell": np.repeat(cid, k),
                "n": np.repeat(n, k),
                "owned": (blocks == np.repeat(own, k)).astype(np.int64),
            }
        )
        return out.drop_duplicates(["block", "cell"])

    tagged = (
        # 9x halo emission — bound the per-task frame explicitly
        counts.map_batches(emit_blocks, batch_format="pandas", batch_size=262144)
        .groupby("block")
        .map_groups(lambda g: _local_pieces(g, level), batch_format="pandas")
        .materialize()  # consumed by the final rows AND the hook graph
    )

    finals = tagged.map_batches(
        lambda df: pd.DataFrame(
            {"cluster_id": df["cell"], "n_cells": df["b"], "n_pts": df["n"]}
        )[df["is_final"].to_numpy() == 1],
        batch_format="pandas",
        batch_size=None,
    )
    hooks = tagged.map_batches(
        lambda df: df.loc[df["is_final"].to_numpy() == 0, ["cell", "b", "n"]],
        batch_format="pandas",
        batch_size=None,
    ).materialize()

    n_hooks = hooks.count()
    if n_hooks == 0:
        return finals
    if n_hooks <= BOUNDARY_FOLD_MAX:
        # bounded boundary graph: one driver union-find over ≤
        # BOUNDARY_FOLD_MAX rows (cells on coarse-block borders only)
        hp = hooks.to_pandas().drop_duplicates(["cell", "b"])
        ids = pd.unique(pd.concat([hp["cell"], hp["b"]]))
        idx = pd.Series(np.arange(len(ids)), index=ids)
        parent = np.arange(len(ids), dtype=np.int64)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in zip(idx[hp["cell"]].to_numpy(), idx[hp["b"]].to_numpy()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        root = np.array([find(i) for i in range(len(ids))], dtype=np.int64)
        lab = pd.DataFrame({"cell": ids, "root": ids[root]})
        per_cell = hp.drop_duplicates("cell").merge(lab, on="cell")
        # min id over the whole component (root index ids are already
        # min-rooted because union always keeps the smaller index and
        # ids were built in first-seen order — recompute via groupby
        # min on the true cell ids to be explicit)
        cl = per_cell.groupby("root", as_index=False).agg(
            cluster_id=("cell", "min"), n_cells=("cell", "count"), n_pts=("n", "sum")
        )[_OUT_COLS]
        return finals.union(rd.from_pandas(cl))

    # boundary graph too large for one process: Dataset CC + a
    # hash-bucketed vectorized label×count join
    from ..pipelines.dedup import cluster_pairs_distributed

    labels = cluster_pairs_distributed(
        hooks.map_batches(
            lambda df: df[["cell", "b"]].rename(columns={"cell": "a"}),
            batch_format="pandas",
            batch_size=None,
        )
    ).map_batches(
        lambda df: pd.DataFrame({"cell": df["doc_id"], "v": df["cluster_id"], "_is_lab": np.int64(1)}),
        batch_format="pandas",
        batch_size=None,
    )
    cell_n = agg.bucketed_aggregate(hooks, ["cell"], {"n": ("n", "max")}).map_batches(
        lambda df: pd.DataFrame({"cell": df["cell"], "v": df["n"], "_is_lab": np.int64(0)}),
        batch_format="pandas",
        batch_size=None,
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df["cell"], n_buckets)
        return df

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["_is_lab"].to_numpy() == 1]
        cnt = g[g["_is_lab"].to_numpy() == 0]
        m = lab[["cell", "v"]].merge(cnt[["cell", "v"]], on="cell", how="inner")
        return pd.DataFrame({"cluster_id": m["v_x"], "n": m["v_y"]})

    joined = (
        labels.union(cell_n)
        .map_batches(add_bucket, batch_format="pandas", batch_size=None)
        .groupby("_bucket")
        .map_groups(bucket_join, batch_format="pandas")
    )
    cc_stats = agg.bucketed_aggregate(
        joined, ["cluster_id"], {"n_cells": ("", "count"), "n_pts": ("n", "sum")}
    )
    return finals.union(cc_stats)
