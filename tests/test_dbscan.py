"""Grid-DBSCAN: hand oracles for the hierarchical plan's edge cases
(block borders, longitude wrap, singletons, halo-only pieces) plus a
BFS ground-truth sweep and the forced distributed-CC route. The
registered query's DuckDB oracle runs in test_queries_oracle."""

import collections

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.functions import cells
from activity_files_ray.spatial import dbscan


def _bfs_reference(cell_counts: dict[int, int], level: int, min_pts: int):
    """Ground truth: BFS over 8-neighbor core cells (lon wrap)."""
    core = {c for c, n in cell_counts.items() if n >= min_pts}
    n_grid = 1 << level
    seen, out = set(), []
    for s in sorted(core):
        if s in seen:
            continue
        comp, q = [s], [s]
        seen.add(s)
        while q:
            u = q.pop()
            x, y = u >> 29, u & ((1 << 29) - 1)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    ny = y + dy
                    if 0 <= ny < n_grid:
                        v = (((x + dx) % n_grid) << 29) + ny
                        if v in core and v not in seen:
                            seen.add(v)
                            comp.append(v)
                            q.append(v)
        out.append(
            {
                "cluster_id": min(comp),
                "n_cells": len(comp),
                "n_pts": sum(cell_counts[c] for c in comp),
            }
        )
    return (
        pd.DataFrame(out, columns=["cluster_id", "n_cells", "n_pts"])
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )


def _run(cell_rows: np.ndarray, level: int, min_pts: int) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"cell": cell_rows}))
    return (
        dbscan.grid_dbscan(ds, level, min_pts)
        .to_pandas()
        .astype("int64")
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )


def _cells_of(xy: list[tuple[int, int]]) -> np.ndarray:
    return np.array([(x << 29) + y for x, y in xy], dtype=np.int64)


@pytest.mark.usefixtures("ray_session")
class TestGridDbscan:
    def test_cross_block_component_and_singleton(self):
        # level 7, BLOCK_SHIFT 5 → blocks are 32×32 cells; the run
        # x=30..33 crosses the block border at x=32, plus an isolated
        # singleton far away — both must come back exactly once.
        xy = [(30, 10), (31, 10), (32, 10), (33, 11), (100, 100)]
        rows = np.repeat(_cells_of(xy), 2)  # every cell core (n=2)
        got = _run(rows, level=7, min_pts=2)
        want = _bfs_reference(collections.Counter(rows.tolist()), 7, 2)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) == 2 and got["n_cells"].tolist() == [4, 1]

    def test_longitude_wrap_joins_edges_of_grid(self):
        # x=0 and x=127 are neighbors at level 7 (wrap); y differs by 1
        xy = [(0, 50), (127, 51)]
        rows = np.repeat(_cells_of(xy), 3)
        got = _run(rows, level=7, min_pts=3)
        assert len(got) == 1
        assert got.loc[0, "n_cells"] == 2 and got.loc[0, "n_pts"] == 6

    def test_min_pts_filters_noise_cells(self):
        # middle cell of a would-be bridge has only 1 point → two
        # separate clusters
        xy = [(10, 10), (11, 10), (12, 10), (13, 10), (14, 10)]
        rows = np.concatenate(
            [np.repeat(_cells_of(xy), 2), _cells_of([(12, 10)])]
        )  # (12,10) gets 3 pts; drop 2 of them → rebuild explicitly
        counts = {c: 2 for c in _cells_of(xy).tolist()}
        counts[_cells_of([(12, 10)])[0]] = 1  # noise
        rows = np.concatenate(
            [np.repeat(np.int64(c), n) for c, n in counts.items()]
        )
        got = _run(rows, level=7, min_pts=2)
        want = _bfs_reference(counts, 7, 2)
        pd.testing.assert_frame_equal(got, want)
        assert len(got) == 2

    def test_matches_bfs_on_synthetic_sweep(self):
        # deterministic pseudo-random point set dense enough for
        # multi-cell components spanning several blocks
        rng = np.random.RandomState(7)
        x = rng.randint(0, 64, size=4000)
        y = rng.randint(0, 64, size=4000)
        rows = _cells_of(list(zip(x.tolist(), y.tolist())))
        got = _run(rows, level=7, min_pts=2)
        want = _bfs_reference(collections.Counter(rows.tolist()), 7, 2)
        pd.testing.assert_frame_equal(got, want)
        assert (got["n_cells"] > 1).any()  # real multi-cell clusters

    def test_distributed_cc_route_matches_driver_fold(self, monkeypatch):
        rng = np.random.RandomState(11)
        x = rng.randint(0, 64, size=1500)
        y = rng.randint(0, 64, size=1500)
        rows = _cells_of(list(zip(x.tolist(), y.tolist())))
        fold = _run(rows, level=7, min_pts=2)
        monkeypatch.setattr(dbscan, "BOUNDARY_FOLD_MAX", 1)
        distcc = _run(rows, level=7, min_pts=2)
        pd.testing.assert_frame_equal(fold, distcc)

    def test_all_interior_emits_no_hooks(self):
        # one compact blob strictly inside a block → resolved entirely
        # in phase 3; the boundary graph must be empty (finals only)
        xy = [(5, 5), (5, 6), (6, 5), (6, 6)]
        rows = np.repeat(_cells_of(xy), 2)
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"cell": rows}))
        out = dbscan.grid_dbscan(ds, 7, 2).to_pandas()
        assert len(out) == 1 and int(out.loc[0, "n_cells"]) == 4


@pytest.mark.usefixtures("ray_session")
class TestLateR4ScaleContracts:
    """Plan pins for the late-r4 operators (TestFlagshipScalePlan
    style): distributed results stay Datasets; driver-side frames
    exist only where cardinality is bounded by construction."""

    def test_distributed_queries_return_datasets(self, sf_dir):
        import ray.data

        from activity_files_ray.pipelines import queries as q

        for fn in (q.q_grid_dbscan, q.q_proximity_pairs, q.q_tile_mosaic):
            assert isinstance(fn(sf_dir), ray.data.Dataset), fn.__name__

    def test_topk_driver_frames_are_bounded(self, sf_dir):
        from activity_files_ray.pipelines import queries as q

        vocab = q.q_vocab_topk(sf_dir)
        assert len(vocab) <= q.VOCAB_TOPK
        ranks = q.q_lang_top_tokens(sf_dir)
        assert ranks.groupby("lang").size().max() <= q.LANG_TOPK
        assert (ranks.groupby("lang")["rn"].max() <= q.LANG_TOPK).all()
