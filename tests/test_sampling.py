"""Deterministic hash split / sample (pipelines/sampling.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines import sampling


class TestHashPrimitives:
    def test_md5_u64_matches_duckdb(self):
        ids = np.array([0, 1, 7, 123456789, -5], dtype=np.int64)
        got = sampling.md5_u64(ids, salt="s:")
        expr = sampling.md5_u64_sql("v", salt="s:")
        want = duckdb.sql(
            f"SELECT {expr} AS h FROM (SELECT UNNEST({ids.tolist()}) AS v)"
        ).df()["h"].to_numpy(np.uint64)
        assert (got == want).all()

    def test_boundaries_exact_and_exhaustive(self):
        b = sampling.split_boundaries([80, 10, 10])
        assert b[-1] == 1 << 64
        assert b[0] == ((1 << 64) * 80) // 100
        assert b[1] == ((1 << 64) * 90) // 100
        with pytest.raises(ValueError):
            sampling.split_boundaries([0, 0])

    def test_boundary_edge_matches_sql_strict_less(self):
        # a hash exactly ON a boundary belongs to the NEXT split in
        # both the numpy searchsorted(side='right') and the SQL `<`.
        b = sampling.split_boundaries([1, 1])  # [2^63, 2^64]
        h = np.array([b[0]], dtype=np.uint64)
        idx = np.searchsorted(
            np.array(b[:-1], dtype=np.uint64), h, side="right"
        )
        assert idx[0] == 1  # second split


@pytest.mark.usefixtures("ray_session")
class TestHashSplitSample:
    def _ds(self, n=5000):
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"id": np.arange(n, dtype=np.int64)})
        ).repartition(4)

    def test_split_disjoint_exhaustive_deterministic(self):
        names, weights = ["train", "val", "test"], [8, 1, 1]
        a = sampling.hash_split(self._ds(), "id", names, weights).to_pandas()
        b = sampling.hash_split(self._ds(), "id", names, weights).to_pandas()
        assert len(a) == 5000 and set(a["split"]) <= set(names)
        pd.testing.assert_frame_equal(
            a.sort_values("id").reset_index(drop=True),
            b.sort_values("id").reset_index(drop=True),
        )
        frac = a["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.03

    def test_sample_is_append_stable_superset(self):
        small = sampling.hash_sample(self._ds(2000), "id", 1, 10).to_pandas()
        big = sampling.hash_sample(self._ds(5000), "id", 1, 10).to_pandas()
        assert set(small["id"]) <= set(big["id"])
        assert abs(len(big) / 5000 - 0.1) < 0.02

    def test_split_matches_sql_case(self):
        names, weights, salt = ["a", "b"], [3, 1], "t:"
        got = (
            sampling.hash_split(self._ds(500), "id", names, weights, salt=salt)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        case = sampling.split_sql_case("id", names, weights, salt)
        want = duckdb.sql(
            f"SELECT id, {case} AS split FROM "
            "(SELECT UNNEST(range(500)) AS id) ORDER BY id"
        ).df()
        assert got["split"].tolist() == want["split"].tolist()
