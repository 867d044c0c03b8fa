"""Scale-plan pins for the r3-verdict item-1 call sites: the four
queries whose group-key cardinality tracks ROWS must run the
hash-partitioned two-phase plan (`agg.bucketed_*`), never the
driver-merged combiner tree (`agg.tree_aggregate`) — the same pin
style as TestFlagshipScalePlan (tests/test_spatial.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from activity_files_ray.pipelines import agg
from activity_files_ray.pipelines import queries as q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tree_spy(monkeypatch):
    """Record every tree_aggregate key set the query under test uses
    (queries.py binds `agg` as a module attribute, so patching the
    module function intercepts all its call sites)."""
    calls: list[list[str]] = []
    real = agg.tree_aggregate

    def spy(ds, keys, aggs, **kw):
        calls.append(list(keys))
        return real(ds, keys, aggs, **kw)

    monkeypatch.setattr(agg, "tree_aggregate", spy)
    return calls


@pytest.mark.usefixtures("ray_session")
class TestBucketedHelpers:
    def test_bucketed_topk_matches_pandas(self):
        import ray.data as rd

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {"k": rng.integers(0, 500, 5000), "v": rng.integers(-100, 100, 5000)}
        )
        got = agg.bucketed_topk(
            rd.from_pandas(df).repartition(8),
            ["k"],
            {"s": ("v", "sum"), "n": ("", "count")},
            sort_by=["s", "k"],
            ascending=[False, True],
            k=10,
            n_buckets=16,
        )
        want = (
            df.groupby("k", as_index=False)
            .agg(s=("v", "sum"), n=("v", "size"))
            .sort_values(["s", "k"], ascending=[False, True], kind="mergesort")
            .head(10)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    def test_bucketed_aggregate_having(self):
        import ray.data as rd

        df = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": [1, 1, 0, 0, 0, 1]})
        out = (
            agg.bucketed_aggregate(
                rd.from_pandas(df),
                ["k"],
                {"s": ("v", "sum")},
                having=lambda d: d[d["s"] == 0],
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out["k"].tolist() == [2]

    def test_bucketed_cap_rows_matches_pandas(self):
        import ray.data as rd

        rng = np.random.default_rng(13)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 80, 4000),
                "o": rng.permutation(4000),
                "payload": rng.integers(0, 10**9, 4000),
            }
        )
        got = (
            agg.bucketed_cap_rows(
                rd.from_pandas(df).repartition(8),
                ["k"], ["o"], [True], 5, n_buckets=16,
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        want = (
            df.sort_values(["o"], kind="mergesort")
            .groupby("k", sort=False)
            .head(5)
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    def test_bucketed_distinct_count(self):
        import ray.data as rd

        rng = np.random.default_rng(3)
        df = pd.DataFrame({"u": rng.integers(0, 777, 6000)})
        got = agg.bucketed_distinct_count(rd.from_pandas(df).repartition(6), "u", n_buckets=16)
        assert got == df["u"].nunique()


@pytest.mark.usefixtures("ray_session")
class TestUnboundedKeyScalePlans:
    """VERDICT r3 item 1: no driver-merged combiner tree on keys whose
    cardinality tracks rows."""

    def test_top_orders_never_calls_tree_aggregate(self, tree_spy):
        res = q.q_top_orders(SF_DIR)
        assert tree_spy == []  # per-orderkey sum must be bucketed
        assert len(res) == 10
        assert list(res.columns) == ["l_orderkey", "revenue_c4"]

    def test_users_no_purchase_never_calls_tree_aggregate(self, tree_spy):
        q.q_users_no_purchase(SF_DIR)
        assert tree_spy == []  # per-user_id aggregate must be bucketed

    def test_users_no_purchase_dataset_when_nonempty(self, tmp_path):
        """The HAVING filter runs inside the bucket merge and the
        surviving-user result stays a DATASET (the zero-row case
        collapses to a typed driver frame — a Ray to_pandas quirk)."""
        import ray.data

        events = pa.table(
            {
                "user_id": pa.array([1, 1, 2, 3, 3, 4], pa.int64()),
                "event_type": pa.array(
                    ["view", "purchase", "view", "view", "click", "purchase"]
                ),
            }
        )
        pq.write_table(events, str(tmp_path / "events.parquet"))
        res = q.q_users_no_purchase(str(tmp_path))
        assert isinstance(res, ray.data.Dataset)
        df = res.to_pandas().sort_values("user_id").reset_index(drop=True)
        assert df["user_id"].tolist() == [2, 3]
        assert df["n_events"].tolist() == [1, 2]

    def test_distinct_counts_user_id_never_through_tree(self, tree_spy):
        res = q.q_distinct_counts(SF_DIR)
        assert ["user_id"] not in tree_spy  # row-cardinality key → bucketed
        assert tree_spy == [["event_type"]]  # bounded dim stays on the tree
        import duckdb

        want = duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id), COUNT(DISTINCT event_type) "
            f"FROM '{SF_DIR}/events.parquet'"
        ).fetchone()
        assert (res["n_users"][0], res["n_types"][0]) == want

    def test_image_phash_dedup_returns_dataset(self, tree_spy):
        import ray.data

        res = q.q_image_phash_dedup(SF_DIR)
        assert isinstance(res, ray.data.Dataset)
        assert tree_spy == []
        df = res.to_pandas()
        assert set(df.columns) == {"image_id", "n_copies"}
        assert df["n_copies"].sum() == 200
