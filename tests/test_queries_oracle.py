"""Driver-style correctness gate: run every registered Ray query at
sf0.001/sf0.01 and compare against its DuckDB oracle — row count,
schema (column names), and exact values after order-insensitive
row sort (mirrors CORRECTNESS_r{N}.json)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines import queries as q

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]) or df[c].dtype == object and all(
            isinstance(v, int) for v in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                pass
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


SQL_QUERIES = [name for name, (_f, sql) in q.QUERIES.items() if sql is not None]
ROWS_ONLY = [name for name, (_f, sql) in q.QUERIES.items() if sql is None]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, oracle_con):
    fn, sql = q.QUERIES[name]
    res = fn(SF_DIR)
    mine = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ref = oracle_con.execute(q.resolve_sql(sql)).df()
    assert len(mine) == len(ref), f"{name}: rows {len(mine)} != {len(ref)}"
    assert sorted(mine.columns) == sorted(ref.columns), (
        f"{name}: cols {sorted(mine.columns)} != {sorted(ref.columns)}"
    )
    a, b = _normalize(mine.copy()), _normalize(ref.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            np.testing.assert_allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0,
                err_msg=f"{name}.{c}",
            )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    fn, _ = q.QUERIES[name]
    res = fn(SF_DIR)
    mine = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    assert len(mine) >= 0
    assert len(mine.columns) > 0


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    e = importlib.import_module("__ray_entry__")
    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    assert len(df) >= 0
    assert set(df.columns) == {"region_id", "cell", "n"}
    assert set(e.oracle_sql()).issubset(set(e.queries()))


@pytest.mark.skipif(
    not os.environ.get("GRAFT_FULL_GATE"),
    reason="10x-scale gate: set GRAFT_FULL_GATE=1 (adds ~2 min)",
)
@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle_sf01(name):
    """The same oracle gate at sf0.1 — 10x the driver's scale. This
    caught a real bug the sf0.01 gate could not (integer-distance
    kNN ties misordered by degree-float skew at high POI density)."""
    if name in q.SF001_SCOPED_ORACLES:
        pytest.skip("golden VALUES pin is scoped to the sf0.01 driver scale")
    big = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{big}/{t}.parquet'")
    fn, sql = q.QUERIES[name]
    res = fn(big)
    mine = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    ref = con.execute(q.resolve_sql(sql)).df()
    assert len(mine) == len(ref)
    a, b = _normalize(mine.copy()), _normalize(ref.copy())
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            np.testing.assert_allclose(a[c].astype(float), b[c].astype(float), rtol=0, atol=0)
        else:
            pd.testing.assert_series_equal(a[c], b[c], check_dtype=False, check_names=False)
