"""Global sorted export (r5): partition ranges are disjoint and
ordered, the manifest covers every row, equal keys never straddle a
boundary, ranks are a dense permutation, and the layout is
boundary-sample independent of input block order. The registered
query's ROW_NUMBER oracle runs in test_queries_oracle."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines import sorted_export as se


def _df(n=5000, seed=3, dup_every=7):
    rng = np.random.RandomState(seed)
    key = rng.randint(0, 1_000_000, n).astype(np.int64)
    key[::dup_every] = key[0]  # heavy duplicate key crossing batches
    return pd.DataFrame({"k": key, "i": np.arange(n, dtype=np.int64)})


@pytest.mark.usefixtures("ray_session")
class TestSortedExport:
    def test_disjoint_ordered_complete_and_ranked(self, tmp_path):
        import ray.data as rd

        pdf = _df()
        out = str(tmp_path / "exp")
        entries = se.sorted_export(
            rd.from_pandas(pdf), out, key="k", tiebreak=("i",), n_parts=8
        )
        # manifest: ordered, disjoint [min,max] ranges, full coverage
        assert [e["part"] for e in entries] == sorted(e["part"] for e in entries)
        assert sum(e["n_rows"] for e in entries) == len(pdf)
        for a, b in zip(entries, entries[1:]):
            assert a["key_max"] <= b["key_min"]  # disjoint-or-touching never
        for a, b in zip(entries, entries[1:]):
            if a["key_max"] == b["key_min"]:
                raise AssertionError("equal keys straddle a partition boundary")
        # ranked read-back == pandas global sort
        got = se.sorted_read_ranked(out).to_pandas().sort_values("rank")
        exp = pdf.sort_values(["k", "i"], kind="mergesort").reset_index(drop=True)
        assert got["rank"].tolist() == list(range(len(pdf)))
        assert got["k"].tolist() == exp["k"].tolist()
        assert got["i"].tolist() == exp["i"].tolist()

    def test_manifest_matches_footers(self, tmp_path):
        import ray.data as rd

        pdf = _df(800)
        out = str(tmp_path / "exp")
        entries = se.sorted_export(rd.from_pandas(pdf), out, key="k", n_parts=4)
        with open(os.path.join(out, "manifest.json")) as fh:
            man = json.load(fh)
        assert man["key"] == "k"
        assert man["parts"] == entries
        # per-partition key ranges really bound the data
        for e in entries:
            d = os.path.join(out, f"part={e['part']}")
            vals = pd.concat(
                [
                    pd.read_parquet(os.path.join(d, f), columns=["k"])
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                ]
            )["k"]
            assert int(vals.min()) == e["key_min"]
            assert int(vals.max()) == e["key_max"]

    def test_boundaries_layout_independent(self):
        import ray.data as rd

        pdf = _df(2000)
        shuffled = pdf.sample(frac=1.0, random_state=9).reset_index(drop=True)
        a = se.plan_boundaries(rd.from_pandas(pdf), "k", 8, sample_n=512)
        b = se.plan_boundaries(rd.from_pandas(shuffled), "k", 8, sample_n=512)
        np.testing.assert_array_equal(a, b)
        assert (np.diff(a) > 0).all()  # strictly ascending


class TestMortonKernel:
    def test_sql_parity_and_locality(self):
        import duckdb

        from activity_files_ray.functions import cells

        rng = np.random.RandomState(4)
        la = rng.randint(-9000, 9001, 3000).astype(np.int64)
        lo = rng.randint(-18000, 18001, 3000).astype(np.int64)
        mine = cells.morton_cd(la, lo)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"la": la, "lo": lo}))
        ref = con.execute(
            f"SELECT {cells.morton_sql_expr('la', 'lo')} AS m FROM t"
        ).df()["m"].to_numpy(np.int64)
        np.testing.assert_array_equal(mine, ref)
        # injectivity over the centidegree domain (distinct coords →
        # distinct keys) and the locality property on a small patch
        assert len(np.unique(mine)) == len(
            {(a, b) for a, b in zip(la.tolist(), lo.tolist())}
        )
        base = cells.morton_cd(np.array([0]), np.array([0]))[0]
        nb = cells.morton_cd(np.array([0, 1, 0]), np.array([1, 0, 0]))
        assert nb[2] == base and nb[0] != base and nb[1] != base

    def test_resume_missing_parts_equals_one_shot(self, tmp_path):
        """Kill-and-resume: delete two partition dirs + the manifest
        from a finished export, re-run with only_parts = the missing
        ids, and require the resumed layout (manifest, ranks, rows)
        to be byte-equal to the one-shot export."""
        import shutil

        import ray.data as rd

        df = _df()
        full_dir = tmp_path / "full"
        res_dir = tmp_path / "resumed"
        kw = dict(key="k", tiebreak=("i",), n_parts=8)
        man_full = se.sorted_export(rd.from_pandas(df), str(full_dir), **kw)
        se.sorted_export(rd.from_pandas(df), str(res_dir), **kw)
        # simulate a crash: two ranges missing, no manifest
        missing = {2, 5}
        for p in missing:
            shutil.rmtree(res_dir / f"part={p}")
        os.remove(res_dir / "manifest.json")
        man_res = se.sorted_export(
            rd.from_pandas(df), str(res_dir), **kw, only_parts=missing
        )
        assert man_res == man_full
        a = se.sorted_read_ranked(str(full_dir)).to_pandas()
        b = se.sorted_read_ranked(str(res_dir)).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values("rank").reset_index(drop=True),
            b[cols].sort_values("rank").reset_index(drop=True),
        )
