"""Proximity join: brute-force equivalence (every pair exactly once —
the half-space probing uniqueness claim), wrap/boundary edges, and
the level-completeness helper. The registered query's DuckDB oracle
runs in test_queries_oracle."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.spatial import proximity


def _brute(df: pd.DataFrame, d_cd: int, t_us: int) -> pd.DataFrame:
    rows = {}
    v = df.to_records(index=False)
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            a, b = v[i], v[j]
            if a.user_id == b.user_id:
                continue
            if (
                abs(int(a.lat_cd) - int(b.lat_cd)) <= d_cd
                and abs(int(a.lon_cd) - int(b.lon_cd)) <= d_cd
                and abs(int(a.ts_us) - int(b.ts_us)) <= t_us
            ):
                key = (min(a.user_id, b.user_id), max(a.user_id, b.user_id))
                rows[key] = rows.get(key, 0) + 1
    return (
        pd.DataFrame(
            [{"ua": k[0], "ub": k[1], "n_hits": n} for k, n in rows.items()],
            columns=["ua", "ub", "n_hits"],
        )
        .sort_values(["ua", "ub"])
        .reset_index(drop=True)
        .astype("int64")
    )


def _run(df: pd.DataFrame, d_cd: int, t_us: int, level=None) -> pd.DataFrame:
    import ray.data as rd

    out = proximity.proximity_pairs(
        rd.from_pandas(df), d_cd, t_us, level=level, n_buckets=8
    ).to_pandas()
    if len(out) == 0:  # empty blocks may drop the schema entirely
        return pd.DataFrame(columns=["ua", "ub", "n_hits"]).astype("int64")
    return (
        out.sort_values(["ua", "ub"]).reset_index(drop=True).astype("int64")
    )


@pytest.mark.usefixtures("ray_session")
class TestProximityPairs:
    def test_matches_brute_force_random(self):
        rng = np.random.RandomState(3)
        n = 400
        df = pd.DataFrame(
            {
                "user_id": rng.randint(0, 40, n),
                "ts_us": rng.randint(0, 10**9, n).astype(np.int64),
                "lat_cd": rng.randint(-9000, 9000, n).astype(np.int64),
                "lon_cd": rng.randint(-18000, 18000, n).astype(np.int64),
            }
        )
        d, t = 500, 10**8
        got = _run(df, d, t)
        want = _brute(df, d, t)
        pd.testing.assert_frame_equal(got, want)
        assert len(want) > 0  # parameters produce real matches

    def test_bucket_boundary_pair_found_once(self):
        # two points straddling a time-bucket AND a cell border —
        # must appear exactly once with n_hits == 1
        df = pd.DataFrame(
            {
                "user_id": [1, 2],
                "ts_us": [999_999, 1_000_001],  # buckets 0 and 1 at t=1e6
                "lat_cd": [-1, 1],
                "lon_cd": [-1, 1],
            }
        )
        got = _run(df, d_cd=10, t_us=1_000_000)
        assert got.to_dict("records") == [{"ua": 1, "ub": 2, "n_hits": 1}]

    def test_dateline_points_use_plain_abs_not_wrap(self):
        # +179.99° and -179.99° are 2 cd apart on the sphere but
        # 35998 cd apart under the documented plain-abs semantics —
        # must NOT match (keeps parity with the SQL oracle)
        df = pd.DataFrame(
            {
                "user_id": [1, 2],
                "ts_us": [0, 0],
                "lat_cd": [0, 0],
                "lon_cd": [17999, -17999],
            }
        )
        got = _run(df, d_cd=10, t_us=10)
        assert len(got) == 0

    def test_same_user_never_pairs(self):
        df = pd.DataFrame(
            {
                "user_id": [7, 7],
                "ts_us": [0, 1],
                "lat_cd": [0, 0],
                "lon_cd": [0, 1],
            }
        )
        assert len(_run(df, d_cd=10, t_us=10)) == 0

    def test_min_complete_level(self):
        assert proximity.min_complete_level(200) == 6
        # the returned level's lat extent covers d
        for d in (1, 50, 200, 1000, 4000):
            lv = proximity.min_complete_level(d)
            assert (18000 >> lv) >= d
            assert lv == 20 or (18000 >> (lv + 1)) < d

    def test_level_guard(self):
        import ray.data as rd

        df = rd.from_pandas(
            pd.DataFrame(
                {"user_id": [1], "ts_us": [0], "lat_cd": [0], "lon_cd": [0]}
            )
        )
        with pytest.raises(ValueError):
            proximity.proximity_pairs(df, 9000, 10)  # level would be < 2

    def test_large_radius_message_names_limit_and_4500_works(self):
        import ray.data as rd

        df = rd.from_pandas(
            pd.DataFrame(
                {"user_id": [1, 2], "ts_us": [0, 0], "lat_cd": [0, 10], "lon_cd": [0, 10]}
            )
        )
        with pytest.raises(ValueError, match="4500"):
            proximity.proximity_pairs(df, 4501, 10)
        # the documented boundary radius is supported (level 2)
        assert proximity.min_complete_level(4500) == 2
        got = proximity.proximity_pairs(df, 4500, 10, n_buckets=4).to_pandas()
        assert len(got) == 1 and int(got["n_hits"].iloc[0]) == 1
