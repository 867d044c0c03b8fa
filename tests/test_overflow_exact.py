"""r5 ADVICE fixes: the integer-exact kernels behind moran_i and
radius_of_gyration must never wrap int64 silently — moran partials
accumulate in Python bigints (shipped as decimal strings) and the
gyration moment either is EXACT or raises loudly, matching where the
DuckDB oracle's own BIGINT cast would fail."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines.queries import (
    _moran_bucket_partial,
    _rog_per_user,
)


class TestMoranBucketPartialExact:
    def _pair_frame(self, da: int, db: int) -> pd.DataFrame:
        # two mutually-adjacent occupied cells A=1, B=2; each emits
        # (self) and (neighbor) keyed rows, as q_moran_i's emit does
        return pd.DataFrame(
            {
                "key": np.array([1, 2, 2, 1], dtype=np.int64),
                "src": np.array([1, 2, 1, 2], dtype=np.int64),
                "dev": np.array([da, db, da, db], dtype=np.int64),
            }
        )

    def test_small_values_vectorized_path(self):
        out = _moran_bucket_partial(self._pair_frame(3, -7))
        assert int(out["w_pairs"].iloc[0]) == 2
        assert int(out["i_num"].iloc[0]) == 2 * 3 * -7
        assert int(out["i_den"].iloc[0]) == 9 + 49

    def test_huge_devs_bigint_path_exact(self):
        da, db = 2**40 + 123, -(2**40) + 7  # dev² ≈ 2⁸⁰ — wraps int64
        out = _moran_bucket_partial(self._pair_frame(da, db))
        assert int(out["i_num"].iloc[0]) == 2 * da * db
        assert int(out["i_den"].iloc[0]) == da * da + db * db
        # and the exact values genuinely exceed int64 (the old wrap zone)
        assert abs(2 * da * db) >= 2**63

    def test_empty_bucket(self):
        g = pd.DataFrame(
            {
                "key": np.array([5], dtype=np.int64),
                "src": np.array([9], dtype=np.int64),  # src not occupied here
                "dev": np.array([4], dtype=np.int64),
            }
        )
        out = _moran_bucket_partial(g)
        assert int(out["i_num"].iloc[0]) == 0
        assert int(out["w_pairs"].iloc[0]) == 0
        assert int(out["i_den"].iloc[0]) == 0


class TestGyrationMomentExact:
    def _frame(self, la: np.ndarray, lo: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": np.full(len(la), 7, dtype=np.int64),
                "lat_cd": la.astype(np.int64),
                "lon_cd": lo.astype(np.int64),
            }
        )

    def test_matches_bigint_brute_force(self):
        # n³·Var ≈ 3.6e18 at n=3000 full range — inside int64, but far
        # past where naive per-term squaring loses exactness headroom
        rng = np.random.RandomState(11)
        la = rng.randint(-9000, 9001, 3000)
        lo = rng.randint(-18000, 18001, 3000)
        out = _rog_per_user(self._frame(la, lo))
        n = 3000
        sla, slo = int(la.sum()), int(lo.sum())
        brute = sum(
            (n * int(x) - sla) ** 2 for x in la
        ) + sum((n * int(x) - slo) ** 2 for x in lo)
        assert int(out["rog_m"].iloc[0]) == brute
        assert int(out["n_pts"].iloc[0]) == n

    def test_raises_loudly_where_oracle_bigint_would_fail(self):
        # alternating extremes: moment ≈ n³·(18000)²·2 — past int64 at
        # n=4000, which the old numpy formulation wrapped silently
        n = 4000
        la = np.where(np.arange(n) % 2 == 0, 9000, -9000)
        lo = np.where(np.arange(n) % 2 == 0, 18000, -18000)
        brute_lo_term = sum((n * int(x)) ** 2 for x in lo)  # S == 0
        assert brute_lo_term * 1 >= 2**63  # confirms the overflow zone
        with pytest.raises(OverflowError, match="does not fit int64"):
            _rog_per_user(self._frame(la, lo))
