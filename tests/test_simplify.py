"""Douglas–Peucker simplification (spatial/simplify.py)."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.spatial import simplify


def _dp_recursive_reference(x, y, eps):
    """Textbook recursive DP in exact Python ints — independent of
    the library's iterative/vectorized kernel."""
    n = len(x)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j - i < 2:
            return
        sdx, sdy = int(x[j] - x[i]), int(y[j] - y[i])
        len2 = sdx * sdx + sdy * sdy
        best_num, best_k = -1, -1
        for k in range(i + 1, j):
            if len2 == 0:
                num = (int(x[k] - x[i])) ** 2 + (int(y[k] - y[i])) ** 2
            else:
                cross = sdx * int(y[k] - y[i]) - sdy * int(x[k] - x[i])
                num = cross * cross
            if num > best_num:
                best_num, best_k = num, k
        den = len2 if len2 else 1
        if best_num > eps * eps * den:
            keep[best_k] = True
            rec(i, best_k)
            rec(best_k, j)

    rec(0, n - 1)
    return keep


class TestDpKeepMask:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("eps", [50, 1000, 4000])
    def test_matches_recursive_reference(self, seed, eps):
        rng = np.random.default_rng(seed)
        n = rng.integers(3, 300)
        x = rng.integers(-18000, 18000, n).astype(np.int64)
        y = rng.integers(-9000, 9000, n).astype(np.int64)
        got = simplify.dp_keep_mask(x, y, eps)
        want = _dp_recursive_reference(x, y, eps)
        assert got.tolist() == want

    def test_edges(self):
        assert simplify.dp_keep_mask(np.array([]), np.array([]), 10).tolist() == []
        assert simplify.dp_keep_mask(np.array([1]), np.array([2]), 10).tolist() == [True]
        assert simplify.dp_keep_mask(
            np.array([1, 5]), np.array([2, 2]), 10
        ).tolist() == [True, True]

    def test_degenerate_chord_duplicate_endpoints(self):
        # A == B chord: deviation falls back to point distance from A
        x = np.array([0, 5000, 0], dtype=np.int64)
        y = np.array([0, 0, 0], dtype=np.int64)
        assert simplify.dp_keep_mask(x, y, 100).tolist() == [True, True, True]
        assert simplify.dp_keep_mask(x, y, 6000).tolist() == [True, False, True]

    def test_collinear_drops_interior(self):
        x = np.arange(10, dtype=np.int64) * 100
        y = np.zeros(10, dtype=np.int64)
        got = simplify.dp_keep_mask(x, y, 1)
        assert got.tolist() == [True] + [False] * 8 + [True]

    def test_tie_breaks_to_first_index(self):
        # two interior points with identical max deviation — the
        # FIRST must become the split point (both sides' rule)
        x = np.array([0, 100, 200, 300], dtype=np.int64)
        y = np.array([0, 500, 500, 0], dtype=np.int64)
        got = simplify.dp_keep_mask(x, y, 100)
        want = _dp_recursive_reference(x, y, 100)
        assert got.tolist() == want
        assert got[1]  # index 1 split first


@pytest.mark.usefixtures("ray_session")
class TestSimplifyTracks:
    def test_groupwise_matches_kernel(self):
        import ray.data as rd

        rng = np.random.default_rng(9)
        n = 2000
        df = pd.DataFrame(
            {
                "trk": rng.integers(0, 12, n),
                "o": np.arange(n, dtype=np.int64),
                "x": rng.integers(-18000, 18000, n).astype(np.int64),
                "y": rng.integers(-9000, 9000, n).astype(np.int64),
            }
        )
        got = (
            simplify.simplify_tracks(
                rd.from_pandas(df).repartition(4),
                1500,
                track_col="trk",
                order_cols=["o"],
                x_col="x",
                y_col="y",
            )
            .to_pandas()
            .sort_values(["trk", "o"])
            .reset_index(drop=True)
        )
        parts = []
        for trk, g in df.sort_values("o").groupby("trk"):
            mask = simplify.dp_keep_mask(
                g["x"].to_numpy(), g["y"].to_numpy(), 1500
            )
            parts.append(g.loc[mask, ["trk", "o"]])
        want = (
            pd.concat(parts).sort_values(["trk", "o"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
