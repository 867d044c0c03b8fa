"""Spatial core tests: kNN ring expansion vs brute force, PIP join
stage, raster tiling, salted aggregation (SURVEY.md §5 layer (d):
spatial results must match a slow-but-obvious oracle exactly)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from activity_files_ray import fixtures
from activity_files_ray.functions import cells, polygons
from activity_files_ray.spatial import knn, stages


class TestKnn:
    def _brute(self, plat, plon, idx):
        d2 = (idx.lat[None, :] - plat[:, None]) ** 2 + (idx.lon[None, :] - plon[:, None]) ** 2
        # (d2, poi_id) lexicographic argmin
        best = np.empty(len(plat), dtype=np.int64)
        for i in range(len(plat)):
            m = d2[i].min()
            cand = np.nonzero(d2[i] == m)[0]
            best[i] = cand[np.argmin(idx.poi_ids[cand])]
        return best, d2[np.arange(len(plat)), best]

    def test_matches_brute_force(self):
        rng = np.random.default_rng(11)
        poi_lat = np.round(rng.uniform(38, 42, 300), 4)
        poi_lon = np.round(rng.uniform(-107, -103, 300), 4)
        idx = knn.PoiIndex(np.arange(300), poi_lat, poi_lon, level=12)
        plat = np.round(rng.uniform(38, 42, 500), 4)
        plon = np.round(rng.uniform(-107, -103, 500), 4)
        got_rows, got_d2 = knn.nearest_poi(plat, plon, idx)
        exp_rows, exp_d2 = self._brute(plat, plon, idx)
        np.testing.assert_array_equal(got_rows, exp_rows)
        np.testing.assert_allclose(got_d2, exp_d2)

    def test_far_points_resolve_via_fallback(self):
        # POIs clustered; query from the antipode → straggler path
        idx = knn.PoiIndex(np.arange(3), np.array([40.0, 40.1, 40.2]), np.array([-105.0, -105.1, -105.2]), level=15)
        rows, d2 = knn.nearest_poi(np.array([-40.0]), np.array([75.0]), idx)
        assert rows[0] in (0, 1, 2)
        exp = self._brute(np.array([-40.0]), np.array([75.0]), idx)
        assert rows[0] == exp[0][0]

    def test_tie_break_smallest_id(self):
        # two POIs equidistant from the query point
        idx = knn.PoiIndex(np.array([7, 3]), np.array([0.0, 0.0]), np.array([1.0, -1.0]), level=10)
        rows, _ = knn.nearest_poi(np.array([0.0]), np.array([0.0]), idx)
        assert idx.poi_ids[rows[0]] == 3

    def test_empty_points(self):
        idx = knn.PoiIndex(np.arange(2), np.array([0.0, 1.0]), np.array([0.0, 1.0]))
        rows, d2 = knn.nearest_poi(np.array([]), np.array([]), idx)
        assert len(rows) == 0

    def test_csr_gather(self):
        idx = knn.PoiIndex(np.arange(5), np.array([0.0, 0.0, 0.0, 10.0, 20.0]), np.array([0.0, 0.001, 0.002, 10.0, 20.0]), level=10)
        c = cells.cell_id(np.array([0.0]), np.array([0.0]), 10)
        counts, rows = idx.pois_in_cells(c)
        assert counts[0] == 3
        assert set(rows.tolist()) == {0, 1, 2}


@pytest.mark.usefixtures("ray_session")
class TestStagesOnRay:
    def test_cell_encode_stage(self):
        import ray.data as rd

        t = fixtures.canonical_trackpoints()
        ds = rd.from_arrow(t).map_batches(stages.add_cell_columns, batch_format="pyarrow")
        out = ds.take_all()
        assert all("cell" in r and "cell_prefix" in r for r in out)
        exp = cells.cell_id(np.array(t["lat"]), np.array(t["lon"]), cells.LEVEL_TILE)
        assert [r["cell"] for r in out] == exp.tolist()

    def test_pip_join_stage(self):
        import ray
        import ray.data as rd

        polys = fixtures.make_regions()
        idx_ref = ray.put(polygons.PolygonIndex(polys))
        pts = fixtures.make_trackpoints(5, 40, seed=1)
        ds = rd.from_arrow(pts).map_batches(
            stages.PipJoiner, fn_constructor_kwargs={"index_ref": idx_ref},
            batch_format="pyarrow", concurrency=1,
        )
        got = ds.to_pandas()
        # oracle: brute-force every point against every polygon
        lat = np.array(pts["lat"])
        lon = np.array(pts["lon"])
        exp_pairs = set()
        for p in polys:
            hit = polygons.points_in_polygon(lat, lon, p)
            for i in np.nonzero(hit)[0]:
                exp_pairs.add((pts["activity_id"][i].as_py(), int(pts["seq"][i].as_py()), p.region_id))
        got_pairs = set(zip(got["activity_id"], got["seq"].astype(int), got["region_id"]))
        assert got_pairs == exp_pairs
        assert len(exp_pairs) > 0  # fixture guarantees hits

    def test_knn_stage(self):
        import ray
        import ray.data as rd

        pois = fixtures.make_pois(100, seed=5)
        idx = knn.PoiIndex(
            np.array(pois["poi_id"]), np.array(pois["lat"]), np.array(pois["lon"])
        )
        idx_ref = ray.put(idx)
        pts = fixtures.canonical_trackpoints()
        ds = rd.from_arrow(pts).map_batches(
            stages.KnnPoiJoiner, fn_constructor_kwargs={"index_ref": idx_ref},
            batch_format="pyarrow", concurrency=1,
        )
        got = ds.to_pandas()
        assert got["poi_id"].notna().all()
        # nearest is sane: distance to chosen <= distance to all
        d2 = (idx.lat - 40.0) ** 2 + (idx.lon + 105.0) ** 2
        assert got["dist2_deg"].iloc[0] == pytest.approx(d2.min())

    def test_raster_tiling_matches_direct(self):
        import ray.data as rd
        from ray.data.aggregate import Sum

        imgs = fixtures.make_images(12, seed=42)
        ds = rd.from_arrow(imgs).map_batches(
            stages.RouteTileExtractor, batch_format="pyarrow", concurrency=1, batch_size=4
        )
        final = ds.groupby("cell").aggregate(Sum("n_px", alias_name="n_px")).to_pandas()
        # oracle: decode every image on the driver
        from activity_files_ray.functions import imaging

        acc: dict[int, int] = {}
        for row in imgs.to_pylist():
            rgb = imaging.decode_image(row["bytes"])
            rr, cc = imaging.extract_route_pixels(rgb)
            lat_min, lon_min, lat_max, lon_max = fixtures.parse_caption_bbox(row["caption"])
            lat, lon = imaging.pixels_to_latlon(rr, cc, row["h"], row["w"], lat_min, lat_max, lon_min, lon_max)
            for c in cells.cell_id(lat, lon, cells.LEVEL_TILE):
                acc[int(c)] = acc.get(int(c), 0) + 1
        exp = dict(sorted(acc.items()))
        got = dict(zip(final["cell"].astype(int), final["n_px"].astype(int)))
        assert got == exp

    def test_tile_counts_partial_equals_plain(self):
        import ray.data as rd

        pts = fixtures.make_trackpoints(10, 100, seed=3)
        out = stages.tile_counts(rd.from_arrow(pts)).to_pandas()
        exp_cells = cells.cell_id(np.array(pts["lat"]), np.array(pts["lon"]), cells.LEVEL_TILE)
        uc, cnt = np.unique(exp_cells, return_counts=True)
        got = dict(zip(out["cell"].astype(int), out["n"].astype(int)))
        assert got == dict(zip(uc.tolist(), cnt.tolist()))

    def test_salted_two_phase_equals_unsalted(self):
        import ray.data as rd
        from ray.data.aggregate import Sum

        pts = fixtures.make_trackpoints(4, 200, seed=9)
        enc = rd.from_arrow(pts).map_batches(stages.add_cell_columns, batch_format="pyarrow")
        salted = enc.map_batches(
            stages.add_salt_column, batch_format="pyarrow",
            fn_kwargs={"key_col": "cell", "salt": 8},
        )
        phase1 = salted.groupby("salted_key").aggregate(Sum("lat", alias_name="s"))
        import pyarrow.compute as pc

        def strip(b: pa.Table) -> pa.Table:
            return pa.table({"cell": pc.divide(b["salted_key"], 8), "s": b["s"]})

        final = phase1.map_batches(strip, batch_format="pyarrow").groupby("cell").aggregate(Sum("s", alias_name="s")).to_pandas()
        plain = enc.groupby("cell").aggregate(Sum("lat", alias_name="s")).to_pandas()
        merged = final.merge(plain, on="cell", suffixes=("_salted", "_plain"))
        assert len(merged) == len(plain)
        np.testing.assert_allclose(merged["s_salted"], merged["s_plain"], rtol=1e-12)


@pytest.mark.usefixtures("ray_session")
class TestSaltProbe:
    def test_uniform_keys_no_salt(self):
        import ray.data as rd

        t = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64) % 100)})
        assert stages.probe_salt_factor(rd.from_arrow(t), "k") == 1

    def test_hot_key_salted(self):
        import ray.data as rd

        keys = np.concatenate([np.zeros(500, dtype=np.int64),
                               np.arange(1, 501, dtype=np.int64)])
        t = pa.table({"k": pa.array(keys)})
        s = stages.probe_salt_factor(rd.from_arrow(t), "k")
        assert s >= 8  # hot key holds 50% of rows -> strong salting


class TestKNearest:
    def test_matches_brute_force_k3(self):
        rng = np.random.default_rng(5)
        poi_lat = np.round(rng.uniform(38, 42, 200), 4)
        poi_lon = np.round(rng.uniform(-107, -103, 200), 4)
        idx = knn.PoiIndex(np.arange(200), poi_lat, poi_lon, level=12)
        plat = np.round(rng.uniform(38, 42, 300), 4)
        plon = np.round(rng.uniform(-107, -103, 300), 4)
        gi, gd = knn.k_nearest_poi(plat, plon, idx, k=3)
        d2 = (idx.lat[None, :] - plat[:, None]) ** 2 + (idx.lon[None, :] - plon[:, None]) ** 2
        order = np.lexsort((np.broadcast_to(idx.poi_ids, d2.shape), d2), axis=1)[:, :3]
        np.testing.assert_array_equal(gi, order)
        np.testing.assert_allclose(gd, d2[np.arange(300)[:, None], order])

    def test_padding_when_fewer_pois(self):
        idx = knn.PoiIndex(np.arange(2), np.array([0.0, 1.0]), np.array([0.0, 1.0]), level=8)
        gi, gd = knn.k_nearest_poi(np.array([0.5]), np.array([0.5]), idx, k=5)
        assert gi[0, :2].tolist() == [0, 1]
        assert (gi[0, 2:] == -1).all() and np.isinf(gd[0, 2:]).all()

    def test_k1_equals_nearest(self):
        rng = np.random.default_rng(8)
        idx = knn.PoiIndex(np.arange(50), rng.uniform(0, 5, 50), rng.uniform(0, 5, 50), level=10)
        plat, plon = rng.uniform(0, 5, 100), rng.uniform(0, 5, 100)
        gi, gd = knn.k_nearest_poi(plat, plon, idx, k=1)
        ni, nd = knn.nearest_poi(plat, plon, idx)
        np.testing.assert_array_equal(gi[:, 0], ni)
        np.testing.assert_allclose(gd[:, 0], nd)


@pytest.mark.usefixtures("ray_session")
class TestTreeAggregateCombiner:
    def test_middle_level_exact(self):
        import ray.data as rd

        from activity_files_ray.pipelines import agg

        pts = fixtures.make_trackpoints(6, 300, seed=4)
        ds = rd.from_arrow(pts).map_batches(
            stages.add_cell_columns, batch_format="pyarrow"
        )
        a = agg.tree_aggregate(
            ds.select_columns(["cell", "lat"]), ["cell"],
            {"n": ("", "count"), "mx": ("lat", "max")},
        ).sort_values("cell").reset_index(drop=True)
        b = agg.tree_aggregate(
            ds.select_columns(["cell", "lat"]), ["cell"],
            {"n": ("", "count"), "mx": ("lat", "max")},
            combine_partitions=3,
        ).sort_values("cell").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestIntegerMetricTieBreak:
    def test_int_tie_breaks_by_id_despite_float_skew(self):
        """Regression (found by the 10x-scale oracle gate): two POIs
        at integer-squared distance 25 from the origin — (3,4) and
        (5,0) centidegrees. In degree floats the distances differ in
        the last ulp, which used to pick whichever float was smaller;
        the integer metric ties them and the smallest id must win."""
        ids = np.array([10, 2])
        lat_cd = np.array([3.0, 5.0])
        lon_cd = np.array([4.0, 0.0])
        idx = knn.PoiIndex(
            ids, lat_cd / 100.0, lon_cd / 100.0, level=7,
            metric_lat=lat_cd, metric_lon=lon_cd, metric_scale=100.0,
        )
        rows, d2 = knn.nearest_poi(
            np.array([0.0]), np.array([0.0]), idx,
            metric_lat=np.array([0.0]), metric_lon=np.array([0.0]),
        )
        assert idx.poi_ids[rows[0]] == 2  # min id among int-metric ties
        assert d2[0] == 25.0  # exact integer distance
        gi, gd = knn.k_nearest_poi(
            np.array([0.0]), np.array([0.0]), idx, k=2,
            metric_lat=np.array([0.0]), metric_lon=np.array([0.0]),
        )
        assert idx.poi_ids[gi[0]].tolist() == [2, 10]
        assert gd[0].tolist() == [25.0, 25.0]

    def test_degree_floats_would_have_flipped(self):
        # documents WHY the metric space matters: the float-degree
        # distances of the two int-tied POIs genuinely differ
        a = (3 / 100.0) ** 2 + (4 / 100.0) ** 2
        b = (5 / 100.0) ** 2 + 0.0**2
        assert a != b  # last-ulp skew: ties are not ties in degrees


@pytest.mark.usefixtures("ray_session")
class TestBucketedAggregate:
    def test_equals_tree_aggregate(self):
        import ray.data as rd

        from activity_files_ray.pipelines import agg

        rng = np.random.default_rng(9)
        n = 5000
        df = pd.DataFrame(
            {
                "k1": rng.integers(0, 800, n),
                "k2": rng.choice(["a", "b", "c"], n),
                "v": rng.standard_normal(n).round(3),
            }
        )
        ds = rd.from_pandas(df).repartition(7)
        spec = {
            "n": ("", "count"), "s": ("v", "sum"),
            "mn": ("v", "min"), "mx": ("v", "max"),
        }
        want = agg.tree_aggregate(ds, ["k1", "k2"], spec)
        got = agg.bucketed_aggregate(ds, ["k1", "k2"], spec, n_buckets=16).to_pandas()
        cols = ["k1", "k2"]
        a = got.sort_values(cols).reset_index(drop=True)[want.columns]
        b = want.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)

    def test_bucket_hash_deterministic_across_processes(self):
        import subprocess, sys

        prog = (
            "import pandas as pd, numpy as np;"
            "h = pd.util.hash_pandas_object("
            "pd.DataFrame({'k': [1, 2, 'x']}), index=False).to_numpy(np.uint64);"
            "print(h.tolist())"
        )
        outs = set()
        for seed in ("1", "2"):
            r = subprocess.run(
                [sys.executable, "-c", prog],
                env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"},
                capture_output=True, text=True, check=True,
            )
            outs.add(r.stdout.strip())
        assert len(outs) == 1

    def test_default_n_buckets_tracks_cluster_width(self):
        from activity_files_ray.pipelines import agg

        # explicit cluster width: 4x cores, floored at 16, capped at 4096
        assert agg.default_n_buckets(cluster_cpus=64) == 256
        assert agg.default_n_buckets(cluster_cpus=1) == 16
        assert agg.default_n_buckets(cluster_cpus=2048) == 4096
        # probed width (ray_session runs at 4 CPUs) -> floor applies
        assert agg.default_n_buckets() >= 16

    def test_bucketed_default_sizing_used_when_unset(self, monkeypatch):
        import ray.data as rd

        from activity_files_ray.pipelines import agg

        seen = {}
        real = agg.default_n_buckets

        def spy(cluster_cpus=None):
            n = real(cluster_cpus)
            seen["n"] = n
            return n

        monkeypatch.setattr(agg, "default_n_buckets", spy)
        ds = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2], "v": [1.0, 2.0, 3.0]}))
        out = agg.bucketed_aggregate(ds, ["k"], {"s": ("v", "sum")}).to_pandas()
        assert seen["n"] >= 16
        assert sorted(out["s"].tolist()) == [3.0, 3.0]


@pytest.mark.usefixtures("ray_session")
class TestFlagshipScalePlan:
    def test_flagship_returns_dataset_not_driver_frame(self, sf_dir):
        """VERDICT r2 item 1: the flagship's final (region_id, cell)
        aggregate is key-per-row cardinality at target scale — it must
        run the distributed bucketed plan and return a DATASET (no
        driver-merged combiner tree in entry())."""
        import ray.data

        from activity_files_ray.pipelines import queries as q

        res = q.flagship_spatial(sf_dir)
        assert isinstance(res, ray.data.Dataset)
        df = res.to_pandas()
        assert set(df.columns) == {"region_id", "cell", "n"}
        assert len(df) > 0
        # parity with the driver-merged tree on the same input
        from activity_files_ray.pipelines import agg
        from activity_files_ray.spatial import stages as sstages
        import ray as _ray

        from activity_files_ray.functions import polygons

        idx_ref = _ray.put(polygons.PolygonIndex(q.ORACLE_REGIONS))
        pts = q._derived_points_ds(sf_dir, with_cd=False)
        joined = pts.map_batches(
            sstages.pip_join_batch, fn_kwargs={"index_ref": idx_ref},
            batch_format="pyarrow", batch_size=None,
        )
        enc = joined.map_batches(
            sstages.add_cell_columns, batch_format="pyarrow",
            fn_kwargs={"level": q.CELL_LEVEL}, batch_size=None,
        )
        want = agg.tree_aggregate(
            enc.select_columns(["region_id", "cell"]),
            ["region_id", "cell"], {"n": ("", "count")},
        )
        a = df.sort_values(["region_id", "cell"]).reset_index(drop=True)
        b = want.sort_values(["region_id", "cell"]).reset_index(drop=True)[a.columns]
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestRadiusJoin:
    """J8 range join: pois_within_radius == brute force, no duplicate
    pairs from clamped/wrapped disk cells."""

    def _index(self, pk, lat_cd, lon_cd, level=7):
        from activity_files_ray.spatial import knn

        return knn.PoiIndex(
            pk, lat_cd / 100.0, lon_cd / 100.0, level=level,
            metric_lat=lat_cd.astype(np.float64),
            metric_lon=lon_cd.astype(np.float64), metric_scale=100.0,
        )

    def test_matches_bruteforce(self):
        from activity_files_ray.spatial import knn

        rng = np.random.default_rng(23)
        n_poi, n_pt = 400, 250
        plat = rng.integers(-8900, 8900, n_poi).astype(np.float64)
        plon = rng.integers(-17900, 17900, n_poi).astype(np.float64)
        idx = self._index(np.arange(n_poi), plat, plon)
        qlat = rng.integers(-8900, 8900, n_pt).astype(np.float64)
        qlon = rng.integers(-17900, 17900, n_pt).astype(np.float64)
        r2 = 600.0**2
        pt, poi, d2 = knn.pois_within_radius(
            qlat / 100.0, qlon / 100.0, idx, r2,
            metric_lat=qlat, metric_lon=qlon,
        )
        got = {(int(a), int(idx.poi_ids[b])) for a, b in zip(pt, poi)}
        # brute force over the full cross product
        dd = (qlat[:, None] - plat[None, :]) ** 2 + (qlon[:, None] - plon[None, :]) ** 2
        exp = {(int(i), int(j)) for i, j in zip(*np.where(dd <= r2))}
        assert got == exp and len(got) > 0
        assert len(got) == len(pt)  # no duplicate pairs
        np.testing.assert_array_equal(
            d2, ((qlat[pt] - plat[poi]) ** 2 + (qlon[pt] - plon[poi]) ** 2)
        )

    def test_polar_and_wrap_no_duplicates(self):
        from activity_files_ray.spatial import knn

        # POIs and points jammed at the pole and the antimeridian:
        # disk_cells clamps/wraps there, which duplicated cell ids
        pk = np.arange(6)
        plat = np.array([8950.0, 8940.0, 8930.0, -8950.0, 8945.0, 8935.0])
        plon = np.array([17950.0, -17950.0, 0.0, 17990.0, 17980.0, -17980.0])
        idx = self._index(pk, plat, plon, level=4)  # big cells => clamping
        pt, poi, d2 = knn.pois_within_radius(
            plat / 100.0, plon / 100.0, idx, 1e9,
            metric_lat=plat, metric_lon=plon,
        )
        pairs = list(zip(pt.tolist(), poi.tolist()))
        assert len(pairs) == len(set(pairs))  # strictly no dup pairs

    def test_empty_sides(self):
        from activity_files_ray.spatial import knn

        idx = self._index(np.arange(3), np.array([0.0, 100.0, 200.0]),
                          np.array([0.0, 100.0, 200.0]))
        pt, poi, d2 = knn.pois_within_radius(
            np.empty(0), np.empty(0), idx, 100.0)
        assert len(pt) == 0
        empty_idx = self._index(np.empty(0, np.int64), np.empty(0), np.empty(0))
        pt, poi, d2 = knn.pois_within_radius(
            np.array([0.0]), np.array([0.0]), empty_idx, 100.0,
            metric_lat=np.array([0.0]), metric_lon=np.array([0.0]))
        assert len(pt) == 0


class TestSegmentKnn:
    """Segment→POI kNN (north_rule: route segments to nearest POIs):
    exact rational num/den distances == brute force, including
    degenerate zero-length segments and smallest-id tie-breaks."""

    def _index(self, pk, lat_cd, lon_cd, level=7):
        from activity_files_ray.spatial import knn

        return knn.PoiIndex(
            pk, lat_cd / 100.0, lon_cd / 100.0, level=level,
            metric_lat=lat_cd.astype(np.float64),
            metric_lon=lon_cd.astype(np.float64), metric_scale=100.0,
        )

    @staticmethod
    def _brute(alat, alon, blat, blon, plat, plon, pid):
        sdx, sdy = blon - alon, blat - alat
        l2 = sdx * sdx + sdy * sdy
        wx, wy = plon - alon, plat - alat
        vx, vy = plon - blon, plat - blat
        dot = wx * sdx + wy * sdy
        d2a, d2b = wx * wx + wy * wy, vx * vx + vy * vy
        cross = sdx * wy - sdy * wx
        num = np.where(
            l2 == 0, d2a,
            np.where(dot <= 0, d2a * l2,
                     np.where(dot >= l2, d2b * l2, cross * cross)),
        )
        key = np.lexsort((pid, num))
        return key[0], num[key[0]], (1 if l2 == 0 else l2)

    def test_matches_bruteforce(self):
        from activity_files_ray.spatial import knn

        rng = np.random.default_rng(31)
        P, S = 350, 400
        pid = rng.permutation(P * 3)[:P].astype(np.int64)
        plat = rng.integers(-8500, 8500, P)
        plon = rng.integers(-17500, 17500, P)
        idx = self._index(pid, plat.astype(float), plon.astype(float))
        alat = rng.integers(-8500, 8500, S)
        alon = rng.integers(-17500, 17500, S)
        blat = alat + rng.integers(-400, 400, S)
        blon = alon + rng.integers(-400, 400, S)
        blat[:6], blon[:6] = alat[:6], alon[:6]  # degenerate segments
        row, num, den = knn.nearest_poi_segment(alat, alon, blat, blon, idx)
        for i in range(S):
            bi, bn, bd = self._brute(
                alat[i], alon[i], blat[i], blon[i], plat, plon, pid
            )
            assert (row[i], num[i], den[i]) == (bi, bn, bd), i

    def test_interior_foot_beats_endpoints(self):
        """A POI whose perpendicular foot lies inside one segment must
        use the cross²/len2 distance, not an endpoint distance."""
        from activity_files_ray.spatial import knn

        pid = np.array([7], dtype=np.int64)
        # horizontal segment y=0, x in [0, 1000]; POI at (500, 30)
        idx = self._index(pid, np.array([30.0]), np.array([500.0]))
        row, num, den = knn.nearest_poi_segment(
            np.array([0]), np.array([0]), np.array([0]), np.array([1000])
        , idx)
        assert row[0] == 0
        assert den[0] == 1000 * 1000
        assert num[0] == (1000 * 30) ** 2  # cross², i.e. 30cd ⊥ distance

    def test_tie_breaks_to_smallest_poi_id(self):
        from activity_files_ray.spatial import knn

        # two POIs mirrored across the segment: exact equal distance
        pid = np.array([9, 4], dtype=np.int64)
        idx = self._index(pid, np.array([50.0, -50.0]), np.array([500.0, 500.0]))
        row, num, _den = knn.nearest_poi_segment(
            np.array([0]), np.array([0]), np.array([0]), np.array([1000]), idx
        )
        assert idx.poi_ids[row[0]] == 4
        assert num[0] == (1000 * 50) ** 2

    def test_desert_straggler_fallback(self):
        from activity_files_ray.spatial import knn

        # one far-away POI: ring walk exhausts, brute-force kicks in
        pid = np.array([1], dtype=np.int64)
        idx = self._index(pid, np.array([8000.0]), np.array([17000.0]))
        row, num, den = knn.nearest_poi_segment(
            np.array([-8000]), np.array([-17000]),
            np.array([-7990]), np.array([-16990]), idx,
        )
        assert row[0] == 0 and den[0] == 200
        bi, bn, bd = self._brute(
            -8000, -17000, -7990, -16990,
            np.array([8000]), np.array([17000]), pid,
        )
        assert (num[0], den[0]) == (bn, bd)


@pytest.mark.usefixtures("ray_session")
class TestCopartitionedPip:
    """J5b: co-partitioned PIP join (polygon side as a Dataset, hash
    join on (prefix cell, salt)) must equal the broadcast path row for
    row — including under salting, which reshapes the shuffle but not
    the candidate sets."""

    def _points(self, n=4000, seed=7):
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "pid": np.arange(n, dtype=np.int64),
                "lat": rng.uniform(-60, 60, n),
                "lon": rng.uniform(-170, 170, n),
            }
        )

    def _broadcast(self, ds, polys):
        import ray

        from activity_files_ray.functions import polygons as P

        ref = ray.put(P.PolygonIndex(polys))
        return (
            ds.map_batches(
                stages.pip_join_batch,
                fn_kwargs={"index_ref": ref},
                batch_format="pyarrow",
                batch_size=None,
            )
            .to_pandas()
            .sort_values(["pid", "region_id"])
            .reset_index(drop=True)
        )

    @pytest.mark.parametrize("salt", [1, 3])
    def test_matches_broadcast_path(self, salt):
        import ray.data as rd

        from activity_files_ray import fixtures

        polys = fixtures.make_regions() + fixtures.make_region_grid()
        ds = rd.from_pandas(self._points()).repartition(4)
        want = self._broadcast(ds, polys)
        got = (
            stages.pip_join_copartitioned(
                ds, polys, salt=salt, num_partitions=8
            )
            .to_pandas()[["pid", "lat", "lon", "region_id"]]
            .sort_values(["pid", "region_id"])
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()), want
        )

    def test_polygon_dataset_input(self):
        """The scale path: polygons arrive as a Dataset (never on the
        driver), points keep extra columns through the join."""
        import ray.data as rd

        from activity_files_ray import fixtures

        polys = fixtures.make_regions()
        pdf = self._points(n=1500, seed=11)
        pdf["tag"] = (pdf["pid"] % 5).astype(np.int64)
        ds = rd.from_pandas(pdf).repartition(3)
        polys_ds = rd.from_arrow(stages.polygons_to_table(polys)).repartition(2)
        got = (
            stages.pip_join_copartitioned(ds, polys_ds, num_partitions=4)
            .to_pandas()
            .sort_values(["pid", "region_id"])
            .reset_index(drop=True)
        )
        want = self._broadcast(ds, polys)[["pid", "lat", "lon", "region_id"]]
        assert list(got.columns) == ["pid", "lat", "lon", "tag", "region_id"]
        assert got["pid"].dtype == np.int64  # no null-upcast through the join
        pd.testing.assert_frame_equal(
            got[["pid", "lat", "lon", "region_id"]].astype(want.dtypes.to_dict()),
            want,
        )
        assert (got["tag"] == got["pid"] % 5).all()

    def test_reserved_column_collision_raises(self):
        import ray.data as rd

        from activity_files_ray import fixtures

        pdf = self._points(n=10)
        pdf["_pp_cell"] = 0
        with pytest.raises(ValueError, match="_pp_cell"):
            stages.pip_join_copartitioned(
                rd.from_pandas(pdf), fixtures.make_regions()
            )


@pytest.mark.usefixtures("ray_session")
class TestCopartitionedKnn:
    """J6b: co-partitioned kNN join (POI side as a Dataset, reduce-side
    bucket join on hash(cell) with hierarchical level escalation) must
    equal the broadcast ring-walk path row for row."""

    def _points(self, n=3000, seed=5):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "pid": np.arange(n, dtype=np.int64),
                "lat": rng.uniform(-60, 60, n),
                "lon": rng.uniform(-170, 170, n),
            }
        )

    def _broadcast(self, ds, index):
        import ray

        ref = ray.put(index)
        return (
            ds.map_batches(
                stages.knn_join_batch,
                fn_kwargs={"index_ref": ref},
                batch_format="pyarrow",
                batch_size=None,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )

    @pytest.mark.parametrize("n_poi", [400, 5])
    def test_matches_broadcast_path(self, n_poi):
        """400 POIs: most points resolve in round 1. 5 POIs: every
        point escalates through several coarser levels — the
        multi-round path, including buckets with only one side."""
        import ray.data as rd

        rng = np.random.default_rng(23)
        poi_ids = np.arange(n_poi, dtype=np.int64) * 3 + 1
        plat = rng.uniform(-60, 60, n_poi)
        plon = rng.uniform(-170, 170, n_poi)
        ds = rd.from_pandas(self._points()).repartition(4)
        want = self._broadcast(
            ds, knn.PoiIndex(poi_ids, plat, plon, level=6)
        )
        got = (
            stages.knn_join_copartitioned(
                ds,
                stages.pois_to_table(poi_ids, plat, plon),
                level=6,
                num_partitions=8,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert got["pid"].dtype == np.int64  # no null-upcast via union
        assert got["poi_id"].notna().all()
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)

    def test_exact_metric_space_and_extra_columns(self):
        """Centidegree metric columns (the q_knn_poi exact-integer
        tie-break space) flow through the copartitioned path; extra
        point columns survive the union+groupby exchange."""
        import ray.data as rd

        rng = np.random.default_rng(31)
        n_poi = 120
        poi_ids = np.arange(n_poi, dtype=np.int64)
        plat_cd = rng.integers(-6000, 6000, n_poi)
        plon_cd = rng.integers(-17000, 17000, n_poi)
        index = knn.PoiIndex(
            poi_ids, plat_cd / 100.0, plon_cd / 100.0, level=6,
            metric_lat=plat_cd.astype(np.float64),
            metric_lon=plon_cd.astype(np.float64),
            metric_scale=100.0,
        )
        pdf = self._points(n=1000, seed=37)
        pdf["lat"] = np.round(pdf["lat"], 2)
        pdf["lon"] = np.round(pdf["lon"], 2)
        pdf["lat_cd"] = (pdf["lat"] * 100).round().astype(np.float64)
        pdf["lon_cd"] = (pdf["lon"] * 100).round().astype(np.float64)
        pdf["tag"] = (pdf["pid"] % 7).astype(np.int64)
        ds = rd.from_pandas(pdf).repartition(3)
        import ray

        ref = ray.put(index)
        want = (
            ds.map_batches(
                stages.knn_join_batch,
                fn_kwargs={
                    "index_ref": ref,
                    "metric_lat_col": "lat_cd",
                    "metric_lon_col": "lon_cd",
                },
                batch_format="pyarrow",
                batch_size=None,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )
        got = (
            stages.knn_join_copartitioned(
                ds,
                stages.pois_to_table(
                    poi_ids, plat_cd / 100.0, plon_cd / 100.0,
                    metric_lat=plat_cd.astype(np.float64),
                    metric_lon=plon_cd.astype(np.float64),
                ),
                metric_lat_col="lat_cd",
                metric_lon_col="lon_cd",
                metric_scale=100.0,
                level=6,
                num_partitions=8,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert (got["tag"] == got["pid"] % 7).all()
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)

    def test_empty_poi_side(self):
        """No POIs at all: every point comes back once with null
        poi_id / NaN dist2_deg (the broadcast empty-index contract)."""
        import ray.data as rd

        ds = rd.from_pandas(self._points(n=50, seed=2)).repartition(2)
        got = (
            stages.knn_join_copartitioned(
                ds,
                stages.pois_to_table(
                    np.array([], dtype=np.int64),
                    np.array([], dtype=np.float64),
                    np.array([], dtype=np.float64),
                ),
                level=4,
                num_partitions=4,
            )
            .to_pandas()
            .sort_values("pid")
            .reset_index(drop=True)
        )
        assert len(got) == 50
        assert got["poi_id"].isna().all()
        assert got["dist2_deg"].isna().all()

    def test_reserved_column_collision_raises(self):
        import ray.data as rd

        pdf = self._points(n=10)
        pdf["dist2_deg"] = 0.0
        with pytest.raises(ValueError, match="dist2_deg"):
            stages.knn_join_copartitioned(
                rd.from_pandas(pdf),
                stages.pois_to_table(
                    np.array([1], dtype=np.int64),
                    np.array([0.0]),
                    np.array([0.0]),
                ),
            )


@pytest.mark.usefixtures("ray_session")
class TestCellPyramid:
    """A10: the one-pass rollup pyramid must equal a direct per-level
    groupby — the grid is strictly hierarchical, so parent rollups
    are exact."""

    def test_matches_direct_per_level_counts(self):
        import ray.data as rd

        from activity_files_ray.pipelines import agg

        rng = np.random.default_rng(41)
        n = 20000
        pdf = pd.DataFrame(
            {
                # cluster some points so coarse cells have real skew
                "lat": np.concatenate(
                    [rng.uniform(-80, 80, n // 2), rng.normal(40, 0.2, n // 2)]
                ),
                "lon": np.concatenate(
                    [rng.uniform(-179, 179, n // 2), rng.normal(-105, 0.2, n // 2)]
                ),
            }
        )
        ds = rd.from_pandas(pdf).repartition(4)
        levels = [12, 8, 3]
        got = (
            stages.cell_pyramid_counts(ds, levels, n_buckets=16)
            .to_pandas()
            .sort_values(["level", "cell"])
            .reset_index(drop=True)
        )
        parts = []
        for lv in levels:
            enc = ds.map_batches(
                stages.add_cell_columns,
                fn_kwargs={"level": lv, "prefix_level": min(lv, 7)},
                batch_format="pyarrow",
                batch_size=None,
            )
            direct = agg.bucketed_aggregate(
                enc.select_columns(["cell"]), ["cell"], {"n": ("", "count")},
                n_buckets=16,
            ).to_pandas()
            direct.insert(0, "level", np.int64(lv))
            parts.append(direct)
        want = (
            pd.concat(parts, ignore_index=True)
            .sort_values(["level", "cell"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
        # totals conserved at every level
        assert (got.groupby("level")["n"].sum() == len(pdf)).all()


@pytest.mark.usefixtures("ray_session")
class TestHeatmapTiles:
    """A11: vector→raster heatmap — pixel placement and the
    decoded-stats honesty contract."""

    def test_pixel_placement_and_decode(self):
        import ray.data as rd

        from activity_files_ray.functions import cells, imaging

        tile_level, fine_level = 2, 5  # 8x8-pixel tiles
        d = fine_level - tile_level
        # three points: two in the same fine cell, one in another,
        # all inside one tile. Use cell centers to dodge edge floats.
        cids = np.array([cells.cell_id(np.array([10.0]), np.array([20.0]),
                                       fine_level)[0]] * 2)
        lat1, lon1 = cells.cell_center(cids[:1], fine_level)
        # neighbor fine cell, +1 in ix (east)
        ix, iy = cells.xy_from_cell_id(cids[:1])
        nb = cells.cell_id_from_xy(ix + 1, iy)
        lat2, lon2 = cells.cell_center(nb, fine_level)
        pdf = pd.DataFrame(
            {
                "lat": [lat1[0], lat1[0], lat2[0]],
                "lon": [lon1[0], lon1[0], lon2[0]],
            }
        )
        out = stages.heatmap_tile_images(
            rd.from_pandas(pdf), tile_level, fine_level, n_buckets=4
        ).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row.w, row.h) == (1 << d, 1 << d)
        assert row.n_lit == 2 and row.px_sum == 3
        dec = imaging.decode_png(row.png)[:, :, 0]
        tx, ty = cells.xy_from_cell_id(np.array([row.tile], dtype=np.int64))
        x0, y0 = int(ix[0]) - (int(tx[0]) << d), int(iy[0]) - (int(ty[0]) << d)
        size = 1 << d
        assert dec[size - 1 - y0, x0] == 2       # 2-count cell
        assert dec[size - 1 - y0, x0 + 1] == 1   # east neighbor
        assert dec.sum() == 3

    def test_count_clamps_at_255(self):
        import ray.data as rd

        from activity_files_ray.functions import imaging

        pdf = pd.DataFrame({"lat": [0.5] * 300, "lon": [0.5] * 300})
        out = stages.heatmap_tile_images(
            rd.from_pandas(pdf), 1, 4, n_buckets=2
        ).to_pandas()
        assert len(out) == 1 and out.iloc[0].px_sum == 255
        dec = imaging.decode_png(out.iloc[0].png)[:, :, 0]
        assert dec.max() == 255 and (dec > 0).sum() == 1


class TestMosaicDownsample:
    """Tile-pyramid overview build: quadrant placement, floor
    pooling, missing-children zeros, decoded-stats honesty."""

    def _tiles_from_points(self, pdf, tile_level, fine_level):
        import ray.data as rd

        return stages.heatmap_tile_images(
            rd.from_pandas(pdf), tile_level, fine_level, n_buckets=4
        )

    def test_quadrant_placement_and_floor_pool(self):
        from activity_files_ray.functions import cells, imaging

        tile_level, fine_level = 2, 5  # 8x8 children → 8x8 parent
        d = fine_level - tile_level
        size = 1 << d
        # 3 points in ONE fine cell → child pixel 3 → parent pixel
        # floor(3/4) = 0; 5 points in another (same 2×2 fine quad)
        # → pooled (3+5)//4 = 2
        base = cells.cell_id(np.array([10.0]), np.array([20.0]), fine_level)
        ix, iy = cells.xy_from_cell_id(base)
        ix, iy = int(ix[0]) & ~1, int(iy[0]) & ~1  # align to the 2×2 quad
        c1 = cells.cell_id_from_xy(np.array([ix]), np.array([iy]))
        c2 = cells.cell_id_from_xy(np.array([ix + 1]), np.array([iy + 1]))
        la1, lo1 = cells.cell_center(c1, fine_level)
        la2, lo2 = cells.cell_center(c2, fine_level)
        pdf = pd.DataFrame(
            {"lat": [la1[0]] * 3 + [la2[0]] * 5, "lon": [lo1[0]] * 3 + [lo2[0]] * 5}
        )
        children = self._tiles_from_points(pdf, tile_level, fine_level)
        out = stages.mosaic_downsample(children, tile_level).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert (row.w, row.h) == (size, size)
        assert row.px_sum == 2 and row.n_lit == 1
        dec = imaging.decode_png(row.png)[:, :, 0]
        # the lit parent pixel is the level fine-1 cell (ix//2, iy//2)
        # placed inside the 2s×2s fine-1 grid of the parent tile
        pix, piy = ix >> 1, iy >> 1
        tx, ty = cells.xy_from_cell_id(np.array([row.tile], dtype=np.int64))
        x0 = pix - (int(tx[0]) << d)
        y0 = piy - (int(ty[0]) << d)
        assert dec[size - 1 - y0, x0] == 2
        assert dec.sum() == 2

    def test_missing_children_stay_zero(self):
        # a single child tile in one quadrant: the other 3 quadrants
        # of the parent canvas must stay zero and n_lit tracks only
        # the real child's pixels
        from activity_files_ray.functions import imaging

        pdf = pd.DataFrame({"lat": [10.0] * 8, "lon": [20.0] * 8})
        children = self._tiles_from_points(pdf, 2, 5)
        out = stages.mosaic_downsample(children, 2).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row.px_sum == 8 // 4 and row.n_lit == 1
        dec = imaging.decode_png(row.png)[:, :, 0]
        assert (dec > 0).sum() == 1

    def test_chained_levels_walk_the_pyramid(self):
        # two mosaic steps: level 3 tiles → 2 → 1; each level's tile
        # ids must coarsen consistently and stats stay non-negative
        pdf = pd.DataFrame(
            {"lat": [10.0, 10.1, -5.0, 44.0], "lon": [20.0, 20.1, 100.0, -60.0]}
        )
        lv3 = self._tiles_from_points(pdf, 3, 6).materialize()
        lv2 = stages.mosaic_downsample(lv3, 3).materialize()
        lv1 = stages.mosaic_downsample(lv2, 2).to_pandas()
        from activity_files_ray.functions import cells

        t3 = lv3.to_pandas()["tile"].to_numpy(np.int64)
        t2 = lv2.to_pandas()["tile"].to_numpy(np.int64)
        assert set(cells.parent_cell_id(t3, 3, 2).tolist()) == set(t2.tolist())
        assert set(cells.parent_cell_id(t2, 2, 1).tolist()) == set(
            lv1["tile"].astype("int64").tolist()
        )
        assert (lv1["px_sum"] >= 0).all() and (lv1["n_lit"] >= 0).all()


class TestDecodeTilePixels:
    """Raster→points inverse: decoding the rendered tiles recovers
    exactly the clamped per-cell counts at exact cell centers."""

    def test_roundtrip_recovers_clamped_counts(self):
        import ray.data as rd

        from activity_files_ray.functions import cells

        tile_level, fine_level = 2, 5
        rng = np.random.RandomState(5)
        lat = rng.uniform(-60, 60, 500)
        lon = rng.uniform(-170, 170, 500)
        tiles = stages.heatmap_tile_images(
            rd.from_pandas(pd.DataFrame({"lat": lat, "lon": lon})),
            tile_level, fine_level, n_buckets=4,
        )
        px = tiles.map_batches(
            stages.decode_tile_pixels,
            fn_kwargs={"tile_level": tile_level, "fine_level": fine_level},
            batch_format="pandas", batch_size=None,
        ).to_pandas()
        # recovered cells+values == direct clamped counts
        got = (
            pd.DataFrame(
                {
                    "cell": cells.cell_id(
                        px["lat"].to_numpy(), px["lon"].to_numpy(), fine_level
                    ),
                    "v": px["v"].astype("int64"),
                }
            )
            .sort_values("cell")
            .reset_index(drop=True)
        )
        direct = (
            pd.Series(cells.cell_id(lat, lon, fine_level))
            .value_counts()
            .clip(upper=255)
            .rename_axis("cell")
            .reset_index(name="v")
            .sort_values("cell")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, direct.astype({"cell": "int64", "v": "int64"}))
        # centers are exact binary fractions → re-encoding is lossless
        assert (px["v"] >= 1).all()
