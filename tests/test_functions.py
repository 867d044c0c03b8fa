"""Unit tests for the pure kernels: geo math, cell index, polygons,
imaging codecs. Mirrors the reference's unit layer (SURVEY.md §5)."""

import numpy as np
import pytest

from activity_files_ray.functions import cells, geo, imaging, polygons


class TestGeo:
    def test_haversine_known_distance(self):
        # ~1° of latitude ≈ 111.19 km on the R=6371 km sphere
        d = geo.haversine_m(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
        assert d[0] == pytest.approx(6_371_000 * np.pi / 180, rel=1e-9)

    def test_haversine_zero(self):
        d = geo.haversine_m(np.array([40.0]), np.array([-105.0]), np.array([40.0]), np.array([-105.0]))
        assert d[0] == 0.0

    def test_cumulative_distance_canonical(self):
        # canonical fixture: +0.0005°/point at lat 40 → ~70 m per step
        lat = np.array([40.0, 40.0005, 40.0010])
        lon = np.array([-105.0, -105.0005, -105.0010])
        cum = geo.cumulative_distance_m(lat, lon)
        assert cum[0] == 0.0
        assert 60 < cum[1] < 80
        assert cum[2] == pytest.approx(2 * cum[1], rel=1e-4)

    def test_segment_speed(self):
        dist = np.array([0.0, 50.0, 150.0])
        ts = np.array([0, 5_000_000, 10_000_000], dtype=np.int64)
        sp = geo.segment_speed_mps(dist, ts)
        assert sp.tolist() == [0.0, 10.0, 20.0]

    def test_speed_zero_dt(self):
        sp = geo.segment_speed_mps(np.array([0.0, 10.0]), np.array([5, 5], dtype=np.int64))
        assert sp[1] == 0.0

    def test_semicircle_roundtrip(self):
        deg = np.array([40.0, -105.0, 0.0, 89.999])
        sc = geo.degrees_to_semicircles(deg)
        back = geo.semicircles_to_degrees(sc)
        np.testing.assert_allclose(back, deg, atol=1e-7)

    def test_fit_altitude_roundtrip(self):
        m = np.array([1600.0, -499.8, 0.0, 8848.2])
        raw = geo.m_to_fit_altitude(m)
        np.testing.assert_allclose(geo.fit_altitude_to_m(raw), m, atol=0.1)

    def test_fit_epoch(self):
        # FIT ts 0 == 1989-12-31T00:00:00Z == unix 631065600
        assert geo.fit_ts_to_unix_us(np.array([0]))[0] == 631_065_600_000_000


class TestCells:
    def test_cell_roundtrip_center(self):
        lat = np.array([40.0, -33.86, 51.5, 0.0])
        lon = np.array([-105.0, 151.2, -0.12, 0.0])
        cid = cells.cell_id(lat, lon, 15)
        clat, clon = cells.cell_center(cid, 15)
        # center within half a cell of the input
        assert np.all(np.abs(clat - lat) <= 180.0 / (1 << 15))
        assert np.all(np.abs(clon - lon) <= 360.0 / (1 << 15))

    def test_parent_is_prefix(self):
        lat, lon = np.array([40.0]), np.array([-105.0])
        c15 = cells.cell_id(lat, lon, 15)
        c9 = cells.cell_id(lat, lon, 9)
        assert cells.parent_cell_id(c15, 15, 9)[0] == c9[0]

    def test_clamp_out_of_range(self):
        cid = cells.cell_id(np.array([95.0, -95.0]), np.array([185.0, -185.0]), 10)
        assert np.all(cid >= 0)

    def test_disk_and_ring(self):
        cid = cells.cell_id(np.array([40.0]), np.array([-105.0]), 10)
        disk1 = cells.disk_cells(cid, 10, 1)
        assert disk1.shape == (1, 9)
        assert len(set(disk1[0].tolist())) == 9
        ring1 = cells.ring_cells(int(cid[0]), 10, 1)
        assert len(ring1) == 8
        assert int(cid[0]) not in set(ring1.tolist())

    def test_lon_wrap(self):
        cid = cells.cell_id(np.array([0.0]), np.array([179.99]), 10)
        disk = cells.disk_cells(cid, 10, 1)[0]
        xs = (disk // (1 << 29)).tolist()
        assert 0 in xs  # neighbor wraps across the antimeridian

    def test_covering_bbox(self):
        cov = cells.covering_cells_bbox(39.0, 41.0, -106.0, -104.0, 9)
        assert len(cov) >= 4
        inside = cells.cell_id(np.array([40.0]), np.array([-105.0]), 9)
        assert int(inside[0]) in set(cov.tolist())

    def test_sql_expr_matches_kernel(self):
        import duckdb

        rng = np.random.default_rng(7)
        lat = np.round(rng.uniform(-90, 90, 500), 2)
        lon = np.round(rng.uniform(-180, 180, 500), 2)
        expected = cells.cell_id(lat, lon, 15)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
        got = con.execute(
            f"SELECT {cells.cell_sql_expr('lat', 'lon', 15)} AS c FROM pts"
        ).fetchnumpy()["c"]
        np.testing.assert_array_equal(got, expected)


class TestPolygons:
    def _square(self):
        return polygons.Polygon(
            "sq", "sq",
            lat=np.array([0.0, 0.0, 10.0, 10.0]),
            lon=np.array([0.0, 10.0, 10.0, 0.0]),
        )

    def test_inside_outside(self):
        sq = self._square()
        inside = polygons.points_in_polygon(np.array([5.0, 15.0, -1.0]), np.array([5.0, 5.0, 5.0]), sq)
        assert inside.tolist() == [True, False, False]

    def test_convex_matches_raycast(self):
        pent = polygons.Polygon(
            "p", "p",
            lat=np.array([-0.9995, 0.0005, 2.0005, 3.0005, 1.0005]),
            lon=np.array([0.0005, 2.0005, 2.5005, 0.0005, -1.9995]),
        )
        assert pent.is_convex_ccw()
        rng = np.random.default_rng(3)
        plat = np.round(rng.uniform(-2, 4, 2000), 2)
        plon = np.round(rng.uniform(-3, 3, 2000), 2)
        a = polygons.points_in_polygon(plat, plon, pent)
        b = polygons.points_in_convex_polygon(plat, plon, pent)
        np.testing.assert_array_equal(a, b)
        assert a.sum() > 0

    def test_sql_expr_matches_kernel(self):
        import duckdb
        import pandas as pd

        pent = polygons.Polygon(
            "p", "p",
            lat=np.array([-0.9995, 0.0005, 2.0005, 3.0005, 1.0005]),
            lon=np.array([0.0005, 2.0005, 2.5005, 0.0005, -1.9995]),
        )
        rng = np.random.default_rng(4)
        plat = np.round(rng.uniform(-2, 4, 1000), 2)
        plon = np.round(rng.uniform(-3, 3, 1000), 2)
        expected = polygons.points_in_convex_polygon(plat, plon, pent)
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lat": plat, "lon": plon}))
        got = con.execute(
            f"SELECT {polygons.convex_pip_sql_expr(pent, 'lat', 'lon')} AS x FROM pts"
        ).fetchnumpy()["x"]
        np.testing.assert_array_equal(got, expected)

    def test_polygon_index_candidates(self):
        sq = self._square()
        idx = polygons.PolygonIndex([sq], level=9)
        pc = cells.cell_id(np.array([5.0]), np.array([5.0]), 9)
        cand = idx.candidates(pc)
        assert int(pc[0]) in cand
        far = cells.cell_id(np.array([-50.0]), np.array([100.0]), 9)
        assert idx.candidates(far) == {}


class TestImaging:
    def test_png_roundtrip_exact(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        assert np.array_equal(imaging.decode_png(imaging.encode_png(img)), img)

    def test_png_deterministic(self):
        img = np.full((16, 16, 3), 7, dtype=np.uint8)
        assert imaging.encode_png(img) == imaging.encode_png(img)

    def test_fjpg_psnr(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        dec = imaging.decode_fake_jpeg(imaging.encode_fake_jpeg(img))
        assert imaging.psnr_db(img, dec) >= 40.0
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= imaging.FJPG_QSTEP // 2

    def test_route_color_survives_lossy(self):
        img = np.full((16, 16, 3), 255, dtype=np.uint8)
        img[4, :] = imaging.ROUTE_RGB
        dec = imaging.decode_fake_jpeg(imaging.encode_fake_jpeg(img))
        rows, cols = imaging.extract_route_pixels(dec)
        assert set(rows.tolist()) == {4}
        assert len(cols) == 16

    def test_ahash_stable_and_discriminative(self):
        a = np.zeros((64, 64, 3), dtype=np.uint8)
        a[:32] = 255
        b = np.zeros((64, 64, 3), dtype=np.uint8)
        b[:, :32] = 255
        assert imaging.ahash64(a) == imaging.ahash64(a)
        assert imaging.ahash64(a) != imaging.ahash64(b)

    def test_pixels_to_latlon_inverse_of_render(self):
        from activity_files_ray import fixtures

        lat = np.array([40.0, 40.001, 40.002])
        lon = np.array([-105.0, -105.001, -105.002])
        rgb, (lat_min, lon_min, lat_max, lon_max) = fixtures.render_tile(lat, lon, 128, 128)
        rows, cols = imaging.extract_route_pixels(rgb)
        glat, glon = imaging.pixels_to_latlon(rows, cols, 128, 128, lat_min, lat_max, lon_min, lon_max)
        # every extracted pixel georeferences inside the tile bbox and
        # within a pixel of the drawn polyline's bbox
        assert glat.min() >= lat_min and glat.max() <= lat_max
        px_lat = (lat_max - lat_min) / 128
        assert abs(glat.max() - lat.max()) < 2 * px_lat


class TestFixtures:
    def test_canonical_values(self):
        from activity_files_ray import fixtures

        t = fixtures.canonical_trackpoints()
        assert t.num_rows == 3
        assert t["lat"].to_pylist() == [40.0, 40.0005, 40.0010]
        assert t["ele"].to_pylist() == [1600.0, 1601.0, 1602.0]

    def test_images_deterministic_and_valid(self):
        from activity_files_ray import fixtures

        t1 = fixtures.make_images(6, seed=42)
        t2 = fixtures.make_images(6, seed=42)
        assert t1.equals(t2)
        for row in t1.to_pylist():
            dec = imaging.decode_image(row["bytes"])
            assert dec.shape == (row["h"], row["w"], 3)
            assert imaging.ahash64(dec) == row["phash"]
            assert "bbox=" in row["caption"]
            lat_min, lon_min, lat_max, lon_max = fixtures.parse_caption_bbox(row["caption"])
            assert lat_min < lat_max and lon_min < lon_max

    def test_regions_shapes(self):
        from activity_files_ray import fixtures

        polys = fixtures.make_regions()
        assert all(p.is_convex_ccw() for p in polys)
        # canonical track inside reg_contain, outside reg_disjoint
        inside = polygons.points_in_polygon(np.array([40.0]), np.array([-105.0]), polys[0])
        assert inside[0]
        outside = polygons.points_in_polygon(np.array([40.0]), np.array([-105.0]), polys[1])
        assert not outside[0]


class TestRepetitionStats:
    """r5 Gopher-style repetition signals — integer-exact."""

    def test_hand_computed(self):
        import pandas as pd

        from activity_files_ray.functions import text

        df = text.repetition_stats(
            pd.Series(["a b a b c", "x x x", "solo", "", None])
        )
        assert df["n_tokens"].tolist() == [5, 3, 1, 0, 0]
        assert df["n_distinct_tokens"].tolist() == [3, 1, 1, 0, 0]
        assert df["top_token_n"].tolist() == [2, 3, 1, 0, 0]
        assert df["n_bigrams"].tolist() == [4, 2, 0, 0, 0]
        assert df["n_distinct_bigrams"].tolist() == [3, 1, 0, 0, 0]
        assert df["top_bigram_n"].tolist() == [2, 2, 0, 0, 0]

    def test_repetition_flags_boilerplate(self):
        import pandas as pd

        from activity_files_ray.functions import text

        clean = " ".join(f"w{i}" for i in range(50))
        spam = "buy now " * 25
        df = text.repetition_stats(pd.Series([clean, spam]))
        frac = df["top_bigram_n"] / df["n_bigrams"].clip(lower=1)
        assert frac.iloc[0] < 0.05 < frac.iloc[1]
