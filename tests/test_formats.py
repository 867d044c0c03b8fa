"""Format parser/encoder tests: round-trip idiom (parse→encode→parse
equality — the reference's core correctness idiom, SURVEY.md §5),
malformed-input diagnostics, and format detection."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray import fixtures
from activity_files_ray.sources import csv_fmt, detect, geojson, gpx, stage, tcx
from activity_files_ray.sources import fit as fit_mod


def canonical_points() -> pd.DataFrame:
    t = fixtures.canonical_trackpoints()
    df = t.to_pandas()
    df["ts_us"] = df["ts_us"].astype("int64")
    return df


def canonical_channels() -> pd.DataFrame:
    df = fixtures.canonical_channels().to_pandas().astype({"channel": str})
    df["ts_us"] = df["ts_us"].astype("int64")
    return df


def _assert_points_equal(a: pd.DataFrame, b: pd.DataFrame, ele_tol=0.01, ll_tol=1e-7):
    assert len(a) == len(b)
    np.testing.assert_array_equal(
        a["ts_us"].to_numpy(np.int64), b["ts_us"].to_numpy(np.int64)
    )
    np.testing.assert_allclose(a["lat"], b["lat"], atol=ll_tol)
    np.testing.assert_allclose(a["lon"], b["lon"], atol=ll_tol)
    np.testing.assert_allclose(a["ele"], b["ele"], atol=ele_tol)


class TestGpx:
    def test_roundtrip(self):
        pts, ch = canonical_points(), canonical_channels()
        payload = gpx.encode_gpx(pts, ch, name="morning ride")
        parsed = gpx.parse_gpx(payload, "a1")
        _assert_points_equal(pts, parsed.points_df())
        cdf = parsed.channels_df()
        # TPX v2 carries hr/cad/temp AND power (gpx_encoder.dart:395-408)
        assert set(cdf["channel"]) == {"heart_rate", "cadence", "temperature", "power"}
        hr = cdf[cdf.channel == "heart_rate"].sort_values("ts_us")
        assert hr["value"].tolist() == [140.0, 142.0, 145.0]
        assert parsed.name == "morning ride"

    def test_double_roundtrip_byte_stable(self):
        # encode(parse(encode(x))) == encode(x): the byte-stability form
        pts, ch = canonical_points(), canonical_channels()
        p1 = gpx.encode_gpx(pts, ch)
        parsed = gpx.parse_gpx(p1, "a1")
        p2 = gpx.encode_gpx(parsed.points_df(), parsed.channels_df())
        assert p1 == p2

    def test_segments_preserved(self):
        pts = canonical_points()
        payload = gpx.encode_gpx(pts, None, segment_starts=[0, 2])
        parsed = gpx.parse_gpx(payload, "a1")
        assert parsed.segment_starts == [0, 2]

    def test_malformed_xml_diagnostic(self):
        parsed = gpx.parse_gpx(b"<gpx><trk><trkseg>", "a1")
        assert any(d[1] == "gpx.parse.invalid_xml" for d in parsed.diags)
        assert len(parsed.ts_us) == 0

    def test_missing_coordinate_skipped(self):
        payload = (
            b'<gpx xmlns="http://www.topografix.com/GPX/1/1"><trk><trkseg>'
            b'<trkpt lat="40.0"><time>2024-04-01T06:00:00Z</time></trkpt>'
            b'<trkpt lat="40.0" lon="-105.0"><time>2024-04-01T06:00:05Z</time></trkpt>'
            b"</trkseg></trk></gpx>"
        )
        parsed = gpx.parse_gpx(payload, "a1")
        assert len(parsed.ts_us) == 1
        assert any(d[1] == "gpx.point.missing_coordinate" for d in parsed.diags)

    def test_nearest_join_tolerance(self):
        pt = np.array([0, 10_000_000], dtype=np.int64)
        st = np.array([1_000_000, 40_000_000], dtype=np.int64)
        sv = np.array([1.0, 2.0])
        out = gpx.nearest_join(pt, st, sv, tolerance_us=5_000_000)
        assert out[0] == 1.0 and np.isnan(out[1])


class TestGeojson:
    def test_roundtrip_linestring(self):
        pts = canonical_points()
        payload = geojson.encode_geojson(pts, metadata={"sport": "cycling"})
        parsed = geojson.parse_geojson(payload, "a1")
        _assert_points_equal(pts, parsed.points_df(), ele_tol=1e-9)
        assert parsed.sport == "cycling"

    def test_roundtrip_points_mode(self):
        pts, ch = canonical_points(), canonical_channels()
        payload = geojson.encode_geojson(pts, ch, mode="points")
        parsed = geojson.parse_geojson(payload, "a1")
        _assert_points_equal(pts, parsed.points_df(), ele_tol=1e-9)
        cdf = parsed.channels_df()
        assert "heart_rate" in set(cdf["channel"])

    def test_gpx_geojson_gpx_lossless(self):
        # the reference's round-trip pair (CHANGELOG.md:28-35 claim)
        pts = canonical_points()
        g1 = gpx.encode_gpx(pts, None)
        via = geojson.parse_geojson(
            geojson.encode_geojson(gpx.parse_gpx(g1, "a").points_df()), "a"
        )
        g2 = gpx.encode_gpx(via.points_df(), None)
        assert g1 == g2

    def test_invalid_json(self):
        parsed = geojson.parse_geojson(b"{not json", "a1")
        assert any(d[1] == "geojson.parse.invalid_json" for d in parsed.diags)


class TestCsv:
    def test_roundtrip(self):
        pts, ch = canonical_points(), canonical_channels()
        payload = csv_fmt.encode_csv(pts, ch)
        parsed = csv_fmt.parse_csv(payload, "a1")
        _assert_points_equal(pts, parsed.points_df())
        cdf = parsed.channels_df()
        assert set(cdf["channel"]) == {"heart_rate", "cadence", "power", "temperature"}

    def test_custom_channel_from_unknown_numeric_column(self):
        payload = (
            b"time,lat,lon,my_sensor\n"
            b"2024-04-01T06:00:00Z,40.0,-105.0,3.5\n"
        )
        parsed = csv_fmt.parse_csv(payload, "a1")
        assert parsed.channels_df()["channel"].tolist() == ["my_sensor"]

    def test_bad_row_diagnostic(self):
        payload = b"time,lat,lon\nnot-a-time,40.0,-105.0\n2024-04-01T06:00:00Z,40.0,-105.0\n"
        parsed = csv_fmt.parse_csv(payload, "a1")
        assert len(parsed.ts_us) == 1
        assert any(d[1] == "csv.row.invalid_time" for d in parsed.diags)

    def test_missing_time_column(self):
        parsed = csv_fmt.parse_csv(b"lat,lon\n1,2\n", "a1")
        assert any(d[1] == "csv.parse.missing_time_column" for d in parsed.diags)


class TestTcx:
    def test_roundtrip_with_laps(self):
        pts, ch = canonical_points(), canonical_channels()
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"],
                "kind": ["lap"],
                "start_us": [int(pts["ts_us"].iloc[0])],
                "end_us": [int(pts["ts_us"].iloc[2])],
                "sport": ["cycling"],
                "dist_m": [150.0],
            }
        )
        payload = tcx.encode_tcx(pts, ch, spans, sport="cycling")
        parsed = tcx.parse_tcx(payload, "a1")
        _assert_points_equal(pts, parsed.points_df())
        assert parsed.sport == "cycling"
        sdf = parsed.spans_df()
        assert len(sdf) == 1
        assert sdf["dist_m"].iloc[0] == pytest.approx(150.0, abs=0.1)
        cdf = parsed.channels_df()
        assert {"heart_rate", "cadence", "power"} <= set(cdf["channel"])

    def test_synthetic_lap_when_none(self):
        pts = canonical_points()
        parsed = tcx.parse_tcx(tcx.encode_tcx(pts, None, None, sport="running"), "a1")
        sdf = parsed.spans_df()
        assert len(sdf) == 1  # tcx_encoder.dart:37-46 synthetic lap
        assert parsed.sport == "running"

    def test_malformed(self):
        parsed = tcx.parse_tcx(b"<foo/>", "a1")
        assert any(d[1] == "tcx.parse.not_tcx" for d in parsed.diags)


class TestFit:
    def test_roundtrip(self):
        pts, ch = canonical_points(), canonical_channels()
        payload = fit_mod.encode_fit(pts, ch, sport="cycling")
        parsed = fit_mod.parse_fit(payload, "a1")
        assert not parsed.diags, parsed.diags
        got = parsed.points_df()
        assert len(got) == 3
        np.testing.assert_array_equal(
            got["ts_us"].to_numpy(), pts["ts_us"].to_numpy()
        )
        # semicircle quantization ≈ 8.4e-8 deg
        np.testing.assert_allclose(got["lat"], pts["lat"], atol=1e-6)
        np.testing.assert_allclose(got["lon"], pts["lon"], atol=1e-6)
        np.testing.assert_allclose(got["ele"], pts["ele"], atol=0.2)
        assert parsed.sport == "cycling"
        cdf = parsed.channels_df()
        hr = cdf[cdf.channel == "heart_rate"].sort_values("ts_us")
        assert hr["value"].tolist() == [140.0, 142.0, 145.0]
        sdf = parsed.spans_df()
        assert (sdf["kind"] == "session").any()

    def test_double_roundtrip_byte_stable(self):
        pts, ch = canonical_points(), canonical_channels()
        p1 = fit_mod.encode_fit(pts, ch, sport="cycling")
        parsed = fit_mod.parse_fit(p1, "a1")
        p2 = fit_mod.encode_fit(
            parsed.points_df(), parsed.channels_df(), sport=parsed.sport
        )
        assert p1 == p2

    def test_crc_mismatch_diagnosed(self):
        pts = canonical_points()
        payload = bytearray(fit_mod.encode_fit(pts, None))
        payload[-1] ^= 0xFF
        parsed = fit_mod.parse_fit(bytes(payload), "a1")
        assert any(d[1] == "fit.trailer.crc_mismatch" for d in parsed.diags)
        assert len(parsed.ts_us) == 3  # still parses (report mode)

    def test_truncated(self):
        pts = canonical_points()
        payload = fit_mod.encode_fit(pts, None)
        parsed = fit_mod.parse_fit(payload[:30], "a1")
        assert any("truncated" in d[1] or "crc" in d[1] for d in parsed.diags)

    def test_garbage(self):
        parsed = fit_mod.parse_fit(b"\x00" * 64, "a1")
        assert any(d[1] == "fit.header.invalid" for d in parsed.diags)


class TestDetect:
    def test_all_formats(self):
        pts, ch = canonical_points(), canonical_channels()
        assert detect.detect_format(gpx.encode_gpx(pts, ch)) == "gpx"
        assert detect.detect_format(tcx.encode_tcx(pts, ch)) == "tcx"
        assert detect.detect_format(csv_fmt.encode_csv(pts, ch)) == "csv"
        assert detect.detect_format(geojson.encode_geojson(pts)) == "geojson"
        assert detect.detect_format(fit_mod.encode_fit(pts, ch)) == "fit"

    def test_base64_fit(self):
        import base64

        payload = base64.b64encode(fit_mod.encode_fit(canonical_points(), None))
        assert detect.detect_format(payload) == "fit"

    def test_unknown(self):
        assert detect.detect_format(b"hello world") == "unknown"
        assert detect.detect_format(b"\x01\x02\x03\x04") == "unknown"


@pytest.mark.usefixtures("ray_session")
class TestParseStageOnRay:
    def test_parse_fanout(self):
        import pyarrow as pa
        import ray.data as rd

        pts, ch = canonical_points(), canonical_channels()
        payloads = pa.table(
            {
                "activity_id": ["g1", "t1", "c1", "j1", "f1", "bad"],
                "bytes": [
                    gpx.encode_gpx(pts, ch),
                    tcx.encode_tcx(pts, ch),
                    csv_fmt.encode_csv(pts, ch),
                    geojson.encode_geojson(pts),
                    fit_mod.encode_fit(pts, ch),
                    b"garbage not a format",
                ],
            }
        )
        ds = rd.from_arrow(payloads)
        points = ds.map_batches(
            stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "points"}
        ).to_pandas()
        assert set(points["activity_id"]) == {"g1", "t1", "c1", "j1", "f1"}
        assert len(points) == 15
        diags = ds.map_batches(
            stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "diagnostics"}
        ).to_pandas()
        assert "bad" in set(diags["activity_id"])
        acts = ds.map_batches(
            stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "activities"}
        ).to_pandas()
        assert len(acts) == 6
        assert acts.set_index("activity_id").loc["g1", "n_points"] == 3


class TestFitSpans:
    def test_lap_and_event_roundtrip(self):
        pts, ch = canonical_points(), canonical_channels()
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 2,
                "kind": ["lap", "event"],
                "start_us": [int(pts["ts_us"].iloc[0])] * 2,
                "end_us": [int(pts["ts_us"].iloc[2]), int(pts["ts_us"].iloc[0])],
                "sport": ["cycling", None],
                "dist_m": [150.0, np.nan],
            }
        )
        payload = fit_mod.encode_fit(pts, ch, sport="cycling", spans=spans)
        parsed = fit_mod.parse_fit(payload, "a1")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df()
        kinds = sorted(sdf["kind"])
        assert kinds == ["event", "lap", "session"]
        lap = sdf[sdf["kind"] == "lap"].iloc[0]
        assert lap["dist_m"] == pytest.approx(150.0, abs=0.01)
        assert lap["sport"] == "cycling"
        assert int(lap["end_us"] - lap["start_us"]) == 10_000_000


class TestGpxWaypointsRoutes:
    def test_lossless_roundtrip(self):
        pts = canonical_points()
        wps = [
            {"lat": 40.1, "lon": -105.2, "ele": 1700.0,
             "time_us": 1711951200000000, "name": "summit"},
            {"lat": 39.9, "lon": -104.9},
        ]
        routes = [
            {"name": "home loop", "points": [
                {"lat": 40.0, "lon": -105.0, "ele": 1600.0},
                {"lat": 40.01, "lon": -105.01},
            ]},
        ]
        p1 = gpx.encode_gpx(pts, None, waypoints=wps, routes=routes)
        parsed = gpx.parse_gpx(p1, "a1")
        assert parsed.n_waypoints == 2 and parsed.n_routes == 1
        assert parsed.waypoints[0]["name"] == "summit"
        assert parsed.waypoints[0]["ele"] == 1700.0
        assert parsed.routes[0]["name"] == "home loop"
        assert len(parsed.routes[0]["points"]) == 2
        # byte-stable second round trip (lossless preservation)
        p2 = gpx.encode_gpx(
            parsed.points_df(), None,
            waypoints=parsed.waypoints, routes=parsed.routes,
        )
        assert p1 == p2

    def test_reference_gpx_waypoints_preserved(self):
        import os
        path = "/root/reference/example/assets/sample.gpx"
        if not os.path.exists(path):
            pytest.skip("no reference assets")
        parsed = gpx.parse_gpx(open(path, "rb").read(), "ref")
        assert parsed.n_waypoints == len(parsed.waypoints)
        assert parsed.n_routes == len(parsed.routes)


class TestFitIntegrityModes:
    def test_strict_stops_on_crc(self):
        pts = canonical_points()
        payload = bytearray(fit_mod.encode_fit(pts, None))
        payload[-1] ^= 0xFF
        parsed = fit_mod.parse_fit(bytes(payload), "a", integrity="strict")
        assert any(d[0] == "error" and "crc" in d[1] for d in parsed.diags)
        assert len(parsed.ts_us) == 0  # strict: no content returned

    def test_silent_ignores_crc(self):
        pts = canonical_points()
        payload = bytearray(fit_mod.encode_fit(pts, None))
        payload[-1] ^= 0xFF
        parsed = fit_mod.parse_fit(bytes(payload), "a", integrity="silent")
        assert not any("crc" in d[1] for d in parsed.diags)
        assert len(parsed.ts_us) == 3


class TestFitChannelGrid:
    def test_channels_only_record_grid(self):
        # O2: no points, channels present -> records on the union of
        # channel timestamps with invalid position sentinels
        ch = canonical_channels()
        empty = canonical_points().iloc[0:0]
        payload = fit_mod.encode_fit(empty, ch)
        parsed = fit_mod.parse_fit(payload, "a")
        assert len(parsed.ts_us) == 0  # no positions decoded
        cdf = parsed.channels_df()
        assert set(cdf["channel"]) == {"heart_rate", "cadence", "power", "temperature"}
        hr = cdf[cdf.channel == "heart_rate"].sort_values("ts_us")
        assert hr["value"].tolist() == [140.0, 142.0, 145.0]


class TestFitDeveloperFields:
    def _with_custom(self):
        pts, ch = canonical_points(), canonical_channels()
        extra = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 3 * 2,
                "channel": ["muscle_oxygen"] * 3 + ["form_power"] * 3,
                "ts_us": pts["ts_us"].tolist() * 2,
                "value": [55.5, 56.25, 57.0, 81.0, 82.5, 84.0],
            }
        )
        return pts, pd.concat([ch, extra], ignore_index=True)

    def test_custom_channels_roundtrip_exact(self):
        pts, ch = self._with_custom()
        payload = fit_mod.encode_fit(pts, ch, sport="cycling")
        parsed = fit_mod.parse_fit(payload, "a1")
        assert not [d for d in parsed.diags if d[0] == "error"]
        cdf = parsed.channels_df()
        for name, exp in (
            ("muscle_oxygen", [55.5, 56.25, 57.0]),
            ("form_power", [81.0, 82.5, 84.0]),
        ):
            got = cdf[cdf.channel == name].sort_values("ts_us")["value"].tolist()
            assert got == exp, name  # float64 dev fields: EXACT

    def test_byte_stable_double_roundtrip(self):
        pts, ch = self._with_custom()
        p1 = fit_mod.encode_fit(pts, ch, sport="cycling")
        parsed = fit_mod.parse_fit(p1, "a1")
        p2 = fit_mod.encode_fit(parsed.points_df(), parsed.channels_df(), sport=parsed.sport)
        assert p1 == p2

    def test_name_sanitization(self):
        pts = canonical_points()
        ch = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 3,
                "channel": ["My Sensor (v2)!"] * 3,
                "ts_us": pts["ts_us"].tolist(),
                "value": [1.0, 2.0, 3.0],
            }
        )
        # channel ids are normalized on add_sample; encoder keeps them;
        # a RAW payload with an unsanitized field name sanitizes on parse
        payload = fit_mod.encode_fit(pts, ch)
        parsed = fit_mod.parse_fit(payload, "a1")
        names = set(parsed.channels_df()["channel"])
        assert any("my_sensor" in n for n in names), names

    def test_missing_values_are_nan_sentinels(self):
        pts = canonical_points()
        ch = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 2,
                "channel": ["grit"] * 2,
                "ts_us": [int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[2])],
                "value": [1.5, 2.5],
            }
        )
        parsed = fit_mod.parse_fit(fit_mod.encode_fit(pts, ch), "a1")
        g = parsed.channels_df()
        g = g[g.channel == "grit"]
        assert len(g) == 2  # middle record's NaN dev value not emitted


class TestFitLengthsAndSets:
    def test_roundtrip(self):
        pts = canonical_points()
        t0 = int(pts["ts_us"].iloc[0])
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 2,
                "kind": ["length", "set"],
                "start_us": [t0, t0 + 60_000_000],
                "end_us": [t0 + 30_000_000, t0 + 90_000_000],
                "sport": [None, None],
                "dist_m": [np.nan, np.nan],
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans, sport="swimming")
        parsed = fit_mod.parse_fit(payload, "a1")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df()
        assert sorted(sdf["kind"]) == ["length", "session", "set"]
        ln = sdf[sdf["kind"] == "length"].iloc[0]
        assert int(ln["end_us"] - ln["start_us"]) == 30_000_000
        st = sdf[sdf["kind"] == "set"].iloc[0]
        assert int(st["end_us"] - st["start_us"]) == 30_000_000


class TestGpxForeignExtensions:
    def test_foreign_nodes_roundtrip(self):
        payload = (
            b'<gpx xmlns="http://www.topografix.com/GPX/1/1" '
            b'xmlns:acme="http://acme.example/1"><trk><trkseg>'
            b'<trkpt lat="40.0" lon="-105.0">'
            b"<time>2024-04-01T06:00:00Z</time>"
            b"<extensions>"
            b'<acme:sensor kind="imu"><acme:axis>x</acme:axis></acme:sensor>'
            b"</extensions></trkpt>"
            b'<trkpt lat="40.0005" lon="-105.0005">'
            b"<time>2024-04-01T06:00:05Z</time></trkpt>"
            b"</trkseg></trk></gpx>"
        )
        parsed = gpx.parse_gpx(payload, "a1")
        assert 0 in parsed.point_ext and 1 not in parsed.point_ext
        pts = parsed.points_df()
        assert pts["ext"].iloc[0] and pts["ext"].iloc[1] is None
        # re-encode and re-parse: the foreign tree survives
        p2 = gpx.encode_gpx(pts, None)
        re = gpx.parse_gpx(p2, "a2")
        assert re.point_ext.get(0) == parsed.point_ext[0]
        assert "sensor" in re.point_ext[0] and '"kind":"imu"' in re.point_ext[0]
        # byte-stable second hop
        assert gpx.encode_gpx(re.points_df(), None) == p2

    def test_tpx_channels_not_treated_as_foreign(self):
        pts = canonical_points()
        ch = canonical_channels()
        parsed = gpx.parse_gpx(gpx.encode_gpx(pts, ch), "a1")
        assert not parsed.point_ext  # TPX tags stay channels


@pytest.mark.usefixtures("ray_session")
class TestUnionParse:
    def test_union_equals_separate_passes(self):
        import pyarrow as pa
        import ray.data as rd

        pts, ch = canonical_points(), canonical_channels()
        payloads = pa.table(
            {
                "activity_id": ["g1", "f1"],
                "bytes": [gpx.encode_gpx(pts, ch), fit_mod.encode_fit(pts, ch)],
            }
        )
        ds = rd.from_arrow(payloads)
        union = ds.map_batches(stage.parse_batch_union, batch_format="pyarrow", batch_size=None)
        up = stage.union_select(union, "point").to_pandas()
        sep = ds.map_batches(
            stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "points"}
        ).to_pandas()
        key = ["activity_id", "seq"]
        up2 = up.sort_values(key).reset_index(drop=True)
        sep2 = sep.sort_values(key).reset_index(drop=True)
        assert up2["ts_us"].astype("int64").tolist() == sep2["ts_us"].astype("int64").tolist()
        uc = stage.union_select(union, "channel").to_pandas()
        sec = ds.map_batches(
            stage.parse_batch, batch_format="pyarrow", fn_kwargs={"output": "channels"}
        ).to_pandas()
        assert len(uc) == len(sec)
        ua = stage.union_select(union, "activity").to_pandas()
        assert set(ua["activity_id"]) == {"g1", "f1"}
        assert (ua["n_points"] == 3).all()


class TestFitMultiSession:
    def test_explicit_sessions_roundtrip(self):
        pts = canonical_points()
        t0 = int(pts["ts_us"].iloc[0])
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 2,
                "kind": ["session", "session"],
                "start_us": [t0, t0 + 3_600_000_000],
                "end_us": [t0 + 1_800_000_000, t0 + 5_400_000_000],
                "sport": ["swimming", "cycling"],
                "dist_m": [750.0, 20000.0],
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        parsed = fit_mod.parse_fit(payload, "a1")
        sdf = parsed.spans_df()
        sessions = sdf[sdf["kind"] == "session"].sort_values("start_us")
        assert len(sessions) == 2  # multi-session (additionalSessions)
        assert sessions["sport"].tolist() == ["swimming", "cycling"]
        assert sessions["dist_m"].tolist() == [750.0, 20000.0]


class TestEncoderEdgeCases:
    """Encoders under degenerate inputs: empty track, single point,
    extreme-but-valid values — must emit parseable payloads."""

    def _check(self, pts, ch=None):
        for fmt in ("gpx", "tcx", "csv", "geojson", "fit"):
            payload = stage.encode_activity(fmt, pts, ch)
            parsed = stage.parse_payload(payload, "e", fmt)
            assert len(parsed.ts_us) == len(pts), fmt

    def test_empty_track(self):
        self._check(canonical_points().iloc[0:0])

    def test_single_point(self):
        self._check(canonical_points().iloc[0:1])

    def test_extreme_coordinates(self):
        pts = canonical_points()
        pts.loc[0, "lat"] = 89.9999999
        pts.loc[0, "lon"] = -179.9999999
        pts.loc[1, "lat"] = -89.9999999
        pts.loc[2, "ele"] = 8848.86
        self._check(pts)


class TestLapStats:
    def _spans(self, pts):
        return pd.DataFrame(
            {
                "activity_id": ["act_000000"],
                "kind": ["lap"],
                "start_us": [int(pts["ts_us"].iloc[0])],
                "end_us": [int(pts["ts_us"].iloc[2])],
                "sport": ["cycling"],
                "dist_m": [150.0],
                "calories": [42.0],
                "avg_hr": [142.0],
                "max_hr": [151.0],
            }
        )

    def test_tcx_lap_stats_roundtrip(self):
        pts = canonical_points()
        payload = tcx.encode_tcx(pts, None, self._spans(pts), sport="cycling")
        sdf = tcx.parse_tcx(payload, "a").spans_df()
        lap = sdf[sdf["kind"] == "lap"].iloc[0]
        assert lap["calories"] == 42.0
        assert lap["avg_hr"] == 142.0 and lap["max_hr"] == 151.0

    def test_fit_lap_stats_roundtrip(self):
        pts = canonical_points()
        payload = fit_mod.encode_fit(pts, None, spans=self._spans(pts))
        parsed = fit_mod.parse_fit(payload, "a")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df()
        lap = sdf[sdf["kind"] == "lap"].iloc[0]
        assert lap["calories"] == 42.0
        assert lap["avg_hr"] == 142.0 and lap["max_hr"] == 151.0

    def test_missing_stats_are_nan(self):
        pts = canonical_points()
        spans = self._spans(pts).drop(columns=["calories", "avg_hr", "max_hr"])
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        sdf = fit_mod.parse_fit(payload, "a").spans_df()
        lap = sdf[sdf["kind"] == "lap"].iloc[0]
        assert np.isnan(lap["calories"]) and np.isnan(lap["avg_hr"])


class TestGpxSegmentPseudoLaps:
    def test_two_segments_two_laps(self):
        pts = canonical_points()
        payload = gpx.encode_gpx(pts, None, segment_starts=[0, 2])
        parsed = gpx.parse_gpx(payload, "a1")
        sdf = parsed.spans_df()
        laps = sdf[sdf["kind"] == "lap"]
        assert len(laps) == 2  # one pseudo-lap per trkseg
        assert laps["dist_m"].iloc[0] > 60  # seg 1: two ~70m points
        assert laps["dist_m"].iloc[1] == 0.0  # seg 2: single point

    def test_single_segment_no_pseudo_laps(self):
        pts = canonical_points()
        parsed = gpx.parse_gpx(gpx.encode_gpx(pts, None), "a1")
        assert not (parsed.spans_df()["kind"] == "lap").any()


class TestSetStats:
    def test_reps_weight_roundtrip(self):
        pts = canonical_points()
        t0 = int(pts["ts_us"].iloc[0])
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"],
                "kind": ["set"],
                "start_us": [t0],
                "end_us": [t0 + 45_000_000],
                "sport": [None],
                "dist_m": [np.nan],
                "reps": [12.0],
                "weight_kg": [62.5],  # /16 scale: exact sixteenth
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        sdf = fit_mod.parse_fit(payload, "a").spans_df()
        st = sdf[sdf["kind"] == "set"].iloc[0]
        assert st["reps"] == 12.0
        assert st["weight_kg"] == 62.5


class TestFitBigEndian:
    def test_big_endian_definition_decodes(self):
        """Hand-crafted big-endian FIT (arch=1): the endianness branch
        of field decoding (fit_parser.dart endian-aware readers)."""
        import struct

        from activity_files_ray.functions import geo

        body = bytearray()
        # record def (local 0, arch=1 BE): timestamp u32, lat i32, lon i32, hr u8
        body += bytes([0x40, 0, 1]) + struct.pack(">H", 20) + bytes([4])
        body += bytes([253, 4, 0x86, 0, 4, 0x85, 1, 4, 0x85, 3, 1, 0x02])
        fit_ts = 1_000_000_000
        lat_sc = int(round(40.0 / geo.SEMICIRCLE_TO_DEG))
        lon_sc = int(round(-105.0 / geo.SEMICIRCLE_TO_DEG))
        body += bytes([0x00])
        body += struct.pack(">I", fit_ts) + struct.pack(">i", lat_sc)
        body += struct.pack(">i", lon_sc) + bytes([142])
        header = struct.pack("<BBHI4s", 14, 0x10, 2140, len(body), b".FIT")
        header += struct.pack("<H", fit_mod.crc16(header))
        blob = header + bytes(body)
        blob += struct.pack("<H", fit_mod.crc16(blob))
        parsed = fit_mod.parse_fit(blob, "be")
        assert not [d for d in parsed.diags if d[0] == "error"], parsed.diags
        assert len(parsed.ts_us) == 1
        assert parsed.lat[0] == pytest.approx(40.0, abs=1e-6)
        assert parsed.lon[0] == pytest.approx(-105.0, abs=1e-6)
        cdf = parsed.channels_df()
        assert cdf[cdf.channel == "heart_rate"]["value"].iloc[0] == 142.0
        assert parsed.ts_us[0] == fit_mod.FIT_EPOCH_US + fit_ts * 1_000_000


class TestGpxVersions:
    def test_gpx10_output_roundtrips(self):
        pts = canonical_points()
        p10 = gpx.encode_gpx(pts, None, version="1.0")
        assert b'version="1.0"' in p10 and b"GPX/1/0" in p10
        parsed = gpx.parse_gpx(p10, "a")
        assert len(parsed.ts_us) == 3
        from activity_files_ray.sources import detect
        assert detect.detect_format(p10) == "gpx"


@pytest.mark.usefixtures("ray_session")
class TestPerChannelTolerance:
    def test_tight_tolerance_drops_offset_channel(self):
        pts = canonical_points()
        ch = pd.DataFrame(
            {
                "activity_id": ["act_000000"] * 3,
                "channel": ["heart_rate"] * 3,
                # samples 2s after each point
                "ts_us": (pts["ts_us"] + 2_000_000).tolist(),
                "value": [140.0, 142.0, 145.0],
            }
        )
        # default 5s tolerance: joined
        p1 = gpx.parse_gpx(gpx.encode_gpx(pts, ch), "a")
        assert len(p1.channels_df()) == 3
        # per-channel 1s tolerance: dropped
        p2 = gpx.parse_gpx(
            gpx.encode_gpx(pts, ch, channel_tolerances_us={"heart_rate": 1_000_000}),
            "a",
        )
        assert len(p2.channels_df()) == 0

    def test_union_select_spans_and_diags(self):
        import pyarrow as pa
        import ray.data as rd

        pts, ch = canonical_points(), canonical_channels()
        spans = pd.DataFrame(
            {
                "activity_id": ["act_000000"], "kind": ["lap"],
                "start_us": [int(pts["ts_us"].iloc[0])],
                "end_us": [int(pts["ts_us"].iloc[2])],
                "sport": ["cycling"], "dist_m": [150.0],
            }
        )
        payloads = pa.table(
            {
                "activity_id": ["t1", "bad"],
                "bytes": [tcx.encode_tcx(pts, ch, spans), b"junk"],
            }
        )
        union = rd.from_arrow(payloads).map_batches(
            stage.parse_batch_union, batch_format="pyarrow", batch_size=None
        )
        sp = stage.union_select(union, "span").to_pandas()
        assert (sp["span_kind"] == "lap").any()
        dg = stage.union_select(union, "diag").to_pandas()
        assert "bad" in set(dg["activity_id"])


class TestFitLossless:
    """FIT losslessness: full lap/session stat set, open extras,
    compressed speed-distance, manufacturer table, fit_field catch-all
    (fit_parser.dart:1057-1089 / fit_encoder.dart:1293-1346 parity)."""

    @staticmethod
    def _fit_file(body: bytes) -> bytes:
        header = __import__("struct").pack(
            "<BBHI4s", 14, 0x10, 2140, len(body), b".FIT"
        )
        header += __import__("struct").pack("<H", fit_mod.crc16(header))
        blob = header + body
        return blob + __import__("struct").pack("<H", fit_mod.crc16(blob))

    def test_full_lap_session_stats_roundtrip(self):
        import struct

        pts = canonical_points()
        t0, t2 = int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[2])
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 2,
                "kind": ["lap", "session"],
                "start_us": [t0, t0],
                "end_us": [t2, t2],
                "sport": ["running", "running"],
                "dist_m": [1500.0, 1500.0],
                "calories": [250.0, 250.0],
                "avg_speed": [3.125, 3.125],
                "max_speed": [5.501, 5.501],
                "avg_hr": [141.0, 141.0],
                "max_hr": [166.0, 166.0],
                "avg_cadence": [87.0, 87.0],
                "max_cadence": [95.0, 95.0],
                "avg_power": [214.0, 214.0],
                "max_power": [450.0, 450.0],
                "event": [9.0, np.nan],
                "event_type": [1.0, np.nan],
                "num_active_lengths": [20.0, 20.0],
                "swim_stroke": [1.0, 1.0],
                "timer_time_s": [np.nan, 3541.25],
                "pool_length_m": [np.nan, 25.0],
                "avg_stroke_count": [np.nan, 18.5],
                "sub_sport": [np.nan, 17.0],
                "total_cycles": [np.nan, 12345.0],
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        parsed = fit_mod.parse_fit(payload, "a")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df().set_index("kind")
        lap, sess = sdf.loc["lap"], sdf.loc["session"]
        for col in ("calories", "avg_hr", "max_hr", "avg_cadence",
                    "max_cadence", "avg_power", "max_power"):
            assert lap[col] == spans.iloc[0][col], col
            assert sess[col] == spans.iloc[1][col], col
        assert lap["avg_speed"] == pytest.approx(3.125, abs=0.001)
        assert lap["max_speed"] == pytest.approx(5.501, abs=0.001)
        assert lap["event"] == 9.0 and lap["event_type"] == 1.0
        assert lap["swim_stroke"] == 1.0 and lap["num_active_lengths"] == 20.0
        assert sess["timer_time_s"] == pytest.approx(3541.25, abs=0.001)
        assert sess["pool_length_m"] == pytest.approx(25.0, abs=0.01)
        assert sess["avg_stroke_count"] == pytest.approx(18.5, abs=0.1)
        assert sess["sub_sport"] == 17.0 and sess["total_cycles"] == 12345.0
        # double round-trip is byte-stable
        p2 = fit_mod.encode_fit(
            parsed.points_df(), parsed.channels_df(),
            sport=parsed.sport, spans=parsed.spans_df(),
        )
        parsed2 = fit_mod.parse_fit(p2, "a")
        pd.testing.assert_frame_equal(
            parsed.spans_df(), parsed2.spans_df(), check_exact=False, atol=1e-9
        )

    def test_extras_roundtrip(self):
        # unmodeled lap/session fields (total_ascent=22 on laps,
        # training_stress_score-ish on sessions) survive FIT->FIT
        pts = canonical_points()
        t0, t2 = int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[2])
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 2,
                "kind": ["lap", "session"],
                "start_us": [t0, t0],
                "end_us": [t2, t2],
                "sport": [None, None],
                "dist_m": [np.nan, np.nan],
                "extra_fields": ['{"21":512,"22":480}', '{"34":87,"48":-12}'],
                "extra_arrays": ['{"57":[12,345,67,8,90]}', None],
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        parsed = fit_mod.parse_fit(payload, "a")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df().set_index("kind")
        assert sdf.loc["lap", "extra_fields"] == '{"21":512.0,"22":480.0}'
        assert sdf.loc["lap", "extra_arrays"] == '{"57":[12.0,345.0,67.0,8.0,90.0]}'
        assert sdf.loc["session", "extra_fields"] == '{"34":87.0,"48":-12.0}'
        assert sdf.loc["session", "extra_arrays"] is None
        p2 = fit_mod.encode_fit(
            parsed.points_df(), parsed.channels_df(),
            sport=parsed.sport, spans=parsed.spans_df(),
        )
        assert payload == p2  # byte-stable with extras present

    def test_session_hr_field_numbers(self):
        # session avg/max HR live at 16/17 (15 is max_speed) — a raw
        # session message with all three set must not cross the wires
        import struct

        body = bytearray()
        # session def (local 0): start_time(2) u32, elapsed(7) u32,
        # max_speed(15) u16, avg_hr(16) u8, max_hr(17) u8
        body += bytes([0x40, 0, 0, 18, 0, 5,
                       2, 4, 0x86, 7, 4, 0x86, 15, 2, 0x84,
                       16, 1, 0x02, 17, 1, 0x02])
        body += bytes([0x00])
        body += struct.pack("<I", 1_000_000_000)
        body += struct.pack("<I", 60_000)
        body += struct.pack("<H", 12000)  # max_speed raw -> 12.0 m/s
        body += bytes([142])  # avg_hr
        body += bytes([171])  # max_hr
        parsed = fit_mod.parse_fit(self._fit_file(bytes(body)), "a")
        sdf = parsed.spans_df()
        sess = sdf[sdf["kind"] == "session"].iloc[0]
        assert sess["avg_hr"] == 142.0
        assert sess["max_hr"] == 171.0
        assert sess["max_speed"] == pytest.approx(12.0, abs=0.001)

    def test_compressed_speed_distance(self):
        # legacy field 8: 12-bit speed (scale 100) + 12-bit distance
        # delta accumulator (scale 16) with rollover
        import struct

        def rec(ts, speed_raw, dist_raw):
            packed = (speed_raw & 0xFFF) | ((dist_raw & 0xFFF) << 12)
            return bytes([0x00]) + struct.pack("<I", ts) + bytes(
                [packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF]
            )

        body = bytearray()
        # record def (local 0): timestamp(253) u32, csd(8) byte[3]
        body += bytes([0x40, 0, 0, 20, 0, 2, 253, 4, 0x86, 8, 3, 0x0D])
        body += rec(1_000_000_000, 250, 4000)   # seed: accum 0
        body += rec(1_000_000_001, 300, 4080)   # +80 -> 5.0 m
        body += rec(1_000_000_002, 350, 40)     # rollover: +(40-4080)&0xFFF=56 -> 8.5 m
        parsed = fit_mod.parse_fit(self._fit_file(bytes(body)), "a")
        ch = parsed.channels_df()
        sp = ch[ch["channel"] == "speed"].sort_values("ts_us")["value"].tolist()
        assert sp == pytest.approx([2.5, 3.0, 3.5])
        d = ch[ch["channel"] == "distance"].sort_values("ts_us")["value"].tolist()
        assert d == pytest.approx([0.0, 5.0, 8.5])

    def test_csd_explicit_fields_win(self):
        import struct

        body = bytearray()
        # record def: timestamp(253), speed(6) u16, distance(5) u32, csd(8)
        body += bytes([0x40, 0, 0, 20, 0, 4,
                       253, 4, 0x86, 6, 2, 0x84, 5, 4, 0x86, 8, 3, 0x0D])
        packed = (250 & 0xFFF) | ((4000 & 0xFFF) << 12)
        body += (bytes([0x00]) + struct.pack("<I", 1_000_000_000)
                 + struct.pack("<H", 4200) + struct.pack("<I", 123400)
                 + bytes([packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF]))
        parsed = fit_mod.parse_fit(self._fit_file(bytes(body)), "a")
        ch = parsed.channels_df()
        assert ch[ch["channel"] == "speed"]["value"].tolist() == [4.2]
        assert ch[ch["channel"] == "distance"]["value"].tolist() == [1234.0]

    def test_manufacturer_table(self):
        from activity_files_ray.sources import fit_profile
        from activity_files_ray.stages import validate as vd

        pts = canonical_points()
        payload = fit_mod.encode_fit(pts, None, manufacturer_id=32)
        parsed = fit_mod.parse_fit(payload, "a")
        assert parsed.metadata["manufacturer"] == "Wahoo Fitness"
        assert parsed.metadata["fit_manufacturer_id"] == "32"
        assert parsed.creator.startswith("FIT Device Wahoo Fitness")
        assert fit_profile.manufacturer_id("wahoo fitness") == 32
        assert fit_profile.manufacturer_name(9999) == "manufacturer_9999"
        # V6: name<->id mismatch fires against the full table
        d = vd.validate_device(
            {"manufacturer": "Garmin", "fit_manufacturer_id": 32}, "a"
        )
        assert (d["code"] == "validation.device.name_id_mismatch").any()
        d_ok = vd.validate_device(
            {"manufacturer": "Wahoo Fitness", "fit_manufacturer_id": 32}, "a"
        )
        assert not (d_ok["code"] == "validation.device.name_id_mismatch").any()

    def test_fit_field_catch_all_roundtrip(self):
        import struct

        body = bytearray()
        # record def: timestamp(253) u32, vertical_oscillation-ish(39) u16
        body += bytes([0x40, 0, 0, 20, 0, 2, 253, 4, 0x86, 39, 2, 0x84])
        for i, v in enumerate((1010, 1020, 1030)):
            body += bytes([0x00]) + struct.pack("<I", 1_000_000_000 + i) + struct.pack("<H", v)
        parsed = fit_mod.parse_fit(self._fit_file(bytes(body)), "a")
        ch = parsed.channels_df()
        got = ch[ch["channel"] == "fit_field_39"].sort_values("ts_us")["value"].tolist()
        assert got == [1010.0, 1020.0, 1030.0]
        # re-encode emits it as a native field again, not a dev field
        p2 = fit_mod.encode_fit(parsed.points_df(), parsed.channels_df())
        parsed2 = fit_mod.parse_fit(p2, "a")
        ch2 = parsed2.channels_df()
        got2 = ch2[ch2["channel"] == "fit_field_39"].sort_values("ts_us")["value"].tolist()
        assert got2 == [1010.0, 1020.0, 1030.0]


class TestTcxNotesAuthor:
    def test_notes_author_roundtrip(self):
        # tcxNotes (first activity) + tcxAuthor (file-level) survive
        # TCX->TCX (models.dart:1273-1276, tcx_parser.dart:87-91,112)
        pts = canonical_points()
        p1 = tcx.encode_tcx(
            pts, None, sport="running",
            notes="felt great & strong", author="MyApp <v2>",
        )
        parsed = tcx.parse_tcx(p1, "a1")
        assert parsed.metadata["tcx_notes"] == "felt great & strong"
        assert parsed.metadata["tcx_author"] == "MyApp <v2>"
        from activity_files_ray.pipelines import convert as cv
        p2, _d = cv.convert_one(p1, "tcx", "a1")
        parsed2 = tcx.parse_tcx(p2, "a1")
        assert parsed2.metadata["tcx_notes"] == "felt great & strong"
        assert parsed2.metadata["tcx_author"] == "MyApp <v2>"

    def test_first_activity_notes_win(self):
        xml = b"""<?xml version="1.0"?>
<TrainingCenterDatabase xmlns="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2">
<Activities>
<Activity Sport="Running"><Id>2024-01-01T00:00:00Z</Id>
<Lap StartTime="2024-01-01T00:00:00Z"><TotalTimeSeconds>60.0</TotalTimeSeconds></Lap>
<Notes>first</Notes></Activity>
<Activity Sport="Biking"><Id>2024-01-01T01:00:00Z</Id>
<Lap StartTime="2024-01-01T01:00:00Z"><TotalTimeSeconds>60.0</TotalTimeSeconds></Lap>
<Notes>second</Notes></Activity>
</Activities>
<Author xsi:type="Application_t" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"><Name>Tool</Name></Author>
</TrainingCenterDatabase>"""
        parsed = tcx.parse_tcx(xml, "a1")
        assert parsed.metadata["tcx_notes"] == "first"
        assert parsed.metadata["tcx_author"] == "Tool"


class TestLanceDispatch:
    """input_hint names a Lance table; the engine dispatches on path
    suffix and import-gates pylance (absent in this sandbox)."""

    def test_parquet_fallback(self, ray_session):
        from activity_files_ray.sources import lance_io

        ds = lance_io.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )
        assert ds.count() > 0
        assert ds.schema().names == ["doc_id"]

    def test_lance_path_gated(self):
        from activity_files_ray.sources import lance_io

        assert lance_io.is_lance_path("/data/images.lance")
        assert not lance_io.is_lance_path("/data/images.parquet")
        if not lance_io.lance_available():
            with pytest.raises(ImportError, match="pylance"):
                lance_io.read_table("/data/images.lance")


class TestFitLengthSetStats:
    def test_length_and_set_stats_roundtrip(self):
        # SwimLength strokes/speed/stroke-type/active + WorkoutSet
        # set_type/category survive FIT->FIT (models.dart:365-540)
        pts = canonical_points()
        t0, t1 = int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[1])
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 2,
                "kind": ["length", "set"],
                "start_us": [t0, t0],
                "end_us": [t1, t1],
                "sport": [None, None],
                "dist_m": [np.nan, np.nan],
                "total_strokes": [18.0, np.nan],
                "avg_speed": [1.251, np.nan],
                "swim_stroke": [2.0, np.nan],
                "is_active": [1.0, 0.0],
                "reps": [np.nan, 12.0],
                "weight_kg": [np.nan, 42.5],
                "category": [np.nan, 7.0],
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        parsed = fit_mod.parse_fit(payload, "a")
        assert not [d for d in parsed.diags if d[0] == "error"]
        sdf = parsed.spans_df().set_index("kind")
        ln, st = sdf.loc["length"], sdf.loc["set"]
        assert ln["total_strokes"] == 18.0
        assert ln["avg_speed"] == pytest.approx(1.251, abs=0.001)
        assert ln["swim_stroke"] == 2.0 and ln["is_active"] == 1.0
        assert st["reps"] == 12.0 and st["weight_kg"] == 42.5
        assert st["is_active"] == 0.0 and st["category"] == 7.0
        p2 = fit_mod.encode_fit(
            parsed.points_df(), parsed.channels_df(),
            sport=parsed.sport, spans=parsed.spans_df(),
        )
        assert p2 == payload


class TestFitDeviceInfo:
    def test_device_info_roundtrip(self):
        pts = canonical_points()
        dev = {"fit_manufacturer_id": "1", "fit_serial_number": "987654",
               "fit_product_id": "4440", "software_version": "9.75",
               "model": "Forerunner 965"}
        payload = fit_mod.encode_fit(pts, None, manufacturer_id=1, device=dev)
        parsed = fit_mod.parse_fit(payload, "a")
        assert not [d for d in parsed.diags if d[0] == "error"]
        m = parsed.metadata
        assert m["manufacturer"] == "Garmin"
        assert m["fit_serial_number"] == "987654"
        assert m["fit_product_id"] == "4440"
        assert m["software_version"] == "9.75"
        assert m["model"] == "Forerunner 965"
        # survives convert (FIT -> FIT)
        from activity_files_ray.pipelines import convert as cv
        p2, _d = cv.convert_one(payload, "fit", "a")
        m2 = fit_mod.parse_fit(p2, "a").metadata
        assert m2["software_version"] == "9.75" and m2["model"] == "Forerunner 965"

    def test_sensor_device_info_does_not_overwrite(self):
        import struct
        body = bytearray()
        # head unit then a paired sensor (device_index 1)
        body += bytes([0x40, 0, 0, 23, 0, 3, 0, 1, 0x02, 2, 2, 0x84, 5, 2, 0x84])
        body += bytes([0x00, 0]) + struct.pack("<H", 1) + struct.pack("<H", 975)
        body += bytes([0x00, 1]) + struct.pack("<H", 32) + struct.pack("<H", 570)
        parsed = fit_mod.parse_fit(TestFitLossless._fit_file(bytes(body)), "a")
        assert parsed.metadata["manufacturer"] == "Garmin"
        assert parsed.metadata["software_version"] == "9.75"

    def test_file_creator_overwrites_version(self):
        import struct
        body = bytearray()
        body += bytes([0x40, 0, 0, 23, 0, 2, 0, 1, 0x02, 5, 2, 0x84])
        body += bytes([0x00, 0]) + struct.pack("<H", 975)
        body += bytes([0x41, 0, 0, 49, 0, 1, 0, 2, 0x84])
        body += bytes([0x01]) + struct.pack("<H", 2100)
        parsed = fit_mod.parse_fit(TestFitLossless._fit_file(bytes(body)), "a")
        assert parsed.metadata["software_version"] == "21"

    def test_version_formatting(self):
        assert fit_mod._format_sw_version(975) == "9.75"
        assert fit_mod._format_sw_version(570) == "5.7"
        assert fit_mod._format_sw_version(2100) == "21"
        assert fit_mod._format_sw_version(0) is None
        assert fit_mod._format_sw_version(None) is None


class TestFitMultiSessionSport:
    def test_first_session_sport_wins(self):
        # triathlon-style file: swim, bike, run sessions — activity
        # sport is the FIRST session's (fit_parser.dart:603-617);
        # each span still keeps its own sport
        pts = canonical_points()
        t = pts["ts_us"].astype("int64").tolist()
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 3,
                "kind": ["session"] * 3,
                "start_us": [t[0], t[1], t[2]],
                "end_us": [t[1], t[2], t[2] + 1_000_000],
                "sport": ["swimming", "cycling", "running"],
                "dist_m": [np.nan] * 3,
            }
        )
        payload = fit_mod.encode_fit(pts, None, spans=spans)
        parsed = fit_mod.parse_fit(payload, "a")
        assert parsed.sport == "swimming"
        sdf = parsed.spans_df()
        assert sdf[sdf["kind"] == "session"]["sport"].tolist() == [
            "swimming", "cycling", "running"
        ]

    def test_unmapped_sport_is_other(self):
        import struct
        body = bytearray()
        # session with sport 13 (not in the supported subset)
        body += bytes([0x40, 0, 0, 18, 0, 3, 2, 4, 0x86, 7, 4, 0x86, 5, 1, 0x00])
        body += bytes([0x00]) + struct.pack("<I", 1_000_000_000) + struct.pack("<I", 60_000) + bytes([13])
        parsed = fit_mod.parse_fit(TestFitLossless._fit_file(bytes(body)), "a")
        assert parsed.sport == "other"


class TestActivityJsonSerialization:
    """export_serialization.dart analog: whole-activity JSON
    round-trip (isolate-transport surface) is lossless."""

    def test_roundtrip_from_fit(self):
        from activity_files_ray.sources import model_json

        pts = canonical_points()
        t0, t2 = int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[2])
        spans = pd.DataFrame(
            {
                "activity_id": ["a"], "kind": ["lap"],
                "start_us": [t0], "end_us": [t2],
                "sport": ["running"], "dist_m": [1500.0],
                "avg_hr": [140.0],
                "extra_fields": ['{"22":480}'], "extra_arrays": [None],
            }
        )
        payload = fit_mod.encode_fit(
            pts, canonical_channels(), sport="running", spans=spans,
            manufacturer_id=1,
            device={"software_version": "9.75", "model": "FR"},
        )
        parsed = fit_mod.parse_fit(payload, "a1")
        rt = model_json.loads(model_json.dumps(parsed))
        pd.testing.assert_frame_equal(parsed.points_df(), rt.points_df())
        pd.testing.assert_frame_equal(parsed.channels_df(), rt.channels_df())
        pd.testing.assert_frame_equal(parsed.spans_df(), rt.spans_df())
        pd.testing.assert_frame_equal(parsed.diags_df(), rt.diags_df())
        assert rt.sport == parsed.sport and rt.metadata == parsed.metadata
        # double round-trip is string-stable
        assert model_json.dumps(rt) == model_json.dumps(parsed)

    def test_roundtrip_gpx_waypoints_routes(self):
        from activity_files_ray.sources import model_json

        pts = canonical_points()
        wps = [{"lat": 40.1, "lon": -105.2, "ele": 1700.0, "name": "summit"}]
        routes = [{"name": "r1", "points": [{"lat": 40.0, "lon": -105.0}]}]
        payload = gpx.encode_gpx(pts, None, waypoints=wps, routes=routes, name="x")
        parsed = gpx.parse_gpx(payload, "a1")
        rt = model_json.loads(model_json.dumps(parsed))
        assert rt.waypoints == parsed.waypoints
        assert rt.routes == parsed.routes
        assert rt.name == parsed.name
        assert rt.segment_starts == parsed.segment_starts


class TestGpxMetadataTrackExtensions:
    def test_lossless_roundtrip(self):
        xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
<metadata><extensions><vendor:color xmlns:vendor="urn:v" code="red">crimson</vendor:color></extensions></metadata>
<trk><name>n</name>
<extensions><vendor:effort xmlns:vendor="urn:v">7</vendor:effort></extensions>
<trkseg><trkpt lat="40.0" lon="-105.0"><time>2024-01-01T00:00:00Z</time></trkpt></trkseg>
</trk></gpx>"""
        import json
        parsed = gpx.parse_gpx(xml, "a1")
        meta = json.loads(parsed.metadata["gpx_meta_ext"])
        assert meta[0]["tag"] == "color" and meta[0]["text"] == "crimson"
        assert meta[0]["attrs"]["code"] == "red"
        trk = json.loads(parsed.metadata["gpx_trk_ext"])
        assert trk[0]["tag"] == "effort" and trk[0]["text"] == "7"
        # survives GPX->GPX convert
        from activity_files_ray.pipelines import convert as cv
        p2, _d = cv.convert_one(xml, "gpx", "a1")
        parsed2 = gpx.parse_gpx(p2, "a1")
        assert json.loads(parsed2.metadata["gpx_meta_ext"])[0]["text"] == "crimson"
        assert json.loads(parsed2.metadata["gpx_trk_ext"])[0]["text"] == "7"


class TestFitShortHeaderBuffer:
    def test_12_byte_buffer_claiming_14_byte_header(self):
        # fuzz-found: a 12-byte buffer whose header-size byte says 14
        # must diagnose, not raise
        data = bytes([14, 0x10, 0, 0, 0, 0, 0, 0]) + b".FIT"
        assert len(data) == 12
        parsed = fit_mod.parse_fit(data, "a")
        assert any(d[1] == "fit.header.too_short" for d in parsed.diags)


class TestGpxPointAttributes:
    def test_hdop_sat_fix_survive(self):
        # mirrors the reference's gpx_lossless_test: per-point GPS
        # quality attributes round-trip verbatim
        xml = b"""<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1">
  <trk><trkseg>
    <trkpt lat="40.0" lon="-105.0">
      <ele>1600</ele><time>2024-01-01T10:00:00Z</time>
      <hdop>0.9</hdop><sat>11</sat><fix>3d</fix>
    </trkpt>
    <trkpt lat="40.001" lon="-105.001">
      <time>2024-01-01T10:00:10Z</time><hdop>1.2</hdop>
    </trkpt>
  </trkseg></trk>
</gpx>"""
        parsed = gpx.parse_gpx(xml, "a1")
        assert parsed.point_attrs[0] == {"hdop": "0.9", "sat": "11", "fix": "3d"}
        assert parsed.point_attrs[1] == {"hdop": "1.2"}
        p2 = gpx.encode_gpx(parsed.points_df(), None)
        again = gpx.parse_gpx(p2, "a1")
        assert again.point_attrs == parsed.point_attrs
        # double round-trip byte-stable
        p3 = gpx.encode_gpx(again.points_df(), None)
        assert p2 == p3

    def test_waypoint_sym_survives(self):
        xml = b"""<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="40.1" lon="-105.2"><name>summit</name><sym>Summit</sym></wpt>
  <trk><trkseg>
    <trkpt lat="40.0" lon="-105.0"><time>2024-01-01T10:00:00Z</time></trkpt>
  </trkseg></trk>
</gpx>"""
        parsed = gpx.parse_gpx(xml, "a1")
        assert parsed.waypoints[0]["name"] == "summit"
        assert parsed.waypoints[0]["sym"] == "Summit"
        p2 = gpx.encode_gpx(parsed.points_df(), None, waypoints=parsed.waypoints)
        again = gpx.parse_gpx(p2, "a1")
        assert again.waypoints[0].get("sym") == "Summit"


class TestTcxLapIntensityTrigger:
    def test_intensity_trigger_roundtrip(self):
        # mirrors the reference's tcx_lossless_test
        xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<TrainingCenterDatabase xmlns="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v2">
<Activities><Activity Sport="Running"><Id>2024-07-21T06:00:00Z</Id>
<Lap StartTime="2024-07-21T06:00:00Z">
<TotalTimeSeconds>60</TotalTimeSeconds><DistanceMeters>200</DistanceMeters>
<Intensity>Active</Intensity><TriggerMethod>Manual</TriggerMethod>
<Track><Trackpoint><Time>2024-07-21T06:00:00Z</Time>
<Position><LatitudeDegrees>47.5</LatitudeDegrees><LongitudeDegrees>-122.2</LongitudeDegrees></Position>
</Trackpoint></Track></Lap></Activity></Activities>
</TrainingCenterDatabase>"""
        parsed = tcx.parse_tcx(xml, "a1")
        sdf = parsed.spans_df()
        assert sdf["tcx_intensity"].iloc[0] == "Active"
        assert sdf["tcx_trigger_method"].iloc[0] == "Manual"
        from activity_files_ray.pipelines import convert as cv
        p2, _d = cv.convert_one(xml, "tcx", "a1")
        again = tcx.parse_tcx(p2, "a1")
        s2 = again.spans_df()
        assert s2["tcx_intensity"].iloc[0] == "Active"
        assert s2["tcx_trigger_method"].iloc[0] == "Manual"


class TestGeojsonLosslessParity:
    """Mirrors the reference's geojson_lossless_test.dart."""

    def test_property_json_types_survive(self):
        j = b'''{"type":"Feature",
 "geometry":{"type":"LineString","coordinates":[[11.0,47.0,500],[11.001,47.001,501]]},
 "properties":{"activity_type":"running","notes":"Morning loop",
   "total_distance":"21849.097","temperature":7,"wind_speed":3.5,"indoor":false,
   "coordinateProperties":{"times":["2024-01-01T10:00:00Z","2024-01-01T10:00:10Z"]}}}'''
        p = geojson.parse_geojson(j, "a")
        assert p.metadata["notes"] == "Morning loop"
        assert p.metadata["total_distance"] == "21849.097"  # string kept
        assert p.metadata["temperature"] == 7 and isinstance(p.metadata["temperature"], int)
        assert p.metadata["wind_speed"] == 3.5
        assert p.metadata["indoor"] is False
        assert "coordinateProperties" not in p.metadata
        assert p.sport == "running"
        from activity_files_ray.pipelines import convert as cv
        out, _d = cv.convert_one(j, "geojson", "a")
        p2 = geojson.parse_geojson(out, "a")
        assert p2.metadata["temperature"] == 7
        assert p2.metadata["wind_speed"] == 3.5
        assert p2.metadata["total_distance"] == "21849.097"

    def test_polygon_exterior_with_holes(self):
        j = b'''{"type":"Feature","geometry":{"type":"Polygon","coordinates":[
 [[11.0,47.0],[11.001,47.0],[11.001,47.001],[11.0,47.0]],
 [[11.0005,47.0005],[11.0006,47.0005],[11.0005,47.0006]]]},
 "properties":{"activity_type":"hiking"}}'''
        p = geojson.parse_geojson(j, "a")
        assert len(p.ts_us) == 4  # exterior ring kept with epoch fallback
        assert p.sport == "hiking"
        assert any(d[1] == "geojson.polygon_holes_dropped" for d in p.diags)

    def test_shared_timestamp_property(self):
        j = b'''{"type":"Feature","geometry":{"type":"LineString",
 "coordinates":[[11.0,47.0],[11.001,47.001]]},
 "properties":{"timestamp":"2024-05-01T08:00:00Z"}}'''
        p = geojson.parse_geojson(j, "a")
        assert len(p.ts_us) == 2
        assert all(t == p.ts_us[0] for t in p.ts_us)
        assert p.ts_us[0] == 1714550400000000


class TestGeojsonChannelCollection:
    def test_unknown_numeric_props_as_custom_channels(self):
        # format_fidelity_test.dart: point features with timestamp +
        # custom numeric props -> built-in and custom channels
        j = (b'{"type":"FeatureCollection","features":[{"type":"Feature",'
             b'"geometry":{"type":"Point","coordinates":[9.0,48.0,300.0]},'
             b'"properties":{"timestamp":"2024-04-02T07:00:00Z","altitude":300.0,'
             b'"heart_rate":140,"core_temp":37.2}}]}')
        p = geojson.parse_geojson(j, "a")
        assert len(p.ts_us) == 1
        ch = p.channels_df()
        hr = ch[ch["channel"] == "heart_rate"]["value"]
        ct = ch[ch["channel"] == "core_temp"]["value"]
        assert hr.tolist() == [140.0] and ct.tolist() == [37.2]
        assert not (ch["channel"] == "altitude").any()  # metadata-only key

    def test_linestring_feature_props_become_channels(self):
        j = (b'{"type":"Feature","geometry":{"type":"LineString",'
             b'"coordinates":[[11.0,47.0],[11.001,47.001]]},'
             b'"properties":{"wind_speed":3.5,'
             b'"coordinateProperties":{"times":'
             b'["2024-01-01T10:00:00Z","2024-01-01T10:00:10Z"]}}}')
        p = geojson.parse_geojson(j, "a")
        ch = p.channels_df()
        ws = ch[ch["channel"] == "wind_speed"]
        assert len(ws) == 2 and set(ws["value"]) == {3.5}


class TestGpxUnknownTpxTags:
    def test_unknown_numeric_tpx_tag_is_custom_channel(self):
        # format_fidelity_test.dart: unknown numeric TPX tags become
        # custom channels; foreign nodes OUTSIDE the container are
        # preserved as extension trees; non-numeric TPX text diagnoses
        xml = b"""<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1"
     xmlns:gpxtpx="http://www.garmin.com/xmlschemas/TrackPointExtension/v1"
     xmlns:myext="urn:my">
<trk><trkseg>
<trkpt lat="47.0" lon="11.0"><time>2024-01-01T10:00:00Z</time>
<extensions>
  <gpxtpx:TrackPointExtension>
    <gpxtpx:hr>140</gpxtpx:hr>
    <gpxtpx:vertical_osc>8.5</gpxtpx:vertical_osc>
    <gpxtpx:label>abc</gpxtpx:label>
  </gpxtpx:TrackPointExtension>
  <myext:sensor quality="good">42</myext:sensor>
</extensions>
</trkpt>
</trkseg></trk></gpx>"""
        parsed = gpx.parse_gpx(xml, "a1")
        ch = parsed.channels_df()
        assert ch[ch["channel"] == "heart_rate"]["value"].tolist() == [140.0]
        assert ch[ch["channel"] == "vertical_osc"]["value"].tolist() == [8.5]
        assert any(d[1] == "gpx.extension.invalid_number" for d in parsed.diags)
        import json
        trees = json.loads(parsed.point_ext[0])
        assert trees[0]["tag"] == "sensor" and trees[0]["text"] == "42"
        assert trees[0]["attrs"]["quality"] == "good"


class TestTcxVersions:
    def test_parse_v1_payload(self):
        xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<TrainingCenterDatabase xmlns="http://www.garmin.com/xmlschemas/TrainingCenterDatabase/v1">
<Activities><Activity Sport="Running"><Id>2024-05-01T00:00:00Z</Id>
<Lap StartTime="2024-05-01T00:00:00Z"><TotalTimeSeconds>5.0</TotalTimeSeconds>
<Track><Trackpoint><Time>2024-05-01T00:00:00Z</Time>
<Position><LatitudeDegrees>40.0</LatitudeDegrees><LongitudeDegrees>-105.0</LongitudeDegrees></Position>
<HeartRateBpm><Value>140</Value></HeartRateBpm><Cadence>80</Cadence>
</Trackpoint></Track></Lap></Activity></Activities></TrainingCenterDatabase>"""
        assert detect.detect_format(xml) == "tcx"
        p = tcx.parse_tcx(xml, "a")
        assert not [d for d in p.diags if d[0] == "error"]
        assert len(p.ts_us) == 1
        ch = set(p.ch_name)
        assert {"heart_rate", "cadence"} <= ch

    def test_encode_v1_when_requested(self):
        pts = canonical_points()
        p1 = tcx.encode_tcx(pts, None, sport="running", version="1")
        assert b"TrainingCenterDatabase/v1" in p1
        again = tcx.parse_tcx(p1, "a")
        assert len(again.ts_us) == 3 and again.sport == "running"


class TestGpxTpxV2Fields:
    def test_all_v2_fields_roundtrip(self):
        # gpx_extensions_test.dart: the full v2 TPX set round-trips
        pts = canonical_points().head(1)
        t0 = int(pts["ts_us"].iloc[0])
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 6,
                "channel": ["heart_rate", "water_temperature", "depth",
                            "course", "bearing", "speed"],
                "ts_us": [t0] * 6,
                "value": [140.0, 15.0, 5.5, 45.0, 90.0, 3.5],
            }
        )
        payload = gpx.encode_gpx(pts, ch)
        assert b"gpxtpx:wtemp" in payload and b"gpxtpx:course" in payload
        assert b"TrackPointExtension/v2" in payload
        parsed = gpx.parse_gpx(payload, "a")
        cdf = parsed.channels_df().set_index("channel")["value"]
        assert cdf["water_temperature"] == 15.0
        assert cdf["depth"] == 5.5
        assert cdf["course"] == 45.0
        assert cdf["bearing"] == 90.0
        assert cdf["speed"] == 3.5


class TestCsvSportColumn:
    def test_sport_column_roundtrip(self):
        csvb = (b"timestamp,latitude,longitude,sport\n"
                b"2024-01-01T10:00:00Z,40.0,-105.0,cycling\n"
                b"2024-01-01T10:00:10Z,40.0005,-105.0005,cycling\n")
        p = csv_fmt.parse_csv(csvb, "a")
        assert p.sport == "cycling" and len(p.ts_us) == 2
        assert not any(c == "sport" for c in p.ch_name)
        out = csv_fmt.encode_csv(p.points_df(), None, sport=p.sport)
        assert b",sport" in out.splitlines()[0]
        again = csv_fmt.parse_csv(out, "a")
        assert again.sport == "cycling"
        # convert carries it through CSV->CSV
        from activity_files_ray.pipelines import convert as cv
        out2, _d = cv.convert_one(csvb, "csv", "a")
        assert csv_fmt.parse_csv(out2, "a").sport == "cycling"


class TestFitMultiSessionDiag:
    def test_multi_session_info_diagnostic(self):
        pts = canonical_points()
        t = pts["ts_us"].astype("int64").tolist()
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 2, "kind": ["session"] * 2,
                "start_us": [t[0], t[1]], "end_us": [t[1], t[2]],
                "sport": ["swimming", "cycling"], "dist_m": [np.nan] * 2,
            }
        )
        parsed = fit_mod.parse_fit(fit_mod.encode_fit(pts, None, spans=spans), "a")
        assert any(d[1] == "fit.multi_session" and d[0] == "info" for d in parsed.diags)
        single = fit_mod.parse_fit(fit_mod.encode_fit(pts, None), "a")
        assert not any(d[1] == "fit.multi_session" for d in single.diags)


class TestTcxMultiActivityDiag:
    def test_multi_activity_info(self):
        pts = canonical_points()
        t = pts["ts_us"].astype("int64").tolist()
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 2, "kind": ["lap"] * 2,
                "start_us": [t[0], t[1]], "end_us": [t[1], t[2]],
                "sport": ["running", "cycling"],  # two sport groups → two Activities
                "dist_m": [100.0, 200.0],
            }
        )
        payload = tcx.encode_tcx(pts, None, spans)
        parsed = tcx.parse_tcx(payload, "a")
        assert any(d[1] == "tcx.multi_activity" and d[0] == "info" for d in parsed.diags)
        single = tcx.parse_tcx(tcx.encode_tcx(pts, None, sport="running"), "a")
        assert not any(d[1] == "tcx.multi_activity" for d in single.diags)


class TestGpxExtensionNamespaces:
    def test_namespace_uri_survives_roundtrip(self):
        # URI (not prefix) is the XML-semantic identity of a foreign
        # node; it now survives parse -> tree -> encode -> parse
        xml = b"""<?xml version="1.0"?>
<gpx version="1.1" xmlns="http://www.topografix.com/GPX/1/1" xmlns:myext="urn:my">
<trk><trkseg>
<trkpt lat="47.0" lon="11.0"><time>2024-01-01T10:00:00Z</time>
<extensions><myext:sensor quality="good">42</myext:sensor></extensions>
</trkpt>
</trkseg></trk></gpx>"""
        import json
        p1 = gpx.parse_gpx(xml, "a")
        t1 = json.loads(p1.point_ext[0])
        assert t1[0]["ns"] == "urn:my" and t1[0]["tag"] == "sensor"
        out = gpx.encode_gpx(p1.points_df(), None)
        assert b'xmlns="urn:my"' in out
        p2 = gpx.parse_gpx(out, "a")
        t2 = json.loads(p2.point_ext[0])
        assert t2 == t1
        # double round-trip byte-stable
        assert gpx.encode_gpx(p2.points_df(), None) == out


class TestGpxVersions:
    def test_parse_gpx10_and_encode_when_requested(self):
        # gpx_version_test.dart parity: 1.0 namespace parses; encoder
        # emits 1.0 on request and round-trips
        xml = b"""<?xml version="1.0"?>
<gpx version="1.0" xmlns="http://www.topografix.com/GPX/1/0">
<trk><trkseg>
<trkpt lat="47.0" lon="11.0"><ele>1600</ele><time>2024-01-01T10:00:00Z</time></trkpt>
<trkpt lat="47.001" lon="11.001"><time>2024-01-01T10:00:10Z</time></trkpt>
</trkseg></trk></gpx>"""
        assert detect.detect_format(xml) == "gpx"
        p = gpx.parse_gpx(xml, "a")
        assert len(p.ts_us) == 2 and not [d for d in p.diags if d[0] == "error"]
        out = gpx.encode_gpx(p.points_df(), None, version="1.0")
        assert b'version="1.0"' in out and b"GPX/1/0" in out
        again = gpx.parse_gpx(out, "a")
        assert len(again.ts_us) == 2
        assert gpx.encode_gpx(again.points_df(), None, version="1.0") == out


class TestFitTruncatedDevFieldDefinition:
    def test_truncated_dev_field_list_diagnoses(self):
        import struct
        # definition with dev-data bit and a dev-field list that runs
        # past the end of the data section: must emit the precise
        # fit.definition.truncated diagnostic, not a generic internal
        # error (advisor finding)
        body = bytearray()
        body += bytes([0x60, 0, 0]) + struct.pack("<H", 20) + bytes([1])
        body += bytes([253, 4, 0x86])   # one regular field
        body += bytes([2])              # claims TWO dev fields...
        body += bytes([0, 8, 0])        # ...but only one fits
        payload = TestFitLossless._fit_file(bytes(body))
        # strip the trailing CRC so the dev list truncates mid-stream
        parsed = fit_mod.parse_fit(payload[: 14 + len(body) - 1], "a")
        assert any(d[1] == "fit.definition.truncated" for d in parsed.diags)
        assert not any(d[1] == "parse.internal_error" for d in parsed.diags)


class TestNearestJoinTieBreak:
    def test_halfway_tie_takes_later_sample(self):
        # channel_mapper.dart:199-211: the >=-target candidate is
        # considered first and survives equal deltas
        pt = np.array([5_000_000], dtype=np.int64)
        st = np.array([0, 10_000_000], dtype=np.int64)
        sv = np.array([1.0, 2.0])
        out = gpx.nearest_join(pt, st, sv, tolerance_us=5_000_000)
        assert out[0] == 2.0


class TestGpxExtensionNodeBuilders:
    """facade:913-1010 analogs: label / device / deviceSummary
    builders produce ext trees that encode + reparse losslessly."""

    def test_label_node_roundtrip(self):
        import json

        from activity_files_ray import fixtures

        pts = fixtures.canonical_trackpoints().to_pandas()
        pts["ts_us"] = pts["ts_us"].astype("int64")
        node = gpx.gpx_activity_label_node("Morning Ride", attributes={"kind": "tag"})
        assert node["ns"] == gpx.GPX_DEFAULT_EXT_NAMESPACE
        payload = gpx.encode_gpx(pts, None, meta_ext=[node])
        parsed = gpx.parse_gpx(payload, "a1")
        got = json.loads(parsed.metadata["gpx_meta_ext"])[0]
        assert got["tag"] == "activity" and got["text"] == "Morning Ride"
        assert got["attrs"]["kind"] == "tag"
        assert got["ns"] == gpx.GPX_DEFAULT_EXT_NAMESPACE

    def test_device_node_children_order_and_skips(self):
        import datetime as dtm

        node = gpx.gpx_device_node(
            {
                "manufacturer": "garmin",
                "model": "edge",
                "serial_number": 123,
                "software_version": None,  # skipped
                "fit_manufacturer_id": 1,
            },
            extras={"calibrated": dtm.datetime(2024, 1, 2, 3, 4, 5)},
        )
        tags = [c["tag"] for c in node["children"]]
        # reference child order: manufacturer, model, product,
        # serialNumber, softwareVersion, fitManufacturerId,
        # fitProductId, then extras
        assert tags == ["manufacturer", "model", "serialNumber",
                        "fitManufacturerId", "calibrated"]
        assert node["children"][-1]["text"] == "2024-01-02T03:04:05Z"

    def test_device_summary_roundtrip(self):
        import json

        from activity_files_ray import fixtures

        pts = fixtures.canonical_trackpoints().to_pandas()
        pts["ts_us"] = pts["ts_us"].astype("int64")
        node = gpx.gpx_device_summary_node({"manufacturer": "wahoo", "model": "bolt"})
        payload = gpx.encode_gpx(pts, None, trk_ext=[node])
        parsed = gpx.parse_gpx(payload, "a1")
        got = json.loads(parsed.metadata["gpx_trk_ext"])[0]
        assert got["tag"] == "deviceSummary"
        assert [c["text"] for c in got["children"]] == ["wahoo", "bolt"]
