"""Normalize/edit/validate kernel tests against hand-computed oracles
(mirrors the reference's unit layer: raw_editor_test.dart,
raw_transforms_test.dart, validation_test.dart — SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.stages import normalize as nz
from activity_files_ray.stages import validate as vd


def _pts(ts, lat=None, lon=None, ele=None, aid="a1"):
    n = len(ts)
    return pd.DataFrame(
        {
            "activity_id": [aid] * n,
            "seq": np.arange(n, dtype=np.int32),
            "ts_us": np.asarray(ts, dtype=np.int64),
            "lat": lat if lat is not None else np.full(n, 40.0),
            "lon": lon if lon is not None else np.full(n, -105.0),
            "ele": ele if ele is not None else np.full(n, 1600.0),
        }
    )


class TestSortDedup:
    def test_sorts_chronologically(self):
        df = _pts([30, 10, 20])
        out = nz.sort_and_dedup(df)
        assert out["ts_us"].tolist() == [10, 20, 30]

    def test_duplicate_last_wins(self):
        df = _pts([10, 20, 20, 30], lat=np.array([1.0, 2.0, 3.0, 4.0]))
        out = nz.sort_and_dedup(df)
        assert out["ts_us"].tolist() == [10, 20, 30]
        assert out["lat"].tolist() == [1.0, 3.0, 4.0]  # last wins


class TestTrimInvalid:
    def test_drops_and_clears(self):
        df = _pts(
            [1, 2, 3, 4, 5],
            lat=np.array([40.0, 91.0, 0.0, np.nan, 41.0]),
            lon=np.array([-105.0, 0.0, 0.0, 0.0, -105.0]),
            ele=np.array([1600.0, 0.0, 0.0, 0.0, -500.0]),
        )
        out, stats = nz.trim_invalid(df)
        assert out["ts_us"].tolist() == [1, 5]  # 91 out-of-range, null island, NaN dropped
        assert stats["dropped_out_of_range"] == 1
        assert stats["dropped_null_island"] == 1
        assert stats["dropped_nonfinite"] == 1
        assert stats["cleared_elevation"] == 1
        assert np.isnan(out["ele"].iloc[1])  # sentinel cleared, point kept


class TestEdits:
    def test_crop_inclusive(self):
        out = nz.crop(_pts([1, 2, 3, 4]), 2, 3)
        assert out["ts_us"].tolist() == [2, 3]

    def test_shift_time(self):
        out = nz.shift_time(_pts([1, 2]), 100)
        assert out["ts_us"].tolist() == [101, 102]

    def test_delete_range_inclusive(self):
        out = nz.delete_range(_pts([1, 2, 3, 4]), 2, 3)
        assert out["ts_us"].tolist() == [1, 4]

    def test_insert_pause(self):
        out = nz.insert_pause(_pts([10, 20, 30]), 15, 100)
        assert out["ts_us"].tolist() == [10, 120, 130]

    def test_remove_pause(self):
        # delete strictly inside (10, 30); shift >=30 back by 20
        out = nz.remove_pause(_pts([5, 10, 20, 30, 40]), 10, 30)
        assert out["ts_us"].tolist() == [5, 10, 10, 20]

    def test_span_rules_delete_range(self):
        s = np.array([0, 10, 25, 35, 5], dtype=np.int64)
        e = np.array([5, 20, 30, 40, 40], dtype=np.int64)
        ns, ne, keep = nz.clip_spans_delete_range(s, e, 12, 32)
        # span (10,20): tail overlap -> end=12; (25,30): covered -> drop
        # (35,40): untouched; (5,40): strictly contains range -> original
        assert keep.tolist() == [True, True, False, True, True]
        assert ns.tolist()[1] == 10 and ne.tolist()[1] == 12
        assert ns.tolist()[4] == 5 and ne.tolist()[4] == 40

    def test_span_rules_insert_pause(self):
        s = np.array([0, 20, 5], dtype=np.int64)
        e = np.array([5, 30, 30], dtype=np.int64)
        ns, ne = nz.shift_spans_insert_pause(s, e, 10, 100)
        assert (ns.tolist(), ne.tolist()) == ([0, 120, 5], [5, 130, 130])

    def test_span_rules_remove_pause(self):
        s = np.array([0, 12, 40, 0, 15], dtype=np.int64)
        e = np.array([5, 18, 50, 50, 45], dtype=np.int64)
        ns, ne, keep = nz.shift_spans_remove_pause(s, e, 10, 30)
        # (12,18) inside pause -> zero duration dropped
        assert keep.tolist() == [True, False, True, True, True]
        assert ns[2] == 20 and ne[2] == 30  # shifted back by gap
        assert ns[3] == 0 and ne[3] == 30  # tail shifted
        assert ns[4] == 10 and ne[4] == 25  # clipped head + shifted end


class TestDownsample:
    def test_time_keeps_first_last(self):
        df = _pts([0, 1_000_000, 2_000_000, 9_000_000, 9_500_000])
        out = nz.downsample_time(df, 5.0)
        assert out["ts_us"].tolist() == [0, 9_000_000, 9_500_000]

    def test_distance(self):
        lat = np.array([40.0, 40.0001, 40.01, 40.0101])
        df = _pts([0, 1, 2, 3], lat=lat)
        out = nz.downsample_distance(df, 500.0)
        # 0->1 is ~11m (skip), 0->2 is ~1.1km (keep); last always kept
        assert out["ts_us"].tolist() == [0, 2, 3]


class TestSmoothResample:
    def test_moving_average(self):
        v = np.array([0.0, 10.0, 20.0, 30.0, 40.0])
        out = nz.smooth_moving_average(v, 1)
        assert out.tolist() == [5.0, 10.0, 20.0, 30.0, 35.0]

    def test_recompute_distance_speed(self):
        df = _pts([0, 5_000_000, 10_000_000],
                  lat=np.array([40.0, 40.0005, 40.0010]),
                  lon=np.array([-105.0, -105.0005, -105.0010]))
        out = nz.recompute_distance_speed(df)
        assert out["distance_m"].iloc[0] == 0.0
        assert out["distance_m"].iloc[2] == pytest.approx(140.07, abs=0.1)
        assert out["speed_mps"].iloc[1] == pytest.approx(70.04 / 5, abs=0.05)

    def test_recompute_auto_sorts(self):
        df = _pts([10_000_000, 0], lat=np.array([40.0010, 40.0]))
        out = nz.recompute_distance_speed(df)
        assert out["ts_us"].tolist() == [0, 10_000_000]

    def test_resample_grid_plus_exact_end(self):
        df = _pts([0, 10_000_000, 23_000_000],
                  lat=np.array([0.0, 1.0, 2.3]),
                  lon=np.array([0.0, -1.0, -2.3]))
        out = nz.resample(df, 10.0)
        assert out["ts_us"].tolist() == [0, 10_000_000, 20_000_000, 23_000_000]
        assert out["lat"].tolist() == pytest.approx([0.0, 1.0, 2.0, 2.3])


class TestValidate:
    def test_order_diagnostics(self):
        df = _pts([30, 10, 10, 4_000_000_000])
        d = vd.validate_points_group(df)
        codes = set(d["code"])
        assert "validation.points.out_of_order" in codes
        assert "validation.points.duplicate_timestamp" in codes
        assert "validation.points.gap" in codes

    def test_coordinate_diagnostics(self):
        df = _pts([1, 2], lat=np.array([91.0, 40.0]), lon=np.array([0.0, -181.0]))
        d = vd.validate_points_group(df)
        codes = set(d["code"])
        assert "validation.coordinate.latitude" in codes
        assert "validation.coordinate.longitude" in codes

    def test_clean_track_no_diags(self):
        df = _pts([1, 2, 3])
        assert len(vd.validate_points_group(df)) == 0

    def test_channel_diagnostics(self):
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 7,
                "channel": ["heart_rate"] * 3 + ["distance"] * 3 + ["power"],
                "ts_us": [1, 2, 3, 1, 2, 3, 1],
                "value": [10.0, 150.0, 300.0, 5.0, 3.0, -1.0, -5.0],
            }
        )
        d = vd.validate_channels_group(ch)
        codes = set(d["code"])
        assert "validation.channel.heart_rate_range" in codes
        assert "validation.channel.distance_decrease" in codes
        assert "validation.channel.negative_distance" in codes
        assert "validation.channel.negative_power" in codes
        assert "validation.channel.single_sample" in codes

    def test_coverage_window(self):
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 3,
                "channel": ["cadence"] * 3,
                "ts_us": [0, 50, 200],
                "value": [80.0, 81.0, 82.0],
            }
        )
        d = vd.validate_channels_group(ch, track_window=(10, 100))
        codes = set(d["code"])
        assert "validation.channel.samples_before_track" in codes
        assert "validation.channel.samples_after_track" in codes

    def test_lap_diagnostics(self):
        spans = pd.DataFrame(
            {
                "activity_id": ["a"] * 3,
                "kind": ["lap"] * 3,
                "start_us": [0, 100, 90],
                "end_us": [50, 80, 200],
            }
        )
        d = vd.validate_spans_group(spans, track_window=(10, 150))
        codes = set(d["code"])
        assert "validation.laps.inverted_times" in codes
        assert "validation.laps.out_of_order" in codes
        assert "validation.laps.extends_before_points" in codes
        assert "validation.laps.extends_after_points" in codes


@pytest.mark.usefixtures("ray_session")
class TestDatasetWrappers:
    def test_normalize_points_dataset(self):
        import ray.data as rd

        dirty = pd.DataFrame(
            {
                "activity_id": ["a", "a", "a", "b"],
                "seq": np.arange(4, dtype=np.int32),
                "ts_us": np.array([20, 10, 10, 5], dtype=np.int64),
                "lat": [40.0, 40.0, 91.0, 41.0],
                "lon": [-105.0, -105.0, 0.0, -106.0],
                "ele": [1600.0, 1601.0, 0.0, -500.0],
            }
        )
        out = nz.normalize_points(rd.from_pandas(dirty)).to_pandas()
        a = out[out.activity_id == "a"]
        # reference order is sortAndDedup THEN trimInvalid
        # (facade:591-646): last-wins keeps the later (invalid) ts=10
        # point, which trimInvalid then drops
        assert a["ts_us"].tolist() == [20]
        b = out[out.activity_id == "b"]
        assert np.isnan(b["ele"].iloc[0])


class TestLargestContiguousGroup:
    def test_keeps_biggest_cluster_and_trims_endpoint_spike(self):
        df = pd.DataFrame(
            {
                "activity_id": "a",
                "seq": np.arange(6, dtype=np.int32),
                "ts_us": np.array(
                    [0] + [200 * 86400 * 10**6 + i * 5_000_000 for i in range(5)],
                    dtype=np.int64,
                ),
                "lat": [10.0, 40.0, 40.001, 40.002, 40.003, 85.0],
                "lon": [10.0, -105.0, -105.0, -105.0, -105.0, 100.0],
                "ele": 0.0,
            }
        )
        out = nz.largest_contiguous_group(df)
        # stray ancient point dropped (cluster split), endpoint GPS
        # spike (>100km jump) trimmed
        assert out["lat"].tolist() == [40.0, 40.001, 40.002, 40.003]
        assert out["seq"].tolist() == [0, 1, 2, 3]

    def test_clean_track_untouched(self):
        df = pd.DataFrame(
            {
                "activity_id": "a",
                "seq": np.arange(3, dtype=np.int32),
                "ts_us": np.array([0, 5_000_000, 10_000_000], dtype=np.int64),
                "lat": [40.0, 40.001, 40.002],
                "lon": [-105.0, -105.0, -105.0],
                "ele": 0.0,
            }
        )
        out = nz.largest_contiguous_group(df)
        assert len(out) == 3


class TestDeviceValidation:
    def test_clean(self):
        assert len(vd.validate_device({"manufacturer": "garmin", "fit_manufacturer_id": 1})) == 0

    def test_violations(self):
        d = vd.validate_device(
            {"manufacturer": "acme", "fit_manufacturer_id": 1,
             "fit_product_id": 0, "model": " "}
        )
        codes = set(d["code"])
        assert "validation.device.blank_model" in codes
        assert "validation.device.fit_product_id_range" in codes
        assert "validation.device.name_id_mismatch" in codes


class TestPointEditsAndSnapshot:
    def test_insert_update_delete(self):
        df = _pts([10, 30])
        df2 = nz.insert_point(df, {"seq": 0, "ts_us": 20, "lat": 41.0, "lon": -106.0, "ele": 0.0})
        assert df2["ts_us"].tolist() == [10, 20, 30]
        df3 = nz.update_point(df2, 0, ts_us=25)
        assert df3["ts_us"].tolist() == [20, 25, 30]  # re-sorted
        df4 = nz.delete_point_at(df3, 1)
        assert df4["ts_us"].tolist() == [20, 30]
        assert nz.delete_point_at(df4, 99).equals(df4)  # no-op

    def test_channel_snapshot(self):
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 4,
                "channel": ["heart_rate", "heart_rate", "power", "power"],
                "ts_us": [0, 10_000_000, 0, 10_000_000],
                "value": [140.0, 150.0, 200.0, 220.0],
            }
        )
        snap = nz.channel_snapshot(ch, 9_000_000)
        assert snap == {"heart_rate": 150.0, "power": 220.0}
        assert nz.channel_snapshot(ch, 100_000_000) == {}  # out of tolerance

    def test_resample_channels_rules(self):
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 6,
                "channel": ["power"] * 3 + ["heart_rate"] * 3,
                "ts_us": [0, 10_000_000, 20_000_000] * 2,
                "value": [200.0, 220.0, 240.0, 140.0, 150.0, 160.0],
            }
        )
        grid = np.array([0, 5_000_000, 10_000_000, 20_000_000], dtype=np.int64)
        out = nz.resample_channels(ch, grid, step_s=10.0)
        pw = out[out.channel == "power"].set_index("ts_us")["value"]
        assert pw.loc[5_000_000] == 210.0  # linear interp
        hr = out[out.channel == "heart_rate"].set_index("ts_us")["value"]
        assert hr.loc[5_000_000] in (140.0, 150.0)  # nearest within step/2
        assert hr.loc[0] == 140.0


class TestFilterChannelsToTimes:
    def test_keeps_samples_near_retained_points(self):
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 5,
                "channel": ["heart_rate"] * 5,
                "ts_us": np.array([0, 4_000_000, 10_000_000, 14_500_000, 30_000_000], dtype=np.int64),
                "value": [1.0, 2.0, 3.0, 4.0, 5.0],
            }
        )
        kept = np.array([0, 10_000_000, 20_000_000], dtype=np.int64)
        out = nz.filter_channels_to_times(ch, kept, tolerance_us=5_000_000)
        # 0 (exact), 4s (within 5s of 0), 10s (exact), 14.5s (within 5s
        # of 10s); 30s is 10s from nearest retained → dropped
        assert out["value"].tolist() == [1.0, 2.0, 3.0, 4.0]

    def test_empty_kept_drops_all(self):
        ch = pd.DataFrame(
            {"activity_id": ["a"], "channel": ["hr"],
             "ts_us": np.array([5], dtype=np.int64), "value": [1.0]}
        )
        out = nz.filter_channels_to_times(ch, np.array([], dtype=np.int64), 10)
        assert len(out) == 0


class TestClipSpansCrop:
    def test_crop_clamps_and_drops(self):
        s = np.array([0, 50, 120, 300], dtype=np.int64)
        e = np.array([40, 150, 200, 400], dtype=np.int64)
        ns, ne, keep = nz.clip_spans_crop(s, e, 100, 250)
        # span0 fully before -> dropped; span1 clamps head; span2
        # inside unchanged; span3 fully after -> dropped
        assert keep.tolist() == [False, True, True, False]
        assert ns[keep].tolist() == [100, 120]
        assert ne[keep].tolist() == [150, 200]


class TestSmoothChannelTotalWindow:
    def test_even_window_is_asymmetric(self):
        v = np.array([0.0, 10.0, 20.0, 30.0, 40.0, 50.0])
        out = nz.smooth_channel(v, 4)  # left=1, right=2
        # i=2: mean(v[1..4]) = (10+20+30+40)/4 = 25
        assert out[2] == pytest.approx(25.0)
        # i=0: clamped to [0..2] = (0+10+20)/3
        assert out[0] == pytest.approx(10.0)
        # i=5: clamped to [4..5] = 45
        assert out[5] == pytest.approx(45.0)

    def test_odd_window_matches_halfwidth_form(self):
        rng = np.random.default_rng(3)
        v = rng.standard_normal(50)
        np.testing.assert_allclose(
            nz.smooth_channel(v, 5), nz.smooth_moving_average(v, 2)
        )

    def test_window_one_unchanged(self):
        v = np.array([1.0, 2.0, 3.0])
        np.testing.assert_array_equal(nz.smooth_channel(v, 1), v)


class TestResampleChannelEdges:
    def test_head_extrapolates_tail_clamps(self):
        # transform_utils.dart:35-72: a grid time before the channel's
        # first sample extrapolates from the first segment; past the
        # last sample clamps to the last value
        ch = pd.DataFrame(
            {
                "activity_id": ["a"] * 2,
                "channel": ["power"] * 2,
                "ts_us": np.array([10_000_000, 20_000_000], dtype=np.int64),
                "value": [100.0, 200.0],
            }
        )
        grid = np.array([0, 10_000_000, 15_000_000, 30_000_000], dtype=np.int64)
        out = nz.resample_channels(ch, grid, step_s=5.0)
        got = out.set_index("ts_us")["value"]
        assert got[0] == pytest.approx(0.0)        # extrapolated head
        assert got[10_000_000] == pytest.approx(100.0)
        assert got[15_000_000] == pytest.approx(150.0)
        assert got[30_000_000] == pytest.approx(200.0)  # clamped tail


class TestResampleElevationNulls:
    def test_missing_endpoint_takes_other(self):
        # transform_utils.dart:178-189: null + value -> value; both
        # null -> null; both -> lerp
        df = pd.DataFrame(
            {
                "activity_id": ["a"] * 4,
                "seq": np.arange(4, dtype=np.int32),
                "ts_us": np.array([0, 10_000_000, 20_000_000, 30_000_000], dtype=np.int64),
                "lat": [40.0, 40.1, 40.2, 40.3],
                "lon": [-105.0, -105.1, -105.2, -105.3],
                "ele": [1000.0, np.nan, np.nan, 1300.0],
            }
        )
        out = nz.resample(df, 5.0)
        got = out.set_index("ts_us")["ele"]
        assert got[0] == pytest.approx(1000.0)
        assert got[5_000_000] == pytest.approx(1000.0)   # NaN upper -> lower
        assert np.isnan(got[15_000_000])                  # both NaN
        assert got[25_000_000] == pytest.approx(1300.0)   # NaN lower -> upper
        assert got[30_000_000] == pytest.approx(1300.0)
        # exact sample times keep their values
        assert got[10_000_000] == pytest.approx(1000.0) or np.isnan(got[10_000_000])
