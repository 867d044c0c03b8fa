"""Golden parity: OUR parsers over the REFERENCE repo's own sample
activity files (the reference's real-file regression layer,
``/root/reference/test/integration/real_files_test.dart:13-60``).
Read-only access to /root/reference — no code is taken, only inputs.
"""

import os

import numpy as np
import pytest

from activity_files_ray.sources import detect, stage

ASSETS = "/root/reference/example/assets"
REAL = "/root/reference/test/fixtures/real_world"

CASES = [
    # (path, fmt, n_points, channels-subset, n_spans, sport)
    (f"{ASSETS}/sample.gpx", "gpx", 6,
     {"cadence", "depth", "heart_rate", "power", "speed", "temperature"}, 0, "cycling"),
    (f"{ASSETS}/sample.tcx", "tcx", 7, {"cadence", "distance", "heart_rate"}, 2, "cycling"),
    (f"{ASSETS}/sample.fit", "fit", 6,
     {"cadence", "distance", "heart_rate", "power", "speed", "temperature"}, 2, "running"),
    (f"{ASSETS}/synthetic/clean_run.gpx", "gpx", 100, {"cadence", "heart_rate"}, 0, "running"),
    (f"{ASSETS}/synthetic/clean_run.tcx", "tcx", 100,
     {"cadence", "distance", "heart_rate"}, 1, "running"),
    (f"{ASSETS}/synthetic/clean_run.fit", "fit", 100, {"cadence", "heart_rate"}, 0, "running"),
    (f"{REAL}/sample.gpx", "gpx", 6,
     {"cadence", "depth", "heart_rate", "power", "speed", "temperature"}, 0, "cycling"),
    (f"{REAL}/sample.tcx", "tcx", 7, {"cadence", "distance", "heart_rate"}, 2, "cycling"),
    (f"{REAL}/sample.fit", "fit", 6,
     {"cadence", "distance", "heart_rate", "power", "speed", "temperature"}, 2, "running"),
]


@pytest.mark.parametrize("path,fmt,n_pts,chans,n_spans,sport", CASES)
def test_reference_sample_parses(path, fmt, n_pts, chans, n_spans, sport):
    if not os.path.exists(path):
        pytest.skip(f"reference asset missing: {path}")
    data = open(path, "rb").read()
    assert detect.detect_format(data) == fmt
    parsed = stage.parse_payload(data, os.path.basename(path))
    assert len(parsed.ts_us) == n_pts
    assert chans <= set(parsed.ch_name)
    assert len(parsed.span_kind) == n_spans
    assert parsed.sport == sport
    assert not [d for d in parsed.diags if d[0] == "error"], parsed.diags
    # coordinates plausible + chronological
    pts = parsed.points_df()
    assert pts["lat"].abs().max() <= 90 and pts["lon"].abs().max() <= 180
    assert np.all(np.diff(pts["ts_us"].to_numpy(np.int64)) >= 0)


def test_cross_format_consistency_of_reference_samples():
    """The reference's three sample formats describe the same ride —
    our parsers must agree across formats on the shared trackpoints
    (conversion-matrix consistency, conversion_test.dart analog)."""
    if not os.path.exists(f"{ASSETS}/sample.gpx"):
        pytest.skip("assets missing")
    g = stage.parse_payload(open(f"{ASSETS}/sample.gpx", "rb").read(), "g")
    t = stage.parse_payload(open(f"{ASSETS}/sample.tcx", "rb").read(), "t")
    gp, tp = g.points_df(), t.points_df()
    merged = gp.merge(tp, on="ts_us", suffixes=("_g", "_t"))
    assert len(merged) >= 5
    np.testing.assert_allclose(merged["lat_g"], merged["lat_t"], atol=1e-6)
    np.testing.assert_allclose(merged["lon_g"], merged["lon_t"], atol=1e-6)


def test_clean_run_roundtrip_through_our_encoders():
    """Parse the reference's 100-point GPX, re-encode with OUR
    encoders in every format, re-parse: points survive."""
    path = f"{ASSETS}/synthetic/clean_run.gpx"
    if not os.path.exists(path):
        pytest.skip("assets missing")
    parsed = stage.parse_payload(open(path, "rb").read(), "cr")
    pts = parsed.points_df()
    ch = parsed.channels_df()
    for fmt in ("gpx", "tcx", "csv", "geojson", "fit"):
        payload = stage.encode_activity(fmt, pts, ch)
        re = stage.parse_payload(payload, "re", fmt)
        assert len(re.ts_us) == 100, fmt
        rp = re.points_df()
        np.testing.assert_allclose(rp["lat"], pts["lat"], atol=1e-6, err_msg=fmt)
        np.testing.assert_array_equal(
            rp["ts_us"].to_numpy(np.int64), pts["ts_us"].to_numpy(np.int64)
        )
