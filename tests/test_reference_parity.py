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
    # 3 spans since round 2: the session message has no start_time
    # field, so it was silently dropped pre-fix; its window now
    # derives from timestamp(253) like the reference's duration-only
    # ActivitySummary
    (f"{ASSETS}/sample.fit", "fit", 6,
     {"cadence", "distance", "heart_rate", "power", "speed", "temperature"}, 3, "running"),
    (f"{ASSETS}/synthetic/clean_run.gpx", "gpx", 100, {"cadence", "heart_rate"}, 0, "running"),
    (f"{ASSETS}/synthetic/clean_run.tcx", "tcx", 100,
     {"cadence", "distance", "heart_rate"}, 1, "running"),
    (f"{ASSETS}/synthetic/clean_run.fit", "fit", 100, {"cadence", "heart_rate"}, 1, "running"),
    (f"{REAL}/sample.gpx", "gpx", 6,
     {"cadence", "depth", "heart_rate", "power", "speed", "temperature"}, 0, "cycling"),
    (f"{REAL}/sample.tcx", "tcx", 7, {"cadence", "distance", "heart_rate"}, 2, "cycling"),
    (f"{REAL}/sample.fit", "fit", 6,
     {"cadence", "distance", "heart_rate", "power", "speed", "temperature"}, 3, "running"),
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


def test_fit_device_metadata_parity():
    """Device metadata resolved from the reference's own FIT samples
    through the public manufacturer table (fit_parser.dart:517-556):
    manufacturer id 1 -> 'Garmin', creator string shape 'FIT Device
    <name> p<product>'."""
    from activity_files_ray.sources import stage

    for f in (f"{ASSETS}/sample.fit", f"{REAL}/sample.fit"):
        p = stage.parse_payload(open(f, "rb").read(), "x", "fit")
        assert p.metadata["manufacturer"] == "Garmin"
        assert p.metadata["fit_manufacturer_id"] == "1"
        assert p.creator == "FIT Device Garmin p1"


def test_fit_compressed_speed_distance_ground_truth():
    """Byte sequences + expected values lifted from the reference's
    own CSD test (test/parsers/fit_compressed_speed_distance_test.dart
    — ground truth from python-fitparse on a real Garmin file)."""
    import struct

    from activity_files_ray.sources import fit as fit_mod

    def build(records: list[list[int]]) -> bytes:
        body = bytearray()
        body += bytes([0x40, 0, 0]) + struct.pack("<H", 20) + bytes([2])
        body += bytes([0xFD, 4, 0x86]) + bytes([0x08, 3, 0x0D])
        for i, rec in enumerate(records):
            body += bytes([0x00]) + struct.pack("<I", 1_000_000_000 + i) + bytes(rec)
        header = struct.pack("<BBHI4s", 14, 0x10, 2140, len(body), b".FIT")
        header += struct.pack("<H", fit_mod.crc16(header))
        blob = header + bytes(body)
        return blob + struct.pack("<H", fit_mod.crc16(blob))

    p = fit_mod.parse_fit(build([[98, 1, 0], [99, 65, 14], [0, 224, 18]]), "a")
    ch = p.channels_df()
    speed = ch[ch["channel"] == "speed"].sort_values("ts_us")["value"].tolist()
    dist = ch[ch["channel"] == "distance"].sort_values("ts_us")["value"].tolist()
    assert speed == pytest.approx([3.54, 3.55, 0.0], abs=1e-9)
    assert dist == pytest.approx([0.0, 14.25, 18.875], abs=1e-9)
    assert not (ch["channel"] == "fit_field_8").any()

    # all-0xFF record is invalid and leaves the accumulator untouched
    p2 = fit_mod.parse_fit(build([[0xFF, 0xFF, 0xFF], [98, 1, 0]]), "a")
    ch2 = p2.channels_df()
    assert ch2[ch2["channel"] == "speed"]["value"].tolist() == pytest.approx([3.54], abs=1e-9)
    assert ch2[ch2["channel"] == "distance"]["value"].tolist() == pytest.approx([0.0], abs=1e-9)


def test_fit_manufacturer_table_parity():
    """Spot-check entries + cardinality against the reference's own
    manufacturer-table test (test/parsers/fit_manufacturer_test.dart)."""
    from activity_files_ray.sources import fit_profile as fp

    assert fp.MANUFACTURERS[1] == "Garmin"
    assert fp.MANUFACTURERS[32] == "Wahoo Fitness"
    assert fp.MANUFACTURERS[260] == "Zwift"
    assert fp.MANUFACTURERS[123] == "Polar Electro"
    assert fp.MANUFACTURERS[268] == "SRAM"
    assert fp.MANUFACTURERS[289] == "Hammerhead"
    assert fp.MANUFACTURERS[281] == "TrainerRoad"
    assert fp.MANUFACTURERS[63] == "Specialized"
    assert fp.MANUFACTURERS[69] == "Stages Cycling"
    assert fp.MANUFACTURERS[89] == "Tacx"
    assert fp.MANUFACTURERS[100] == "Campagnolo SRL"
    assert fp.MANUFACTURERS[255] == "Development"
    assert len(fp.MANUFACTURERS) == 179


def _fit_wrap(body: bytes) -> bytes:
    import struct

    from activity_files_ray.sources import fit as fit_mod

    header = struct.pack("<BBHI4s", 14, 0x10, 2140, len(body), b".FIT")
    header += struct.pack("<H", fit_mod.crc16(header))
    blob = header + body
    return blob + struct.pack("<H", fit_mod.crc16(blob))


def test_fit_definition_robustness_parity():
    """Mirrors the reference's robustness cases
    (test/parsers/fit_definition_robustness_test.dart): a 100-field
    session must not derail the record stream and still captures
    unknown fields; a uint16 ARRAY field must not misalign fields
    decoded after it."""
    import struct

    from activity_files_ray.sources import fit as fit_mod
    from activity_files_ray.sources.model import loads_extras

    base = 365_000_000
    body = bytearray()
    # record def local 0: timestamp, lat, lon
    body += bytes([0x40, 0, 0]) + struct.pack("<H", 20) + bytes([3])
    body += bytes([253, 4, 0x86, 0, 4, 0x85, 1, 4, 0x85])

    def rec(ts):
        return (bytes([0x00]) + struct.pack("<I", ts)
                + struct.pack("<i", 400000000) + struct.pack("<i", -1000000000))

    for i in range(3):
        body += rec(base + i)
    # session def local 1, global 18, 100 fields
    body += bytes([0x41, 0, 0]) + struct.pack("<H", 18) + bytes([100])
    body += bytes([253, 4, 0x86, 9, 4, 0x86, 14, 2, 0x84])
    for f in range(100, 197):
        body += bytes([f, 1, 0x02])
    body += bytes([0x01]) + struct.pack("<I", base) + struct.pack("<I", 500000)
    body += struct.pack("<H", 3000)
    for f in range(100, 197):
        body += bytes([42 if f == 150 else 0xFF])
    for i in range(3, 6):
        body += rec(base + i)
    parsed = fit_mod.parse_fit(_fit_wrap(bytes(body)), "a")
    assert len(parsed.ts_us) == 6  # records before AND after survive
    sdf = parsed.spans_df()
    sess = sdf[sdf["kind"] == "session"].iloc[0]
    assert sess["dist_m"] == pytest.approx(5000.0, abs=0.01)
    assert sess["avg_speed"] == pytest.approx(3.0, abs=0.001)
    assert loads_extras(sess["extra_fields"])[150] == 42.0

    # array field before scalar fields must not misalign them
    body2 = bytearray()
    body2 += bytes([0x40, 0, 0]) + struct.pack("<H", 18) + bytes([4])
    body2 += bytes([253, 4, 0x86, 120, 4, 0x84, 14, 2, 0x84, 9, 4, 0x86])
    body2 += (bytes([0x00]) + struct.pack("<I", base)
              + struct.pack("<H", 100) + struct.pack("<H", 200)
              + struct.pack("<H", 3000) + struct.pack("<I", 500000))
    parsed2 = fit_mod.parse_fit(_fit_wrap(bytes(body2)), "a")
    sdf2 = parsed2.spans_df()
    sess2 = sdf2[sdf2["kind"] == "session"].iloc[0]
    assert sess2["avg_speed"] == pytest.approx(3.0, abs=0.001)
    assert sess2["dist_m"] == pytest.approx(5000.0, abs=0.01)
    from activity_files_ray.sources.model import loads_extras as le
    assert le(sess2["extra_arrays"])[120] == [100.0, 200.0]
