"""Property-based tests (hypothesis): invariants that must hold for
ARBITRARY inputs, beyond the fixture oracles — the robustness layer
the reference lacks (SURVEY §5: "No property-based testing")."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from activity_files_ray.functions import cells, geo
from activity_files_ray.sources import gpx, stage
from activity_files_ray.stages import normalize as nz

finite_lat = st.floats(-89.99, 89.99, allow_nan=False, width=64)
finite_lon = st.floats(-179.99, 179.99, allow_nan=False, width=64)


def _points_df(ts, lat, lon):
    n = len(ts)
    return pd.DataFrame(
        {
            "activity_id": ["a"] * n,
            "seq": np.arange(n, dtype=np.int32),
            "ts_us": np.asarray(ts, dtype=np.int64),
            "lat": np.asarray(lat, dtype=np.float64),
            "lon": np.asarray(lon, dtype=np.float64),
            "ele": np.zeros(n),
        }
    )


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2_000_000_000_000),
            finite_lat,
            finite_lon,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sort_dedup_idempotent_and_ordered(rows):
    df = _points_df(*(list(x) for x in zip(*rows)))
    once = nz.sort_and_dedup(df)
    twice = nz.sort_and_dedup(once)
    assert once["ts_us"].is_monotonic_increasing
    assert not once["ts_us"].duplicated().any()
    pd.testing.assert_frame_equal(once, twice)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**12), finite_lat, finite_lon),
        min_size=1,
        max_size=25,
        unique_by=lambda r: r[0],
    )
)
def test_gpx_roundtrip_arbitrary_tracks(rows):
    rows = sorted(rows)
    df = _points_df(*(list(x) for x in zip(*rows)))
    # encoder rounds to 7 decimals; quantize input the same way so the
    # round-trip comparison is exact
    df["lat"] = df["lat"].round(7)
    df["lon"] = df["lon"].round(7)
    payload = gpx.encode_gpx(df, None)
    parsed = gpx.parse_gpx(payload, "a")
    got = parsed.points_df()
    assert len(got) == len(df)
    np.testing.assert_array_equal(got["ts_us"].to_numpy(), df["ts_us"].to_numpy())
    np.testing.assert_allclose(got["lat"], df["lat"], atol=5e-8)
    np.testing.assert_allclose(got["lon"], df["lon"], atol=5e-8)
    # and the byte-stability form
    assert gpx.encode_gpx(got, None) == payload


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(finite_lat, finite_lon), min_size=1, max_size=50))
def test_cell_ids_within_bounds_and_stable(pts):
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    cid = cells.cell_id(lat, lon, 15)
    assert (cid >= 0).all()
    ix, iy = cells.xy_from_cell_id(cid)
    assert (ix < (1 << 15)).all() and (iy < (1 << 15)).all()
    # center of a cell maps back to the same cell
    clat, clon = cells.cell_center(cid, 15)
    np.testing.assert_array_equal(cells.cell_id(clat, clon, 15), cid)


@settings(max_examples=50, deadline=None)
@given(
    st.tuples(finite_lat, finite_lon),
    st.tuples(finite_lat, finite_lon),
)
def test_haversine_symmetric_nonnegative(a, b):
    d1 = geo.haversine_m(np.array([a[0]]), np.array([a[1]]), np.array([b[0]]), np.array([b[1]]))[0]
    d2 = geo.haversine_m(np.array([b[0]]), np.array([b[1]]), np.array([a[0]]), np.array([a[1]]))[0]
    assert d1 >= 0
    assert abs(d1 - d2) <= 1e-6 * max(1.0, d1)
    assert d1 <= np.pi * geo.EARTH_RADIUS_M + 1


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_parsers_never_throw_on_garbage(data):
    parsed = stage.parse_payload(data, "fuzz")
    assert parsed.diags  # always diagnosed, never raised
    for fmt in ("gpx", "tcx", "csv", "geojson", "fit"):
        p = stage.parse_payload(data, "fuzz", fmt)
        assert isinstance(p.diags, list)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=2, max_size=20),
    st.integers(1, 500),
    st.integers(501, 999),
)
def test_span_rules_preserve_order_and_bounds(ts, lo, hi):
    s = np.array(sorted(ts)[:-1], dtype=np.int64)
    e = np.array(sorted(ts)[1:], dtype=np.int64)
    ns, ne, keep = nz.clip_spans_delete_range(s, e, lo, hi)
    assert (ne[keep] >= ns[keep]).all()
    ns2, ne2, keep2 = nz.shift_spans_remove_pause(s, e, lo, hi)
    assert (ne2[keep2] > ns2[keep2]).all()
    ns3, ne3 = nz.shift_spans_insert_pause(s, e, lo, 100)
    assert (ne3 >= ns3).all()


def test_mutation_fuzz_parsers_never_throw():
    """Deterministic mutation fuzz: flip/truncate/splice bytes of VALID
    payloads in every format; parse must never raise (never-throw
    contract under near-valid corruption, the hardest fuzz regime)."""
    from activity_files_ray import fixtures

    pts = fixtures.canonical_trackpoints().to_pandas()
    pts["ts_us"] = pts["ts_us"].astype("int64")
    ch = fixtures.canonical_channels().to_pandas().astype({"channel": str})
    ch["ts_us"] = ch["ts_us"].astype("int64")
    from activity_files_ray.sources import csv_fmt, geojson as gj, gpx as gp, tcx as tc
    from activity_files_ray.sources import fit as fm

    import pandas as pd

    t0, t2 = int(pts["ts_us"].iloc[0]), int(pts["ts_us"].iloc[2])
    rich_spans = pd.DataFrame(
        {
            # spans with extras/length stats so the round-2 FIT paths
            # (shared extras layouts, device_info, swim stats) are in
            # the fuzz corpus — this corpus found the 12-byte-buffer/
            # 14-byte-header crash
            "activity_id": ["a"] * 3,
            "kind": ["lap", "session", "length"],
            "start_us": [t0, t0, t0],
            "end_us": [t2, t2, t2],
            "sport": ["running"] * 3,
            "dist_m": [100.0, 100.0, np.nan],
            "avg_hr": [140.0, 141.0, np.nan],
            "extra_fields": ['{"22":480}', '{"34":87}', None],
            "extra_arrays": ['{"57":[1,2,3]}', None, None],
            "total_strokes": [np.nan, np.nan, 18.0],
            "is_active": [np.nan, np.nan, 1.0],
        }
    )
    pts_attrs = pts.copy()
    pts_attrs["attrs"] = ['{"fix":"3d","hdop":"0.9","sat":"11"}'] + [None] * (len(pts) - 1)
    base = {
        "gpx": gp.encode_gpx(
            pts_attrs, ch,
            meta_ext=[{"tag": "color", "text": "red"}],
            trk_ext=[{"tag": "effort", "text": "7"}],
            waypoints=[{"lat": 40.1, "lon": -105.2, "name": "w", "sym": "Summit"}],
        ),
        "tcx": tc.encode_tcx(pts, ch, notes="n1", author="a1"),
        "csv": csv_fmt.encode_csv(pts, ch),
        "geojson": gj.encode_geojson(pts, ch, mode="points"),
        "fit": fm.encode_fit(
            pts, ch, spans=rich_spans, manufacturer_id=1,
            device={"software_version": "9.75", "model": "FR"},
        ),
    }
    rng = np.random.default_rng(1234)
    for fmt, payload in base.items():
        for trial in range(200):
            data = bytearray(payload)
            op = trial % 4
            if op == 0:  # flip 1-4 bytes
                for _ in range(int(rng.integers(1, 5))):
                    data[int(rng.integers(0, len(data)))] ^= int(rng.integers(1, 256))
            elif op == 1:  # truncate
                data = data[: int(rng.integers(0, len(data)))]
            elif op == 2:  # splice random garbage
                at = int(rng.integers(0, len(data)))
                data = data[:at] + bytes(rng.integers(0, 256, 8, dtype=np.uint8)) + data[at:]
            else:  # duplicate a slice
                a = int(rng.integers(0, len(data)))
                b = min(len(data), a + int(rng.integers(1, 64)))
                data = data[:a] + data[a:b] + data[a:]
            parsed = stage.parse_payload(bytes(data), f"fz_{fmt}_{trial}", fmt)
            assert isinstance(parsed.diags, list)  # reached without raising


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**12), finite_lat, finite_lon),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_tcx_roundtrip_arbitrary_tracks(rows):
    from activity_files_ray.sources import tcx

    rows = sorted(rows)
    df = _points_df(*(list(x) for x in zip(*rows)))
    df["lat"] = df["lat"].round(7)
    df["lon"] = df["lon"].round(7)
    payload = tcx.encode_tcx(df, None, sport="running")
    parsed = tcx.parse_tcx(payload, "a")
    got = parsed.points_df()
    assert len(got) == len(df)
    np.testing.assert_array_equal(got["ts_us"].to_numpy(), df["ts_us"].to_numpy())
    np.testing.assert_allclose(got["lat"], df["lat"], atol=5e-8)
    np.testing.assert_allclose(got["lon"], df["lon"], atol=5e-8)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(1, 100),
    st.randoms(use_true_random=False),
)
def test_prefix_filter_theorem_set_jaccard(xs, ys, tau_pct, rnd):
    """The AllPairs prefix-filter invariant behind
    dedup.set_jaccard_pairs: under ANY consistent total order, two
    sets with 100·|A∩B| ≥ τ·|A∪B| must share a token within each
    other's first n − ceil(τ·n/100) + 1 tokens."""
    a = np.unique(np.asarray(xs, dtype=np.int64))
    b = np.unique(np.asarray(ys, dtype=np.int64))
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    if 100 * inter < tau_pct * union:
        return  # not a qualifying pair
    # arbitrary consistent total order = random global permutation
    perm = list(range(42))
    rnd.shuffle(perm)
    rank = np.asarray(perm, dtype=np.int64)

    def prefix(s):
        n = len(s)
        pref_len = n - (-(-tau_pct * n // 100)) + 1
        order = np.argsort(rank[s], kind="stable")
        return set(s[order[:pref_len]].tolist())

    assert prefix(a) & prefix(b), (
        "qualifying pair with disjoint prefixes — filter would miss it"
    )
