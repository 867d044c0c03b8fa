"""The engine's logical table schemas (SURVEY.md §1.2 mapping).

One ``ray.data.Dataset`` per logical table; blocks are
``pyarrow.Table`` with these schemas. Open escape hatches mirror the
reference's losslessness design (custom channels = open dictionary
values; ``metadata`` maps; ``ext`` JSON), SURVEY §1.1.
"""

from __future__ import annotations

import pyarrow as pa

# corpus input (BASELINE.json input_hint) — also fixtures.IMAGES_SCHEMA
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

TRACKPOINTS = pa.schema(
    [
        ("activity_id", pa.string()),
        ("seq", pa.int32()),
        ("ts_us", pa.timestamp("us")),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("ele", pa.float64()),  # nullable; NaN = absent
    ]
)

CHANNELS = pa.schema(  # long form (SURVEY §1.2: joins stay native)
    [
        ("activity_id", pa.string()),
        ("channel", pa.string()),  # dictionary-encoded in blocks
        ("ts_us", pa.timestamp("us")),
        ("value", pa.float64()),
    ]
)

SPANS = pa.schema(  # laps / sets / events / lengths / sessions
    [
        ("activity_id", pa.string()),
        ("kind", pa.string()),
        ("start_us", pa.timestamp("us")),
        ("end_us", pa.timestamp("us")),
        ("sport", pa.string()),
        ("dist_m", pa.float64()),
    ]
)

ACTIVITIES = pa.schema(
    [
        ("activity_id", pa.string()),
        ("fmt", pa.string()),
        ("sport", pa.string()),
        ("creator", pa.string()),
        ("name", pa.string()),
        ("n_points", pa.int64()),
        ("n_samples", pa.int64()),
        ("n_diags", pa.int64()),
    ]
)

DIAGNOSTICS = pa.schema(  # parse_result.dart:69-100 shape
    [
        ("activity_id", pa.string()),
        ("severity", pa.string()),  # error | warning | info
        ("code", pa.string()),
        ("message", pa.string()),
        ("path", pa.string()),
    ]
)

REGIONS = pa.schema(
    [
        ("region_id", pa.string()),
        ("name", pa.string()),
        ("ring", pa.list_(pa.struct([("lat", pa.float64()), ("lon", pa.float64())]))),
    ]
)

POIS = pa.schema(
    [
        ("poi_id", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
        ("category", pa.string()),
    ]
)

TILES = pa.schema(  # raster→vector tiling output
    [
        ("image_id", pa.string()),
        ("cell", pa.int64()),
        ("n_px", pa.int64()),
    ]
)

METRICS = pa.schema(
    [
        ("stage", pa.string()),
        ("partition", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)
