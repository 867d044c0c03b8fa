"""activity_files_ray — a Ray-Data-native geospatial data-processing engine.

A from-scratch re-expression of the capabilities of the reference
``thecloudseeker/activity_files`` package (activity-file parse /
normalize / validate / transform / encode) as streaming
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, extended with the spatial-join + tiling core mandated by
BASELINE.json: vectorized lat/lng→cell encoding, point-in-polygon
joins with cell-prefix pre-filtering, kNN POI matching via cell-ring
expansion, and raster↔vector tiling with salted skew-safe aggregation.

Nothing here is a port: the reference (pure Dart, single file in
memory at a time) defines WHAT is computed; this package re-derives
HOW on Ray Data for a fixed-size multi-node cluster at 100 TB scale.

Layout:
  functions/  pure vectorized kernels (geo math, cell index, text,
              hashing, imaging codecs)
  sources/    format parser / encoder batch kernels (GPX, TCX, CSV,
              GeoJSON, FIT) + format detection
  stages/     normalize / edit / validate stages (map_batches and
              groupby().map_groups kernels)
  spatial/    the new spatial core (cell encode, PIP join, kNN,
              raster tiling)
  pipelines/  end-to-end composed pipelines (convert, dedup incl.
              exact substring/paragraph spans and exact set-similarity
              joins (AllPairs) for trajectory/route matching, text
              analysis, ANN search incl. IVF-PQ, BPE tokenizer
              training, global sorted export, deterministic sampling)
  state/      checkpoint manifests, lineage, per-stage metrics
  fixtures.py deterministic synthetic tables (images+captions,
              trackpoints, channels, regions, POIs) — seeded, no RNG
              at pipeline time
"""

__version__ = "0.1.0"
