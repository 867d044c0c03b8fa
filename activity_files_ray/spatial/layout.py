"""Spatially-partitioned storage layout: hive partitions keyed by the
coarse prefix cell, so spatial range queries PRUNE AT THE READ — the
geo twin of the cluster-partitioned IVF layout (`ann.ivf_write` /
`ivf_read_topk`, SCALE.md §6) and the layout a 100 TB point corpus
actually sits in (one directory per coarse cell; a bbox query lists
the covering cells and reads only those directories' files, never
scanning the corpus and filtering).

Partition level guidance: pick the level where one cell's data is a
few parquet files (level 3 → 64 world partitions is right for the
test tables; a 100 TB corpus wants level 6-8 → 4k-65k partitions so
a city-scale bbox touches single-digit directories). Writes are also
the RESUMABLE shape — a failed run re-lists the partition dirs it
already finished.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..functions import cells


def spatial_write(
    pts_ds,
    out_dir: str,
    prefix_level: int,
    lat_cd_col: str = "lat_cd",
    lon_cd_col: str = "lon_cd",
    overwrite: bool = False,
) -> list[int]:
    """One streaming pass: tag each point with its prefix cell and
    write hive-partitioned parquet (``pcell=<id>/``). Returns the
    non-empty partition cells.

    ``out_dir`` holding previous ``pcell=*`` partitions is an ERROR
    unless ``overwrite=True`` (which removes the old partition dirs
    first) — silently merging two corpora would poison later
    ``spatial_read_bbox`` results. Resume semantics stay explicit:
    a resuming caller passes the same dir with ``overwrite=False``
    only after removing the incomplete partitions itself."""
    stale = (
        [d for d in os.listdir(out_dir) if d.startswith("pcell=")]
        if os.path.isdir(out_dir)
        else []
    )
    if stale:
        if not overwrite:
            raise FileExistsError(
                f"spatial_write: {out_dir} already holds {len(stale)} "
                "pcell=* partitions; pass overwrite=True to replace them"
            )
        import shutil

        for d in stale:
            shutil.rmtree(os.path.join(out_dir, d))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        la = df[lat_cd_col].to_numpy(np.int64)
        lo = df[lon_cd_col].to_numpy(np.int64)
        out = df.copy()
        out["pcell"] = cells.cell_id(la / 100.0, lo / 100.0, prefix_level)
        return out

    pts_ds.map_batches(tag, batch_format="pandas", batch_size=None).write_parquet(
        out_dir, partition_cols=["pcell"]
    )
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("pcell=")
    )


def spatial_read_bbox(
    out_dir: str,
    lat_cd_range: tuple[int, int],
    lon_cd_range: tuple[int, int],
    prefix_level: int,
    lat_cd_col: str = "lat_cd",
    lon_cd_col: str = "lon_cd",
    columns: list[str] | None = None,
):
    """Read ONLY the partitions whose prefix cell intersects the
    (inclusive, integer-centidegree) bbox, then apply the exact
    predicate inside ``map_batches``. ``columns`` prunes the read
    projection too (the lat/lon predicate columns are added
    automatically) — essential when the partitioned rows are fat
    (image bytes). Returns (dataset, n_partitions_read,
    n_partitions_total) so callers/tests can pin that pruning
    actually happened."""
    import ray.data as rd

    la0, la1 = lat_cd_range
    lo0, lo1 = lon_cd_range
    cover = set(
        cells.covering_cells_bbox(
            la0 / 100.0, la1 / 100.0, lo0 / 100.0, lo1 / 100.0, prefix_level
        ).tolist()
    )
    parts = [d for d in sorted(os.listdir(out_dir)) if d.startswith("pcell=")]
    hit = [d for d in parts if int(d.split("=", 1)[1]) in cover]
    paths = []
    for d in hit:
        full = os.path.join(out_dir, d)
        paths.extend(
            os.path.join(full, f)
            for f in sorted(os.listdir(full))
            if f.endswith(".parquet")
        )
    if not paths:
        return None, 0, len(parts)

    def exact(df: pd.DataFrame) -> pd.DataFrame:
        la = df[lat_cd_col].to_numpy(np.int64)
        lo = df[lon_cd_col].to_numpy(np.int64)
        out = df[(la >= la0) & (la <= la1) & (lo >= lo0) & (lo <= lo1)]
        return out[columns] if columns is not None else out

    read_cols = (
        sorted({*columns, lat_cd_col, lon_cd_col}) if columns is not None else None
    )
    ds = rd.read_parquet(paths, columns=read_cols).map_batches(
        exact, batch_format="pandas", batch_size=None
    )
    return ds, len(hit), len(parts)
