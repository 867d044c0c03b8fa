"""Spatially-partitioned layout: pruned read == full scan, pruning
actually prunes, partition boundaries lose nothing. The registered
query's DuckDB oracle runs in test_queries_oracle."""

import shutil

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.spatial import layout


def _pts(n=3000, seed=9):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "lat_cd": rng.randint(-7000, 7000, n).astype(np.int64),
            "lon_cd": rng.randint(-18000, 18000, n).astype(np.int64),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestSpatialLayout:
    def test_pruned_read_equals_full_scan_and_prunes(self, tmp_path):
        import ray.data as rd

        pdf = _pts()
        out = str(tmp_path / "geo")
        parts = layout.spatial_write(rd.from_pandas(pdf), out, prefix_level=3)
        assert len(parts) > 8  # data spans many partitions
        bbox_la, bbox_lo = (1000, 3000), (-6000, -1000)
        ds, hit, tot = layout.spatial_read_bbox(out, bbox_la, bbox_lo, 3)
        got = (
            ds.select_columns(["event_id"]).to_pandas()["event_id"]
            .sort_values().reset_index(drop=True)
        )
        m = pdf[
            pdf["lat_cd"].between(*bbox_la) & pdf["lon_cd"].between(*bbox_lo)
        ]
        want = m["event_id"].sort_values().reset_index(drop=True)
        pd.testing.assert_series_equal(got.astype("int64"), want.astype("int64"))
        assert 0 < hit < tot  # the read genuinely pruned partitions

    def test_boundary_points_survive_partitioning(self, tmp_path):
        # points exactly ON the bbox edge and ON a prefix-cell border
        import ray.data as rd

        pdf = pd.DataFrame(
            {
                "event_id": np.arange(4, dtype=np.int64),
                "lat_cd": np.array([1000, 3000, 2250, 0], dtype=np.int64),
                "lon_cd": np.array([-6000, -1000, -4500, 0], dtype=np.int64),
            }
        )
        out = str(tmp_path / "geo2")
        layout.spatial_write(rd.from_pandas(pdf), out, prefix_level=3)
        ds, hit, tot = layout.spatial_read_bbox(out, (1000, 3000), (-6000, -1000), 3)
        got = sorted(ds.select_columns(["event_id"]).to_pandas()["event_id"])
        assert got == [0, 1, 2]

    def test_empty_bbox_returns_none_without_reading(self, tmp_path):
        import ray.data as rd

        pdf = _pts(200)
        pdf = pdf[pdf["lat_cd"] > 0]  # nothing in the south
        out = str(tmp_path / "geo3")
        layout.spatial_write(rd.from_pandas(pdf), out, prefix_level=3)
        ds, hit, tot = layout.spatial_read_bbox(out, (-7000, -6500), (0, 100), 3)
        assert ds is None and hit == 0 and tot > 0


@pytest.mark.usefixtures("ray_session")
class TestSpatialWriteGuards:
    """r5: stale-partition guard + overwrite flag + projection prune."""

    def test_refuses_stale_partitions_then_overwrites(self, tmp_path):
        import ray.data as rd

        pdf = _pts(500)
        out = str(tmp_path / "geo")
        layout.spatial_write(rd.from_pandas(pdf), out, prefix_level=3)
        with pytest.raises(FileExistsError, match="pcell"):
            layout.spatial_write(rd.from_pandas(pdf.head(10)), out, prefix_level=3)
        # overwrite replaces, never merges: read must see ONLY the new rows
        layout.spatial_write(
            rd.from_pandas(pdf.head(10)), out, prefix_level=3, overwrite=True
        )
        ds, _, _ = layout.spatial_read_bbox(out, (-9000, 9000), (-18000, 18000), 3)
        assert ds.count() == 10

    def test_columns_pruning_projects_and_filters(self, tmp_path):
        import ray.data as rd

        pdf = _pts(800)
        pdf["payload"] = "x" * 32  # fat column the projection must drop
        out = str(tmp_path / "geo")
        layout.spatial_write(rd.from_pandas(pdf), out, prefix_level=3)
        bbox_la, bbox_lo = (0, 4000), (-9000, 0)
        ds, hit, tot = layout.spatial_read_bbox(
            out, bbox_la, bbox_lo, 3, columns=["event_id"]
        )
        got = ds.to_pandas()
        assert list(got.columns) == ["event_id"]
        m = pdf[
            pdf.lat_cd.between(*bbox_la) & pdf.lon_cd.between(*bbox_lo)
        ]
        assert sorted(got["event_id"]) == sorted(m["event_id"])
