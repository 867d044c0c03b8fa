"""Geo-bucketed image near-dup (`multimodal.geo_phash_near_dup`):
semantic brute-force parity, distributed==driver-fold clusters, and
fixture sanity (the planted variants actually cross cell boundaries
and force a transitive closure)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from activity_files_ray import fixtures
from activity_files_ray.functions import cells, imaging
from activity_files_ray.pipelines import multimodal

MAX_HAMMING = 6


def _features(t):
    """(image_id, phash, ix, iy) straight from the same single-source
    functions the pipeline uses — the brute-force side."""
    ids, ph, lats, lons = [], [], [], []
    for image_id, payload, caption in zip(
        t["image_id"].to_pylist(), t["bytes"].to_pylist(), t["caption"].to_pylist()
    ):
        ids.append(image_id)
        ph.append(imaging.ahash64(imaging.decode_image(payload)))
        lat_min, lon_min, lat_max, lon_max = fixtures.parse_caption_bbox(caption)
        lats.append((lat_min + lat_max) * 0.5)
        lons.append((lon_min + lon_max) * 0.5)
    ix, iy = cells.cell_xy(np.asarray(lats), np.asarray(lons), cells.LEVEL_TILE)
    return ids, np.asarray(ph, np.int64), ix, iy


def _brute_clusters(ids, ph, ix, iy):
    """All-pairs semantic predicate + union-find (min-member label)."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    u = ph.view(np.uint64)
    n = len(ids)
    in_pair = set()
    for i in range(n):
        for j in range(i + 1, n):
            if abs(int(ix[i] - ix[j])) <= 1 and abs(int(iy[i] - iy[j])) <= 1:
                if bin(int(u[i] ^ u[j])).count("1") <= MAX_HAMMING:
                    union(ids[i], ids[j])
                    in_pair.add(ids[i])
                    in_pair.add(ids[j])
    members = sorted(in_pair)
    return pd.DataFrame(
        {"image_id": members, "cluster_id": [find(m) for m in members]}
    )


@pytest.fixture(scope="module")
def geo_table():
    return fixtures.make_geo_images(120, seed=11)


@pytest.mark.usefixtures("ray_session")
class TestGeoPhashNearDup:
    def test_matches_brute_force(self, geo_table):
        t = geo_table.select(["image_id", "bytes", "caption"])
        clusters, pairs = multimodal.geo_phash_near_dup(
            rd.from_arrow(t), max_hamming=MAX_HAMMING
        )
        got = (
            (clusters.to_pandas() if hasattr(clusters, "to_pandas") else clusters)
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        want = _brute_clusters(*_features(geo_table))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # no pair is ever double-counted by the min-home ownership rule
        p = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
        assert not p.duplicated(["a", "b"]).any()

    def test_distributed_clusters_match_fold(self, geo_table):
        t = geo_table.select(["image_id", "bytes", "caption"])
        fold, _ = multimodal.geo_phash_near_dup(
            rd.from_arrow(t), max_hamming=MAX_HAMMING, distributed_clusters=False
        )
        dist, _ = multimodal.geo_phash_near_dup(
            rd.from_arrow(t), max_hamming=MAX_HAMMING, distributed_clusters=True
        )
        assert isinstance(dist, rd.Dataset)  # never a driver frame
        dist_df = dist.to_pandas().sort_values("image_id").reset_index(drop=True)
        fold_df = fold.sort_values("image_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(dist_df, fold_df, check_dtype=False)

    def test_planted_structure(self, geo_table):
        """The fixture must actually exercise what it claims: at least
        one verified pair spans two DIFFERENT cells, and at least one
        cluster has 3+ members (the v2 chain → transitive closure)."""
        ids, ph, ix, iy = _features(geo_table)
        pos = {d: k for k, d in enumerate(ids)}
        clusters = _brute_clusters(ids, ph, ix, iy)
        assert len(clusters) > 0
        sizes = clusters.groupby("cluster_id").size()
        assert sizes.max() >= 3
        cross = False
        u = ph.view(np.uint64)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if (
                    abs(int(ix[i] - ix[j])) <= 1
                    and abs(int(iy[i] - iy[j])) <= 1
                    and bin(int(u[i] ^ u[j])).count("1") <= MAX_HAMMING
                    and (ix[i] != ix[j] or iy[i] != iy[j])
                ):
                    cross = True
        assert cross, "no planted pair crosses a cell boundary"
