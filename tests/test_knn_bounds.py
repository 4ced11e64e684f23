"""kNN / DBSCAN under custom per-dimension index bounds (projected CRS).

The reference parametrizes every index over any CRS
(SpatialDimensionalityTypeProvider.java:107-124); round 4 wired custom
bounds through the joins — these tests extend the guarantee to the
cell-ring kNN and DBSCAN: results in a metre-unit UTM-like frame must
match a numpy brute-force oracle exactly, and the ring must clamp (not
wrap) at the frame edge.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import dbscan as DB
from geowave_spark.operators import knn as KNN

BOUNDS = (200_000.0, 4_000_000.0, 800_000.0, 4_600_000.0)  # UTM-ish metres


def _points(n, seed):
    rng = np.random.RandomState(seed)
    x = BOUNDS[0] + (BOUNDS[2] - BOUNDS[0]) * rng.rand(n)
    y = BOUNDS[1] + (BOUNDS[3] - BOUNDS[1]) * rng.rand(n)
    return x, y


@pytest.fixture(scope="module")
def frames(spark):
    px, py = _points(2_000, 11)
    qx, qy = _points(40, 13)
    pts = spark.createDataFrame(
        [(int(i), float(px[i]), float(py[i])) for i in range(len(px))],
        ["image_id", "lon", "lat"],
    )
    qs = spark.createDataFrame(
        [(int(i), float(qx[i]), float(qy[i]), 5, 30_000.0) for i in range(len(qx))],
        ["query_id", "lon", "lat", "k", "max_distance"],
    )
    return pts, (px, py), qs, (qx, qy)


def test_knn_bounds_matches_bruteforce(spark, frames):
    pts, (px, py), qs, (qx, qy) = frames
    out = KNN.knn_join(pts, qs, bounds=BOUNDS)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["image_id"], r["dist"]))
    for qid in range(len(qx)):
        d = np.hypot(px - qx[qid], py - qy[qid])
        order = sorted(range(len(px)), key=lambda i: (d[i], i))
        want = [(i + 1, order[i]) for i in range(5) if d[order[i]] <= 30_000.0]
        have = sorted(got.get(qid, []))
        assert [(rk, pid) for rk, pid, _ in have] == want, f"query {qid}"
        for rk, pid, dist in have:
            assert abs(dist - d[pid]) < 1e-6


def test_knn_bounds_edge_query_no_wraparound(spark, frames):
    """A query at the frame's left edge must not pick up candidates from
    the right edge (the world-frame ring wraps longitude; a projected
    frame must clamp)."""
    pts, _, _, _ = frames
    # one point hugging each vertical edge, far apart in x
    extra = spark.createDataFrame(
        [(90_001, BOUNDS[0] + 10.0, 4_300_000.0), (90_002, BOUNDS[2] - 10.0, 4_300_000.0)],
        ["image_id", "lon", "lat"],
    )
    qs = spark.createDataFrame(
        [(0, BOUNDS[0] + 5.0, 4_300_000.0, 2, 500_000.0)],
        ["query_id", "lon", "lat", "k", "max_distance"],
    )
    out = KNN.knn_join(extra, qs, bounds=BOUNDS).collect()
    ids = [r["image_id"] for r in out]
    assert 90_001 in ids
    # the right-edge point is ~600 km away — outside max_distance, and
    # must NOT appear as a wrapped neighbor at distance ~15 m
    for r in out:
        if r["image_id"] == 90_002:
            assert r["dist"] > 590_000.0


def test_dbscan_bounds_matches_oracle(spark):
    px, py = _points(400, 17)
    pts = spark.createDataFrame(
        [(int(i), float(px[i]), float(py[i])) for i in range(len(px))],
        ["event_id", "lon", "lat"],
    )
    eps, min_pts = 25_000.0, 4
    got = {
        r["event_id"]: (r["cluster"], r["is_core"])
        for r in DB.dbscan(pts, eps, min_pts, bounds=BOUNDS).collect()
    }
    want = {
        i: (c, core)
        for i, c, core in DB.dbscan_oracle_numpy(
            np.arange(len(px)), px, py, eps, min_pts
        )
    }
    # both sides label clusters by min member id → exact comparison
    assert got == want
