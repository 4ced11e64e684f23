"""Query-side covers are boundary-CLOSED.

Bug family fixed in round 3: insert-path covers use the reference's
exact-fit rule (an upper edge exactly on a cell line does NOT open the
next cell — TieredSFCIndexStrategyTest.java:140-168), but QUERY-side
covers must include that next cell, because a partner lying exactly on
the shared line floors into it while every refine in the engine is
boundary-inclusive (<=).  With the open convention these pairs were
missed at EVERY tier (cell lines at coordinate 0 nest through the whole
tier hierarchy), so no dedup or tier fallback could recover them.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import spatial_join as sj
from geowave_spark.operators import stats
from geowave_spark.sources import indexed

EDGE_POLY = "POLYGON ((-10 -10, 0 -10, 0 10, -10 10, -10 -10))"  # x1 = 0: a cell line at every tier


def test_point_on_polygon_edge_on_cell_line(spark):
    pts = spark.createDataFrame(pd.DataFrame({
        "image_id": ["on_edge", "far"],
        "lon": [0.0, 70.0],
        "lat": [1.0, 70.0],
    }))
    polys = spark.createDataFrame(pd.DataFrame({"polygon_id": ["p0"], "wkt": [EDGE_POLY]}))
    got = sorted(map(tuple, sj.tiered_spatial_join(pts, polys).collect()))
    want = sorted(map(tuple, sj.brute_force_join(pts, polys).collect()))
    assert got == want == [("on_edge", "p0")]


def test_extent_touching_polygon_bbox_on_cell_line(spark):
    ext = spark.createDataFrame(pd.DataFrame({
        "extent_id": ["touch", "far"],
        "x0": [0.0, 50.0], "y0": [0.0, 50.0],
        "x1": [5.0, 55.0], "y1": [5.0, 55.0],
    }))
    polys = spark.createDataFrame(pd.DataFrame({"polygon_id": ["p0"], "wkt": [EDGE_POLY]}))
    got = sorted(map(tuple, sj.tiered_extent_join(ext, polys).collect()))
    assert got == [("touch", "p0")]


def _boundary_points(spark):
    return spark.createDataFrame(pd.DataFrame({
        "image_id": ["corner", "inside", "far", "edge"],
        "lon": [0.0, -3.0, 10.0, 0.0],
        "lat": [0.0, -3.0, 10.0, -2.0],
    }))


BBOX = (-5.625, -5.625, 0.0, 0.0)  # upper edges on cell lines at every tier
EXPECT = ["corner", "edge", "inside"]


def test_indexed_range_lookup_includes_boundary_rows(spark, tmp_path):
    p = str(tmp_path / "z")
    indexed.write_indexed(_boundary_points(spark), p, n_files=2)
    got = sorted(r[0] for r in indexed.range_lookup_indexed(spark, p, BBOX).select("image_id").collect())
    assert got == EXPECT


def test_stats_range_lookup_includes_boundary_rows(spark, tmp_path):
    p = str(tmp_path / "z2")
    indexed.write_indexed(_boundary_points(spark), p, n_files=2)
    pts = spark.read.parquet(p)
    got = sorted(r[0] for r in stats.range_lookup(pts, BBOX).select("image_id").collect())
    assert got == EXPECT


def test_hilbert_xz_hier_boundary_rows(spark, tmp_path):
    ph = str(tmp_path / "h")
    indexed.write_indexed_hilbert(_boundary_points(spark), ph, n_files=2)
    got = sorted(r[0] for r in indexed.hilbert_range_lookup(spark, ph, BBOX).select("image_id").collect())
    assert got == EXPECT
    ext = spark.createDataFrame(pd.DataFrame({
        "extent_id": ["touch", "far"],
        "x0": [0.0, 20.0], "y0": [0.0, 20.0],
        "x1": [3.0, 25.0], "y1": [3.0, 25.0],
    }))
    px = str(tmp_path / "xz")
    indexed.write_indexed_extents(ext, px, n_files=2)
    got = sorted(r[0] for r in indexed.xz_range_lookup(spark, px, BBOX).select("extent_id").collect())
    assert got == ["touch"]
    pr = str(tmp_path / "hier")
    indexed.write_indexed_hier(ext, pr, n_files=2)
    got = sorted(r[0] for r in indexed.hier_range_lookup(spark, pr, BBOX).select("extent_id").collect())
    assert got == ["touch"]
