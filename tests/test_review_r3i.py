"""Round-3 ninth-batch review regressions: dbscan column wiring, simhash
pigeonhole guards, empty-input knn, degenerate-grid hotspots, merged cell
ranges, JVM-only hier point writes."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import dbscan as db
from geowave_spark.operators import dedup, knn, stats
from geowave_spark.sources import indexed


def test_dbscan_custom_column_names(spark):
    rows = [(i, float(i % 3) * 0.1, float(i % 3) * 0.1) for i in range(12)]
    a = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    b = spark.createDataFrame(rows, "event_id long, x double, y double")
    ra = sorted(map(tuple, db.dbscan(a, 0.5, 3).collect()))
    rb = sorted(map(tuple, db.dbscan(b, 0.5, 3, lon_col="x", lat_col="y").collect()))
    assert ra == rb and len(ra) == 12


def test_simhash_pairs_pigeonhole_guards(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(docs, max_hamming=4, bands=4)
    with pytest.raises(ValueError, match="bands"):
        dedup.simhash_pairs(docs, max_hamming=3, bands=64, bits=60)


def test_distance_candidates_empty_queries(spark):
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "event_id long, lon double, lat double")
    q = spark.createDataFrame(
        [], "query_id long, lon double, lat double, max_distance double"
    )
    out = knn.distance_candidates(pts, q, point_id="event_id")
    assert out.columns == ["query_id", "event_id", "dist"]
    assert out.count() == 0
    # and dbscan over an empty table returns empty, not ValueError
    empty = spark.createDataFrame([], "event_id long, lon double, lat double")
    assert db.dbscan(empty, 0.5, 3).count() == 0


def test_hotspot_tier1_no_double_count(spark):
    # tier 1: 2x2 lon columns — dx=-1 and dx=+1 wrap onto the SAME
    # neighbor column; each neighbor must count once in the ring
    pts = spark.createDataFrame(
        [(-90.0, 10.0)] * 3 + [(90.0, 10.0)] * 5, "lon double, lat double"
    )
    got = {(r["gx"], r["gy"]): r for r in stats.hotspot_cells(pts, tier=1).collect()}
    for key, r in got.items():
        assert r["ring_cnt"] == 2, (key, r)  # self + the one other cell, once
        assert r["ring_sum"] == 8


def test_cell_range_predicate_merges_runs(spark):
    pred, n_ranges = indexed.cell_range_predicate((10.0, 10.0, 30.0, 30.0), max_cells=64)
    from geowave_spark import cells

    tier = cells.tier_for_bbox((10.0, 10.0, 30.0, 30.0), max_dup=64, closed=True)
    n_cells = len(cells.cells_for_bbox_at_tier((10.0, 10.0, 30.0, 30.0), tier, closed=True))
    assert n_ranges < n_cells  # Z-order runs merged into BETWEEN ranges
    # and the predicate still selects exactly the bbox rows end-to-end
    df = spark.createDataFrame(
        [(1, 15.0, 15.0), (2, 50.0, 50.0)], "id long, lon double, lat double"
    )
    from geowave_spark.operators.stats import range_lookup

    assert [r["id"] for r in range_lookup(df, (10.0, 10.0, 30.0, 30.0)).collect()] == [1]


def test_hier_write_all_points_stays_jvm(spark, tmp_path):
    """An all-points table through the hier layout must not evaluate the
    XZ Arrow UDF (the CASE-extraction trap) — and still round-trip."""
    df = spark.createDataFrame(
        [(i, float(i), float(i), float(i), float(i)) for i in range(8)],
        "rid long, x0 double, y0 double, x1 double, y1 double",
    )
    path = str(tmp_path / "hier_pts")
    indexed.write_indexed_hier(df, path, n_files=2)
    out = indexed.hier_range_lookup(spark, path, (0.0, 0.0, 3.5, 3.5))
    assert sorted(r["rid"] for r in out.collect()) == [0, 1, 2, 3]
    got = spark.read.parquet(path)
    assert got.filter(F.col("kind") != 0).count() == 0
