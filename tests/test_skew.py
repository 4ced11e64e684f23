"""Skew planning: histogram finds the hot cell; salted shuffle join equals
the unsalted result."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark.operators import spatial_join
from geowave_spark.plans import skew


def _skewed_points(spark, n_hot=3000, n_rest=1000):
    hot = spark.range(n_hot).select(
        F.col("id").alias("event_id"),
        (F.lit(10.0) + F.col("id") % 100 / 10000.0).alias("lon"),
        (F.lit(10.0) + F.col("id") % 97 / 10000.0).alias("lat"),
    )
    rest = spark.range(n_hot, n_hot + n_rest).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 360 - 180.0 + 0.5).cast("double").alias("lon"),
        (F.col("id") % 170 - 85.0 + 0.5).cast("double").alias("lat"),
    )
    return hot.unionByName(rest)


def test_histogram_finds_hot_cell(spark):
    pts = _skewed_points(spark)
    hist = skew.cell_histogram(pts, tier=6, top_n=5)
    assert hist[0][1] >= 3000  # the hot cell dominates
    assert skew.suggest_salt(hist, target_rows_per_task=1000) == 3
    assert skew.suggest_salt(hist, target_rows_per_task=10_000_000) == 1
    assert skew.suggest_salt([], 100) == 1


def test_salted_join_matches_unsalted(spark):
    pts = _skewed_points(spark)
    polys = eq._poly_df(spark, [("hotbox", 9.5, 9.5, 10.5, 10.5), ("world", -180.0, -90.0, 180.0, 90.0)])
    base = spatial_join.tiered_spatial_join(pts, polys, point_id="event_id")
    salted = spatial_join.tiered_spatial_join(
        pts, polys, point_id="event_id", broadcast_polygons=False,
        salt=skew.plan_shuffle_join_salt(pts, target_rows_per_task=1000),
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, salted.collect()))
