"""Row-range histogram statistics: balanced splits under skew, persisted
stats, and scan-free cardinality estimates (RowRangeHistogramStatistics +
SplitsProvider analog)."""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark.plans import rowhist

SF_DIR = "/root/testdata/sf0.001"


def _skewed_points(spark, n=20000):
    """90% of points jammed into one city block, 10% uniform — the hot-cell
    shape that breaks naive fixed-width splits."""
    base = spark.range(n).select(F.col("id").alias("event_id"))
    hot = (F.col("event_id") % 10) != 0
    lon = F.when(hot, 2.35 + (F.col("event_id") % 997) / 100000.0).otherwise(
        (F.col("event_id") % 360) - 179.5
    )
    lat = F.when(hot, 48.85 + (F.col("event_id") % 991) / 100000.0).otherwise(
        (F.col("event_id") % 170) - 84.5
    )
    return base.withColumn("lon", lon).withColumn("lat", lat)


def test_balanced_write_under_skew(spark, tmp_path):
    pts = _skewed_points(spark)
    path = str(tmp_path / "balanced.parquet")
    stats = str(tmp_path / "cellhist.parquet")
    n_files = 8
    rowhist.write_indexed_balanced(
        pts, path, n_files=n_files, phash_col=None, stats_path=stats
    )
    out = spark.read.parquet(path)
    per_file = [
        r["n"]
        for r in out.withColumn("_f", F.input_file_name())
        .groupBy("_f").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(per_file) == n_files
    # even shares despite 90% of rows in one cell neighborhood: the
    # histogram cuts keep every file within 2x of the mean (a naive
    # fixed-width key split would put ~90% in one file)
    mean = sum(per_file) / len(per_file)
    assert max(per_file) <= 2 * mean, per_file
    assert sum(per_file) == 20000

    # files are cell-sorted -> min-max pruning works (spot check)
    from geowave_spark.sources.indexed import range_lookup_indexed

    bbox = (2.3, 48.8, 2.4, 48.9)
    got = range_lookup_indexed(spark, path, bbox).count()
    want = pts.filter(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
        & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
    ).count()
    assert got == want and got > 0


def test_histogram_roundtrip_and_estimates(spark, tmp_path):
    pts = eq._events(spark, SF_DIR)
    path = str(tmp_path / "ev_idx.parquet")
    stats = str(tmp_path / "ev_hist.parquet")
    hist = rowhist.write_indexed_balanced(
        pts, path, n_files=4, phash_col=None, stats_path=stats
    )
    assert rowhist.load_histogram(spark, stats) == sorted(hist)
    assert sum(n for _, _, n in hist) == pts.count()

    # scan-free cardinality estimate within 3x of truth for varied bboxes
    rows = pts.select("lon", "lat").collect()
    for bbox in [(-20.0, 5.0, 30.0, 45.0), (-130.0, 25.0, -60.0, 55.0), (100.0, -40.0, 170.0, 20.0)]:
        true = sum(
            1 for r in rows
            if bbox[0] <= r["lon"] <= bbox[2] and bbox[1] <= r["lat"] <= bbox[3]
        )
        est = rowhist.estimate_rows(hist, bbox)
        assert true / 3 - 5 <= est <= true * 3 + 5, (bbox, true, est)


def test_split_points_even_shares():
    hist = [(0, 100, 1000), (100, 200, 10), (200, 300, 10), (300, 400, 980)]
    # total 2000, target 500/share; bin granularity caps what's reachable:
    # the heavy first bin absorbs two targets, so the remaining cuts borrow
    # the neighboring edges — n-1 distinct cuts, no empty share
    assert rowhist.split_points(hist, 4) == [100, 200, 300]
    fine = [(i * 10, (i + 1) * 10, 100) for i in range(40)]  # uniform
    cuts = rowhist.split_points(fine, 4)
    assert cuts == [100, 200, 300]
    # degenerate cases
    assert rowhist.split_points([], 4) == []
    assert rowhist.split_points(hist, 1) == []
