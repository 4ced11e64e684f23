"""Streaming ingest: cell-keyed append equals the batch layout; windowed
tile counts match the batch aggregation on the same rows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowave_spark import entry_queries as eq
from geowave_spark.sources.indexed import with_cell_column
from geowave_spark.streaming import ingest


def test_stream_ingest_matches_batch_cells(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = eq._events(spark, sf_dir).select("event_id", "lon", "lat")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = ingest.start_cell_ingest(stream, out, ckpt, phash_col=None)
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("event_id", "cell")
    want = with_cell_column(ev, phash_col=None).select("event_id", "cell")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_tile_counts_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in2")
    ev = eq._events(spark, sf_dir).select("event_id", "ts", "lon", "lat")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = ingest.streaming_tile_counts(stream, level=5)
    # complete mode: append would hold back windows not yet past the
    # watermark at the final availableNow commit
    q = (
        agg.writeStream.format("memory")
        .queryName("tiles_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("tiles_stream")
        .groupBy("tile_x", "tile_y")
        .agg(F.sum("n").alias("n"))
    )
    from geowave_spark.operators import tiling

    want = tiling.tile_counts(eq._events(spark, sf_dir), [5], point_id="event_id").select(
        "tile_x", "tile_y", F.col("n_images").alias("n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: one emission per key, in
    arrival order across micro-batches, same-batch ties broken by id."""
    import time

    src = str(tmp_path / "dedup_in")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, content_hash string"
    batch1 = spark.createDataFrame(
        [(3, "A"), (1, "A"), (2, "B")], schema  # tie on A -> doc_id 1 wins
    )
    batch2 = spark.createDataFrame(
        [(4, "B"), (5, "C")], schema  # B is a dup; C is new
    )
    batch1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "100").parquet(src)
    out = ingest.streaming_dedup(stream, key_col="content_hash", order_col="doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.sql("SELECT doc_id, content_hash FROM dedup_sink").collect())
        )
    finally:
        q.stop()
    assert got == [(1, "A"), (2, "B"), (5, "C")]


def test_streaming_spatial_join_matches_batch(spark, sf_dir, tmp_path):
    """The tiered broadcast join runs unchanged on an unbounded point side
    (stateless plan — no watermark, no state store) and produces exactly
    the batch join's pairs."""
    src = str(tmp_path / "sj_in")
    ev = eq._events(spark, sf_dir).select("event_id", "lon", "lat")
    ev.write.parquet(src)
    polys = eq._poly_df(spark, eq.PIP_POLYGONS)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    joined = ingest.streaming_spatial_join(stream, polys, point_id="event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("sj_stream").collect()))
    from geowave_spark.operators import spatial_join

    want = sorted(map(tuple, spatial_join.tiered_spatial_join(
        eq._events(spark, sf_dir), polys, point_id="event_id").collect()))
    assert got == want
    assert len(got) > 0


def test_streaming_zone_counts_match_batch(spark, sf_dir, tmp_path):
    """Windowed per-polygon counts over the stream == batch join grouped by
    the same event-time windows."""
    src = str(tmp_path / "zc_in")
    ev = eq._events(spark, sf_dir).select("event_id", "ts", "lon", "lat")
    ev.write.parquet(src)
    polys = eq._poly_df(spark, eq.PIP_POLYGONS)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = ingest.streaming_zone_counts(stream, polys, point_id="event_id",
                                       window="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("zc_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("zc_stream").collect()))

    from geowave_spark.operators import spatial_join

    evb = eq._events(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    j = spatial_join.tiered_spatial_join(
        evb, polys, point_id="event_id", carry_cols=("ts",))
    want = sorted(map(tuple, (
        j.groupBy(F.window(F.col("ts"), "1 hour"), "polygon_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "polygon_id", "n")
    ).collect()))
    assert got == want
    assert len(got) > 0


def test_streaming_image_dedup_first_seen_perceptual(spark, tmp_path):
    """Streaming pHash dedup: a re-encode (different bytes, identical
    pixels) arriving in a LATER micro-batch is dropped; genuinely new
    images pass.  The decode/hash stage is the same Arrow-batched
    mapInPandas as the batch path, running inside the streaming query."""
    from geowave_spark.functions import imagecodec as codec
    from geowave_spark.functions import phash
    from geowave_spark.sources import images

    src = str(tmp_path / "img_in")
    os.makedirs(src, exist_ok=True)

    def row(i, image_id, fmt):
        arr = images.pixels_for(i)
        return {
            "image_id": image_id,
            "bytes": codec.encode_image(arr, fmt),
            "w": arr.shape[1], "h": arr.shape[0], "fmt": fmt,
            "caption": f"c{i}", "phash": 0,
        }

    batch1 = spark.createDataFrame(
        [row(0, "a0", "png"), row(1, "a1", "bmp")], images.SCHEMA
    )
    # b0 is a bmp re-encode of image 0 (same pixels, different bytes);
    # b2 is new content
    batch2 = spark.createDataFrame(
        [row(0, "b0", "bmp"), row(2, "b2", "png")], images.SCHEMA
    )
    batch1.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(images.SCHEMA)
        .option("maxFilesPerTrigger", "100").parquet(src)
    )
    out = ingest.streaming_image_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("img_dedup_sink").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        batch2.write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {
            r["image_id"]: r["phash64"]
            for r in spark.sql("SELECT * FROM img_dedup_sink").collect()
        }
    finally:
        q.stop()
    assert set(got) == {"a0", "a1", "b2"}  # b0 deduped against a0
    assert got["a0"] == phash.phash64_pixels(images.pixels_for(0))


def test_streaming_geometry_join_matches_batch(spark, sf_dir, tmp_path):
    """r4 verdict ask #10: the GENERAL geometry join (arbitrary WKT left
    side, all-predicate family) runs unchanged on an unbounded stream via
    the stateless exactly_once plan and emits exactly the batch pairs."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "gj_in")
    ev = eq._events(spark, sf_dir)
    left = ev.select(
        F.col("event_id").cast("string").alias("left_id"),
        F.concat(
            F.lit("LINESTRING ("),
            F.col("lon"), F.lit(" "), F.col("lat"), F.lit(", "),
            F.least(F.col("lon") + 3.0, F.lit(179.9)), F.lit(" "),
            F.least(F.col("lat") + 1.5, F.lit(89.9)),
            F.lit(")"),
        ).alias("wkt"),
    )
    left.write.parquet(src)
    right = spark.createDataFrame(
        [("poly_a", "POLYGON ((-60 -30, -20 -30, -20 10, -60 10, -60 -30))"),
         ("track_b", "LINESTRING (0 0, 40 20, 80 -10)"),
         ("pt_c", "POINT (2.25 48.9)")],
        ["right_id", "wkt"],
    )
    stream = spark.readStream.schema(left.schema).parquet(src)
    joined = ingest.streaming_geometry_join(stream, right, predicate="intersects")
    q = (
        joined.writeStream.format("memory")
        .queryName("gj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("gj_stream").collect()))
    from geowave_spark.operators import spatial_join

    want = sorted(map(tuple, spatial_join.geometry_join(
        left, right, predicate="intersects").collect()))
    assert got == want
    assert len(got) > 0


def test_streaming_geometry_join_guards(spark, sf_dir, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    batch = eq._events(spark, sf_dir).select(
        F.col("event_id").cast("string").alias("left_id"), F.lit("POINT (0 0)").alias("wkt")
    )
    right = spark.createDataFrame([("r", "POINT (1 1)")], ["right_id", "wkt"])
    with _pytest.raises(ValueError, match="stream side"):
        ingest.streaming_geometry_join(batch, right)
    src = str(tmp_path / "gjg_in")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    with _pytest.raises(ValueError, match="empty right side"):
        ingest.streaming_geometry_join(stream, right.limit(0))
