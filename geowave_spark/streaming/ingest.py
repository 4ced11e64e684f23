"""Structured-Streaming ingest into the cell-indexed layout.

The reference has NO streaming engine — Kafka appears only as an ingest
source feeding the same KV writes (SURVEY.md §1.5), so batch parity needs
nothing here.  This module is the Spark-native equivalent of that ingest
path: a stream of point rows is keyed with the finest-tier cell and
appended to the indexed table, so everything downstream (joins, range
lookups, tiles) reads one layout regardless of how rows arrived.

    q = start_cell_ingest(spark.readStream.schema(s).parquet(in_dir), out_dir, ckpt)
    q.processAllAvailable()   # tests; production just lets it run

Watermarked tile-count aggregation is included as the streaming twin of
tiling.tile_counts (late rows beyond the watermark are dropped — standard
event-time semantics the reference never had).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import sqlcells
from ..sources.indexed import with_cell_column


def cell_keyed(stream: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
               phash_col: str | None = "phash") -> DataFrame:
    """Add the finest-tier cell column to a streaming DataFrame."""
    return with_cell_column(stream, lon_col, lat_col, phash_col)


def start_cell_ingest(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    phash_col: str | None = "phash",
):
    """Append cell-keyed rows to parquet with exactly-once checkpointing."""
    keyed = cell_keyed(stream, lon_col, lat_col, phash_col)
    return (
        keyed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_tile_counts(
    stream: DataFrame,
    level: int,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Windowed per-tile counts with late-data watermarking — the streaming
    twin of tiling.tile_counts."""
    # watermarks require TIMESTAMP (LTZ); NTZ sources cast via session tz
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .withColumn("tile_x", sqlcells.tile_x_expr(F.col(lon_col), level))
        .withColumn("tile_y", sqlcells.tile_y_expr(F.col(lat_col), level))
        .groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.lit(level).alias("level"),
            "tile_x",
            "tile_y",
            "n",
        )
    )
