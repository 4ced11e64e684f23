"""Per-tile mosaic assembly (the RasterDataAdapter merge path) and retile
rollup consistency."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowave_spark.functions import imagecodec as codec
from geowave_spark.operators import tiling
from geowave_spark.sources import images as src

LEVEL = 3
TILE_PX = 16


def test_assemble_tiles_mosaics_members(spark):
    imgs = src.generate_images(spark, 300)
    tiles = tiling.assemble_tiles(imgs, LEVEL, tile_px=TILE_PX).collect()
    # membership counts match the pure assignment aggregation
    want = {
        (r["tile_x"], r["tile_y"]): r["n_images"]
        for r in tiling.tile_counts(imgs, [LEVEL], point_id="image_id").collect()
    }
    got = {(r["tile_x"], r["tile_y"]): r["n_images"] for r in tiles}
    assert got == want
    # every tile decodes to the fixed mosaic shape; painted pixels are
    # non-zero where members landed, zero (nodata) elsewhere
    painted = 0
    for r in tiles:
        arr = codec.decode_png(bytes(r["tile_png"]))
        assert arr.shape == (TILE_PX, TILE_PX, 3)
        painted += int((arr.sum(axis=2) > 0).sum())
    assert painted > 0


def test_retile_rollup_equals_direct(spark):
    imgs = src.generate_images(spark, 500)
    t6 = tiling.tile_counts(imgs, [6], point_id="image_id")
    rolled = {
        (r["tile_x"], r["tile_y"]): r["n_images"] for r in tiling.retile(t6, 6, 4).collect()
    }
    direct = {
        (r["tile_x"], r["tile_y"]): r["n_images"]
        for r in tiling.tile_counts(imgs, [4], point_id="image_id").collect()
    }
    assert rolled == direct


def test_merge_strategies_differ_and_are_deterministic(spark):
    imgs = src.generate_images(spark, 200)
    outs = {}
    for merge in tiling.MERGE_STRATEGIES:
        rows = tiling.assemble_tiles(imgs, 2, tile_px=8, merge=merge).collect()
        outs[merge] = {
            (r["tile_x"], r["tile_y"]): bytes(r["tile_png"]) for r in rows
        }
        again = tiling.assemble_tiles(imgs, 2, tile_px=8, merge=merge).collect()
        assert outs[merge] == {(r["tile_x"], r["tile_y"]): bytes(r["tile_png"]) for r in again}
    # strategies genuinely differ where tiles have >1 member per pixel
    assert outs["mean"] != outs["max"]


def test_pyramid_level_selection_rule():
    """Level resolution ratio closest to 1 from below (never upsample)."""
    # a source at exactly level-5 resolution selects level 5
    r5 = 360.0 / ((1 << 6) * 256)
    assert tiling.pyramid_levels_for_resolution(r5, 256, build_pyramid=False) == [5]
    # slightly finer source (smaller deg/px) → still level 5, never
    # upsample to level 6
    assert tiling.pyramid_levels_for_resolution(r5 * 0.99, 256, build_pyramid=False) == [5]
    # slightly coarser source → level 5 would upsample → level 4
    assert tiling.pyramid_levels_for_resolution(r5 * 1.01, 256, build_pyramid=False) == [4]
    assert tiling.pyramid_levels_for_resolution(r5 * 2.0, 256, build_pyramid=False) == [4]
    # full pyramid includes every coarser level
    assert tiling.pyramid_levels_for_resolution(r5, 256) == [0, 1, 2, 3, 4, 5]


def test_assemble_orientation_north_up(spark):
    """Row 0 = TOP (max lat): a member at the tile's north edge paints the
    top row, one at the south edge paints the bottom row — the same
    convention as mosaic_tiles (round-3 review: these were mirrored)."""
    # level 0, tile (1, 0): lon [0, 180), lat [-90, 90); place one member
    # near max lat (-> row 0) and one near min lat (-> last row)
    from geowave_spark.sources import images as isrc

    from pyspark.sql import Window

    fx = isrc.generate_images(spark, 2).select("image_id", "bytes", "fmt")
    df = (
        fx.withColumn("_i", F.row_number().over(Window.orderBy("image_id")))
        .withColumn("lon", F.lit(10.0))
        .withColumn("lat", F.when(F.col("_i") == 1, F.lit(89.0)).otherwise(F.lit(-89.0)))
    )
    tiles = tiling.assemble_tiles(df, 0, tile_px=8).collect()
    tile = next(t for t in tiles if (t["tile_x"], t["tile_y"]) == (1, 0))
    arr = codec.decode_png(bytes(tile["tile_png"]))
    top_painted = (arr[0].sum(axis=1) > 0).any()
    bottom_painted = (arr[-1].sum(axis=1) > 0).any()
    middle_painted = (arr[1:-1].sum(axis=2) > 0).any()
    assert top_painted and bottom_painted and not middle_painted
