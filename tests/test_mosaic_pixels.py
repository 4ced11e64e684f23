"""Golden-tile tests for TRUE raster mosaicking (r2 review item #8).

mosaic_tiles resamples actual decoded image pixels through the
world-to-screen affine into the tile grid with per-band nodata merge —
unlike assemble_tiles' point-heat summary.  The golden expectation is an
independent brute-force reimplementation (per dest pixel center, find
covering images, NN-sample, merge), compared PIXEL-EXACTLY on the decoded
tile PNG.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec as codec
from geowave_spark.operators import tiling

LEVEL = 3  # tiles: 16 x 8, each 22.5 deg square
TILE_PX = 16


def _img(arr: np.ndarray) -> bytes:
    return codec.encode_png(arr.astype(np.uint8))


def _gradient(h, w, r0, g0):
    a = np.zeros((h, w, 3), np.uint8)
    a[:, :, 0] = (r0 + np.arange(w))[None, :] % 256
    a[:, :, 1] = (g0 + np.arange(h))[:, None] % 256
    a[:, :, 2] = 200
    return a


# (image_id, pixels, footprint x0,y0,x1,y1)
CASES = [
    ("img_a", _gradient(8, 8, 0, 0), (10.0, 10.0, 20.0, 20.0)),
    ("img_b", _gradient(4, 4, 100, 50), (15.0, 12.0, 21.0, 18.0)),  # overlaps a
    ("img_c", np.full((6, 6, 3), 37, np.uint8), (30.0, -5.0, 40.0, 5.0)),  # spans 2 tiles (y)
]


def _brute_tile(level, tx, ty, tile_px, merge, cases):
    nx, ny = 1 << (level + 1), 1 << level
    tlon0, tlon1 = tx / nx * 360.0 - 180.0, (tx + 1) / nx * 360.0 - 180.0
    tlat0, tlat1 = ty / ny * 180.0 - 90.0, (ty + 1) / ny * 180.0 - 90.0
    out = np.zeros((tile_px, tile_px, 3), np.float64)
    for i in range(tile_px):
        for j in range(tile_px):
            lon_c = tlon0 + (j + 0.5) * (tlon1 - tlon0) / tile_px
            lat_c = tlat1 - (i + 0.5) * (tlat1 - tlat0) / tile_px
            vals = []
            for _, arr, (fx0, fy0, fx1, fy1) in cases:
                if fx0 <= lon_c < fx1 and fy0 < lat_c <= fy1:
                    ih, iw = arr.shape[:2]
                    sc = min(iw - 1, int((lon_c - fx0) / (fx1 - fx0) * iw))
                    sr = min(ih - 1, int((fy1 - lat_c) / (fy1 - fy0) * ih))
                    vals.append(arr[sr, sc].astype(np.float64))
            if vals:
                if merge == "mean":
                    out[i, j] = np.mean(vals, axis=0)
                elif merge == "max":
                    out[i, j] = np.max(vals, axis=0)
                else:
                    out[i, j] = vals[-1]
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _images_df(spark):
    rows = [
        (iid, _img(arr), int(arr.shape[1]), int(arr.shape[0]), "png",
         float(fx0), float(fy0), float(fx1), float(fy1),
         (fx0 + fx1) / 2.0, (fy0 + fy1) / 2.0)
        for iid, arr, (fx0, fy0, fx1, fy1) in CASES
    ]
    return spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, "
        "fx0 double, fy0 double, fx1 double, fy1 double, lon double, lat double",
    )


@pytest.mark.parametrize("merge", ["mean", "max", "overwrite"])
def test_mosaic_golden_pixels(spark, merge):
    df = _images_df(spark)
    got = tiling.mosaic_tiles(
        df, LEVEL, tile_px=TILE_PX, merge=merge,
        footprint_cols=("fx0", "fy0", "fx1", "fy1"),
    ).collect()
    tiles = {(r["tile_x"], r["tile_y"]): r for r in got}
    # footprints land in known tiles: a+b in (8,4); c spans (9,3) and (9,4)
    assert set(tiles) >= {(8, 4), (9, 3), (9, 4)}
    for (tx, ty), r in tiles.items():
        want = _brute_tile(LEVEL, tx, ty, TILE_PX, merge, CASES)
        gotpx = codec.decode_image(bytes(r["tile_png"]), "png")
        assert gotpx.shape == want.shape
        assert np.array_equal(gotpx, want), (tx, ty, merge)


def test_mosaic_nodata_and_counts(spark):
    df = _images_df(spark)
    got = {(r["tile_x"], r["tile_y"]): r
           for r in tiling.mosaic_tiles(
               df, LEVEL, tile_px=TILE_PX,
               footprint_cols=("fx0", "fy0", "fx1", "fy1")).collect()}
    # tile (8,4): img_a + img_b members; nodata-0 outside the footprints
    r = got[(8, 4)]
    assert r["n_images"] == 2
    px = codec.decode_image(bytes(r["tile_png"]), "png")
    # top-left corner of the tile (0.0-ish lon... row 0 = lat 22.5 top) is
    # outside both footprints -> nodata 0
    assert tuple(px[0, 0]) == (0, 0, 0)
    assert px.sum() > 0


def test_mosaic_derived_footprint_runs(spark):
    """Fixture-shaped input (phash-derived location, w/h-derived footprint)
    through the default path."""
    from geowave_spark.sources import images as img

    df = img.load_images(spark, 40, root="/tmp/geowave_fixture_cache")
    out = tiling.mosaic_tiles(df, 4, tile_px=8, deg_per_px=0.05)
    rows = out.collect()
    assert rows and all(r["tile_png"] for r in rows)
    assert sum(r["n_images"] for r in rows) >= 40
