"""Synthetic image+caption table (the BASELINE.json `input_hint` shape).

Deterministic (seed=42 default): same seed ⇒ byte-identical tables, per
FIXTURES.md §1.  Generation itself is a Spark job — `spark.range(n)` →
`mapInPandas` — so fixture creation scales across executors exactly like a
production backfill would (no driver-side loops).

Schema (exact input_hint):
    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash bigint
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions import imagecodec as codec

SEED = 42
_W = [16, 32, 64]
_H = [16, 32, 48]
_FMT = ["png", "jpeg", "bmp"]

SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def pixels_for(i: int, seed: int = SEED) -> np.ndarray:
    h, w = _H[i % 3], _W[i % 3]
    rng = np.random.default_rng(seed * 10**9 + i)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def phash_for(i: int, seed: int = SEED) -> int:
    d = hashlib.sha256(f"{seed}:{i}".encode()).digest()[:8]
    return int.from_bytes(d, "big", signed=True)


def row_for(i: int, seed: int = SEED) -> dict:
    arr = pixels_for(i, seed)
    fmt = _FMT[i % 3]
    return {
        "image_id": f"img{i:010d}",
        "bytes": codec.encode_image(arr, fmt),
        "w": _W[i % 3],
        "h": _H[i % 3],
        "fmt": fmt,
        "caption": f"synthetic image {i} tier test {i % 97}",
        "phash": phash_for(i, seed),
    }


def _gen_batches(iterator, seed: int):
    for pdf in iterator:
        rows = [row_for(int(i), seed) for i in pdf["id"]]
        yield pd.DataFrame(rows)


def generate_images(
    spark: SparkSession, n: int, seed: int = SEED, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation of n image rows."""
    partitions = partitions or max(8, n // 50_000)
    base = spark.range(0, n, 1, partitions)
    seed_ = seed
    return base.mapInPandas(lambda it: _gen_batches(it, seed_), SCHEMA)


def images_path(n: int, seed: int = SEED, root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data")
    return os.path.join(root, f"images_n{n}_s{seed}.parquet")


def ensure_images(spark: SparkSession, n: int, seed: int = SEED, root: str | None = None) -> str:
    """Write-once cache of the generated table as parquet; returns the path.

    Parquet here stands in for the Iceberg table of the north rule — the
    engine only relies on columnar scan + column pruning + partition-level
    parallelism, which both provide.
    """
    path = images_path(n, seed, root)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_images(spark, n, seed).write.mode("overwrite").parquet(path)
    return path


def load_images(spark: SparkSession, n: int, seed: int = SEED, root: str | None = None) -> DataFrame:
    return spark.read.parquet(ensure_images(spark, n, seed, root))


# ---------------------------------------------------------------------------
# Polygon workload (FIXTURES.md §2)
# ---------------------------------------------------------------------------

_CLASSES = ["cell_exact", "small_box", "large_box", "world", "antimeridian", "concave"]


def polygon_row(j: int, seed: int = SEED) -> dict:
    from .. import geom

    cls = _CLASSES[j % len(_CLASSES)]
    rng = np.random.default_rng(seed * 7 + j)
    if cls == "cell_exact":
        t = [2, 4, 8, 13, 18][j % 5]
        r = 1 << t
        x = int(rng.integers(0, r))
        y = int(rng.integers(0, r))
        wkt = geom.box_wkt(
            x / r * 360 - 180, y / r * 180 - 90, (x + 1) / r * 360 - 180, (y + 1) / r * 180 - 90
        )
    elif cls == "small_box":
        side = rng.uniform(0.01, 0.5)
        x0 = rng.uniform(-180, 180 - side)
        y0 = rng.uniform(-90, 90 - side)
        wkt = geom.box_wkt(x0, y0, x0 + side, y0 + side)
    elif cls == "large_box":
        side = rng.uniform(10, 60)
        x0 = rng.uniform(-180, 180 - side)
        y0 = rng.uniform(-90, 90 - side)
        wkt = geom.box_wkt(x0, y0, x0 + side, y0 + side)
    elif cls == "world":
        wkt = geom.box_wkt(-180, -90, 180, 90)
    elif cls == "antimeridian":
        half = rng.uniform(0.5, 5)
        y0 = rng.uniform(-85, 80)
        # UNWRAPPED coordinates (lon beyond +180): the engine detects
        # bbox.xmax > 180 and splits into two bins, mirroring
        # LongitudeDefinition.java:52-67; the exact refine tests the point
        # at lon and lon+360.
        wkt = geom.box_wkt(180 - half, y0, 180 + half, y0 + 5)
    else:  # concave C-shape
        x0 = rng.uniform(-170, 150)
        y0 = rng.uniform(-80, 60)
        s = rng.uniform(1, 10)
        wkt = (
            f"POLYGON (({x0} {y0}, {x0 + s} {y0}, {x0 + s} {y0 + s * 0.2}, "
            f"{x0 + s * 0.2} {y0 + s * 0.2}, {x0 + s * 0.2} {y0 + s * 0.8}, "
            f"{x0 + s} {y0 + s * 0.8}, {x0 + s} {y0 + s}, {x0} {y0 + s}, {x0} {y0}))"
        )
    return {"polygon_id": f"poly{j:06d}", "wkt": wkt, "class": cls}


def generate_polygons(spark: SparkSession, n: int, seed: int = SEED) -> DataFrame:
    pdf = pd.DataFrame([polygon_row(j, seed) for j in range(n)])
    return spark.createDataFrame(pdf)
