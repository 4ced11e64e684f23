#!/usr/bin/env python
"""spark-submit job: checkpointed spatial join + tiling over an image table.

Cluster usage (the north-rule deployment shape):

    python scripts/make_pyfiles.py                 # → dist/geowave_spark.zip
    spark-submit --py-files dist/geowave_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        scripts/job_spatial_join.py \
        --images /path/to/images_table --polygons /path/to/polygons \
        --out /path/to/out --checkpoint /path/to/ckpt

Local smoke (this sandbox):

    python scripts/job_spatial_join.py --n-images 5000 --out /tmp/gw_out

The job is three checkpointed stages (index → join → tiles); re-running
after a crash resumes from the last completed stage (see
geowave_spark/plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="parquet path of image table")
    ap.add_argument("--n-images", type=int, default=5000, help="generate N synthetic images if no --images")
    ap.add_argument("--polygons", default=None, help="parquet path of polygon table (polygon_id, wkt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--levels", default="4,6,8")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from geowave_spark import entry_queries
    from geowave_spark.operators import spatial_join, tiling
    from geowave_spark.plans.checkpoint import CheckpointedPipeline
    from geowave_spark.sources import images as img

    spark = SparkSession.builder.appName("geowave-spatial-join").getOrCreate()
    ckpt_root = args.checkpoint or os.path.join(args.out, "_checkpoints")
    pipe = CheckpointedPipeline(spark, ckpt_root, "spatial_join_job")

    if args.images:
        images = spark.read.parquet(args.images)
        img_fp = args.images
    else:
        images = img.generate_images(spark, args.n_images)
        img_fp = f"synthetic:{args.n_images}"

    if args.polygons:
        polygons = spark.read.parquet(args.polygons)
        poly_fp = args.polygons
    else:
        polygons = entry_queries._poly_df(spark, entry_queries.PIP_POLYGONS)
        poly_fp = "builtin-workload"

    indexed = pipe.stage(
        "indexed_points",
        lambda: spatial_join.add_point_cols(images.select("image_id", "phash")),
        fingerprint=f"idx:{img_fp}",
        repartition=(max(spark.sparkContext.defaultParallelism, 8), ["_cell31"]),
    )
    pairs = pipe.stage(
        "join_pairs",
        lambda: spatial_join.tiered_spatial_join(indexed, polygons),
        fingerprint=f"join:{img_fp}:{poly_fp}",
        upstream=["indexed_points"],
    )
    levels = [int(x) for x in args.levels.split(",")]
    tiles = pipe.stage(
        "tile_counts",
        lambda: tiling.tile_counts(indexed, levels, point_id="image_id"),
        fingerprint=f"tiles:{img_fp}:{args.levels}",
        upstream=["indexed_points"],
    )

    pairs.write.mode("overwrite").parquet(os.path.join(args.out, "join_pairs.parquet"))
    tiles.write.mode("overwrite").parquet(os.path.join(args.out, "tile_counts.parquet"))
    print(json.dumps({"lineage": pipe.lineage()}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
