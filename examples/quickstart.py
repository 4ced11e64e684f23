#!/usr/bin/env python
"""Quickstart — the engine's workflow end-to-end, mirroring the reference's
spatial-join demo notebook (examples/data/notebooks/jupyter/
geowave-spatial-join.ipynb): ingest → index → join → kNN → tiles → KDE,
plus the training-data pipeline ops, on a synthetic image+caption table.

Run:  python examples/quickstart.py          (local, ~1 min)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geowave_spark.api import SpatialFrame
from geowave_spark.functions.sqlregistry import register_sql_udfs, run_spatial_sql
from geowave_spark.session import get_spark
from geowave_spark.sources import images, indexed


def main() -> None:
    spark = get_spark("quickstart", cpus=8, shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="geowave_quickstart_")

    # 1. ingest: a deterministic image+caption table (input_hint schema);
    #    points derive from phash
    imgs = images.generate_images(spark, 5_000)
    sf = SpatialFrame.from_images(imgs)
    print("rows:", sf.df.count())

    # 2. storage-side index: cell-sorted layout → pushdown range scans
    path = os.path.join(work, "images_indexed.parquet")
    indexed.write_indexed(sf.df, path, n_files=16, phash_col=None)
    hits = indexed.range_lookup_indexed(spark, path, (-30.0, 10.0, 45.0, 55.0))
    print("range lookup (indexed, pushed cell ranges):", hits.count())

    # 3. the flagship join: points × polygon workload, zero-shuffle plan
    polys = spark.createDataFrame(
        [("europe", "POLYGON ((-10 35, 40 35, 40 70, -10 70, -10 35))"),
         ("pacific", "POLYGON ((150 -30, 190 -30, 190 10, 150 10, 150 -30))")],  # antimeridian
        ["polygon_id", "wkt"],
    )
    pairs = sf.spatial_join(polys)
    print("point-in-polygon pairs:", pairs.count())

    # 4. the same query in plain SQL (registered geometry UDFs + rewriter)
    register_sql_udfs(spark)
    sf.df.createOrReplaceTempView("pts")
    polys.createOrReplaceTempView("polys")
    sql_pairs = run_spatial_sql(
        spark,
        "SELECT p.image_id, g.polygon_id FROM pts p, polys g "
        "WHERE st_contains_point(g.wkt, p.lon, p.lat)",
    )
    print("same via SQL rewriter:", sql_pairs.count())

    # 5. kNN around the first 5 images
    queries = sf.df.limit(5).select(F.col("image_id").alias("query_id"), "lon", "lat")
    print("kNN rows:", sf.knn(queries, k=3, max_distance=10.0).count())

    # 6. tile pyramid + KDE density surface
    print("tiles l6:", sf.tile_counts([6]).count())
    print("kde l7 cells:", sf.kde(7, exact=True).count())

    spark.stop()
    print("done — work dir:", work)


if __name__ == "__main__":
    main()
