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

    # 7. general geometry joins (round 2): LINESTRING tracks and
    #    polygon×polygon through the GeometryFrame facade
    from geowave_spark.api import GeometryFrame

    tracks = spark.createDataFrame(
        [("t0", "LINESTRING (-20 30, 0 45, 25 40, 38 55)"),
         ("t1", "LINESTRING (120 -20, 150 -25, 170 -10)")],
        ["track_id", "wkt"],
    )
    near_tracks = sf.spatial_join(tracks, radius=3.0, polygon_id="track_id")
    print("points within 3.0 of a track:", near_tracks.count())
    seg_gf = GeometryFrame(
        sf.df.limit(2000).select(
            "image_id",
            F.concat(
                F.lit("LINESTRING ("), F.col("lon"), F.lit(" "), F.col("lat"),
                F.lit(", "), F.col("lon") + 2.0, F.lit(" "), F.col("lat") + 1.0,
                F.lit(")"),
            ).alias("wkt"),
        ),
        "image_id",
    )
    print("segment × track intersections:", seg_gf.join(tracks, "track_id").count())

    # 8. unified store facade: Iceberg when the runtime jar is present,
    #    the tested parquet layout otherwise — plus the stats-driven
    #    balanced write for skewed tables
    from geowave_spark.sources.iceberg import IndexedStore

    store = IndexedStore(spark, os.path.join(work, "store.parquet"))
    store.write(sf.df, n_files=8, phash_col=None)
    print("store fingerprint:", store.fingerprint(),
          "| range rows:", store.range_lookup((-30.0, 10.0, 45.0, 55.0)).count())

    # 9. the round-4 cell families (the north rule's "H3/S2"): a spherical
    #    S2-style stored layout answering a polar-cap scan, and a hex
    #    Gi* hotspot surface over the uniform 6-neighbor ring
    from geowave_spark.operators import stats as stats_ops

    s2_path = os.path.join(work, "store_s2.parquet")
    indexed.write_indexed_s2(sf.df, s2_path, n_files=8, phash_col=None)
    polar = indexed.s2_range_lookup(spark, s2_path, (-180.0, 62.0, 180.0, 84.0))
    print("polar-cap rows (S2 layout):", polar.count())
    hot = stats_ops.hotspot_hex(sf.df)
    print("hex hotspot cells:", hot.count(),
          "| max Gi* (micro):", hot.agg(F.max("gi_mu")).first()[0])

    # 10. round-5 surface: general DE-9IM RELATE through CQL and SQL, a
    #     conic projected frame, and the maintained (append/compact) store
    from geowave_spark.functions import cql, crs
    from geowave_spark.sources import maintenance as mt

    inside = cql.cql_filter(
        sf.df,
        "RELATE(geom, POLYGON ((-10 35, 40 35, 40 70, -10 70, -10 35)), 'T********')",
        geometry=("lon", "lat"),
    )
    print("RELATE interior-mask rows (general DE-9IM):", inside.count())
    m = spark.sql(
        "SELECT st_relate_matrix('POINT (2 48)', "
        "'POLYGON ((-10 35, 40 35, 40 70, -10 70, -10 35))') AS m"
    ).first()["m"]
    print("DE-9IM matrix via SQL:", m)
    lamb = crs.reproject(sf.df, "EPSG:2154", x_out="e", y_out="n")
    print("Lambert-93 reprojection (pure codegen):",
          lamb.filter("e IS NOT NULL").count())

    mroot = os.path.join(work, "maintained_store")
    mt.write_store(sf.df.filter(F.col("phash") % 2 == 0), mroot, n_files=4, phash_col=None)
    mt.append_store(sf.df.filter(F.col("phash") % 2 != 0), mroot, n_files=2)
    mt.compact_store(spark, mroot, n_files=4)
    mt.vacuum_store(mroot)
    print("maintained-store range rows (post append+compact+vacuum):",
          mt.lookup_store(spark, mroot, (-30.0, 10.0, 45.0, 55.0)).count())

    spark.stop()
    print("done — work dir:", work)


if __name__ == "__main__":
    main()
