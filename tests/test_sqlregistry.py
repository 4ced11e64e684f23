"""SQL geometry UDFs + spatial SQL runner: plain-SQL cross-join query
equals the tiered-join fast path (the reference's SqlQueryRunner IT
design)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark.functions import sqlregistry


def test_sql_udf_cross_join_matches_tiered(spark, sf_dir):
    sqlregistry.register_sql_udfs(spark)
    ev = eq._events(spark, sf_dir)
    polys = eq._poly_df(spark, [p for p in eq.PIP_POLYGONS if p[0].startswith(("big", "small"))])
    ev.createOrReplaceTempView("ev_pts")
    polys.createOrReplaceTempView("ev_polys")

    naive = spark.sql(
        "SELECT p.event_id, g.polygon_id FROM ev_pts p, ev_polys g "
        "WHERE st_contains_point(g.wkt, p.lon, p.lat)"
    )
    fast = sqlregistry.spatial_join_sql(spark, "ev_pts", "ev_polys", result_view="matches")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))

    # follow-up SQL over the registered result view (replace-and-rerun step)
    n = spark.sql("SELECT count(*) AS n FROM matches").collect()[0]["n"]
    assert n == fast.count()


def test_sql_dwithin_udf(spark, sf_dir):
    sqlregistry.register_sql_udfs(spark)
    ev = eq._events(spark, sf_dir)
    polys = eq._poly_df(spark, eq.DWITHIN_POLYGONS)
    ev.createOrReplaceTempView("ev_pts2")
    polys.createOrReplaceTempView("ev_polys2")
    naive = spark.sql(
        "SELECT p.event_id, g.polygon_id FROM ev_pts2 p, ev_polys2 g "
        f"WHERE st_dwithin_point(g.wkt, p.lon, p.lat, {eq.DWITHIN_RADIUS})"
    )
    from geowave_spark.operators import spatial_join

    fast = spatial_join.tiered_spatial_join(
        ev, polys, predicate="dwithin", radius=eq.DWITHIN_RADIUS, point_id="event_id"
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))
