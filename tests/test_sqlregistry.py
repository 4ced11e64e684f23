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


def test_run_spatial_sql_rewrites_to_tiered(spark, sf_dir):
    """run_spatial_sql: same rows as the naive SQL, no CartesianProduct."""
    sqlregistry.register_sql_udfs(spark)
    ev = eq._events(spark, sf_dir)
    polys = eq._poly_df(spark, [p for p in eq.PIP_POLYGONS if p[0].startswith("mid")])
    ev.createOrReplaceTempView("rs_pts")
    polys.createOrReplaceTempView("rs_polys")
    sql = (
        "SELECT p.event_id, g.polygon_id, p.value FROM rs_pts p, rs_polys g "
        "WHERE st_contains_point(g.wkt, p.lon, p.lat)"
    )
    naive = spark.sql(sql)
    fast = sqlregistry.run_spatial_sql(spark, sql)
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, fast.collect()))
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_run_spatial_sql_falls_back_on_unsupported(spark, sf_dir):
    """Subquery shape: runs unmodified (the reference rejects these too)."""
    sqlregistry.register_sql_udfs(spark)
    eq._events(spark, sf_dir).createOrReplaceTempView("rs_pts3")
    out = sqlregistry.run_spatial_sql(
        spark, "SELECT count(*) AS n FROM (SELECT * FROM rs_pts3 WHERE event_id < 10)"
    )
    assert out.collect()[0]["n"] == 10


def test_geometry_pair_sql_functions(spark):
    """st_intersects / st_distance / st_dwithin over two WKT columns are
    callable from plain Spark SQL (GeomFunctionRegistry parity for the
    general geometry family)."""
    from geowave_spark.functions.sqlregistry import register_sql_udfs

    register_sql_udfs(spark)
    rows = spark.sql(
        "SELECT st_intersects('LINESTRING (0 0, 10 10)', "
        "'POLYGON ((4 0, 8 0, 8 9, 4 9, 4 0))') AS i, "
        "st_distance('POINT (0 3)', 'LINESTRING (4 3, 9 3)') AS d, "
        "st_dwithin('POINT (0 3)', 'LINESTRING (4 3, 9 3)', 4.5) AS w"
    ).collect()[0]
    assert rows["i"] is True and rows["d"] == 4.0 and rows["w"] is True


def test_covers_within_equals_sql_functions(spark):
    from geowave_spark.functions.sqlregistry import register_sql_udfs

    register_sql_udfs(spark)
    r = spark.sql(
        "SELECT st_within('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))', "
        "'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') AS w, "
        "st_covers('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', 'POINT (2 2)') AS c, "
        "st_equals('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', "
        "'POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))') AS e"
    ).collect()[0]
    assert r["w"] is True and r["c"] is True and r["e"] is True


def test_relate_sql_functions(spark):
    from geowave_spark.functions.sqlregistry import register_sql_udfs

    register_sql_udfs(spark)
    r = spark.sql(
        "SELECT st_relate('POINT (1 1)', "
        "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', 'T********') AS m, "
        "st_relate_matrix('POINT (2 1)', "
        "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))') AS x"
    ).collect()[0]
    assert r["m"] is True and r["x"] == "F0FFFF212"
