"""Bucketed co-located cell joins: two tables bucketed+sorted on the cell
column join WITHOUT any shuffle exchange — the layout strategy for
repeated big-big spatial joins at cluster scale."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark.sources.indexed import with_cell_column


def test_bucketed_cell_join_has_no_shuffle(spark, sf_dir):
    # tables land in the session warehouse (spark-warehouse/, gitignored)
    spark.sql("DROP TABLE IF EXISTS ev_a_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_b_bucketed")

    ev = with_cell_column(eq._events(spark, sf_dir), phash_col=None)
    a = ev.select("event_id", "cell", "value")
    b = ev.select(F.col("event_id").alias("other_id"), "cell")
    for name, df in (("ev_a_bucketed", a), ("ev_b_bucketed", b)):
        (
            df.write.bucketBy(8, "cell")
            .sortBy("cell")
            .mode("overwrite")
            .saveAsTable(name)
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        ta = spark.table("ev_a_bucketed")
        tb = spark.table("ev_b_bucketed")
        joined = ta.join(tb, "cell")
        n = joined.count()
        assert n > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # bucketed layout: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS ev_a_bucketed")
        spark.sql("DROP TABLE IF EXISTS ev_b_bucketed")
