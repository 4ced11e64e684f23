"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "geowave-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """local[cpus] session with AQE + skew-join handling on.

    On a real cluster the same configs apply; only master changes
    (spark-submit provides it).  AQE skew-join is our first line of defense
    for hot cells (SURVEY.md §4 row 9); explicit salting in the operators is
    the second.

    ``iceberg_warehouse``: configure the `geowave` Iceberg catalog rooted
    there (sources/iceberg.ICEBERG_SESSION_CONF); requires the
    iceberg-spark-runtime jar on the classpath — absent in this container,
    in which case IndexedStore transparently uses the parquet layout.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(32, cpus)
    b = SparkSession.builder.appName(app)
    # only default the master when none was provided externally: builder
    # config overrides spark-submit's --master, so hardcoding local[n]
    # would silently ignore a real cluster (the docstring's contract is
    # the opposite — spark-submit provides the master)
    submit_args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    launched_by_submit = "PYSPARK_GATEWAY_PORT" in os.environ  # spark-submit app.py
    if not launched_by_submit and "--master" not in submit_args and "spark.master" not in submit_args:
        b = b.master(f"local[{cpus}]")
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if iceberg_warehouse:
        from .sources.iceberg import CATALOG, ICEBERG_SESSION_CONF

        for k, v in ICEBERG_SESSION_CONF.items():
            b = b.config(k, v)
        b = b.config(f"spark.sql.catalog.{CATALOG}.warehouse", iceberg_warehouse)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # getOrCreate returns any pre-existing session UNCHANGED — if that
    # session runs in a non-UTC zone, calendar bins and temporal predicates
    # silently shift.  Runtime-settable confs are corrected in place;
    # anything else is the caller's session to manage, but say so.
    import warnings

    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            warnings.warn(
                f"get_spark: reusing an existing SparkSession (was timeZone={tz}); "
                "session timezone reset to UTC for calendar-bin determinism",
                stacklevel=2,
            )
        except Exception:
            warnings.warn(
                f"get_spark: existing SparkSession runs with timeZone={tz}, not UTC — "
                "temporal bins and LTZ instants may shift",
                stacklevel=2,
            )
    return spark
