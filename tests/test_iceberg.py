"""Iceberg integration: capability gating, unified store facade, and the
snapshot/content fingerprint feeding checkpoint resume.

The container ships no iceberg-spark-runtime jar (documented in
sources/iceberg.py), so the Iceberg branch is exercised for its
API/DDL/conf surface and the parquet fallback is integration-tested with
the identical plan contract (sorted layout + pushed cell-range filters).
When a runtime jar IS present these same tests exercise the real branch.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import entry_queries as eq
from geowave_spark.plans.checkpoint import CheckpointedPipeline
from geowave_spark.sources import iceberg

SF_DIR = "/root/testdata/sf0.001"


def test_session_conf_and_ddl_surface():
    assert iceberg.ICEBERG_SESSION_CONF["spark.sql.catalog.geowave"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert "IcebergSparkSessionExtensions" in iceberg.ICEBERG_SESSION_CONF["spark.sql.extensions"]
    assert iceberg.write_ordered_ddl("geowave.ns.images") == (
        "ALTER TABLE geowave.ns.images WRITE ORDERED BY (cell)"
    )


def test_write_indexed_iceberg_raises_without_runtime(spark, tmp_path):
    ev = eq._events(spark, SF_DIR)
    if iceberg.iceberg_available(spark):
        import pytest

        pytest.skip("runtime present; the raise path is for jar-less hosts")
    try:
        iceberg.write_indexed_iceberg(ev, "geowave.ns.ev")
        raise AssertionError("expected RuntimeError without the runtime jar")
    except RuntimeError as e:
        assert "iceberg-spark-runtime" in str(e)


def test_indexed_store_roundtrip_and_pruned_lookup(spark, tmp_path):
    """Facade writes the indexed layout and the range lookup is exact and
    pushdown-planned, regardless of which backend is active."""
    ev = eq._events(spark, SF_DIR)
    loc = (
        "geowave.ns.ev_store"
        if iceberg.iceberg_available(spark)
        else str(tmp_path / "ev_store.parquet")
    )
    store = iceberg.IndexedStore(spark, loc)
    store.write(ev, n_files=8, phash_col=None)

    bbox = (-20.0, 5.0, 30.0, 45.0)
    got = sorted(r["event_id"] for r in store.range_lookup(bbox).collect())
    want = sorted(
        r["event_id"]
        for r in ev.filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        ).collect()
    )
    assert got == want and len(got) > 0

    df = store.range_lookup(bbox)
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        plan = df._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    pushed = plan.split("PushedFilters: [", 1)
    assert len(pushed) == 2 and "cell" in pushed[1][:4000]


def test_fingerprint_drives_checkpoint_resume(spark, tmp_path):
    """Pipeline stage resumes on unchanged store fingerprint and re-runs
    after an append changes it (snapshot-id semantics; content hash in the
    parquet fallback)."""
    ev = eq._events(spark, SF_DIR).limit(200)
    loc = str(tmp_path / "ev_fp.parquet")
    store = iceberg.IndexedStore(spark, loc, force_parquet=not iceberg.iceberg_available(spark))
    store.write(ev, n_files=2, phash_col=None)
    fp1 = store.fingerprint()
    assert fp1 == store.fingerprint()  # stable across reads

    pipe = CheckpointedPipeline(spark, str(tmp_path / "ckpt"), "run1")
    out1 = pipe.stage(
        "counts",
        lambda: store.read().groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        fingerprint=fp1,
    )
    assert not pipe.results["counts"].resumed
    n1 = out1.count()

    pipe2 = CheckpointedPipeline(spark, str(tmp_path / "ckpt"), "run1")
    out2 = pipe2.stage(
        "counts",
        lambda: store.read().groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        fingerprint=store.fingerprint(),
    )
    assert pipe2.results["counts"].resumed and out2.count() == n1

    # append (overwrite with more rows) → fingerprint changes → re-run
    time.sleep(0.05)
    store.write(eq._events(spark, SF_DIR).limit(400), n_files=2, phash_col=None)
    fp2 = store.fingerprint()
    assert fp2 != fp1
    pipe3 = CheckpointedPipeline(spark, str(tmp_path / "ckpt"), "run1")
    pipe3.stage(
        "counts",
        lambda: store.read().groupBy("event_type").agg(F.count(F.lit(1)).alias("n")),
        fingerprint=fp2,
    )
    assert not pipe3.results["counts"].resumed


def test_session_level_conf_wiring_subprocess():
    """Session-level integration (r2 review item #9): build a FRESH
    SparkSession with ICEBERG_SESSION_CONF applied — exactly what a real
    cluster user does.  On a jar-less host the session must still come up
    and serve SQL (the extensions class is resolved lazily), the
    capability probe must report unavailable, and first USE of the
    catalog must fail with the catalog class name — not corrupt state."""
    import subprocess
    import sys as _sys

    code = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from geowave_spark.sources import iceberg
b = (SparkSession.builder.master("local[2]").appName("iceberg-conf-wiring")
     .config("spark.ui.enabled", "false")
     .config("spark.sql.catalog.geowave.warehouse", "/tmp/icb_wh"))
for k, v in iceberg.ICEBERG_SESSION_CONF.items():
    b = b.config(k, v)
spark = b.getOrCreate()
for k, v in iceberg.ICEBERG_SESSION_CONF.items():
    assert spark.conf.get(k) == v, k
assert spark.range(5).count() == 5  # session serves normal SQL
if iceberg.iceberg_available(spark):
    # runtime present: the real path must round-trip a snapshot
    spark.sql("CREATE NAMESPACE IF NOT EXISTS geowave.ns")
    spark.range(3).writeTo("geowave.ns.t").using("iceberg").createOrReplace()
    assert spark.table("geowave.ns.t").count() == 3
    print("RUNTIME_PRESENT")
else:
    try:
        spark.sql("SHOW NAMESPACES IN geowave").collect()
        raise AssertionError("catalog use should fail without the jar")
    except Exception as e:
        assert "SparkCatalog" in str(e) or "geowave" in str(e)
    print("GATE_OK")
spark.stop()
"""
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GATE_OK" in out.stdout or "RUNTIME_PRESENT" in out.stdout
