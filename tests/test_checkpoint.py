"""Checkpointed pipeline: resume skips completed stages; lineage records
metrics; fingerprint change forces recompute."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.plans.checkpoint import CheckpointedPipeline


def _build_counter(spark, calls):
    def build():
        calls.append(1)
        return spark.range(100).withColumn("v", F.col("id") * 2)

    return build


def test_stage_runs_then_resumes(spark, tmp_path):
    calls: list[int] = []
    p1 = CheckpointedPipeline(spark, str(tmp_path), "run1")
    df1 = p1.stage("double", _build_counter(spark, calls), fingerprint="fp-v1")
    assert df1.count() == 100
    assert calls == [1]
    assert p1.results["double"].resumed is False
    assert p1.results["double"].rows == 100

    # new pipeline object, same root — resumes from checkpoint, build not called
    p2 = CheckpointedPipeline(spark, str(tmp_path), "run1")
    df2 = p2.stage("double", _build_counter(spark, calls), fingerprint="fp-v1")
    assert df2.count() == 100
    assert calls == [1]
    assert p2.results["double"].resumed is True


def test_fingerprint_change_recomputes(spark, tmp_path):
    calls: list[int] = []
    p = CheckpointedPipeline(spark, str(tmp_path), "run2")
    p.stage("s", _build_counter(spark, calls), fingerprint="a")
    p.stage("s", _build_counter(spark, calls), fingerprint="b")  # input changed
    assert calls == [1, 1]


def test_multi_stage_lineage_and_repartition(spark, tmp_path):
    p = CheckpointedPipeline(spark, str(tmp_path), "run3")
    base = p.stage(
        "base",
        lambda: spark.range(1000).withColumn("k", F.pmod(F.col("id"), F.lit(7))),
        fingerprint="v1",
        repartition=(4, ["k"]),
    )
    # 7 key values hashed into 4 partitions; empty partitions write no file
    assert 1 <= p.results["base"].partitions <= 4
    agg = p.stage(
        "agg",
        lambda: base.groupBy("k").agg(F.count(F.lit(1)).alias("n")),
        fingerprint="v1:agg",
        upstream=["base"],
    )
    assert agg.count() == 7
    lin = p.lineage()
    assert lin["agg"]["upstream"] == ["base"]
    assert lin["base"]["rows"] == 1000
    assert all("wall_s" in v for v in lin.values())


def test_resume_mid_pipeline(spark, tmp_path):
    """Crash-after-stage-1 scenario: stage 1 resumes, stage 2 computes."""
    calls1: list[int] = []
    p = CheckpointedPipeline(spark, str(tmp_path), "run4")
    p.stage("s1", _build_counter(spark, calls1), fingerprint="x")
    # simulate crash: new pipeline; s1 must resume, s2 runs fresh
    calls2: list[int] = []
    p2 = CheckpointedPipeline(spark, str(tmp_path), "run4")
    s1 = p2.stage("s1", _build_counter(spark, calls1), fingerprint="x")
    s2 = p2.stage(
        "s2", lambda: (calls2.append(1), s1.filter(F.col("id") < 10))[1], fingerprint="y", upstream=["s1"]
    )
    assert calls1 == [1]
    assert calls2 == [1]
    assert s2.count() == 10
    assert p2.results["s1"].resumed and not p2.results["s2"].resumed


def test_stats_persist_and_merge(spark, tmp_path, sf_dir):
    """Stats table write + associative merge equals stats over the union."""
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.operators import stats

    ev = eq._events(spark, sf_dir)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = stats.merge_stats(stats.table_stats(a), stats.table_stats(b))
    want = stats.table_stats(ev)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, want.collect()))
    p = str(tmp_path / "stats.parquet")
    stats.write_stats_table(ev, p)
    assert sorted(map(tuple, spark.read.parquet(p).collect())) == sorted(map(tuple, want.collect()))


def test_manifest_has_per_partition_stats(spark, tmp_path):
    import json as _json

    p = CheckpointedPipeline(spark, str(tmp_path), "run5")
    p.stage(
        "s",
        lambda: spark.range(0, 5000, 1, 4).withColumn("v", F.col("id") * 3),
        fingerprint="pp",
    )
    man = _json.load(open(f"{tmp_path}/run5/s.manifest.json"))
    ps = man["partition_stats"]
    assert ps["files"] >= 1
    assert 0 < ps["min_rows"] <= ps["max_rows"] <= 5000
    assert man["rows"] == 5000


def test_custom_udaf_bbox_area(spark, sf_dir):
    """Grouped-agg pandas UDAF equals the built-in formulation."""
    from geowave_spark import entry_queries as eq
    from geowave_spark.operators import stats

    ev = eq._events(spark, sf_dir)
    got = stats.custom_bbox_agg(ev)
    want = ev.groupBy("event_type").agg(
        F.floor(
            (F.max("lon") - F.min("lon")) * (F.max("lat") - F.min("lat")) * 1e6 + F.lit(0.5)
        ).cast("long").alias("bbox_area_mu"),
        F.count(F.lit(1)).alias("n"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_uri_root_routes_through_hadoop_fs(spark, tmp_path):
    """file:// URI roots exercise the Hadoop FileSystem branch (the code
    path hdfs:// and s3a:// take on a cluster) against local disk: write,
    resume, and the crash-window manifest invalidation all behave as on
    plain paths."""
    from geowave_spark.plans.checkpoint import CheckpointedPipeline, _HadoopFS, _fs_for

    root = "file://" + str(tmp_path / "ckpt_uri")
    assert isinstance(_fs_for(spark, root), _HadoopFS)
    p = CheckpointedPipeline(spark, root, run_id="r1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumnRenamed("id", "v")

    a = p.stage("s1", build, fingerprint="fpA")
    assert a.count() == 100 and calls["n"] == 1
    # resume in a NEW pipeline object (fresh manifest read through the FS)
    p2 = CheckpointedPipeline(spark, root, run_id="r1")
    b = p2.stage("s1", build, fingerprint="fpA")
    assert b.count() == 100 and calls["n"] == 1  # not rebuilt
    assert p2.results["s1"].resumed
    # changed fingerprint rebuilds (and the manifest swap is atomic)
    c = p2.stage("s1", build, fingerprint="fpB")
    assert c.count() == 100 and calls["n"] == 2


def test_stale_manifest_never_describes_new_data(spark, tmp_path):
    """Crash window: if the data rewrite starts, the OLD manifest must
    already be gone — a later run with the old fingerprint re-runs
    instead of resuming onto the new stage's output."""
    from geowave_spark.plans.checkpoint import CheckpointedPipeline

    root = str(tmp_path / "ckpt_crash")
    p = CheckpointedPipeline(spark, root, run_id="r1")
    p.stage("s", lambda: spark.range(10).withColumnRenamed("id", "v"), fingerprint="A")

    # simulate the crash: manifest invalidated + data rewritten, but the
    # NEW manifest never lands (kill between write and manifest commit)
    p._fs.delete(p._manifest_path("s"))
    spark.range(99).withColumnRenamed("id", "w").write.mode("overwrite").parquet(p._data_path("s"))

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "v")

    p2 = CheckpointedPipeline(spark, root, run_id="r1")
    out = p2.stage("s", build, fingerprint="A")
    # no stale resume onto the 99-row foreign data: the stage re-ran
    assert calls["n"] == 1 and out.count() == 10
    assert not p2.results["s"].resumed
