"""Round-3 review batch j: degenerate kNN radii, resume-spec fidelity,
and the shared range-predicate helper."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import knn


def _pts(spark):
    rows = [(f"p{i}", float(i) * 0.5, 0.0) for i in range(8)]
    rows.append(("p_dup", 0.0, 0.0))  # exact duplicate of p0's position
    return spark.createDataFrame(rows, "image_id string, lon double, lat double")


def test_distance_candidates_zero_radius(spark):
    """eps=0 is legal (exact-duplicate neighbors): no NULL tier reaches
    the driver collect, and only coincident points match."""
    pts = _pts(spark)
    q = spark.createDataFrame(
        [("q0", 0.0, 0.0, 0.0)],
        "query_id string, lon double, lat double, max_distance double",
    )
    got = sorted(
        r["image_id"]
        for r in knn.distance_candidates(pts, q).collect()
    )
    assert got == ["p0", "p_dup"]  # dist <= 0 keeps exactly the coincident pair


def test_distance_candidates_null_radius_matches_nothing(spark):
    """A NULL max_distance row matches nothing (dist <= NULL is NULL) and
    must not crash the tier collect; non-NULL rows still work."""
    pts = _pts(spark)
    q = spark.createDataFrame(
        [("qnull", 0.0, 0.0, None), ("q1", 1.0, 0.0, 0.6)],
        "query_id string, lon double, lat double, max_distance double",
    )
    rows = knn.distance_candidates(pts, q).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["image_id"])
    assert "qnull" not in by_q
    assert by_q["q1"] == {"p1", "p2", "p3"}  # 0.5, 1.0, 1.5 within 0.6 of lon 1.0


def test_checkpoint_resume_respects_repartition_spec(spark, tmp_path):
    """A changed repartition spec must invalidate the cached stage even
    when the caller's fingerprint is unchanged — the spec is part of the
    stage's output contract (the next stage's co-location depends on it)."""
    from geowave_spark.plans import checkpoint as cp

    root = str(tmp_path / "pipe")
    df = spark.range(0, 100).withColumn("a", F.col("id") % 7)

    pipe = cp.CheckpointedPipeline(spark, root)
    pipe.stage("s", lambda: df, "fp1", repartition=(4, ["a"]))
    assert not pipe.results["s"].resumed

    # same fingerprint, CHANGED spec -> must re-run (not a stale resume)
    pipe2 = cp.CheckpointedPipeline(spark, root)
    pipe2.stage("s", lambda: df, "fp1", repartition=(8, ["a"]))
    assert not pipe2.results["s"].resumed

    # unchanged spec + fingerprint DOES resume (build must not run)
    pipe3 = cp.CheckpointedPipeline(spark, root)
    pipe3.stage(
        "s",
        lambda: (_ for _ in ()).throw(AssertionError("re-ran")),
        "fp1",
        repartition=(8, ["a"]),
    )
    assert pipe3.results["s"].resumed
