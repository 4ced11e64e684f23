"""Deterministic sampling: identical selection at any partitioning, rate
accuracy, salt decorrelation, and exact-k reservoir stability."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import sampling

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_sample_invariant_under_partitioning(spark):
    ev = _events(spark)
    a = set(
        r["event_id"]
        for r in sampling.hash_sample(ev.repartition(1), 0.25, "event_id").collect()
    )
    b = set(
        r["event_id"]
        for r in sampling.hash_sample(ev.repartition(17), 0.25, "event_id").collect()
    )
    assert a == b and a  # identical rows regardless of partitioning


def test_rate_accuracy_and_salt_decorrelation(spark):
    ev = _events(spark)
    n = ev.count()
    s1 = set(r["event_id"] for r in sampling.hash_sample(ev, 0.5, "event_id", salt="a").collect())
    s2 = set(r["event_id"] for r in sampling.hash_sample(ev, 0.5, "event_id", salt="b").collect())
    assert abs(len(s1) / n - 0.5) < 0.1
    # independent gates: overlap ≈ 25% of n, far from 50%
    assert abs(len(s1 & s2) / n - 0.25) < 0.1
    assert s1 != s2
    # nested rates: a 0.25 sample with the same salt is a subset of the 0.5
    s3 = set(r["event_id"] for r in sampling.hash_sample(ev, 0.25, "event_id", salt="a").collect())
    assert s3 <= s1


def test_stratified_rates(spark):
    ev = _events(spark)
    rates = {"click": 1.0, "error": 0.0}
    got = sampling.stratified_sample(ev, rates, "event_type", "event_id")
    by_type = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert by_type.get("click") == n_click  # rate 1.0 keeps everything
    assert "error" not in by_type           # rate 0.0 drops everything
    assert set(by_type) == {"click"}        # default rate 0 drops the rest


def test_exact_k_reservoir_stability(spark):
    ev = _events(spark)
    k = 20
    full = sampling.sample_exact_k(ev, k, "event_type", "event_id")
    counts = {
        r["event_type"]: r["n"]
        for r in full.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(v == k for v in counts.values())
    # reservoir property: on a sub-corpus, the winners of the full corpus
    # that survive the cut are exactly the sub-corpus winners' prefix —
    # i.e. winners only drop out when lower-hash rows exist
    sub = ev.filter(F.col("event_id") % 2 == 0)
    w_full = set(r["event_id"] for r in full.collect())
    w_sub = set(r["event_id"] for r in sampling.sample_exact_k(sub, k, "event_type", "event_id").collect())
    assert w_full & set(r["event_id"] for r in sub.select("event_id").collect()) <= w_sub
