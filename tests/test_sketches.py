"""Deterministic CMS / HLL sketch operators (stats.sketch_stats).

The sketch STRUCTURE (counters, registers, indicator) is oracle-checked in
test_entry_parity.py; these tests pin the statistical semantics the oracle
cannot express: CMS's one-sided error bound and the HLL estimator's
accuracy against the exact distinct count.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import stats


@pytest.fixture(scope="module")
def values_df(spark):
    # 20_000 rows over ~3_000 distinct skewed keys: key = i % (i % 7 + 1)
    # pattern-free but deterministic; top keys repeat thousands of times.
    return spark.range(20_000).select(
        (F.col("id") % (F.col("id") % F.lit(211) + F.lit(1))).alias("k")
    )


def test_cms_one_sided_bound(spark, values_df):
    exact = {
        r["k"]: r["n"]
        for r in values_df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = stats.cms_probe_estimates(values_df, "k", probes_k=25).collect()
    assert len(rows) == 25
    n_total = sum(exact.values())
    for r in rows:
        true_n = exact[r["k1"]]
        assert r["v"] == true_n  # probe carries the exact count
        assert r["k2"] >= true_n  # CMS never underestimates
        # e*N/w expected overestimate; allow 6 sigma-ish slack
        assert r["k2"] - true_n <= 20 * n_total // stats.CMS_W + 8


def test_hll_estimate_accuracy(spark, values_df):
    exact = values_df.select("k").distinct().count()
    regs = stats.hll_registers(values_df, "k")
    ind = stats.hll_indicator(regs).collect()[0]
    est = stats.hll_estimate(ind["indicator"], ind["occupied"])
    # 1024 registers -> ~3.25% standard error; allow 4x
    assert abs(est - exact) / exact < 0.13


def test_hll_registers_shape(spark, values_df):
    rows = stats.hll_registers(values_df, "k").collect()
    m = 1 << stats.HLL_P
    assert 0 < len(rows) <= m
    assert all(0 <= r["register"] < m for r in rows)
    assert all(1 <= r["max_rank"] <= (60 - stats.HLL_P) + 1 for r in rows)
    # distinct values across registers == exact distinct
    exact = values_df.select("k").distinct().count()
    assert sum(r["n_distinct"] for r in rows) == exact


def test_sketch_stats_tags(spark, values_df):
    df = stats.sketch_stats(values_df, "k", probes_k=10)
    tags = {r["tag"] for r in df.select("tag").distinct().collect()}
    assert tags == {"cms", "hll", "est"}
    est = df.filter(F.col("tag") == "est").collect()
    assert len(est) == 1 and est[0]["k2"] > 0
