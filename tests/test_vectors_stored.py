"""Stored IVF+PQ ANN index: partition pruning, column pruning, recall,
determinism, and parity of the survivors' exact-cosine contract."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import similarity
from geowave_spark.sources import vectors as vstore


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    em = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("annstore") / "ivfpq.parquet")
    meta = vstore.write_vectors_ivf(em, path, n_lists=8, pq_m=8, pq_k=16)
    return path, meta, em


def test_stored_layout_and_meta(spark, store):
    path, meta, em = store
    # hive partition dirs, one per non-empty list
    dirs = [d for d in os.listdir(path) if d.startswith("list_id=")]
    assert 1 < len(dirs) <= meta["n_lists"]
    assert len(meta["centers"]) == 8 and len(meta["centers"][0]) == meta["dim"]
    # round-trip: every vector present exactly once, codes are m small ints
    t = spark.read.parquet(path)
    assert t.count() == em.count()
    row = t.first()
    assert len(row["codes"]) == 8 and all(0 <= c < 16 for c in row["codes"])


def test_probe_prunes_partitions_and_columns(spark, store):
    path, meta, em = store
    qs = em.filter(F.col("vec_id") < 4)
    out = vstore.stored_ann_topk(spark, path, qs, k=5, n_probe=2, rerank=40)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the isin on the hive partition column must land in PartitionFilters
    assert "PartitionFilters: [" in plan and "list_id" in plan.split("PartitionFilters:")[1][:200]
    # the ADC candidate scan must not read the embedding column: at least
    # one scan's ReadSchema carries codes but not embedding
    scans = [seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]]
    assert any("codes" in s and "embedding" not in s for s in scans), scans
    # pruned input, runtime-proven: the candidate scan's numFiles metric
    # must be strictly below the table's file count (directory-level
    # pruning, not a post-scan filter).  4 clustered queries x 2 probes
    # touch well under all 8 lists.
    out.collect()
    jplan = out._jdf.queryExecution().executedPlan()
    total_files = sum(
        1 for d in os.listdir(path) if d.startswith("list_id=")
        for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
    )
    scans = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if "AdaptiveSparkPlan" in name:
            stack.append(node.executedPlan())
            continue
        if "QueryStage" in name:  # AQE materialized stages wrap their plan
            stack.append(node.plan())
            continue
        if "FileSourceScan" in name:
            scans.append(node)
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
    pruned_counts = []
    for s in scans:
        m = s.metrics()
        if m.contains("numFiles"):
            pruned_counts.append(m.apply("numFiles").value())
    assert pruned_counts and all(c < total_files for c in pruned_counts), (
        pruned_counts,
        total_files,
    )


def test_stored_recall_and_determinism(spark, store):
    path, meta, em = store
    qs = em.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(em, qs, k=5)
    got = vstore.stored_ann_topk(spark, path, qs, k=5, n_probe=4, rerank=60)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.6, f"stored IVF+PQ recall {recall:.2f}"
    again = {(r["query_id"], r["vec_id"]) for r in
             vstore.stored_ann_topk(spark, path, qs, k=5, n_probe=4, rerank=60).collect()}
    assert g == again
    # survivors carry the exact integer-micro cosine (same contract as the
    # brute-force oracle): every returned pair's cos_mu equals brute's
    eb = {(r["query_id"], r["vec_id"]): r["cos_mu"] for r in exact.collect()}
    for r in got.collect():
        key = (r["query_id"], r["vec_id"])
        if key in eb:
            assert eb[key] == r["cos_mu"]
