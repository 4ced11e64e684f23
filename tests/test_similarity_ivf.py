"""IVF ANN: determinism + recall vs brute-force cosine top-k."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import similarity


def test_ivf_ann_recall_and_determinism(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = em.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(em, qs, k=5)
    ivf = similarity.ivf_ann_topk(em, qs, k=5, n_lists=8, n_probe=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"
    again = {(r["query_id"], r["vec_id"]) for r in
             similarity.ivf_ann_topk(em, qs, k=5, n_lists=8, n_probe=3).collect()}
    assert a == again


def test_pq_ann_recall_and_determinism(spark):
    """PQ + ADC + exact rerank: recall@10 vs brute-force cosine pinned,
    and the full pipeline is deterministic for a fixed seed."""
    from geowave_spark.operators import similarity as sim

    vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = vecs.filter(F.col("vec_id") < 8)
    books = sim.pq_train(vecs, m=8, k=16)
    got = sim.pq_ann_topk(vecs, queries, books, k=10, rerank=60)
    exact = sim.cosine_topk(vecs, queries, k=10)
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.6, recall
    # deterministic
    g2 = {(r["query_id"], r["vec_id"]) for r in sim.pq_ann_topk(vecs, queries, books, k=10, rerank=60).collect()}
    assert g == g2
    # codes are m small ints (the 8-byte storage contract)
    codes = sim.pq_encode(vecs, books).first()["codes"]
    assert len(codes) == 8 and all(0 <= c < 16 for c in codes)
