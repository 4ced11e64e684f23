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


def test_sampled_artifacts_deterministic_and_correct(spark):
    """The oracle-derivable ANN variants: sampled centroids/codebooks are
    the head-id data rows; assign_lists (shuffle-free array_min argmin)
    agrees with a numpy argmin; sampled-IVF recall stays usable."""
    import numpy as np

    from geowave_spark.operators import similarity as sim

    vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = sim.sampled_centroids(vecs, n_lists=16)
    head = (
        vecs.orderBy("vec_id").limit(16)
        .select(F.col("embedding").cast("array<double>"))
        .collect()
    )
    assert cents == [list(r[0]) for r in head]

    v = vecs.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    got = {
        r["vec_id"]: r["list_id"]
        for r in sim.assign_lists(v, cents).select("vec_id", "list_id").collect()
    }
    X = np.array(
        [r["_v"] for r in v.orderBy("vec_id").collect()], dtype=np.float64
    )
    C = np.array(cents)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    ids = [r["vec_id"] for r in v.orderBy("vec_id").select("vec_id").collect()]
    assert all(got[i] == int(want[n]) for n, i in enumerate(ids))
    # no shuffle in the assignment plan (pure projection)
    plan = sim.assign_lists(v, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # sampled codebooks = head-id sub-vectors
    books = sim.pq_sample_codebooks(vecs, m=8, k=16)
    assert books.shape == (8, 16, 8)
    assert np.array_equal(books[3], np.array([list(r[0])[24:32] for r in head]))

    # recall of the sampled-IVF (probe 2 of 16) stays usable at sf0.01
    queries = vecs.filter(F.col("vec_id") < 16)
    got_ivf = sim.ivf_ann_topk(vecs, queries, k=10, centroids=cents)
    exact = sim.cosine_topk(vecs, queries, k=10)
    g = {(r["query_id"], r["vec_id"]) for r in got_ivf.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert len(g & e) / len(e) >= 0.2
