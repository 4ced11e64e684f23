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
