"""Benchmark decontamination (train/test n-gram overlap): exactness vs a
local python oracle, and the benchmark-side stop-shingle cap."""

from __future__ import annotations

import os
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import dedup


def _py_ngrams(text: str, w: int) -> set[tuple[str, ...]]:
    toks = [t for t in re.split(r"\W+", text.lower()) if t]
    return {tuple(toks[i : i + w]) for i in range(len(toks) - w + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated text about spark partitions and shuffles"),
    (3, "the quick brown fox naps all day long instead"),
    (4, "boiler plate header boiler plate header boiler plate header"),
    (5, "short"),
]
BENCH = [
    (100, "quick brown fox jumps over the lazy dog"),
    (101, "boiler plate header appears everywhere in every page footer"),
    (102, "spark partitions and shuffles explained for benchmarks"),
]


def test_decontaminate_matches_python_oracle(spark):
    w = 4
    corpus = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in dedup.decontaminate_ngrams(corpus, bench, w=w).collect()
    }
    want = {}
    for cid, ctext in CORPUS:
        cg = _py_ngrams(ctext, w)
        for bid, btext in BENCH:
            shared = len(cg & _py_ngrams(btext, w))
            if shared:
                want[(cid, bid)] = shared
    assert got == want and got  # non-empty and exact


def test_bench_df_cap_drops_boilerplate(spark):
    # a shingle present in EVERY benchmark doc carries no signal; the cap
    # removes it before the join
    w = 2
    bench = spark.createDataFrame(
        [(i, f"common prefix unique{i} tail") for i in range(5)],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame([(1, "common prefix nothing else")], ["doc_id", "text"])
    uncapped = dedup.decontaminate_ngrams(corpus, bench, w=w)
    assert uncapped.count() == 5  # "common prefix" matches every bench doc
    capped = dedup.decontaminate_ngrams(corpus, bench, w=w, max_bench_df=1)
    assert capped.count() == 0


def test_contaminated_doc_flagging(spark, sf_dir):
    """End-to-end on the synthetic documents table: any returned pair must
    actually share a w-gram (spot re-verified in python)."""
    from geowave_spark import entry_queries as eq

    docs = eq._docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    corpus = docs.filter(F.col("doc_id") % 40 != 0)
    pairs = dedup.decontaminate_ngrams(corpus, bench, w=eq.DECON_W).collect()
    assert pairs
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in pairs[:10]:
        shared = _py_ngrams(texts[r["doc_id"]], eq.DECON_W) & _py_ngrams(
            texts[r["bench_id"]], eq.DECON_W
        )
        assert shared, (r["doc_id"], r["bench_id"])
