"""Hot-key caps in the registered dedup pipeline (r2 review item #4).

The caps have existed since round 2 but the demonstrated configuration ran
with them OFF; they are now wired into the entry queries with a
data-driven default that the DuckDB oracle replicates.  These tests pin:
the cap formula, capped-Jaccard correctness vs a brute-force oracle on a
pathological corpus (one shingle in every doc), and bucket-cap behavior.
"""

from __future__ import annotations

import itertools
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import dedup


def test_default_hot_key_cap_formula():
    assert dedup.default_hot_key_cap(0) == 64
    assert dedup.default_hot_key_cap(6400) == 64
    assert dedup.default_hot_key_cap(6500) == 65
    assert dedup.default_hot_key_cap(1_000_000) == 10_000
    # integer-only (SQL mirror: GREATEST(64, count(*) // 100))
    assert dedup.default_hot_key_cap(199) == 64


def _brute_jaccard(texts: dict, w: int, max_df: int, threshold: float):
    def shingles(t):
        toks = [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split(" ") if x]
        return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}

    sets = {d: shingles(t) for d, t in texts.items()}
    df: dict = {}
    for s in sets.values():
        for sh in s:
            df[sh] = df.get(sh, 0) + 1
    capped = {d: {sh for sh in s if df[sh] <= max_df} for d, s in sets.items()}
    out = set()
    for a, b in itertools.combinations(sorted(capped), 2):
        sa, sb = capped[a], capped[b]
        if not sa or not sb:
            continue
        i = len(sa & sb)
        u = len(sa) + len(sb) - i
        if u and i / u >= threshold:
            out.add((a, b))
    return out


def test_pathological_corpus_capped_jaccard(spark):
    """Every doc shares one boilerplate shingle; with the cap the shingle
    is a stop-shingle and near-dup pairs come only from real overlap."""
    n = 40
    texts = {}
    for i in range(n):
        # boilerplate header in every doc + per-pair real duplication
        body = f"unique{i // 2} content block alpha beta gamma{i // 2}"
        texts[i] = f"common header tag {body}"
    rows = [(i, t) for i, t in texts.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=3)
    got_pairs = {(r["doc_a"], r["doc_b"]) for r in got.collect()}
    want = _brute_jaccard(texts, w=3, max_df=3, threshold=0.5)
    assert got_pairs == want
    # the pairs (2i, 2i+1) share their whole body -> must survive the cap
    assert all((2 * i, 2 * i + 1) in got_pairs for i in range(n // 2))


def test_minhash_bucket_cap_drops_degenerate_bucket(spark):
    """A corpus of identical docs lands in one (band, bucket) group of
    size n; the cap drops it instead of emitting n^2 candidates."""
    same = [(i, "the exact same text repeated many tokens over and over") for i in range(30)]
    other = [(100 + i, f"totally different content number {i} with words {i}") for i in range(4)]
    docs = spark.createDataFrame(same + other, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(docs)
    assert uncapped.count() >= 30 * 29 // 2
    capped = dedup.minhash_lsh_pairs(docs, max_bucket_size=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # every candidate from the degenerate group is gone
    assert not any(a < 100 and b < 100 for a, b in pairs)


def test_entry_queries_run_with_caps_on(spark, sf_dir):
    """The registered queries pass the data-driven cap (the engine's
    demonstrated configuration is the scalable one)."""
    from geowave_spark import entry_queries as eq

    out = eq.q_dedup_jaccard(spark, sf_dir)
    assert out.columns == ["doc_a", "doc_b", "jaccard_mu"]
    out.count()
    out2 = eq.q_dedup_minhash(spark, sf_dir)
    assert out2.columns == ["doc_a", "doc_b"]
    out2.count()


def test_jaccard_prefix_and_count_plans_agree(spark):
    """The data-driven plan switch (sparse -> AllPairs prefix filter,
    dense -> count join) is invisible in the results: both exact plans
    produce identical pairs on a sparse corpus with planted near-dups."""
    import random

    from geowave_spark.operators import dedup

    rng = random.Random(3)
    base = [
        (i, " ".join(f"w{rng.randrange(100000)}" for _ in range(30)))
        for i in range(400)
    ]
    for i in range(380, 400):  # 20 planted near-dups (1 token mutated)
        toks = base[i - 380][1].split()
        toks[0] = "mutated"
        base[i] = (i, " ".join(toks))
    docs = spark.createDataFrame(base, ["doc_id", "text"])
    sparse = sorted(map(tuple, dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()))
    sh = dedup._doc_shingle_hashes(docs, "text", "doc_id", 3).localCheckpoint()
    dense = sorted(map(tuple, dedup._jaccard_count_join(sh, 0.5, 0.5).collect()))
    assert sparse == dense
    assert len(sparse) >= 20
