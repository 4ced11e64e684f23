"""Document deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash.

These are the training-data-pipeline operators a 100 TB corpus engine needs
alongside the spatial core.  Design rules:

* everything is built-in `pyspark.sql.functions` column algebra (JVM-side,
  whole-stage codegen) — no Python UDFs anywhere in this module;
* the only hash primitive is a cross-engine-deterministic 60-bit hash
  ``h60(s) = conv(substr(md5(s),1,15),16,10)`` so every operator has an
  exact DuckDB oracle (see entry_queries.py);
* all pair outputs are (doc_a < doc_b) and deduped;
* at scale the shuffles are: tokenize (none — narrow), explode shingles →
  groupBy (map-side partial agg), band-bucket self-join (AQE skew-handled).

Semantics follow the standard MinHash/LSH construction (Broder '97) and
SimHash (Charikar '02) — public algorithms, no reference-code derivation:
the reference engine has no text dedup at all (SURVEY.md §2.4 note); these
extend the engine for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MOD40 = 1 << 40  # fingerprint modulus — keeps the rolling hash in int64


def default_hot_key_cap(n_docs: int) -> int:
    """Data-driven stop-shingle / hot-bucket cap: ~1% of the corpus with a
    floor of 64.  A shingle (or LSH bucket) shared by >1% of documents
    carries ~zero near-dup signal while costing O(df²) candidate rows; the
    1% ceiling bounds the worst join group at (n/100)² ≪ n².  Integer-only
    (floor division) so the DuckDB oracle reproduces it exactly via
    ``GREATEST(64, count(*) // 100)``."""
    return max(64, int(n_docs) // 100)


def pair_budget(pairs: DataFrame, max_pairs: int | None, order_cols) -> DataFrame:
    """Deterministic pair budget: keep the top ``max_pairs`` rows by
    ``order_cols`` (strongest matches first, id tie-broken) — a global
    TakeOrdered, one scalable reduction.

    Why: pair output is quadratic on dup-dense corpora (measured 136.5M
    pairs from 500k docs at sf10), so at corpus scale the *_pairs
    operators are verification artifacts and the documented contract is
    the CLUSTER level (dedup_clusters / dedup_keep_best — linear output).
    A consumer that still wants pairs opts into an explicit budget here;
    the active budget is logged."""
    if max_pairs is None:
        return pairs
    import logging

    logging.getLogger(__name__).info(
        "pair budget active: emitting at most %d strongest pairs", max_pairs
    )
    return pairs.orderBy(*order_cols).limit(int(max_pairs))


def h60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (same value in DuckDB
    via ``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    """Canonical tokenization: lowercase, split on non-alphanumeric runs.

    Mirrored exactly by the DuckDB oracle
    (``string_split_regex(regexp_replace(lower(t),'[^a-z0-9]+',' ','g'),' ')``).
    """
    arr = F.split(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "), " ")
    return F.filter(arr, lambda x: x != "")


def shingles_col(toks: Column, w: int = 3) -> Column:
    """w-token shingles joined by single spaces (empty when < w tokens).

    Guarded: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    docs must short-circuit to an empty array.
    """
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - (w - 1)),
        lambda i: F.array_join(F.slice(toks, i, w), " "),
    )
    return F.when(n >= w, sh).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one keeper per distinct text."""
    return (
        docs.select(h60(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _doc_shingle_hashes(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(doc_id, h) distinct — shingle hashes computed ARITHMETICALLY from
    per-token hashes, never materializing shingle strings:

        h(shingle i) = fold over w tokens of (acc*31 + h60(tok)) mod 2^40

    One md5 per token (not per shingle), and the shingle step is pure int64
    array math.  40-bit space ⇒ ~0.03 expected collisions at 260k shingles,
    and the oracle computes the identical function, so any collision is
    shared — parity stays exact.  The _th array is materialized as a column
    so the outer transform references an attribute (inlining it would
    re-run the md5 map per shingle index).
    """
    toks = docs.select(F.col(id_col).alias("doc_id"), tokens_col(F.col(text_col)).alias("_toks"))
    th = toks.select("doc_id", F.transform(F.col("_toks"), lambda x: h60(x)).alias("_th"))
    n = F.size(F.col("_th"))

    def shingle_hash(i):
        acc = F.lit(0).cast("long")
        for j in range(w):
            acc = (acc * 31 + F.element_at(F.col("_th"), i + j)) % F.lit(MOD40)
        return acc

    sh = F.when(
        n >= w, F.transform(F.sequence(F.lit(1), n - (w - 1)), shingle_hash)
    ).otherwise(F.array().cast("array<long>"))
    return th.select("doc_id", F.explode(sh).alias("h")).distinct()


def dedup_keep_best(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 16,
    bands: int = 4,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Quality-aware canonical selection — the end-to-end shape a corpus
    builder actually runs: cluster near-dups (`dedup_clusters`), then keep
    ONE representative per cluster, preferring the longest document
    (ties → smallest id; length is the standard keep-the-superset heuristic
    for near-dup groups).

    Output: the kept rows as (doc_id, n_chars).  Scale: adds one
    per-cluster top-1 window over the cluster output (clusters are tiny;
    the window partitions by canonical_id, so it parallelizes across
    clusters).
    """
    cl = dedup_clusters(docs, threshold, n_perm, bands, w, text_col, id_col, max_iter)
    # dedup_clusters emits its id column under the caller's id_col name —
    # join/select on that, not a hardcoded "doc_id"
    scored = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )
    j = cl.join(scored, id_col)
    win = Window.partitionBy("canonical_id").orderBy(
        F.desc("n_chars"), F.asc(id_col)
    )
    return (
        j.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .select(id_col, "n_chars")
    )


P61 = (1 << 61) - 1  # Mersenne prime modulus for the affine perm hashes
_M30 = (1 << 30) - 1


def perm_coeffs(n_perm: int) -> list[tuple[int, int, int]]:
    """Deterministic (a, b, c) coefficients < 2^30 for the affine universal
    hash family g_i(h) = (a_i*hi + b_i*lo + c_i) mod (2^61-1), where
    hi/lo split h's 60 bits.  All products stay < 2^60 — exact int64 in
    both engines; md5-derived so the oracle replicates the literals."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return [
        (h(f"mh:{i}:a") % (1 << 30) | 1, h(f"mh:{i}:b") % (1 << 30) | 1, h(f"mh:{i}:c") % (1 << 30))
        for i in range(n_perm)
    ]


def decontaminate_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    max_bench_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any w-token
    n-gram with an evaluation-set document (the standard train/test overlap
    sweep run before LLM training; 8-13 token windows are the common
    convention).

    Scale shape: the benchmark side (eval sets — thousands of docs, tiny
    next to a 100 TB corpus) is reduced to DISTINCT shingle hashes and
    BROADCAST; the corpus streams through one narrow tokenize + arithmetic
    shingle pass (one md5 per token, `_doc_shingle_hashes`) into a
    broadcast hash join — the only shuffle is the final map-side-combined
    count per (corpus doc, benchmark doc).

    ``max_bench_df``: optionally drop benchmark shingles appearing in more
    than this many benchmark docs (boilerplate carries no contamination
    signal and only fans out the join) — the same stop-shingle cap as
    ngram_jaccard_pairs.

    Output: (doc_id, bench_id, n_shared) — count of distinct shared
    w-gram hashes; any row at all marks the corpus doc contaminated.
    """
    c = _doc_shingle_hashes(corpus, text_col, id_col, w)
    b = _doc_shingle_hashes(benchmark, text_col, bench_id_col, w).withColumnRenamed(
        "doc_id", "bench_id"
    )
    if max_bench_df is not None:
        wdf = Window.partitionBy("h")
        b = b.withColumn("_df", F.count(F.lit(1)).over(wdf)).filter(
            F.col("_df") <= max_bench_df
        ).drop("_df")
    j = c.join(F.broadcast(b), "h")
    return j.groupBy("doc_id", "bench_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    max_pairs: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over w-token shingles.

    ``max_pairs``: optional deterministic output budget (strongest pairs
    first) — see :func:`pair_budget`; cluster labels are the corpus-scale
    contract, pair sets the verification artifact.

    Classic token-join: shingle-level self-equi-join → per-pair intersection
    counts → |A∩B| / (|A|+|B|−|A∩B|).  Output (doc_a, doc_b, jaccard_mu)
    with jaccard in exact integer micro-units.

    ``max_df``: drop shingles whose document frequency exceeds it BEFORE the
    self-join (sizes and intersections both computed on the capped shingle
    sets, so the Jaccard stays internally consistent).  A boilerplate shingle
    shared by 10^6 docs would otherwise create a 10^12-row join group while
    carrying ~zero Jaccard signal — the standard stop-shingle cap for
    corpus-scale dedup.  None = exact, uncapped.

    Scale design — two exact plans, chosen from corpus statistics:

    * SPARSE corpora (web-scale text: huge shingle vocab, mean df ~1-2) →
      AllPairs prefix filtering (Bayardo, Ma & Srikant, WWW'07): each doc
      joins only on its |x| - ceil(t*|x|) + 1 RAREST shingles; docs with
      Jaccard >= t and compatible sizes (min >= t*max, Arasu et al.'s size
      filter) provably share a prefix shingle, and the verify computes the
      true intersection via array_intersect on per-doc set arrays — one
      JVM row per candidate pair.
    * DENSE corpora (small vocab, docs share most shingles) → the classic
      count-based join: self-equi-join on ALL shingles, map-side-combined
      groupBy(pair) count = |A∩B|.  On dense data prefix filtering
      degenerates (measured at sf1: 57M candidate pairs for 2.5k outputs,
      with a 60x60 array_intersect each — 5x slower than counting).

    The switch is mean document frequency (rows / distinct shingles) from
    a one-row aggregate over the df frame the cap needs anyway.
    """
    t = float(threshold)
    sh = _doc_shingle_hashes(docs, text_col, id_col, w)
    # ONE shingle-df aggregate serves the cap, the plan-choice statistic,
    # AND (sparse branch) the rarest-first canonical order: dropping a
    # shingle removes ALL its rows, so surviving shingles keep their
    # pre-cap df — no post-cap recount needed
    dfc = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        dfc = dfc.filter(F.col("_df") <= max_df)
    # dfc stays lazy: the one driver action below doubles as the plan
    # chooser, and the (cheap, map-side-combined) agg recomputes inside
    # the main job rather than paying a separate materialization job
    nrows, ndist = dfc.agg(F.sum("_df"), F.count(F.lit(1))).first()
    if not nrows:
        return (
            docs.select(
                F.col(id_col).alias("doc_a"),
                F.col(id_col).alias("doc_b"),
                F.lit(0).cast("long").alias("jaccard_mu"),
            ).limit(0)
        )
    if max_df is not None:
        sh = sh.join(dfc.select("h"), "h", "left_semi")
    # sh feeds several plan branches — materialize once; the blocks are
    # ContextCleaner-reclaimed instead of pinned for the session
    sh = sh.localCheckpoint()
    if nrows / ndist <= PREFIX_FILTER_MAX_MEAN_DF:
        out = _jaccard_prefix_filtered(sh, dfc, t, threshold)
    else:
        out = _jaccard_count_join(sh, t, threshold)
    return pair_budget(
        out, max_pairs, [F.col("jaccard_mu").desc(), "doc_a", "doc_b"]
    )


# mean shingle document-frequency above which the AllPairs prefix-filter
# plan degenerates (candidates ~ output of the unfiltered join) and the
# count-based plan wins; real web corpora sit at ~1-2, the adversarial
# small-vocab fixtures at ~100+
PREFIX_FILTER_MAX_MEAN_DF = 8.0


def _jaccard_mu(j: DataFrame, threshold: float) -> DataFrame:
    return (
        j.filter(F.col("jaccard") >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)).cast("long").alias("jaccard_mu"),
        )
    )


def _jaccard_count_join(sh: DataFrame, t: float, threshold: float) -> DataFrame:
    """Dense-corpus plan: per-pair intersection counts from the full
    shingle self-join (map-side-combined aggregate, no arrays)."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return _jaccard_mu(j, threshold)


def _jaccard_prefix_filtered(sh: DataFrame, dfc: DataFrame, t: float, threshold: float) -> DataFrame:
    """Sparse-corpus plan: AllPairs prefix filtering + array verify."""
    sh2 = sh.join(dfc, "h")
    # one row per doc: full shingle-set array + rarest-first prefix.
    # localCheckpoint: feeds the prefix explode AND both verify sides.
    hs_sorted = F.transform(F.sort_array(F.collect_list(F.struct("_df", "h"))), lambda s: s["h"])
    dsets = (
        sh2.groupBy("doc_id")
        .agg(hs_sorted.alias("_hs"), F.count(F.lit(1)).alias("n_sh"))
        .withColumn("_plen", (F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(t)) + 1).cast("int"))
        .withColumn("_pref", F.slice(F.col("_hs"), F.lit(1), F.col("_plen")))
        .select("doc_id", "n_sh", "_hs", "_pref")
        .localCheckpoint()
    )
    pref = dsets.select("doc_id", "n_sh", F.explode("_pref").alias("h"))
    a = pref.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"), "h")
    b = pref.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"), "h")
    cand = (
        a.join(b, "h")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # size filter: J <= min/max, so J >= t needs min >= t*max
            & (F.col("na").cast("double") >= F.col("nb") * F.lit(t))
            & (F.col("nb").cast("double") >= F.col("na") * F.lit(t))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    va = dsets.select(F.col("doc_id").alias("doc_a"), F.col("_hs").alias("_ha"), F.col("n_sh").alias("na"))
    vb = dsets.select(F.col("doc_id").alias("doc_b"), F.col("_hs").alias("_hb"), F.col("n_sh").alias("nb"))
    j = (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect(F.col("_ha"), F.col("_hb"))))
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return _jaccard_mu(j, threshold)


def minhash_signatures(
    docs: DataFrame, n_perm: int = 16, w: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, perm, sig): sig = min over shingles of the affine perm hash.

    One md5 per shingle; the n_perm permutations are pure int64 column
    arithmetic (a*hi + b*lo + c mod 2^61-1) — ~n_perm× cheaper than
    hashing each (perm, shingle) pair.
    """
    sh = _doc_shingle_hashes(docs, text_col, id_col, w)
    perms = F.array(
        *[
            F.struct(
                F.lit(i).alias("perm"),
                F.lit(a).cast("long").alias("a"),
                F.lit(b).cast("long").alias("b"),
                F.lit(c).cast("long").alias("c"),
            )
            for i, (a, b, c) in enumerate(perm_coeffs(n_perm))
        ]
    )
    hi = F.expr("shiftrightunsigned(h, 30)")
    lo = F.col("h").bitwiseAND(F.lit(_M30))
    return (
        sh.withColumn("_p", F.explode(perms))
        .select(
            "doc_id",
            F.col("_p.perm").alias("perm"),
            ((F.col("_p.a") * hi + F.col("_p.b") * lo + F.col("_p.c")) % F.lit(P61)).alias("g"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("g").alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    max_pairs: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band bucket.

    ``max_pairs``: optional deterministic output budget (id order) — see
    :func:`pair_budget`.

    Band bucket = h60 of the band's signature values joined in perm order —
    the band-hash → bucket-equi-join plan; a banded self-join shuffles only
    (band, bucket) keys, never the corpus text.

    ``max_bucket_size``: drop (band, bucket) groups larger than the cap
    before the self-join — a degenerate bucket of n docs otherwise emits
    n² candidate rows.  Recall semantics only (candidates lost from giant
    buckets are overwhelmingly re-found via their other bands); the number
    of dropped buckets is logged.  None = uncapped.
    """
    if bands <= 0 or n_perm % bands:
        # a remainder would create a silent extra band the pair-emission
        # stage never reads (recall loss), and bands > n_perm divides by 0
        raise ValueError(
            f"n_perm={n_perm} must be a positive multiple of bands={bands}"
        )
    rows_per_band = n_perm // bands
    sig = minhash_signatures(docs, n_perm, w, text_col, id_col)
    buckets_base = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "sig"))),
                    lambda x: x["sig"].cast("string"),
                ),
                ",",
            ).alias("_bandsig")
        )
        .withColumn("bucket", h60(F.col("_bandsig")))
        .select("doc_id", "band", "bucket")
    )
    # both self-join sides would recompute the full signature pipeline —
    # materialize once; ContextCleaner reclaims the blocks on GC
    buckets = buckets_base.localCheckpoint()
    if max_bucket_size is not None:
        bsizes = buckets.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        n_dropped = bsizes.filter(F.col("_n") > max_bucket_size).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_pairs: dropping %d hot buckets (> %d members)",
                n_dropped, max_bucket_size,
            )
        buckets = buckets.join(
            bsizes.select("band", "bucket", (F.col("_n") <= max_bucket_size).alias("_kept")),
            ["band", "bucket"],
        )
    else:
        buckets = buckets.withColumn("_kept", F.lit(True))
    # exactly-once emission (no candidate-pair distinct shuffle): pivot to
    # one (bucket, kept) array row per doc, join per KEPT band, and keep a
    # pair only at the FIRST band whose buckets agree AND survive the cap.
    # Kept-ness is a property of the shared (band, bucket), so both docs
    # agree on it wherever their buckets are equal — "first kept matching
    # band" is exact even under hot-bucket dropping.  At corpus scale the
    # candidate distinct is the dominant exchange (136.5M output pairs at
    # 500k docs measured): same fix as the spatial joins' reference point.
    bks = buckets.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("band", "bucket", "_kept"))).alias("_s")
    ).select(
        "doc_id",
        F.transform(F.col("_s"), lambda s: s["bucket"]).alias("_bks"),
        F.transform(F.col("_s"), lambda s: s["_kept"]).alias("_ks"),
    )
    a = (
        bks.select(F.col("doc_id").alias("doc_a"), F.col("_bks").alias("_ba"), F.col("_ks").alias("_ka"))
        .withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .filter(F.element_at(F.col("_ka"), F.col("band") + 1))
        .withColumn("bucket", F.element_at(F.col("_ba"), F.col("band") + 1))
    )
    b = (
        bks.select(F.col("doc_id").alias("doc_b"), F.col("_bks").alias("_bb"), F.col("_ks").alias("_kb"))
        .withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .filter(F.element_at(F.col("_kb"), F.col("band") + 1))
        .withColumn("bucket", F.element_at(F.col("_bb"), F.col("band") + 1))
    )
    j = a.join(b, ["band", "bucket"]).filter(F.col("doc_a") < F.col("doc_b"))
    first_eq = F.lit(bands - 1)
    for bb in range(bands - 2, -1, -1):
        eq = (
            F.element_at(F.col("_ba"), bb + 1) == F.element_at(F.col("_bb"), bb + 1)
        ) & F.element_at(F.col("_ka"), bb + 1)
        first_eq = F.when(eq, F.lit(bb)).otherwise(first_eq)
    out = j.filter(F.col("band") == first_eq).select("doc_a", "doc_b")
    return pair_budget(out, max_pairs, ["doc_a", "doc_b"])


def dedup_clusters(
    docs: DataFrame,
    threshold: float = 0.5,
    n_perm: int = 16,
    bands: int = 4,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """End-to-end near-dup clustering: (doc_id, canonical_id).

    The production corpus-dedup pipeline shape:
      1. MinHash+LSH candidate pairs (band-bucket equi-join — never a
         cross join);
      2. exact Jaccard verify on candidates only;
      3. connected components over verified pairs (iterative min-label
         propagation, localCheckpoint per round);
      4. canonical = min doc_id per component; singletons map to
         themselves.

    Deterministic; exact equality with a local union-find oracle is
    pinned in tests.
    """
    cands = minhash_lsh_pairs(docs, n_perm, bands, w, text_col, id_col)
    # persist (not localCheckpoint): sh is read 3x (self-join + sizes) but
    # needs no lineage truncation, and persist() is releasable below —
    # unpersist() on a localCheckpoint'd frame is a silent no-op
    sh = _doc_shingle_hashes(docs, text_col, id_col, w).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        cands.join(a, cands.doc_a == F.col("a.doc_id"))
        .join(b, (cands.doc_b == F.col("b.doc_id")) & (F.col("a.h") == F.col("b.h")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verified = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .filter(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")) >= F.lit(threshold))
        .select("doc_a", "doc_b")
        .persist()
    )

    labels = label_components(
        docs.select(F.col(id_col).alias("doc_id")), verified, max_iter=max_iter
    )
    # labels is localCheckpoint-materialized — the cached build frames are
    # no longer reachable from the result; release them deterministically
    for frame in (verified, sh):
        frame.unpersist()
    return labels.select(F.col("doc_id").alias(id_col), "canonical_id")


def label_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``nodes``: one column ``doc_id`` (every vertex, including singletons);
    ``pairs``: columns ``doc_a``, ``doc_b`` — undirected edges, either or
    both orientations.  Returns (doc_id, canonical_id) where canonical_id
    is the component-minimum doc_id; singletons map to themselves.

    The loop shape scales: each round is one equi-join + map-side-combined
    min agg, localCheckpoint'd so the lineage stays flat; convergence is
    detected with a limit(1) existence probe, never a full count.  Rounds
    needed = component hop-diameter (the reference's analytics CC is the
    same fixpoint — analytics/.../kmeans has no CC; this mirrors the
    standard Spark connected-components construction).  Shared by text
    near-dup clustering (`dedup_clusters`) and image perceptual clustering
    (`functions.phash.image_neardup_clusters`) so both payloads take one
    audited plan."""
    labels = nodes.select("doc_id").withColumn("label", F.col("doc_id"))
    edges = pairs.select("doc_a", "doc_b").unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    changed = 0
    for _ in range(max_iter):
        prop = (
            edges.join(labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("label", "_nl"), "doc_b")
            .groupBy("doc_a")
            .agg(F.min("_nl").alias("_minl"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        new_labels = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("_minl"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # a chain-shaped component deeper than max_iter hops did not
        # converge — surface it rather than silently mislabel
        raise RuntimeError(
            f"label_components: label propagation did not converge in {max_iter} "
            "rounds (component hop-diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("doc_id", F.col("label").alias("canonical_id"))


def simhash64(docs: DataFrame, bits: int = 60, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over distinct-token h60s.

    One aggregate, ``bits`` conditional sums: per-doc token distinctness
    is array_distinct (per-row JVM, no shuffle) and the per-bit votes are
    popcount columns in a single map-side-combined groupBy — the exchange
    carries |docs| x (bits+1) longs, never |docs| x |tokens| x bits rows
    (the former per-(doc, bit) explode was the pipeline's hottest shuffle:
    90M rows at sf1 for a 50k-doc corpus).  Majority rule unchanged:
    bit j set iff 2*count(bit set) > n_tokens (ties -> 0)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"),
    ).withColumn("h", h60(F.col("tok")))
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(F.expr(f"shiftrightunsigned(h, {j}) & 1").cast("int")).alias(f"_c{j}")
        for j in range(bits)
    ]
    g = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"_c{j}") * 2 > F.col("_n"), F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return g.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 60,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    signatures: DataFrame | None = None,
    max_pairs: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    ``max_pairs``: optional deterministic output budget (closest pairs
    first) — see :func:`pair_budget`.

    ``signatures``: precomputed (doc_id, simhash) frame (skips the
    simhash64 pass — callers that also emit the signatures reuse it).

    Candidate generation by chunk-equality banding (pigeonhole: <= 3 bit
    errors across 4 chunks guarantee one equal 15-bit chunk), then exact
    hamming verify via bit_count(xor) — never a full cross join.

    ``max_bucket_size`` caps a (band, chunk) group (counted in DOCS, as
    before) before the self-join (same hot-bucket guard as
    minhash_lsh_pairs — recall-only semantics, drops logged).

    Scale design: the banded self-join runs over DISTINCT simhash VALUES,
    not docs — on vocab-limited corpora thousands of docs share a hash, so
    the doc-level join was quadratic in group size before its .distinct()
    (854M candidate rows at sf1; 28k distinct values).  Value pairs are
    emitted dedup-free at their FIRST matching band (pure xor bit math —
    no candidate distinct), then fanned back out to doc pairs: the fan-out
    IS the output, so no post-expansion shuffle exists at all.
    """
    # pigeonhole soundness: recall is only guaranteed when more chunks
    # exist than tolerated bit errors (max_hamming errors can corrupt at
    # most max_hamming chunks, leaving >= 1 equal); and bands > bits would
    # give 0-bit chunks where EVERY value pair matches (quadratic blow-up)
    if bands <= max_hamming:
        raise ValueError(
            f"simhash_pairs: bands={bands} must exceed max_hamming={max_hamming} "
            "(pigeonhole: otherwise qualifying pairs can share no chunk)"
        )
    if bands > bits:
        raise ValueError(f"simhash_pairs: bands={bands} > bits={bits}")
    chunk_bits = bits // bands
    mask = (1 << chunk_bits) - 1
    sh = (
        signatures if signatures is not None else simhash64(docs, bits, text_col, id_col)
    ).localCheckpoint()
    sv = sh.groupBy("simhash").agg(F.count(F.lit(1)).alias("_n"))
    chunks = sv.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))).withColumn(
        "chunk",
        F.expr(f"shiftrightunsigned(simhash, band * {chunk_bits})").bitwiseAND(F.lit(mask)),
    )
    if max_bucket_size is not None:
        bsizes = chunks.groupBy("band", "chunk").agg(F.sum("_n").alias("_bn"))
        n_dropped = bsizes.filter(F.col("_bn") > max_bucket_size).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "simhash_pairs: dropping %d hot buckets (> %d members)",
                n_dropped, max_bucket_size,
            )
        chunks = chunks.join(
            bsizes.filter(F.col("_bn") <= max_bucket_size).select("band", "chunk"),
            ["band", "chunk"],
            "left_semi",
        )
    # value self-join INCLUDING the diagonal (_sa == _sb): same-value doc
    # pairs fall out of the same fan-out below (hamming 0, matched at
    # band 0 — or at any surviving band under a cap), so there is no
    # separate within-value branch
    a = chunks.select(F.col("simhash").alias("_sa"), "band", "chunk").alias("a")
    b = chunks.select(F.col("simhash").alias("_sb"), "band", "chunk").alias("b")
    vcand = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("_sa") <= F.col("_sb"))
        .withColumn("_x", F.col("_sa").bitwiseXOR(F.col("_sb")))
    )
    if max_bucket_size is None:
        # exactly-once emission: keep a value pair only at the FIRST band
        # whose chunks agree (chunk of the xor == 0) — no distinct shuffle
        first_eq = F.lit(bands - 1)
        for bb in range(bands - 2, -1, -1):
            zero = F.expr(f"shiftrightunsigned(_x, {bb * chunk_bits})").bitwiseAND(F.lit(mask)) == 0
            first_eq = F.when(zero, F.lit(bb)).otherwise(first_eq)
        vpairs = vcand.filter(F.col("band") == first_eq).select("_sa", "_sb", "_x")
    else:
        # capped path: a band may be dropped, so "first matching band" is
        # no longer well-defined — distinct over the (small) value pairs
        vpairs = vcand.select("_sa", "_sb", "_x").distinct()
    vpairs = vpairs.withColumn("hamming", F.bit_count(F.col("_x"))).filter(
        F.col("hamming") <= max_hamming
    )
    # fan back out to doc pairs — the fan-out IS the output (no shuffle
    # after it); the diagonal keeps each unordered same-value pair once
    da = sh.select(F.col("doc_id").alias("_ida"), F.col("simhash").alias("_sa"))
    db = sh.select(F.col("doc_id").alias("_idb"), F.col("simhash").alias("_sb"))
    out = (
        vpairs.join(da, "_sa").join(db, "_sb")
        .filter((F.col("_sa") != F.col("_sb")) | (F.col("_ida") < F.col("_idb")))
        .select(
            F.least(F.col("_ida"), F.col("_idb")).alias("doc_a"),
            F.greatest(F.col("_ida"), F.col("_idb")).alias("doc_b"),
            "hamming",
        )
    )
    return pair_budget(out, max_pairs, ["hamming", "doc_a", "doc_b"])
