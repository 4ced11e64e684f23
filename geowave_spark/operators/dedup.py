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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD40 = 1 << 40  # fingerprint modulus — keeps the rolling hash in int64


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


def _doc_shingles(docs: DataFrame, text_col: str, id_col: str, w: int) -> DataFrame:
    """(doc_id, shingle) distinct."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), shingles_col(tokens_col(F.col(text_col)), w).alias("_sh"))
        .select("doc_id", F.explode("_sh").alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over w-token shingles.

    Classic token-join: shingle-level self-equi-join → per-pair intersection
    counts → |A∩B| / (|A|+|B|−|A∩B|).  Output (doc_a, doc_b, jaccard_mu)
    with jaccard in exact integer micro-units.
    """
    sh = _doc_shingles(docs, text_col, id_col, w)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return (
        j.filter(F.col("jaccard") >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)).cast("long").alias("jaccard_mu"),
        )
    )


def minhash_signatures(
    docs: DataFrame, n_perm: int = 16, w: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, perm, sig): sig = min over shingles of h60(perm ':' shingle)."""
    sh = _doc_shingles(docs, text_col, id_col, w)
    return (
        sh.withColumn("perm", F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))))
        .withColumn("sig", h60(F.concat_ws(":", F.col("perm"), F.col("shingle"))))
        .groupBy("doc_id", "perm")
        .agg(F.min("sig").alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >=1 LSH band bucket.

    Band bucket = h60 of the band's signature values joined in perm order —
    the band-hash → bucket-equi-join plan; a banded self-join shuffles only
    (band, bucket) keys, never the corpus text.
    """
    rows_per_band = n_perm // bands
    sig = minhash_signatures(docs, n_perm, w, text_col, id_col)
    buckets = (
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
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash64(docs: DataFrame, bits: int = 60, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): per-bit majority vote over distinct-token h60s."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .distinct()
        .withColumn("h", h60(F.col("tok")))
    )
    votes = (
        toks.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))))
        .withColumn(
            "v",
            F.when(F.expr("shiftrightunsigned(h, j)").bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("v").alias("s"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bits: int = 60,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by chunk-equality banding (pigeonhole: <= 3 bit
    errors across 4 chunks guarantee one equal 15-bit chunk), then exact
    hamming verify via bit_count(xor) — never a full cross join.
    """
    chunk_bits = bits // bands
    sh = simhash64(docs, bits, text_col, id_col)
    chunks = sh.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))).withColumn(
        "chunk",
        F.expr(f"shiftrightunsigned(simhash, band * {chunk_bits})").bitwiseAND(
            F.lit((1 << chunk_bits) - 1)
        ),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.chunk") == F.col("b.chunk")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("_sa"),
            F.col("b.simhash").alias("_sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
