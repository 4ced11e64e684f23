"""Text analysis over the documents table — language-ID, quality scoring,
token counting, document fingerprinting.

Training-data-pipeline operators (not in the geospatial reference — added
per the engine's large-scale-corpus mandate).  All pure column algebra:
tokenize once, fold with `aggregate`/`transform` — zero Python in the data
path, exact DuckDB oracles (ratios in integer micro-units).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MOD40, h60, tokens_col

# tiny stopword sets for the n-gram-free language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "du", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "del", "en"],
}


def _micros(col: Column) -> Column:
    return F.floor(col * 1e6 + F.lit(0.5)).cast("long")


def _hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality metrics: token/char counts, mean token length,
    stopword ratio, alphabetic ratio — the usual corpus-filter features."""
    toks = tokens_col(F.col(text_col))
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        toks.alias("_toks"),
    )
    n_tokens = F.size("_toks")
    tok_chars = F.aggregate(
        F.transform(F.col("_toks"), lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    alpha_chars = F.length(F.regexp_replace(F.lower(F.col("_t")), "[^a-z]", ""))
    return d.select(
        "doc_id",
        F.length("_t").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        _micros(tok_chars / F.greatest(n_tokens, F.lit(1))).alias("avg_token_len_mu"),
        _micros(_hits(F.col("_toks"), STOPWORDS["en"]) / F.greatest(n_tokens, F.lit(1))).alias(
            "stopword_ratio_mu"
        ),
        _micros(alpha_chars / F.greatest(F.length("_t"), F.lit(1))).alias("alpha_ratio_mu"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language guess with deterministic tie-break (language
    code ascending wins ties; 'und' when no stopword hits at all)."""
    toks = tokens_col(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    langs = sorted(STOPWORDS)
    scored = d.select(
        "doc_id",
        *[_hits(F.col("_toks"), STOPWORDS[g]).cast("long").alias(f"_{g}") for g in langs],
    )
    best = F.greatest(*[F.col(f"_{g}") for g in langs])
    guess = F.lit("und")
    for g in reversed(langs):  # earlier language wins ties → apply last
        guess = F.when((F.col(f"_{g}") == best) & (best > 0), F.lit(g)).otherwise(guess)
    return scored.select("doc_id", guess.alias("lang_guess"), best.alias("hits"))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (ceil(len/4) pieces
    per token — a stand-in for a real BPE vocab at identical plan shape)."""
    toks = tokens_col(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    bpe = F.aggregate(
        F.transform(F.col("_toks"), lambda x: (F.length(x) + 3).cast("long") / F.lit(4)),
        F.lit(0).cast("long"),
        lambda a, x: a + F.floor(x).cast("long"),
    )
    return d.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling-hash fingerprint of the token stream:
    f = fold(tokens, 0, (acc, t) -> (acc*31 + h60(t)) mod 2^40)."""
    toks = tokens_col(F.col(text_col))
    d = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    fp = F.aggregate(
        F.transform(F.col("_toks"), lambda x: h60(x)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(MOD40),
    )
    return d.select("doc_id", fp.alias("fingerprint"))
