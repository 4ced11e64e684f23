"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` draws from a partition-seeded RNG: the sample changes with
partitioning, cluster size, and engine — unusable for reproducible corpus
construction or resumable pipelines.  These operators gate on a
deterministic hash of a stable row key instead (the md5-based ``h60`` the
dedup family already uses, with an exact DuckDB twin), so a sample is a
pure function of the data:

* re-runnable — the same rows survive on 1 executor or 1000;
* resumable — a restarted job reproduces the selection with no state;
* auditable — membership is checkable per row.

Scale shape: ``hash_sample`` / ``stratified_sample`` are a single narrow
filter (no shuffle, no RNG, whole rows never leave their scan partition);
``sample_exact_k`` adds one per-stratum window (acceptable because k-exact
semantics require a per-stratum rank; for huge strata prefer the rate
gate).

Reference analog: sampling appears in the reference only as the
KMeans sampling initializer (analytics/mapreduce/.../kmeans/sampling);
these operators are the training-data-pipeline extension of that idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import h60

HASH_SPACE = 1 << 60  # h60 range


def sample_threshold(rate: float) -> int:
    """rate ∈ [0, 1] → integer keep-threshold in the 60-bit hash space.

    Computed driver-side so both the engine and any SQL oracle compare
    against the SAME integer literal — no cross-engine float arithmetic
    in the gate itself.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate!r} outside [0, 1]")
    return int(rate * HASH_SPACE)


def _gate_hash(key_col: Column, salt: str) -> Column:
    # NULL keys hash through a sentinel instead of propagating NULL: a
    # NULL gate would silently DROP every NULL-key row even at rate 1.0
    # (NULL < thr is NULL).  All NULL-key rows share one hash — they
    # survive or drop together, deterministically (keys are meant to be
    # row identities; NULL identities get one collective fate, not a
    # partition-dependent one).
    return h60(
        F.concat(
            F.coalesce(key_col.cast("string"), F.lit("__null_key__")),
            F.lit(":" + salt),
        )
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep rows where h60(key:salt) < rate·2^60 — a deterministic
    Bernoulli(rate) sample keyed on row identity.

    ``salt`` decorrelates independent samples over the same keys (e.g.
    train/holdout splits use different salts).
    """
    thr = sample_threshold(rate)
    return df.filter(_gate_hash(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates — the corpus-mixing primitive
    (downsample crawl, keep all wiki, drop boilerplate sources, ...).

    One narrow filter: stratum → integer threshold via a CASE chain
    (JVM-side, codegen), hash gate as in :func:`hash_sample`.
    """
    thr_default = F.lit(sample_threshold(default_rate))
    thr: Column = thr_default
    for stratum, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(sample_threshold(rate))
        ).otherwise(thr)
    return df.filter(_gate_hash(F.col(key_col), salt) < thr)


def sample_exact_k(
    df: DataFrame,
    k: int,
    strata_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order —
    a deterministic reservoir: the winning set is independent of
    partitioning and stable under corpus growth (a row only drops out when
    a lower-hash row arrives).

    One shuffle on the stratum key; the window ranks by (hash, key,
    row-fingerprint) — the key tiebreak makes a 60-bit hash collision
    deterministic, and the full-row fingerprint makes DUPLICATE keys
    (contract violations, but they happen) order by row VALUES instead of
    partition arrival order, keeping the selection a pure function of the
    data.
    """
    fp = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    w = Window.partitionBy(strata_col).orderBy("_g", key_col, "_fp")
    return (
        df.withColumn("_g", _gate_hash(F.col(key_col), salt))
        .withColumn("_fp", fp)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_g", "_rk", "_fp")
    )
