"""Kernel density estimation over the tile grid — the reference's KDE
pipeline (analytics/spark/.../kde/KDERunner.java:234-316,458-549; kernel
analytics/mapreduce/.../kde/GaussianFilter.java:81-156) as one declarative
plan:

    per point: cell (x, y) on the level-ℓ grid (2^(ℓ+1) × 2^ℓ)
    explode a (2r+1)² literal offset table with gaussian weights
      (σ=1 cell, radius 3 — GaussianFilter's smear)       — JVM-only
    groupBy(cell) sum(weight)          (map-side partial agg soaks the 49×)
    normalized = weight / max() over ()                    (global max)
    percentile = percent_rank() over (order by weight)     (rank semantics
      of KDERunner.java:252-291: sortByKey desc + zipWithIndex)

Output = the reference's 3 bands (Weight, Normalized, Percentile) as columns
of a (level, x, y) row — the columnar twin of its 3-band raster tile.
Everything is built-in SQL; the oracle (DuckDB) runs the same algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spatial_join import add_point_cols

RADIUS = 3  # cells, like GaussianFilter
SIGMA = 1.0


def gaussian_offsets(radius: int = RADIUS, sigma: float = SIGMA) -> list[tuple[int, int, float]]:
    out = []
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            out.append((dx, dy, math.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))))
    return out


def kde(
    points: DataFrame,
    level: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius: int = RADIUS,
    sigma: float = SIGMA,
) -> DataFrame:
    """(level, x, y, weight, normalized, percentile) KDE surface."""
    nx, ny = 1 << (level + 1), 1 << level
    pts = add_point_cols(points, lon_col, lat_col)
    cx = F.least(
        F.greatest(F.floor((F.col(lon_col) + 180.0) / 360.0 * nx).cast("long"), F.lit(0)),
        F.lit(nx - 1),
    )
    cy = F.least(
        F.greatest(F.floor((F.col(lat_col) + 90.0) / 180.0 * ny).cast("long"), F.lit(0)),
        F.lit(ny - 1),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).alias("w"))
            for dx, dy, w in gaussian_offsets(radius, sigma)
        ]
    )
    smeared = (
        pts.select(cx.alias("_cx"), cy.alias("_cy"))
        .withColumn("_o", F.explode(offs))
        .select(
            F.pmod(F.col("_cx") + F.col("_o.dx"), F.lit(nx)).alias("x"),  # lon wraps
            (F.col("_cy") + F.col("_o.dy")).alias("y"),
            F.col("_o.w").alias("w"),
        )
        .filter((F.col("y") >= 0) & (F.col("y") < ny))  # lat clamps
    )
    agg = smeared.groupBy("x", "y").agg(F.sum("w").alias("weight"))
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(F.col("weight").asc())
    return (
        agg.withColumn("level", F.lit(level))
        .withColumn("normalized", F.col("weight") / F.max("weight").over(w_all))
        .withColumn("percentile", F.percent_rank().over(w_rank))
        .select("level", "x", "y", "weight", "normalized", "percentile")
    )


def add_percentile_scalable(agg: DataFrame, weight_col: str = "weight_mu") -> DataFrame:
    """Scalable global rank/percentile — no single-partition window.

    ``percent_rank() OVER (ORDER BY w)`` funnels every row through ONE
    window partition; at 100 TB that stage is the bottleneck.  The
    reference's own KDE does a distributed sort + zipWithIndex
    (RangePartitioner + sortByKey, KDERunner.java:252-259); the DataFrame
    twin:

      1. repartitionByRange(weight) + sortWithinPartitions — a distributed
         range sort;
      2. per-partition row counts (tiny collect) → cumulative offsets;
      3. global index = partition offset + local row_number (window
         PARTITIONED BY the range partition — parallel, not global);
      4. percent_rank = (index - ties_adjust) / (n - 1) with
         min-rank-per-weight tie semantics, matching percent_rank exactly
         (equality asserted in tests).

    Returns agg plus ``pct_mu`` and ``norm_mu`` (normalized uses a scalar
    max — broadcast literal, not a window).
    """
    # materialize the aggregated grid ONCE — the stats probe, the bucket
    # counts, and the final projection are three separate jobs that would
    # otherwise each recompute the full upstream smear+shuffle pipeline
    agg = agg.localCheckpoint()
    stats_row = agg.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(weight_col).alias("mx"),
    ).collect()[0]
    n, max_w = stats_row["n"], stats_row["mx"]
    if n == 0:
        return agg.withColumn("norm_mu", F.lit(0).cast("long")).withColumn(
            "pct_mu", F.lit(0).cast("long")
        )
    # value bucketing: bucket is a PURE FUNCTION of the weight (no
    # sampling, no partition-id coupling between jobs — fully deterministic
    # across re-executions, unlike repartitionByRange whose layout is only
    # per-plan-execution stable).  Equal weights always share a bucket, so
    # min-rank tie semantics are local to one bucket's window.  Edges are
    # EQUI-DEPTH (approxQuantile over the checkpointed grid): real KDE
    # weight distributions are heavy-tailed, and equi-width edges would
    # collapse ~every occupied cell into bucket 0, recreating the
    # single-task window this function exists to remove (round-3 review).
    # Exactness is unaffected — edges only partition the work; the rank
    # offsets below stay exact whatever the bucket boundaries are.
    n_buckets = max(agg.sparkSession.sparkContext.defaultParallelism * 4, 8)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    edges = sorted(set(agg.stat.approxQuantile(weight_col, probs, 0.01)))
    if edges:
        earr = F.array(*[F.lit(float(e)) for e in edges])
        bucket = F.aggregate(
            earr,
            F.lit(0),
            lambda acc, e: acc + F.when(F.col(weight_col).cast("double") > e, 1).otherwise(0),
        ).cast("int")
    else:
        bucket = F.lit(0).cast("int")
    bucketed = agg.withColumn("_bkt", bucket)
    counts = {
        r["_bkt"]: r["n"]
        for r in bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    # rank() - 1 within the bucket = count of strictly-smaller rows in the
    # bucket (percent_rank's min-rank tie handling, per-bucket parallel
    # windows — never a single global partition)
    w_local = Window.partitionBy("_bkt").orderBy(F.col(weight_col).asc())
    indexed = bucketed.withColumn(
        "_minidx", off_map[F.col("_bkt")] + F.rank().over(w_local) - 1
    )
    mu = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    denom = float(max(n - 1, 1))
    return (
        indexed.withColumn("norm_mu", mu(F.col(weight_col) / F.lit(float(max_w))))
        .withColumn("pct_mu", mu(F.col("_minidx").cast("double") / F.lit(denom)))
        .drop("_bkt", "_minidx")
    )


def kde_pyramid(
    points: DataFrame,
    levels: list[int],
    lon_col: str = "lon",
    lat_col: str = "lat",
    scalable_percentile: bool = True,
) -> DataFrame:
    """KDE across a pyramid of levels in one frame — the reference's KDE
    loops level ∈ [minLevel, maxLevel] emitting one raster per level
    (KDERunner.java:234-316); here the levels union into a single
    (level, x, y, weight_mu, norm_mu, pct_mu) result, normalization and
    percentile computed PER LEVEL like the reference."""
    if not levels:
        raise ValueError("kde_pyramid: levels must be non-empty")
    out = None
    for lvl in levels:
        part = kde_exact(points, lvl, lon_col, lat_col, scalable_percentile=scalable_percentile)
        out = part if out is None else out.unionByName(part)
    return out


def gaussian_offsets_mu(radius: int = RADIUS, sigma: float = SIGMA) -> list[tuple[int, int, int]]:
    """Kernel weights as exact integer micro-units — makes the per-cell sums
    order-independent bigint arithmetic, bit-identical across engines."""
    return [
        (dx, dy, int(math.floor(w * 1e6 + 0.5)))
        for dx, dy, w in gaussian_offsets(radius, sigma)
    ]


def kde_exact(
    points: DataFrame,
    level: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius: int = RADIUS,
    sigma: float = SIGMA,
    scalable_percentile: bool = True,
) -> DataFrame:
    """Integer-exact KDE: (level, x, y, weight_mu, norm_mu, pct_mu).

    ``scalable_percentile=True`` (the default) computes the global
    rank/percentile via :func:`add_percentile_scalable` — a distributed
    range sort with NO single-partition window, the plan that survives
    100 TB.  ``False`` keeps the small-data shortcut
    (``percent_rank() OVER (ORDER BY w)``) whose output it is
    equality-tested against.

    Identical plan to :func:`kde`, but kernel weights are integer
    micro-units so the groupBy sum is exact bigint math, and the two
    derived bands are re-quantized — the cross-engine-reproducible flavor
    used by the correctness gate.
    """
    nx, ny = 1 << (level + 1), 1 << level
    pts = add_point_cols(points, lon_col, lat_col)
    cx = F.least(
        F.greatest(F.floor((F.col(lon_col) + 180.0) / 360.0 * nx).cast("long"), F.lit(0)),
        F.lit(nx - 1),
    )
    cy = F.least(
        F.greatest(F.floor((F.col(lat_col) + 90.0) / 180.0 * ny).cast("long"), F.lit(0)),
        F.lit(ny - 1),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(w).cast("long").alias("w"))
            for dx, dy, w in gaussian_offsets_mu(radius, sigma)
        ]
    )
    smeared = (
        pts.select(cx.alias("_cx"), cy.alias("_cy"))
        .withColumn("_o", F.explode(offs))
        .select(
            F.pmod(F.col("_cx") + F.col("_o.dx"), F.lit(nx)).alias("x"),
            (F.col("_cy") + F.col("_o.dy")).alias("y"),
            F.col("_o.w").alias("w"),
        )
        .filter((F.col("y") >= 0) & (F.col("y") < ny))
    )
    agg = smeared.groupBy("x", "y").agg(F.sum("w").alias("weight_mu"))
    if scalable_percentile:
        # identical values (tested), no single-partition window — the
        # 100 TB path
        out = add_percentile_scalable(agg)
    else:
        w_all = Window.partitionBy()
        w_rank = Window.partitionBy().orderBy(F.col("weight_mu").asc())
        mu = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
        out = agg.withColumn(
            "norm_mu", mu(F.col("weight_mu") / F.max("weight_mu").over(w_all))
        ).withColumn("pct_mu", mu(F.percent_rank().over(w_rank)))
    return out.withColumn("level", F.lit(level).cast("long")).select(
        "level", "x", "y", "weight_mu", "norm_mu", "pct_mu"
    )
