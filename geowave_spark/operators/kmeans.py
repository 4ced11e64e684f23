"""KMeans clustering + per-cluster convex hulls.

Spark twin of the reference's KMeansRunner (analytics/spark/.../kmeans/
KMeansRunner.java:65-67,201-230 — MLlib KMeans with k=8, maxIter=20 over
feature centroids) and KMeansHullGenerator (convex hull per cluster).
Feature vectors = (lon, lat) like RDDUtils.rddFeatureVectors:102-156; an
optional scaled time dimension mirrors ScaledTemporalRange.

Two variants:

* :func:`kmeans_clusters` — MLlib KMeans, API parity with the reference.
* :func:`kmeans_lloyd` — engine-deterministic Lloyd over integer
  micro-degree coordinates (h60-seeded init, fixed iterations, tie-breaks
  by cluster id), every step SQL-expressible, so the driver's
  ``kmeans_hulls`` query has an EXACT DuckDB oracle (unrolled-CTE Lloyd +
  gift-wrapping hull; entry_queries._oracle_kmeans_hulls) instead of a
  rows-only check.  Same determinism recipe as the PQ codebooks
  (similarity.py).

Scale shape: each Lloyd iteration is one scan + a k-row partial aggregate
(the argmin is a Column expression over k literal centroids — no shuffle,
no crossJoin); hulls reduce per-partition first (hull-of-hulls is exact),
so the per-cluster group that computes the final hull sees at most
|hull| × n_partitions points, not the cluster's rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kmeans_clusters(
    points: DataFrame,
    k: int = 8,
    max_iter: int = 20,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "event_id",
    seed: int = 42,
    ts_col: str | None = None,
    time_scale: float = 1.0,
) -> DataFrame:
    """(id, cluster) assignments via pyspark.ml KMeans.

    With ``ts_col`` set, time joins the feature vector scaled into degree
    units (the reference's optional ScaledTemporalRange dimension,
    KMeansRunner.java:201-230): scaled_t = epoch_days * time_scale.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    sel = points.select(id_col, lon_col, lat_col, *([ts_col] if ts_col else []))
    feat_cols = [lon_col, lat_col]
    if ts_col:
        from .spatiotemporal import epoch_us_expr

        sel = sel.withColumn(
            "_t_scaled", epoch_us_expr(ts_col) / F.lit(86_400_000_000.0) * F.lit(float(time_scale))
        )
        feat_cols.append("_t_scaled")
    feats = VectorAssembler(inputCols=feat_cols, outputCol="_features").transform(sel)
    model = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="_features").fit(feats)
    return (
        model.transform(feats)
        .select(id_col, lon_col, lat_col, F.col("prediction").alias("cluster"))
    )


_HULL_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.IntegerType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("hull_wkt", T.StringType()),
    ]
)


def _convex_hull(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull, CCW order — one algorithm for both
    entry points: this is `_strict_hull` on stacked coordinates (the
    collinear-dropping rule the oracle depends on lives in ONE place)."""
    return _strict_hull(np.column_stack([xs, ys]))


def cluster_hulls(assignments: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Convex hull per cluster — groupBy + applyInPandas (grouped-map),
    the KMeansHullGenerator analog."""

    def hull(key, pdf):
        h = _convex_hull(pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy())
        if len(h) >= 3:
            ring = ", ".join(f"{x} {y}" for x, y in h) + f", {h[0][0]} {h[0][1]}"
            wkt = f"POLYGON (({ring}))"
        else:
            wkt = "POLYGON EMPTY"
        return pd.DataFrame(
            [{"cluster": int(key[0]), "n_points": len(pdf), "hull_wkt": wkt}]
        )

    return assignments.groupBy("cluster").applyInPandas(hull, _HULL_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic Lloyd (SQL-oracle-able) + exact integer hulls
# ---------------------------------------------------------------------------


def micro(col) -> F.Column:
    """Degrees → integer micro-degrees, the cross-engine rounding the
    oracles use everywhere: FLOOR(x*1e6 + 0.5) (half-up, IEEE-identical
    in Spark and DuckDB)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")


def kmeans_lloyd(
    points: DataFrame,
    k: int = 8,
    n_iter: int = 4,
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Deterministic Lloyd k-means over integer micro-degree coordinates.

    * init: the k rows with the smallest ``h60('km:' || id)`` (ties by
      id), cluster ids 0..k-1 in that order — data-derived, seedless;
    * assignment: argmin of exact integer squared distance, ties to the
      smaller cluster id, computed as ``array_min`` over k literal
      centroid structs (JVM Column math, one narrow pass, NO shuffle);
    * update: centroid = floor(sum/n) with the sum exact in int64 and the
      division in IEEE doubles (exact while |sum| < 2^53 ≈ 50 G points
      per cluster), empty clusters keep their previous centroid;
    * ``n_iter`` fixed — no convergence test, so the oracle can unroll.

    Returns (id, xm, ym, cluster).  Matches entry_queries'
    _oracle_kmeans_hulls CTE-for-CTE.
    """
    from .dedup import h60

    pts = points.select(
        F.col(id_col).alias("_id"),
        micro(F.col(lon_col)).alias("xm"),
        micro(F.col(lat_col)).alias("ym"),
    )
    # n_iter+1 passes read this narrow (id, xm, ym) projection — materialize
    # it once so each pass is a cached-columnar scan instead of re-running
    # the upstream source (the driver tables derive lon/lat via md5 hashing,
    # which would otherwise be recomputed 5x); blocks are ContextCleaner-
    # reclaimed, same trade as the dedup shingle frames
    pts = pts.localCheckpoint()
    init = (
        pts.withColumn(
            "hk", h60(F.concat(F.lit("km:"), F.col("_id").cast("string")))
        )
        .orderBy("hk", "_id")
        .limit(k)
        .collect()
    )  # k rows — bounded driver collect, like the PQ codebook sample
    cents = [(i, int(r.xm), int(r.ym)) for i, r in enumerate(init)]

    def assign(cs) -> F.Column:
        arr = F.array(
            *[
                F.struct(
                    (
                        (F.col("xm") - F.lit(cx)) * (F.col("xm") - F.lit(cx))
                        + (F.col("ym") - F.lit(cy)) * (F.col("ym") - F.lit(cy))
                    ).alias("d"),
                    F.lit(ci).cast("long").alias("c"),
                )
                for ci, cx, cy in cs
            ]
        )
        return F.array_min(arr)["c"]

    for _ in range(n_iter):
        agg = (
            pts.withColumn("cluster", assign(cents))
            .groupBy("cluster")
            .agg(F.sum("xm").alias("sx"), F.sum("ym").alias("sy"), F.count("*").alias("n"))
            .collect()
        )
        got = {
            int(r.cluster): (
                int(math.floor(r.sx / r.n)),
                int(math.floor(r.sy / r.n)),
            )
            for r in agg
        }
        cents = [(ci, *got.get(ci, (cx, cy))) for ci, cx, cy in cents]
    return pts.withColumn("cluster", assign(cents)).select(
        F.col("_id").alias(id_col), "xm", "ym", "cluster"
    )


def _strict_hull(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain hull, STRICT corners only (collinear boundary points
    dropped — `<= 0` pops), CCW, starting at the lexicographically
    smallest vertex.  Matches the oracle's gift-wrapping walk."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


_PART_HULL_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.LongType()),
        T.StructField("xm", T.LongType()),
        T.StructField("ym", T.LongType()),
    ]
)

_VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("vx", T.LongType()),
        T.StructField("vy", T.LongType()),
    ]
)


def cluster_hulls_exact(assignments: DataFrame) -> DataFrame:
    """Canonical convex-hull vertices per cluster over integer coords:
    (cluster, n_points, seq, vx, vy), CCW from the lexicographic minimum.

    Distributed as hull-of-hulls: per (cluster, input partition) partial
    hulls first (output ≤ hull size per partition — tiny), then the final
    hull per cluster over partial vertices only; exact because the hull
    of a union equals the hull of the union of hulls."""

    def partial(key, pdf):
        h = _strict_hull(pdf[["xm", "ym"]].to_numpy())
        return pd.DataFrame(
            {"cluster": key[0], "xm": h[:, 0], "ym": h[:, 1]}
        )

    def final(key, pdf):
        h = _strict_hull(pdf[["xm", "ym"]].to_numpy())
        return pd.DataFrame(
            {
                "cluster": key[0],
                "seq": np.arange(len(h), dtype=np.int64),
                "vx": h[:, 0],
                "vy": h[:, 1],
            }
        )

    n_pts = assignments.groupBy("cluster").agg(F.count("*").alias("n_points"))
    parts = assignments.groupBy(
        F.col("cluster"), F.spark_partition_id().alias("_p")
    ).applyInPandas(partial, _PART_HULL_SCHEMA)
    hull = parts.groupBy("cluster").applyInPandas(final, _VERTEX_SCHEMA)
    return hull.join(n_pts, "cluster").select(
        "cluster", "n_points", "seq", "vx", "vy"
    )
