"""KMeans clustering + per-cluster convex hulls.

Spark twin of the reference's KMeansRunner (analytics/spark/.../kmeans/
KMeansRunner.java:65-67,201-230 — MLlib KMeans with k=8, maxIter=20 over
feature centroids) and KMeansHullGenerator (convex hull per cluster).
Feature vectors = (lon, lat) like RDDUtils.rddFeatureVectors:102-156; an
optional scaled time dimension mirrors ScaledTemporalRange.

Iterative algorithm → no SQL oracle; tests assert cluster-count, coverage
and hull-containment invariants instead (rows-only driver check).
"""

from __future__ import annotations

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
    """Monotone-chain convex hull (public classic algorithm), CCW order."""
    pts = np.unique(np.column_stack([xs, ys]), axis=0)
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
