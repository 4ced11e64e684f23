"""kNN via cell-ring expansion + distance refinement.

Re-expresses the reference's NN/kNN machinery (NNMapReduce.java:94-260 —
partition cells plus neighbor expansion, per-partition neighbor lists capped
by maxDistance and maxNeighbors; expansion geometry
OrthodromicDistancePartitioner.java:95-140) as one declarative plan:

    per query: tier t s.t. cell side >= max_distance   (so a 3x3 ring
               provably covers the search radius — no iteration needed)
    explode the 9 ring cells (lon wraps, lat clamps)   — ALL Column math
    equi-join with image cells at the same tiers       (packed long key)
    planar distance refine (pure SQL sqrt — no Python)
    row_number() over (partition by query order by dist, id) <= k

Everything is JVM-side column arithmetic: per-row tiers, ring cells and
Morton interleave are built from pow/floor/bit ops, so the whole candidate
generation stays in whole-stage codegen.  maxDistance + maxNeighbors
semantics exactly as NNMapReduce.java:168-169,199.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import cells, sqlcells
from ..functions import geo_udfs
from .spatial_join import add_point_cols

def _tier_offsets_expr() -> Column:
    return F.array(*[F.lit(int(o)) for o in cells.TIER_OFFSETS[: cells.MAX_TIER + 1]])


def _tier_expr(maxd: Column, bounds=None) -> Column:
    """Coarsest tier whose cell side >= max_distance (world: 180/2^t; a
    custom ``bounds`` frame uses its smaller axis span, so the 3x3 ring
    still provably covers the radius in a projected CRS).

    Degenerate radii are legal and must not poison the driver-side tier
    collect: max_distance <= 0 (eps=0 DBSCAN means exact-duplicate
    neighbors) and NULL (no match possible — the dist <= NULL refine
    drops every pair) both pin to MAX_TIER instead of producing a NULL
    tier (NULL would make TIER_OFFSETS[None] / sorted([None, 5]) throw
    an unrelated-looking TypeError on the driver)."""
    span = 180.0
    if bounds is not None:
        span = min(
            float(bounds[2]) - float(bounds[0]), float(bounds[3]) - float(bounds[1])
        )
    t = F.floor(F.log2(F.lit(span) / maxd)).cast("int")
    bounded = F.least(F.greatest(t, F.lit(0)), F.lit(cells.MAX_TIER))
    return F.when(
        maxd.isNull() | (maxd <= 0), F.lit(cells.MAX_TIER)
    ).otherwise(bounded)


def distance_candidates(
    points: DataFrame,
    queries: DataFrame,
    point_id: str = "image_id",
    query_id: str = "query_id",
    maxd_col: str = "max_distance",
    q_lon: str = "lon",
    q_lat: str = "lat",
    p_lon: str = "lon",
    p_lat: str = "lat",
    broadcast_queries: bool = True,
    extra_query_cols: list[str] | None = None,
    bounds=None,
) -> DataFrame:
    """All (query_id, point_id, dist) pairs with dist <= max_distance —
    the unranked within-distance join (cell-ring candidates + exact
    refine).  knn_join adds the top-k window; DBSCAN uses this directly.

    ``bounds``: custom per-dimension index bounds (x0, y0, x1, y1) for a
    projected CRS (SpatialDimensionalityTypeProvider.java:107-124) — the
    ring clamps instead of wrapping (no antimeridian in a projected
    frame) and distances stay planar in the CRS's own units."""
    extra = extra_query_cols or []
    q = queries.withColumn("_tier", _tier_expr(F.col(maxd_col), bounds))
    # per-row grid resolution r = 2^tier (exact in double up to 2^31)
    q = q.withColumn("_r", F.pow(F.lit(2.0), F.col("_tier").cast("double")).cast("long"))
    qx = F.least(
        F.greatest(F.floor(sqlcells.norm_lon(F.col(q_lon), bounds) * F.col("_r").cast("double")), F.lit(0)),
        F.col("_r") - 1,
    ).cast("long")
    qy = F.least(
        F.greatest(F.floor(sqlcells.norm_lat(F.col(q_lat), bounds) * F.col("_r").cast("double")), F.lit(0)),
        F.col("_r") - 1,
    ).cast("long")
    q = q.withColumn("_qx", qx).withColumn("_qy", qy)
    # 3x3 ring: lon wraps (pmod) in the world frame, clamps under custom
    # bounds (no antimeridian in a projected frame); lat always clamps
    nx = (
        F.pmod(F.col("_qx") + F.col("_dx"), F.col("_r"))
        if bounds is None
        else F.col("_qx") + F.col("_dx")
    )
    q = (
        q.withColumn("_dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_nx", nx)
        .withColumn("_ny", F.col("_qy") + F.col("_dy"))
        .filter((F.col("_ny") >= 0) & (F.col("_ny") < F.col("_r")))
        .filter((F.col("_nx") >= 0) & (F.col("_nx") < F.col("_r")))
        .withColumn(
            "key",
            F.element_at(_tier_offsets_expr(), F.col("_tier") + 1)
            + sqlcells.interleave(F.col("_nx"), F.col("_ny")),
        )
        .dropDuplicates([query_id, "key"])
        .select(query_id, q_lon, q_lat, maxd_col, "_tier", "key", *extra)
        .withColumnRenamed(q_lon, "_q_lon")
        .withColumnRenamed(q_lat, "_q_lat")
    )

    tiers = sorted(r[0] for r in q.select("_tier").distinct().collect())
    if not tiers:
        # empty query side → empty result with the contract schema (an
        # empty partition/day must not crash dbscan/knn pipelines)
        return (
            q.select(query_id, *extra)
            .withColumn(point_id, F.lit(None).cast(points.schema[point_id].dataType))
            .withColumn("dist", F.lit(None).cast("double"))
            .filter(F.lit(False))
            .select(query_id, point_id, "dist", *extra)
        )

    pts = add_point_cols(points, p_lon, p_lat, bounds=bounds)
    pts = pts.withColumn(
        "key",
        F.explode(
            F.array(
                *[
                    F.lit(int(cells.TIER_OFFSETS[t]))
                    + sqlcells.cell_at_tier_expr(F.col("_cell31"), t)
                    for t in tiers
                ]
            )
        ),
    ).select(point_id, F.col(p_lon).alias("_p_lon"), F.col(p_lat).alias("_p_lat"), "key")

    if broadcast_queries:
        cand = pts.join(F.broadcast(q), "key")
    else:
        # both sides are exploded frames whose size Catalyst routinely
        # under-estimates (post-filter/aggregate stats) — pin the
        # spillable sort-merge plan like spatial_join._shuffle_join does,
        # or a mis-broadcast of a 10^6+-row exploded side OOMs the driver
        cand = pts.join(q.hint("merge"), "key")

    # explicit products (not pow) → bit-identical to the SQL oracle's dx*dx+dy*dy
    dx = F.col("_p_lon") - F.col("_q_lon")
    dy = F.col("_p_lat") - F.col("_q_lat")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= F.col(maxd_col))
        .dropDuplicates([query_id, point_id])  # ring cells can overlap after wrap
        .select(query_id, point_id, "dist", *extra)
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    point_id: str = "image_id",
    query_id: str = "query_id",
    k_col: str = "k",
    maxd_col: str = "max_distance",
    q_lon: str = "lon",
    q_lat: str = "lat",
    p_lon: str = "lon",
    p_lat: str = "lat",
    broadcast_queries: bool = True,
    bounds=None,
) -> DataFrame:
    """Return (query_id, image_id, dist, rank) — top-k by planar distance
    within max_distance, ties broken by point id (deterministic).
    ``bounds`` runs the ring and distances in a projected frame."""
    cand = distance_candidates(
        points, queries, point_id, query_id, maxd_col, q_lon, q_lat, p_lon, p_lat,
        broadcast_queries, extra_query_cols=[k_col], bounds=bounds,
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col(k_col))
        .select(query_id, point_id, "dist", "rank")
    )


def knn_adaptive(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "image_id",
    query_id: str = "query_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    p_lon: str = "lon",
    p_lat: str = "lat",
    init_distance: float = 0.5,
    max_distance: float = 403.0,  # > planar diameter of the lon/lat plane
) -> DataFrame:
    """True k-nearest (no fixed radius): iterative ring growth.

    The reference's NNProcessor semantics when maxNeighbors dominates:
    per round, run the within-distance candidate join at radius d for the
    still-unfilled queries; a query is COMPLETE once it has >= k neighbors
    with dist <= d (the ring provably covers radius d, so no unseen point
    can be closer); otherwise d *= 4 and only the unfilled queries rejoin —
    the driver-side loop touches only the tiny query side, the point table
    is re-scanned per round (bounded by O(log(max/init)) rounds).

    Output: (query_id, point_id, dist, rank) with rank <= k, ties by id.
    """
    remaining = queries.select(F.col(query_id), F.col(q_lon), F.col(q_lat))
    results = None
    d = float(init_distance)
    while True:
        q = remaining.withColumn("max_distance", F.lit(d))
        cand = distance_candidates(
            points, q, point_id, query_id, "max_distance", q_lon, q_lat, p_lon, p_lat
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(point_id).asc())
        # checkpoint the per-round top-k: the loop's own counts/anti-join
        # execute it once, and WITHOUT the checkpoint the caller's final
        # action would re-run every round's full candidate join a second
        # time (round-3 review) — this also truncates lineage growth
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .localCheckpoint()
        )
        counts = topk.groupBy(query_id).agg(F.count(F.lit(1)).alias("_n"))
        done_qids = counts.filter(F.col("_n") >= k).select(query_id)
        done = topk.join(done_qids, query_id, "left_semi").select(
            query_id, point_id, "dist", "rank"
        )
        results = done if results is None else results.unionByName(done)
        # completed queries drop out via anti-join — no driver round-trip of
        # ids, and localCheckpoint truncates the per-round lineage growth
        remaining = remaining.join(done_qids, query_id, "left_anti").localCheckpoint()
        if d >= max_distance or remaining.limit(1).count() == 0:
            # at the cap: emit whatever the final round found for leftovers
            if d >= max_distance:
                leftovers = topk.join(done_qids, query_id, "left_anti").select(
                    query_id, point_id, "dist", "rank"
                )
                results = results.unionByName(leftovers)
            break
        d = min(d * 4.0, float(max_distance))
    return results


def knn_geometry(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "image_id",
    query_id: str = "query_id",
    wkt_col: str = "wkt",
    p_lon: str = "lon",
    p_lat: str = "lat",
    init_distance: float = 0.5,
    max_distance: float = 403.0,
) -> DataFrame:
    """k nearest POINTS per query GEOMETRY (LINESTRING / POLYGON / MULTI*)
    — the reference's NN join runs over arbitrary SimpleFeatures with JTS
    planar distance (NNMapReduce.java:94-260), not just point pairs; this
    is that generalization, with knn_adaptive's iterative radius growth.

    Per round: buffered-cover dwithin join at radius d (candidates only),
    exact geometry distance refine (st_distance_point, vectorized per
    distinct query geometry), per-query top-k window; queries with >= k
    neighbors inside d are provably complete (the buffered cover reaches
    radius d), the rest re-join at 4d.  Output: (query_id, point_id,
    dist, rank), ties by point id.
    """
    from .spatial_join import probe_broadcastable, tiered_spatial_join

    remaining = queries.select(
        F.col(query_id).alias("polygon_id"), F.col(wkt_col).alias("wkt")
    )
    pts = points.select(point_id, p_lon, p_lat)
    # the query side only SHRINKS across rounds, so one probe decides the
    # plan for the whole loop: broadcast rounds carry (lon, lat) through
    # the join (no second scan of the point table per round — round-3
    # review); an oversized query side falls back to the id re-join
    carry = probe_broadcastable(remaining, "wkt")
    results = None
    d = float(init_distance)
    while True:
        # loose=True: the join emits buffered-cover candidates WITHOUT its
        # own exact-distance refine — the kernel below computes the exact
        # distance once and applies the <= d gate itself (the non-loose
        # join would run the same Arrow kernel a second time per round)
        if carry:
            pairs = tiered_spatial_join(
                pts, remaining, predicate="dwithin", radius=d,
                point_id=point_id, lon_col=p_lon, lat_col=p_lat, loose=True,
                broadcast_polygons=True, carry_cols=(p_lon, p_lat),
            )
        else:
            pairs = tiered_spatial_join(
                pts, remaining, predicate="dwithin", radius=d,
                point_id=point_id, lon_col=p_lon, lat_col=p_lat, loose=True,
            ).join(pts, point_id)
        cand = (
            pairs.join(F.broadcast(remaining), "polygon_id")
            .withColumn(
                "dist", geo_udfs.st_distance_point(F.col("wkt"), F.col(p_lon), F.col(p_lat))
            )
            .filter(F.col("dist") <= F.lit(d))
        )
        w = Window.partitionBy("polygon_id").orderBy(
            F.col("dist").asc(), F.col(point_id).asc()
        )
        # checkpointed for the same reason as knn_adaptive: the final
        # action must not re-execute every round's join + Arrow refine
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .localCheckpoint()
        )
        counts = topk.groupBy("polygon_id").agg(F.count(F.lit(1)).alias("_n"))
        done_qids = counts.filter(F.col("_n") >= k).select("polygon_id")
        done = topk.join(done_qids, "polygon_id", "left_semi").select(
            F.col("polygon_id").alias(query_id), F.col(point_id), "dist", "rank"
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(done_qids, "polygon_id", "left_anti").localCheckpoint()
        if d >= max_distance or remaining.limit(1).count() == 0:
            if d >= max_distance:
                leftovers = topk.join(done_qids, "polygon_id", "left_anti").select(
                    F.col("polygon_id").alias(query_id), F.col(point_id), "dist", "rank"
                )
                results = results.unionByName(leftovers)
            break
        d = min(d * 4.0, float(max_distance))
    return results


def knn_oracle_numpy(
    p_ids: np.ndarray,
    p_lon: np.ndarray,
    p_lat: np.ndarray,
    q_ids: np.ndarray,
    q_lon: np.ndarray,
    q_lat: np.ndarray,
    ks: np.ndarray,
    maxds: np.ndarray,
) -> list[tuple]:
    """Brute-force pairwise oracle (FIXTURES.md §5)."""
    out = []
    for qi in range(len(q_ids)):
        d = np.sqrt((p_lon - q_lon[qi]) ** 2 + (p_lat - q_lat[qi]) ** 2)
        ok = d <= maxds[qi]
        idx = np.nonzero(ok)[0]
        order = sorted(idx, key=lambda i: (d[i], p_ids[i]))
        for rank, i in enumerate(order[: int(ks[qi])], start=1):
            out.append((q_ids[qi], p_ids[i], float(d[i]), rank))
    return out
