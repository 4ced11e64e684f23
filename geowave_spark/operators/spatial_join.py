"""Tiered spatial join — the engine's flagship operator.

Spark-first re-expression of the reference's TieredSpatialJoin
(analytics/spark/.../spatial/TieredSpatialJoin.java:75-377).  The reference
runs a driver-side loop over tiers with per-tier cogroups and RDD unions;
we collapse the whole thing into ONE Catalyst plan:

    polygons --cover_keys UDF--> explode(packed keys)          (small side)
    points   --Column bit math--> packed key per polygon tier  (JVM side)
             --explode over the tier list (typically 1-5 tiers)
    equi-join on the single long key   (broadcast if small, else shuffle
                                        with AQE skew handling + salting)
    exact predicate refine (Arrow pandas UDF, or pure SQL for boxes)
    dropDuplicates per (point, polygon)      (DedupeFilter semantics)

Semantics preserved (verified against the brute-force oracle, the same test
design as GeoWaveSparkSpatialJoinIT.java:227-254):
* match set identical to nested-loop predicate evaluation;
* `intersects` default predicate (SpatialQueryFilter), boundary inclusive;
* distance join buffers the polygon side's bbox by r before covering
  (TieredSpatialJoin.java:142-165) and refines with planar distance <= r
  (GeomWithinDistance.java:43-45);
* negative predicate → anti join (TieredSpatialJoin.java:357-363);
* output joined back to the base tables as semi/anti
  (TieredSpatialJoin.java:364-373).

Scale design (100 TB point side):
* point-side key generation is pure Column arithmetic — whole-stage codegen,
  zero Python;
* only columns needed are read (Parquet/Iceberg column pruning: image_id +
  phash — the multi-KB `bytes` column is never scanned);
* the polygon side (cells exploded) is broadcast when under the broadcast
  threshold — no shuffle of the point side at all;
* when the polygon side is too big to broadcast, both sides shuffle on the
  packed key; AQE skew-join splits hot cells, and an optional salt factor
  replicates polygon cells to break extreme skew (world polygons);
* tier list is discovered from the polygon side only (tiny aggregate),
  mirroring the reference's tier-discovery pre-pass
  (TieredSpatialJoin.java:173-207) — the point side is never scanned for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import cells, sqlcells
from ..functions import geo_udfs


def add_point_cols(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    phash_col: str | None = "phash",
) -> DataFrame:
    """Ensure lon/lat columns exist (derived from phash if absent) and add
    the finest-tier Morton cell — all JVM-side."""
    if lon_col not in df.columns:
        df = df.withColumn(lon_col, sqlcells.lon_from_phash(F.col(phash_col))).withColumn(
            lat_col, sqlcells.lat_from_phash(F.col(phash_col))
        )
    return df.withColumn(
        "_cell31", sqlcells.cell_expr(F.col(lon_col), F.col(lat_col), cells.MAX_TIER)
    )


def _point_keys_expr(tiers: list[int]) -> Column:
    """array of packed keys of the point's cell at each polygon tier."""
    return F.array(
        *[
            F.lit(int(cells.TIER_OFFSETS[t]))
            + sqlcells.cell_at_tier_expr(F.col("_cell31"), t)
            for t in sorted(tiers)
        ]
    )


def polygon_cover(
    polygons: DataFrame,
    wkt_col: str = "wkt",
    id_col: str = "polygon_id",
    max_cells: int = cells.JOIN_MAX_CELLS,
    buffer: float = 0.0,
) -> DataFrame:
    """Polygon side → exploded (id, wkt, key) covering-cell frame."""
    cover = geo_udfs.make_cover_keys_udf(max_cells=max_cells, buffer=buffer)
    return (
        polygons.select(id_col, wkt_col)
        .withColumn("key", F.explode(cover(F.col(wkt_col))))
    )


def tiered_spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    predicate: str = "intersects",
    radius: float = 0.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_id: str = "image_id",
    polygon_id: str = "polygon_id",
    wkt_col: str = "wkt",
    max_cells: int = cells.JOIN_MAX_CELLS,
    broadcast_polygons: bool | None = None,
    loose: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Return matched (point_id, polygon_id) pairs (deduped).

    predicate: 'intersects' (default, like SpatialQueryFilter) or 'dwithin'
    (GeomWithinDistance with `radius`).  loose=True skips the exact refine
    (IndexOnlySpatialQuery.java:34-43 semantics).
    """
    buffer = radius if predicate == "dwithin" else 0.0
    pts = add_point_cols(points, lon_col, lat_col)

    poly_cells = polygon_cover(polygons, wkt_col, polygon_id, max_cells, buffer)

    # tier discovery from the small side only (cf. TieredSpatialJoin.java:173-207)
    import numpy as np

    keys = np.array([r[0] for r in poly_cells.select("key").distinct().collect()], dtype=np.int64)
    tiers = sorted(set(cells.unpack_key(keys)[0].tolist())) if keys.size else []
    if not tiers:
        return (
            pts.select(point_id).limit(0).crossJoin(polygons.select(polygon_id).limit(0))
        )

    pt_keys = pts.withColumn("key", F.explode(_point_keys_expr(tiers)))

    if broadcast_polygons is None:
        broadcast_polygons = True  # caller disables for huge polygon sets
    right = F.broadcast(poly_cells) if broadcast_polygons else poly_cells

    if salt > 1 and not broadcast_polygons:
        # replicate polygon cells `salt` ways; point rows pick one replica —
        # breaks single-hot-cell skew beyond what AQE splitting can do
        pt_keys = pt_keys.withColumn("_salt", F.pmod(F.xxhash64(point_id), F.lit(salt)))
        right = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
        joined = pt_keys.join(right, ["key", "_salt"])
    else:
        joined = pt_keys.join(right, "key")

    if not loose:
        if predicate == "intersects":
            joined = joined.filter(
                geo_udfs.st_contains_point(F.col(wkt_col), F.col(lon_col), F.col(lat_col))
            )
        elif predicate == "dwithin":
            joined = joined.filter(
                geo_udfs.st_distance_point(F.col(wkt_col), F.col(lon_col), F.col(lat_col))
                <= F.lit(float(radius))
            )
        else:
            raise ValueError(f"unknown predicate {predicate!r}")

    # DedupeFilter semantics: one match per (point, polygon) regardless of
    # how many covering cells both occupy
    return joined.select(point_id, polygon_id).dropDuplicates([point_id, polygon_id])


def semi_join_matches(points: DataFrame, pairs: DataFrame, point_id: str = "image_id") -> DataFrame:
    """Matched point rows (left_semi back to base table, TieredSpatialJoin.java:364-372)."""
    return points.join(pairs.select(point_id).distinct(), point_id, "left_semi")


def anti_join_matches(points: DataFrame, pairs: DataFrame, point_id: str = "image_id") -> DataFrame:
    """Negative-predicate output (subtractByKey, TieredSpatialJoin.java:357-363)."""
    return points.join(pairs.select(point_id).distinct(), point_id, "left_anti")


def brute_force_join(
    points: DataFrame,
    polygons: DataFrame,
    predicate: str = "intersects",
    radius: float = 0.0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    point_id: str = "image_id",
    polygon_id: str = "polygon_id",
    wkt_col: str = "wkt",
) -> DataFrame:
    """Correctness oracle: crossJoin + exact predicate, the same shape as the
    reference's brute-force IT (GeoWaveSparkSpatialJoinIT.java:227-254)."""
    pts = add_point_cols(points, lon_col, lat_col).select(point_id, lon_col, lat_col)
    j = pts.crossJoin(polygons.select(polygon_id, wkt_col))
    if predicate == "intersects":
        j = j.filter(geo_udfs.st_contains_point(F.col(wkt_col), F.col(lon_col), F.col(lat_col)))
    else:
        j = j.filter(
            geo_udfs.st_distance_point(F.col(wkt_col), F.col(lon_col), F.col(lat_col))
            <= F.lit(float(radius))
        )
    return j.select(point_id, polygon_id).dropDuplicates([point_id, polygon_id])
