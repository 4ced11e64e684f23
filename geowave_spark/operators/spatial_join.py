"""Tiered spatial join — the engine's flagship operator.

Spark-first re-expression of the reference's TieredSpatialJoin
(analytics/spark/.../spatial/TieredSpatialJoin.java:75-377).  The reference
runs a driver-side loop over tiers with per-tier cogroups and RDD unions;
we collapse the whole thing into ONE Catalyst plan:

    polygons --driver-side numpy cover (broadcast path) OR one Arrow
              bbox pass + Column span tiering (shuffle path)--> packed keys
    points   --Column bit math--> packed key per polygon tier  (JVM side)
             --explode over the tier list (typically 1-5 tiers)
    equi-join on the single long key   (broadcast if small, else forced
                                        sort-merge with AQE skew + salting)
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

# broadcast the polygon side when it has at most this many rows (each
# polygon explodes to <= 80 covering cells; 100k x ~100B cells ~ 1GB upper
# bound, comfortably under executor broadcast budgets at default configs)
BROADCAST_MAX_POLYGONS = 100_000
# ...and at most this many total WKT bytes (WKT is broadcast ONCE per
# polygon, never per covering cell, so this is the actual payload bound)
BROADCAST_MAX_WKT_BYTES = 256 << 20


def probe_broadcastable(geoms: DataFrame, wkt_col: str = "wkt") -> bool:
    """Build-side probe (JoinOptions.BuildSide analog), shared by every
    geometry join: broadcast only when the side is provably small by BOTH
    row count and total WKT bytes — probed with a limit so huge tables
    never fully count/sum here."""
    probe = (
        geoms.limit(BROADCAST_MAX_POLYGONS + 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.col(wkt_col))).alias("b"),
        )
        .collect()[0]
    )
    return (
        probe["n"] <= BROADCAST_MAX_POLYGONS
        and (probe["b"] or 0) <= BROADCAST_MAX_WKT_BYTES
    )


def add_point_cols(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    phash_col: str | None = "phash",
    bounds=None,
) -> DataFrame:
    """Ensure lon/lat columns exist (derived from phash if absent) and add
    the finest-tier Morton cell — all JVM-side."""
    if lon_col not in df.columns:
        df = df.withColumn(lon_col, sqlcells.lon_from_phash(F.col(phash_col))).withColumn(
            lat_col, sqlcells.lat_from_phash(F.col(phash_col))
        )
    return sqlcells.add_cell_column(
        df, lon_col, lat_col, cells.MAX_TIER, "_cell31", bounds=bounds
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


def polygon_cover_local(
    rows: list[tuple[str, str]],
    max_cells: int = cells.JOIN_MAX_CELLS,
    buffer: float = 0.0,
    bounds=None,
) -> tuple[list[tuple], list[int]]:
    """Driver-side cover for a small polygon set (the broadcast path).

    The reference broadcasts its index strategy and plans query ranges on
    the driver (RDDUtils.broadcastIndexStrategy:255-263;
    TieredSFCIndexStrategy.getQueryRanges) — our equivalent plans the whole
    small side locally with numpy: no Spark job, no Python workers, and the
    cover is computed exactly once.

    Returns (cell_rows, tiers): cell_rows =
    (key, polygon_id, wkt, x0, y0, x1, y1, is_box) per covering cell.
    """
    import pandas as pd

    from .. import geom

    wkts = pd.Series([w for _, w in rows])
    # query-side covers are ALWAYS boundary-CLOSED: a point lying exactly
    # on a polygon edge that coincides with a cell line floors into the
    # NEXT cell (e.g. point lon=0 on a polygon with x1=0), and a dwithin
    # partner at exactly distance `radius` past the buffered bbox's upper
    # edge does the same — the open (exact-fit insert rule) cover would
    # drop their candidate cell even though the boundary-inclusive refine
    # accepts the pair.  Trim still removes cells the true geometry
    # doesn't touch (closed cell rectangles keep edge contact).
    keys_per_poly = geo_udfs.cover_keys(
        wkts, max_cells=max_cells, buffer=buffer, trim=not buffer, closed=True,
        bounds=bounds,
    )
    out: list[tuple] = []
    tiers: set[int] = set()
    import numpy as np

    for (pid, wkt), keys in zip(rows, keys_per_poly):
        p = geom.geometry_from_wkt(wkt)
        x0, y0, x1, y1 = p.bbox
        isb = p.is_box()
        for k in keys:
            out.append((int(k), pid, wkt, float(x0), float(y0), float(x1), float(y1), bool(isb)))
        if len(keys):
            tiers.update(cells.unpack_key(np.asarray(keys))[0].tolist())
    return out, sorted(tiers)




def _box_contains_pred(lon: Column, lat: Column, bounds=None) -> Column:
    """JVM-only boundary-inclusive point-in-box, antimeridian-aware.

    Mirrors the oracle SQL predicate exactly; the +360 clause is harmless
    for x1 <= 180 boxes only because workload boxes with x1 == 180 also
    have x0 == -180 (see entry_queries._SQL_PIP_PRED discussion).  Custom
    ``bounds`` (projected CRS) have no wrap — the +360 retest is dropped
    (it would false-positive in metre coordinates).
    """
    base = (
        (lat >= F.col("y0")) & (lat <= F.col("y1"))
        & (lon >= F.col("x0")) & (lon <= F.col("x1"))
    )
    if bounds is not None:
        return base
    lon2 = lon + F.lit(360.0)
    return (
        (lat >= F.col("y0"))
        & (lat <= F.col("y1"))
        & (
            ((lon >= F.col("x0")) & (lon <= F.col("x1")))
            | ((lon2 >= F.col("x0")) & (lon2 <= F.col("x1")))
        )
    )


def _box_dist_expr(lon: Column, lat: Column, bounds=None) -> Column:
    """JVM-only planar distance to a box (0 inside), antimeridian copy via
    least() — same IEEE op sequence as the oracle's formula.  Custom
    ``bounds`` drop the +360 copy (no wrap in a projected frame)."""

    def d(px: Column) -> Column:
        ddx = F.greatest(F.col("x0") - px, px - F.col("x1"), F.lit(0.0))
        ddy = F.greatest(F.col("y0") - lat, lat - F.col("y1"), F.lit(0.0))
        return F.sqrt(ddx * ddx + ddy * ddy)

    if bounds is not None:
        return d(lon)
    return F.least(d(lon), d(lon + F.lit(360.0)))


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
    carry_cols: tuple[str, ...] = (),
    bounds=None,
) -> DataFrame:
    """Return matched (point_id, polygon_id) pairs (deduped).

    predicate: 'intersects' (default, like SpatialQueryFilter) or 'dwithin'
    (GeomWithinDistance with `radius`).  loose=True skips the exact refine
    (IndexOnlySpatialQuery.java:34-43 semantics).

    ``bounds``: custom per-dimension index bounds (x0, y0, x1, y1) — the
    reference's custom-CRS index math (SpatialDimensionalityTypeProvider
    .java:107-124): clamped linear normalization, no antimeridian wrap.
    Geometry predicates stay planar in the CRS's own units, matching the
    reference's JTS behavior under a projected CRS.

    ``carry_cols``: extra POINT-side columns to keep on the output rows
    (e.g. an event-time column for a downstream windowed aggregation on an
    unbounded stream, where a join-back by id would be a stream-stream
    self-join).  Broadcast path only.
    """
    if predicate not in ("intersects", "dwithin"):
        raise ValueError(f"unknown predicate {predicate!r}")
    buffer = radius if predicate == "dwithin" else 0.0
    pts = add_point_cols(points, lon_col, lat_col, bounds=bounds)
    if broadcast_polygons is None:
        # a 50k-row side of multi-MB coastline WKTs must not be collected
        # to the driver — the probe sizes on rows AND bytes
        broadcast_polygons = probe_broadcastable(polygons, wkt_col)

    if broadcast_polygons:
        return _broadcast_join(
            pts, polygons, predicate, radius, buffer, lon_col, lat_col,
            point_id, polygon_id, wkt_col, max_cells, loose, carry_cols,
            bounds=bounds,
        )
    if carry_cols:
        raise ValueError("carry_cols is only supported on the broadcast path")
    return _shuffle_join(
        pts, polygons, predicate, radius, buffer, lon_col, lat_col,
        point_id, polygon_id, wkt_col, max_cells, loose, salt, bounds=bounds,
    )


def _refine_box(
    j: DataFrame, predicate: str, radius: float, lon_col: str, lat_col: str,
    bounds=None,
) -> DataFrame:
    if predicate == "intersects":
        return j.filter(_box_contains_pred(F.col(lon_col), F.col(lat_col), bounds))
    return j.filter(
        _box_dist_expr(F.col(lon_col), F.col(lat_col), bounds) <= F.lit(float(radius))
    )


def _refine_general(
    j: DataFrame, predicate: str, radius: float, lon_col: str, lat_col: str,
    wkt_col: str, bounds=None,
) -> DataFrame:
    contains = (
        geo_udfs.st_contains_point if bounds is None else geo_udfs.st_contains_point_nowrap
    )
    dist = (
        geo_udfs.st_distance_point if bounds is None else geo_udfs.st_distance_point_nowrap
    )
    if predicate == "intersects":
        return j.filter(contains(F.col(wkt_col), F.col(lon_col), F.col(lat_col)))
    return j.filter(
        dist(F.col(wkt_col), F.col(lon_col), F.col(lat_col)) <= F.lit(float(radius))
    )


def _broadcast_join(
    pts, polygons, predicate, radius, buffer, lon_col, lat_col,
    point_id, polygon_id, wkt_col, max_cells, loose, carry_cols=(),
    bounds=None,
) -> DataFrame:
    """Small polygon side: driver-side cover + broadcast hash join.

    Box polygons refine with pure Column SQL (whole-stage codegen, zero
    Python); general polygons fall back to the pandas predicate UDF.  The
    point side is scanned once per polygon class present (boxes / general)
    — one scan in the overwhelmingly common homogeneous case.
    """
    spark = pts.sparkSession
    rows = [(r[0], r[1]) for r in polygons.select(polygon_id, wkt_col).collect()]
    cell_rows, tiers = polygon_cover_local(
        rows, max_cells=max_cells, buffer=buffer, bounds=bounds
    )
    if not tiers:
        # keep the carry_cols in the empty-result schema — downstream
        # selects must not break only on the empty-polygon execution.
        # filter(False) instead of limit(0): the point side may be a
        # STREAMING frame (streaming_spatial_join), where limit is illegal
        return (
            pts.select(point_id, *carry_cols)
            .filter(F.lit(False))
            .withColumn(polygon_id, F.lit(None).cast("string"))
            .select(point_id, polygon_id, *carry_cols)
        )

    # prune to the join's working set BEFORE the explode — payload columns
    # must never be replicated |tiers|× (semi/anti join back for full rows)
    pt_keys = pts.select(point_id, lon_col, lat_col, "_cell31", *carry_cols).withColumn(
        "key", F.explode(_point_keys_expr(tiers))
    )
    box_rows = [r for r in cell_rows if r[7]]
    gen_rows = [r for r in cell_rows if not r[7]]
    parts = []
    if box_rows:
        # box refine needs only the bbox — no WKT in the broadcast at all
        right = F.broadcast(
            spark.createDataFrame(
                [(k, pid, x0, y0, x1, y1) for k, pid, _w, x0, y0, x1, y1, _b in box_rows],
                "key long, polygon_id string, x0 double, y0 double, x1 double, y1 double",
            ).withColumnRenamed("polygon_id", polygon_id)
        )
        j = pt_keys.join(right, "key")
        if not loose:
            j = _refine_box(j, predicate, radius, lon_col, lat_col, bounds)
        parts.append(j.select(point_id, polygon_id, *carry_cols))
    if gen_rows:
        # WKT is broadcast ONCE per polygon (joined by id after the cell
        # match), never duplicated into the per-cell rows — keeps the
        # broadcast payload at sum(len(wkt)), not 80x that
        cells_bc = F.broadcast(
            spark.createDataFrame(
                [(k, pid) for k, pid, *_ in gen_rows], "key long, polygon_id string"
            ).withColumnRenamed("polygon_id", polygon_id)
        )
        wkts_bc = F.broadcast(
            spark.createDataFrame(
                sorted({(pid, w) for _k, pid, w, *_ in gen_rows}),
                "polygon_id string, wkt string",
            )
            .withColumnRenamed("polygon_id", polygon_id)
            .withColumnRenamed("wkt", wkt_col)
        )
        j = pt_keys.join(cells_bc, "key").join(wkts_bc, polygon_id)
        if not loose:
            j = _refine_general(j, predicate, radius, lon_col, lat_col, wkt_col, bounds)
        parts.append(j.select(point_id, polygon_id, *carry_cols))
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    # DedupeFilter semantics hold BY CONSTRUCTION for point joins: a point
    # occupies exactly one cell per tier and each polygon's cover lives at
    # exactly one tier, so a (point, polygon) pair meets at most once — the
    # reference's dedupe targets duplicated EXTENT entries
    # (docs/content/devguide/040-keystructure.adoc:9), which the extent
    # join handles.  Skipping it makes point-in-polygon a ZERO-SHUFFLE
    # plan: scan → explode → broadcast hash join → filter.
    return out


def _shuffle_join(
    pts, polygons, predicate, radius, buffer, lon_col, lat_col,
    point_id, polygon_id, wkt_col, max_cells, loose, salt, bounds=None,
) -> DataFrame:
    """Large polygon side: one Arrow bbox UDF + pure-Column span-based
    tiering (<= 4 covering cells per polygon, the reference's
    estimated-count <= 2^d insert rule) + shuffle equi-join on the packed
    key, with optional polygon-replication salting on top of AQE skew-join
    splitting.

    Scale design: the ONLY Python on the polygon side is the per-row WKT →
    bbox extraction (st_bbox); tier assignment, cell explosion and key
    packing are whole-stage-codegen Column math, so a 10^8-polygon side
    runs at scan speed.  Points sit at the finest tier, so a pair always
    meets at the polygon's tier — each polygon emits its own-tier cells
    only, and each point emits one key per DISTINCT polygon tier (<= 32,
    discovered via a tiny aggregate, TieredSpatialJoin.java:173-207).
    """
    lb = polygons.select(polygon_id, wkt_col).withColumn(
        "_bb", geo_udfs.st_bbox(F.col(wkt_col))
    ).select(
        polygon_id,
        F.col(wkt_col),
        (F.col("_bb.x0") - buffer).alias("_px0"),
        (F.col("_bb.y0") - buffer).alias("_py0"),
        (F.col("_bb.x1") + buffer).alias("_px1"),
        (F.col("_bb.y1") + buffer).alias("_py1"),
    ).localCheckpoint()  # ONE bbox-UDF pass feeding the wrap-split branches
    # antimeridian: unwrapped bboxes (x1 > 180, or x0 < -180 after
    # buffering) split into two in-range sub-extents BEFORE tiering
    # (LongitudeDefinition wrap semantics); the exact refine already tests
    # the +360-shifted copy, so recall and exactness both hold
    keep = ["_px0", "_py0", "_px1", "_py1"]
    others = [c for c in lb.columns if c not in keep]
    if bounds is not None:
        # custom bounds: clamped normalization, no antimeridian seam — the
        # whole side passes through unsplit (the wrap branches below see an
        # empty frame and short-circuit)
        norm, lb = lb, lb.filter(F.lit(False))
    else:
        norm = lb.filter((F.col("_px1") <= 180.0) & (F.col("_px0") >= -180.0))
    # full-wrap rule first (cells.split_bbox_antimeridian semantics): a
    # bbox overflowing BOTH edges (world-spanning polygon + buffer) must
    # become one world box — it would otherwise land in BOTH the hi and
    # lo branches with an out-of-range bound surviving in two of the four
    # images, collapsing its cover to a seam sliver and dropping pairs
    both = lb.filter((F.col("_px1") > 180.0) & (F.col("_px0") < -180.0))
    hi = lb.filter((F.col("_px1") > 180.0) & (F.col("_px0") >= -180.0))
    lo = lb.filter((F.col("_px0") < -180.0) & (F.col("_px1") <= 180.0))
    wrap_split = not (hi.isEmpty() and lo.isEmpty() and both.isEmpty())
    if not wrap_split:
        lb2 = norm
    else:
        lb2 = (
            norm
            .unionByName(hi.select(*others, "_px0", "_py0", F.lit(180.0).alias("_px1"), "_py1")
                         .select(*lb.columns))
            .unionByName(hi.select(*others, F.lit(-180.0).alias("_px0"), "_py0",
                                   (F.col("_px1") - 360.0).alias("_px1"), "_py1")
                         .select(*lb.columns))
            .unionByName(lo.select(*others, F.lit(-180.0).alias("_px0"), "_py0", "_px1", "_py1")
                         .select(*lb.columns))
            .unionByName(lo.select(*others, (F.col("_px0") + 360.0).alias("_px0"), "_py0",
                                   F.lit(180.0).alias("_px1"), "_py1")
                         .select(*lb.columns))
            .unionByName(both.select(*others, F.lit(-180.0).alias("_px0"), "_py0",
                                     F.lit(180.0).alias("_px1"), "_py1")
                         .select(*lb.columns))
        )
    pc = _extent_cells(
        lb2, polygon_id, "_px0", "_py0", "_px1", "_py1", extra_cols=(wkt_col,),
        bounds=bounds,
    )
    offs = F.array(*[F.lit(int(o)) for o in cells.TIER_OFFSETS[: cells.MAX_TIER + 1]])
    poly_cells = pc.withColumn(
        "key", (F.element_at(offs, F.col("_te") + 1) + F.col("_cell")).cast("long")
    ).localCheckpoint()  # materialized once; ContextCleaner-reclaimed

    # tier discovery: distinct TIERS (<= 32 rows after map-side partial
    # agg), never the distinct keys
    tiers = sorted(r[0] for r in poly_cells.select("_te").distinct().collect())
    if not tiers:
        return pts.select(point_id).limit(0).crossJoin(polygons.select(polygon_id).limit(0))
    poly_cells = poly_cells.drop("_te", "_cell", "_px0", "_py0", "_px1", "_py1")

    pt_keys = pts.select(point_id, lon_col, lat_col, "_cell31").withColumn(
        "key", F.explode(_point_keys_expr(tiers))
    )
    # force a sort-merge join: BOTH sides are big by contract here (the
    # build-side probe already routed broadcastable polygon sets to
    # _broadcast_join), but Catalyst's size estimate of the un-exploded
    # point scan can look broadcastable and OOM the driver at 10^6+ rows —
    # the hint pins the spillable shuffle plan (AQE skew-split still applies)
    pt_keys = pt_keys.hint("merge")
    if salt > 1:
        # replicate polygon cells `salt` ways; point rows pick one replica —
        # breaks single-hot-cell skew beyond what AQE splitting can do
        pt_keys = pt_keys.withColumn("_salt", F.pmod(F.xxhash64(point_id), F.lit(salt)))
        right = poly_cells.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        joined = pt_keys.join(right, ["key", "_salt"])
    else:
        joined = pt_keys.join(poly_cells, "key")

    if not loose:
        joined = _refine_general(joined, predicate, radius, lon_col, lat_col, wkt_col, bounds)
    out = joined.select(point_id, polygon_id)
    # points meet each polygon at most once (one cell per tier) — dedupe is
    # only needed when a wrapped polygon was split into two sub-extents
    # whose covers can share a coarse cell
    return out.dropDuplicates([point_id, polygon_id]) if wrap_split else out


def tiered_extent_join(
    extents: DataFrame,
    polygons: DataFrame,
    extent_id: str = "extent_id",
    polygon_id: str = "polygon_id",
    x0: str = "x0",
    y0: str = "y0",
    x1: str = "x1",
    y1: str = "y1",
    wkt_col: str = "wkt",
) -> DataFrame:
    """General tiered join: ARBITRARY extents on the big side (bbox columns)
    vs a broadcastable polygon side — the reference's full join shape
    (TieredSpatialJoin.java:75-377: both sides adaptively tiered, duplicated
    into covering cells, matched per tier with reprojectToTier, deduped).

    Tier scheme (exactly the reference's two-direction reprojection, folded
    into one equi-join):

    * each extent row gets tier te = finest tier whose cell size >= its
      normalized span (the estimated-count insert rule of
      TieredSFCIndexStrategy.getEstimatedIdCount — span-based, so the
      covering block is provably <= 2x2 = the default 2^d duplication
      budget), and explodes into those <= 4 cells — pure Column math;
    * a pair (extent@te, polygon@tp) must meet at min(te, tp): the
      polygon's broadcast cell list carries its cover TRUNCATED to every
      tier <= tp (driver-side, tiny), covering the te <= tp direction; the
      extent additionally emits its cells truncated to each polygon tier
      < te, covering the tp < te direction;
    * equi-join on the packed key, exact bbox-intersects refine
      (boundary-inclusive, JTS-intersects semantics), global dedupe.

    Output: (extent_id, polygon_id).  Verified against the brute-force
    bbox-intersect oracle — the same test design as the reference's
    GeoWaveSparkSpatialJoinIT brute-force comparison.
    """
    import numpy as np

    from .. import geom

    spark = extents.sparkSession
    if not probe_broadcastable(polygons, wkt_col):
        # build-side guard (same as geometry_join's): never materialize an
        # unbounded polygon side on the driver — derive its bboxes and
        # route to the BIG×BIG shuffle twin, whose output contract
        # (bbox-intersect pairs, same id columns) matches this join's
        pb = polygons.withColumn("_b", geo_udfs.st_bbox(F.col(wkt_col))).select(
            F.col(polygon_id),
            F.col("_b.x0").alias("_rx0"), F.col("_b.y0").alias("_ry0"),
            F.col("_b.x1").alias("_rx1"), F.col("_b.y1").alias("_ry1"),
        )
        return tiered_extent_join_shuffle(
            extents, pb, left_id=extent_id, right_id=polygon_id,
            lcols=(x0, y0, x1, y1), rcols=("_rx0", "_ry0", "_rx1", "_ry1"),
        )
    rows = [(r[0], r[1]) for r in polygons.select(polygon_id, wkt_col).collect()]
    if not rows:
        return extents.select(extent_id).limit(0).crossJoin(polygons.select(polygon_id).limit(0))

    # polygon side: cover at its adaptive tier + truncations to every
    # coarser tier (reprojectToTier, coarser direction); per-tier
    # np.unique makes (pid, key) rows unique, and carrying the polygon's
    # OWN tier enables the meet-tier restriction below
    poly_rows: list[tuple] = []
    poly_tiers: set[int] = set()
    for pid, wkt in rows:
        p = geom.geometry_from_wkt(wkt)
        bx0, by0, bx1, by1 = p.bbox
        # closed=True: query-side cover keeps boundary cells, matching the
        # Column-side plain-floor covers and the reference point — with the
        # insert convention (closed=False) a polygon whose upper edge sits
        # exactly on a cell line (e.g. x1 = 0) could NEVER meet an extent
        # touching it there, at any tier (missed pair, boundary-inclusive
        # bbox-intersects contract)
        tp, cover = cells.cells_for_bbox(
            (bx0, by0, bx1, by1), max_dup=cells.JOIN_MAX_CELLS, closed=True
        )
        poly_tiers.add(tp)
        for t in range(tp, -1, -1):
            tc = np.unique(cells.cell_at_tier(cover, tp, t))
            for k in cells.pack_key(t, tc).tolist():
                poly_rows.append((int(k), pid, int(tp), float(bx0), float(by0), float(bx1), float(by1)))
    right = F.broadcast(
        spark.createDataFrame(
            poly_rows,
            "key long, _pid string, _ptp int, _px0 double, _py0 double, _px1 double, _py1 double",
        ).withColumnRenamed("_pid", polygon_id)
    )

    # extent side: own-tier cover + covers re-derived at each coarser
    # polygon tier ((id, key) rows unique by construction)
    ec = extents.withColumn("_te", _extent_tier_expr(x0, y0, x1, y1))
    ex_keys = _extent_multitier_keys(ec, extent_id, x0, y0, x1, y1, sorted(poly_tiers))

    j = ex_keys.join(right, "key")
    # exactly-once emission (PBSM reference point, as in the shuffle twin):
    # a pair meets only at min(own tiers), in the one cell containing the
    # bbox intersection's lower-left corner — no pair-level dropDuplicates
    j = j.filter(F.col("_kt") == F.least(F.col("_te"), F.col("_ptp")))
    refine = (
        (F.col(x0) <= F.col("_px1")) & (F.col(x1) >= F.col("_px0"))
        & (F.col(y0) <= F.col("_py1")) & (F.col(y1) >= F.col("_py0"))
    )
    j = j.filter(refine)
    j = j.withColumn("_rd", F.pow(F.lit(2.0), F.col("_kt").cast("double")))
    j = j.withColumn("_rm", F.col("_rd").cast("long") - 1)
    j = _ref_point_filter(
        j,
        F.greatest(F.col(x0), F.col("_px0")),
        F.greatest(F.col(y0), F.col("_py0")),
    )
    return j.select(extent_id, polygon_id)


def _extent_cells(
    df: DataFrame, id_col: str, x0: str, y0: str, x1: str, y1: str,
    extra_cols: tuple[str, ...] = (),
    bounds=None,
) -> DataFrame:
    """Extent rows → (id, x0..y1, _te, _cell) at the span-based adaptive
    tier (<= 4 cells per row) — pure Column math shared by both extent-join
    paths."""
    ex = df.withColumn("_te", _extent_tier_expr(x0, y0, x1, y1, bounds))
    ex = ex.withColumn("_r", F.pow(F.lit(2.0), F.col("_te").cast("double")).cast("long"))
    rl = F.col("_r").cast("double")
    # norm_lon_upper on BOTH lon bounds (same seam rule as
    # _extent_multitier_keys): identical to norm_lon everywhere except
    # exactly +180, where the wrap would put the lower bound in cell 0
    # while the upper clamps to r-1 — a degenerate x0=x1=180 box would
    # otherwise explode a sequence over the whole 2^31-cell row
    gx0 = F.least(F.greatest(F.floor(sqlcells.norm_lon_upper(F.col(x0), bounds) * rl), F.lit(0)), F.col("_r") - 1).cast("long")
    gy0 = F.least(F.greatest(F.floor(sqlcells.norm_lat(F.col(y0), bounds) * rl), F.lit(0)), F.col("_r") - 1).cast("long")
    gx1 = F.least(F.greatest(F.floor(sqlcells.norm_lon_upper(F.col(x1), bounds) * rl), gx0), F.col("_r") - 1).cast("long")
    gy1 = F.least(F.greatest(F.floor(sqlcells.norm_lat(F.col(y1), bounds) * rl), gy0), F.col("_r") - 1).cast("long")
    return (
        ex.withColumn("_gx0", gx0).withColumn("_gx1", gx1)
        .withColumn("_gy0", gy0).withColumn("_gy1", gy1)
        .withColumn("_gx", F.explode(F.sequence(F.col("_gx0"), F.col("_gx1"))))
        .withColumn("_gy", F.explode(F.sequence(F.col("_gy0"), F.col("_gy1"))))
        .withColumn("_cell", sqlcells.interleave(F.col("_gx"), F.col("_gy")))
        .select(id_col, x0, y0, x1, y1, "_te", "_cell", *extra_cols)
    )


def _extent_tier_expr(x0: str, y0: str, x1: str, y1: str, bounds=None) -> Column:
    """Span-based adaptive tier for an extent row (same rule as
    `_extent_cells` — tier t is the finest grid whose cell >= the extent's
    span, so the cover is always <= 2x2 cells)."""
    wx = 360.0 if bounds is None else float(bounds[2] - bounds[0])
    wy = 180.0 if bounds is None else float(bounds[3] - bounds[1])
    sx = (F.col(x1) - F.col(x0)) / F.lit(wx)
    sy = (F.col(y1) - F.col(y0)) / F.lit(wy)
    span = F.greatest(sx, sy, F.lit(0.0))
    return (
        F.when(span <= 0.0, F.lit(cells.MAX_TIER))
        .otherwise(
            F.least(F.greatest(F.floor(-F.log2(span)).cast("int"), F.lit(0)), F.lit(cells.MAX_TIER))
        )
    )


def _extent_multitier_keys(
    ex: DataFrame, id_col: str, x0: str, y0: str, x1: str, y1: str,
    partner_tiers: list[int],
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Extent rows (pre-tagged with own tier ``_te``) → one row per
    (extent, emission tier, covering cell), where the emission tiers are
    the row's OWN tier plus every strictly-coarser tier present on the
    partner side, and the cell cover is computed DIRECTLY at each emission
    tier.

    Because the cover is re-derived per tier (not truncated from the own-
    tier cover), (id, key) rows are unique by construction — two own-tier
    cells can never collapse onto the same coarse key twice.  This is what
    makes the downstream reference-point join emission exact with NO
    dropDuplicates (see `tiered_extent_join_shuffle`).

    Output columns: id, x0..y1, extras, _te (own tier), _kt (emission
    tier), _cell (Z-order cell at _kt), key (tier-packed long).
    """
    tier_arr = F.array(*[F.lit(int(t)) for t in sorted(set(partner_tiers))])
    emit = F.array_append(F.filter(tier_arr, lambda t: t < F.col("_te")), F.col("_te"))
    ex = ex.withColumn("_kt", F.explode(emit))
    ex = ex.withColumn("_rd", F.pow(F.lit(2.0), F.col("_kt").cast("double")))
    ex = ex.withColumn("_rm", F.col("_rd").cast("long") - 1)
    rd, rm = F.col("_rd"), F.col("_rm")
    # norm_lon_upper on BOTH bounds: identical to norm_lon everywhere
    # except exactly +180, where the wrap would put the lower bound in
    # cell 0 while the upper clamps to r-1 — a degenerate seam box would
    # otherwise cover the whole row (2^31 cells at the point tier)
    gx0 = F.least(F.greatest(F.floor(sqlcells.norm_lon_upper(F.col(x0)) * rd), F.lit(0)), rm).cast("long")
    gy0 = F.least(F.greatest(F.floor(sqlcells.norm_lat(F.col(y0)) * rd), F.lit(0)), rm).cast("long")
    ex = ex.withColumn("_gx0", gx0).withColumn("_gy0", gy0)
    gx1 = F.least(F.greatest(F.floor(sqlcells.norm_lon_upper(F.col(x1)) * rd), F.col("_gx0")), rm).cast("long")
    gy1 = F.least(F.greatest(F.floor(sqlcells.norm_lat(F.col(y1)) * rd), F.col("_gy0")), rm).cast("long")
    offs = F.array(*[F.lit(int(o)) for o in cells.TIER_OFFSETS[: cells.MAX_TIER + 1]])
    return (
        ex.withColumn("_gx1", gx1).withColumn("_gy1", gy1)
        .withColumn("_gx", F.explode(F.sequence(F.col("_gx0"), F.col("_gx1"))))
        .withColumn("_gy", F.explode(F.sequence(F.col("_gy0"), F.col("_gy1"))))
        .withColumn("_cell", sqlcells.interleave(F.col("_gx"), F.col("_gy")))
        .withColumn("key", (F.element_at(offs, F.col("_kt") + 1) + F.col("_cell")).cast("long"))
        .select(id_col, x0, y0, x1, y1, "_te", "_kt", "_cell", "key", *extra_cols)
    )


def _ref_point_filter(j: DataFrame, px: Column, py: Column) -> DataFrame:
    """PBSM reference-point dedup filter (Patel & DeWitt, SIGMOD'96 §4.3):
    keep a joined row iff the cell at tier ``_kt`` containing the bbox
    intersection's lower-left corner (px, py) is THIS join cell ``_cell``.
    Each truly-intersecting pair passes in exactly one (tier, cell), so
    the join emits it exactly once — no pair-level dropDuplicates shuffle.

    Uses the SAME normalization as the cover generation (norm_lon_upper so
    px == +180 lands in the last column, matching the cover's clamp).

    Codegen-size note (r4 perf fix): the original predicate interleaved
    (gxp, gyp) and compared against ``_cell``; the inline Morton spread
    duplicates its operand subtree 32x, and with the normalization inside
    it the joined stage's generated Java exceeded the JVM's 64KB method
    limit — Spark silently ran the hottest stage of the BIG x BIG extent
    join in interpreted (non-codegen) mode.  Inverting the equality —
    ``gxp == compact_x(_cell) AND gyp == compact_y(_cell)`` — puts the
    duplication on the ``_cell`` ATTRIBUTE (tiny per copy) and references
    each large normalization expression exactly once, so the whole filter
    stays inside whole-stage codegen even when the optimizer folds it into
    the join condition."""
    rd, rm = F.col("_rd"), F.col("_rm")
    gxp = F.least(F.greatest(F.floor(sqlcells.norm_lon_upper(px) * rd), F.lit(0)), rm).cast("long")
    gyp = F.least(F.greatest(F.floor(sqlcells.norm_lat(py) * rd), F.lit(0)), rm).cast("long")
    return j.filter(
        (gxp == sqlcells.compact_x(F.col("_cell")))
        & (gyp == sqlcells.compact_y(F.col("_cell")))
    )


def _extent_keys(ex_cells: DataFrame, partner_tiers: list[int]) -> DataFrame:
    """Keys = own-tier cell + truncations to each coarser partner tier."""
    offs = F.array(*[F.lit(int(o)) for o in cells.TIER_OFFSETS[: cells.MAX_TIER + 1]])
    own_key = F.element_at(offs, F.col("_te") + 1) + F.col("_cell")
    trunc = [
        F.when(
            F.col("_te") > t,
            F.lit(int(cells.TIER_OFFSETS[t])) + F.expr(f"shiftrightunsigned(_cell, 2 * (_te - {t}))"),
        )
        for t in sorted(partner_tiers)
    ]
    keys = F.array_compact(F.array(own_key.cast("long"), *[k.cast("long") for k in trunc]))
    return ex_cells.withColumn("key", F.explode(keys)).drop("_te", "_cell")


def tiered_extent_join_shuffle(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "left_id",
    right_id: str = "right_id",
    lcols: tuple[str, str, str, str] = ("x0", "y0", "x1", "y1"),
    rcols: tuple[str, str, str, str] = ("x0", "y0", "x1", "y1"),
) -> DataFrame:
    """BIG×BIG extent join: both sides adaptively tiered + duplicated, met
    at min(tier) via symmetric truncation, shuffle equi-join on the packed
    key — the reference's full TieredSpatialJoin shape where neither side
    broadcasts (per-tier cogroups folded into one equi-join).

    Tier discovery runs on BOTH sides (two tiny distinct aggregates —
    TieredSpatialJoin.java:173-207 does the same with collectAsync), then
    each side emits its bbox cover at its own tier plus at every coarser
    tier PRESENT ON THE PARTNER side (cover re-derived per tier, so
    (id, key) rows are unique).  A pair meets at exactly one tier — the
    min of the two own tiers — and within that tier the PBSM
    reference-point test keeps exactly one of its shared cells, so the
    join emits every intersecting pair EXACTLY ONCE with no pair-level
    dropDuplicates (the reference pays a DedupeFilter + distinct here;
    at 10^8+ output pairs that distinct is the dominant shuffle).
    """
    lx0, ly0, lx1, ly1 = lcols
    rx0, ry0, rx1, ry1 = rcols
    # localCheckpoint (MEMORY_AND_DISK, ContextCleaner-reclaimed): each
    # side's bbox+tier projection computes once and serves both tier
    # discovery and key generation
    lc = left.select(left_id, lx0, ly0, lx1, ly1).withColumn(
        "_te", _extent_tier_expr(lx0, ly0, lx1, ly1)).localCheckpoint()
    rc = right.select(right_id, rx0, ry0, rx1, ry1).withColumn(
        "_te", _extent_tier_expr(rx0, ry0, rx1, ry1)).localCheckpoint()
    l_tiers = sorted(r[0] for r in lc.select("_te").distinct().collect())
    r_tiers = sorted(r[0] for r in rc.select("_te").distinct().collect())
    if not l_tiers or not r_tiers:
        return left.select(left_id).limit(0).crossJoin(right.select(right_id).limit(0))

    lk = (
        _extent_multitier_keys(lc, left_id, lx0, ly0, lx1, ly1, r_tiers)
        .withColumnsRenamed({lx0: "_lx0", ly0: "_ly0", lx1: "_lx1", ly1: "_ly1", "_te": "_lte"})
    )
    rk = (
        _extent_multitier_keys(rc, right_id, rx0, ry0, rx1, ry1, l_tiers)
        .withColumnsRenamed({rx0: "_rx0", ry0: "_ry0", rx1: "_rx1", ry1: "_ry1", "_te": "_rte"})
        .drop("_kt", "_cell")
    )
    j = lk.join(rk, "key")
    # a pair's single meet tier is min(own tiers): keys at any common
    # coarser tier are dropped here, keys at finer tiers never matched
    j = j.filter(F.col("_kt") == F.least(F.col("_lte"), F.col("_rte")))
    refine = (
        (F.col("_lx0") <= F.col("_rx1")) & (F.col("_lx1") >= F.col("_rx0"))
        & (F.col("_ly0") <= F.col("_ry1")) & (F.col("_ly1") >= F.col("_ry0"))
    )
    j = j.filter(refine)
    j = j.withColumn("_rd", F.pow(F.lit(2.0), F.col("_kt").cast("double")))
    j = j.withColumn("_rm", F.col("_rd").cast("long") - 1)
    j = _ref_point_filter(
        j,
        F.greatest(F.col("_lx0"), F.col("_rx0")),
        F.greatest(F.col("_ly0"), F.col("_ry0")),
    )
    return j.select(left_id, right_id)


def semi_join_matches(points: DataFrame, pairs: DataFrame, point_id: str = "image_id") -> DataFrame:
    """Matched point rows (left_semi back to base table,
    TieredSpatialJoin.java:364-372).  left_semi tolerates duplicate keys on
    the right — no pre-distinct shuffle needed."""
    return points.join(pairs.select(point_id), point_id, "left_semi")


def anti_join_matches(points: DataFrame, pairs: DataFrame, point_id: str = "image_id") -> DataFrame:
    """Negative-predicate output (subtractByKey, TieredSpatialJoin.java:357-363)."""
    return points.join(pairs.select(point_id), point_id, "left_anti")


# join-expressible pairwise predicates (all ⊆ intersects, so the cell-cover
# candidate generation is a valid superset for each; `disjoint` is the one
# registry member that is NOT a cell join — use anti_join_matches)
GEOMETRY_JOIN_PREDICATES = (
    "intersects", "dwithin", "within", "covers", "contains",
    "touches", "crosses", "overlaps", "equals",
)

_PAIRWISE_UDF = {
    "within": lambda la, ra: geo_udfs.st_within_wkt(la, ra),
    "covers": lambda la, ra: geo_udfs.st_covers_wkt(la, ra),
    "contains": lambda la, ra: geo_udfs.st_contains_wkt(la, ra),
    "touches": lambda la, ra: geo_udfs.st_touches_wkt(la, ra),
    "crosses": lambda la, ra: geo_udfs.st_crosses_wkt(la, ra),
    "overlaps": lambda la, ra: geo_udfs.st_overlaps_wkt(la, ra),
    "equals": lambda la, ra: geo_udfs.st_equals_wkt(la, ra),
}


def _pairwise_refine(j: DataFrame, predicate: str, radius: float) -> DataFrame:
    """Shared exact pairwise refine over (_lwkt, _rwkt) candidate columns —
    the full registered UDF family (GeomFunctionRegistry.java:26-42):
    intersects / dwithin / within / covers / contains / touches / crosses /
    overlaps / equals, each left-vs-right."""
    la, ra = F.col("_lwkt"), F.col("_rwkt")
    if predicate == "intersects":
        return j.filter(geo_udfs.st_intersects_wkt(la, ra))
    if predicate == "dwithin":
        return j.filter(geo_udfs.st_distance_wkt(la, ra) <= F.lit(float(radius)))
    return j.filter(_PAIRWISE_UDF[predicate](la, ra))


def _box_box_predicate(predicate: str):
    """JVM Column twin of each predicate for axis-aligned box × box pairs
    (exact interval algebra — the geometry IS its bbox).  Columns:
    left (_lx0.._ly1), right (_rx0.._ry1, unbuffered)."""
    l0, m0, l1, m1 = (F.col(c) for c in ("_lx0", "_ly0", "_lx1", "_ly1"))
    r0, s0, r1, s1 = (F.col(c) for c in ("_rx0", "_ry0", "_rx1", "_ry1"))
    ix = (l0 <= r1) & (r0 <= l1) & (m0 <= s1) & (s0 <= m1)
    interiors = (l0 < r1) & (r0 < l1) & (m0 < s1) & (s0 < m1)
    l_cov_r = (l0 <= r0) & (m0 <= s0) & (l1 >= r1) & (m1 >= s1)
    r_cov_l = (r0 <= l0) & (s0 <= m0) & (r1 >= l1) & (s1 >= m1)
    return {
        "intersects": ix,
        "touches": ix & ~interiors,
        "overlaps": interiors & ~l_cov_r & ~r_cov_l,
        "within": r_cov_l,
        "covers": l_cov_r,
        "contains": l_cov_r,  # positive-area boxes: covers == contains
        "equals": (l0 == r0) & (m0 == s0) & (l1 == r1) & (m1 == s1),
        "crosses": F.lit(False),  # area × area never crosses
    }.get(predicate)


def geometry_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    radius: float = 0.0,
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_wkt: str = "wkt",
    right_wkt: str = "wkt",
    max_cells: int = cells.JOIN_MAX_CELLS,
    left_bbox_cols: tuple[str, str, str, str] | None = None,
    left_is_box: bool = False,
    exactly_once: bool = False,
) -> DataFrame:
    """General geometry × geometry join — ANY supported WKT on both sides
    (LINESTRING tracks, polygons with holes, multi-geometries, points).

    ``exactly_once=True`` selects the STATELESS exactly-once plan: right
    covers are left untrimmed (full bbox covers, so the PBSM reference
    point provably lands in a shared candidate cell) and every pair-level
    ``dropDuplicates`` is replaced by the reference-point filter — the
    plan contains no stateful operator, which is what lets the SAME
    operator run unchanged on a streaming left side
    (streaming.ingest.streaming_geometry_join).  Batch callers keep the
    default (trimmed covers prune more candidates; the post-refine
    dedup runs on the small output).

    ``left_bbox_cols=(x0, y0, x1, y1)``: when the caller already has the
    left envelopes as columns, pass them to skip the WKT→bbox Arrow pass
    entirely (one fewer scan of the big side).

    ``left_is_box=True`` declares every left geometry an axis-aligned box
    equal to its envelope: candidates whose right geometry is also a box
    then refine with JVM interval algebra inside the join's codegen stage
    — zero Python and zero WKT movement for the box×box majority; only
    non-box right geometries take the Arrow refine.

    The reference's full TieredSpatialJoin over arbitrary JTS geometries
    (TieredSpatialJoin.java:75-377; its flagship IT is hail points ×
    tornado-track LINESTRINGs, GeoWaveSparkSpatialJoinIT.java:97-175),
    folded into one plan:

    * right (broadcastable) side: driver-side adaptive-tier cover of each
      geometry (trimmed to cells the true geometry touches; buffered by
      `radius` for dwithin) + truncations to every coarser tier — the
      reprojectToTier direction where the right side is coarser;
    * left (big) side: bbox via one Arrow-batched UDF, span-based adaptive
      tier (<= 4 cells, pure Column math), keys at its own tier plus
      truncations to each coarser right-side tier;
    * equi-join on the packed key → JVM bbox prefilter → exact pairwise
      refine (st_intersects_wkt / st_distance_wkt, candidate pairs only)
      → dedupe (DedupeFilter semantics — extents meet in multiple cells).

    Output: (left_id, right_id) pairs.
    """
    import numpy as np
    import pandas as pd

    from .. import geom

    if predicate not in GEOMETRY_JOIN_PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    buffer = radius if predicate == "dwithin" else 0.0
    spark = left.sparkSession
    if not probe_broadcastable(right, right_wkt):
        # build-side guard: never materialize an unbounded right side on
        # the driver — route oversized builds to the keyed-shuffle twin
        # (same output contract) instead of OOMing below
        return geometry_join_shuffle(
            left, right, predicate=predicate, radius=radius,
            left_id=left_id, right_id=right_id,
            left_wkt=left_wkt, right_wkt=right_wkt,
            left_bbox_cols=left_bbox_cols,
        )
    rows = [(r[0], r[1]) for r in right.select(right_id, right_wkt).collect()]
    if not rows:
        return left.select(left_id).limit(0).crossJoin(right.select(right_id).limit(0))

    covers = geo_udfs.cover_keys(
        pd.Series([w for _, w in rows]),
        max_cells=max_cells, buffer=buffer,
        # exactly-once emission needs FULL bbox covers: the PBSM reference
        # point is a bbox-intersection corner, which a geometry-trimmed
        # cover may not contain
        trim=not buffer and not exactly_once,
        # boundary-closed cover: a right geometry whose upper edge lies
        # exactly on a cell line still meets left extents touching it from
        # the next cell (the Column-math left cover is already closed).
        # Buffered (dwithin) covers need this too: a partner at EXACTLY
        # distance `radius` on a cell line past the buffered bbox's upper
        # edge lands in the next cell, and the refine's <= would accept it.
        closed=True,
    )
    cell_rows: list[tuple] = []
    r_tiers: set[int] = set()
    for (rid, wkt), keys in zip(rows, covers):
        g = geom.geometry_from_wkt(wkt)
        bx0, by0, bx1, by1 = g.bbox
        # this right geometry IS its bbox (axis-aligned box, no holes, in
        # range): box×box candidates can refine JVM-side (interval algebra)
        rbox = bool(g.is_box() and bx1 <= 180.0)
        keys = np.asarray(keys, dtype=np.int64)
        if not keys.size:
            continue
        tp, cover = cells.unpack_key(keys)
        tp = int(tp[0])
        r_tiers.add(tp)
        for t in range(tp, -1, -1):
            tc = np.unique(cells.cell_at_tier(cover, tp, t))
            for k in cells.pack_key(t, tc).tolist():
                cell_rows.append(
                    (int(k), rid, float(bx0 - buffer), float(by0 - buffer),
                     float(bx1 + buffer), float(by1 + buffer), rbox, tp)
                )
    if not r_tiers:
        return left.select(left_id).limit(0).crossJoin(right.select(right_id).limit(0))

    right_cells = F.broadcast(
        spark.createDataFrame(
            cell_rows,
            "key long, _rid string, _rx0 double, _ry0 double, _rx1 double, _ry1 double, _rbox boolean, _rtp int",
        )
    )
    right_wkts = F.broadcast(
        spark.createDataFrame(list(rows), "_rid string, _rwkt string")
    )

    if left_bbox_cols is not None:
        bx0, by0, bx1, by1 = left_bbox_cols
        lb = left.select(
            left_id,
            F.col(left_wkt).alias("_lwkt"),
            F.col(bx0).alias("_lx0"), F.col(by0).alias("_ly0"),
            F.col(bx1).alias("_lx1"), F.col(by1).alias("_ly1"),
        )
    else:
        lb = left.select(left_id, left_wkt).withColumn(
            "_bb", geo_udfs.st_bbox(F.col(left_wkt))
        ).select(
            left_id,
            F.col(left_wkt).alias("_lwkt"),
            F.col("_bb.x0").alias("_lx0"), F.col("_bb.y0").alias("_ly0"),
            F.col("_bb.x1").alias("_lx1"), F.col("_bb.y1").alias("_ly1"),
        )
    ec = lb.withColumn("_te", _extent_tier_expr("_lx0", "_ly0", "_lx1", "_ly1"))
    lk = _extent_multitier_keys(
        ec, left_id, "_lx0", "_ly0", "_lx1", "_ly1", sorted(r_tiers),
        extra_cols=("_lwkt",),
    )

    j = lk.join(right_cells, "key")
    # meet-tier filter (the shuffle twin's exactly-once-per-tier rule): a
    # true pair always shares a key at tier min(left own, right own) — a
    # geometry point inside the bbox overlap keys a trimmed right cell
    # whose ancestor both sides emit.  This cuts the cross-tier duplicate
    # candidates BEFORE the Arrow refine with zero extra exchange (a
    # measured dedupe-exchange here costs more than the duplicate refines
    # it saves); only the <= 4 same-tier multi-cell duplicates remain for
    # the cheap post-refine dropDuplicates.
    j = j.filter(F.col("_kt") == F.least(F.col("_te"), F.col("_rtp")))
    # JVM bbox prefilter (right bbox pre-buffered for dwithin); unwrapped
    # antimeridian right geometries (x1 > 180) skip it — exactness comes
    # from the pairwise refine which tests the +360 copy
    prefilter = (
        (F.col("_lx0") <= F.col("_rx1")) & (F.col("_lx1") >= F.col("_rx0"))
        & (F.col("_ly0") <= F.col("_ry1")) & (F.col("_ly1") >= F.col("_ry0"))
    ) | (F.col("_rx1") > 180.0)
    j = j.filter(prefilter)
    # containment-family predicates admit a stronger JVM-side NECESSARY
    # envelope condition than plain overlap (within(l,r) ⇒ bbox(l) ⊆
    # bbox(r), covers/contains(l,r) ⇒ bbox(l) ⊇ bbox(r), equals ⇒ equal
    # envelopes) — it prunes most candidates before the Arrow refine ever
    # sees them.  Unwrapped antimeridian right geometries keep the escape.
    l_in_r = (
        (F.col("_lx0") >= F.col("_rx0")) & (F.col("_lx1") <= F.col("_rx1"))
        & (F.col("_ly0") >= F.col("_ry0")) & (F.col("_ly1") <= F.col("_ry1"))
    )
    r_in_l = (
        (F.col("_lx0") <= F.col("_rx0")) & (F.col("_lx1") >= F.col("_rx1"))
        & (F.col("_ly0") <= F.col("_ry0")) & (F.col("_ly1") >= F.col("_ry1"))
    )
    necessary = {
        "within": l_in_r,
        "covers": r_in_l,
        "contains": r_in_l,
        "equals": l_in_r & r_in_l,
    }.get(predicate)
    if necessary is not None and not buffer:
        # either side unwrapped across the antimeridian → envelopes are not
        # comparable in plain coordinates; leave those to the exact refine
        j = j.filter(necessary | (F.col("_rx1") > 180.0) | (F.col("_lx1") > 180.0))

    if exactly_once:
        # PBSM reference-point emission BEFORE the refine: every candidate
        # pair survives in exactly the one (tier, cell) containing the
        # lower-left corner of bbox(l) ∩ bbox(r) (right bbox pre-buffered
        # for dwithin) — no dropDuplicates anywhere in the plan.
        # Unwrapped antimeridian right geometries (_rx1 > 180, cover split
        # across the seam by _split_for_cover): when the pair overlaps the
        # plain copy in x, the plain corner is the witness cell (wrapped-
        # side duplicates fail the equality); when it meets ONLY the
        # wrapped copy, the corner is taken against the -360-shifted right
        # bbox — both cases land in exactly one shared candidate cell, so
        # seam pairs are neither dropped nor duplicated (review r5 fix;
        # tests/test_geometry_join.py::test_exactly_once_antimeridian).
        j = j.withColumn("_rd", F.pow(F.lit(2.0), F.col("_kt").cast("double")))
        j = j.withColumn("_rm", F.col("_rd").cast("long") - 1)
        wrapped_only = (F.col("_rx1") > 180.0) & (F.col("_lx1") < F.col("_rx0"))
        px = F.when(
            wrapped_only, F.greatest(F.col("_lx0"), F.col("_rx0") - 360.0)
        ).otherwise(F.greatest(F.col("_lx0"), F.col("_rx0")))
        j = _ref_point_filter(
            j, px, F.greatest(F.col("_ly0"), F.col("_ry0"))
        )

    box_pred = _box_box_predicate(predicate) if left_is_box and not buffer else None
    if box_pred is not None:
        # box×box candidates never touch Python OR the WKT column: the
        # interval-algebra predicate refines them inside the same codegen
        # stage (the common case — box workloads stay 100% JVM); only
        # candidates with a non-box right geometry take the Arrow refine.
        # Which rids are boxes is known driver-side — no runtime probe.
        j_box = j.filter(F.col("_rbox")).filter(box_pred).select(
            F.col(left_id), F.col("_rid").alias(right_id)
        )
        if not exactly_once:
            j_box = j_box.dropDuplicates([left_id, right_id])
        if all(r[6] for r in cell_rows):  # every right geometry is a box
            return j_box
        j_gen = _pairwise_refine(
            j.filter(~F.col("_rbox")).join(right_wkts, "_rid"), predicate, radius
        )
        # box/general right ids are disjoint sets; the meet-tier filter
        # leaves only same-tier multi-cell duplicates — deduped on the
        # (small) refined output
        j_gen = j_gen.select(F.col(left_id), F.col("_rid").alias(right_id))
        if not exactly_once:
            j_gen = j_gen.dropDuplicates([left_id, right_id])
        return j_box.unionByName(j_gen)

    j = _pairwise_refine(j.join(right_wkts, "_rid"), predicate, radius)
    out = j.select(F.col(left_id), F.col("_rid").alias(right_id))
    if not exactly_once:
        out = out.dropDuplicates([left_id, right_id])
    return out


def geometry_join_shuffle(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    radius: float = 0.0,
    left_id: str = "left_id",
    right_id: str = "right_id",
    left_wkt: str = "wkt",
    right_wkt: str = "wkt",
    carry_wkt: bool = False,
    left_bbox_cols: tuple[str, str, str, str] | None = None,
) -> DataFrame:
    """BIG × BIG geometry join: both sides bbox'd (one Arrow UDF each),
    adaptively tiered + symmetrically truncated (tiered_extent_join_shuffle
    machinery), met on the packed key, bbox-prefiltered JVM-side, then
    exact pairwise refine on the surviving candidates only.

    dwithin buffers the LEFT bbox by radius before tiering (sufficient:
    any pair within r overlaps after one side's expansion).

    ``carry_wkt``: False (default) keeps the keyed shuffle NARROW (ids +
    bboxes only), dedupes candidate id pairs first, then joins the WKTs
    back by id for the refine — measured faster already at 60-byte WKTs
    (BENCH.md), and the gap widens with geometry size since the text is
    never duplicated into covering-cell rows.  True rides the WKT through
    the single keyed shuffle (fewer joins; fine for tiny geometry sets).

    ``left_bbox_cols``: precomputed left envelopes — skips the WKT→bbox
    Arrow pass (same contract as geometry_join).

    Unwrapped antimeridian WKTs (x1 > 180, the LongitudeDefinition
    convention) are handled like the broadcast path: the envelope is SPLIT
    into its [-180,180] images ([x0,180] plus [-180, x1-360]) so the cell
    cover reaches both sides of the wrap; exactness then comes from the
    pairwise refine, which also evaluates the -360-shifted image.
    """
    if predicate not in GEOMETRY_JOIN_PREDICATES:
        raise ValueError(f"unknown predicate {predicate!r}")
    buffer = radius if predicate == "dwithin" else 0.0

    def bboxed(df, id_col, wkt_col, prefix, pad, bbox_cols=None):
        if bbox_cols is not None:
            x0c, y0c, x1c, y1c = (F.col(c) for c in bbox_cols)
            b = df.select(id_col, wkt_col, *bbox_cols)
        else:
            b = df.select(id_col, wkt_col).withColumn(
                "_bb", geo_udfs.st_bbox(F.col(wkt_col))
            )
            x0c, y0c, x1c, y1c = (F.col(f"_bb.{c}") for c in ("x0", "y0", "x1", "y1"))
        # antimeridian-crossing envelopes (x1 > 180) split into two
        # in-range images; everything else keeps one row (_seg = 0).
        # dwithin padding below -180 is clamped, not wrapped: the pairwise
        # kernel is planar, so no cross-meridian match exists there to keep
        b = b.withColumn(
            "_seg",
            F.explode(
                F.when((x1c + pad) > 180.0, F.array(F.lit(0), F.lit(1)))
                .otherwise(F.array(F.lit(0)))
            ),
        )
        wrapped = F.col("_seg") == 1
        return b.select(
            id_col,
            "_seg",
            ((x1c + pad) > 180.0).alias(f"{prefix}split"),
            F.col(wkt_col).alias(f"{prefix}wkt"),
            F.when(wrapped, F.lit(-180.0))
            .otherwise(F.greatest(x0c - pad, F.lit(-180.0)))
            .alias(f"{prefix}x0"),
            (y0c - pad).alias(f"{prefix}y0"),
            F.when(wrapped, x1c + pad - 360.0)
            .otherwise(F.least(x1c + pad, F.lit(180.0)))
            .alias(f"{prefix}x1"),
            (y1c + pad).alias(f"{prefix}y1"),
        )

    lb = bboxed(left, left_id, left_wkt, "_l", buffer, left_bbox_cols)
    rb = bboxed(right, right_id, right_wkt, "_r", 0.0)
    l_extra = ("_lwkt",) if carry_wkt else ()
    r_extra = ("_rwkt",) if carry_wkt else ()
    lc = lb.withColumn(
        "_te", _extent_tier_expr("_lx0", "_ly0", "_lx1", "_ly1")
    ).localCheckpoint()
    rc = rb.withColumn(
        "_te", _extent_tier_expr("_rx0", "_ry0", "_rx1", "_ry1")
    ).localCheckpoint()
    # one pass per side: own-tier set for the symmetric truncation AND
    # whether any antimeridian split happened (split envelopes are the one
    # case where a pair can be emitted from two different segment pairs)
    lrow = lc.agg(F.collect_set("_te"), F.max("_seg")).first()
    rrow = rc.agg(F.collect_set("_te"), F.max("_seg")).first()
    l_tiers, r_tiers = sorted(lrow[0] or []), sorted(rrow[0] or [])
    if not l_tiers or not r_tiers:
        return left.select(left_id).limit(0).crossJoin(right.select(right_id).limit(0))
    any_split = bool(lrow[1]) or bool(rrow[1])
    lk = _extent_multitier_keys(
        lc, left_id, "_lx0", "_ly0", "_lx1", "_ly1", r_tiers,
        extra_cols=l_extra + ("_lsplit",),
    ).withColumnRenamed("_te", "_lte")
    rk = (
        _extent_multitier_keys(
            rc, right_id, "_rx0", "_ry0", "_rx1", "_ry1", l_tiers,
            extra_cols=r_extra + ("_rsplit",),
        )
        .withColumnRenamed("_te", "_rte")
        .drop("_kt", "_cell")
    )
    j = lk.join(rk, "key")
    j = j.filter(F.col("_kt") == F.least(F.col("_lte"), F.col("_rte")))
    j = j.filter(
        (F.col("_lx0") <= F.col("_rx1")) & (F.col("_lx1") >= F.col("_rx0"))
        & (F.col("_ly0") <= F.col("_ry1")) & (F.col("_ly1") >= F.col("_ry0"))
    )
    # containment-family necessary envelope conditions (same pruning as the
    # broadcast path): within(l,r) ⇒ bbox(l) ⊆ bbox(r) etc.  Only valid on
    # UNSPLIT envelopes — an antimeridian-split geometry's per-image boxes
    # are not its full envelope, so split rows skip straight to the refine
    l_in_r = (
        (F.col("_lx0") >= F.col("_rx0")) & (F.col("_lx1") <= F.col("_rx1"))
        & (F.col("_ly0") >= F.col("_ry0")) & (F.col("_ly1") <= F.col("_ry1"))
    )
    r_in_l = (
        (F.col("_lx0") <= F.col("_rx0")) & (F.col("_lx1") >= F.col("_rx1"))
        & (F.col("_ly0") <= F.col("_ry0")) & (F.col("_ly1") >= F.col("_ry1"))
    )
    necessary = {
        "within": l_in_r,
        "covers": r_in_l,
        "contains": r_in_l,
        "equals": l_in_r & r_in_l,
    }.get(predicate)
    if necessary is not None and not buffer:
        j = j.filter(necessary | F.col("_lsplit") | F.col("_rsplit"))
    # PBSM reference point: each candidate (envelope, envelope) pair
    # survives in exactly one (tier, cell) — candidate pairs are unique
    # WITHOUT any dropDuplicates shuffle unless a split occurred
    j = j.withColumn("_rd", F.pow(F.lit(2.0), F.col("_kt").cast("double")))
    j = j.withColumn("_rm", F.col("_rd").cast("long") - 1)
    j = _ref_point_filter(
        j,
        F.greatest(F.col("_lx0"), F.col("_rx0")),
        F.greatest(F.col("_ly0"), F.col("_ry0")),
    )
    if not carry_wkt:
        # narrow path: candidate id pairs (already unique unless split),
        # then join the geometry text back by id for the refine (the WKT
        # lookups dedupe by id: split antimeridian envelopes carry the
        # same WKT on both _seg rows)
        pairs = j.select(left_id, right_id)
        if any_split:
            pairs = pairs.dropDuplicates([left_id, right_id])
        j = pairs.join(
            lb.select(left_id, "_lwkt").dropDuplicates([left_id]), left_id
        ).join(rb.select(right_id, "_rwkt").dropDuplicates([right_id]), right_id)
    j = _pairwise_refine(j, predicate, radius)
    out = j.select(left_id, right_id)
    return out if not (carry_wkt and any_split) else out.dropDuplicates([left_id, right_id])


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
