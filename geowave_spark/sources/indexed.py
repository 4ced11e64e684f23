"""Cell-indexed table layout — the storage-side index.

The reference's core trick is that the KV row key IS the spatial index, so
range scans touch only matching tablets (SURVEY.md §1.1).  The columnar
equivalent: store the SFC cell as a column, range-partition files by cell,
and sort rows within files — then Parquet/Iceberg min-max statistics prune
row groups for any sargable cell predicate, and Catalyst shows the filter
as PushedFilters at the scan.  On Iceberg this is `ALTER TABLE ... WRITE
ORDERED BY (cell)`; here plain parquet demonstrates the identical plan.

Design choice: the stored column is the FINEST-tier cell (31 bits/dim).
Coarser-tier lookups rewrite to range predicates on it — a tier-t cell c
covers exactly [c << 2*(31-t), (c+1) << 2*(31-t)) — so one stored column
serves every tier, exactly like the reference's common SFC prefix ordering
(TieredSFCIndexStrategy tier prefixes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cells, sqlcells


def with_cell_column(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", phash_col: str | None = "phash"
) -> DataFrame:
    """Add the finest-tier cell column (JVM-only bit math)."""
    if lon_col not in df.columns and phash_col:
        df = df.withColumn(lon_col, sqlcells.lon_from_phash(F.col(phash_col))).withColumn(
            lat_col, sqlcells.lat_from_phash(F.col(phash_col))
        )
    return sqlcells.add_cell_column(df, lon_col, lat_col, cells.MAX_TIER, "cell")


def write_indexed(
    df: DataFrame,
    path: str,
    n_files: int = 32,
    lon_col: str = "lon",
    lat_col: str = "lat",
    phash_col: str | None = "phash",
) -> None:
    """Write a cell-indexed copy: range-partitioned by cell across files,
    sorted by cell within files → min-max pruning on any cell range."""
    out = with_cell_column(df, lon_col, lat_col, phash_col)
    (
        out.repartitionByRange(n_files, F.col("cell"))
        .sortWithinPartitions("cell")
        .write.mode("overwrite")
        .parquet(path)
    )


def cell_range_predicate(bbox: tuple[float, float, float, float], max_cells: int = 64):
    """bbox → sargable predicate on the stored finest-tier cell column.

    Driver-side cover at an adaptive tier, each tier-t cell expanded to its
    finest-tier range — the exact analog of the reference's
    getQueryRanges SFC range decomposition (TieredSFCIndexStrategy:109-158).
    Returns (predicate Column, n_ranges).
    """
    tier = cells.tier_for_bbox(bbox, max_dup=max_cells)
    cover = cells.cells_for_bbox_at_tier(bbox, tier)
    shift = 2 * (cells.MAX_TIER - tier)
    pred = None
    for c in cover.tolist():
        lo, hi = c << shift, ((c + 1) << shift) - 1
        p = F.col("cell").between(lo, hi)
        pred = p if pred is None else (pred | p)
    return pred, len(cover)


def range_lookup_indexed(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float],
    lon_col: str = "lon",
    lat_col: str = "lat",
    loose: bool = False,
) -> DataFrame:
    """Range query against an indexed table: cell ranges reach the parquet
    scan as PushedFilters (row-group pruning via min-max on the sorted cell
    column), then exact bbox refine."""
    df = spark.read.parquet(path)
    pred, _ = cell_range_predicate(bbox)
    out = df.filter(pred)
    if not loose:
        lon0, lat0, lon1, lat1 = bbox
        out = out.filter(
            (F.col(lat_col) >= lat0)
            & (F.col(lat_col) <= lat1)
            & (F.col(lon_col) >= lon0)
            & (F.col(lon_col) <= lon1)
        )
    return out
