"""Row-range histogram statistics → split planning and query cost estimates.

The reference maintains a RowRangeHistogramStatistics per (adapter, index,
partition) — a fixed-depth histogram over the KV row-key space — and its
SplitsProvider consumes it to (a) size input splits so every worker gets
an even share regardless of tablet skew, and (b) estimate per-range
cardinalities (core/store/.../statistics/index/RowRangeHistogramStatistics,
core/mapreduce/.../splits/SplitsProvider.java).

Columnar twins over the stored SFC ``cell`` column:

* :func:`row_range_histogram` — equi-depth boundaries (one distributed
  approx-quantile sketch pass) + per-bin exact counts; persist next to the
  table like the reference's ingest-maintained stats;
* :func:`split_points` — N-way balanced split boundaries read straight
  from the persisted histogram, feeding ``write_indexed_balanced`` so a
  skewed table still writes equal-sized cell-sorted files;
* :func:`estimate_rows` — cardinality estimate for a bbox query from the
  histogram alone (no scan), the PartitionStatistics-as-queryable-stats
  path used for join build-side and split-count decisions.
"""

from __future__ import annotations

import bisect

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cells


def row_range_histogram(
    df: DataFrame, col: str = "cell", n_bins: int = 256, rel_err: float = 0.001
) -> list[tuple[int, int, int]]:
    """Equi-depth histogram over a (cell) key column.

    One ``approxQuantile`` pass (distributed Greenwald-Khanna sketch — no
    collect of keys) picks bin boundaries; one aggregation counts rows per
    bin exactly.  Returns [(lo, hi_exclusive, n_rows)] sorted by lo.
    """
    # NULL keys never index a scan range: drop them from the counts too —
    # approxQuantile already excludes NULLs, so binning them (they'd land
    # in bin 0 via the otherwise-branch) would inflate the first bin and
    # skew every split/estimate derived from the histogram
    df = df.filter(F.col(col).isNotNull())
    probs = [i / n_bins for i in range(1, n_bins)]
    qs = df.stat.approxQuantile(col, probs, rel_err)
    edges = sorted(set(int(q) for q in qs))
    if not edges:
        n = df.count()
        return [(0, 1 << 62, n)] if n else []
    arr = F.array(*[F.lit(e) for e in edges])
    # bin index = count of edges <= key (0..len(edges)), computed JVM-side
    binned = df.select(
        F.aggregate(
            arr, F.lit(0), lambda acc, e: acc + F.when(F.col(col) >= e, 1).otherwise(0)
        ).alias("_bin")
    )
    counts = {
        r["_bin"]: r["n"]
        for r in binned.groupBy("_bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    bounds = [0] + edges + [1 << 62]
    return [
        (bounds[i], bounds[i + 1], int(counts.get(i, 0)))
        for i in range(len(bounds) - 1)
    ]


def save_histogram(spark: SparkSession, hist: list[tuple[int, int, int]], path: str) -> None:
    """Persist the histogram as a tiny parquet stats table (the analog of
    the reference's ingest-maintained statistics store)."""
    spark.createDataFrame(hist, "lo long, hi long, n long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_histogram(spark: SparkSession, path: str) -> list[tuple[int, int, int]]:
    return [
        (r["lo"], r["hi"], r["n"])
        for r in spark.read.parquet(path).orderBy("lo").collect()
    ]


def split_points(hist: list[tuple[int, int, int]], n_splits: int) -> list[int]:
    """N-way balanced key boundaries from the histogram (SplitsProvider's
    even-row-share objective): for each target cumulative share i/n pick
    the unused bin edge with the nearest cumulative row count.  Always
    returns n_splits-1 distinct ascending cut keys when the histogram has
    that many distinct edges (a hot bin absorbing several targets borrows
    its neighbors' edges instead of collapsing cuts)."""
    total = sum(n for _, _, n in hist)
    if total == 0 or n_splits <= 1:
        return []
    cum: dict[int, int] = {}
    acc = 0
    for _, hi, n in hist[:-1]:  # last hi is the open upper bound, not a cut
        acc += n
        cum[hi] = acc  # identical edges keep the last cumulative
    items = sorted(cum.items())
    chosen: set[int] = set()
    used_cums: set[int] = {0, total}  # two cuts at equal cum = an empty share
    for i in range(1, n_splits):
        target = total * i / n_splits
        best = min(
            (e for e in items if e[0] not in chosen and e[1] not in used_cums),
            key=lambda e: abs(e[1] - target),
            default=None,
        )
        if best is None:
            break
        chosen.add(best[0])
        used_cums.add(best[1])
    return sorted(chosen)


def estimate_rows(
    hist: list[tuple[int, int, int]], bbox: tuple[float, float, float, float],
    max_cells: int = 64,
) -> float:
    """Cardinality estimate for a bbox range query from the histogram
    alone (no scan): overlap each decomposed finest-tier cell range with
    the bins, assuming uniform density within a bin."""
    # closed=True: query-side cover keeps exact-boundary cells
    tier = cells.tier_for_bbox(bbox, max_dup=max_cells, closed=True)
    cover = cells.cells_for_bbox_at_tier(bbox, tier, closed=True)
    shift = 2 * (cells.MAX_TIER - tier)
    los = [lo for lo, _, _ in hist]
    est = 0.0
    for c in cover.tolist():
        qlo, qhi = c << shift, ((c + 1) << shift)  # [qlo, qhi)
        i = max(bisect.bisect_right(los, qlo) - 1, 0)
        while i < len(hist) and hist[i][0] < qhi:
            blo, bhi, n = hist[i]
            ov = min(qhi, bhi) - max(qlo, blo)
            if ov > 0 and bhi > blo:
                est += n * (ov / (bhi - blo))
            i += 1
    return est


def _hash_slot_tokens(spark: SparkSession, n: int) -> list[int]:
    """For each partition slot i in [0, n) find the smallest int token with
    ``pmod(murmur3(token), n) == i`` — so ``repartition(n, token_col)``
    (HashPartitioning, same Murmur3 as ``F.hash``) routes rows to exact
    partitions without range-boundary sampling."""
    m = max(64, 16 * n)
    while True:
        rows = (
            spark.range(m)
            .select(
                F.col("id").cast("int").alias("tok"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("slot"),
            )
            .groupBy("slot")
            .agg(F.min("tok").alias("tok"))
            .collect()
        )
        if len(rows) == n:
            by_slot = {r["slot"]: r["tok"] for r in rows}
            return [by_slot[i] for i in range(n)]
        m *= 4  # vanishingly rare: some slot unhit in 16n probes


def write_indexed_balanced(
    df: DataFrame,
    path: str,
    n_files: int = 32,
    lon_col: str = "lon",
    lat_col: str = "lat",
    phash_col: str | None = "phash",
    stats_path: str | None = None,
) -> list[tuple[int, int, int]]:
    """Cell-indexed write with histogram-driven split boundaries.

    Unlike plain ``repartitionByRange`` (which re-samples per write and
    gives no reusable artifact), the histogram is computed once, PERSISTED
    (``stats_path``) for later split planning / cost estimation, and its
    cut keys assign rows to files — equal row shares even under heavy
    spatial skew.  Returns the histogram.
    """
    from ..sources.indexed import with_cell_column

    out = with_cell_column(df, lon_col, lat_col, phash_col)
    # the histogram pass needs ONLY the 8-byte cell column — caching the
    # full payload rows (multi-KB image bytes) to share compute with the
    # write would evict/spill executor storage at real table sizes; two
    # column-pruned scans move strictly less data (round-3 review)
    hist = row_range_histogram(
        out.select("cell").localCheckpoint(), "cell", n_bins=max(n_files * 8, 64)
    )
    cuts = split_points(hist, n_files)
    arr = F.array(*[F.lit(c) for c in cuts]) if cuts else F.array(F.lit(0))
    fid = (
        F.aggregate(
            arr, F.lit(0), lambda acc, e: acc + F.when(F.col("cell") >= e, 1).otherwise(0)
        )
        if cuts
        else F.lit(0)
    )
    n_parts = len(cuts) + 1
    # Exact fid→partition routing.  repartitionByRange picks boundaries by
    # SAMPLING and can merge two fids into one partition under skew (and
    # plain repartition(n, fid) hash-collides fids), so neither guarantees
    # one file per split.  Instead map each fid to a token whose Murmur3
    # hash lands in its own partition slot — the shuffle is then an exact,
    # deterministic routing with no sampling (and no driver data collect:
    # the token probe is an O(n_files) metadata job).
    tokens = _hash_slot_tokens(df.sparkSession, n_parts)
    tok = F.element_at(F.array(*[F.lit(t) for t in tokens]), fid + 1).cast("int")
    (
        out.withColumn("_tok", tok)
        .repartition(n_parts, F.col("_tok"))
        .sortWithinPartitions("cell")
        .drop("_tok")
        .write.mode("overwrite")
        .parquet(path)
    )
    if stats_path:
        save_histogram(df.sparkSession, hist, stats_path)
    return hist
