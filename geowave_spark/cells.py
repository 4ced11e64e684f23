"""Tiered space-filling-curve cell core (pure numpy, no Spark).

Reimplements — from scratch, Spark-first — the semantics of the reference's
tiered SFC index (reference: core/index/.../sfc/tiered/TieredSFCIndexStrategy.java:56,
core/index/.../sfc/zorder/ZOrderSFC.java:54-60, ZOrderUtils.java), with the
default spatial configuration of 31 bits per dimension over (lon, lat)
(reference: SpatialDimensionalityTypeProvider.java:52-53).

Semantics preserved (see SURVEY.md §1.2, §2.2 and the round-trip tests in
core/geotime/src/test/.../tiered/TieredSFCIndexStrategyTest.java):

* Dimensions are linearly normalized to [0, 1): lon over [-180, 180] with
  antimeridian wrap (LongitudeDefinition.java:52-67), lat over [-90, 90]
  clamped (LatitudeDefinition.java).
* Tier t has 2^t cells per dimension; cell id = Morton (Z-order) interleave
  of the two t-bit grid coordinates.  Cell ids at coarser tiers are prefixes:
  ``cell_at(t-1) == cell_at(t) >> 2`` — the property the join's
  ``reprojectToTier`` relies on (TieredSFCIndexStrategy.java:503-524).
* Adaptive insert rule: an extent is placed at the FINEST tier whose covering
  cell count <= max_duplicates (default 2^ndims = 4; the Spark join uses a cap
  of 80) (TieredSFCIndexStrategy.java:58,100-107,334-379; cap 80:
  GeoWaveIndexedRDD.java:193).  Points always land at the finest tier.
* An extent spanning multiple cells is duplicated into every covering cell
  (docs/content/devguide/040-keystructure.adoc:9); de-dup happens after the
  join (DedupeFilter.java).

We use Z-order rather than Hilbert: both preserve the tier/prefix semantics
the reference's join actually depends on (tier assignment + covering-cell
sets + prefix reprojection), and Z-order is exactly expressible as Spark
Column bit arithmetic, keeping the 100-TB hot path inside whole-stage
codegen (see sqlcells.py).
"""

from __future__ import annotations

import numpy as np

MAX_TIER = 31  # bits per dimension, matching the reference's default spatial index
DEFAULT_MAX_DUP = 4  # 2^ndims for 2D (TieredSFCIndexStrategy.java:58,100-107)
JOIN_MAX_CELLS = 80  # duplicate-cell cap used by the Spark join (GeoWaveIndexedRDD.java:193)

_WORLD = (-180.0, -90.0, 180.0, 90.0)

# Custom per-dimension bounds (CRS step 1): every normalization primitive
# takes an optional ``bounds=(x0, y0, x1, y1)``.  None = the EPSG:4326
# world frame with antimeridian WRAP on x (LongitudeDefinition semantics);
# a custom bounds tuple uses CLAMPED linear normalization on BOTH axes —
# the reference's custom-CRS index math (BasicDimensionDefinition via
# SpatialDimensionalityTypeProvider.java:107-124 decodeCRS/crsCode), where
# only the geographic default gets longitude wrapping.


# ---------------------------------------------------------------------------
# Morton (Z-order) bit interleaving, vectorized on uint64
# ---------------------------------------------------------------------------

def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so they occupy the even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_part1by1`."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton-interleave grid coords (x = lon axis → even bits, y = lat axis → odd)."""
    return (_part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << np.uint64(1))).astype(
        np.int64
    )


def deinterleave(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cell).astype(np.uint64)
    return (
        _compact1by1(c).astype(np.int64),
        _compact1by1(c >> np.uint64(1)).astype(np.int64),
    )


# ---------------------------------------------------------------------------
# Normalization (LongitudeDefinition / LatitudeDefinition semantics)
# ---------------------------------------------------------------------------

def norm_lon(lon: np.ndarray, bounds=None) -> np.ndarray:
    """Normalize x: world frame wraps across the antimeridian
    (LongitudeDefinition); custom ``bounds`` clamp (BasicDimensionDefinition
    — projected CRSes have no seam)."""
    if bounds is not None:
        x = (np.asarray(lon, dtype=np.float64) - bounds[0]) / (bounds[2] - bounds[0])
        return np.clip(x, 0.0, 1.0)
    x = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    x = x - np.floor(x)  # wrap
    return x


def norm_lat(lat: np.ndarray, bounds=None) -> np.ndarray:
    """Normalize y → [0,1], clamped (LatitudeDefinition clamps; custom
    bounds use the same clamp over (y0, y1))."""
    if bounds is not None:
        x = (np.asarray(lat, dtype=np.float64) - bounds[1]) / (bounds[3] - bounds[1])
        return np.clip(x, 0.0, 1.0)
    x = (np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
    return np.clip(x, 0.0, 1.0)


def grid_coord(norm: np.ndarray, tier: int) -> np.ndarray:
    """Normalized [0,1] value → integer grid coordinate at ``tier`` bits."""
    r = np.int64(1) << np.int64(tier)
    g = np.floor(np.asarray(norm, dtype=np.float64) * np.float64(r)).astype(np.int64)
    return np.clip(g, 0, r - 1)


def latlon_to_cell(
    lon: np.ndarray, lat: np.ndarray, tier: int = MAX_TIER, bounds=None
) -> np.ndarray:
    """Point → Z-order cell id at ``tier`` (vectorized)."""
    return interleave(
        grid_coord(norm_lon(lon, bounds), tier), grid_coord(norm_lat(lat, bounds), tier)
    )


def cell_at_tier(cell: np.ndarray, from_tier: int, to_tier: int) -> np.ndarray:
    """Reproject a cell id to a coarser tier (prefix truncation).

    Mirrors TieredSFCIndexStrategy.reprojectToTier (:503-524) for the
    coarser direction; finer requires re-expansion (see cells_for_bbox).
    """
    if to_tier > from_tier:
        raise ValueError("can only reproject to a coarser tier via prefix truncation")
    shift = np.uint64(2 * (from_tier - to_tier))
    return (np.asarray(cell).astype(np.uint64) >> shift).astype(np.int64)


def cell_to_bounds(cell: np.ndarray, tier: int, bounds=None) -> tuple[np.ndarray, ...]:
    """Cell id → (lon_min, lat_min, lon_max, lat_max) numeric extent.

    Mirrors getRangeForId / BinnedSFCUtils.getRangeForId semantics
    (TieredSFCIndexStrategy.java:208-243; BinnedSFCUtils.java:116-155).
    """
    b = _WORLD if bounds is None else bounds
    x, y = deinterleave(cell)
    r = float(1 << tier)
    sx, sy = b[2] - b[0], b[3] - b[1]
    lon_min = x / r * sx + b[0]
    lon_max = (x + 1) / r * sx + b[0]
    lat_min = y / r * sy + b[1]
    lat_max = (y + 1) / r * sy + b[1]
    return lon_min, lat_min, lon_max, lat_max


# ---------------------------------------------------------------------------
# Bounding-box covers and the adaptive tier rule
# ---------------------------------------------------------------------------

def _grid_range(
    nmin: float, nmax: float, tier: int, closed: bool = False
) -> tuple[int, int]:
    """Inclusive grid-coordinate range covering normalized [nmin, nmax].

    A max value lying exactly on a cell boundary does NOT open the next cell —
    this is what makes a bbox exactly matching a tier-t cell produce exactly
    one id at tier t (TieredSFCIndexStrategyTest.java:140-168).

    ``closed=True`` keeps the boundary cell open (plain floor — the same
    convention as the Column-math covers in sqlcells/_extent_cells): a
    QUERY-side cover must meet partners that only touch the extent's upper
    edge, which live in the next cell.
    """
    r = 1 << tier
    g0 = min(max(int(np.floor(nmin * r)), 0), r - 1)
    hi = nmax * r
    g1 = int(np.floor(hi))
    if not closed and g1 == hi and g1 > g0:  # exactly on boundary → previous cell
        g1 -= 1
    g1 = min(max(g1, g0), r - 1)
    return g0, g1


def split_bbox_antimeridian(
    bbox: tuple[float, float, float, float],
) -> list[tuple[float, float, float, float]]:
    """Split a bbox whose lon_min > lon_max into two bins.

    LongitudeDefinition.java:52-67: a wrapped range becomes
    [-180, max] and [min, 180].
    """
    import math

    lon_min, lat_min, lon_max, lat_max = bbox
    if lon_min > lon_max:  # wrapped representation
        return [
            (-180.0, lat_min, lon_max, lat_max),
            (lon_min, lat_min, 180.0, lat_max),
        ]
    if lon_max - lon_min >= 360.0:  # full wrap (e.g. world bbox buffered)
        return [(-180.0, lat_min, 180.0, lat_max)]
    # canonicalize: translate by whole revolutions so lon_min lands in
    # [-180, 180).  This subsumes the old unwrapped-below branch AND fixes
    # boxes lying entirely beyond a seam (e.g. (185, .., 190) or a part
    # starting exactly at +180, which the wrapping norm_lon would
    # otherwise blow up into a full-longitude-row cover — round-3 review)
    k = math.floor((lon_min + 180.0) / 360.0)
    if k:
        lon_min -= 360.0 * k
        lon_max -= 360.0 * k
    if lon_max > 180.0:  # crosses the seam after canonicalization
        return [
            (lon_min, lat_min, 180.0, lat_max),
            (-180.0, lat_min, lon_max - 360.0, lat_max),
        ]
    return [(lon_min, lat_min, lon_max, lat_max)]


def _split_for_cover(
    bbox: tuple[float, float, float, float], closed: bool, bounds=None
) -> list[tuple[float, float, float, float]]:
    """Antimeridian split, plus the +180 seam column for CLOSED covers.

    Stored points at lon exactly +180 wrap into grid column 0
    (``norm_lon``), but a cover whose upper bound is 180 maps that bound
    to the LAST column (``norm_lon_upper``) — so a boundary-closed
    (query-side) cover ending at the antimeridian must also include the
    wrapped column, or rows the exact refine accepts never become
    candidates.  Open (insert-rule) covers keep the reference's exact-fit
    convention unchanged.

    Custom ``bounds`` have no wrap and no seam — the bbox passes through
    whole (clamped normalization handles out-of-frame edges)."""
    if bounds is not None:
        return [bbox]
    parts = split_bbox_antimeridian(bbox)
    if closed and not any(p[0] == -180.0 for p in parts):
        # skip when a part already starts at -180 (it covers column 0) —
        # double-counting would break count==cover-size and push
        # tier_for_bbox(closed=True) a tier coarser than needed
        for x0, y0, x1, y1 in list(parts):
            if x1 == 180.0 and x0 > -180.0:
                parts.append((-180.0, y0, -180.0, y1))
    return parts


def split_bbox_query(
    bbox: tuple[float, float, float, float],
) -> list[tuple[float, float, float, float]]:
    """Query-side bbox split: antimeridian split + the +180 seam column
    (see ``_split_for_cover``) — use this wherever stored keys were built
    with the wrapping ``norm_lon`` and the lookup decomposes ranges from
    an upper bound that maps 180 to the LAST column."""
    return _split_for_cover(bbox, True)


def count_cells_for_bbox(
    bbox: tuple[float, float, float, float], tier: int, closed: bool = False,
    bounds=None,
) -> int:
    """Covering-cell count of bbox at tier (closed form, cf. getEstimatedIdCount
    ZOrderSFC.java:83-94).  ``closed`` counts the boundary-closed cover
    (query-side convention, see _grid_range)."""
    total = 0
    for b in _split_for_cover(bbox, closed, bounds):
        x0, x1 = _grid_range(norm_lon(b[0], bounds).item(), norm_lon_upper(b[2], bounds), tier, closed=closed)
        y0, y1 = _grid_range(norm_lat(b[1], bounds).item(), norm_lat(b[3], bounds).item(), tier, closed=closed)
        total += (x1 - x0 + 1) * (y1 - y0 + 1)
    return total


def norm_lon_upper(lon: float, bounds=None) -> float:
    """Normalize an upper x bound; the world frame maps +180 to 1.0 (not
    wrapped to 0); custom bounds clamp, so no seam case exists."""
    if bounds is not None:
        return float(norm_lon(np.float64(lon), bounds))
    if lon == 180.0:
        return 1.0
    return float(norm_lon(np.float64(lon)))


def tier_for_bbox(
    bbox: tuple[float, float, float, float],
    max_dup: int = DEFAULT_MAX_DUP,
    max_tier: int = MAX_TIER,
    closed: bool = False,
    bounds=None,
) -> int:
    """Adaptive insert rule: FINEST tier whose covering count <= max_dup.

    TieredSFCIndexStrategy.java:334-379 (walk tiers finest→coarsest, place at
    the first whose estimated duplicate count fits the budget).
    ``closed``: size the tier on the boundary-closed cover, so a closed
    query cover never exceeds max_dup either (it can be one row/col wider
    than the open cover at the same tier).
    """
    for t in range(max_tier, -1, -1):
        if count_cells_for_bbox(bbox, t, closed=closed, bounds=bounds) <= max_dup:
            return t
    return 0


def cells_for_bbox_at_tier(
    bbox: tuple[float, float, float, float], tier: int, cap: int | None = None,
    closed: bool = False, bounds=None,
) -> np.ndarray:
    """All covering cell ids of bbox at a fixed tier (ordered, deduped)."""
    out = []
    for b in _split_for_cover(bbox, closed, bounds):
        x0, x1 = _grid_range(norm_lon(b[0], bounds).item(), norm_lon_upper(b[2], bounds), tier, closed)
        y0, y1 = _grid_range(norm_lat(b[1], bounds).item(), norm_lat(b[3], bounds).item(), tier, closed)
        xs = np.arange(x0, x1 + 1, dtype=np.int64)
        ys = np.arange(y0, y1 + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        out.append(interleave(gx.ravel(), gy.ravel()))
    cells = np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)
    if cap is not None and cells.size > cap:
        raise ValueError(f"bbox covers {cells.size} cells at tier {tier}, cap {cap}")
    return cells


def cells_for_bbox(
    bbox: tuple[float, float, float, float],
    max_dup: int = DEFAULT_MAX_DUP,
    max_tier: int = MAX_TIER,
    closed: bool = False,
    bounds=None,
) -> tuple[int, np.ndarray]:
    """Adaptive (tier, covering cells) for an extent — the insert path.

    Returns the finest tier with <= max_dup covering cells and those cells.
    ``closed``: boundary-closed upper edges (query-side covers; see
    _grid_range).
    """
    t = tier_for_bbox(bbox, max_dup=max_dup, max_tier=max_tier, closed=closed, bounds=bounds)
    return t, cells_for_bbox_at_tier(bbox, t, closed=closed, bounds=bounds)


def neighbor_cells(lon: float, lat: float, tier: int, ring: int = 1) -> np.ndarray:
    """Cells within ``ring`` grid steps of the point's cell at ``tier``.

    The kNN ring-expansion primitive (cf. OrthodromicDistancePartitioner.java:95-140:
    neighboring partitions added by expanding the point's envelope). Lon wraps,
    lat clamps.
    """
    r = 1 << tier
    cx = int(grid_coord(norm_lon(np.float64(lon)), tier))
    cy = int(grid_coord(norm_lat(np.float64(lat)), tier))
    xs = np.arange(cx - ring, cx + ring + 1, dtype=np.int64) % r  # lon wraps
    ys = np.arange(cy - ring, cy + ring + 1, dtype=np.int64)
    ys = ys[(ys >= 0) & (ys < r)]  # lat clamps
    gx, gy = np.meshgrid(np.unique(xs), ys)
    return np.unique(interleave(gx.ravel(), gy.ravel()))


def tier_for_distance(max_distance_deg: float, max_tier: int = MAX_TIER) -> int:
    """Coarsest-cell tier whose cell side (in the smaller lat axis: 180/2^t)
    is >= max_distance, so a 3x3 neighbor ring fully covers the radius."""
    t = max_tier
    while t > 0 and 180.0 / (1 << t) < max_distance_deg:
        t -= 1
    return t


def trim_cells_to_geom(
    cells: np.ndarray, tier: int, geom_contains_bbox_test
) -> np.ndarray:
    """Drop covering cells whose rect doesn't intersect the true geometry —
    only applied when >3 cells, like RDDUtils.trimIndexIds (:158-184).

    ``geom_contains_bbox_test(lon0, lat0, lon1, lat1) -> bool array`` is
    supplied by geom.py to avoid a dependency cycle.
    """
    if cells.size <= 3:
        return cells
    lon0, lat0, lon1, lat1 = cell_to_bounds(cells, tier)
    keep = geom_contains_bbox_test(lon0, lat0, lon1, lat1)
    return cells[keep]


def ranges_for_cover(cover: np.ndarray) -> list[tuple[int, int]]:
    """Merge a sorted cover's consecutive cell ids into inclusive ranges.

    The reference's query planning emits SFC *ranges*, not cell lists
    (TieredSFCIndexStrategy.getQueryRanges → SinglePartitionQueryRanges);
    Z-order covers of a grid rectangle contain long consecutive runs, so
    ranges keep the pushed predicate small (and codegen compact).
    """
    if cover.size == 0:
        return []
    c = np.sort(np.asarray(cover, dtype=np.int64))
    breaks = np.nonzero(np.diff(c) > 1)[0]
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [c.size - 1]))
    return [(int(c[s]), int(c[e])) for s, e in zip(starts, ends)]


# ---------------------------------------------------------------------------
# Packed (tier, cell) key — one int64 join key
# ---------------------------------------------------------------------------
# The reference prefixes row keys with a tier byte
# (TieredSFCIndexStrategy.java:386-395: tierAndBinId = [tierId] + binId).  We
# pack (tier, cell) bijectively into a single long:
#   key = (4^tier - 1)/3 + cell      (cell < 4^tier, offset[32] ≈ 6.1e18 < 2^63)
# so the equi-join shuffles ONE long column instead of a (tier, cell) pair.

TIER_OFFSETS = [(4**t - 1) // 3 for t in range(MAX_TIER + 2)]


def pack_key(tier: np.ndarray | int, cell: np.ndarray) -> np.ndarray:
    t = np.asarray(tier, dtype=np.int64)
    offs = np.asarray(TIER_OFFSETS, dtype=np.int64)[t]
    return offs + np.asarray(cell, dtype=np.int64)


def unpack_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    offs = np.asarray(TIER_OFFSETS[: MAX_TIER + 1], dtype=np.int64)
    tier = (np.searchsorted(offs, key, side="right") - 1).astype(np.int64)
    return tier, key - offs[tier]


# ---------------------------------------------------------------------------
# phash → deterministic point (FIXTURES.md §1 derived geometry)
# ---------------------------------------------------------------------------

def phash_to_lonlat(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Derive the deterministic (lon, lat) of an image row from its phash."""
    u = np.asarray(phash).astype(np.int64).view(np.uint64)
    hi = ((u >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    lon = hi / 4294967296.0 * 360.0 - 180.0
    lat = lo / 4294967296.0 * 180.0 - 90.0
    return lon, lat
