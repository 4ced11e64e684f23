"""2-D Hilbert curve (pure numpy, vectorized) — the reference's default SFC.

Implements the classic public algorithm (Hamilton/Skilling-style iterative
rotation, as in the well-known `xy2d`/`d2xy` from Warren's "Hacker's
Delight" / Wikipedia's Hilbert-curve article) — NOT a port of the
reference's uzaygezen-based HilbertSFC; only the curve definition is
shared, which is public mathematics.

The engine's JOIN path defaults to Z-order (sqlcells.py: expressible as
Column bit math with the tier-prefix property the join relies on); Hilbert
is the locality-optimized STORED-LAYOUT curve, fully wired:
`sources/indexed.write_indexed_hilbert` sorts files by Hilbert distance and
`hilbert_range_lookup` pushes budgeted d-range decompositions
(:func:`hilbert_query_ranges` — quadtree cover using block-corner entry
points for the contiguous subtree ranges) to the parquet scan.  Tests pin
bijectivity, unit-step adjacency, query recall, and that Hilbert needs no
more ranges than Z-order for the same bbox (why it is the reference's
default curve).
"""

from __future__ import annotations

import numpy as np

from . import cells


def xy2d(x: np.ndarray, y: np.ndarray, tier: int) -> np.ndarray:
    """Grid coords → Hilbert distance at `tier` bits/dim (vectorized)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(max(tier - 1, 0))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return d


def d2xy(d: np.ndarray, tier: int) -> tuple[np.ndarray, np.ndarray]:
    """Hilbert distance → grid coords (inverse of :func:`xy2d`)."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    top = np.int64(1) << np.int64(tier)
    while s < top:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x = np.where(swap, x_new, x)
        y = np.where(swap, y_new, y)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def latlon_to_hilbert(lon: np.ndarray, lat: np.ndarray, tier: int) -> np.ndarray:
    """Point → Hilbert distance at `tier` (same normalization as cells.py)."""
    gx = cells.grid_coord(cells.norm_lon(lon), tier)
    gy = cells.grid_coord(cells.norm_lat(lat), tier)
    return xy2d(gx, gy, tier)


def _block_d_range(x0: int, y0: int, size: int, tier: int) -> tuple[int, int]:
    """Inclusive Hilbert d-range of the grid block [x0, x0+size)².

    A quadtree-aligned block is a contiguous run of the curve, entered and
    exited at block corners — so d_min is the min of the corner distances
    and the run length is size² (the uzaygezen BacktrackingQueryBuilder
    exploits the same contiguity).
    """
    cs = np.array([x0, x0 + size - 1, x0, x0 + size - 1], dtype=np.int64)
    rs = np.array([y0, y0, y0 + size - 1, y0 + size - 1], dtype=np.int64)
    d = xy2d(cs, rs, tier)
    lo = int(d.min())
    return lo, lo + size * size - 1


def hilbert_query_ranges(
    bbox: tuple[float, float, float, float],
    tier: int,
    max_ranges: int | None = 64,
) -> list[tuple[int, int]]:
    """Geographic bbox → inclusive Hilbert d-ranges at `tier` (recall-exact;
    refine restores precision), with the reference's range-decomposition
    budget via depth capping (HilbertSFC.decomposeRange /
    maxFilteredIndexedRanges semantics, PrimitiveHilbertSFCOperations.java:
    279-382)."""
    gx0 = int(cells.grid_coord(cells.norm_lon(np.float64(bbox[0])), tier))
    gx1 = int(np.clip(np.floor(cells.norm_lon_upper(bbox[2]) * (1 << tier)), gx0, (1 << tier) - 1))
    gy0 = int(cells.grid_coord(cells.norm_lat(np.float64(bbox[1])), tier))
    gy1 = int(cells.grid_coord(cells.norm_lat(np.float64(bbox[3])), tier))
    return rect_query_ranges(gx0, gx1, gy0, gy1, tier, max_ranges)


def rect_query_ranges(
    gx0: int,
    gx1: int,
    gy0: int,
    gy1: int,
    tier: int,
    max_ranges: int | None = 64,
) -> list[tuple[int, int]]:
    """Inclusive grid rectangle [gx0, gx1] x [gy0, gy1] → budgeted Hilbert
    d-ranges (the grid-space core of :func:`hilbert_query_ranges`, shared
    with the spherical family's per-face decomposition, cells_s2.py)."""

    def ranges_at_cap(cap: int) -> list[tuple[int, int]]:
        out: list[tuple[int, int]] = []

        def rec(x0: int, y0: int, size: int, depth: int):
            if x0 > gx1 or x0 + size - 1 < gx0 or y0 > gy1 or y0 + size - 1 < gy0:
                return
            inside = x0 >= gx0 and x0 + size - 1 <= gx1 and y0 >= gy0 and y0 + size - 1 <= gy1
            if inside or size == 1 or depth == cap:
                out.append(_block_d_range(x0, y0, size, tier))
                return
            h = size // 2
            for dx, dy in ((0, 0), (h, 0), (0, h), (h, h)):
                rec(x0 + dx, y0 + dy, h, depth + 1)

        rec(0, 0, 1 << tier, 0)
        out.sort()
        merged: list[tuple[int, int]] = []
        for lo, hi in out:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    if max_ranges is None:
        return ranges_at_cap(tier)
    best = ranges_at_cap(0)
    for cap in range(1, tier + 1):
        cand = ranges_at_cap(cap)
        if len(cand) > max_ranges:
            break
        best = cand
    return best
