"""XZ-ordering for extents (pure numpy) — single cell id per extent.

Implements the XZ-order space-filling curve for spatial extents from the
published construction (Böhm, Klump, Kriegel: "XZ-Ordering: A Space-Filling
Curve for Objects with Spatial Extension", SSD'99) — the same algorithm
behind the reference's XZOrderSFC (core/index/.../sfc/xz/XZOrderSFC.java:
44-120, resolution g=11): each extent maps to exactly ONE code (no
duplication), the code of the quadtree cell whose ENLARGED region (the
cell doubled rightward/upward) minimally contains it.

Engine role: the storage-side extent index (XZHierarchicalIndexStrategy
stores extents by XZ id while the Spark join re-indexes with the tiered
duplication strategy — SURVEY.md §1.2, §3.3).  `write_indexed_extents` /
`xz_range_lookup` in sources/indexed.py use these codes as a sortable
column with range-decomposed queries, mirroring that split.

Normalized space is [0,1)² via the same lon/lat normalization as cells.py.
"""

from __future__ import annotations

import numpy as np

from . import cells

G = 11  # default resolution (max quadtree level), like the reference

# subtree size at remaining depth d: S(d) = (4^(d+1) - 1) / 3  (number of
# codes rooted at a level-(g-d) cell, inclusive)


def _subtree_sizes(g: int) -> np.ndarray:
    return np.array([(4 ** (d + 1) - 1) // 3 for d in range(g + 1)], dtype=np.int64)


def xz_level(w: np.ndarray, h: np.ndarray, g: int = G) -> np.ndarray:
    """Level l of the minimal enlarged cell: largest l with max(w,h) <= 2^-l,
    capped at g (degenerate extents go to g)."""
    m = np.maximum(np.asarray(w, dtype=np.float64), np.asarray(h, dtype=np.float64))
    with np.errstate(divide="ignore"):
        l = np.floor(-np.log2(np.maximum(m, 1e-300))).astype(np.int64)
    l = np.where(m <= 0, g, l)
    return np.clip(l, 0, g)


def xz_id(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray, g: int = G
) -> np.ndarray:
    """Normalized extent → XZ sequence code (vectorized).

    Walk the quadtree path of the cell containing (x0, y0) down to the
    extent's level; the code enumerates cells in depth-first pre-order:
    stepping into quadrant q at remaining-depth d adds 1 + q * S(d-1).
    """
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    l = xz_level(np.asarray(x1) - x0, np.asarray(y1) - y0, g)
    sizes = _subtree_sizes(g)
    code = np.zeros(x0.shape, dtype=np.int64)
    cx = np.zeros_like(x0)
    cy = np.zeros_like(y0)
    half = 0.5
    for level in range(1, g + 1):
        active = level <= l
        qx = (x0 >= cx + half).astype(np.int64)
        qy = (y0 >= cy + half).astype(np.int64)
        q = qx * 2 + qy
        d_rem = g - level
        step = 1 + q * sizes[d_rem]
        code = np.where(active, code + step, code)
        cx = np.where(active & (qx == 1), cx + half, cx)
        cy = np.where(active & (qy == 1), cy + half, cy)
        half *= 0.5
    return code


def xz_id_lonlat_bbox(bbox: tuple[float, float, float, float], g: int = G) -> int:
    """Geographic bbox → XZ code using the engine's normalization."""
    nx0 = float(cells.norm_lon(np.float64(bbox[0])))
    nx1 = cells.norm_lon_upper(bbox[2])
    ny0 = float(cells.norm_lat(np.float64(bbox[1])))
    ny1 = float(cells.norm_lat(np.float64(bbox[3])))
    return int(xz_id(np.array([nx0]), np.array([ny0]), np.array([nx1]), np.array([ny1]), g)[0])


def xz_query_ranges(
    qx0: float,
    qy0: float,
    qx1: float,
    qy1: float,
    g: int = G,
    max_ranges: int | None = None,
) -> list[tuple[int, int]]:
    """Normalized query box → inclusive code ranges of candidate extents.

    An extent stored at cell c (level l) can intersect the query only if
    c's ENLARGED region intersects the query.  Recurse over the quadtree:
    * if the enlarged region of c misses the query → prune the subtree;
    * if c's own (unenlarged) region is fully inside the query, every
      stored extent in the subtree's enlarged region STILL may stick out —
      but all subtree codes remain candidates → emit the whole subtree as
      one range [code(c), code(c) + S(g - level) - 1];
    * else → keep c itself (its enlarged region intersects) and recurse
      into children.
    Exact membership is always re-checked by the bbox refine, so ranges
    only need recall (like the reference's loose index scan).

    ``max_ranges`` is the decomposition budget (the reference's
    maxRangeDecomposition / maxFilteredIndexedRanges idea,
    PrimitiveHilbertSFCOperations.java:279-382): the recursion depth is
    capped at the deepest level whose range count fits the budget —
    coarser ranges keep full recall, the refine restores precision.
    """
    sizes = _subtree_sizes(g)

    def ranges_at_cap(cap: int) -> list[tuple[int, int]]:
        out: list[tuple[int, int]] = []

        def rec(code: int, level: int, cx: float, cy: float, s: float):
            # prune when the ENLARGED region [cx, cx+2s] x [cy, cy+2s]
            # misses the (closed) query box
            if cx > qx1 or cx + 2 * s < qx0 or cy > qy1 or cy + 2 * s < qy0:
                return
            d_rem = g - level
            if (
                level == cap
                or (cx >= qx0 and cx + s <= qx1 and cy >= qy0 and cy + s <= qy1)
            ):
                # subtree fully kept: either the budget stops refinement, or
                # the cell's own region is inside the query (every stored
                # extent's anchor lies inside → intersects)
                out.append((code, code + sizes[d_rem] - 1))
                return
            out.append((code, code))
            h = s / 2
            for q, (dx, dy) in enumerate(((0.0, 0.0), (0.0, h), (h, 0.0), (h, h))):
                rec(code + 1 + q * sizes[d_rem - 1], level + 1, cx + dx, cy + dy, h)

        rec(0, 0, 0.0, 0.0, 1.0)
        out.sort()
        merged: list[tuple[int, int]] = []
        for lo, hi in out:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    if max_ranges is None:
        return ranges_at_cap(g)
    best = ranges_at_cap(0)
    for cap in range(1, g + 1):
        cand = ranges_at_cap(cap)
        if len(cand) > max_ranges:
            break
        best = cand
    return best
