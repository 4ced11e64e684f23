"""2-D Hilbert curve (pure numpy, vectorized) — the reference's default SFC.

Implements the classic public algorithm (Hamilton/Skilling-style iterative
rotation, as in the well-known `xy2d`/`d2xy` from Warren's "Hacker's
Delight" / Wikipedia's Hilbert-curve article) — NOT a port of the
reference's uzaygezen-based HilbertSFC; only the curve definition is
shared, which is public mathematics.

The engine defaults to Z-order (sqlcells.py) because it is expressible as
Column bit math with the tier-prefix property the join relies on; Hilbert
is provided as the locality-optimized alternative for stored layouts
(`sources/indexed.write_indexed(curve="hilbert")`): better range locality
on disk, same query semantics (ranges are computed on the same curve).
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
