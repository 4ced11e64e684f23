"""Planar geometry kernel (pure numpy) — WKT parse, point-in-polygon, distance.

Replaces the reference's JTS usage in its Spark SQL geometry UDFs
(analytics/spark/.../udf/GeomIntersects.java etc., SpatialQueryFilter.java:259-302)
with vectorized numpy, suitable for Arrow-batched pandas UDFs.  All math is
PLANAR in degrees — deliberately matching the reference's JTS semantics
(GeomDistance.java:14-23 uses planar `Geometry.distance`, not geodesic).

Only the geometry types our workload needs: POINT, POLYGON (with holes),
MULTIPOLYGON, and boxes.  The polygon predicate family maps to the
reference's registered UDFs (GeomFunctionRegistry.java:26-42):
contains / intersects / within / disjoint — expressed for the
point-vs-polygon case that the image workload exercises.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


class Polygon:
    """A polygon as vertex arrays: one exterior ring + optional holes.

    Vertices are closed rings (first == last point).
    """

    __slots__ = ("rings", "bbox")

    def __init__(self, rings: list[np.ndarray]):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        ext = self.rings[0]
        self.bbox = (
            float(ext[:, 0].min()),
            float(ext[:, 1].min()),
            float(ext[:, 0].max()),
            float(ext[:, 1].max()),
        )

    def is_box(self) -> bool:
        """True iff this is an axis-aligned rectangle without holes.

        Box polygons take the engine's JVM-only refine fast path (plain SQL
        comparisons instead of the pandas predicate UDF).
        """
        if len(self.rings) != 1:
            return False
        ext = self.rings[0]
        if len(ext) != 5:
            return False
        x0, y0, x1, y1 = self.bbox
        corners = {(x0, y0), (x1, y0), (x1, y1), (x0, y1)}
        return {(float(p[0]), float(p[1])) for p in ext[:-1]} == corners

    # -- predicates (vectorized over n points) -----------------------------

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Boundary-inclusive point-in-polygon (ray cast + on-edge test).

        Matches JTS `intersects(point)` used as the reference's default
        spatial predicate (SpatialQueryFilter: INTERSECTS is the default).
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        inside = _ray_cast(self.rings[0], lon, lat)
        for hole in self.rings[1:]:
            in_hole = _ray_cast(hole, lon, lat) & ~_on_edges(hole, lon, lat)
            inside &= ~in_hole
        return inside | _on_edges(self.rings[0], lon, lat)

    def distance(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Planar distance point→polygon (0 inside), like JTS distance."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        d = np.full(lon.shape, np.inf)
        for ring in self.rings:
            d = np.minimum(d, _dist_to_ring(ring, lon, lat))
        d = np.where(self.contains(lon, lat), 0.0, d)
        return d

    def intersects_boxes(
        self, x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray
    ) -> np.ndarray:
        """Polygon ∩ axis-aligned boxes ≠ ∅ (vectorized over boxes).

        Used for covering-cell trimming (RDDUtils.trimIndexIds:158-184).
        Conservative exact test: box corner in polygon, polygon vertex in
        box, or edge crossing.
        """
        x0, y0, x1, y1 = (np.asarray(a, dtype=np.float64) for a in (x0, y0, x1, y1))
        # polygon vertex inside box
        ext = self.rings[0]
        vx, vy = ext[:, 0], ext[:, 1]
        vert_in = (
            (vx[None, :] >= x0[:, None])
            & (vx[None, :] <= x1[:, None])
            & (vy[None, :] >= y0[:, None])
            & (vy[None, :] <= y1[:, None])
        ).any(axis=1)
        # box corners inside polygon
        corners_in = np.zeros(x0.shape, dtype=bool)
        for cx, cy in ((x0, y0), (x0, y1), (x1, y0), (x1, y1)):
            corners_in |= self.contains(cx, cy)
        # edge / box-side crossing
        cross = _edges_cross_boxes(ext, x0, y0, x1, y1)
        for hole in self.rings[1:]:
            cross |= _edges_cross_boxes(hole, x0, y0, x1, y1)
        return vert_in | corners_in | cross


def _ray_cast(ring: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Standard even-odd ray casting, vectorized points × edges."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = lon[..., None]
    py = lat[..., None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hits = cond & (px < xint)
    return hits.sum(axis=-1) % 2 == 1


def _on_edges(ring: np.ndarray, lon: np.ndarray, lat: np.ndarray, eps=1e-12) -> np.ndarray:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px, py = lon[..., None], lat[..., None]
    dx, dy = x2 - x1, y2 - y1
    cross = (px - x1) * dy - (py - y1) * dx
    within = (
        (px >= np.minimum(x1, x2) - eps)
        & (px <= np.maximum(x1, x2) + eps)
        & (py >= np.minimum(y1, y2) - eps)
        & (py <= np.maximum(y1, y2) + eps)
    )
    tol = eps * np.maximum(1.0, np.abs(dx) + np.abs(dy))
    return ((np.abs(cross) <= tol) & within).any(axis=-1)


def _dist_to_ring(ring: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px, py = lon[..., None], lat[..., None]
    dx, dy = x2 - x1, y2 - y1
    seg2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / seg2
    t = np.where(seg2 == 0, 0.0, np.clip(t, 0.0, 1.0))
    cx = x1 + t * dx
    cy = y1 + t * dy
    return np.sqrt((px - cx) ** 2 + (py - cy) ** 2).min(axis=-1)


def _edges_cross_boxes(ring, x0, y0, x1, y1):
    """Any polygon edge intersects any of the 4 box sides (per box)."""
    ex1, ey1 = ring[:-1, 0], ring[:-1, 1]
    ex2, ey2 = ring[1:, 0], ring[1:, 1]
    out = np.zeros(x0.shape, dtype=bool)
    sides = (
        (x0, y0, x1, y0),
        (x1, y0, x1, y1),
        (x1, y1, x0, y1),
        (x0, y1, x0, y0),
    )
    for sx1, sy1, sx2, sy2 in sides:
        out |= _segments_intersect(
            ex1[None, :], ey1[None, :], ex2[None, :], ey2[None, :],
            sx1[:, None] if np.ndim(sx1) else np.full((1, 1), sx1),
            sy1[:, None] if np.ndim(sy1) else np.full((1, 1), sy1),
            sx2[:, None] if np.ndim(sx2) else np.full((1, 1), sx2),
            sy2[:, None] if np.ndim(sy2) else np.full((1, 1), sy2),
        ).any(axis=1)
    return out


def _segments_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    def orient(ox, oy, px, py, qx, qy):
        return np.sign((px - ox) * (qy - oy) - (py - oy) * (qx - ox))

    o1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    o2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    o3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    o4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    return (o1 != o2) & (o3 != o4)


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------

def _parse_ring(txt: str) -> np.ndarray:
    pts = re.findall(rf"({_NUM})\s+({_NUM})", txt)
    arr = np.array(pts, dtype=np.float64)
    if not np.array_equal(arr[0], arr[-1]):
        arr = np.vstack([arr, arr[:1]])
    return arr


@lru_cache(maxsize=4096)
def polygon_from_wkt(wkt: str) -> Polygon:
    """Parse POLYGON / MULTIPOLYGON WKT (MULTIPOLYGON → exterior rings merged
    into one multi-ring Polygon for predicate purposes is WRONG, so we keep
    only POLYGON here; multipolygons are split upstream, mirroring the
    reference's one-ConstraintSet-per-part handling,
    GeometryUtils.basicConstraintsFromGeometry:154-213)."""
    w = wkt.strip()
    if not w.upper().startswith("POLYGON"):
        raise ValueError(f"unsupported WKT (POLYGON only): {w[:40]}")
    rings = [
        _parse_ring(m.group(1))
        for m in re.finditer(r"\(([^()]+)\)", w)
    ]
    return Polygon(rings)


def box_wkt(lon0: float, lat0: float, lon1: float, lat1: float) -> str:
    return (
        f"POLYGON (({lon0} {lat0}, {lon1} {lat0}, {lon1} {lat1}, "
        f"{lon0} {lat1}, {lon0} {lat0}))"
    )


def point_distance(
    lon1: np.ndarray, lat1: np.ndarray, lon2: np.ndarray, lat2: np.ndarray
) -> np.ndarray:
    """Planar point-to-point distance in degrees (GeomDistance.java:14-23)."""
    return np.sqrt(
        (np.asarray(lon1) - np.asarray(lon2)) ** 2
        + (np.asarray(lat1) - np.asarray(lat2)) ** 2
    )
