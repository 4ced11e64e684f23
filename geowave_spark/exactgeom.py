"""Exact rational-arithmetic geometry fallback (``fractions.Fraction``).

The float kernel in :mod:`geowave_spark.geom` decides predicates with
witness samples computed in IEEE doubles — exact on generic inputs, but a
pair in DEGENERATE CONTACT (a vertex of one geometry lying exactly on a
segment of the other, which subsumes collinear-overlapping edges) is where
the formerly-documented measure-zero escapes lived: an edge exiting and
re-entering an area precisely through two boundary vertices, a hole whose
every sampled point lies exactly on the other boundary, a segment bridging
a gap in a dashed multi-line.  ``geom.covers_pair`` and
``geom.interiors_intersect_pair`` route exactly those pairs here, where
every computation is a rational number: doubles convert to ``Fraction``
without loss, cut parameters are exact ratios, and point-in-polygon is an
exact half-open ray cast.  Within the piecewise-linear model this module
is CERTIFIED, not sampled:

* a sub-segment obtained by cutting at ALL boundary contacts cannot cross
  the boundary again, so its (exact) midpoint classifies the whole open
  sub-segment;
* a hole's interior is connected and — once the boundary checks have
  passed — disjoint from the other geometry's boundary, so ONE exact
  interior point classifies the whole hole.

Reference bar: JTS ``relate`` is exact over its noded arrangement
(reference SpatialQueryFilter.java:259-302 refines with JTS predicates);
this module restores that exactness for the degenerate-contact family
while the generic path stays vectorized numpy / SQL-replicable doubles.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from . import geom as _g

Pt = tuple[Fraction, Fraction]
Seg = tuple[Fraction, Fraction, Fraction, Fraction]


def _fr(x) -> Fraction:
    # every finite IEEE double is a dyadic rational — the conversion is exact
    return Fraction(float(x))


def _rings_fr(poly: "_g.Polygon") -> list[list[Pt]]:
    return [[(_fr(x), _fr(y)) for x, y in r] for r in poly.rings]


def _area_parts(g) -> list["_g.Polygon"]:
    if isinstance(g, _g.Polygon):
        return [g]
    if isinstance(g, _g.MultiGeometry):
        return [p for p in g.parts if isinstance(p, _g.Polygon)]
    return []


def _segs_fr(g) -> list[Seg]:
    """All boundary segments (hole rings included), zero-length dropped."""
    S = g.segments()
    out: list[Seg] = []
    for ax, ay, bx, by in S:
        if ax == bx and ay == by:
            continue
        out.append((_fr(ax), _fr(ay), _fr(bx), _fr(by)))
    return out


def _verts_fr(g) -> list[Pt]:
    """Every boundary vertex, including hole-ring vertices (unlike
    ``Polygon.vertices`` which returns the exterior ring only)."""
    S = g.segments()
    seen: dict[Pt, None] = {}
    for ax, ay, bx, by in S:
        seen.setdefault((_fr(ax), _fr(ay)))
        seen.setdefault((_fr(bx), _fr(by)))
    return list(seen)


def _orient(ax, ay, bx, by, px, py) -> int:
    v = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    return (v > 0) - (v < 0)


def _on_seg(px, py, ax, ay, bx, by) -> bool:
    if _orient(ax, ay, bx, by, px, py) != 0:
        return False
    return (
        min(ax, bx) <= px <= max(ax, bx)
        and min(ay, by) <= py <= max(ay, by)
    )


def _pip_part(rings: list[list[Pt]], px: Fraction, py: Fraction) -> str:
    """'bnd' / 'in' / 'out' for one polygon part (even-odd over ALL rings —
    holes flip parity).  Exact: the half-open crossing rule
    ``(y0 > py) != (y1 > py)`` counts a vertex-level ray consistently and
    skips horizontal edges; the x-intersect is an exact rational, and the
    point is known off-boundary when the cast runs."""
    for ring in rings:
        for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
            if _on_seg(px, py, ax, ay, bx, by):
                return "bnd"
    cnt = 0
    for ring in rings:
        for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
            if (ay > py) == (by > py):
                continue
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
            if px < xint:
                cnt += 1
    return "in" if cnt % 2 else "out"


def _pip(g, px: Fraction, py: Fraction) -> str:
    """'in' / 'bnd' / 'out' against an area geometry (multi = any part;
    'in' wins over 'bnd' — a point on one part's boundary but strictly
    inside a touching sibling part is interior to the union).

    Contract: OGC-VALID multipolygons (sibling parts touch at finitely
    many POINTS, never along edges) — same precondition as JTS relate.
    There a pinch point is genuinely on the union's boundary, so 'bnd'
    is the correct answer whenever no part strictly contains the point;
    edge-adjacent siblings (invalid input) would need a sector sweep to
    classify shared-edge interiors and are out of contract."""
    best = "out"
    for part in _area_parts(g):
        r = _pip_part(_rings_fr(part), px, py)
        if r == "in":
            return "in"
        if r == "bnd":
            best = "bnd"
    return best


def _cut_ts(ax, ay, bx, by, segs: list[Seg]) -> list[Fraction]:
    """Exact contact parameters t ∈ [0,1] of segment a→b with a segment
    set: proper/touching intersections via the rational 2×2 solve,
    collinear contacts via endpoint projection.  Always includes 0 and 1."""
    dx, dy = bx - ax, by - ay
    ts = {Fraction(0), Fraction(1)}
    for cx, cy, ex, ey in segs:
        fx, fy = ex - cx, ey - cy
        denom = dx * fy - dy * fx
        if denom != 0:
            t = ((cx - ax) * fy - (cy - ay) * fx) / denom
            u = ((cx - ax) * dy - (cy - ay) * dx) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                ts.add(t)
        elif _orient(ax, ay, bx, by, cx, cy) == 0:
            # collinear: project both endpoints of the other segment
            l2 = dx * dx + dy * dy
            for qx, qy in ((cx, cy), (ex, ey)):
                t = ((qx - ax) * dx + (qy - ay) * dy) / l2
                if 0 <= t <= 1:
                    ts.add(t)
    return sorted(ts)


def _sub_midpoints(ax, ay, bx, by, segs: list[Seg]) -> list[Pt]:
    ts = _cut_ts(ax, ay, bx, by, segs)
    return [
        (ax + (t0 + t1) / 2 * (bx - ax), ay + (t0 + t1) / 2 * (by - ay))
        for t0, t1 in zip(ts[:-1], ts[1:])
    ]


def _ring_interior_point(ring: list[Pt]) -> Pt | None:
    """An exact point strictly interior to a simple ring: scanline at a y
    strictly between two distinct vertex levels (no vertex on the line, no
    edge along it), midpoint of the first crossing pair.  None only for a
    degenerate zero-height ring."""
    ys = sorted({p[1] for p in ring[:-1]})
    if len(ys) < 2:
        return None
    i = len(ys) // 2
    y = (ys[i - 1] + ys[i]) / 2
    xs = []
    for (ax, ay), (bx, by) in zip(ring[:-1], ring[1:]):
        if (ay > y) == (by > y):
            continue
        xs.append(ax + (y - ay) * (bx - ax) / (by - ay))
    if len(xs) < 2:
        return None
    xs.sort()
    return (xs[0] + xs[1]) / 2, y


def _hole_rings_fr(g) -> list[list[Pt]]:
    out = []
    for part in _area_parts(g):
        out.extend(_rings_fr(part)[1:])
    return out


def _bbox_fr(pts: list[Pt]) -> tuple[Fraction, Fraction, Fraction, Fraction]:
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def _side_points(mx, my, dx, dy, all_segs: list[Seg]) -> list[Pt]:
    """The two exact face witnesses adjacent to a boundary sub-segment.

    For a sub-segment midpoint m with direction d, walk the normal ray
    m + t·n on each side and find the FIRST exact crossing parameter with
    any segment of the combined arrangement; half that parameter places
    the witness strictly inside the open face touching the sub-segment on
    that side (strictly off every boundary by construction).  All
    arithmetic is rational — no epsilons."""
    out: list[Pt] = []
    for sgn in (1, -1):
        wx, wy = -dy * sgn, dx * sgn  # normal direction
        t_min = Fraction(1)  # cap: faces are never thinner than needed
        for cx, cy, ex, ey in all_segs:
            fx, fy = ex - cx, ey - cy
            denom = wx * fy - wy * fx
            if denom != 0:
                t = ((cx - mx) * fy - (cy - my) * fx) / denom
                u = ((cx - mx) * wy - (cy - my) * wx) / denom
                if t > 0 and 0 <= u <= 1 and t < t_min:
                    t_min = t
            else:
                # ray parallel to the segment: a collinear segment lies
                # ALONG the ray — its endpoint projections bound t too
                if _orient(mx, my, mx + wx, my + wy, cx, cy) == 0:
                    l2 = wx * wx + wy * wy
                    for qx, qy in ((cx, cy), (ex, ey)):
                        t = ((qx - mx) * wx + (qy - my) * wy) / l2
                        if 0 < t < t_min:
                            t_min = t
        h = t_min / 2
        out.append((mx + h * wx, my + h * wy))
    return out


def covers(ga, gb) -> bool:
    """Exact JTS-``covers``: every point of gb in the CLOSED ga.

    ga with area: every gb vertex and every cut-sub-segment midpoint of
    gb's boundary in closed ga; then, for gb with area, an ARRANGEMENT-
    FACE sweep certifies the interiors: every open face of the combined
    boundary arrangement that lies inside gb but outside ga must adjoin
    some boundary sub-segment (its boundary consists of arrangement
    edges), so testing the two exact side witnesses of EVERY sub-segment
    of BOTH boundaries decides completely.  This subsumes the former
    per-hole witness (a hole of ga is bounded by ga-boundary arcs) and is
    correct where a single hole point was not: islands nested inside
    holes (the witness must also be OUTSIDE ga) and exterior pockets
    enclosed between touching sibling parts (bounded by ga arcs whose
    side witness lands in the pocket).
    ga a line: gb must be 0/1-dim and every vertex plus every
    cut-sub-segment midpoint of gb must lie ON ga."""
    if isinstance(gb, _g.Point):
        px, py = _fr(gb.x), _fr(gb.y)
        if _g._has_area(ga):
            return _pip(ga, px, py) != "out"
        return any(_on_seg(px, py, *s) for s in _segs_fr(ga))
    if _g._has_area(ga):
        segs_a = _segs_fr(ga)
        segs_b = _segs_fr(gb)
        for vx, vy in _verts_fr(gb):
            if _pip(ga, vx, vy) == "out":
                return False
        for s in segs_b:
            for mx, my in _sub_midpoints(*s, segs_a):
                if _pip(ga, mx, my) == "out":
                    return False
        if _g._has_area(gb):
            all_segs = segs_a + segs_b
            for own, other in ((segs_a, segs_b), (segs_b, segs_a)):
                for ax, ay, bx, by in own:
                    ts = _cut_ts(ax, ay, bx, by, other)
                    dx, dy = bx - ax, by - ay
                    for t0, t1 in zip(ts[:-1], ts[1:]):
                        tm = (t0 + t1) / 2
                        mx, my = ax + tm * dx, ay + tm * dy
                        for px, py in _side_points(mx, my, dx, dy, all_segs):
                            if (
                                _pip(gb, px, py) == "in"
                                and _pip(ga, px, py) == "out"
                            ):
                                return False
        return True
    # ga is 0/1-dimensional
    if _g._has_area(gb) or isinstance(ga, _g.Point):
        return False
    segs_a = _segs_fr(ga)
    for vx, vy in _verts_fr(gb):
        if not any(_on_seg(vx, vy, *s) for s in segs_a):
            return False
    for s in _segs_fr(gb):
        for mx, my in _sub_midpoints(*s, segs_a):
            if not any(_on_seg(mx, my, *s2) for s2 in segs_a):
                return False
    return True


def interiors_intersect(ga, gb) -> bool:
    """Exact interior-interior test for pairs where an area geometry is
    involved (the line×line path in the float kernel is already exact —
    blocked orientation tests — and stays there).

    Witness structure mirrors the float kernel but with exact cut
    midpoints, which makes it complete: if the interiors meet and neither
    covers the other, a positive-length arc of one boundary lies in the
    other's open interior and some exact cut-sub-segment midpoint lands in
    it; the nested/equal residual is per-part mutual ``covers``."""
    da, db = _g._dim(ga), _g._dim(gb)
    if da > db:
        ga, gb = gb, ga
        da, db = db, da
    if db != 2:
        raise ValueError("exact interiors_intersect handles area pairs only")
    if da == 0:
        return _pip(gb, _fr(ga.x), _fr(ga.y)) == "in"
    segs_b = _segs_fr(gb)
    for vx, vy in _verts_fr(ga):
        if _pip(gb, vx, vy) == "in":
            return True
    for s in _segs_fr(ga):
        for mx, my in _sub_midpoints(*s, segs_b):
            if _pip(gb, mx, my) == "in":
                return True
    if da == 1:
        return False
    segs_a = _segs_fr(ga)
    for vx, vy in _verts_fr(gb):
        if _pip(ga, vx, vy) == "in":
            return True
    for s in segs_b:
        for mx, my in _sub_midpoints(*s, segs_a):
            if _pip(ga, mx, my) == "in":
                return True
    for pa in _area_parts(ga):
        px0, py0, px1, py1 = pa.bbox
        for pb in _area_parts(gb):
            qx0, qy0, qx1, qy1 = pb.bbox
            if px0 > qx1 or qx0 > px1 or py0 > qy1 or qy0 > py1:
                continue
            if covers(pa, pb) or covers(pb, pa):
                return True
    return False


def degenerate_contact(ga, gb) -> bool:
    """Trigger for the exact fallback: any vertex of one geometry lying
    exactly on a segment of the other (this subsumes collinear-overlapping
    edges — an overlap always puts an endpoint of one segment on the
    other).  Uses the kernel's exact-double on-segment test, which cannot
    MISS a true rational incidence: when the real cross product is zero
    both float products round the same real to the same double, so the
    difference is exactly 0; a spurious float zero merely routes a generic
    pair to the exact path, which is still correct."""
    A, B = ga.segments(), gb.segments()
    va = np.unique(A.reshape(-1, 2), axis=0)
    vb = np.unique(B.reshape(-1, 2), axis=0)
    if bool(
        _g._on_segment_exact(
            vb[:, 0][:, None], vb[:, 1][:, None],
            A[None, :, 0], A[None, :, 1], A[None, :, 2], A[None, :, 3],
        ).any()
    ):
        return True
    return bool(
        _g._on_segment_exact(
            va[:, 0][:, None], va[:, 1][:, None],
            B[None, :, 0], B[None, :, 1], B[None, :, 2], B[None, :, 3],
        ).any()
    )
