"""Exact independent oracle for line × line predicates.

Completes the oracle family (area×area: test_geom_sampling_oracle,
line×area: test_geom_line_area_oracle).  For two polyline chains with
half-integer vertices every DE-9IM predicate has closed-form truth in
exact rational arithmetic:

* enumerate every contact between segment pairs exactly: proper-cross
  points (rational), endpoint-on-segment touches, and collinear overlap
  sub-segments (positive length);
* the Mod-2 boundary of a chain is its odd-degree endpoint set, so a
  contact point is INTERIOR to a chain iff it is not one of its boundary
  endpoints;
* coverage cuts one chain's segments at all contacts with the other and
  requires every sub-midpoint (exact Fraction point) to lie ON the other
  chain.

Truth table (JTS semantics):
    interiors  = positive collinear interior overlap, or a contact point
                 interior to BOTH
    touches    = contact and not interiors
    crosses    = interior point contact and NO 1-dim interior overlap
    overlaps   = 1-dim interior overlap and each chain has a piece off
                 the other
    covers/within/contains/equals from exact sub-midpoint coverage
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from geowave_spark import geom

W = geom.geometry_from_wkt

F0, F1 = Fraction(0), Fraction(1)


def _chain_segs(pts):
    """Integer (doubled) nondegenerate segments of a chain."""
    ip = [(int(round(x * 2)), int(round(y * 2))) for x, y in pts]
    return [
        (ax, ay, bx, by)
        for (ax, ay), (bx, by) in zip(ip[:-1], ip[1:])
        if (ax, ay) != (bx, by)
    ]


def _mod2_boundary(pts) -> set:
    from collections import Counter

    ip = [(int(round(x * 2)), int(round(y * 2))) for x, y in pts]
    cnt = Counter([ip[0], ip[-1]])
    return {
        (Fraction(p[0]), Fraction(p[1])) for p, n in cnt.items() if n % 2 == 1
    }


def _orient(ox, oy, px, py, qx, qy):
    return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)


def _on_seg(px, py, s) -> bool:
    ax, ay, bx, by = s
    if _orient(ax, ay, bx, by, px, py) != 0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _seg_contacts(sa, sb):
    """Exact contacts of two integer segments.

    Returns (points, overlap) where points is a list of Fraction (x, y)
    point contacts and overlap is the collinear shared sub-segment as
    ((x0,y0),(x1,y1)) Fractions with positive length, or None."""
    ax, ay, bx, by = sa
    cx, cy, dx, dy = sb
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, ax, ay)
    d4 = _orient(cx, cy, dx, dy, bx, by)
    if d1 == 0 and d2 == 0:  # collinear
        # parametrize along sa
        vx, vy = bx - ax, by - ay
        den = vx * vx + vy * vy
        ts = []
        for px, py in ((cx, cy), (dx, dy)):
            ts.append(Fraction((px - ax) * vx + (py - ay) * vy, den))
        lo, hi = min(ts), max(ts)
        lo, hi = max(lo, F0), min(hi, F1)
        if lo > hi:
            return [], None
        p0 = (Fraction(ax) + lo * vx, Fraction(ay) + lo * vy)
        p1 = (Fraction(ax) + hi * vx, Fraction(ay) + hi * vy)
        if lo == hi:
            return [p0], None
        return [], (p0, p1)
    if ((d1 > 0) != (d2 > 0) or 0 in (d1, d2)) and (
        (d3 > 0) != (d4 > 0) or 0 in (d3, d4)
    ):
        # single-point contact (proper cross or T/endpoint touch)
        den = (bx - ax) * (dy - cy) - (by - ay) * (dx - cx)
        # den == 0 only for parallel non-collinear -> no contact
        if den == 0:
            return [], None
        t = Fraction((cx - ax) * (dy - cy) - (cy - ay) * (dx - cx), den)
        if not (F0 <= t <= F1):
            return [], None
        px = Fraction(ax) + t * (bx - ax)
        py = Fraction(ay) + t * (by - ay)
        # verify the point really lies on sb too (t range checked via u)
        u_num = (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)
        u = Fraction(u_num, den)
        if not (F0 <= u <= F1):
            return [], None
        return [(px, py)], None
    return [], None


def _chain_cover(cov_segs, target_pts, cut_segs) -> bool:
    """Every point of the target chain lies ON the covering segment set:
    cut each target segment at contacts with the cover and test every
    sub-midpoint (plus endpoints) for on-cover membership."""
    for seg in _chain_segs(target_pts):
        ax, ay, bx, by = seg
        vx, vy = bx - ax, by - ay
        den = vx * vx + vy * vy
        ts = {F0, F1}
        for cs in cut_segs:
            pts, ov = _seg_contacts(seg, cs)
            for px, py in pts:
                ts.add(Fraction((px - ax) * vx + (py - ay) * vy, den))
            if ov:
                for px, py in ov:
                    ts.add(Fraction((px - ax) * vx + (py - ay) * vy, den))
        sts = sorted(ts)
        for t0, t1 in zip(sts[:-1], sts[1:]):
            tm = (t0 + t1) / 2
            px, py = Fraction(ax) + tm * vx, Fraction(ay) + tm * vy
            if not any(_on_seg(px, py, cs) for cs in cov_segs):
                return False
        for px, py in ((Fraction(ax), Fraction(ay)), (Fraction(bx), Fraction(by))):
            if not any(_on_seg(px, py, cs) for cs in cov_segs):
                return False
    return True


def _line_line_truth(pa, pb) -> dict[str, bool]:
    A, B = _chain_segs(pa), _chain_segs(pb)
    bnd_a, bnd_b = _mod2_boundary(pa), _mod2_boundary(pb)
    contact = False
    interior_pt = False
    dim1 = False
    for sa in A:
        for sb in B:
            pts, ov = _seg_contacts(sa, sb)
            if ov:
                contact = True
                dim1 = True
            for p in pts:
                contact = True
                if p not in bnd_a and p not in bnd_b:
                    interior_pt = True
    interiors = dim1 or interior_pt
    covers_ab = _chain_cover(A, pb, A)
    covers_ba = _chain_cover(B, pa, B)
    # "a piece of A off B": not covered by the other
    overlaps = dim1 and not covers_ab and not covers_ba
    return {
        "intersects": contact,
        "disjoint": not contact,
        "interiors": interiors,
        "touches": contact and not interiors,
        "crosses": interior_pt and not dim1,
        "overlaps": overlaps,
        "covers": covers_ab,
        "within": covers_ba and interiors,
        "contains": covers_ab and interiors,
        "equals": covers_ab and covers_ba,
    }


def _rand_chain(rng: np.random.RandomState):
    n = rng.randint(2, 5)
    x, y = rng.randint(-6, 7) / 2.0, rng.randint(-6, 7) / 2.0
    pts = [(x, y)]
    for _ in range(n - 1):
        dx, dy = rng.randint(-5, 6) / 2.0, rng.randint(-5, 6) / 2.0
        k = rng.randint(4)
        if k == 0:
            dy = 0.0
        elif k == 1:
            dx = 0.0
        if dx == 0.0 and dy == 0.0:
            dx = 1.0
        x, y = x + dx, y + dy
        pts.append((x, y))
    return pts


def _wkt(pts):
    return "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"


PAIR_FNS = {
    "intersects": geom.intersects_pair,
    "disjoint": geom.disjoint_pair,
    "interiors": geom.interiors_intersect_pair,
    "touches": geom.touches_pair,
    "crosses": geom.crosses_pair,
    "overlaps": geom.overlaps_pair,
    "covers": geom.covers_pair,
    "within": geom.within_pair,
    "contains": geom.contains_pair,
    "equals": geom.equals_pair,
}


@pytest.mark.parametrize("seed", [7, 21, 33, 47, 137, 284])
def test_line_line_kernel_matches_exact_truth(seed):
    rng = np.random.RandomState(seed)
    for _ in range(150):
        pa, pb = _rand_chain(rng), _rand_chain(rng)
        want = _line_line_truth(pa, pb)
        ga, gb = W(_wkt(pa)), W(_wkt(pb))
        for name, fn in PAIR_FNS.items():
            got = bool(fn(ga, gb))
            assert got == want[name], (
                f"{name}: kernel={got} truth={want[name]} for\n"
                f"  A={_wkt(pa)}\n  B={_wkt(pb)}"
            )


def _multi_truth(parts_a, parts_b) -> dict[str, bool]:
    """Truth for MULTILINESTRING pairs: same construction, Mod-2 boundary
    counted across ALL parts (SFS: a point is boundary iff it is an
    endpoint of an odd number of element curves)."""
    from collections import Counter

    A = [s for p in parts_a for s in _chain_segs(p)]
    B = [s for p in parts_b for s in _chain_segs(p)]

    def bnd(parts):
        cnt = Counter()
        for p in parts:
            ip = [(int(round(x * 2)), int(round(y * 2))) for x, y in p]
            cnt[ip[0]] += 1
            cnt[ip[-1]] += 1
        return {(Fraction(q[0]), Fraction(q[1])) for q, n in cnt.items() if n % 2 == 1}

    bnd_a, bnd_b = bnd(parts_a), bnd(parts_b)
    contact = interior_pt = dim1 = False
    for sa in A:
        for sb in B:
            pts, ov = _seg_contacts(sa, sb)
            if ov:
                contact = dim1 = True
            for p in pts:
                contact = True
                if p not in bnd_a and p not in bnd_b:
                    interior_pt = True
    interiors = dim1 or interior_pt
    cov_ab = all(_chain_cover(A, p, A) for p in parts_b)
    cov_ba = all(_chain_cover(B, p, B) for p in parts_a)
    return {
        "intersects": contact, "disjoint": not contact, "interiors": interiors,
        "touches": contact and not interiors, "crosses": interior_pt and not dim1,
        "overlaps": dim1 and not cov_ab and not cov_ba,
        "covers": cov_ab, "within": cov_ba and interiors,
        "contains": cov_ab and interiors, "equals": cov_ab and cov_ba,
    }


def _mwkt(parts) -> str:
    if len(parts) == 1:
        return _wkt(parts[0])
    return (
        "MULTILINESTRING ("
        + ", ".join("(" + ", ".join(f"{x} {y}" for x, y in p) + ")" for p in parts)
        + ")"
    )


@pytest.mark.parametrize("seed", [901, 913, 927, 1042, 1133])
def test_multiline_kernel_matches_exact_truth(seed):
    rng = np.random.RandomState(seed)
    for _ in range(100):
        parts_a = [_rand_chain(rng) for _ in range(rng.randint(1, 3))]
        parts_b = [_rand_chain(rng) for _ in range(rng.randint(1, 3))]
        want = _multi_truth(parts_a, parts_b)
        ga, gb = W(_mwkt(parts_a)), W(_mwkt(parts_b))
        for name, fn in PAIR_FNS.items():
            got = bool(fn(ga, gb))
            assert got == want[name], (
                f"{name}: kernel={got} truth={want[name]} for\n"
                f"  A={_mwkt(parts_a)}\n  B={_mwkt(parts_b)}"
            )


def test_proper_cross_at_dangling_endpoint_is_touch():
    """Fuzz-found: a segment of A properly crosses a segment of B at the
    exact location of ANOTHER B-part's dangling endpoint.  The point is
    Mod-2 boundary of B, so interiors do NOT meet — touches, not crosses
    (the pre-fix kernel shortcut treated every proper segment cross as
    interior contact)."""
    a = "MULTILINESTRING ((-3.0 1.0, -3.0 -1.5, -3.5 -1.5), (0.0 1.5, 0.0 4.0, -1.0 4.0))"
    b = "MULTILINESTRING ((-3.0 -0.5, -3.5 -0.5, -1.5 -0.5))"
    ga, gb = W(a), W(b)
    # A's vertical run crosses B's horizontal run at (-3, -0.5) — B's own
    # dangling start endpoint (odd degree => boundary of B)
    assert geom.intersects_pair(ga, gb)
    assert not geom.interiors_intersect_pair(ga, gb)
    assert geom.touches_pair(ga, gb)
    assert not geom.crosses_pair(ga, gb)
    # same shape with B's endpoint moved off the crossing: genuine cross
    b2 = "MULTILINESTRING ((-2.0 -0.5, -3.5 -0.5, -1.5 -0.5))"
    gb2 = W(b2)
    assert geom.interiors_intersect_pair(ga, gb2)
    assert geom.crosses_pair(ga, gb2)


def test_line_line_known_cases():
    """Hand cases pinning the trickier truth-table rows."""
    cases = [
        # dashed cover: B bridges a gap in A -> A must NOT cover B
        ([(0, 0), (1, 0), (1, 1), (1, 0), (3, 0)], [(0, 0), (3, 0)]),
        # X crossing (interior point, crosses)
        ([(0, 0), (2, 2)], [(0, 2), (2, 0)]),
        # endpoint-to-endpoint touch
        ([(0, 0), (1, 1)], [(1, 1), (2, 0)]),
        # collinear overlap (overlaps)
        ([(0, 0), (2, 0)], [(1, 0), (3, 0)]),
        # equal reversed
        ([(0, 0), (1, 0), (1, 1)], [(1, 1), (1, 0), (0, 0)]),
        # T-junction: endpoint of B interior to A (touches: B's bnd on A's int)
        ([(0, 0), (2, 0)], [(1, 0), (1, 1)]),
        # closed ring vs chord of it
        ([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)], [(0, 0), (2, 0)]),
    ]
    for pa, pb in cases:
        want = _line_line_truth(pa, pb)
        ga, gb = W(_wkt(pa)), W(_wkt(pb))
        for name, fn in PAIR_FNS.items():
            got = bool(fn(ga, gb))
            assert got == want[name], (name, pa, pb, got, want[name])
