"""Independent-truth oracle for the geometry kernel on rectilinear pairs.

test_geom_differential pins vectorized == scalar; this file pins scalar ==
TRUTH, via an oracle that shares no code with the engine:

* all generated polygons are RECTILINEAR with HALF-INTEGER vertices, so
  any nonempty open region in the arrangement of two such polygons
  contains a quarter-offset grid point (x, y = k/2 + 1/4) — sampling on
  that grid is therefore EXACT for interior questions, not Monte-Carlo;
* samples never lie on any edge (edges sit on the half-integer grid), so
  a strict even-odd ray cast is unambiguous;
* boundary-only contact (touches) is decided by EXACT integer interval
  tests on the axis-aligned edges (coords doubled to integers).

From those two primitives every DE-9IM predicate over area×area pairs
has closed-form truth:

    interiors(A,B)  = some sample in int A and int B
    covers(A,B)     = no sample in int B outside A
    intersects(A,B) = interiors or boundaries-touch (exact edge test)
    touches         = intersects and not interiors
    contains        = covers and interiors     (DE-9IM)
    within / equals = covers mirrored / both ways
    overlaps        = interiors and not covers either way
    crosses         = False for area×area (dimension rule)
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark import geom

W = geom.geometry_from_wkt


# ---------------------------------------------------------------------------
# independent primitives (no engine code)
# ---------------------------------------------------------------------------

def _rings_of(wkt: str) -> list[np.ndarray]:
    """Parse POLYGON/MULTIPOLYGON WKT into rings of (n, 2) float arrays.
    Minimal, test-local — independent of the engine's parser."""
    body = wkt[wkt.index("(") : ].strip()
    rings, depth, cur = [], 0, ""
    for ch in body:
        if ch == "(":
            depth += 1
            if depth == (3 if wkt.startswith("MULTI") else 2):
                cur = ""
            continue
        if ch == ")":
            if depth == (3 if wkt.startswith("MULTI") else 2):
                pts = [
                    tuple(float(t) for t in p.split())
                    for p in cur.split(",")
                    if p.strip()
                ]
                rings.append(np.asarray(pts))
            depth -= 1
            continue
        cur += ch
    return rings


def _inside_even_odd(rings: list[np.ndarray], px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Strict even-odd ray cast over ALL rings (holes flip parity).
    Valid only for query points that avoid every edge — guaranteed here."""
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for ex0, ey0, ex1, ey1 in zip(x0, y0, x1, y1):
            if ey0 == ey1:
                continue  # horizontal edges never cross a horizontal ray
            cond = (py < max(ey0, ey1)) & (py >= min(ey0, ey1))
            # x of the edge at height py (edges are axis-aligned: ex0 == ex1)
            inside ^= cond & (px < ex0)
    return inside


def _edges_int(rings: list[np.ndarray]) -> np.ndarray:
    """All boundary edges as integer (x0, y0, x1, y1) with coords * 2."""
    out = []
    for ring in rings:
        a = np.rint(ring[:-1] * 2).astype(np.int64)
        b = np.rint(ring[1:] * 2).astype(np.int64)
        out.append(np.concatenate([a, b], axis=1))
    return np.concatenate(out, axis=0)


def _boundaries_touch(ea: np.ndarray, eb: np.ndarray) -> bool:
    """Exact: do any two axis-aligned integer segments share a point?"""
    for x0, y0, x1, y1 in ea:
        ax0, ax1 = min(x0, x1), max(x0, x1)
        ay0, ay1 = min(y0, y1), max(y0, y1)
        bx0 = np.minimum(eb[:, 0], eb[:, 2]); bx1 = np.maximum(eb[:, 0], eb[:, 2])
        by0 = np.minimum(eb[:, 1], eb[:, 3]); by1 = np.maximum(eb[:, 1], eb[:, 3])
        hit = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
        if hit.any():
            return True
    return False


def _truth(wa: str, wb: str) -> dict[str, bool]:
    ra, rb = _rings_of(wa), _rings_of(wb)
    allv = np.concatenate([r for r in ra + rb])
    lo = np.floor(allv.min(axis=0) * 2) / 2 - 0.5
    hi = np.ceil(allv.max(axis=0) * 2) / 2 + 0.5
    xs = np.arange(lo[0] + 0.25, hi[0], 0.5)
    ys = np.arange(lo[1] + 0.25, hi[1], 0.5)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    in_a = _inside_even_odd(ra, gx, gy)
    in_b = _inside_even_odd(rb, gx, gy)
    interiors = bool((in_a & in_b).any())
    covers_ab = not bool((in_b & ~in_a).any())
    covers_ba = not bool((in_a & ~in_b).any())
    touch = _boundaries_touch(_edges_int(ra), _edges_int(rb))
    intersects = interiors or touch
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "interiors": interiors,
        "touches": intersects and not interiors,
        "covers": covers_ab,
        "within": covers_ba,
        "contains": covers_ab and interiors,
        "equals": covers_ab and covers_ba,
        "overlaps": interiors and not covers_ab and not covers_ba,
        "crosses": False,  # area x area can never cross (dimension rule)
    }


# ---------------------------------------------------------------------------
# rectilinear generator (half-integer grid)
# ---------------------------------------------------------------------------

def _rand_rectilinear(rng: np.random.RandomState) -> str:
    def g(lo=-8, hi=7):
        return rng.randint(lo, hi) / 2.0

    k = rng.randint(4)
    if k == 0:  # box
        x0, y0 = g(), g()
        w, h = rng.randint(1, 8) / 2.0, rng.randint(1, 8) / 2.0
        return (
            f"POLYGON (({x0} {y0}, {x0 + w} {y0}, {x0 + w} {y0 + h}, "
            f"{x0} {y0 + h}, {x0} {y0}))"
        )
    if k == 1:  # L-shape
        x0, y0 = g(-8, 3), g(-8, 3)
        w, h = rng.randint(2, 7) / 2.0, rng.randint(2, 7) / 2.0
        nw = rng.randint(1, int(w * 2)) / 2.0
        nh = rng.randint(1, int(h * 2)) / 2.0
        x1, y1 = x0 + w, y0 + h
        return (
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1 - nh}, "
            f"{x1 - nw} {y1 - nh}, {x1 - nw} {y1}, {x0} {y1}, {x0} {y0}))"
        )
    if k == 2:  # square with a hole
        x0, y0 = g(-8, 2), g(-8, 2)
        s = rng.randint(4, 9) / 2.0
        hs = rng.randint(1, int(s * 2) - 2) / 2.0
        off = rng.randint(1, int((s - hs) * 2)) / 2.0
        hx0, hy0 = x0 + off, y0 + off
        x1, y1 = x0 + s, y0 + s
        hx1, hy1 = hx0 + hs, hy0 + hs
        return (
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}), "
            f"({hx0} {hy0}, {hx0} {hy1}, {hx1} {hy1}, {hx1} {hy0}, {hx0} {hy0}))"
        )
    # multipolygon: two boxes (occasionally corner-touching).  SFS/JTS
    # validity requires parts to touch at FINITELY many points, never
    # along a positive-length edge; dx == 1.0 makes the boxes x-adjacent,
    # so force dy >= 1.0 there (part1 is 1 tall) to demote a would-be
    # shared edge to a single corner point — edge-adjacent multis are
    # invalid input, on which union-parity truth and per-part kernels
    # legitimately disagree (fuzz seeds 265/288 of the line×area oracle).
    x0, y0 = g(-8, 0), g(-8, 0)
    dx = rng.randint(2, 8) / 2.0
    dy = rng.randint(0, 8) / 2.0
    if dx == 1.0 and dy < 1.0:
        dy = 1.0
    return (
        "MULTIPOLYGON ((("
        f"{x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 1}, {x0} {y0 + 1}, {x0} {y0})), "
        f"(({x0 + dx} {y0 + dy}, {x0 + dx + 1.5} {y0 + dy}, "
        f"{x0 + dx + 1.5} {y0 + dy + 1.5}, {x0 + dx} {y0 + dy + 1.5}, "
        f"{x0 + dx} {y0 + dy})))"
    )


PAIR_FNS = {
    "intersects": geom.intersects_pair,
    "disjoint": geom.disjoint_pair,
    "interiors": geom.interiors_intersect_pair,
    "touches": geom.touches_pair,
    "covers": geom.covers_pair,
    "within": geom.within_pair,
    "contains": geom.contains_pair,
    "equals": geom.equals_pair,
    "overlaps": geom.overlaps_pair,
    "crosses": geom.crosses_pair,
}


@pytest.mark.parametrize("seed", [2, 13, 29, 41, 407, 463])
def test_scalar_kernel_matches_sampling_truth(seed):
    rng = np.random.RandomState(seed)
    for _ in range(120):
        wa, wb = _rand_rectilinear(rng), _rand_rectilinear(rng)
        ga, gb = W(wa), W(wb)
        want = _truth(wa, wb)
        for name, fn in PAIR_FNS.items():
            got = bool(fn(ga, gb))
            assert got == want[name], (
                f"{name}: kernel={got} truth={want[name]} for\n  A={wa}\n  B={wb}"
            )


def test_multipolygons_sharing_identical_part():
    """Two multipolygons that share one IDENTICAL part (plus disjoint or
    merely-touching extras) intersect in their interiors — the residual
    covers fallback must run per PART, not on the wholes (fuzz-found:
    neither whole covers the other, every boundary sample of the shared
    part sits ON the other's boundary, no proper crossing exists)."""
    shared = "((2.5 1.0, 4.0 1.0, 4.0 2.5, 2.5 2.5, 2.5 1.0))"
    a = f"MULTIPOLYGON (((-0.5 -2.5, 0.5 -2.5, 0.5 -1.5, -0.5 -1.5, -0.5 -2.5)), {shared})"
    b = f"MULTIPOLYGON (((-0.5 -1.5, 0.5 -1.5, 0.5 -0.5, -0.5 -0.5, -0.5 -1.5)), {shared})"
    want = _truth(a, b)
    assert want["interiors"] and want["overlaps"] and not want["touches"]
    ga, gb = W(a), W(b)
    for name, fn in PAIR_FNS.items():
        assert bool(fn(ga, gb)) == want[name], name
    # nested (not equal) shared-area variant: part of A strictly inside B's part
    c = "MULTIPOLYGON (((-9 -9, -8 -9, -8 -8, -9 -8, -9 -9)), ((3.0 1.5, 3.5 1.5, 3.5 2.0, 3.0 2.0, 3.0 1.5)))"
    gc = W(c)
    assert geom.interiors_intersect_pair(ga, gc)
    assert not geom.touches_pair(ga, gc)


def test_hole_exactly_filled_by_other():
    """B fills A's hole exactly: closed sets intersect (shared ring) but
    interiors do not — touches, and A never covers B (B's interior is in
    A's hole)."""
    a = (
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), "
        "(1 1, 1 3, 3 3, 3 1, 1 1))"
    )
    b = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    want = _truth(a, b)
    assert want == {
        "intersects": True, "disjoint": False, "interiors": False,
        "touches": True, "covers": False, "within": False,
        "contains": False, "equals": False, "overlaps": False,
        "crosses": False,
    }
    ga, gb = W(a), W(b)
    for name, fn in PAIR_FNS.items():
        assert bool(fn(ga, gb)) == want[name], name


def test_rand_rectilinear_multipolygons_are_valid():
    """The fuzz generator must emit only SFS-valid multipolygons: parts may
    touch at finitely many points, never share a positive-length boundary
    segment (JTS declares edge-adjacent parts invalid, and DE-9IM truth is
    undefined there — union-parity oracles and per-part kernels disagree).
    Pins the fix for fuzz-found line×area `within` mismatches (seeds
    265/288): dx == 1.0 x-adjacency demoted to a corner point-touch."""
    rng = np.random.RandomState(0)
    n_multi = 0
    for _ in range(4000):
        wkt = _rand_rectilinear(rng)
        if not wkt.startswith("MULTIPOLYGON"):
            continue
        n_multi += 1
        rings = [np.rint(r * 2).astype(np.int64) for r in _rings_of(wkt)]
        assert len(rings) == 2
        (a, b) = rings
        # collect axis-aligned edges per part as (axis, coord, lo, hi)
        def edges(r):
            out = []
            for (x0, y0), (x1, y1) in zip(r[:-1], r[1:]):
                if x0 == x1:
                    out.append(("v", int(x0), min(y0, y1), max(y0, y1)))
                else:
                    out.append(("h", int(y0), min(x0, x1), max(x0, x1)))
            return out
        for axa, ca, loa, hia in edges(a):
            for axb, cb, lob, hib in edges(b):
                if axa == axb and ca == cb:
                    # collinear edges of the two parts must not overlap
                    # with positive length
                    assert min(hia, hib) - max(loa, lob) <= 0, wkt
    assert n_multi > 500  # the branch is actually exercised
