"""Adversarial tests for the exact rational fallback (exactgeom).

Each case constructs a DEGENERATE-CONTACT configuration — the families the
float witness kernel used to document as measure-zero escapes — and checks
the kernel against hand-derived truth.  Also pins the routing contract:
degenerate pairs go to exactgeom, generic pairs never do.
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark import exactgeom, geom

W = geom.geometry_from_wkt


# ---------------------------------------------------------------------------
# exit-re-enter through boundary vertices (the covers_pair docstring family)
# ---------------------------------------------------------------------------

# two upward-opening V notches in the top edge, tips at (4,6) and (8,6)
TWO_NOTCH = (
    "POLYGON ((0 0, 12 0, 12 10, 9 10, 8 6, 7 10, 5 10, 4 6, 3 10, 0 10, 0 0))"
)


def test_exit_reenter_through_vertices_not_covered():
    ga = W(TWO_NOTCH)
    # segment riding y=10 from notch mouth to notch mouth: endpoints and
    # global midpoint (6,10) all land ON ga's boundary, yet the spans
    # x∈(3,5) and x∈(7,9) are outside the closed polygon
    gb = W("LINESTRING (3 10, 9 10)")
    assert exactgeom.degenerate_contact(ga, gb)
    assert not geom.covers_pair(ga, gb)
    # the sub-span strictly between the notches IS covered (edge 5..7)
    assert geom.covers_pair(ga, W("LINESTRING (5 10, 7 10)"))


def test_shared_edge_cover_true():
    # non-box pentagon covering a box that shares its bottom and side edges
    ga = W("POLYGON ((0 0, 10 0, 10 10, 5 12, 0 10, 0 0))")
    gb = W("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert exactgeom.degenerate_contact(ga, gb)
    assert geom.covers_pair(ga, gb)
    assert geom.within_pair(gb, ga)
    # and the diagonal through both shared corners is covered too
    assert geom.covers_pair(ga, W("LINESTRING (0 0, 10 10)"))


# ---------------------------------------------------------------------------
# inscribed-hole family (geom.py hole-witness block)
# ---------------------------------------------------------------------------

HOLED = (
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
)


def test_inscribed_diamond_hole_rejected_exactly():
    ga = W(HOLED)
    # diamond whose four edges pass exactly through the hole's corners —
    # every hole VERTEX lies on gb's boundary, but the hole interior is
    # strictly inside gb
    gb = W("POLYGON ((5 3, 7 5, 5 7, 3 5, 5 3))")
    assert exactgeom.degenerate_contact(ga, gb)
    assert not geom.covers_pair(ga, gb)
    assert not geom.within_pair(gb, ga)


def test_polygon_equal_to_hole_not_covered():
    ga = W(HOLED)
    gb = W("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert not geom.covers_pair(ga, gb)
    # it touches the closed ga (shared ring) but shares no interior
    assert geom.touches_pair(ga, gb)
    assert not geom.interiors_intersect_pair(ga, gb)


def test_hole_boundary_ring_walk_is_covered():
    # a line running along the hole ring is ON closed ga
    ga = W(HOLED)
    gb = W("LINESTRING (4 4, 6 4, 6 6, 4 6, 4 4)")
    assert geom.covers_pair(ga, gb)
    # but nudged across the hole it is not
    assert not geom.covers_pair(ga, W("LINESTRING (4 4, 6 6)"))


# ---------------------------------------------------------------------------
# dashed multi-line cover (line×line now always exact)
# ---------------------------------------------------------------------------

def test_dashed_line_gap_bridge_not_covered():
    ga = W("MULTILINESTRING ((0 0, 4 0), (6 0, 10 0))")
    gb = W("LINESTRING (3 0, 7 0)")  # bridges the (4,6) gap
    assert not geom.covers_pair(ga, gb)
    assert geom.covers_pair(ga, W("LINESTRING (1 0, 3 0)"))
    # exact collinear partial overlap: covered iff inside one dash
    assert geom.covers_pair(ga, W("LINESTRING (6 0, 10 0)"))
    assert not geom.covers_pair(ga, W("LINESTRING (4 0, 6 0)"))


def test_line_cover_through_shared_vertex():
    # gb passes through ga's interior vertex: still covered (same carrier)
    ga = W("LINESTRING (0 0, 5 5, 10 10)")
    gb = W("LINESTRING (2 2, 8 8)")
    assert geom.covers_pair(ga, gb)
    # bent ga does not cover the straight chord
    ga2 = W("LINESTRING (0 0, 5 6, 10 10)")
    assert not geom.covers_pair(ga2, W("LINESTRING (0 0, 10 10)"))


# ---------------------------------------------------------------------------
# interiors / touches / overlaps on degenerate rectilinear contact
# ---------------------------------------------------------------------------

def test_touching_squares_share_no_interior():
    a = W("POLYGON ((0 0, 4 0, 4 4, 0 4, 2 5, 0 0))")  # non-box
    b = W("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
    assert exactgeom.degenerate_contact(a, b)
    assert geom.touches_pair(a, b)
    assert not geom.overlaps_pair(a, b)


def test_corner_to_corner_diagonal_overlap():
    # two squares overlapping in a unit square, all contact degenerate
    a = W("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    b = W("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")
    assert geom.overlaps_pair(a, b)
    assert geom.interiors_intersect_pair(a, b)
    assert not geom.covers_pair(a, b) and not geom.covers_pair(b, a)


def test_nested_with_all_witnesses_on_boundary():
    # octagon inscribed in a holed square, every vertex on the outer ring
    ga = W(HOLED)
    gb = W("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    # gb covers ga (closed), but ga does not cover gb (hole)
    assert geom.covers_pair(gb, ga)
    assert not geom.covers_pair(ga, gb)
    assert geom.interiors_intersect_pair(ga, gb)


# ---------------------------------------------------------------------------
# routing contract
# ---------------------------------------------------------------------------

def test_generic_pairs_never_route_to_exact(monkeypatch):
    calls = {"n": 0}
    orig = exactgeom.covers

    def spy(ga, gb):
        calls["n"] += 1
        return orig(ga, gb)

    monkeypatch.setattr(exactgeom, "covers", spy)
    ga = W("POLYGON ((0.1 0.1, 9.3 0.7, 8.9 8.3, 1.7 9.1, 0.1 0.1))")
    gb = W("POLYGON ((2.3 2.9, 5.1 3.3, 4.7 6.1, 2.9 5.7, 2.3 2.9))")
    assert not exactgeom.degenerate_contact(ga, gb)
    assert geom.covers_pair(ga, gb)
    assert calls["n"] == 0


def test_float_zero_cross_product_is_never_a_miss():
    # vertex exactly on a segment with awkward doubles: the trigger must
    # fire (equal real products round to equal doubles → difference is 0)
    x0, y0, x1, y1 = 0.1, 0.2, 0.7, 0.9
    t = 0.5
    px, py = x0 + t * (x1 - x0), y0 + t * (y1 - y0)
    ga = W(f"POLYGON (({x0} {y0}, {x1} {y1}, {x1} {y0}, {x0} {y0}))")
    gb = W(f"LINESTRING ({px!r} {py!r}, 2 2)")
    # px,py was constructed with one rounding each — it may or may not be
    # exactly on the segment, but degenerate_contact must agree with the
    # exact rational test, never miss a true incidence
    from fractions import Fraction as Fr

    on = exactgeom._on_seg(
        Fr(px), Fr(py), Fr(x0), Fr(y0), Fr(x1), Fr(y1)
    )
    if on:
        assert exactgeom.degenerate_contact(ga, gb)


# ---------------------------------------------------------------------------
# exact kernel self-checks against the rectilinear quarter-grid truth
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(6))
def test_exact_path_matches_quarter_grid_truth(seed):
    from test_geom_sampling_oracle import _rand_rectilinear, _truth

    rng = np.random.RandomState(31_000 + seed)
    n_routed = 0
    for _ in range(40):
        wa, wb = _rand_rectilinear(rng), _rand_rectilinear(rng)
        ga, gb = W(wa), W(wb)
        truth = _truth(wa, wb)
        if exactgeom.degenerate_contact(ga, gb):
            n_routed += 1
            assert exactgeom.covers(ga, gb) == truth["covers"], (wa, wb)
            assert exactgeom.covers(gb, ga) == truth["within"], (wa, wb)
            assert (
                exactgeom.interiors_intersect(ga, gb) == truth["interiors"]
            ), (wa, wb)
        assert geom.covers_pair(ga, gb) == truth["covers"], (wa, wb)
        assert geom.overlaps_pair(ga, gb) == truth["overlaps"], (wa, wb)
        assert geom.touches_pair(ga, gb) == truth["touches"], (wa, wb)
    # the rectilinear generator produces plenty of degenerate contact —
    # this family genuinely exercises the exact path
    assert n_routed >= 5


# ---------------------------------------------------------------------------
# r4d review regressions: multipolygon face cases the per-hole witness missed
# ---------------------------------------------------------------------------


def test_covers_island_nested_in_hole():
    """gb IS an island part nested inside a hole of another part: every
    point of gb lies in ga (covers True).  The former single-hole-witness
    rejected it because the hole's interior point landed inside gb."""
    from geowave_spark import geom as g, exactgeom as xg

    ga = g.geometry_from_wkt(
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (2 2, 2 8, 8 8, 8 2, 2 2)), ((3 3, 7 3, 7 7, 3 7, 3 3)))"
    )
    island = g.geometry_from_wkt("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")
    assert xg.covers(ga, island)
    # float path, no boundary contact: gb strictly inside the island
    inner = g.geometry_from_wkt("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert g.covers_pair(ga, inner)
    # a gb poking the hole-minus-island region still rejects (both paths)
    poker = g.geometry_from_wkt("POLYGON ((2.2 2.2, 2.8 2.2, 2.8 2.8, 2.2 2.8, 2.2 2.2))")
    assert not g.covers_pair(ga, poker)
    hole_filler = g.geometry_from_wkt("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))")
    assert not xg.covers(ga, hole_filler)


def test_covers_pocket_between_touching_parts():
    """Two OGC-valid parts touching at isolated points enclose an exterior
    pocket; gb = the pocket shares every boundary point with ga but its
    interior is outside — covers must be False (the arrangement-face
    sweep's side witness lands in the pocket)."""
    from geowave_spark import geom as g, exactgeom as xg

    ga = g.geometry_from_wkt(
        "MULTIPOLYGON (((0 0, 3 0, 3 1, 0 1, 0 0)),"
        " ((0 1, 1.5 2, 3 1, 3 3, 0 3, 0 1)))"
    )
    pocket = g.geometry_from_wkt("POLYGON ((0 1, 3 1, 1.5 2, 0 1))")
    assert not xg.covers(ga, pocket)
    assert not g.covers_pair(ga, pocket)
    # the parts themselves ARE covered
    part = g.geometry_from_wkt("POLYGON ((0 0, 3 0, 3 1, 0 1, 0 0))")
    assert xg.covers(ga, part)


def test_covers_classic_hole_punch_still_rejects():
    from geowave_spark import geom as g, exactgeom as xg

    ga = g.geometry_from_wkt(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 4 6, 6 6, 6 4, 4 4))"
    )
    gb = g.geometry_from_wkt("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")
    assert not xg.covers(ga, gb)
    assert not g.covers_pair(ga, gb)
    # exact-fit into the hole ring is allowed (boundary-only contact)...
    ring = g.geometry_from_wkt("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    assert not xg.covers(ga, ring)  # hole interior is NOT covered material
