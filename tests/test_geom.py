"""Planar geometry kernel tests (PIP, distance, WKT, box intersection)."""

import numpy as np

from geowave_spark import geom


BOX = geom.polygon_from_wkt(geom.box_wkt(0, 0, 10, 10))
# C-shape: concave polygon whose envelope over-covers (FIXTURES.md `concave`)
C_SHAPE = geom.polygon_from_wkt(
    "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 8, 10 8, 10 10, 0 10, 0 0))"
)
DONUT = geom.polygon_from_wkt(
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
)


def test_pip_box():
    lon = np.array([5.0, -1.0, 10.5, 0.0, 10.0])
    lat = np.array([5.0, 5.0, 5.0, 0.0, 10.0])
    got = BOX.contains(lon, lat)
    assert got.tolist() == [True, False, False, True, True]  # boundary inclusive


def test_pip_concave():
    # (5,5) is inside the C's notch → outside polygon, inside envelope
    assert not C_SHAPE.contains(np.array([5.0]), np.array([5.0]))[0]
    assert C_SHAPE.contains(np.array([1.0]), np.array([5.0]))[0]
    assert C_SHAPE.contains(np.array([5.0]), np.array([1.0]))[0]


def test_pip_hole():
    assert not DONUT.contains(np.array([5.0]), np.array([5.0]))[0]
    assert DONUT.contains(np.array([1.0]), np.array([1.0]))[0]
    assert DONUT.contains(np.array([3.0]), np.array([5.0]))[0]  # hole boundary


def test_distance():
    d = BOX.distance(np.array([5.0, 15.0, 13.0]), np.array([5.0, 5.0, 14.0]))
    assert d[0] == 0.0
    assert np.isclose(d[1], 5.0)
    assert np.isclose(d[2], 5.0)  # corner (10,10) → (13,14)


def test_point_distance_planar():
    # planar degrees, matching JTS Geometry.distance (GeomDistance.java:14-23)
    assert np.isclose(
        geom.point_distance(np.array([0.0]), np.array([0.0]), np.array([3.0]), np.array([4.0]))[0],
        5.0,
    )


def test_intersects_boxes():
    x0 = np.array([-5.0, 4.0, 20.0, 3.5])
    y0 = np.array([-5.0, 4.0, 20.0, 3.5])
    x1 = np.array([-1.0, 6.0, 30.0, 6.5])
    y1 = np.array([-1.0, 6.0, 30.0, 6.5])
    got = BOX.intersects_boxes(x0, y0, x1, y1)
    assert got.tolist() == [False, True, False, True]
    # box fully inside the donut hole does NOT intersect
    got2 = DONUT.intersects_boxes(
        np.array([4.0]), np.array([4.0]), np.array([6.0]), np.array([6.0])
    )
    assert not got2[0]


def test_trim_cells_to_geom():
    from geowave_spark import cells

    t, cs = cells.cells_for_bbox(C_SHAPE.bbox, max_dup=64)
    trimmed = cells.trim_cells_to_geom(cs, t, C_SHAPE.intersects_boxes)
    assert trimmed.size <= cs.size
    # the notch cells must be dropped when resolution is fine enough
    t2 = t + 3
    cs2 = cells.cells_for_bbox_at_tier(C_SHAPE.bbox, t2)
    trimmed2 = cells.trim_cells_to_geom(cs2, t2, C_SHAPE.intersects_boxes)
    assert trimmed2.size < cs2.size


def test_wkt_roundtrip_cache():
    p1 = geom.polygon_from_wkt(geom.box_wkt(0, 0, 1, 1))
    p2 = geom.polygon_from_wkt(geom.box_wkt(0, 0, 1, 1))
    assert p1 is p2  # lru_cache interning, cf. GeometryImage interning note


def test_pairwise_distance_intersects_consistency_random():
    """Property over random geometry pairs: distance_pair == 0 iff
    intersects_pair, distance is symmetric, and disjoint bboxes imply
    positive distance."""
    import numpy as np

    from geowave_spark import geom

    rng = np.random.RandomState(99)

    def rand_geom():
        t = rng.randint(3)
        x, y = rng.uniform(-50, 50), rng.uniform(-50, 50)
        if t == 0:
            return geom.geometry_from_wkt(f"POINT ({x:.3f} {y:.3f})")
        if t == 1:
            pts = [(x, y)]
            for _ in range(rng.randint(1, 4)):
                x += rng.uniform(-8, 8); y += rng.uniform(-8, 8)
                pts.append((x, y))
            return geom.geometry_from_wkt(
                "LINESTRING (" + ", ".join(f"{a:.3f} {b:.3f}" for a, b in pts) + ")"
            )
        w, h = rng.uniform(0.5, 12), rng.uniform(0.5, 12)
        return geom.geometry_from_wkt(
            f"POLYGON (({x:.3f} {y:.3f}, {x+w:.3f} {y:.3f}, "
            f"{x+w:.3f} {y+h:.3f}, {x:.3f} {y+h:.3f}, {x:.3f} {y:.3f}))"
        )

    for _ in range(300):
        a, b = rand_geom(), rand_geom()
        d = geom.distance_pair(a, b)
        i = geom.intersects_pair(a, b)
        assert (d == 0.0) == i, (d, i)
        assert d == geom.distance_pair(b, a)
        ax0, ay0, ax1, ay1 = a.bbox
        bx0, by0, bx1, by1 = b.bbox
        if ax1 < bx0 or bx1 < ax0 or ay1 < by0 or by1 < ay0:
            assert d > 0.0


def test_covers_within_equals_family():
    """covers/within/equals over boxes, holes, multipolygons, lines and
    points — including the B-contains-a-hole-of-A case."""
    from geowave_spark import geom

    P = geom.geometry_from_wkt
    hole = P("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (5 5, 15 5, 15 15, 5 15, 5 5))")
    sq = P("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    cases = [
        (P("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"), sq, True),
        (P("POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))"), sq, True),      # edge touch
        (P("POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))"), sq, False),     # partially out
        (P("POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))"), hole, True),    # in ring region
        (P("POLYGON ((7 7, 9 7, 9 9, 7 9, 7 7))"), hole, False),   # in hole
        (P("POLYGON ((3 3, 8 3, 8 8, 3 8, 3 3))"), hole, False),   # overlaps hole
        (P("POLYGON ((2 2, 18 2, 18 18, 2 18, 2 2))"), hole, False),  # contains hole
        (P("LINESTRING (1 1, 3 3)"), sq, True),
        (P("LINESTRING (1 1, 9 9)"), sq, False),
        (P("LINESTRING (2 10, 18 10)"), hole, False),              # crosses hole
    ]
    for b, a, want in cases:
        assert geom.within_pair(b, a) == want
        assert geom.covers_pair(a, b) == want
    # boundary point: covered but NOT within (JTS-strict T*F**F*** — the
    # interiors never meet when the point rides the boundary)
    bp = P("POINT (0 2)")
    assert geom.covers_pair(sq, bp)
    assert not geom.within_pair(bp, sq)
    assert geom.touches_pair(bp, sq)
    # interior point: both
    ip = P("POINT (1 2)")
    assert geom.covers_pair(sq, ip) and geom.within_pair(ip, sq)
    assert geom.equals_pair(sq, P("POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))"))
    assert not geom.equals_pair(sq, hole)
    # line-covers-line: witness-sampled collinear coverage (round-2 add;
    # fuller matrix in tests/test_geom_relate.py)
    assert geom.covers_pair(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0 0, 1 1)"))
    assert not geom.covers_pair(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0 0, 2 2)"))


def test_covers_equals_review_counterexamples():
    """Regressions from the r2 review: the inscribed-diamond hole case and
    equals over mixed/line operands."""
    from geowave_spark import geom

    P = geom.geometry_from_wkt
    ga = P("POLYGON ((-1 -1, 3 -1, 3 3, -1 3, -1 -1), "
           "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
    diamond = P("POLYGON ((0 1, 1 0, 2 1, 1 2, 0 1))")  # hole inscribed in it
    assert not geom.covers_pair(ga, diamond)

    sq = P("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert not geom.equals_pair(P("POINT (1 1)"), sq)
    assert not geom.equals_pair(sq, P("LINESTRING (0.5 0.5, 1 1)"))
    assert geom.equals_pair(P("LINESTRING (0 0, 1 1, 2 0)"), P("LINESTRING (2 0, 1 1, 0 0)"))
    assert not geom.equals_pair(P("LINESTRING (0 0, 1 1)"), P("LINESTRING (0 0, 2 2)"))
