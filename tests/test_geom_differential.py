"""Differential fuzz: the vectorized st_*_wkt predicate family vs the
scalar geom.*_pair kernels, over randomized grid-aligned geometry pairs.

Every ADVICE round has surfaced a vectorized-vs-scalar disagreement in a
specific shape class (corner-contact crosses, concave-hole covers, dashed
line covers).  This test is the standing net for that whole bug class:
the SAME pair must evaluate identically through the pandas-UDF dispatch
(box fast paths + group kernels + scalar fallback) and the scalar kernel,
for all nine predicates, across points / segments / polylines / boxes /
concave polygons / polygons-with-holes / multipolygons / multilines.

Grid-aligned integer and half-integer coordinates make boundary contact
(touches, equals, shared edges, corner incidence) common rather than
measure-zero, which is where the historical bugs lived.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geowave_spark import geom
from geowave_spark.functions import geo_udfs

W = geom.geometry_from_wkt


def _box_wkt(x0, y0, x1, y1):
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def _lshape_wkt(x0, y0, w, h, nw, nh):
    """Concave L: (w x h) box with the top-right (nw x nh) notch removed."""
    x1, y1 = x0 + w, y0 + h
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1 - nh}, "
        f"{x1 - nw} {y1 - nh}, {x1 - nw} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def _holed_wkt(x0, y0, s, hx0, hy0, hs):
    """Square with a square hole (hole ring in opposite winding)."""
    x1, y1 = x0 + s, y0 + s
    hx1, hy1 = hx0 + hs, hy0 + hs
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}), "
        f"({hx0} {hy0}, {hx0} {hy1}, {hx1} {hy1}, {hx1} {hy0}, {hx0} {hy0}))"
    )


def _rand_geom(rng: np.random.RandomState) -> str:
    """Random WKT on a half-integer grid in [-4, 5] — contact-heavy."""

    def g(lo=-8, hi=9):  # half-steps: value/2 in [-4, 4.5]
        return rng.randint(lo, hi) / 2.0

    k = rng.randint(8)
    if k == 0:
        return f"POINT ({g()} {g()})"
    if k == 1:
        x0, y0 = g(), g()
        return f"LINESTRING ({x0} {y0}, {g()} {g()})"
    if k == 2:  # polyline (3-4 vertices)
        n = rng.randint(3, 5)
        pts = ", ".join(f"{g()} {g()}" for _ in range(n))
        return f"LINESTRING ({pts})"
    if k == 3:  # axis-aligned box (hits the interval fast paths)
        x0, y0 = g(-8, 5), g(-8, 5)
        return _box_wkt(x0, y0, x0 + rng.randint(1, 5) / 2.0, y0 + rng.randint(1, 5) / 2.0)
    if k == 4:  # concave L-shape
        x0, y0 = g(-8, 3), g(-8, 3)
        w, h = rng.randint(2, 5), rng.randint(2, 5)
        return _lshape_wkt(x0, y0, w, h, rng.randint(1, w), rng.randint(1, h))
    if k == 5:  # square with a hole
        x0, y0 = g(-8, 2), g(-8, 2)
        s = rng.randint(3, 6)
        hs = rng.randint(1, s - 1)
        off = rng.randint(1, s - hs)
        return _holed_wkt(x0, y0, s, x0 + off, y0 + off, hs)
    if k == 6:  # multipolygon: two disjoint-ish boxes
        x0, y0 = g(-8, 0), g(-8, 0)
        x2, y2 = x0 + rng.randint(3, 6), y0 + rng.randint(3, 6)
        return (
            "MULTIPOLYGON ((("
            f"{x0} {y0}, {x0 + 1} {y0}, {x0 + 1} {y0 + 1}, {x0} {y0 + 1}, {x0} {y0})), "
            f"(({x2} {y2}, {x2 + 1.5} {y2}, {x2 + 1.5} {y2 + 1.5}, {x2} {y2 + 1.5}, {x2} {y2})))"
        )
    # multilinestring: dashed horizontal + one free segment
    x0, y0 = g(), g()
    return (
        f"MULTILINESTRING (({x0} {y0}, {x0 + 1} {y0}), "
        f"({x0 + 2} {y0}, {x0 + 3} {y0}), ({g()} {g()}, {g()} {g()}))"
    )


PREDS = [
    (geo_udfs.st_intersects_wkt, geom.intersects_pair),
    (geo_udfs.st_disjoint_wkt, geom.disjoint_pair),
    (geo_udfs.st_within_wkt, geom.within_pair),
    (geo_udfs.st_covers_wkt, geom.covers_pair),
    (geo_udfs.st_contains_wkt, geom.contains_pair),
    (geo_udfs.st_equals_wkt, geom.equals_pair),
    (geo_udfs.st_touches_wkt, geom.touches_pair),
    (geo_udfs.st_crosses_wkt, geom.crosses_pair),
    (geo_udfs.st_overlaps_wkt, geom.overlaps_pair),
]

# the raw python functions behind the pandas_udf wrappers
def _unwrap(fn):
    return getattr(fn, "func", fn)


@pytest.mark.parametrize("seed", [11, 23, 37, 529])
def test_vectorized_matches_scalar_random_pairs(seed):
    rng = np.random.RandomState(seed)
    rights = [_rand_geom(rng) for _ in range(8)]
    lefts = [_rand_geom(rng) for _ in range(150)]
    for right in rights:
        gb = W(right)
        a = pd.Series(lefts)
        b = pd.Series([right] * len(lefts))
        for vec_fn, scalar_fn in PREDS:
            got = np.asarray(_unwrap(vec_fn)(a, b), dtype=bool)
            want = np.array([scalar_fn(W(w), gb) for w in lefts])
            bad = np.nonzero(got != want)[0]
            assert not len(bad), (
                f"{scalar_fn.__name__}: vectorized != scalar for "
                f"left={lefts[bad[0]]!r} right={right!r} "
                f"(vec={bool(got[bad[0]])}, scalar={bool(want[bad[0]])})"
            )


@pytest.mark.parametrize("seed", [5, 19])
def test_de9im_identities_random_pairs(seed):
    """Cross-predicate identities must hold on every random pair, through
    the VECTORIZED path (the scalar twin lives in test_geom_relate)."""
    rng = np.random.RandomState(seed)
    lefts = [_rand_geom(rng) for _ in range(120)]
    right = _rand_geom(rng)
    a, b = pd.Series(lefts), pd.Series([right] * len(lefts))
    r = {
        name: np.asarray(_unwrap(fn)(a, b), dtype=bool)
        for name, fn in (
            ("intersects", geo_udfs.st_intersects_wkt),
            ("disjoint", geo_udfs.st_disjoint_wkt),
            ("touches", geo_udfs.st_touches_wkt),
            ("crosses", geo_udfs.st_crosses_wkt),
            ("overlaps", geo_udfs.st_overlaps_wkt),
            ("covers", geo_udfs.st_covers_wkt),
            ("contains", geo_udfs.st_contains_wkt),
            ("within", geo_udfs.st_within_wkt),
            ("equals", geo_udfs.st_equals_wkt),
        )
    }
    assert (r["disjoint"] == ~r["intersects"]).all()
    assert not (r["crosses"] & r["overlaps"]).any()
    assert ((r["crosses"] | r["overlaps"]) <= r["intersects"]).all()
    assert (r["touches"] <= r["intersects"]).all()
    assert not (r["touches"] & (r["crosses"] | r["overlaps"])).any()
    assert (r["contains"] <= r["covers"]).all()
    assert (r["equals"] <= (r["covers"] & r["within"])).all()
