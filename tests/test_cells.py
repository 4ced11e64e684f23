"""Round-trip semantics of the tiered SFC core.

Ports the semantic anchors of the reference's
core/geotime/src/test/.../tiered/TieredSFCIndexStrategyTest.java:52-226
(see SURVEY.md §5.1) to our numpy cell core.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark import cells


def test_interleave_roundtrip():
    rng = np.random.default_rng(42)
    x = rng.integers(0, 2**31, 10_000, dtype=np.int64)
    y = rng.integers(0, 2**31, 10_000, dtype=np.int64)
    c = cells.interleave(x, y)
    rx, ry = cells.deinterleave(c)
    assert np.array_equal(rx, x)
    assert np.array_equal(ry, y)


def test_known_morton_values():
    # hand-computed: x=0b11, y=0b01 -> y1 x1 y0 x0 = 0 1 1 1 = 7
    assert cells.interleave(np.array([3]), np.array([1]))[0] == 7
    assert cells.interleave(np.array([0]), np.array([0]))[0] == 0
    assert cells.interleave(np.array([1]), np.array([1]))[0] == 3


def test_point_single_cell_at_finest_tier():
    """A point gets exactly one insertion id at the finest tier
    (TieredSFCIndexStrategyTest.java:52-96)."""
    t, cs = cells.cells_for_bbox((10.0, 20.0, 10.0, 20.0))
    assert t == cells.MAX_TIER
    assert cs.size == 1
    assert cs[0] == cells.latlon_to_cell(np.array([10.0]), np.array([20.0]))[0]


@pytest.mark.parametrize("tier", [2, 4, 8, 13, 18])
def test_exact_fit_cell_insertion_semantics(tier):
    """Exact-fit tier-t cell semantics, matching the reference exactly
    (TieredSFCIndexStrategyTest.testPredefinedSpatialEntries /
    testOneEstimatedDuplicateInsertion):

    * with maxDuplicates=1 → exactly ONE id AT tier t;
    * with the default budget (2^d=4) → placed one tier finer (t+1) as a
      square decomposition of 4 ids (the finest-fitting rule).
    """
    # pick cell (x=1, y=1) at `tier`
    r = 1 << tier
    lon0 = 1 / r * 360.0 - 180.0
    lon1 = 2 / r * 360.0 - 180.0
    lat0 = 1 / r * 180.0 - 90.0
    lat1 = 2 / r * 180.0 - 90.0
    bbox = (lon0, lat0, lon1, lat1)

    t1, cs1 = cells.cells_for_bbox(bbox, max_dup=1)
    assert t1 == tier
    assert cs1.size == 1
    assert cs1[0] == cells.interleave(np.array([1]), np.array([1]))[0]

    t4, cs4 = cells.cells_for_bbox(bbox)  # default budget 4
    assert t4 == tier + 1
    assert cs4.size == 4


def test_off_tier_extent_duplicated_2_or_4():
    """An extent straddling a tier boundary duplicates into 2 or 4 finer
    cells (TieredSFCIndexStrategyTest.java:98-139)."""
    # box straddling the lon midline at tier 3, sized half a tier-3 cell
    r = 1 << 3
    w = 360.0 / r
    # crosses x boundary between cell 3 and 4, within one y cell
    bbox = (-w / 4, 10.0, w / 4, 10.0 + 180.0 / r / 2)
    t, cs = cells.cells_for_bbox(bbox)
    assert cs.size in (2, 4)
    # straddles in x for every tier finer than 3 → count along x is 2
    assert cells.count_cells_for_bbox(bbox, t) == cs.size


def test_world_bbox():
    """World extent: 4 ids at tier 1 under the default budget (the
    reference's `expectedIds = 4` branch for precision > 180), single id at
    tier 0 when maxDuplicates=1."""
    world = (-180.0, -90.0, 180.0, 90.0)
    t, cs = cells.cells_for_bbox(world)
    assert t == 1 and cs.size == 4
    t0, cs0 = cells.cells_for_bbox(world, max_dup=1)
    assert t0 == 0 and cs0.size == 1


def test_antimeridian_split():
    parts = cells.split_bbox_antimeridian((170.0, -10.0, -170.0, 10.0))
    assert len(parts) == 2
    assert parts[0][0] == -180.0 and parts[1][2] == 180.0
    t, cs = cells.cells_for_bbox((170.0, -10.0, -170.0, 10.0))
    # covering cells must include both sides of the antimeridian
    lon0, lat0, lon1, lat1 = cells.cell_to_bounds(cs, t)
    assert (lon0 < -169.9).any() and (lon1 > 169.9).any()


def test_prefix_reprojection_property():
    """cell at coarser tier == prefix of cell at finer tier — the invariant
    behind reprojectToTier (TieredSFCIndexStrategy.java:503-524)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    c31 = cells.latlon_to_cell(lon, lat, 31)
    for t in (0, 5, 13, 30):
        assert np.array_equal(
            cells.cell_at_tier(c31, 31, t), cells.latlon_to_cell(lon, lat, t)
        )


def test_cell_bounds_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for t in (4, 12, 22):
        c = cells.latlon_to_cell(lon, lat, t)
        lon0, lat0, lon1, lat1 = cells.cell_to_bounds(c, t)
        assert ((lon >= lon0) & (lon <= lon1)).all()
        assert ((lat >= lat0) & (lat <= lat1)).all()


@settings(max_examples=200, deadline=None)
@given(
    lon0=st.floats(-180, 179.9),
    lat0=st.floats(-90, 89.9),
    dlon=st.floats(0.0001, 20),
    dlat=st.floats(0.0001, 20),
)
def test_adaptive_tier_budget_property(lon0, lat0, dlon, dlat):
    """Chosen tier always respects the duplicate budget, and the next-finer
    tier would exceed it (finest-fitting rule, TieredSFCIndexStrategy.java:334-379)."""
    bbox = (lon0, lat0, min(lon0 + dlon, 180.0), min(lat0 + dlat, 90.0))
    t, cs = cells.cells_for_bbox(bbox)
    assert cs.size <= cells.DEFAULT_MAX_DUP
    if t < cells.MAX_TIER:
        assert cells.count_cells_for_bbox(bbox, t + 1) > cells.DEFAULT_MAX_DUP


def test_neighbor_ring_wraps_lon_clamps_lat():
    ring = cells.neighbor_cells(-179.99, 89.99, 4, ring=1)
    # top edge: lat clamps → 2 rows; lon wraps → 3 cols = 6 cells
    assert ring.size == 6
    mid = cells.neighbor_cells(0.0, 0.0, 8, ring=1)
    assert mid.size == 9


def test_tier_for_distance_covers_radius():
    for d in (0.01, 0.1, 1.0):
        t = cells.tier_for_distance(d)
        assert 180.0 / (1 << t) >= d
        if t < cells.MAX_TIER:
            assert 180.0 / (1 << (t + 1)) < d


def test_phash_lonlat_bounds():
    rng = np.random.default_rng(42)
    ph = rng.integers(-(2**63), 2**63 - 1, 10_000, dtype=np.int64)
    lon, lat = cells.phash_to_lonlat(ph)
    assert (lon >= -180).all() and (lon < 180).all()
    assert (lat >= -90).all() and (lat < 90).all()


def test_exact_fit_query_ranges_single_value():
    """Query ranges for an exact-fit tier cell: exactly one single-value
    range at that tier (TieredSFCIndexStrategyTest.java:191-226)."""
    import numpy as np

    from geowave_spark import cells

    t, gx, gy = 6, 13, 27
    r = 1 << t
    bbox = (gx / r * 360 - 180, gy / r * 180 - 90, (gx + 1) / r * 360 - 180, (gy + 1) / r * 180 - 90)
    tier, cover = cells.cells_for_bbox(bbox, max_dup=1)
    assert tier == t and cover.size == 1
    rngs = cells.ranges_for_cover(cover)
    assert rngs == [(int(cover[0]), int(cover[0]))]
    # default budget: one tier finer, 2x2 block → ONE contiguous z-range
    tier4, cover4 = cells.cells_for_bbox(bbox)
    assert tier4 == t + 1 and cover4.size == 4
    assert len(cells.ranges_for_cover(cover4)) == 1


def test_closed_cover_respects_max_dup_budget():
    """Regression (r2 review): the closed (query-side) cover used to pick
    its tier from the OPEN cover count, so a tier-aligned bbox whose open
    cover exactly hit max_dup could emit a closed cover over the cap
    (e.g. 8x10 -> 9x11 = 99 > 80)."""
    from geowave_spark import cells

    t = 8
    r = 1 << t
    # tier-aligned 8x10 block: open cover = 80 = JOIN_MAX_CELLS at tier t
    bbox = (
        10 / r * 360 - 180, 20 / r * 180 - 90,
        18 / r * 360 - 180, 30 / r * 180 - 90,
    )
    budget = cells.JOIN_MAX_CELLS
    assert cells.count_cells_for_bbox(bbox, t) == budget
    assert cells.count_cells_for_bbox(bbox, t, closed=True) == 99  # 9x11
    for closed in (False, True):
        tier, cover = cells.cells_for_bbox(bbox, max_dup=budget, closed=closed)
        assert cover.size <= budget, (closed, tier, cover.size)
        assert cover.size == cells.count_cells_for_bbox(bbox, tier, closed=closed)
    # the open cover stays at the aligned tier; the closed one backs off
    assert cells.cells_for_bbox(bbox, max_dup=budget)[0] == t
    assert cells.cells_for_bbox(bbox, max_dup=budget, closed=True)[0] == t - 1
