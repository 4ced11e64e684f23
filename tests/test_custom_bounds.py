"""Custom per-dimension index bounds (CRS step 1).

The reference parametrizes its spatial index over any CRS
(SpatialDimensionalityTypeProvider.java:107-124 crsCode/decodeCRS →
BasicDimensionDefinition per axis).  Here a projected-CRS-like workload
(UTM-style metres, bounds (0, 0) – (1 000 000, 2 000 000)) runs through the
flagship tiered join with the index math normalized over those bounds, and
every pair is checked against a brute-force double-loop oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark import cells, sqlcells
from geowave_spark.operators import spatial_join

B = (0.0, 0.0, 1_000_000.0, 2_000_000.0)  # projected frame, metres


def _pts(spark, n=4000, seed=5):
    rng = np.random.RandomState(seed)
    rows = [
        (int(i), float(rng.uniform(0, 1_000_000)), float(rng.uniform(0, 2_000_000)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["event_id", "lon", "lat"]), rows


def _polys(spark):
    from geowave_spark.geom import box_wkt

    boxes = [
        ("z_a", 100_000.0, 100_000.0, 400_000.0, 600_000.0),
        ("z_b", 350_000.0, 500_000.0, 900_000.0, 1_900_000.0),
        ("z_c", 0.0, 0.0, 1_000_000.0, 2_000_000.0),   # whole frame
        ("z_d", 960_000.0, 40_000.0, 999_000.0, 90_000.0),  # small corner
        ("z_e", 0.0, 1_500_000.0, 50_000.0, 2_000_000.0),   # edge-touching
    ]
    df = spark.createDataFrame(
        [(pid, box_wkt(x0, y0, x1, y1)) for pid, x0, y0, x1, y1 in boxes],
        ["polygon_id", "wkt"],
    )
    return df, boxes


def _brute(rows, boxes):
    out = set()
    for eid, x, y in rows:
        for pid, x0, y0, x1, y1 in boxes:
            if x0 <= x <= x1 and y0 <= y <= y1:
                out.add((eid, pid))
    return out


def test_projected_bounds_broadcast_join_matches_brute(spark):
    pts, rows = _pts(spark)
    polys, boxes = _polys(spark)
    got = {
        (r.event_id, r.polygon_id)
        for r in spatial_join.tiered_spatial_join(
            pts, polys, point_id="event_id", bounds=B
        ).collect()
    }
    assert got == _brute(rows, boxes)


def test_projected_bounds_shuffle_join_matches_brute(spark):
    pts, rows = _pts(spark, n=1500, seed=11)
    polys, boxes = _polys(spark)
    got = {
        (r.event_id, r.polygon_id)
        for r in spatial_join.tiered_spatial_join(
            pts, polys, point_id="event_id", bounds=B,
            broadcast_polygons=False,
        ).collect()
    }
    assert got == _brute(rows, boxes)


def test_projected_bounds_dwithin_matches_brute(spark):
    pts, rows = _pts(spark, n=1200, seed=23)
    polys, boxes = _polys(spark)
    radius = 25_000.0
    got = {
        (r.event_id, r.polygon_id)
        for r in spatial_join.tiered_spatial_join(
            pts, polys, predicate="dwithin", radius=radius,
            point_id="event_id", bounds=B,
        ).collect()
    }
    want = set()
    for eid, x, y in rows:
        for pid, x0, y0, x1, y1 in boxes:
            dx = max(x0 - x, 0.0, x - x1)
            dy = max(y0 - y, 0.0, y - y1)
            if (dx * dx + dy * dy) ** 0.5 <= radius:
                want.add((eid, pid))
    assert got == want


def test_bounds_cell_roundtrip_properties():
    rng = np.random.RandomState(7)
    xs = rng.uniform(0, 1_000_000, 500)
    ys = rng.uniform(0, 2_000_000, 500)
    for tier in (3, 9, 17):
        c = cells.latlon_to_cell(xs, ys, tier, bounds=B)
        x0, y0, x1, y1 = cells.cell_to_bounds(c, tier, bounds=B)
        assert np.all((xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1))
        # prefix property survives custom bounds
        assert np.array_equal(
            cells.cell_at_tier(c, tier, tier - 2),
            cells.latlon_to_cell(xs, ys, tier - 2, bounds=B),
        )


def test_bounds_clamp_no_wrap():
    # out-of-frame x clamps (projected CRS has no seam to wrap across)
    c_lo = cells.latlon_to_cell(np.array([-5.0]), np.array([10.0]), 8, bounds=B)
    c0 = cells.latlon_to_cell(np.array([0.0]), np.array([10.0]), 8, bounds=B)
    assert c_lo[0] == c0[0]
    c_hi = cells.latlon_to_cell(np.array([2e6]), np.array([10.0]), 8, bounds=B)
    c_max = cells.latlon_to_cell(np.array([999_999.0]), np.array([10.0]), 8, bounds=B)
    assert c_hi[0] == c_max[0]


def test_sql_and_numpy_bounds_cells_agree(spark):
    pts, rows = _pts(spark, n=300, seed=3)
    tier = 12
    df = sqlcells.add_cell_column(pts, "lon", "lat", tier, "_c", bounds=B)
    got = {r.event_id: r._c for r in df.collect()}
    for eid, x, y in rows:
        want = int(cells.latlon_to_cell(np.array([x]), np.array([y]), tier, bounds=B)[0])
        assert got[eid] == want
