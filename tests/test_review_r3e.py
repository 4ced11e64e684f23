"""Round-3 fifth-batch review regressions: seam canonicalization, exact
refine intervals, bowtie quads, helper re-entrancy."""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import cells, geom, sqlcells


def test_seam_start_box_canonicalizes():
    """A box starting exactly at +180 must cover the same cells as its
    -180-shifted twin, not a full longitude row (norm_lon wraps its lower
    bound to column 0 while the upper maps to the last column)."""
    a = cells.count_cells_for_bbox((180.0, 0.0, 185.0, 10.0), 10)
    b = cells.count_cells_for_bbox((-180.0, 0.0, -175.0, 10.0), 10)
    assert a == b < 5000
    ca = cells.cells_for_bbox_at_tier((180.0, 0.0, 185.0, 10.0), 8)
    cb = cells.cells_for_bbox_at_tier((-180.0, 0.0, -175.0, 10.0), 8)
    assert np.array_equal(ca, cb)


def test_wrapped_closed_count_matches_cover():
    """count_cells_for_bbox(closed=True) must equal the deduped cover size
    for antimeridian-crossing boxes (the seam column is appended only when
    no split part already covers grid column 0)."""
    bbox = (170.0, -10.0, -170.0, 10.0)
    for t in (3, 5, 8):
        n = cells.count_cells_for_bbox(bbox, t, closed=True)
        v = len(cells.cells_for_bbox_at_tier(bbox, t, closed=True))
        assert n == v, (t, n, v)


def test_refine_pred_beyond_seam_is_exact(spark):
    """bbox (185, 0, 190, 10) means lon in [-175, -170]; a point at
    lon=-179 must NOT match (the old half-open OR admitted it)."""
    df = spark.createDataFrame(
        [(1, -179.0, 5.0), (2, -172.0, 5.0), (3, 0.0, 5.0)],
        "id long, lon double, lat double",
    )
    got = sorted(
        r["id"]
        for r in df.filter(
            sqlcells.bbox_refine_pred(F.col("lon"), F.col("lat"), (185.0, 0.0, 190.0, 10.0))
        ).collect()
    )
    assert got == [2]
    # symmetric below-seam form
    got2 = sorted(
        r["id"]
        for r in df.filter(
            sqlcells.bbox_refine_pred(F.col("lon"), F.col("lat"), (-190.0, 0.0, -185.0, 10.0))
        ).collect()
    )
    assert got2 == []
    # wrapped representation still matches both sides
    df2 = spark.createDataFrame(
        [(1, 175.0, 5.0), (2, -175.0, 5.0), (3, 0.0, 5.0)], "id long, lon double, lat double"
    )
    got3 = sorted(
        r["id"]
        for r in df2.filter(
            sqlcells.bbox_refine_pred(F.col("lon"), F.col("lat"), (170.0, 0.0, -170.0, 10.0))
        ).collect()
    )
    assert got3 == [1, 2]


def test_is_box_rejects_bowtie():
    """A self-intersecting quad whose vertex SET matches the bbox corners
    is not a box — its even-odd interior is two triangles, and the box
    fast paths must not route it to plain bbox algebra."""
    bow = geom.geometry_from_wkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))")
    box = geom.geometry_from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert not bow.is_box()
    assert box.is_box()
    # the covers fast path no longer contradicts the bowtie's own interior
    gb = geom.geometry_from_wkt(
        "POLYGON ((0.45 0.85, 0.55 0.85, 0.55 0.95, 0.45 0.95, 0.45 0.85))"
    )
    assert not geom.covers_pair(bow, gb)


def test_add_cell_column_reentrant(spark):
    """Pre-existing columns named like the old temps must survive."""
    df = spark.createDataFrame(
        [(1.0, 2.0, "keep-me")], "lon double, lat double, _gx string"
    )
    out = sqlcells.add_cell_column(df, "lon", "lat")
    row = out.first()
    assert row["_gx"] == "keep-me" and row["_cell31"] is not None
