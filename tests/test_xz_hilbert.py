"""XZ-ordering + Hilbert curve: round trips, locality, and query recall."""

from __future__ import annotations

import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import cells_xz, hilbert

# --- Hilbert ----------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    tier=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
def test_hilbert_roundtrip(tier, data):
    n = 1 << tier
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    d = hilbert.xy2d(np.array([x]), np.array([y]), tier)
    x2, y2 = hilbert.d2xy(d, tier)
    assert (x2[0], y2[0]) == (x, y)
    assert 0 <= d[0] < n * n


def test_hilbert_is_bijective_small():
    tier = 4
    n = 1 << tier
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert.xy2d(gx.ravel(), gy.ravel(), tier)
    assert sorted(d.tolist()) == list(range(n * n))


def test_hilbert_adjacency():
    """Consecutive curve positions are grid neighbors — the locality
    property that makes Hilbert the better stored-layout order."""
    tier = 5
    n = 1 << tier
    d = np.arange(n * n)
    x, y = hilbert.d2xy(d, tier)
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()


# --- XZ ordering ------------------------------------------------------------


def test_xz_known_values():
    # whole space → root code 0
    assert cells_xz.xz_id(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0]))[0] == 0
    # tiny extent at origin → deepest leftmost path: code = g (1 per level)
    tiny = cells_xz.xz_id(np.array([0.0]), np.array([0.0]), np.array([1e-9]), np.array([1e-9]))
    assert tiny[0] == cells_xz.G
    # codes are within the sequence space
    assert 0 <= tiny[0] < (4 ** (cells_xz.G + 1) - 1) // 3


@settings(max_examples=300, deadline=None)
@given(
    x0=st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
    y0=st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
    w=st.floats(min_value=1e-7, max_value=0.5, allow_nan=False),
    h=st.floats(min_value=1e-7, max_value=0.5, allow_nan=False),
    qx0=st.floats(min_value=0.0, max_value=0.9, allow_nan=False),
    qy0=st.floats(min_value=0.0, max_value=0.9, allow_nan=False),
    qw=st.floats(min_value=0.01, max_value=0.6, allow_nan=False),
    qh=st.floats(min_value=0.01, max_value=0.6, allow_nan=False),
)
def test_xz_query_recall(x0, y0, w, h, qx0, qy0, qw, qh):
    """Every extent intersecting the query box has its code inside some
    returned range (recall — the property the index scan depends on)."""
    x1, y1 = min(x0 + w, 1.0), min(y0 + h, 1.0)
    qx1, qy1 = min(qx0 + qw, 1.0), min(qy0 + qh, 1.0)
    intersects = x0 <= qx1 and x1 >= qx0 and y0 <= qy1 and y1 >= qy0
    if not intersects:
        return
    code = int(cells_xz.xz_id(np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]))[0])
    ranges = cells_xz.xz_query_ranges(qx0, qy0, qx1, qy1)
    assert any(lo <= code <= hi for lo, hi in ranges), (code, ranges[:10])


def test_xz_ranges_prune():
    """A small corner query must not return the whole code space."""
    ranges = cells_xz.xz_query_ranges(0.9, 0.9, 0.95, 0.95)
    total = sum(hi - lo + 1 for lo, hi in ranges)
    space = (4 ** (cells_xz.G + 1) - 1) // 3
    assert total < space * 0.1


@settings(max_examples=100, deadline=None)
@given(
    x0=st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
    y0=st.floats(min_value=0.0, max_value=0.999, allow_nan=False),
    w=st.floats(min_value=1e-7, max_value=0.5, allow_nan=False),
    h=st.floats(min_value=1e-7, max_value=0.5, allow_nan=False),
)
def test_xz_budgeted_recall(x0, y0, w, h):
    """The range-decomposition budget must never lose recall."""
    x1, y1 = min(x0 + w, 1.0), min(y0 + h, 1.0)
    q = (0.3, 0.3, 0.7, 0.7)
    if not (x0 <= q[2] and x1 >= q[0] and y0 <= q[3] and y1 >= q[1]):
        return
    code = int(cells_xz.xz_id(np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]))[0])
    ranges = cells_xz.xz_query_ranges(*q, max_ranges=16)
    assert any(lo <= code <= hi for lo, hi in ranges)


def test_xz_indexed_extent_lookup_end_to_end(spark, tmp_path):
    """write_indexed_extents + xz_range_lookup equals brute-force bbox
    intersection on derived event extents."""
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    ev = eq._events(spark, "/root/testdata/sf0.001")
    ex = ev.select(
        F.col("event_id").alias("extent_id"),
        F.col("lon").alias("x0"),
        F.col("lat").alias("y0"),
        F.least(F.col("lon") + 0.5 + F.col("value") / 10.0, F.lit(180.0)).alias("x1"),
        F.least(F.col("lat") + 0.5 + F.col("value") / 20.0, F.lit(90.0)).alias("y1"),
    )
    path = str(tmp_path / "extents_xz.parquet")
    indexed.write_indexed_extents(ex, path, n_files=8)
    bbox = (-20.0, 5.0, 30.0, 45.0)
    got = sorted(r["extent_id"] for r in indexed.xz_range_lookup(spark, path, bbox).collect())
    bx0, by0, bx1, by1 = bbox
    want = sorted(
        r["extent_id"]
        for r in ex.filter(
            (F.col("x0") <= bx1) & (F.col("x1") >= bx0) & (F.col("y0") <= by1) & (F.col("y1") >= by0)
        ).collect()
    )
    assert got == want and len(got) > 0


@settings(max_examples=150, deadline=None)
@given(
    lon=st.floats(min_value=-180.0, max_value=179.99, allow_nan=False),
    lat=st.floats(min_value=-90.0, max_value=89.99, allow_nan=False),
    qx0=st.floats(min_value=-180.0, max_value=170.0, allow_nan=False),
    qy0=st.floats(min_value=-90.0, max_value=80.0, allow_nan=False),
    qw=st.floats(min_value=0.5, max_value=120.0, allow_nan=False),
    qh=st.floats(min_value=0.5, max_value=60.0, allow_nan=False),
)
def test_hilbert_range_recall(lon, lat, qx0, qy0, qw, qh):
    """Any point inside the query bbox has its Hilbert d inside some range
    (budgeted decomposition keeps recall)."""
    qx1, qy1 = min(qx0 + qw, 180.0), min(qy0 + qh, 90.0)
    if not (qx0 <= lon <= qx1 and qy0 <= lat <= qy1):
        return
    tier = 12
    d = int(hilbert.latlon_to_hilbert(np.array([lon]), np.array([lat]), tier)[0])
    ranges = hilbert.hilbert_query_ranges((qx0, qy0, qx1, qy1), tier, max_ranges=32)
    assert any(lo <= d <= hi for lo, hi in ranges), (d, len(ranges))


def test_hilbert_ranges_denser_than_zorder():
    """Hilbert locality: same bbox needs no more uncapped ranges than
    Z-order's cover merge (the reason it is the reference's default)."""
    from geowave_spark import cells

    tier = 10
    bbox = (-10.0, 20.0, 25.0, 45.0)
    h_ranges = hilbert.hilbert_query_ranges(bbox, tier, max_ranges=None)
    z_cover = cells.cells_for_bbox_at_tier(bbox, tier)
    z_ranges = cells.ranges_for_cover(z_cover)
    assert len(h_ranges) <= len(z_ranges)


def test_hilbert_indexed_lookup_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    ev = eq._events(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "ev_hilbert.parquet")
    indexed.write_indexed_hilbert(ev, path, n_files=8, phash_col=None)
    bbox = (-30.0, 10.0, 45.0, 55.0)
    got = sorted(r["event_id"] for r in indexed.hilbert_range_lookup(spark, path, bbox).collect())
    want = sorted(
        r["event_id"]
        for r in ev.filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        ).collect()
    )
    assert got == want and len(got) > 0
    # ranges reach the scan as pushed filters
    df = indexed.hilbert_range_lookup(spark, path, bbox)
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        full = df._jdf.queryExecution().toString()
    finally:
        df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "PushedFilters: [" in full and "hd" in full.split("PushedFilters: [", 1)[1][:4000]


# --- antimeridian lookups ---------------------------------------------------


def _wrap_pred_py(lon, lat, bbox):
    """Python twin of sqlcells.bbox_refine_pred for the brute-force oracle."""
    lon0, lat0, lon1, lat1 = bbox
    if not (lat0 <= lat <= lat1):
        return False
    if lon1 - lon0 >= 360.0:
        return True
    if lon1 > 180.0:
        return lon >= lon0 or lon <= lon1 - 360.0
    if lon0 < -180.0:
        return lon <= lon1 or lon >= lon0 + 360.0
    if lon0 > lon1:
        return lon >= lon0 or lon <= lon1
    return lon0 <= lon <= lon1


AM_BBOXES = [
    (170.0, -10.0, -170.0, 10.0),   # wrapped representation
    (176.5, -20.0, 183.5, -10.0),   # unwrapped above (workload's am_east)
    (-183.5, 50.0, -176.5, 60.0),   # unwrapped below (buffered at -180)
]


def test_indexed_lookups_antimeridian(spark, tmp_path):
    """All three indexed lookups return the exact wrap-aware match set for
    antimeridian-crossing bboxes (ADVICE r01: ranges used to clamp away one
    side and the refine used plain lon0<=lon<=lon1)."""
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    ev = eq._events(spark, "/root/testdata/sf0.001")
    rows = ev.select("event_id", "lon", "lat").collect()

    zpath = str(tmp_path / "ev_cell.parquet")
    hpath = str(tmp_path / "ev_hilbert.parquet")
    indexed.write_indexed(ev, zpath, n_files=8, phash_col=None)
    indexed.write_indexed_hilbert(ev, hpath, n_files=8, phash_col=None)

    for bbox in AM_BBOXES:
        want = sorted(r["event_id"] for r in rows if _wrap_pred_py(r["lon"], r["lat"], bbox))
        assert want, f"fixture has no points in {bbox}"  # meaningful test
        got_z = sorted(
            r["event_id"] for r in indexed.range_lookup_indexed(spark, zpath, bbox).collect()
        )
        got_h = sorted(
            r["event_id"] for r in indexed.hilbert_range_lookup(spark, hpath, bbox).collect()
        )
        assert got_z == want, f"zorder {bbox}"
        assert got_h == want, f"hilbert {bbox}"


def test_xz_lookup_antimeridian(spark, tmp_path):
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    ev = eq._events(spark, "/root/testdata/sf0.001")
    ex = ev.select(
        F.col("event_id").alias("extent_id"),
        F.col("lon").alias("x0"),
        F.col("lat").alias("y0"),
        F.least(F.col("lon") + 0.8, F.lit(180.0)).alias("x1"),
        F.least(F.col("lat") + 0.8, F.lit(90.0)).alias("y1"),
    )
    path = str(tmp_path / "extents_xz_am.parquet")
    indexed.write_indexed_extents(ex, path, n_files=8)
    ex_rows = ex.collect()
    from geowave_spark import cells

    for bbox in AM_BBOXES:
        subs = cells.split_bbox_antimeridian(bbox)
        want = sorted(
            r["extent_id"]
            for r in ex_rows
            if any(
                r["x0"] <= b[2] and r["x1"] >= b[0] and r["y0"] <= b[3] and r["y1"] >= b[1]
                for b in subs
            )
        )
        assert want, f"fixture has no extents touching {bbox}"
        got = sorted(
            r["extent_id"] for r in indexed.xz_range_lookup(spark, path, bbox).collect()
        )
        assert got == want, f"xz {bbox}"


# --- composite hierarchical index (point curve + XZ curve, one table) -------


def test_hier_composite_lookup_end_to_end(spark, tmp_path):
    """write_indexed_hier + hier_range_lookup equals brute force for a
    mixed point+extent table, and the scan is pruned via PushedFilters on
    the stored (kind, code) columns (XZHierarchicalIndexStrategy fan-out)."""
    from pyspark.sql import functions as F

    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    mixed = eq._hier_mixed_df(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "hier.parquet")
    indexed.write_indexed_hier(mixed, path, n_files=8)
    rows = mixed.collect()

    for bbox in [(-15.0, 0.0, 40.0, 42.0), (170.0, -10.0, -170.0, 10.0)]:
        subs = cells_mod.split_bbox_antimeridian(bbox)
        want = sorted(
            r["event_id"]
            for r in rows
            if any(
                r["x0"] <= b[2] and r["x1"] >= b[0] and r["y0"] <= b[3] and r["y1"] >= b[1]
                for b in subs
            )
        )
        got = sorted(
            r["event_id"]
            for r in indexed.hier_range_lookup(spark, path, bbox).collect()
        )
        assert got == want and len(got) > 0, bbox

    df = indexed.hier_range_lookup(spark, path, (-15.0, 0.0, 40.0, 42.0))
    spark.conf.set("spark.sql.maxMetadataStringLength", "200000")
    try:
        plan = df._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    pushed = plan.split("PushedFilters: [", 1)
    assert len(pushed) == 2
    head = pushed[1][:20000]
    assert "code" in head and "kind" in head


from geowave_spark import cells as cells_mod  # noqa: E402
