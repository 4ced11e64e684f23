"""S2-style spherical cells (cells_s2): LUT correctness, twin equality
(numpy / Spark selectExpr / DuckDB), prefix property, and query-range
recall over polar / face-crossing / antimeridian / world boxes.

Reference parity surface: core/index SpaceFillingCurve.getId /
getQueryRanges (HilbertSFC.java) re-expressed for the spherical family.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import cells_s2, hilbert

RNG = np.random.default_rng(7)


def _random_lonlat(n: int) -> tuple[np.ndarray, np.ndarray]:
    # decimal 1e-4-degree grid (the fixture contract cells_s2 documents)
    lon = np.round(RNG.uniform(-180, 180, n), 4)
    lat = np.round(RNG.uniform(-90, 90, n), 4)
    return lon, lat


# --- Hilbert state machine vs xy2d ------------------------------------------


def test_hilbert_lut_matches_xy2d_exhaustive():
    """The packed 4-state LUT used in stage_exprs reproduces hilbert.xy2d
    exactly, exhaustively at level 5 (1024 cells)."""
    level = 5
    n = 1 << level
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    i = i.ravel().astype(np.int64)
    j = j.ravel().astype(np.int64)
    want = hilbert.xy2d(i, j, level)
    # replay the LUT machine
    lut = np.array(cells_s2._HILBERT_LUT, dtype=np.int64)
    state = np.zeros_like(i)
    d = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        bx = ((i >> k) & 1) * 2
        by = (j >> k) & 1
        packed = lut[state * 4 + bx + by]
        d = d * 4 + packed // 4
        state = packed % 4
    assert (d == want).all()


def test_face_partition_and_determinism():
    """Every point gets exactly one face; equatorial faces follow the exact
    floor rule; poles promote."""
    lon, lat = _random_lonlat(20000)
    face, i, j = cells_s2.ij_np(lon, lat, 8)
    assert set(np.unique(face)) <= {0, 1, 2, 3, 4, 5}
    # pure equator never promotes
    f0, _, _ = cells_s2.ij_np(np.array([0.0, 90.0, 180.0, -90.0]), np.zeros(4), 8)
    assert list(f0) == [0, 1, 3, 4]
    # poles promote
    fp, _, _ = cells_s2.ij_np(np.array([13.0, -77.0]), np.array([89.9, -89.9]), 8)
    assert list(fp) == [cells_s2.FACE_NORTH, cells_s2.FACE_SOUTH]


def test_cell_ids_in_range():
    lon, lat = _random_lonlat(5000)
    for level in (4, 8, 12):
        c = cells_s2.cell_np(lon, lat, level)
        assert c.min() >= 0
        assert c.max() < 6 * 4**level


# --- twin equality -----------------------------------------------------------


def test_duckdb_twin_matches_numpy():
    lon, lat = _random_lonlat(20000)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    exprs = cells_s2.stage_exprs(level=12, dialect="duckdb")
    got = con.sql(f"SELECT {', '.join(exprs)} FROM pts").df()["s2_cell"].to_numpy()
    want = cells_s2.cell_np(lon, lat, 12)
    assert (got == want).all()


def test_spark_twin_matches_numpy(spark):
    lon, lat = _random_lonlat(20000)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    out = cells_s2.add_s2_cell_column(df, level=12, face_out="s2_face")
    pdf = out.toPandas()
    want = cells_s2.cell_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12)
    assert (pdf["s2_cell"].to_numpy() == want).all()
    wf, _, _ = cells_s2.ij_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 12)
    assert (pdf["s2_face"].to_numpy() == wf).all()
    # intermediates dropped
    assert not [c for c in out.columns if c.startswith("_s2_")]


def test_spark_twin_plan_is_codegen(spark):
    """The cell-id column is pure JVM Column algebra — no Python eval, no
    shuffle (a scan-side index key at 100 TB must be map-only)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": [1.0], "lat": [2.0]}))
    out = cells_s2.add_s2_cell_column(df, level=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# --- prefix property ----------------------------------------------------------


def test_cell_at_level_prefix_property():
    """Parent id at a coarser level equals the direct computation — the
    quadtree block of a Hilbert curve is one contiguous run."""
    lon, lat = _random_lonlat(20000)
    c12 = cells_s2.cell_np(lon, lat, 12)
    for to in (10, 6, 3):
        direct = cells_s2.cell_np(lon, lat, to)
        derived = cells_s2.cell_at_level(c12, 12, to)
        assert (direct == derived).all(), to


def test_cell_at_level_sql_twin(spark):
    lon, lat = _random_lonlat(5000)
    c12 = cells_s2.cell_np(lon, lat, 12)
    import pandas as pd

    pdf = pd.DataFrame({"c": c12})
    want = cells_s2.cell_at_level(c12, 12, 6)
    sql = cells_s2.cell_at_level_sql("c", 12, 6)
    got_duck = duckdb.sql(f"SELECT {sql} AS p FROM pdf").df()["p"].to_numpy()
    assert (got_duck == want).all()
    sdf = spark.createDataFrame(pdf).selectExpr("c", f"{sql} AS p").toPandas()
    m = dict(zip(sdf["c"], sdf["p"]))
    assert all(m[int(c)] == int(w) for c, w in zip(c12, want))

    with pytest.raises(ValueError):
        cells_s2.cell_at_level(c12, 6, 12)


# --- query ranges -------------------------------------------------------------

BOXES = [
    (-30.0, 10.0, 45.0, 55.0),  # face-crossing mid-lat
    (40.0, -10.0, 50.0, 5.0),  # single equatorial face
    (-180.0, 60.0, 180.0, 90.0),  # north polar cap
    (-180.0, -90.0, 180.0, -60.0),  # south polar cap
    (170.0, -20.0, -170.0, 20.0),  # antimeridian
    (-50.0, -40.0, -40.0, -30.0),
    (-180.0, -90.0, 180.0, 90.0),  # world
    (88.0, 85.0, 92.0, 89.0),  # tiny near-pole (face corner)
    (-1.0, -1.0, 1.0, 1.0),  # face-center origin
    (44.0, 44.0, 46.0, 46.0),  # face corner seam
]


@pytest.mark.parametrize("bbox", BOXES)
def test_query_ranges_recall(bbox):
    """Every point inside the lon/lat box falls inside some returned cell-id
    range (recall-exact; refine restores precision)."""
    lon, lat = _random_lonlat(40000)
    level = 12
    cell = cells_s2.cell_np(lon, lat, level)
    x0, y0, x1, y1 = bbox
    if x0 <= x1:
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
    else:
        m = ((lon >= x0) | (lon <= x1)) & (lat >= y0) & (lat <= y1)
    rngs = cells_s2.query_ranges(bbox, level)
    assert rngs == sorted(rngs)
    assert all(lo <= hi for lo, hi in rngs)
    inr = np.zeros_like(m)
    for lo, hi in rngs:
        inr |= (cell >= lo) & (cell <= hi)
    assert not (m & ~inr).any()


def test_query_ranges_recall_fuzz():
    """Randomized boxes — including promotion-boundary-hugging and
    face-corner boxes, the shapes a sampled hull under-covered — against a
    dense point cloud.  The exact-extrema cover must miss nothing."""
    rng = np.random.default_rng(1234)
    lon = np.round(rng.uniform(-180, 180, 120000), 4)
    lat = np.round(rng.uniform(-90, 90, 120000), 4)
    level = 12
    cell = cells_s2.cell_np(lon, lat, level)
    boxes = []
    for _ in range(60):  # generic random boxes
        xs = np.sort(np.round(rng.uniform(-180, 180, 2), 3))
        ys = np.sort(np.round(rng.uniform(-90, 90, 2), 3))
        boxes.append((xs[0], ys[0], xs[1], ys[1]))
    for _ in range(40):  # promotion-boundary huggers (35.26°..45° band)
        x0 = float(np.round(rng.uniform(-180, 140, 1)[0], 3))
        w = float(rng.uniform(1, 40))
        y0 = float(np.round(rng.uniform(33, 46, 1)[0], 3))
        h = float(rng.uniform(0.5, 12))
        boxes.append((x0, y0, min(x0 + w, 180.0), min(y0 + h, 90.0)))
        boxes.append((x0, -min(y0 + h, 90.0), min(x0 + w, 180.0), -y0))
    for corner in (-135.0, -45.0, 45.0, 135.0):  # face-corner straddlers
        boxes.append((corner - 2.0, 33.0, corner + 2.0, 48.0))
        boxes.append((corner - 0.01, -48.0, corner + 0.01, -33.0))
    for bbox in boxes:
        x0, y0, x1, y1 = bbox
        m = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        rngs = cells_s2.query_ranges(bbox, level)
        inr = np.zeros_like(m)
        for lo, hi in rngs:
            inr |= (cell >= lo) & (cell <= hi)
        missed = int((m & ~inr).sum())
        assert missed == 0, f"RECALL FAILURE {bbox}: {missed} missed"


def test_face_uv_bounds_contains_sampled_image():
    """The exact per-face hull contains the (u, v) of every sampled point
    inside the box (the hull is certified by monotonicity; this pins the
    implementation against the row-assignment formulas)."""
    rng = np.random.default_rng(5)
    for _ in range(40):
        xs = np.sort(rng.uniform(-180, 180, 2))
        ys = np.sort(rng.uniform(-90, 90, 2))
        bbox = (xs[0], ys[0], xs[1], ys[1])
        lon = rng.uniform(xs[0], xs[1], 4000)
        lat = rng.uniform(ys[0], ys[1], 4000)
        face, u, v = cells_s2.face_uv_np(lon, lat)
        hull = cells_s2._face_uv_bounds(bbox)
        for f in np.unique(face):
            assert int(f) in hull, (bbox, f)
            m = face == f
            eps = 1e-12
            covered = np.zeros(int(m.sum()), dtype=bool)
            for u0, u1, v0, v1 in hull[int(f)]:
                covered |= (
                    (u[m] >= u0 - eps) & (u[m] <= u1 + eps)
                    & (v[m] >= v0 - eps) & (v[m] <= v1 + eps)
                )
            assert covered.all(), (bbox, f)


def test_query_ranges_budget():
    for budget in (8, 64, 256):
        rngs = cells_s2.query_ranges((-30, 10, 45, 55), 12, max_ranges=budget)
        # per-face budget: at most ~budget ranges per touched face after merge
        assert len(rngs) <= budget * 6


def test_world_cover_is_everything():
    rngs = cells_s2.query_ranges((-180, -90, 180, 90), 8)
    assert rngs == [(0, 6 * 4**8 - 1)]


# --- stored S2 layout ---------------------------------------------------------


@pytest.fixture(scope="module")
def s2_layout(spark, tmp_path_factory):
    from geowave_spark import entry_queries as eq
    from geowave_spark.sources import indexed

    path = str(tmp_path_factory.mktemp("s2") / "ev_s2.parquet")
    ev = eq._events(spark, "/root/testdata/sf0.001")
    indexed.write_indexed_s2(ev, path, n_files=16, phash_col=None)
    return path


@pytest.mark.parametrize(
    "bbox",
    [
        (-30.0, 10.0, 45.0, 55.0),
        (-180.0, 60.0, 180.0, 90.0),  # polar cap
        (170.0, -20.0, -170.0, 20.0),  # antimeridian (wrapped)
        (88.0, 85.0, 92.0, 89.0),  # near-pole face corner
    ],
)
def test_s2_range_lookup_matches_plain_filter(spark, s2_layout, bbox):
    from geowave_spark.sources import indexed
    from geowave_spark import sqlcells
    from pyspark.sql import functions as F

    out = indexed.s2_range_lookup(spark, s2_layout, bbox)
    plain = spark.read.parquet(s2_layout).filter(
        sqlcells.bbox_refine_pred(F.col("lon"), F.col("lat"), bbox)
    )
    got = sorted(r["event_id"] for r in out.select("event_id").collect())
    want = sorted(r["event_id"] for r in plain.select("event_id").collect())
    assert got == want
    # loose (no refine) is a superset — recall-exact cover
    loose = indexed.s2_range_lookup(spark, s2_layout, bbox, loose=True)
    loose_ids = set(r["event_id"] for r in loose.select("event_id").collect())
    assert set(want) <= loose_ids


def test_s2_layout_pushes_ranges(spark, s2_layout):
    """S2 cell-id ranges reach the parquet scan as PushedFilters."""
    from geowave_spark.sources import indexed

    out = indexed.s2_range_lookup(spark, s2_layout, (-30.0, 10.0, 45.0, 55.0))
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        full = out._jdf.queryExecution().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "PushedFilters: [" in full
    pushed = full.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "s2" in pushed, f"s2 ranges not pushed: {pushed[:200]}"


def test_s2_ingest_is_pure_column(spark):
    """The S2 ingest path adds no Python eval stage (vs the pandas-UDF
    Hilbert layout) — the id is JVM Column algebra end to end."""
    from geowave_spark import entry_queries as eq, cells_s2

    ev = eq._events(spark, "/root/testdata/sf0.001")
    out = cells_s2.add_s2_cell_column(ev, level=14, out="s2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_rect_query_ranges_exact_cells():
    """The shared grid-rectangle decomposition covers exactly the rectangle
    when unbudgeted."""
    tier = 5
    got = hilbert.rect_query_ranges(3, 11, 2, 9, tier, max_ranges=None)
    n = 1 << tier
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert.xy2d(i.ravel().astype(np.int64), j.ravel().astype(np.int64), tier)
    inside = (
        (i.ravel() >= 3) & (i.ravel() <= 11) & (j.ravel() >= 2) & (j.ravel() <= 9)
    )
    want = set(d[inside].tolist())
    covered = set()
    for lo, hi in got:
        covered |= set(range(lo, hi + 1))
    assert covered == want


def test_query_ranges_budget_contract():
    """max_ranges is a hard contract, including the two cases that used to
    overshoot: antimeridian-wrapped boxes (each half consumed the full
    budget) and tiny budgets below the per-rect floor.  Consolidation must
    keep recall (ranges only grow), checked against the unbudgeted set."""
    wrapped = (100.0, 10.0, -150.0, 40.0)
    tight = cells_s2.query_ranges(wrapped, level=12, max_ranges=64)
    assert len(tight) <= 64
    loose = cells_s2.query_ranges(wrapped, level=12, max_ranges=100000)
    # every unbudgeted range is contained in some budgeted range
    for lo, hi in loose:
        assert any(a <= lo and hi <= b for a, b in tight)
    for mr in (4, 8, 16):
        r = cells_s2.query_ranges((-10.0, -10.0, 10.0, 10.0), level=12, max_ranges=mr)
        assert len(r) <= mr
