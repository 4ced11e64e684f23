"""CRS reprojection (custom-CRS step 2): Web Mercator + UTM from the
public Snyder (USGS PP 1395) formulas.

Verification strategy (no proj library in this container): anchor values
that are exact by construction, independent numerical integration of the
meridian arc, analytic scale-factor checks, forward/inverse round-trips,
and bit-level parity between the numpy and Column backends (same generic
formula, two ops namespaces)."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import crs


def test_web_mercator_anchors():
    x, y = crs.web_mercator_np([0.0, 180.0, -180.0], [0.0, 0.0, 0.0])
    assert x[0] == 0.0 and y[0] == 0.0
    assert x[1] == pytest.approx(20037508.342789244, abs=1e-6)
    assert x[2] == pytest.approx(-20037508.342789244, abs=1e-6)
    # the standard web-map latitude cutoff maps to y == x_max (square world)
    _, ytop = crs.web_mercator_np([0.0], [85.05112877980659])
    assert ytop[0] == pytest.approx(20037508.342789244, abs=1e-5)


def test_web_mercator_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.9, 179.9, 4096)
    lat = rng.uniform(-85.0, 85.0, 4096)
    x, y = crs.web_mercator_np(lon, lat)
    lon2, lat2 = crs.web_mercator_inverse_np(x, y)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def _meridian_arc_numeric(phi: float, n: int = 200_001) -> float:
    """Independent M(phi): numerically integrate the meridian radius of
    curvature a(1-e2)/(1-e2 sin^2 t)^{3/2} from 0 to phi (Simpson)."""
    t = np.linspace(0.0, phi, n)
    integrand = crs.WGS84_A * (1.0 - crs.WGS84_E2) / (1.0 - crs.WGS84_E2 * np.sin(t) ** 2) ** 1.5
    h = t[1] - t[0]
    w = np.ones(n)
    w[1:-1:2], w[2:-1:2] = 4.0, 2.0
    return float(np.sum(w * integrand) * h / 3.0)


def test_meridian_arc_series_vs_integration():
    for deg in (10.0, 33.0, 45.0, 60.0, 80.0):
        phi = math.radians(deg)
        series = float(crs._meridian_arc(crs._NpOps, np.array([phi]))[0])
        numeric = _meridian_arc_numeric(phi)
        assert series == pytest.approx(numeric, abs=2e-3)  # mm-level


def test_utm_anchors():
    # central meridian -> easting exactly 500 km; equator -> northing 0
    x, y = crs.utm_np([utm_cm := crs.utm_central_meridian(33)], [0.0], zone=33)
    assert x[0] == pytest.approx(500_000.0, abs=1e-9)
    assert y[0] == pytest.approx(0.0, abs=1e-9)
    # on the CM, northing = k0 * M(phi)
    x, y = crs.utm_np([utm_cm], [45.0], zone=33)
    assert x[0] == pytest.approx(500_000.0, abs=1e-6)
    assert y[0] == pytest.approx(crs.UTM_K0 * _meridian_arc_numeric(math.radians(45.0)), abs=5e-3)
    # southern twin differs by exactly the false northing at mirrored lat
    xn, yn = crs.utm_np([utm_cm + 1.0], [-30.0], zone=33, south=False)
    xs, ys = crs.utm_np([utm_cm + 1.0], [-30.0], zone=33, south=True)
    assert xs[0] == xn[0]
    assert ys[0] - yn[0] == pytest.approx(10_000_000.0, abs=1e-9)


def test_utm_scale_factor_at_cm():
    # dE/dlambda at the CM = k0 * N * cos(phi) (TM defining property)
    zone, lat = 31, 52.0
    cm = crs.utm_central_meridian(zone)
    eps = 1e-7
    x1, _ = crs.utm_np([cm - eps], [lat], zone)
    x2, _ = crs.utm_np([cm + eps], [lat], zone)
    deriv = (x2[0] - x1[0]) / math.radians(2 * eps)
    phi = math.radians(lat)
    n_r = crs.WGS84_A / math.sqrt(1.0 - crs.WGS84_E2 * math.sin(phi) ** 2)
    assert deriv == pytest.approx(crs.UTM_K0 * n_r * math.cos(phi), rel=1e-9)


def test_utm_roundtrip_within_zone():
    rng = np.random.default_rng(11)
    zone = 17
    cm = crs.utm_central_meridian(zone)
    lon = rng.uniform(cm - 3.0, cm + 3.0, 4096)
    lat = rng.uniform(0.5, 84.0, 4096)
    x, y = crs.utm_np(lon, lat, zone)
    lon2, lat2 = crs.utm_inverse_np(x, y, zone)
    # ~1e-8 deg = ~1 mm: the truncation level of the Snyder series
    assert np.max(np.abs(lon2 - lon)) < 3e-8
    assert np.max(np.abs(lat2 - lat)) < 3e-8
    # southern hemisphere zone
    lat_s = rng.uniform(-79.0, -0.5, 4096)
    xs, ys = crs.utm_np(lon, lat_s, zone, south=True)
    lon3, lat3 = crs.utm_inverse_np(xs, ys, zone, south=True)
    assert np.max(np.abs(lon3 - lon)) < 3e-8
    assert np.max(np.abs(lat3 - lat_s)) < 3e-8
    assert (xs > crs.UTM_NORTH_BOUNDS[0]).all() and (xs < crs.UTM_NORTH_BOUNDS[2]).all()


def test_utm_zone_helpers():
    assert crs.utm_zone(-180.0) == 1
    assert crs.utm_zone(179.999) == 60
    assert crs.utm_zone(3.0) == 31  # zone 31: [0, 6)
    assert crs.utm_central_meridian(31) == 3.0
    assert crs.crs_index_bounds("EPSG:4326") is None
    assert crs.crs_index_bounds("EPSG:3857") == crs.WEB_MERCATOR_BOUNDS
    assert crs.crs_index_bounds("EPSG:32617") == crs.UTM_NORTH_BOUNDS
    assert crs.crs_index_bounds("EPSG:32717") == crs.UTM_SOUTH_BOUNDS
    # r5: Lambert-93 is now a registered conic code with derived bounds
    b = crs.crs_index_bounds("EPSG:2154")
    assert len(b) == 4 and b[0] < b[2] and b[1] < b[3]
    with pytest.raises(ValueError):
        crs.crs_index_bounds("EPSG:26917")  # NAD83 UTM: still unsupported, loud


def test_column_twin_matches_numpy(spark):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    lon = rng.uniform(-84.0, -78.1, 512)  # zone 17
    lat = rng.uniform(-80.0, 84.0, 512)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    mx, my = crs.web_mercator_cols(F.col("lon"), F.col("lat"))
    ux, uy = crs.utm_cols(F.col("lon"), F.col("lat"), zone=17)
    rows = df.select(mx.alias("mx"), my.alias("my"), ux.alias("ux"), uy.alias("uy"),
                     "lon", "lat").collect()
    got = np.array([[r["mx"], r["my"], r["ux"], r["uy"]] for r in rows])
    order = np.lexsort((lat, lon))
    got = got[np.lexsort((got_lat := np.array([r["lat"] for r in rows]),
                          np.array([r["lon"] for r in rows])))]
    emx, emy = crs.web_mercator_np(lon[order], lat[order])
    eux, euy = crs.utm_np(lon[order], lat[order], zone=17)
    # identical formula tree on both backends: agree to float64 noise
    assert np.max(np.abs(got[:, 0] - emx)) < 1e-6
    assert np.max(np.abs(got[:, 1] - emy)) < 1e-6
    assert np.max(np.abs(got[:, 2] - eux)) < 1e-6
    assert np.max(np.abs(got[:, 3] - euy)) < 1e-6
    # inverse Columns round-trip inside Spark too
    lon2, lat2 = crs.utm_inverse_cols(F.col("x"), F.col("y"), zone=17)
    rt = (
        spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(eux, euy)], "x double, y double"
        )
        .select(lon2.alias("lon"), lat2.alias("lat"))
        .collect()
    )
    assert np.max(np.abs(np.array([r["lon"] for r in rt]) - lon[order])) < 3e-8
    # pure-JVM contract: no Python eval in the projected plan
    proj = df.select(mx.alias("x"), my.alias("y"))
    assert "EvalPython" not in proj._jdf.queryExecution().executedPlan().toString()


def test_reproject_wkt():
    w = "POLYGON ((0 0, 6 0, 6 45, 0 45, 0 0))"
    out = crs.reproject_wkt(w, "EPSG:3857")
    assert out.startswith("POLYGON ((0.0 0.0, ")
    x6, _ = crs.web_mercator_np([6.0], [45.0])
    assert f"{float(x6[0])!r}" in out
    assert crs.reproject_wkt(w, "EPSG:4326") == w


def test_utm_frame_tiered_join_matches_brute(spark):
    """The full custom-CRS workflow the reference's CustomCRS* ITs cover:
    reproject (step 2) -> custom-bounds index (step 1) -> flagship tiered
    join, verified against brute force computed in the projected frame."""
    from pyspark.sql import functions as F

    from geowave_spark.geom import box_wkt
    from geowave_spark.operators import spatial_join

    code = "EPSG:32617"  # UTM 17N
    rng = np.random.default_rng(23)
    lon = rng.uniform(-84.0, -78.0, 3000)
    lat = rng.uniform(0.5, 70.0, 3000)
    pts = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "event_id long, lon double, lat double",
    )
    pts = crs.reproject(pts, code, x_out="px", y_out="py").select(
        "event_id", F.col("px").alias("lon"), F.col("py").alias("lat")
    )
    # polygon side: lon/lat boxes -> projected-frame boxes via the projected
    # CORNERS (a box in lon/lat is not a box in UTM; the oracle uses the
    # same projected-box definition, so the comparison is exact)
    zones = [
        ("z_a", -83.5, 5.0, -80.0, 30.0),
        ("z_b", -81.0, 25.0, -78.2, 69.0),
        ("z_c", -84.0, 0.5, -78.0, 70.0),
    ]
    px, py = crs.forward_np(code, [z[1] for z in zones] + [z[3] for z in zones],
                            [z[2] for z in zones] + [z[4] for z in zones])
    boxes = [
        (zones[i][0], min(px[i], px[i + 3]), min(py[i], py[i + 3]),
         max(px[i], px[i + 3]), max(py[i], py[i + 3]))
        for i in range(3)
    ]
    polys = spark.createDataFrame(
        [(pid, box_wkt(x0, y0, x1, y1)) for pid, x0, y0, x1, y1 in boxes],
        ["polygon_id", "wkt"],
    )
    got = {
        (r.event_id, r.polygon_id)
        for r in spatial_join.tiered_spatial_join(
            pts, polys, point_id="event_id", bounds=crs.crs_index_bounds(code)
        ).collect()
    }
    ex, ey = crs.forward_np(code, lon, lat)
    want = {
        (i, pid)
        for i in range(len(lon))
        for pid, x0, y0, x1, y1 in boxes
        if x0 <= ex[i] <= x1 and y0 <= ey[i] <= y1
    }
    assert got == want and len(want) > 3000


def test_crs_indexed_store_roundtrip(spark, tmp_path):
    """write_indexed_crs -> range_lookup_crs: projected-frame layout with
    pushed cell ranges, verified against a numpy brute force."""
    from pyspark.sql import functions as F

    from geowave_spark.sources import indexed

    code = "EPSG:3857"
    rng = np.random.default_rng(41)
    lon = rng.uniform(-170.0, 170.0, 5000)
    lat = rng.uniform(-80.0, 80.0, 5000)
    df = spark.createDataFrame(
        [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
        "event_id long, lon double, lat double",
    )
    path = str(tmp_path / "merc_store")
    indexed.write_indexed_crs(df, path, code, n_files=8)

    # query box in projected metres (central Europe-ish)
    qx0, qy0 = crs.web_mercator_np([-10.0], [35.0])
    qx1, qy1 = crs.web_mercator_np([30.0], [60.0])
    bbox = (float(qx0[0]), float(qy0[0]), float(qx1[0]), float(qy1[0]))
    out = indexed.range_lookup_crs(spark, path, bbox, code)
    got = {r["event_id"] for r in out.collect()}

    ex, ey = crs.web_mercator_np(lon, lat)
    want = {
        i for i in range(len(lon))
        if bbox[0] <= ex[i] <= bbox[2] and bbox[1] <= ey[i] <= bbox[3]
    }
    assert got == want and len(want) > 50
    # cell ranges reach the parquet scan as PushedFilters
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "cell" in plan.split("PushedFilters: [", 1)[1][:400]


def test_web_mercator_pole_clamp():
    """r5: pole-exact inputs clamp to the EPSG:3857 square-domain edge
    (y = ±a·π) instead of producing ±inf / NULL — a lat = -90 row first
    appeared in the sf10 fixture and crashed the DuckDB oracle."""
    x, y = crs.web_mercator_np([0.0, 10.0, -20.0], [-90.0, 90.0, 85.06])
    assert np.all(np.isfinite(y))
    assert abs(y[0] + crs.WEB_MERCATOR_MAX) < 1e-6
    assert abs(y[1] - crs.WEB_MERCATOR_MAX) < 1e-6
    # inside the domain nothing changes
    x2, y2 = crs.web_mercator_np([3.0], [45.0])
    assert abs(float(y2[0]) - 5621521.486192066) < 1e-3
