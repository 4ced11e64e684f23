"""Coordinate reference systems (custom-CRS step 2: reprojection).

The reference parametrizes the spatial index over any EPSG code
(SpatialDimensionalityTypeProvider.java:107-124 ``crsCode``/``decodeCRS``;
CustomCRSBoundedSpatialDimension bounds come from the CRS domain of
validity) and reprojects geometry via GeoTools.  Here the projected
families a migrating user actually hits — Web Mercator (EPSG:3857), the
UTM grid (EPSG:326zz / 327zz), and since r5 the conic/azimuthal
workhorses Lambert Conformal Conic, Albers Equal-Area and Lambert
Azimuthal Equal-Area with an EPSG parameter registry (Lambert-93, Canada
Atlas, Conus/California/Australian Albers, LAEA Europe EPSG:3035) — are
implemented from the public formulas (spherical Mercator, and the
Transverse Mercator / LCC / AEA series of Snyder, USGS Professional
Paper 1395, eqs 3-21, 7-1/7-4, 8-9..8-25, 14-1..14-21, 15-1..15-11 —
public domain) so that:

- the forward/inverse transforms are ONE Column expression each (pure JVM,
  whole-stage codegen, no Python in the loop at 100 TB scan width), and
- the identical formula text runs on numpy arrays for tests / the WKT
  geometry path, via a shared generic implementation (`_tm_forward` etc.
  take an ops namespace; ``+ - * /`` overload on both Columns and arrays).

The projected frame then feeds the step-1 custom-bounds index math
(cells.py / sqlcells.py ``bounds=``): `crs_index_bounds(code)` returns the
clamped per-dimension index bounds for the code, mirroring how the
reference derives dimension bounds from the CRS envelope.
"""

from __future__ import annotations

import math
import re

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# WGS84 ellipsoid (public EPSG:7030 definition) and TM grid constants.
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_EP2 = WGS84_E2 / (1.0 - WGS84_E2)
UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500_000.0
UTM_FALSE_NORTHING_SOUTH = 10_000_000.0

#: EPSG:3857 projected extent (± a·π).
WEB_MERCATOR_MAX = math.pi * WGS84_A  # 20037508.342789244
#: EPSG:3857 latitude of validity (square domain): y(±this) = ±a·π.
#: Projecting a pole would be ln(tan(0)) = -inf (DuckDB errors, Spark
#: nulls) — the web-map convention clamps instead (r5 fix, found by a
#: lat = -90 row first appearing at sf10).
WEB_MERCATOR_MAX_LAT = math.degrees(2.0 * math.atan(math.exp(math.pi)) - math.pi / 2.0)
WEB_MERCATOR_BOUNDS = (
    -WEB_MERCATOR_MAX,
    -WEB_MERCATOR_MAX,
    WEB_MERCATOR_MAX,
    WEB_MERCATOR_MAX,
)

# UTM domain-of-validity covering boxes (EPSG area of use: 6° lon slice,
# 0..84°N / 80°S..0; easting stays within ~[166km, 834km], northing within
# [0, 9.33e6] north / [1.12e6, 1e7] south).  The index only needs a box
# that COVERS the domain — clamped linear normalization (step 1) does the
# rest — but a tight box preserves cell resolution.
UTM_NORTH_BOUNDS = (100_000.0, 0.0, 900_000.0, 9_500_000.0)
UTM_SOUTH_BOUNDS = (100_000.0, 1_000_000.0, 900_000.0, 10_000_000.0)

# Meridian-arc series coefficients (Snyder eq 3-21).
_M0 = 1.0 - WGS84_E2 / 4.0 - 3.0 * WGS84_E2**2 / 64.0 - 5.0 * WGS84_E2**3 / 256.0
_M1 = 3.0 * WGS84_E2 / 8.0 + 3.0 * WGS84_E2**2 / 32.0 + 45.0 * WGS84_E2**3 / 1024.0
_M2 = 15.0 * WGS84_E2**2 / 256.0 + 45.0 * WGS84_E2**3 / 1024.0
_M3 = 35.0 * WGS84_E2**3 / 3072.0

# Footpoint-latitude series coefficients (Snyder eqs 3-24/3-26).
_E1 = (1.0 - math.sqrt(1.0 - WGS84_E2)) / (1.0 + math.sqrt(1.0 - WGS84_E2))
_F1 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_F2 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_F3 = 151.0 * _E1**3 / 96.0
_F4 = 1097.0 * _E1**4 / 512.0


class _NpOps:
    least = staticmethod(np.minimum)
    greatest = staticmethod(np.maximum)
    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    sqrt = staticmethod(np.sqrt)
    log = staticmethod(np.log)
    exp = staticmethod(np.exp)
    atan = staticmethod(np.arctan)
    atan2 = staticmethod(np.arctan2)
    asin = staticmethod(np.arcsin)
    pow = staticmethod(np.power)

    @staticmethod
    def lit(v):
        return v


class _ColOps:
    least = staticmethod(F.least)
    greatest = staticmethod(F.greatest)
    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    tan = staticmethod(F.tan)
    sqrt = staticmethod(F.sqrt)
    log = staticmethod(F.log)
    exp = staticmethod(F.exp)
    atan = staticmethod(F.atan)
    atan2 = staticmethod(F.atan2)
    asin = staticmethod(F.asin)
    pow = staticmethod(F.pow)

    @staticmethod
    def lit(v):
        return F.lit(float(v))


# ---------------------------------------------------------------------------
# Web Mercator (EPSG:3857) — spherical formulas on the WGS84 major axis
# (the published EPSG:3857 "popular visualisation" convention).


def _merc_forward(ops, lon_deg, lat_deg):
    rad = math.pi / 180.0
    x = lon_deg * ops.lit(WGS84_A * rad)
    # standard web-map domain clamp (|lat| <= ~85.0511): the poles are
    # outside 3857's validity and ln(tan(0)) is -inf
    lat_c = ops.greatest(
        ops.least(lat_deg, ops.lit(WEB_MERCATOR_MAX_LAT)),
        ops.lit(-WEB_MERCATOR_MAX_LAT),
    )
    phi = lat_c * ops.lit(rad)
    y = ops.log(ops.tan(phi * ops.lit(0.5) + ops.lit(math.pi / 4.0))) * ops.lit(WGS84_A)
    return x, y


def _merc_inverse(ops, x, y):
    deg = 180.0 / math.pi
    lon = x * ops.lit(deg / WGS84_A)
    lat = (ops.atan(ops.exp(y * ops.lit(1.0 / WGS84_A))) * ops.lit(2.0) - ops.lit(math.pi / 2.0)) * ops.lit(deg)
    return lon, lat


def web_mercator_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """EPSG:4326 → EPSG:3857 as two Column expressions (codegen-resident)."""
    return _merc_forward(_ColOps, lon, lat)


def web_mercator_inverse_cols(x: Column, y: Column) -> tuple[Column, Column]:
    return _merc_inverse(_ColOps, x, y)


def web_mercator_np(lon, lat):
    return _merc_forward(_NpOps, np.asarray(lon, np.float64), np.asarray(lat, np.float64))


def web_mercator_inverse_np(x, y):
    return _merc_inverse(_NpOps, np.asarray(x, np.float64), np.asarray(y, np.float64))


# ---------------------------------------------------------------------------
# Transverse Mercator / UTM (Snyder series; mm-level within a zone).


def _meridian_arc(ops, phi):
    """M(φ): distance along the meridian from the equator (Snyder 3-21)."""
    return (
        phi * ops.lit(_M0)
        - ops.sin(phi * ops.lit(2.0)) * ops.lit(_M1)
        + ops.sin(phi * ops.lit(4.0)) * ops.lit(_M2)
        - ops.sin(phi * ops.lit(6.0)) * ops.lit(_M3)
    ) * ops.lit(WGS84_A)


def _tm_forward(ops, lat_deg, lon_deg, lon0_deg: float, south: bool):
    rad = math.pi / 180.0
    phi = lat_deg * ops.lit(rad)
    sin_p, cos_p, tan_p = ops.sin(phi), ops.cos(phi), ops.tan(phi)
    n = ops.lit(WGS84_A) / ops.sqrt(ops.lit(1.0) - sin_p * sin_p * ops.lit(WGS84_E2))
    t = tan_p * tan_p
    c = cos_p * cos_p * ops.lit(WGS84_EP2)
    a1 = (lon_deg - ops.lit(lon0_deg)) * ops.lit(rad) * cos_p
    a2 = a1 * a1
    m = _meridian_arc(ops, phi)
    # Snyder 8-9 / 8-10 (lat0 = 0 → M0 = 0)
    x = ops.lit(UTM_FALSE_EASTING) + ops.lit(UTM_K0) * n * a1 * (
        ops.lit(1.0)
        + a2 * (
            (ops.lit(1.0) - t + c) * ops.lit(1.0 / 6.0)
            + a2
            * (ops.lit(5.0) - t * ops.lit(18.0) + t * t + c * ops.lit(72.0) - ops.lit(58.0 * WGS84_EP2))
            * ops.lit(1.0 / 120.0)
        )
    )
    y = ops.lit(UTM_K0) * (
        m
        + n
        * tan_p
        * a2
        * (
            ops.lit(0.5)
            + a2 * (
                (ops.lit(5.0) - t + c * (ops.lit(9.0) + c * ops.lit(4.0))) * ops.lit(1.0 / 24.0)
                + a2
                * (
                    ops.lit(61.0)
                    - t * ops.lit(58.0)
                    + t * t
                    + c * ops.lit(600.0)
                    - ops.lit(330.0 * WGS84_EP2)
                )
                * ops.lit(1.0 / 720.0)
            )
        )
    )
    if south:
        y = y + ops.lit(UTM_FALSE_NORTHING_SOUTH)
    return x, y


def _tm_inverse(ops, x, y, lon0_deg: float, south: bool):
    deg = 180.0 / math.pi
    if south:
        y = y - ops.lit(UTM_FALSE_NORTHING_SOUTH)
    m = y * ops.lit(1.0 / UTM_K0)
    mu = m * ops.lit(1.0 / (WGS84_A * _M0))
    # footpoint latitude (Snyder 3-26)
    phi1 = (
        mu
        + ops.sin(mu * ops.lit(2.0)) * ops.lit(_F1)
        + ops.sin(mu * ops.lit(4.0)) * ops.lit(_F2)
        + ops.sin(mu * ops.lit(6.0)) * ops.lit(_F3)
        + ops.sin(mu * ops.lit(8.0)) * ops.lit(_F4)
    )
    sin1, cos1, tan1 = ops.sin(phi1), ops.cos(phi1), ops.tan(phi1)
    c1 = cos1 * cos1 * ops.lit(WGS84_EP2)
    t1 = tan1 * tan1
    w = ops.lit(1.0) - sin1 * sin1 * ops.lit(WGS84_E2)
    n1 = ops.lit(WGS84_A) / ops.sqrt(w)
    r1 = ops.lit(WGS84_A * (1.0 - WGS84_E2)) / (w * ops.sqrt(w))
    d = (x - ops.lit(UTM_FALSE_EASTING)) / (n1 * ops.lit(UTM_K0))
    d2 = d * d
    # Snyder 8-17 / 8-18
    phi = phi1 - (n1 * tan1 / r1) * d2 * (
        ops.lit(0.5)
        - d2 * (
            (
                ops.lit(5.0)
                + t1 * ops.lit(3.0)
                + c1 * ops.lit(10.0)
                - c1 * c1 * ops.lit(4.0)
                - ops.lit(9.0 * WGS84_EP2)
            )
            * ops.lit(1.0 / 24.0)
            - d2
            * (
                ops.lit(61.0)
                + t1 * ops.lit(90.0)
                + c1 * ops.lit(298.0)
                + t1 * t1 * ops.lit(45.0)
                - ops.lit(252.0 * WGS84_EP2)
                - c1 * c1 * ops.lit(3.0)
            )
            * ops.lit(1.0 / 720.0)
        )
    )
    lam = d * (
        ops.lit(1.0)
        - d2 * (
            (ops.lit(1.0) + t1 * ops.lit(2.0) + c1) * ops.lit(1.0 / 6.0)
            - d2
            * (
                ops.lit(5.0)
                - c1 * ops.lit(2.0)
                + t1 * ops.lit(28.0)
                - c1 * c1 * ops.lit(3.0)
                + ops.lit(8.0 * WGS84_EP2)
                + t1 * t1 * ops.lit(24.0)
            )
            * ops.lit(1.0 / 120.0)
        )
    ) / cos1
    return ops.lit(lon0_deg) + lam * ops.lit(deg), phi * ops.lit(deg)


def utm_zone(lon: float) -> int:
    """UTM zone number for a longitude (1..60; zone 1 = [-180, -174))."""
    return int(math.floor((lon + 180.0) / 6.0)) % 60 + 1


def utm_central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


def utm_cols(lon: Column, lat: Column, zone: int, south: bool = False) -> tuple[Column, Column]:
    """EPSG:4326 → UTM zone (EPSG:326zz north / 327zz south) Columns."""
    return _tm_forward(_ColOps, lat, lon, utm_central_meridian(zone), south)


def utm_inverse_cols(x: Column, y: Column, zone: int, south: bool = False) -> tuple[Column, Column]:
    return _tm_inverse(_ColOps, x, y, utm_central_meridian(zone), south)


def utm_np(lon, lat, zone: int, south: bool = False):
    return _tm_forward(
        _NpOps, np.asarray(lat, np.float64), np.asarray(lon, np.float64),
        utm_central_meridian(zone), south,
    )


def utm_inverse_np(x, y, zone: int, south: bool = False):
    return _tm_inverse(
        _NpOps, np.asarray(x, np.float64), np.asarray(y, np.float64),
        utm_central_meridian(zone), south,
    )


# ---------------------------------------------------------------------------
# Conic families (custom-CRS step 3): Lambert Conformal Conic (2SP) and
# Albers Equal-Area, from Snyder USGS PP 1395 (public domain) — the same
# ops-generic design as TM, so each transform is ONE Column expression
# (codegen, no Python) with a bit-identical numpy twin.  Inverse latitude
# uses the DIRECT series (conformal-latitude Snyder eq 3-5 for LCC,
# authalic-latitude eq 3-18 for AEA) instead of fixed-point iteration:
# an iterated Column would duplicate its argument subtree exponentially
# (the 64KB-codegen trap r4 fixed in the extent joins).

_RAD = math.pi / 180.0
_DEG = 180.0 / math.pi

#: GRS80 ellipsoid (EPSG:7019) — the datum of the registered conic codes
#: (NAD83 / ETRS89-RGF93 / GDA94 share it; a differs from WGS84 by 0).
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)

#: Clarke 1866 (EPSG:7008) — the NAD27 datum ellipsoid (defined by a, b).
CLARKE1866_A = 6378206.4
CLARKE1866_B = 6356583.8
CLARKE1866_E2 = 1.0 - (CLARKE1866_B / CLARKE1866_A) ** 2


def _m_of(e2: float, phi: float) -> float:
    return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)


def _t_of(e2: float, phi: float) -> float:
    e = math.sqrt(e2)
    s = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
    )


def _q_of(e2: float, phi: float) -> float:
    e = math.sqrt(e2)
    s = math.sin(phi)
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s) - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
    )


def lcc_consts(a: float, e2: float, lat0: float, lon0: float,
               lat1: float, lat2: float, fe: float, fn: float) -> dict:
    """Driver-side constants for a 2SP Lambert Conformal Conic (Snyder
    eqs 15-1..15-11 + the 3-5 conformal-latitude series coefficients)."""
    p0, p1, p2 = lat0 * _RAD, lat1 * _RAD, lat2 * _RAD
    m1, m2 = _m_of(e2, p1), _m_of(e2, p2)
    t0, t1, t2 = _t_of(e2, p0), _t_of(e2, p1), _t_of(e2, p2)
    n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2)) if lat1 != lat2 else math.sin(p1)
    big_f = m1 / (n * t1**n)
    rho0 = a * big_f * t0**n
    e4, e6, e8 = e2 * e2, e2 * e2 * e2, e2 * e2 * e2 * e2
    return {
        "a": a, "e2": e2, "e": math.sqrt(e2), "lon0": lon0,
        "n": n, "F": big_f, "rho0": rho0, "fe": fe, "fn": fn,
        "sgn": 1.0 if n >= 0 else -1.0,
        # Snyder eq 3-5: chi -> phi series
        "c2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "c4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "c6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "c8": 4279.0 * e8 / 161280.0,
    }


def _lcc_forward(ops, lon_deg, lat_deg, c: dict):
    phi = lat_deg * ops.lit(_RAD)
    s = ops.sin(phi) * ops.lit(c["e"])
    t = ops.tan(ops.lit(math.pi / 4.0) - phi * ops.lit(0.5)) / ops.pow(
        (ops.lit(1.0) - s) / (ops.lit(1.0) + s), ops.lit(c["e"] / 2.0)
    )
    rho = ops.pow(t, ops.lit(c["n"])) * ops.lit(c["a"] * c["F"])
    th = (lon_deg - ops.lit(c["lon0"])) * ops.lit(_RAD * c["n"])
    x = rho * ops.sin(th) + ops.lit(c["fe"])
    y = ops.lit(c["rho0"] + c["fn"]) - rho * ops.cos(th)
    return x, y


def _lcc_inverse(ops, x, y, c: dict):
    xp = (x - ops.lit(c["fe"])) * ops.lit(c["sgn"])
    yp = (ops.lit(c["rho0"]) - (y - ops.lit(c["fn"]))) * ops.lit(c["sgn"])
    rho = ops.sqrt(xp * xp + yp * yp)
    th = ops.atan2(xp, yp)
    lon = th * ops.lit(_DEG / c["n"]) + ops.lit(c["lon0"])
    t = ops.pow(rho * ops.lit(c["sgn"] / (c["a"] * c["F"])), ops.lit(1.0 / c["n"]))
    chi = ops.lit(math.pi / 2.0) - ops.atan(t) * ops.lit(2.0)
    phi = (
        chi
        + ops.sin(chi * ops.lit(2.0)) * ops.lit(c["c2"])
        + ops.sin(chi * ops.lit(4.0)) * ops.lit(c["c4"])
        + ops.sin(chi * ops.lit(6.0)) * ops.lit(c["c6"])
        + ops.sin(chi * ops.lit(8.0)) * ops.lit(c["c8"])
    )
    return lon, phi * ops.lit(_DEG)


def aea_consts(a: float, e2: float, lat0: float, lon0: float,
               lat1: float, lat2: float, fe: float, fn: float) -> dict:
    """Driver-side constants for a 2SP Albers Equal-Area conic (Snyder
    eqs 14-1..14-21 + the 3-18 authalic-latitude series)."""
    p0, p1, p2 = lat0 * _RAD, lat1 * _RAD, lat2 * _RAD
    m1, m2 = _m_of(e2, p1), _m_of(e2, p2)
    q0, q1, q2 = _q_of(e2, p0), _q_of(e2, p1), _q_of(e2, p2)
    n = (m1 * m1 - m2 * m2) / (q2 - q1) if lat1 != lat2 else math.sin(p1)
    big_c = m1 * m1 + n * q1
    rho0 = a * math.sqrt(big_c - n * q0) / n
    qp = _q_of(e2, math.pi / 2.0)  # authalic normalizer
    e4, e6 = e2 * e2, e2 * e2 * e2
    return {
        "a": a, "e2": e2, "e": math.sqrt(e2), "lon0": lon0,
        "n": n, "C": big_c, "rho0": rho0, "qp": qp, "fe": fe, "fn": fn,
        "sgn": 1.0 if n >= 0 else -1.0,
        # Snyder eq 3-18: beta -> phi series
        "b2": e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        "b4": 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        "b6": 761.0 * e6 / 45360.0,
    }


def _aea_q(ops, phi, c: dict):
    s = ops.sin(phi)
    es = s * ops.lit(c["e"])
    return (
        s / (ops.lit(1.0) - s * s * ops.lit(c["e2"]))
        - ops.log((ops.lit(1.0) - es) / (ops.lit(1.0) + es)) * ops.lit(1.0 / (2.0 * c["e"]))
    ) * ops.lit(1.0 - c["e2"])


def _aea_forward(ops, lon_deg, lat_deg, c: dict):
    phi = lat_deg * ops.lit(_RAD)
    q = _aea_q(ops, phi, c)
    rho = ops.sqrt(ops.lit(c["C"]) - q * ops.lit(c["n"])) * ops.lit(c["a"] / c["n"])
    th = (lon_deg - ops.lit(c["lon0"])) * ops.lit(_RAD * c["n"])
    x = rho * ops.sin(th) + ops.lit(c["fe"])
    y = ops.lit(c["rho0"] + c["fn"]) - rho * ops.cos(th)
    return x, y


def _aea_inverse(ops, x, y, c: dict):
    xp = (x - ops.lit(c["fe"])) * ops.lit(c["sgn"])
    yp = (ops.lit(c["rho0"]) - (y - ops.lit(c["fn"]))) * ops.lit(c["sgn"])
    rho = ops.sqrt(xp * xp + yp * yp)
    th = ops.atan2(xp, yp)
    lon = th * ops.lit(_DEG / c["n"]) + ops.lit(c["lon0"])
    q = (ops.lit(c["C"]) - rho * rho * ops.lit(c["n"] * c["n"] / (c["a"] * c["a"]))) * ops.lit(
        1.0 / c["n"]
    )
    beta = ops.asin(q * ops.lit(1.0 / c["qp"]))
    phi = (
        beta
        + ops.sin(beta * ops.lit(2.0)) * ops.lit(c["b2"])
        + ops.sin(beta * ops.lit(4.0)) * ops.lit(c["b4"])
        + ops.sin(beta * ops.lit(6.0)) * ops.lit(c["b6"])
    )
    return lon, phi * ops.lit(_DEG)


def laea_consts(a: float, e2: float, lat0: float, lon0: float,
                fe: float, fn: float) -> dict:
    """Driver-side constants for the oblique Lambert Azimuthal Equal-Area
    (Snyder eqs 24-2..24-16 ellipsoidal + the 3-18 authalic series) —
    EPSG:3035's projection method."""
    p0 = lat0 * _RAD
    qp = _q_of(e2, math.pi / 2.0)
    q1 = _q_of(e2, p0)
    beta1 = math.asin(q1 / qp)
    rq = a * math.sqrt(qp / 2.0)
    m1 = _m_of(e2, p0)
    d = a * m1 / (rq * math.cos(beta1))
    e4, e6 = e2 * e2, e2 * e2 * e2
    return {
        "a": a, "e2": e2, "e": math.sqrt(e2), "lon0": lon0, "lat0": lat0,
        "qp": qp, "rq": rq, "D": d,
        "sb1": math.sin(beta1), "cb1": math.cos(beta1),
        "fe": fe, "fn": fn,
        "b2": e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        "b4": 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        "b6": 761.0 * e6 / 45360.0,
    }


def _laea_forward(ops, lon_deg, lat_deg, c: dict):
    phi = lat_deg * ops.lit(_RAD)
    q = _aea_q(ops, phi, c)
    beta = ops.asin(q * ops.lit(1.0 / c["qp"]))
    sb, cb = ops.sin(beta), ops.cos(beta)
    dl = (lon_deg - ops.lit(c["lon0"])) * ops.lit(_RAD)
    cdl = ops.cos(dl)
    b = ops.lit(c["rq"]) * ops.sqrt(
        ops.lit(2.0)
        / (ops.lit(1.0) + sb * ops.lit(c["sb1"]) + cb * cdl * ops.lit(c["cb1"]))
    )
    x = b * cb * ops.sin(dl) * ops.lit(c["D"]) + ops.lit(c["fe"])
    y = b * (sb * ops.lit(c["cb1"]) - cb * cdl * ops.lit(c["sb1"])) * ops.lit(
        1.0 / c["D"]
    ) + ops.lit(c["fn"])
    return x, y


def _laea_inverse(ops, x, y, c: dict):
    xp = (x - ops.lit(c["fe"])) * ops.lit(1.0 / c["D"])
    yp = (y - ops.lit(c["fn"])) * ops.lit(c["D"])
    rho = ops.sqrt(xp * xp + yp * yp)
    ce = ops.asin(rho * ops.lit(1.0 / (2.0 * c["rq"]))) * ops.lit(2.0)
    sce, cce = ops.sin(ce), ops.cos(ce)
    # Snyder 24-27 / 24-26; at rho == 0 (the natural origin) the y'/rho
    # term is 0/0 — the tiny additive guard resolves it to 0, giving
    # beta = beta1, i.e. exactly the origin latitude
    safe_rho = rho + ops.lit(1e-300)
    qr = cce * ops.lit(c["sb1"]) + yp * sce * ops.lit(c["cb1"]) / safe_rho
    beta = ops.asin(qr)
    phi = (
        beta
        + ops.sin(beta * ops.lit(2.0)) * ops.lit(c["b2"])
        + ops.sin(beta * ops.lit(4.0)) * ops.lit(c["b4"])
        + ops.sin(beta * ops.lit(6.0)) * ops.lit(c["b6"])
    )
    lam = ops.atan2(
        xp * sce,
        rho * cce * ops.lit(c["cb1"]) - yp * sce * ops.lit(c["sb1"]),
    )
    return lam * ops.lit(_DEG) + ops.lit(c["lon0"]), phi * ops.lit(_DEG)


# EPSG parameter registry for the common projected conic codes (parameter
# values from the public EPSG registry entries; area = area-of-use bbox in
# lon/lat, used to derive covering index bounds numerically).
PROJECTED_REGISTRY: dict[str, dict] = {
    # RGF93 / Lambert-93 (France)
    "EPSG:2154": dict(kind="lcc", a=GRS80_A, e2=GRS80_E2, lat0=46.5, lon0=3.0,
                      lat1=49.0, lat2=44.0, fe=700_000.0, fn=6_600_000.0,
                      area=(-9.9, 41.1, 10.4, 51.6)),
    # NAD83 / Canada Atlas Lambert
    "EPSG:3978": dict(kind="lcc", a=GRS80_A, e2=GRS80_E2, lat0=49.0, lon0=-95.0,
                      lat1=49.0, lat2=77.0, fe=0.0, fn=0.0,
                      area=(-141.0, 40.0, -52.0, 86.0)),
    # NAD83 / Conus Albers
    "EPSG:5070": dict(kind="aea", a=GRS80_A, e2=GRS80_E2, lat0=23.0, lon0=-96.0,
                      lat1=29.5, lat2=45.5, fe=0.0, fn=0.0,
                      area=(-125.0, 24.0, -66.5, 49.5)),
    # NAD83 / California Albers
    "EPSG:3310": dict(kind="aea", a=GRS80_A, e2=GRS80_E2, lat0=0.0, lon0=-120.0,
                      lat1=34.0, lat2=40.5, fe=0.0, fn=-4_000_000.0,
                      area=(-124.5, 32.0, -114.1, 42.1)),
    # GDA94 / Australian Albers (southern standard parallels -> n < 0)
    "EPSG:3577": dict(kind="aea", a=GRS80_A, e2=GRS80_E2, lat0=0.0, lon0=132.0,
                      lat1=-18.0, lat2=-36.0, fe=0.0, fn=0.0,
                      area=(112.8, -44.0, 153.7, -9.8)),
    # ETRS89-extended / LAEA Europe (the EU statistical grid)
    "EPSG:3035": dict(kind="laea", a=GRS80_A, e2=GRS80_E2, lat0=52.0, lon0=10.0,
                      fe=4_321_000.0, fn=3_210_000.0,
                      area=(-25.0, 26.0, 45.0, 84.0)),
    # NAD27 / Conus Albers — the historical Conus grid on Clarke 1866
    # (exercises per-code ellipsoid parameters; Snyder's own worked
    # examples use this ellipsoid)
    "EPSG:5069": dict(kind="aea", a=CLARKE1866_A, e2=CLARKE1866_E2,
                      lat0=23.0, lon0=-96.0, lat1=29.5, lat2=45.5,
                      fe=0.0, fn=0.0, area=(-125.0, 24.0, -66.5, 49.5)),
}

_CONIC_CACHE: dict[str, dict] = {}


def _conic(code: str) -> tuple[str, dict]:
    p = PROJECTED_REGISTRY[code]
    if code not in _CONIC_CACHE:
        if p["kind"] == "laea":
            _CONIC_CACHE[code] = laea_consts(
                p["a"], p["e2"], p["lat0"], p["lon0"], p["fe"], p["fn"])
        else:
            mk = lcc_consts if p["kind"] == "lcc" else aea_consts
            _CONIC_CACHE[code] = mk(p["a"], p["e2"], p["lat0"], p["lon0"],
                                    p["lat1"], p["lat2"], p["fe"], p["fn"])
    return p["kind"], _CONIC_CACHE[code]


def _conic_fwd_fn(kind: str):
    return {"lcc": _lcc_forward, "aea": _aea_forward, "laea": _laea_forward}[kind]


def _conic_inv_fn(kind: str):
    return {"lcc": _lcc_inverse, "aea": _aea_inverse, "laea": _laea_inverse}[kind]


_BOUNDS_CACHE: dict[str, tuple] = {}


def _conic_index_bounds(code: str) -> tuple:
    """Covering index-bounds box: project a dense grid over the code's
    area of use and pad 5% — the CustomCRSBoundedSpatialDimension analog
    (bounds from the CRS domain of validity).  Deterministic, cached."""
    if code in _BOUNDS_CACHE:
        return _BOUNDS_CACHE[code]
    kind, c = _conic(code)
    x0, y0, x1, y1 = PROJECTED_REGISTRY[code]["area"]
    lon, lat = np.meshgrid(np.linspace(x0, x1, 41), np.linspace(y0, y1, 41))
    fwd = _conic_fwd_fn(kind)
    px, py = fwd(_NpOps, lon.ravel(), lat.ravel(), c)
    mx, my = float(px.max() - px.min()) * 0.05, float(py.max() - py.min()) * 0.05
    out = (float(px.min()) - mx, float(py.min()) - my,
           float(px.max()) + mx, float(py.max()) + my)
    _BOUNDS_CACHE[code] = out
    return out


# ---------------------------------------------------------------------------
# CRS registry: code → (forward cols, inverse cols, index bounds).

_UTM_RE = re.compile(r"^EPSG:32([67])(\d\d)$")


def _parse(code: str):
    code = code.upper().strip()
    if code in ("EPSG:4326", "CRS:84", "OGC:CRS84"):
        return ("geo", None, None)
    if code in ("EPSG:3857", "EPSG:900913"):
        return ("merc", None, None)
    m = _UTM_RE.match(code)
    if m:
        zone = int(m.group(2))
        if not 1 <= zone <= 60:
            raise ValueError(f"bad UTM zone in {code!r}")
        return ("utm", zone, m.group(1) == "7")
    if code in PROJECTED_REGISTRY:
        return ("conic", code, None)
    raise ValueError(
        f"unsupported CRS {code!r} (supported: EPSG:4326, EPSG:3857, "
        "EPSG:326zz / EPSG:327zz UTM, and the registered conic codes "
        f"{sorted(PROJECTED_REGISTRY)})"
    )


def crs_index_bounds(code: str):
    """Per-dimension index bounds for a CRS code — the custom-bounds tuple
    the step-1 index math consumes (``None`` = the native EPSG:4326 path
    with longitude wrap)."""
    kind, _zone, south = _parse(code)
    if kind == "geo":
        return None
    if kind == "merc":
        return WEB_MERCATOR_BOUNDS
    if kind == "conic":
        return _conic_index_bounds(_zone)
    return UTM_SOUTH_BOUNDS if south else UTM_NORTH_BOUNDS


def forward_cols(code: str, lon: Column, lat: Column) -> tuple[Column, Column]:
    kind, zone, south = _parse(code)
    if kind == "geo":
        return lon, lat
    if kind == "merc":
        return web_mercator_cols(lon, lat)
    if kind == "conic":
        fam, c = _conic(zone)
        return _conic_fwd_fn(fam)(_ColOps, lon, lat, c)
    return utm_cols(lon, lat, zone, south)


def inverse_cols(code: str, x: Column, y: Column) -> tuple[Column, Column]:
    kind, zone, south = _parse(code)
    if kind == "geo":
        return x, y
    if kind == "merc":
        return web_mercator_inverse_cols(x, y)
    if kind == "conic":
        fam, c = _conic(zone)
        return _conic_inv_fn(fam)(_ColOps, x, y, c)
    return utm_inverse_cols(x, y, zone, south)


def forward_np(code: str, lon, lat):
    kind, zone, south = _parse(code)
    if kind == "geo":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if kind == "merc":
        return web_mercator_np(lon, lat)
    if kind == "conic":
        fam, c = _conic(zone)
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        return _conic_fwd_fn(fam)(_NpOps, lon, lat, c)
    return utm_np(lon, lat, zone, south)


def reproject(
    df: DataFrame,
    code: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    x_out: str = "x",
    y_out: str = "y",
) -> DataFrame:
    """Add projected ``x_out``/``y_out`` columns for ``code`` — one codegen
    stage, no shuffle, no Python."""
    x, y = forward_cols(code, F.col(lon_col), F.col(lat_col))
    return df.withColumn(x_out, x).withColumn(y_out, y)


# WKT geometry reprojection: every "<num> <num>" pair inside a WKT body is
# a coordinate pair, so a single regex pass transforms any geometry type.
_PAIR_RE = re.compile(
    r"(-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)\s+(-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
)


def reproject_wkt(wkt: str, code: str) -> str:
    """Reproject every coordinate pair of one WKT string (driver-side /
    small-geometry-side helper; the big point side uses `reproject`)."""
    kind, zone, south = _parse(code)
    if kind == "geo":
        return wkt

    def _sub(m: re.Match) -> str:
        lon, lat = float(m.group(1)), float(m.group(2))
        x, y = forward_np(code, [lon], [lat])
        return f"{float(x[0])!r} {float(y[0])!r}"

    return _PAIR_RE.sub(_sub, wkt)
