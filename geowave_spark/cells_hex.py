"""H3-style hexagonal cell ids — axial binning with cross-engine exact twins.

The north rule names "H3/S2 cell IDs at adaptive resolutions".
cells_s2.py is the SPHERICAL family; this module is the HEXAGONAL one:
pointy-top hexagons of edge ``size`` degrees over the equirectangular
lon/lat plane, addressed by axial (q, r) coordinates (the public
Red Blob Games hex-grid construction).  H3 proper puts its hexagons on an
icosahedral gnomonic projection; we keep the hex semantics that matter
for analytics — uniform 6-neighbor adjacency, k-rings, nearest-center
assignment — and skip the icosahedron, which buys earth-curvature
uniformity at the price of 12 pentagon exceptions and far harder
cross-engine determinism.

Determinism (the cells_s2 contract, but stronger): assignment is a linear
transform plus cube rounding — only +, -, *, floor, abs and comparisons
on doubles, NO trig anywhere — every op correctly rounded per IEEE 754,
and the Spark twin and the DuckDB oracle twin are generated from ONE
expression list (`stage_exprs`), so they run byte-identical arithmetic
and produce bit-identical ids with no measure-zero caveats at all.

Reference surface: the SFC family abstraction
(core/index/.../sfc/SpaceFillingCurve.java getId semantics) — `cell_np` /
`add_hex_cell_column` are getId; `k_ring` / `neighbors` provide the
query-side expansion the square family gets from cell rings
(knn.py's 3x3 analog is the hex 6-ring here).
"""

from __future__ import annotations

import math

import numpy as np

SQRT3 = math.sqrt(3.0)
DEFAULT_SIZE = 3.0  # hex edge, degrees

# axial id packing: (q + _OFF) * _SPAN + (r + _OFF); |q|,|r| < 2^20 holds
# for any size >= 1e-3 deg over the lon/lat plane
_OFF = 1 << 20
_SPAN = 1 << 21

# the 6 axial neighbor offsets (pointy-top), counterclockwise from east
NEIGHBOR_OFFSETS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def _f(x: float) -> str:
    return f"CAST({float(x)!r} AS DOUBLE)"


def _consts(size: float) -> tuple[float, float, float]:
    """(a, b, c): qf = lon*a - lat*b, rf = lat*c — size folded in so both
    twins run one multiply per term."""
    a = SQRT3 / 3.0 / size
    b = 1.0 / (3.0 * size)
    c = 2.0 / (3.0 * size)
    return a, b, c


def stage_exprs(
    lon: str = "lon",
    lat: str = "lat",
    size: float = DEFAULT_SIZE,
    out: str = "hex_cell",
    q_out: str | None = "hq",
    r_out: str | None = "hr",
    tag: str = "",
) -> list[str]:
    """Chained-alias SELECT fragments computing the hex cell id.

    Dialect-neutral: every emitted fragment is valid in BOTH Spark SQL and
    DuckDB (lateral column aliases, CASE, floor, abs) — unlike cells_s2
    there is no integer-division or array-lookup stage, so one text serves
    both engines verbatim.
    """
    p = f"_hx{tag}_"
    a, b, c = _consts(size)
    e: list[str] = []
    e.append(f"(({lon}) * {_f(a)} - ({lat}) * {_f(b)}) AS {p}qf")
    e.append(f"(({lat}) * {_f(c)}) AS {p}rf")
    e.append(f"((CAST(0 AS DOUBLE) - {p}qf) - {p}rf) AS {p}yf")
    for ax in ("qf", "yf", "rf"):
        e.append(
            f"CAST(floor({p}{ax} + {_f(0.5)}) AS BIGINT) AS {p}R{ax}"
        )
    for ax in ("qf", "yf", "rf"):
        e.append(
            f"abs({p}{ax} - CAST({p}R{ax} AS DOUBLE)) AS {p}D{ax}"
        )
    # cube rounding: fix the axis with the largest rounding error so
    # q + y + r == 0 (ties break in the fixed qf > yf > rf order — same
    # comparison text in both engines, so no divergence is possible)
    big_q = f"({p}Dqf > {p}Dyf AND {p}Dqf > {p}Drf)"
    big_y = f"({p}Dyf > {p}Drf)"
    e.append(
        f"CASE WHEN {big_q} THEN (CAST(0 AS BIGINT) - {p}Ryf - {p}Rrf) "
        f"ELSE {p}Rqf END AS {p}q"
    )
    e.append(
        f"CASE WHEN {big_q} THEN {p}Rrf WHEN {big_y} THEN {p}Rrf "
        f"ELSE (CAST(0 AS BIGINT) - {p}Rqf - {p}Ryf) END AS {p}r"
    )
    e.append(
        f"(({p}q + {_OFF}) * CAST({_SPAN} AS BIGINT) + ({p}r + {_OFF})) AS {out}"
    )
    if q_out:
        e.append(f"{p}q AS {q_out}")
    if r_out:
        e.append(f"{p}r AS {r_out}")
    return e


def intermediate_names(tag: str = "") -> list[str]:
    p = f"_hx{tag}_"
    return (
        [f"{p}qf", f"{p}rf", f"{p}yf"]
        + [f"{p}R{ax}" for ax in ("qf", "yf", "rf")]
        + [f"{p}D{ax}" for ax in ("qf", "yf", "rf")]
        + [f"{p}q", f"{p}r"]
    )


def add_hex_cell_column(
    df,
    lon: str = "lon",
    lat: str = "lat",
    size: float = DEFAULT_SIZE,
    out: str = "hex_cell",
    q_out: str | None = None,
    r_out: str | None = None,
    tag: str = "",
):
    """Spark twin: one selectExpr pass (codegen Column math, no Python)."""
    exprs = stage_exprs(lon, lat, size, out, q_out, r_out, tag)
    return df.selectExpr("*", *exprs).drop(*intermediate_names(tag))


# ---------------------------------------------------------------------------
# numpy twin
# ---------------------------------------------------------------------------


def axial_np(
    lon: np.ndarray, lat: np.ndarray, size: float = DEFAULT_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """(q, r) axial coordinates — the same op sequence as stage_exprs."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    a, b, c = _consts(size)
    qf = lon * a - lat * b
    rf = lat * c
    yf = (0.0 - qf) - rf
    rq = np.floor(qf + 0.5).astype(np.int64)
    ry = np.floor(yf + 0.5).astype(np.int64)
    rr = np.floor(rf + 0.5).astype(np.int64)
    dq = np.abs(qf - rq.astype(np.float64))
    dy = np.abs(yf - ry.astype(np.float64))
    dr = np.abs(rf - rr.astype(np.float64))
    big_q = (dq > dy) & (dq > dr)
    big_y = dy > dr
    q = np.where(big_q, -ry - rr, rq)
    r = np.where(big_q, rr, np.where(big_y, rr, -rq - ry))
    return q, r


def cell_np(
    lon: np.ndarray, lat: np.ndarray, size: float = DEFAULT_SIZE
) -> np.ndarray:
    q, r = axial_np(lon, lat, size)
    return (q + _OFF) * _SPAN + (r + _OFF)


def unpack(cell: np.ndarray | int) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return cell // _SPAN - _OFF, cell % _SPAN - _OFF


def center(
    q: np.ndarray | int, r: np.ndarray | int, size: float = DEFAULT_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Hex center in lon/lat (inverse of the fractional transform)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    x = size * SQRT3 * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


# ---------------------------------------------------------------------------
# rings (query-side expansion)
# ---------------------------------------------------------------------------


def k_ring(k: int) -> list[tuple[int, int]]:
    """All axial offsets within hex distance k of the origin (incl. self):
    hex_dist(dq, dr) = max(|dq|, |dr|, |dq + dr|)."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if max(abs(dq), abs(dr), abs(dq + dr)) <= k:
                out.append((dq, dr))
    return out


def parent_axial(
    q: np.ndarray | int, r: np.ndarray | int, size: float = DEFAULT_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Aperture-4 parent: the hex at edge 2*size whose cell contains this
    hex's CENTER.  Like H3's own aperture-7 hierarchy, containment is
    center-based and approximate — a child hex near a parent boundary can
    spill across it (hexagons do not tile into larger hexagons exactly);
    what IS exact is that every point's parent-of-child is at hex distance
    <= 1 from its direct coarse assignment (pinned in tests), which is the
    property hierarchical rollups and k-ring coarsening need."""
    cx, cy = center(q, r, size)
    return axial_np(cx, cy, 2.0 * size)


def hex_distance(
    q1: np.ndarray | int, r1: np.ndarray | int, q2: np.ndarray | int, r2: np.ndarray | int
) -> np.ndarray:
    dq = np.asarray(q1, dtype=np.int64) - np.asarray(q2, dtype=np.int64)
    dr = np.asarray(r1, dtype=np.int64) - np.asarray(r2, dtype=np.int64)
    return np.maximum(np.maximum(np.abs(dq), np.abs(dr)), np.abs(dq + dr))
