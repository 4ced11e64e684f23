"""S2-style spherical cell ids — cube-face quadtree + per-face Hilbert curve.

The north rule asks for "H3/S2 cell IDs at adaptive resolutions"; the
engine's default join/index family is the equirectangular tiered Z/Hilbert
grid (cells.py / sqlcells.py — the reference's TieredSFCIndexStrategy
semantics).  This module adds a true SPHERICAL cell family with the S2
construction (public: s2geometry.io docs, s2coords.h):

* project the unit sphere onto the 6 faces of a cube;
* quadratic s/t reparametrization per face (equalizes cell areas to ~2.1x
  min/max instead of the raw gnomonic ~5.2x);
* quantize to a 2^level x 2^level grid per face;
* order cells by Hilbert distance within the face (the same public xy2d
  as hilbert.py) -> cell id = face * 4^level + d.

Cell ids here are *S2-style*, not byte-compatible with Google S2 (we skip
its per-face Hilbert orientation twiddling and its 64-bit sentinel-bit
layout) — what is preserved is the semantics the north rule names: a
spherical hierarchy with the quadtree prefix property (parent id = child
id >> 2 per level, valid because a quadtree block is one contiguous
Hilbert run), adaptive resolution by level choice, and locality-preserving
range decomposition for scans.

Engine/oracle determinism (the Mercator lesson, entry_queries.py
_oracle_cell_ids): every DISCRETE decision that two engines could disagree
on at 1 ulp is made with exact IEEE arithmetic —

* equatorial face = floor((lon+45)/90) mod 4: +, /, floor are correctly
  rounded in every engine, and the fixture lon grid (1e-4 deg decimals)
  lands exactly on the +-45/135 face boundaries, where trig-based argmax
  face selection (|x| vs |y| vs |z|) WOULD flip between JVM Math and libm
  (measured: ~0.2% of rows differ by 1 ulp in cos/sin between Spark and
  DuckDB);
* polar promotion = (tan(lat)/cos(dlam) > 1): a single float comparison
  whose boundary set (tan phi = cos dlam) is irrational — the decimal
  fixture grid never lands on it, and a 1-ulp trig divergence flips it
  only within ~2 ulp of the boundary (~1e-12 probability per row);
* st quantization floor(s * 2^level): same measure-zero argument; the
  Hilbert stage below is pure integer arithmetic (no risk).

The Column twin and the DuckDB oracle twin are generated from ONE
expression list (`stage_exprs`) in dialect-neutral SQL (lateral column
aliases, CAST literals, `&`/`%` on bigints — verified identical in both
engines), so they cannot drift apart textually.  The xor in Hilbert's
d-accumulation is replaced by the arithmetic identity
3*rx XOR ry == 3*rx + ry - 2*rx*ry   (rx, ry in {0,1}).

Reference parity notes: the reference's SFC abstraction is
core/index/.../sfc/SpaceFillingCurve.java (getId / getQueryRanges); its
Hilbert default is HilbertSFC.java.  This module implements the same
surface for the spherical family: `cell_expr`/`cell_np` (getId),
`query_ranges` (getQueryRanges via per-face quadtree decomposition),
`cell_at_level` (reprojectToTier analog via the Hilbert prefix property).
"""

from __future__ import annotations

import math

import numpy as np

from . import hilbert

RAD = math.pi / 180.0  # one literal, repr-shared by every twin
DEFAULT_LEVEL = 12

# equatorial slot (floor((lon+45)/90) mod 4) -> S2 face number
_EQ_FACE = {0: 0, 1: 1, 2: 3, 3: 4}
FACE_NORTH = 2
FACE_SOUTH = 5


def _f(x: float) -> str:
    return f"CAST({float(x)!r} AS DOUBLE)"


# Hilbert as a 4-state machine over the ORIGINAL (i, j) bits, MSB first —
# exactly hilbert.xy2d's curve (validated exhaustively in tests): packed
# entry = digit*4 + next_state at index = state*4 + bx*2 + by.  This shape
# exists because the naive unrolled xy2d (x/y rotated per stage) references
# each prior alias 2-3x, and BOTH engines inline lateral aliases — the
# expression tree grows 3^level (the analyzer hangs at level 12).  The
# state chain references its predecessor exactly ONCE (linear tree), and
# the digit sum extracts each c_k with a single DIV.
_HILBERT_LUT = (1, 4, 14, 8, 0, 15, 5, 9, 10, 6, 12, 3, 11, 13, 7, 2)


def stage_exprs(
    lon: str = "lon",
    lat: str = "lat",
    level: int = DEFAULT_LEVEL,
    out: str = "s2_cell",
    face_out: str | None = "s2_face",
    tag: str = "",
    dialect: str = "spark",
    parent_level: int | None = None,
    parent_out: str = "s2_parent",
) -> list[str]:
    """Chained-alias SELECT fragments computing the cell id.

    Consumable by BOTH Spark (`df.selectExpr("*", *exprs)`,
    dialect="spark") and DuckDB (same list joined into one SELECT,
    dialect="duckdb") — lateral column aliases are supported by both.  The
    FLOAT stages (face, u/v, st, i/j) emit byte-identical text in both
    dialects (the cross-engine bit-determinism contract); only the
    integer-exact Hilbert stage differs (element_at vs list_extract, DIV
    vs //), where a divergence is impossible.  `tag` disambiguates
    intermediates when one query carries two S2 legs.

    ``parent_level`` additionally emits the coarser ancestor id AS
    ``parent_out``, built from the SAME digit aliases (the quadtree prefix
    is the top ``parent_level`` digits) — one extra reference per digit.
    Post-hoc `cell_at_level_sql(out, ...)` is arithmetically identical but
    textually references ``out`` four times, and both engines inline
    lateral aliases, quadrupling the whole id expression tree; at 1M rows
    that blew DuckDB's oracle wrapper past 5 GB.  Derive parents here.
    """
    p = f"_s2{tag}_"
    n = 1 << level
    e: list[str] = []
    # --- face (exact arithmetic; see module docstring) ---------------------
    e.append(
        f"((CAST(floor((({lon}) + {_f(45.0)}) / {_f(90.0)}) AS BIGINT) % 4) + 4) % 4 AS {p}fe"
    )
    e.append(
        f"CASE WHEN (({lon}) - {_f(90.0)} * {p}fe) < {_f(-45.0)} "
        f"THEN (({lon}) - {_f(90.0)} * {p}fe) + {_f(360.0)} "
        f"ELSE (({lon}) - {_f(90.0)} * {p}fe) END AS {p}dlam"
    )
    e.append(f"tan(({lat}) * {_f(RAD)}) AS {p}tphi")
    e.append(f"cos({p}dlam * {_f(RAD)}) AS {p}cdl")
    e.append(f"({p}tphi / {p}cdl) AS {p}veq")  # z / dominant horizontal comp
    e.append(f"tan({p}dlam * {_f(RAD)}) AS {p}ueq")
    # polar u/v need full-longitude trig (only polar rows read them)
    e.append(f"cos(({lon}) * {_f(RAD)}) AS {p}cl")
    e.append(f"sin(({lon}) * {_f(RAD)}) AS {p}sl")
    e.append(
        f"CASE WHEN {p}veq > {_f(1.0)} THEN {FACE_NORTH} "
        f"WHEN {p}veq < {_f(-1.0)} THEN {FACE_SOUTH} "
        f"WHEN {p}fe = 0 THEN 0 WHEN {p}fe = 1 THEN 1 "
        f"WHEN {p}fe = 2 THEN 3 ELSE 4 END AS {p}face"
    )
    # --- per-face (u, v) — the s2coords.h table re-expressed in (dlam, phi):
    #   face 0/1: u =  tan(dlam),        v = tanphi/cos(dlam)
    #   face 3/4: u = -tanphi/cos(dlam), v = tan(dlam)
    #   face 2:   u = -cos(lon)/tanphi,  v = -sin(lon)/tanphi
    #   face 5:   u = -sin(lon)/tanphi,  v = -cos(lon)/tanphi
    e.append(
        f"CASE WHEN {p}face = 2 THEN (CAST(0 AS DOUBLE) - {p}cl) / {p}tphi "
        f"WHEN {p}face = 5 THEN (CAST(0 AS DOUBLE) - {p}sl) / {p}tphi "
        f"WHEN {p}face <= 1 THEN {p}ueq "
        f"ELSE (CAST(0 AS DOUBLE) - {p}veq) END AS {p}u"
    )
    e.append(
        f"CASE WHEN {p}face = 2 THEN (CAST(0 AS DOUBLE) - {p}sl) / {p}tphi "
        f"WHEN {p}face = 5 THEN (CAST(0 AS DOUBLE) - {p}cl) / {p}tphi "
        f"WHEN {p}face <= 1 THEN {p}veq "
        f"ELSE {p}ueq END AS {p}v"
    )
    # --- quadratic st + quantization (S2's [u]->[0,1] area-equalizer) ------
    for ax, src in (("s", f"{p}u"), ("t", f"{p}v")):
        st = (
            f"CASE WHEN {src} >= {_f(0.0)} "
            f"THEN {_f(0.5)} * sqrt({_f(1.0)} + {_f(3.0)} * {src}) "
            f"ELSE {_f(1.0)} - {_f(0.5)} * sqrt({_f(1.0)} - {_f(3.0)} * {src}) END"
        )
        e.append(
            f"least(greatest(CAST(floor(({st}) * {_f(float(n))}) AS BIGINT), "
            f"CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) AS {p}{ax}i"
        )
    # --- Hilbert: 4-state machine over the original (i, j) bits ------------
    lut = ", ".join(str(v) for v in _HILBERT_LUT)
    if dialect == "spark":
        look = f"element_at(array({lut}), {{idx}} + 1)"
        div4 = "({c} DIV 4)"
    elif dialect == "duckdb":
        look = f"list_extract([{lut}], {{idx}} + 1)"
        div4 = "(({c}) // 4)"
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")
    prev = None
    for k in range(level - 1, -1, -1):
        m = 1 << k
        bx = f"CASE WHEN ({p}si & {m}) > 0 THEN 2 ELSE 0 END"
        by = f"CASE WHEN ({p}ti & {m}) > 0 THEN 1 ELSE 0 END"
        st = f"({prev} % 4) * 4 + " if prev else ""
        e.append(f"{look.format(idx=f'{st}{bx} + {by}')} AS {p}c{k}")
        prev = f"{p}c{k}"
    digits = " + ".join(
        f"CAST({4 ** k} AS BIGINT) * {div4.format(c=f'{p}c{k}')}"
        for k in range(level - 1, -1, -1)
    )
    e.append(f"CAST({p}face AS BIGINT) * {4 ** level} + ({digits}) AS {out}")
    if parent_level is not None:
        if not 0 <= parent_level <= level:
            raise ValueError("parent_level must be in [0, level]")
        pl = parent_level
        pdigits = " + ".join(
            f"CAST({4 ** (k - level + pl)} AS BIGINT) * {div4.format(c=f'{p}c{k}')}"
            for k in range(level - 1, level - 1 - pl, -1)
        ) or "CAST(0 AS BIGINT)"
        e.append(
            f"CAST({p}face AS BIGINT) * {4 ** pl} + ({pdigits}) AS {parent_out}"
        )
    if face_out:
        e.append(f"CAST({p}face AS BIGINT) AS {face_out}")
    return e


def split_exprs(exprs: list[str], tag: str = "") -> tuple[list[str], list[str]]:
    """Partition stage_exprs output into (float stages, integer Hilbert
    stages) at the si/ti boundary.

    DuckDB inlines lateral aliases, and its executor allocates an
    intermediate vector per expression node PER THREAD — the fully inlined
    id tree (every c_k chain re-containing the float pipeline) costs
    multiple GB across 16 threads at 1M rows.  An `AS MATERIALIZED` CTE
    between the two halves makes the Hilbert chain reference materialized
    COLUMNS si/ti instead of trees, collapsing executor memory to the
    column data itself.  The float half still inlines internally, but only
    once per output column.  (Spark needs no split: whole-stage codegen
    compiles nodes to code, not per-node vectors.)
    """
    import re as _re

    p = f"_s2{tag}_"
    digit = _re.compile(_re.escape(p) + r"c\d+$")
    pre: list[str] = []
    hil: list[str] = []
    for x in exprs:
        alias = x.rsplit(" AS ", 1)[-1].strip()
        if digit.match(alias):
            hil.append(x)
        elif alias.startswith(p):
            pre.append(x)
        else:  # out / parent_out / face_out — all digit consumers
            hil.append(x)
    return pre, hil


def intermediate_names(
    level: int = DEFAULT_LEVEL, tag: str = ""
) -> list[str]:
    """Names of every `_s2{tag}_*` intermediate emitted by stage_exprs (for
    dropping on the Spark side / omitting from the oracle's outer select)."""
    p = f"_s2{tag}_"
    names = [
        f"{p}fe", f"{p}dlam", f"{p}tphi", f"{p}cdl", f"{p}veq", f"{p}ueq",
        f"{p}cl", f"{p}sl", f"{p}face", f"{p}u", f"{p}v", f"{p}si", f"{p}ti",
    ]
    names += [f"_s2{tag}_c{k}" for k in range(level - 1, -1, -1)]
    return names


def add_s2_cell_column(
    df,
    lon: str = "lon",
    lat: str = "lat",
    level: int = DEFAULT_LEVEL,
    out: str = "s2_cell",
    face_out: str | None = None,
    tag: str = "",
    parent_level: int | None = None,
    parent_out: str = "s2_parent",
):
    """Spark twin: one selectExpr pass (whole-stage-codegen'd Column math —
    no Python, no shuffle)."""
    exprs = stage_exprs(
        lon, lat, level, out, face_out, tag,
        parent_level=parent_level, parent_out=parent_out,
    )
    return df.selectExpr("*", *exprs).drop(*intermediate_names(level, tag))


# ---------------------------------------------------------------------------
# numpy twin (query-side covers, tests)
# ---------------------------------------------------------------------------


def face_uv_np(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face, u, v) — same decision tree as stage_exprs, in numpy."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    fe = (np.floor((lon + 45.0) / 90.0).astype(np.int64) % 4 + 4) % 4
    dlam = lon - 90.0 * fe.astype(np.float64)
    dlam = np.where(dlam < -45.0, dlam + 360.0, dlam)
    tphi = np.tan(lat * RAD)
    cdl = np.cos(dlam * RAD)
    veq = tphi / cdl
    ueq = np.tan(dlam * RAD)
    cl = np.cos(lon * RAD)
    sl = np.sin(lon * RAD)
    eq_face = np.select([fe == 0, fe == 1, fe == 2], [0, 1, 3], default=4)
    face = np.where(veq > 1.0, FACE_NORTH, np.where(veq < -1.0, FACE_SOUTH, eq_face))
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 2, face == 5, face <= 1],
            [(0.0 - cl) / tphi, (0.0 - sl) / tphi, ueq],
            default=0.0 - veq,
        )
        v = np.select(
            [face == 2, face == 5, face <= 1],
            [(0.0 - sl) / tphi, (0.0 - cl) / tphi, veq],
            default=ueq,
        )
    return face.astype(np.int64), u, v


def st_np(u: np.ndarray) -> np.ndarray:
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def ij_np(
    lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    face, u, v = face_uv_np(lon, lat)
    n = 1 << level
    i = np.clip(np.floor(st_np(u) * float(n)).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor(st_np(v) * float(n)).astype(np.int64), 0, n - 1)
    return face, i, j


def cell_np(
    lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL
) -> np.ndarray:
    face, i, j = ij_np(lon, lat, level)
    return face * (4 ** level) + hilbert.xy2d(i, j, level)


def cell_at_level(cell: np.ndarray | int, from_level: int, to_level: int):
    """Parent cell id (reprojectToTier analog): the Hilbert prefix property
    makes the coarser id an exact right-shift of the finer one."""
    if to_level > from_level:
        raise ValueError("to_level must be <= from_level")
    shift = 2 * (from_level - to_level)
    cell = np.asarray(cell, dtype=np.int64)
    face = cell // (4 ** from_level)
    d = cell % (4 ** from_level)
    return face * (4 ** to_level) + (d >> shift)


def cell_at_level_sql(col: str, from_level: int, to_level: int) -> str:
    """Dialect-neutral SQL twin of cell_at_level (Spark selectExpr AND
    DuckDB).  All quotients are exact (the numerators are exact multiples
    below 2^53), so double division is bit-safe in both engines."""
    shift = 2 * (from_level - to_level)
    fl, tl = 4 ** from_level, 4 ** to_level
    face = f"CAST(((({col}) - (({col}) % {fl})) / {fl}) AS BIGINT)"
    d = f"(({col}) % {fl})"
    dshift = f"CAST((({d} - ({d} % {1 << shift})) / {1 << shift}) AS BIGINT)"
    return f"{face} * CAST({tl} AS BIGINT) + {dshift}"


# ---------------------------------------------------------------------------
# query-side cover (getQueryRanges analog)
# ---------------------------------------------------------------------------


# equatorial slot intervals on the lon circle, per face (slot 2/face 3
# wraps the antimeridian, so it appears as [135, 225) against lon+360)
_SLOTS = ((0, -45.0, 45.0), (1, 45.0, 135.0), (3, 135.0, 225.0), (4, -135.0, -45.0))


def _face_uv_bounds(
    bbox: tuple[float, float, float, float],
) -> dict[int, list[tuple[float, float, float, float]]]:
    """EXACT per-face list of (u_min, u_max, v_min, v_max) rectangles
    covering the bbox's image.

    Certified by monotonicity, not sampling (the geom.py lesson — a
    sampled hull under-covers near the polar-promotion boundary by more
    than any fixed pad):

    * equatorial faces — u = tan(dlam) is monotone in lon; v =
      tan(phi)/cos(dlam) is monotone in phi for fixed lon and has its only
      interior lon-extremum at dlam = 0, so every extreme lies on the
      candidate set {y0, y1} x {dlam_lo, dlam_hi, 0}; the face region is
      the |v| <= 1 clamp of that hull;
    * polar faces — (u, v) = rho * (-cos lon, -sin lon) with rho =
      1/|tan phi|: an annular sector, SPLIT at 45° lon boundaries so each
      segment's cos/sin are monotone (extremes at segment endpoints x
      {rho_lo, rho_hi}) and each curved arc gets a tight rectangle — one
      rectangle around a wide arc would cover half the face (measured
      0.003 precision on thin high-latitude rings); rho_hi uses the
      lowest promoted latitude max(lat_edge, atan(cos dlam_far)) — a safe
      overcover (precision, never recall).

    Multiple rectangles per face are possible (polar segments; slot 3's
    two shift images); recall needs only that their union covers.
    """
    x0, y0, x1, y1 = (float(v) for v in bbox)
    out: dict[int, list[tuple[float, float, float, float]]] = {}
    north = south = False
    d_far = 0.0  # farthest |dlam| attained on any slot (drives promotion)

    for face, s0, s1 in _SLOTS:
        for shift in (0.0, 360.0):  # slot 3 sits at [135, 225) vs lon+360
            d0 = max(x0 + shift, s0)
            d1 = min(x1 + shift, s1)
            if d0 > d1:
                continue
            c = (s0 + s1) / 2.0  # slot centre (dlam = 0)
            d0 -= c
            d1 -= c
            d_far = max(d_far, abs(d0), abs(d1))
            u_lo, u_hi = math.tan(d0 * RAD), math.tan(d1 * RAD)
            dcands = [d0, d1] + ([0.0] if d0 < 0.0 < d1 else [])
            vcands = [
                math.tan(phi * RAD) / math.cos(d * RAD)
                for phi in (y0, y1)
                for d in dcands
            ]
            v_lo, v_hi = min(vcands), max(vcands)
            if v_hi > 1.0:
                north = True
            if v_lo < -1.0:
                south = True
            if v_lo > 1.0 or v_hi < -1.0:
                continue  # slot fully promoted poleward
            if face <= 1:
                # faces 0/1: u = tan(dlam), v = veq
                rect = (
                    max(u_lo, -1.0), min(u_hi, 1.0),
                    max(v_lo, -1.0), min(v_hi, 1.0),
                )
            else:
                # faces 3/4 swap axes: u = -veq, v = tan(dlam)
                # (stage_exprs' s2coords.h table)
                rect = (
                    max(0.0 - v_hi, -1.0), min(0.0 - v_lo, 1.0),
                    max(u_lo, -1.0), min(u_hi, 1.0),
                )
            out.setdefault(face, []).append(rect)

    # lowest latitude at which ANY attained lon promotes: atan(cos(d_far))
    promote_deg = math.degrees(math.atan(math.cos(d_far * RAD)))

    def polar(face: int, pole_in: bool, rho_lo: float, rho_hi: float):
        """north: (u, v) = rho*(-cos lon, -sin lon); south swaps axes via
        the sign of tan phi (see the face 5 branch below).  The lon range
        splits at 45° boundaries; within a segment cos and sin are
        monotone, so per-segment extremes sit at the segment endpoints."""
        cuts = [x0]
        k0 = math.floor(x0 / 45.0) + 1
        while k0 * 45.0 < x1:
            cuts.append(k0 * 45.0)
            k0 += 1
        cuts.append(x1)
        for seg0, seg1 in zip(cuts, cuts[1:]):
            ucs, vcs = [], []
            for lo in (seg0, seg1):
                a = 0.0 - math.cos(lo * RAD)
                b = 0.0 - math.sin(lo * RAD)
                for rho in (rho_lo, rho_hi):
                    if face == FACE_NORTH:
                        ucs.append(rho * a)
                        vcs.append(rho * b)
                    else:  # face 5: u = -sin(lon)/tanphi, v = -cos(lon)/tanphi,
                        # tanphi < 0 -> u = rho*sin, v = rho*cos
                        ucs.append(rho * (-b))
                        vcs.append(rho * (-a))
            # the pole (rho = 0 -> (0, 0)) is inside every segment rect
            # whenever pole_in, because rho_lo is 0 then
            out.setdefault(face, []).append((
                max(min(ucs), -1.0), min(max(ucs), 1.0),
                max(min(vcs), -1.0), min(max(vcs), 1.0),
            ))

    if north and y1 > 0.0:
        rho_lo = 0.0 if y1 >= 90.0 else 1.0 / math.tan(y1 * RAD)
        phi_b = max(y0, promote_deg)
        rho_hi = 1.0 / math.tan(phi_b * RAD)
        polar(FACE_NORTH, y1 >= 90.0, rho_lo, rho_hi)
    if south and y0 < 0.0:
        rho_lo = 0.0 if y0 <= -90.0 else 1.0 / math.tan(-y0 * RAD)
        phi_b = max(-y1, promote_deg)
        rho_hi = 1.0 / math.tan(phi_b * RAD)
        polar(FACE_SOUTH, y0 <= -90.0, rho_lo, rho_hi)
    return out


def query_ranges(
    bbox: tuple[float, float, float, float],
    level: int = DEFAULT_LEVEL,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """lon/lat bbox -> inclusive s2-cell-id ranges at `level`.

    Cover construction: EXACT per-face (u, v) hull by extremum enumeration
    (`_face_uv_bounds` — monotonicity arguments in its docstring; no
    sampling anywhere), quantized through the monotone st transform with a
    ±1-cell pad that absorbs the remaining float-ulp uncertainty (1 cell =
    2^-level of a face ≫ 1 ulp), then each face rectangle decomposes into
    Hilbert d-ranges with the same budgeted quadtree as
    hilbert.hilbert_query_ranges.  Recall-exactness is a theorem of the
    hull + monotone-st + pad construction, and is additionally pinned
    against direct filters and a randomized-box fuzz in tests/test_s2.py.

    Antimeridian boxes (x0 > x1) split into two plain boxes, like
    cells.ranges_for_cover's canonical split.
    """
    x0, y0, x1, y1 = bbox
    if x0 > x1:
        # the two halves' POLAR-face rectangles overlap (both reach the
        # pole), so merge — not just sort — the union; then re-budget:
        # each half used the full budget, so the union can hold up to
        # 2*max_ranges and must be consolidated back under the contract
        both = sorted(
            query_ranges((x0, y0, 180.0, y1), level, max_ranges)
            + query_ranges((-180.0, y0, x1, y1), level, max_ranges)
        )
        merged0: list[tuple[int, int]] = []
        for lo, hi in both:
            if merged0 and lo <= merged0[-1][1] + 1:
                merged0[-1] = (merged0[-1][0], max(merged0[-1][1], hi))
            else:
                merged0.append((lo, hi))
        return _consolidate(merged0, max_ranges)
    faces = _face_uv_bounds(bbox)
    n = 1 << level
    out: list[tuple[int, int]] = []
    rects = [(f, r) for f, rs in sorted(faces.items()) for r in rs]
    budget = max(4, max_ranges // max(len(rects), 1))
    for f, (u0, u1, v0, v1) in rects:
        s0, s1 = st_np(np.array([u0, u1]))
        t0, t1 = st_np(np.array([v0, v1]))
        gi0 = max(int(np.floor(s0 * n)) - 1, 0)
        gi1 = min(int(np.floor(s1 * n)) + 1, n - 1)
        gj0 = max(int(np.floor(t0 * n)) - 1, 0)
        gj1 = min(int(np.floor(t1 * n)) + 1, n - 1)
        base = int(f) * (4 ** level)
        for lo, hi in hilbert.rect_query_ranges(gi0, gi1, gj0, gj1, level, budget):
            out.append((base + lo, base + hi))
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    # hard budget: the per-rect floor (budget >= 4) can overshoot
    # max_ranges when a box touches many face rectangles
    return _consolidate(merged, max_ranges)


def _consolidate(ranges: list[tuple[int, int]], max_ranges: int) -> list[tuple[int, int]]:
    """Coarsen a sorted disjoint range list to ≤ max_ranges by repeatedly
    absorbing the SMALLEST gaps (the reference's range-constraint
    consolidation): recall is preserved — ranges only ever grow — and the
    loosened cells are the cheapest possible extra scan."""
    if len(ranges) <= max_ranges:
        return ranges
    gaps = sorted(
        range(1, len(ranges)), key=lambda i: ranges[i][0] - ranges[i - 1][1]
    )
    kill = set(gaps[: len(ranges) - max_ranges])  # boundaries to dissolve
    out: list[tuple[int, int]] = []
    for i, (lo, hi) in enumerate(ranges):
        if i in kill and out:
            out[-1] = (out[-1][0], hi)
        else:
            out.append((lo, hi))
    return out
