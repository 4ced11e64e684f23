"""ESRI shapefile ingest (.shp geometry + .dbf attributes) → DataFrame.

The reference's flagship vector ITs ingest real shapefiles (hail points ×
tornado-track lines, test/.../basic/AbstractGeoWaveBasicVectorIT.java:150-215)
through the GeoTools ``geotools-vector`` ingest plugin
(extensions/formats/geotools-vector).  That plugin is a library binding;
the FORMAT is a public spec ("ESRI Shapefile Technical Description",
July 1998, and the dBase III .dbf layout), simple enough to parse with
``struct`` — so this module closes the ingest gap without GeoTools.

Spark-first shape: ``binaryFile`` scans of the .shp and .dbf siblings,
joined on the file stem (broadcastable — a shapefile is one row), parsed
per file in ``mapInPandas``.  One task per shapefile: a directory of ten
thousand county files parallelizes across the cluster; geometry lands as
WKT, the engine's currency, so the output feeds straight into
``geometry_join`` / ``write_indexed`` / ``cql_filter``.

Supported shape types: Point/PointZ/PointM (1/11/21), PolyLine[Z/M]
(3/13/23), Polygon[Z/M] (5/15/25), MultiPoint[Z/M] (8/18/28); Z/M payloads
are skipped (2-D WKT out).  Polygon ring winding follows the spec: outer
rings clockwise, holes counter-clockwise; holes attach to the outer ring
containing their first vertex.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHAPEFILE_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("record_no", T.LongType()),
        T.StructField("wkt", T.StringType()),
        T.StructField("attributes", T.StringType()),  # canonical JSON
    ]
)

_POINT_TYPES = {1, 11, 21}
_POLYLINE_TYPES = {3, 13, 23}
_POLYGON_TYPES = {5, 15, 25}
_MULTIPOINT_TYPES = {8, 18, 28}


def _fmt(v: float) -> str:
    return repr(float(v))


def _ring_signed_area2(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _point_in_ring(ring: np.ndarray, px: float, py: float) -> bool:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    return bool((cond & (px < xint)).sum() % 2)


def _parts_points(content: bytes, off: int) -> tuple[list[np.ndarray], int]:
    """Parse the common PolyLine/Polygon body at ``off`` (after the shape
    type int): Box, NumParts, NumPoints, Parts[], Points[] → per-part
    (k, 2) arrays."""
    n_parts, n_points = struct.unpack_from("<ii", content, off + 32)
    parts = np.frombuffer(content, dtype="<i4", count=n_parts, offset=off + 40)
    pts = np.frombuffer(
        content, dtype="<f8", count=n_points * 2, offset=off + 40 + 4 * n_parts
    ).reshape(-1, 2)
    bounds = np.append(parts, n_points)
    return [pts[a:b] for a, b in zip(bounds[:-1], bounds[1:])], n_points


def _coords_txt(pts: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts)


def _polygon_wkt(rings: list[np.ndarray]) -> str | None:
    """Ring winding → POLYGON / MULTIPOLYGON WKT.  Outer rings are
    clockwise in the spec (negative shoelace area); holes attach to the
    outer ring containing their first vertex."""
    outers: list[tuple[np.ndarray, list[np.ndarray]]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if len(r) < 4:
            continue
        if _ring_signed_area2(r) < 0:  # clockwise = outer
            outers.append((r, []))
        else:
            holes.append(r)
    if not outers:
        # degenerate winding (some writers emit CCW-only) — treat all as outers
        outers = [(r, []) for r in holes]
        holes = []
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        for outer, hs in outers:
            if _point_in_ring(outer, px, py):
                hs.append(h)
                break
        else:
            outers.append((h, []))
    if not outers:
        return None

    def poly_txt(outer, hs):
        return "(" + ", ".join(f"({_coords_txt(r)})" for r in [outer] + hs) + ")"

    if len(outers) == 1:
        return "POLYGON " + poly_txt(*outers[0])
    return "MULTIPOLYGON (" + ", ".join(poly_txt(o, hs) for o, hs in outers) + ")"


def _shape_wkt(content: bytes, off: int, length_bytes: int) -> str | None:
    (stype,) = struct.unpack_from("<i", content, off)
    if stype == 0:
        return None
    if stype in _POINT_TYPES:
        x, y = struct.unpack_from("<dd", content, off + 4)
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if stype in _MULTIPOINT_TYPES:
        (n,) = struct.unpack_from("<i", content, off + 36)
        pts = np.frombuffer(content, dtype="<f8", count=n * 2, offset=off + 40).reshape(-1, 2)
        return "MULTIPOINT (" + ", ".join(f"({_fmt(x)} {_fmt(y)})" for x, y in pts) + ")"
    if stype in _POLYLINE_TYPES:
        parts, _ = _parts_points(content, off + 4)
        parts = [p for p in parts if len(p) >= 2]
        if not parts:
            return None
        if len(parts) == 1:
            return f"LINESTRING ({_coords_txt(parts[0])})"
        return "MULTILINESTRING (" + ", ".join(f"({_coords_txt(p)})" for p in parts) + ")"
    if stype in _POLYGON_TYPES:
        rings, _ = _parts_points(content, off + 4)
        return _polygon_wkt(rings)
    return None  # unsupported type — row dropped, like GeometryCollection


def parse_shp(content: bytes) -> list[tuple[int, str | None]]:
    """All records of a .shp payload → [(record_no, wkt-or-None)]."""
    (code,) = struct.unpack_from(">i", content, 0)
    if code != 9994:
        raise ValueError(f"not a shapefile (file code {code})")
    (flen_words,) = struct.unpack_from(">i", content, 24)
    end = min(flen_words * 2, len(content))
    out: list[tuple[int, str | None]] = []
    off = 100
    while off + 8 <= end:
        rec_no, rec_words = struct.unpack_from(">ii", content, off)
        if rec_words < 2:  # minimum content = the 4-byte shape type;
            # anything less means a corrupt header — raising beats the
            # infinite loop a non-positive length would cause
            raise ValueError(f"corrupt .shp: record {rec_no} length {rec_words} words")
        body = off + 8
        out.append((rec_no, _shape_wkt(content, body, rec_words * 2)))
        off = body + rec_words * 2
    return out


def parse_dbf(content: bytes) -> list[dict | None]:
    """dBase III .dbf payload → one entry per PHYSICAL record, in file
    order; flag-deleted (0x2A) records come back as None.

    Positional fidelity matters: .shp and .dbf records pair by index, and
    a writer that flag-deletes without packing leaves the deleted slot in
    BOTH files' numbering — skipping it here would shift every later
    feature onto its neighbor's attributes."""
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", content, 4)
    fields: list[tuple[str, str, int, int]] = []
    off = 32
    while off < hdr_size - 1 and content[off] != 0x0D:
        raw = content[off : off + 32]
        name = raw[:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen, fdec = raw[16], raw[17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    out: list[dict] = []
    pos = hdr_size
    for _ in range(n_rec):
        if pos + rec_size > len(content):
            break
        rec = content[pos : pos + rec_size]
        pos += rec_size
        if rec[:1] == b"\x2a":  # deleted: keep the SLOT (alignment)
            out.append(None)
            continue
        vals: dict = {}
        o = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[o : o + flen]
            o += flen
            txt = raw.decode("ascii", "replace").strip()
            if ftype in ("N", "F"):
                if not txt or txt == "*" * len(txt):
                    vals[name] = None
                elif ftype == "N" and fdec == 0 and "." not in txt:
                    vals[name] = int(txt)
                else:
                    vals[name] = float(txt)
            elif ftype == "L":
                vals[name] = (
                    True if txt in "TtYy" else False if txt in "FfNn" else None
                )
            else:  # C, D and anything else: text
                vals[name] = txt or None
        out.append(vals)
    return out


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Distributed shapefile ingest: ``path`` may be a directory or glob
    selecting ``.shp`` files; sibling ``.dbf`` files (same stem) supply
    attributes, absent ones yield ``{}``.  One parse task per shapefile."""
    if path.endswith(".shp"):
        shp_glob, dbf_glob = path, path[:-4] + ".dbf"
    else:
        base = path.rstrip("/")
        shp_glob, dbf_glob = base + "/*.shp", base + "/*.dbf"
    stem = F.regexp_replace(F.col("path"), r"\.(shp|dbf)$", "")
    shp = (
        spark.read.format("binaryFile").load(shp_glob)
        .select(stem.alias("stem"), F.col("path").alias("source_file"),
                F.col("content").alias("shp"))
    )
    try:
        dbf = (
            spark.read.format("binaryFile").load(dbf_glob)
            .select(stem.alias("stem"), F.col("content").alias("dbf"))
        )
        joined = shp.join(F.broadcast(dbf), "stem", "left")
    except AnalysisException:  # no .dbf siblings at all (path not found);
        # any OTHER failure (auth, IO) must propagate — swallowing it
        # would silently strip every feature's attributes
        joined = shp.withColumn("dbf", F.lit(None).cast("binary"))

    def parse(batches):
        for pdf in batches:
            rows = []
            for src, shp_b, dbf_b in zip(pdf["source_file"], pdf["shp"], pdf["dbf"]):
                attrs = parse_dbf(bytes(dbf_b)) if dbf_b is not None else []
                for i, (rec_no, wkt) in enumerate(parse_shp(bytes(shp_b))):
                    if wkt is None:
                        continue
                    a = attrs[i] if i < len(attrs) else None
                    a = {} if a is None else a  # deleted slot → no attrs
                    rows.append(
                        {
                            "source_file": src,
                            "record_no": int(rec_no),
                            "wkt": wkt,
                            "attributes": json.dumps(a, sort_keys=True),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in SHAPEFILE_SCHEMA])

    return joined.select("source_file", "shp", "dbf").mapInPandas(parse, SHAPEFILE_SCHEMA)


# ---------------------------------------------------------------------------
# Writer — fixture generation and round-trip tests (also the missing half
# of the reference's shapefile story: its ITs only READ; a spec-complete
# writer lets tests pin the parser against bytes this module did not craft
# to please itself — the golden fixtures in tests/ were hand-assembled from
# the spec tables instead).
# ---------------------------------------------------------------------------


def _dbf_bytes(records: list[dict], fields: list[tuple[str, str, int, int]]) -> bytes:
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    out = bytearray()
    out += struct.pack(
        "<BBBBIHH20x", 0x03, 26, 8, 19, len(records), hdr_size, rec_size
    )
    for name, ftype, flen, fdec in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii")[:11], ftype.encode(), flen, fdec
        )
    out += b"\x0d"
    for rec in records:
        out += b"\x20"
        for name, ftype, flen, fdec in fields:
            v = rec.get(name)
            if ftype in ("N", "F"):
                txt = "" if v is None else (
                    str(int(v)) if fdec == 0 else f"{float(v):.{fdec}f}"
                )
                out += txt.rjust(flen).encode("ascii")[:flen]
            elif ftype == "L":
                out += (b"?" if v is None else (b"T" if v else b"F"))
            else:
                out += str(v or "").ljust(flen).encode("ascii")[:flen]
    out += b"\x1a"
    return bytes(out)


def write_shapefile(
    path_stem: str,
    geoms: list[tuple[int, list[list[tuple[float, float]]]]],
    records: list[dict] | None = None,
    fields: list[tuple[str, str, int, int]] | None = None,
) -> None:
    """Write a .shp (+ .dbf when records given) pair.

    ``geoms``: (shape_type, parts) per record — shape_type 1 expects one
    part of one point; 3/5 take multiple parts (rings for 5, CW outer /
    CCW hole winding is the CALLER's job)."""
    recs = bytearray()
    for i, (stype, parts) in enumerate(geoms, start=1):
        if stype == 1:
            (x, y), = parts[0]
            body = struct.pack("<i2d", 1, x, y)
        elif stype in (3, 5):
            pts = [p for part in parts for p in part]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            offs, acc = [], 0
            for part in parts:
                offs.append(acc)
                acc += len(part)
            body = struct.pack(
                "<i4dii", stype, min(xs), min(ys), max(xs), max(ys),
                len(parts), len(pts),
            )
            body += struct.pack(f"<{len(parts)}i", *offs)
            body += struct.pack(f"<{2 * len(pts)}d", *[c for p in pts for c in p])
        else:
            raise ValueError(f"writer supports types 1/3/5, got {stype}")
        recs += struct.pack(">ii", i, len(body) // 2) + body
    all_pts = [
        p for _, parts in geoms for part in parts for p in part
    ]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    shp = struct.pack(
        ">i20xi", 9994, (100 + len(recs)) // 2
    ) + struct.pack(
        "<ii8d", 1000, geoms[0][0], min(xs), min(ys), max(xs), max(ys), 0, 0, 0, 0
    ) + bytes(recs)
    with open(path_stem + ".shp", "wb") as f:
        f.write(shp)
    if records is not None:
        with open(path_stem + ".dbf", "wb") as f:
            f.write(_dbf_bytes(records, fields or []))
