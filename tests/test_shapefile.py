"""Shapefile ingest tests: a hand-assembled golden .shp/.dbf pair (packed
straight from the public spec tables, independent of the module's writer),
winding/hole semantics, multi-part shapes, and the distributed
read_shapefile path feeding the engine's WKT contract.

Reference parity target: the GeoTools-vector ingest used by the
reference's flagship ITs (AbstractGeoWaveBasicVectorIT.java:150-215 ingests
hail POINTs and tornado-track LINESTRINGs from real shapefiles)."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from geowave_spark import geom
from geowave_spark.sources import shapefile as shp


# ---------------------------------------------------------------------------
# golden fixture: 2 hail points, packed by hand from the spec
# ---------------------------------------------------------------------------

def _golden_shp() -> bytes:
    rec1 = struct.pack("<i2d", 1, -98.25, 35.5)
    rec2 = struct.pack("<i2d", 1, -97.0, 36.125)
    recs = (
        struct.pack(">ii", 1, len(rec1) // 2) + rec1
        + struct.pack(">ii", 2, len(rec2) // 2) + rec2
    )
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(recs)) // 2)
    header += struct.pack("<ii8d", 1000, 1, -98.25, 35.5, -97.0, 36.125, 0, 0, 0, 0)
    return header + recs


def _golden_dbf() -> bytes:
    # two fields: NAME C(8), MAG N(5,1); two records
    n_rec, rec_size = 2, 1 + 8 + 5
    hdr_size = 32 + 32 * 2 + 1
    out = struct.pack("<BBBBIHH20x", 0x03, 26, 8, 19, n_rec, hdr_size, rec_size)
    out += struct.pack("<11sc4xBB14x", b"NAME", b"C", 8, 0)
    out += struct.pack("<11sc4xBB14x", b"MAG", b"N", 5, 1)
    out += b"\x0d"
    out += b"\x20" + b"hail_a  " + b"  2.5"
    out += b"\x20" + b"hail_b  " + b" 10.0"
    out += b"\x1a"
    return bytes(out)


def test_golden_shp_parses_to_points():
    recs = shp.parse_shp(_golden_shp())
    assert recs == [(1, "POINT (-98.25 35.5)"), (2, "POINT (-97.0 36.125)")]


def test_golden_dbf_parses_types():
    attrs = shp.parse_dbf(_golden_dbf())
    assert attrs == [
        {"NAME": "hail_a", "MAG": 2.5},
        {"NAME": "hail_b", "MAG": 10.0},
    ]


def test_read_shapefile_distributed(spark, tmp_path):
    with open(tmp_path / "hail.shp", "wb") as f:
        f.write(_golden_shp())
    with open(tmp_path / "hail.dbf", "wb") as f:
        f.write(_golden_dbf())
    df = shp.read_shapefile(spark, str(tmp_path)).orderBy("record_no")
    rows = df.collect()
    assert [r.wkt for r in rows] == ["POINT (-98.25 35.5)", "POINT (-97.0 36.125)"]
    assert json.loads(rows[0].attributes) == {"NAME": "hail_a", "MAG": 2.5}
    assert rows[0].source_file.endswith("hail.shp")


def test_read_shapefile_without_dbf(spark, tmp_path):
    with open(tmp_path / "naked.shp", "wb") as f:
        f.write(_golden_shp())
    rows = shp.read_shapefile(spark, str(tmp_path / "naked.shp")).collect()
    assert len(rows) == 2 and all(json.loads(r.attributes) == {} for r in rows)


# ---------------------------------------------------------------------------
# winding / hole / multipart semantics via the round-trip writer
# ---------------------------------------------------------------------------

def _cw(pts):  # spec outer winding
    return pts[::-1] if _ccw_area(pts) > 0 else pts


def _ccw(pts):
    return pts if _ccw_area(pts) > 0 else pts[::-1]


def _ccw_area(pts):
    a = np.asarray(pts)
    return float(np.dot(a[:-1, 0], a[1:, 1]) - np.dot(a[1:, 0], a[:-1, 1]))


SQ = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
HOLE = [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)]
FAR = [(20.0, 0.0), (25.0, 0.0), (25.0, 5.0), (20.0, 5.0), (20.0, 0.0)]


def test_polygon_with_hole_roundtrip(tmp_path):
    shp.write_shapefile(str(tmp_path / "holed"), [(5, [_cw(SQ), _ccw(HOLE)])])
    recs = shp.parse_shp(open(tmp_path / "holed.shp", "rb").read())
    (rec_no, wkt), = recs
    g = geom.geometry_from_wkt(wkt)
    assert isinstance(g, geom.Polygon) and len(g.rings) == 2
    assert not g.contains(np.array([5.0]), np.array([5.0]))[0]  # in hole
    assert g.contains(np.array([2.0]), np.array([2.0]))[0]


def test_two_outer_rings_become_multipolygon(tmp_path):
    shp.write_shapefile(str(tmp_path / "mp"), [(5, [_cw(SQ), _cw(FAR)])])
    (_, wkt), = shp.parse_shp(open(tmp_path / "mp.shp", "rb").read())
    assert wkt.startswith("MULTIPOLYGON")
    g = geom.geometry_from_wkt(wkt)
    assert g.contains(np.array([22.0]), np.array([2.0]))[0]
    assert g.contains(np.array([2.0]), np.array([2.0]))[0]
    assert not g.contains(np.array([15.0]), np.array([2.0]))[0]


def test_multipart_polyline(tmp_path):
    parts = [[(0.0, 0.0), (4.0, 0.0)], [(6.0, 0.0), (10.0, 0.0), (10.0, 5.0)]]
    shp.write_shapefile(str(tmp_path / "ml"), [(3, parts)])
    (_, wkt), = shp.parse_shp(open(tmp_path / "ml.shp", "rb").read())
    assert wkt == "MULTILINESTRING ((0.0 0.0, 4.0 0.0), (6.0 0.0, 10.0 0.0, 10.0 5.0))"


def test_tracks_shapefile_matches_inmemory_wkt(spark, tmp_path):
    """The driver's tornado-track workload written as a shapefile and
    re-ingested must reproduce the in-memory WKT bit-for-bit — the
    contract that lets the line_dwithin_join driver query feed from the
    ingest path with an unchanged oracle."""
    from geowave_spark.entry_queries import LINE_TRACKS, _tracks_df

    shp.write_shapefile(
        str(tmp_path / "tracks"),
        [(3, [[(float(x), float(y)) for x, y in pts]]) for _, pts in LINE_TRACKS],
        records=[{"TRACK_ID": tid} for tid, _ in LINE_TRACKS],
        fields=[("TRACK_ID", "C", 16, 0)],
    )
    got = {
        json.loads(r.attributes)["TRACK_ID"]: r.wkt
        for r in shp.read_shapefile(spark, str(tmp_path / "tracks.shp")).collect()
    }
    want = {r.polygon_id: r.wkt for r in _tracks_df(spark).collect()}
    assert got == want


def test_deleted_dbf_record_keeps_positional_alignment():
    """A flag-deleted (0x2A) middle record must keep its SLOT: the .shp
    and .dbf pair by physical index, so skipping it would hand record 3
    its neighbor's attributes."""
    n_rec, rec_size = 3, 1 + 8 + 5
    hdr_size = 32 + 32 * 2 + 1
    out = struct.pack("<BBBBIHH20x", 0x03, 26, 8, 19, n_rec, hdr_size, rec_size)
    out += struct.pack("<11sc4xBB14x", b"NAME", b"C", 8, 0)
    out += struct.pack("<11sc4xBB14x", b"MAG", b"N", 5, 1)
    out += b"\x0d"
    out += b"\x20" + b"first   " + b"  1.0"
    out += b"\x2a" + b"deleted " + b"  9.9"   # flag-deleted slot
    out += b"\x20" + b"third   " + b"  3.0"
    out += b"\x1a"
    attrs = shp.parse_dbf(bytes(out))
    assert attrs == [
        {"NAME": "first", "MAG": 1.0},
        None,
        {"NAME": "third", "MAG": 3.0},
    ]


def test_corrupt_shp_record_length_raises():
    """A non-positive record content length must raise, not loop forever."""
    rec1 = struct.pack("<i2d", 1, -98.25, 35.5)
    recs = struct.pack(">ii", 1, -4) + rec1
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, (100 + len(recs)) // 2)
    header += struct.pack("<ii8d", 1000, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="corrupt"):
        shp.parse_shp(header + recs)
