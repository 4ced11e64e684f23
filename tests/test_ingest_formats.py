"""GeoJSON / GPX ingest plugins (GeoJsonIngestPlugin / GpxIngestPlugin
analogs): files → WKT-bearing DataFrames that plug into the engine's
geometry machinery."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark import geom
from geowave_spark.sources import ingest_formats as fmt

FEATURES = [
    {"type": "Feature", "id": "pt1",
     "geometry": {"type": "Point", "coordinates": [10.5, 20.25]},
     "properties": {"name": "alpha", "v": 3}},
    {"type": "Feature",
     "geometry": {"type": "LineString",
                  "coordinates": [[0, 0], [1, 1], [2, 0]]},
     "properties": {"name": "track"}},
    {"type": "Feature", "id": 7,
     "geometry": {"type": "Polygon",
                  "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                                  [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]},
     "properties": {}},
    {"type": "Feature",
     "geometry": {"type": "MultiPolygon",
                  "coordinates": [[[[5, 5], [6, 5], [6, 6], [5, 5]]],
                                  [[[8, 8], [9, 8], [9, 9], [8, 8]]]]},
     "properties": {"k": "mp"}},
    {"type": "Feature", "geometry": None, "properties": {"broken": True}},
]

GPX = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
  <wpt lon="-1.5" lat="47.25"><ele>12.5</ele><name>start</name></wpt>
  <trk><name>t1</name><trkseg>
    <trkpt lon="0.0" lat="0.0"><time>2024-01-01T00:00:00Z</time></trkpt>
    <trkpt lon="1.0" lat="0.5"><ele>3.0</ele></trkpt>
    <trkpt lon="2.0" lat="1.0"/>
  </trkseg></trk>
</gpx>
"""


def test_geometry_to_wkt_roundtrips_through_kernel():
    for f in FEATURES[:4]:
        wkt = fmt.geometry_to_wkt(f["geometry"])
        g = geom.geometry_from_wkt(wkt)  # kernel must parse its own input
        assert g.bbox is not None
    assert fmt.geometry_to_wkt(None) is None
    assert fmt.geometry_to_wkt({"type": "GeometryCollection"}) is None


def test_read_geojson_feature_collection(spark, tmp_path):
    p = tmp_path / "data.geojson"
    p.write_text(json.dumps({"type": "FeatureCollection", "features": FEATURES}))
    df = fmt.read_geojson(spark, str(p))
    rows = {r["feature_id"]: r for r in df.collect()}
    assert len(rows) == 4  # null-geometry feature dropped
    assert rows["pt1"]["wkt"] == "POINT (10.5 20.25)"
    assert json.loads(rows["pt1"]["properties"]) == {"name": "alpha", "v": 3}
    assert rows["7"]["wkt"].startswith("POLYGON ((0.0 0.0, 4.0 0.0")
    # ingested WKT is join-ready: point-in-polygon via the CQL surface
    from geowave_spark.functions import cql

    got = cql.cql_filter(df, "INTERSECTS(wkt, POINT (1.5 1.5))", geometry="wkt")
    ids = sorted(r["feature_id"] for r in got.collect())
    assert "7" not in ids  # (1.5, 1.5) is inside polygon 7's HOLE
    got2 = cql.cql_filter(df, "INTERSECTS(wkt, POINT (3.0 3.0))", geometry="wkt")
    assert "7" in {r["feature_id"] for r in got2.collect()}


def test_read_geojsonl_lines(spark, tmp_path):
    p = tmp_path / "data.geojsonl"
    p.write_text("\n".join(json.dumps(f) for f in FEATURES))
    df = fmt.read_geojsonl(spark, str(p))
    assert df.count() == 4
    wkts = {r["wkt"] for r in df.collect()}
    assert "POINT (10.5 20.25)" in wkts


def test_read_gpx_and_track_wkt(spark, tmp_path):
    p = tmp_path / "trip.gpx"
    p.write_text(GPX)
    df = fmt.read_gpx(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["seq"])
    kinds = [r["kind"] for r in rows]
    assert kinds == ["wpt", "trkpt", "trkpt", "trkpt"]
    assert rows[0]["ele"] == 12.5 and rows[0]["name"] == "start"
    assert rows[1]["time"] == "2024-01-01T00:00:00Z"
    tracks = fmt.gpx_tracks_to_wkt(df).collect()
    assert len(tracks) == 1 and tracks[0]["n_points"] == 3
    g = geom.geometry_from_wkt(tracks[0]["wkt"])
    assert g.bbox == (0.0, 0.0, 2.0, 1.0)


def test_gpx_multi_track_one_feature_per_track(spark, tmp_path):
    """Two <trk> elements in one file must yield two WKT features —
    merging them would add a phantom segment between unrelated tracks."""
    gpx = (
        '<?xml version="1.0"?><gpx xmlns="http://www.topografix.com/GPX/1/1">'
        '<trk><trkseg>'
        '<trkpt lon="0" lat="0"></trkpt><trkpt lon="1" lat="0"></trkpt>'
        "</trkseg></trk>"
        '<trk><trkseg>'
        '<trkpt lon="50" lat="50"></trkpt><trkpt lon="51" lat="50"></trkpt>'
        "</trkseg></trk></gpx>"
    )
    (tmp_path / "two.gpx").write_text(gpx)
    pts = fmt.read_gpx(spark, str(tmp_path / "two.gpx"))
    rows = sorted(pts.collect(), key=lambda r: r["seq"])
    assert [r["track"] for r in rows] == [0, 0, 1, 1]
    tracks = sorted(fmt.gpx_tracks_to_wkt(pts).collect(), key=lambda r: r["track"])
    assert len(tracks) == 2
    assert tracks[0]["wkt"] == "LINESTRING (0.0 0.0, 1.0 0.0)"
    assert tracks[1]["wkt"] == "LINESTRING (50.0 50.0, 51.0 50.0)"
