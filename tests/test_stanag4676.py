"""STANAG 4676 ingest (sources/stanag4676) against an independently
synthesized TrackMessage XML fixture — namespaced like real NATO 4676
output, with typed and untyped <items>, motion events, and two inline
base64 PNG image chips of different sizes (exercising the per-event
rescale-to-max the reference applies, IngestMessageHandler.java:100-152).
"""

from __future__ import annotations

import base64
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec as IC
from geowave_spark.sources import stanag4676 as S

NS = 'xmlns="urn:nato:stanag:4676:edition1" xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'


def _chip(w: int, h: int, seed: int) -> tuple[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return base64.b64encode(IC.encode_png(arr)).decode(), arr


def _fixture_xml() -> str:
    chip1_b64, _ = _chip(4, 3, 7)
    chip2_b64, _ = _chip(2, 2, 9)
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<TrackMessage {NS}>
  <stanagVersion>1.0</stanagVersion>
  <msgCreatedTime>2024-03-01T00:00:00Z</msgCreatedTime>
  <tracks>
    <trackUUID>t-001</trackUUID>
    <trackNumber>TRK1</trackNumber>
    <trackStatus>CONFIRMED</trackStatus>
    <missionID>m-1</missionID>
    <items xsi:type="TrackPoint">
      <trackItemUUID>p-1</trackItemUUID>
      <trackItemTime>2024-03-01T10:00:00.250Z</trackItemTime>
      <trackItemSecurity><securityClassification>UNCLASSIFIED</securityClassification></trackItemSecurity>
      <trackPointPosition><latitude>10.0</latitude><longitude>20.0</longitude><elevation>100.0</elevation></trackPointPosition>
      <trackPointSpeed>5.0</trackPointSpeed>
      <trackPointCourse>90.0</trackPointCourse>
      <trackPointSource>RADAR</trackPointSource>
      <TrackPointDetail>
        <pointDetailPosition xsi:type="GeodeticPosition"><latitude>10.001</latitude><longitude>20.001</longitude><elevation>101.0</elevation></pointDetailPosition>
      </TrackPointDetail>
    </items>
    <items>
      <trackItemUUID>p-2</trackItemUUID>
      <trackItemTime>2024-03-01T10:00:10Z</trackItemTime>
      <trackPointPosition><latitude>10.5</latitude><longitude>20.5</longitude></trackPointPosition>
      <trackPointSpeed>7.0</trackPointSpeed>
    </items>
    <items xsi:type="VideoInformation">
      <trackItemUUID>v-1</trackItemUUID>
      <trackItemTime>2024-03-01T10:00:00.250Z</trackItemTime>
      <imageChip>{chip1_b64}</imageChip>
      <frameNumber>12</frameNumber>
      <pixelRow>34</pixelRow>
      <pixelColumn>56</pixelColumn>
    </items>
    <items xsi:type="VideoInformation">
      <trackItemUUID>v-2</trackItemUUID>
      <trackItemTime>2024-03-01T10:00:10Z</trackItemTime>
      <imageChip>{chip2_b64}</imageChip>
      <frameNumber>13</frameNumber>
      <pixelRow>1</pixelRow>
      <pixelColumn>2</pixelColumn>
    </items>
    <items xsi:type="MotionEventInformation">
      <trackItemUUID>me-1</trackItemUUID>
      <trackItemTime>2024-03-01T10:00:05Z</trackItemTime>
      <motionEvent>STOP</motionEvent>
      <motionEventEndTime>2024-03-01T10:00:08Z</motionEventEndTime>
      <motionEventPosition><latitude>10.2</latitude><longitude>20.2</longitude></motionEventPosition>
    </items>
  </tracks>
  <tracks>
    <trackUUID>t-002</trackUUID>
    <trackNumber>TRK2</trackNumber>
    <trackStatus>TENTATIVE</trackStatus>
    <missionID>m-1</missionID>
    <items xsi:type="TrackPoint">
      <trackItemUUID>q-1</trackItemUUID>
      <trackItemTime>2024-03-01T11:00:00Z</trackItemTime>
      <trackPointPosition><latitude>-5.0</latitude><longitude>30.0</longitude></trackPointPosition>
    </items>
  </tracks>
</TrackMessage>
"""


@pytest.fixture(scope="module")
def msg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stanag")
    (d / "msg1.xml").write_text(_fixture_xml())
    return str(d)


def test_track_points(spark, msg_dir):
    rows = {
        r["track_item_uuid"]: r
        for r in S.read_stanag4676(spark, msg_dir).collect()
    }
    assert set(rows) == {"p-1", "p-2", "q-1"}
    p1 = rows["p-1"]
    assert p1["track_uuid"] == "t-001"
    assert p1["track_number"] == "TRK1"
    assert p1["track_status"] == "CONFIRMED"
    assert p1["mission"] == "m-1"
    assert p1["lat"] == 10.0 and p1["lon"] == 20.0 and p1["elevation"] == 100.0
    assert p1["detail_lat"] == 10.001 and p1["detail_lon"] == 20.001
    assert p1["speed"] == 5.0 and p1["course"] == 90.0
    assert p1["classification"] == "UNCLASSIFIED"
    assert p1["track_point_source"] == "RADAR"
    assert p1["wkt"] == "POINT (20.0 10.0)"
    # millis truncation like the reference decoder
    assert p1["ts_us"] % 1_000_000 == 250_000
    # untyped <items> falls back to TrackPoint (NATO4676Decoder.java:338)
    p2 = rows["p-2"]
    assert p2["lat"] == 10.5 and p2["classification"] == "UNKNOWN"
    assert rows["q-1"]["track_uuid"] == "t-002"


def test_chips_attached_and_rescaled(spark, msg_dir):
    rows = {
        r["track_item_uuid"]: r
        for r in S.read_stanag4676(spark, msg_dir).collect()
    }
    p1, p2 = rows["p-1"], rows["p-2"]
    # both chips rescaled to the event max (4x3) and re-encoded PNG
    for p, frame, prow, pcol in ((p1, 12, 34, 56), (p2, 13, 1, 2)):
        assert (p["chip_w"], p["chip_h"]) == (4, 3)
        assert (p["frame_number"], p["pixel_row"], p["pixel_column"]) == (
            frame,
            prow,
            pcol,
        )
        arr = IC.decode_png(bytes(p["chip"]))
        assert arr.shape == (3, 4, 3)
    # the 4x3 chip passes through pixel-exact
    rng = np.random.RandomState(7)
    want = rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(IC.decode_png(bytes(p1["chip"])), want)
    # the point with no same-timestamp chip carries none
    assert rows["q-1"]["chip"] is None
    assert rows["q-1"]["chip_w"] == -1


def test_motion_points(spark, msg_dir):
    rows = S.read_stanag4676_motion(spark, msg_dir).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["motion_event"] == "STOP"
    assert m["track_uuid"] == "t-001"
    assert m["end_ts_us"] - m["ts_us"] == 3_000_000
    assert m["lat"] == 10.2 and m["wkt"] == "POINT (20.2 10.2)"


def test_tracks_rollup(spark, msg_dir):
    pts = S.read_stanag4676(spark, msg_dir)
    tracks = {r["track_uuid"]: r for r in S.tracks_from_points(pts).collect()}
    t1 = tracks["t-001"]
    assert t1["point_count"] == 2
    assert t1["wkt"] == "LINESTRING (20.0 10.0, 20.5 10.5)"
    assert t1["start_lat"] == 10.0 and t1["end_lat"] == 10.5
    assert abs(t1["duration_s"] - 9.75) < 1e-9
    assert t1["min_speed"] == 5.0 and t1["max_speed"] == 7.0
    assert abs(t1["distance"] - math.hypot(0.5, 0.5)) < 1e-12
    # single-point track → POINT, zero distance
    t2 = tracks["t-002"]
    assert t2["point_count"] == 1
    assert t2["wkt"] == "POINT (30.0 -5.0)"
    assert t2["distance"] == 0.0
    assert t2["track_status"] == "TENTATIVE"


def test_track_points_feed_spatial_join(spark, msg_dir):
    """Ingest output plugs straight into the engine's geometry joins —
    the WKT-row contract every other ingest format satisfies."""
    from geowave_spark.operators import spatial_join as SJ

    pts = S.read_stanag4676(spark, msg_dir).select("track_item_uuid", "lon", "lat")
    polys = spark.createDataFrame(
        [("box", "POLYGON ((19 9, 21 9, 21 11, 19 11, 19 9))")],
        ["polygon_id", "wkt"],
    )
    out = SJ.tiered_spatial_join(pts, polys, point_id="track_item_uuid")
    got = {r["track_item_uuid"] for r in out.collect()}
    assert got == {"p-1", "p-2"}


MISSION_XML = f"""<?xml version="1.0" encoding="UTF-8"?>
<MissionSummaryMessage {NS}>
  <missionID>m-1</missionID>
  <Name>OP DEMO</Name>
  <Security><securityClassification>NATO_UNCLASSIFIED</securityClassification></Security>
  <StartTime>2024-03-01T09:00:00Z</StartTime>
  <EndTime>2024-03-01T12:00:00Z</EndTime>
  <CoverageArea>
    <areaBoundaryPoints><latitude>9.0</latitude><longitude>19.0</longitude></areaBoundaryPoints>
    <areaBoundaryPoints><latitude>9.0</latitude><longitude>21.0</longitude></areaBoundaryPoints>
    <areaBoundaryPoints><latitude>11.0</latitude><longitude>21.0</longitude></areaBoundaryPoints>
    <areaBoundaryPoints><latitude>11.0</latitude><longitude>19.0</longitude></areaBoundaryPoints>
  </CoverageArea>
  <ActiveObjectClassifications>
    <classification>VEHICLE</classification>
    <classification>DISMOUNT</classification>
  </ActiveObjectClassifications>
  <FrameInformation>
    <frameNumber>1</frameNumber>
    <frameTimestamp>2024-03-01T09:00:01Z</frameTimestamp>
    <frameCoverageArea>
      <areaBoundaryPoints><latitude>9.5</latitude><longitude>19.5</longitude></areaBoundaryPoints>
      <areaBoundaryPoints><latitude>9.5</latitude><longitude>20.5</longitude></areaBoundaryPoints>
      <areaBoundaryPoints><latitude>10.5</latitude><longitude>20.5</longitude></areaBoundaryPoints>
    </frameCoverageArea>
  </FrameInformation>
</MissionSummaryMessage>
"""


@pytest.fixture(scope="module")
def mission_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stanag_mission")
    (d / "mission1.xml").write_text(MISSION_XML)
    return str(d)


def test_mission_summary(spark, mission_dir):
    rows = S.read_stanag4676_missions(spark, mission_dir).collect()
    assert len(rows) == 1
    m = rows[0]
    assert m["mission"] == "m-1" and m["name"] == "OP DEMO"
    assert m["classification"] == "NATO_UNCLASSIFIED"
    assert m["num_frames"] == 1
    assert (m["end_ts_us"] - m["start_ts_us"]) == 3 * 3600 * 1_000_000
    assert m["object_classes"] == "VEHICLE,DISMOUNT"
    # open ring closed
    assert m["wkt"] == (
        "POLYGON ((19.0 9.0, 21.0 9.0, 21.0 11.0, 19.0 11.0, 19.0 9.0))"
    )


def test_mission_frames(spark, mission_dir):
    rows = S.read_stanag4676_frames(spark, mission_dir).collect()
    assert len(rows) == 1
    fr = rows[0]
    assert fr["frame_number"] == 1 and fr["mission"] == "m-1"
    assert fr["wkt"].startswith("POLYGON ((19.5 9.5, 20.5 9.5, 20.5 10.5, 19.5 9.5")


def _prefixed_jpeg_xml() -> str:
    """Review-fix fixture: QName-prefixed xsi:type values + a JPEG chip +
    non-integer frameNumber (all legal / in-the-wild shapes)."""
    import base64

    import numpy as np

    from geowave_spark.functions import jpegcodec as jc

    arr = np.full((6, 8, 3), 120, np.uint8)
    arr[:3, :, 0] = 200
    jpeg_b64 = base64.b64encode(jc.encode_jpeg(arr)).decode()
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<TrackMessage xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
  <tracks>
    <trackUUID>t-jpg</trackUUID>
    <trackNumber>TRKJ</trackNumber>
    <trackStatus>CONFIRMED</trackStatus>
    <missionID>m-9</missionID>
    <items xsi:type="s4676:TrackPoint">
      <trackItemUUID>jp-1</trackItemUUID>
      <trackItemTime>2024-03-02T08:00:00Z</trackItemTime>
      <trackPointPosition><latitude>1.0</latitude><longitude>2.0</longitude></trackPointPosition>
    </items>
    <items xsi:type="s4676:VideoInformation">
      <trackItemUUID>jv-1</trackItemUUID>
      <trackItemTime>2024-03-02T08:00:00Z</trackItemTime>
      <imageChip>{jpeg_b64}</imageChip>
      <frameNumber>3.0</frameNumber>
      <pixelRow>N/A</pixelRow>
      <pixelColumn>7</pixelColumn>
    </items>
  </tracks>
</TrackMessage>
"""


def test_prefixed_xsi_and_jpeg_chip(spark, tmp_path):
    d = tmp_path / "stanag_jpg"
    d.mkdir()
    (d / "m.xml").write_text(_prefixed_jpeg_xml())
    pts = S.read_stanag4676(spark, str(d)).collect()
    # the prefixed TrackPoint row is discriminated, not dropped
    assert [r["track_item_uuid"] for r in pts] == ["jp-1"]
    r = pts[0]
    # JPEG chip decoded, rescaled-path encoded as PNG, attached by ts
    assert r["chip"] is not None and bytes(r["chip"])[:8] == b"\x89PNG\r\n\x1a\n"
    assert (r["chip_w"], r["chip_h"]) == (8, 6)
    dec = IC.decode_png(bytes(r["chip"]))
    assert dec.shape == (6, 8, 3)
    # non-integer frameNumber/pixelRow tolerated like the float fields
    assert r["frame_number"] == 3 and r["pixel_row"] == -1 and r["pixel_column"] == 7
