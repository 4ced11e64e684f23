"""STANAG 4676 (NATO ISR track XML) ingest → DataFrames.

The reference's last un-covered ingest plugin
(extensions/formats/stanag4676/.../Stanag4676IngestPlugin.java) parses
NATO 4676 TrackMessage XML — per-track events carrying track points,
motion-event points and inline base64 motion-imagery chips — into three
feature families (Stanag4676Utils.java:21-25: track_point, motion_point,
track).  Spark-first shape: a distributed ``binaryFile`` scan with an
Arrow-batched ElementTree parse per file (one task per message file,
exactly the reference's per-file TrackFileReader), then the track-level
rollup as pure Column algebra — the only shuffle in the whole path is
the one groupBy(track) the reference pays in its MapReduce reducer.

Image chips (the pyspark × image axis): the reference decodes each
VideoInformation chip, rescales every chip of an event to the event's
max WxH and re-encodes (IngestMessageHandler.java:100-152), then joins
chips to track points on exact timestamp (:190-199).  Same semantics
here via the engine's from-scratch codecs (functions/imagecodec) and
nearest-neighbor resize — chips that fail to decode keep their raw
bytes with w/h = -1, mirroring the reference's warn-and-continue.

Element names follow NATO4676Decoder.java (readTrackMessage:204,
readTrackEvent:277, readTrackPoint:357, readMotionPoint:414,
readMotionImagery:601, readGeodeticPosition:686); xsi:type
discrimination for <items> matches :321-337 including the untyped
fallback-to-TrackPoint at :338-343.
"""

from __future__ import annotations

import base64
import binascii
import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_XSI = "{http://www.w3.org/2001/XMLSchema-instance}type"

TRACK_POINT_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("mission", T.StringType()),
        T.StructField("track_number", T.StringType()),
        T.StructField("track_uuid", T.StringType()),
        T.StructField("track_status", T.StringType()),
        T.StructField("track_item_uuid", T.StringType()),
        T.StructField("track_point_source", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("course", T.DoubleType()),
        T.StructField("classification", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("detail_lat", T.DoubleType()),
        T.StructField("detail_lon", T.DoubleType()),
        T.StructField("detail_elevation", T.DoubleType()),
        T.StructField("frame_number", T.IntegerType()),
        T.StructField("pixel_row", T.IntegerType()),
        T.StructField("pixel_column", T.IntegerType()),
        T.StructField("chip", T.BinaryType()),
        T.StructField("chip_w", T.IntegerType()),
        T.StructField("chip_h", T.IntegerType()),
        T.StructField("wkt", T.StringType()),
    ]
)

MOTION_POINT_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("mission", T.StringType()),
        T.StructField("track_number", T.StringType()),
        T.StructField("track_uuid", T.StringType()),
        T.StructField("track_item_uuid", T.StringType()),
        T.StructField("motion_event", T.StringType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("end_ts_us", T.LongType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("course", T.DoubleType()),
        T.StructField("classification", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("wkt", T.StringType()),
    ]
)


def _ts_us(text: str | None) -> int | None:
    """ISO-8601 → epoch micros (NATO4676Decoder.DateStringToLong:1028 —
    fractional seconds truncated to millis, optional Z, parse failure →
    0; the decoder treats all times as UTC)."""
    if not text:
        return None
    s = text.strip()
    if s.endswith("Z"):
        s = s[:-1]
    if "." in s:
        head, frac = s.split(".", 1)
        s = head + "." + (frac + "000")[:3]  # millis, like the reference
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
    else:
        fmt = "%Y-%m-%dT%H:%M:%S"
    try:
        d = _dt.datetime.strptime(s, fmt).replace(tzinfo=_dt.timezone.utc)
    except ValueError:
        return 0
    return int(d.timestamp() * 1_000_000)


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _text(el, name: str) -> str | None:
    for ch in el:
        if _local(ch.tag) == name:
            return ch.text
    return None


def _float(el, name: str) -> float | None:
    t = _text(el, name)
    try:
        return float(t) if t is not None else None
    except ValueError:
        return None


def _position(el, *names: str) -> tuple:
    """First child named in ``names`` → (lat, lon, elevation)."""
    for ch in el:
        if _local(ch.tag) in names:
            return (
                _float(ch, "latitude"),
                _float(ch, "longitude"),
                _float(ch, "elevation"),
            )
    return (None, None, None)


def _classification(el, name: str) -> str:
    """Security child → classification level name; absent → UNKNOWN
    (IngestMessageHandler.java:160-163)."""
    for ch in el:
        if _local(ch.tag) == name:
            c = _text(ch, "securityClassification")
            if c:
                return c
    return "UNKNOWN"


def _decode_chip(b64: str):
    """base64 chip → (raw bytes, ndarray | None). Decode uses the
    engine's own codecs (PNG/BMP/TIFF/JPEG magic sniff — JPEG is the
    common 4676 motion-imagery payload, handled by jpegcodec since the
    real baseline decoder landed); failures keep the raw bytes
    (reference warns and continues)."""
    from ..functions import imagecodec as IC

    try:
        raw = base64.b64decode(b64)
    except (ValueError, binascii.Error):
        return None, None
    arr = None
    try:
        if raw[:8] == b"\x89PNG\r\n\x1a\n":
            arr = IC.decode_png(raw)
        elif raw[:2] == b"BM":
            arr = IC.decode_bmp(raw)
        elif raw[:2] in (b"II", b"MM"):
            arr = IC.decode_tiff(raw)
        elif raw[:2] == b"\xff\xd8":
            from ..functions import jpegcodec

            arr = jpegcodec.decode_jpeg(raw)
    except Exception:
        arr = None
    return raw, arr


def _int(el, name: str, default: int = -1) -> int:
    """Integer child text with warn-free tolerance (the float fields'
    _float contract): non-integer text ('3.0', 'N/A', '') → default
    instead of a ValueError that kills the whole partition."""
    t = _text(el, name)
    if not t:
        return default
    try:
        return int(t)
    except ValueError:
        try:
            return int(float(t))
        except ValueError:
            return default


def _xsi_local(el) -> str | None:
    """xsi:type attribute with any QName prefix stripped: schema-valid
    files may write xsi:type="s4676:TrackPoint" when the target namespace
    is prefix-bound — the local name is what discriminates (the element
    tags already get the same treatment via _local)."""
    v = el.attrib.get(_XSI)
    return v.split(":")[-1] if v else None


def _parse_message(path: str, content: bytes) -> tuple[list, list]:
    """One TrackMessage file → (track_point rows, motion_point rows)."""
    import xml.etree.ElementTree as ET

    from ..functions import imagecodec as IC
    from ..functions.multimodal import _resize_nn

    root = ET.fromstring(content)
    if _local(root.tag) != "TrackMessage":
        return [], []
    points: list = []
    motions: list = []
    for track in root:
        if _local(track.tag) != "tracks":
            continue
        track_uuid = _text(track, "trackUUID")
        track_number = _text(track, "trackNumber")
        track_status = _text(track, "trackStatus")
        mission = _text(track, "missionID")

        # pass 1: motion imagery chips keyed by trackItemTime
        # (IngestMessageHandler's TreeMap<Long, ImageChipInfo>)
        chips: dict[int, dict] = {}
        max_w = max_h = -1
        for item in track:
            if _local(item.tag) != "items":
                continue
            if _xsi_local(item) != "VideoInformation":
                continue
            ts = _ts_us(_text(item, "trackItemTime"))
            b64 = _text(item, "imageChip")
            raw, arr = _decode_chip(b64) if b64 else (None, None)
            if arr is not None:
                h, w = arr.shape[:2]
                max_w = max(max_w, w)
                max_h = max(max_h, h)
            chips[ts] = {
                "raw": raw,
                "arr": arr,
                "frame": _int(item, "frameNumber"),
                "row": _int(item, "pixelRow"),
                "col": _int(item, "pixelColumn"),
            }
        # rescale every decoded chip of the event to the max WxH and
        # re-encode PNG (IngestMessageHandler.java:135-152)
        for info in chips.values():
            arr = info["arr"]
            if arr is None:
                info["w"] = info["h"] = -1
                continue
            h, w = arr.shape[:2]
            if (w, h) != (max_w, max_h):
                arr = _resize_nn(np.ascontiguousarray(arr), max_w, max_h)
            info["raw"] = IC.encode_png(np.ascontiguousarray(arr))
            info["w"], info["h"] = max_w, max_h

        # pass 2: track points and motion points
        for item in track:
            if _local(item.tag) != "items":
                continue
            xsi = _xsi_local(item)
            if xsi in (None, "TrackPoint"):
                lat, lon, elev = _position(item, "trackPointPosition")
                dlat, dlon, delev = (None, None, None)
                for ch in item:
                    if _local(ch.tag) == "TrackPointDetail":
                        dlat, dlon, delev = _position(
                            ch, "pointDetailPosition", "trackPointPosition"
                        )
                ts = _ts_us(_text(item, "trackItemTime"))
                chip = chips.get(ts)
                points.append(
                    {
                        "source_file": path,
                        "mission": mission,
                        "track_number": track_number,
                        "track_uuid": track_uuid,
                        "track_status": track_status,
                        "track_item_uuid": _text(item, "trackItemUUID"),
                        "track_point_source": _text(item, "trackPointSource"),
                        "ts_us": ts,
                        "speed": _float(item, "trackPointSpeed"),
                        "course": _float(item, "trackPointCourse"),
                        "classification": _classification(item, "trackItemSecurity"),
                        "lat": lat,
                        "lon": lon,
                        "elevation": elev,
                        "detail_lat": dlat,
                        "detail_lon": dlon,
                        "detail_elevation": delev,
                        "frame_number": chip["frame"] if chip else -1,
                        "pixel_row": chip["row"] if chip else -1,
                        "pixel_column": chip["col"] if chip else -1,
                        "chip": chip["raw"] if chip else None,
                        "chip_w": chip["w"] if chip else -1,
                        "chip_h": chip["h"] if chip else -1,
                        "wkt": (
                            f"POINT ({lon!r} {lat!r})"
                            if lat is not None and lon is not None
                            else None
                        ),
                    }
                )
            elif xsi == "MotionEventInformation":
                lat, lon, elev = _position(
                    item, "motionEventPosition", "trackPointPosition"
                )
                motions.append(
                    {
                        "source_file": path,
                        "mission": mission,
                        "track_number": track_number,
                        "track_uuid": track_uuid,
                        "track_item_uuid": _text(item, "trackItemUUID"),
                        "motion_event": (_text(item, "motionEvent") or "").strip(),
                        "ts_us": _ts_us(_text(item, "trackItemTime")),
                        "end_ts_us": _ts_us(_text(item, "motionEventEndTime")),
                        "speed": _float(item, "trackPointSpeed"),
                        "course": _float(item, "trackPointCourse"),
                        "classification": _classification(item, "trackItemSecurity"),
                        "lat": lat,
                        "lon": lon,
                        "elevation": elev,
                        "wkt": (
                            f"POINT ({lon!r} {lat!r})"
                            if lat is not None and lon is not None
                            else None
                        ),
                    }
                )
    return points, motions


MISSION_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("mission", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("num_frames", T.IntegerType()),
        T.StructField("start_ts_us", T.LongType()),
        T.StructField("end_ts_us", T.LongType()),
        T.StructField("classification", T.StringType()),
        T.StructField("object_classes", T.StringType()),
        T.StructField("wkt", T.StringType()),
    ]
)

MISSION_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("mission", T.StringType()),
        T.StructField("frame_number", T.IntegerType()),
        T.StructField("frame_ts_us", T.LongType()),
        T.StructField("wkt", T.StringType()),
    ]
)


def _area_wkt(el) -> str | None:
    """CoverageArea → POLYGON WKT (NATO4676Decoder.readCoverageArea:733 —
    areaBoundaryPoints children; ring closed if the source left it open,
    as Area.getPolygon does)."""
    pts = []
    for ch in el:
        if _local(ch.tag) == "areaBoundaryPoints":
            lat, lon = _float(ch, "latitude"), _float(ch, "longitude")
            if lat is not None and lon is not None:
                pts.append((lon, lat))
    if len(pts) < 3:
        return None
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    ring = ", ".join(f"{x!r} {y!r}" for x, y in pts)
    return f"POLYGON (({ring}))"


def _parse_mission(path: str, content: bytes) -> tuple[list, list]:
    """One MissionSummaryMessage file → (mission_summary rows,
    mission_frame rows) — the reference's other two feature families
    (IngestMessageHandler.java:308-349)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(content)
    if _local(root.tag) != "MissionSummaryMessage":
        return [], []
    mission = _text(root, "missionID")
    name = _text(root, "Name")
    classification = _classification(root, "Security")
    start = _ts_us(_text(root, "StartTime"))
    end = _ts_us(_text(root, "EndTime"))
    obj_classes = []
    frames = []
    wkt = None
    for ch in root:
        k = _local(ch.tag)
        if k == "CoverageArea":
            wkt = _area_wkt(ch)
        elif k == "ActiveObjectClassifications":
            obj_classes += [
                c.text for c in ch if _local(c.tag) == "classification" and c.text
            ]
        elif k == "FrameInformation":
            fwkt = None
            for fc in ch:
                if _local(fc.tag) == "frameCoverageArea":
                    fwkt = _area_wkt(fc)
            frames.append(
                {
                    "source_file": path,
                    "mission": mission,
                    "frame_number": _int(ch, "frameNumber"),
                    "frame_ts_us": _ts_us(_text(ch, "frameTimestamp")),
                    "wkt": fwkt,
                }
            )
    summary = [
        {
            "source_file": path,
            "mission": mission,
            "name": name,
            "num_frames": len(frames),
            "start_ts_us": start,
            "end_ts_us": end,
            "classification": classification,
            "object_classes": ",".join(obj_classes),
            "wkt": wkt,
        }
    ]
    return summary, frames


def read_stanag4676_missions(spark: SparkSession, path: str) -> DataFrame:
    """mission_summary features (createMissionSummaryDataType analog)."""

    def parse(batches):
        for pdf in batches:
            rows: list = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_mission(p, bytes(content))[0])
            yield pd.DataFrame(rows, columns=[f.name for f in MISSION_SUMMARY_SCHEMA])

    return _scan(spark, path).mapInPandas(parse, MISSION_SUMMARY_SCHEMA)


def read_stanag4676_frames(spark: SparkSession, path: str) -> DataFrame:
    """mission_frame features (createMissionFrameDataType analog)."""

    def parse(batches):
        for pdf in batches:
            rows: list = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_mission(p, bytes(content))[1])
            yield pd.DataFrame(rows, columns=[f.name for f in MISSION_FRAME_SCHEMA])

    return _scan(spark, path).mapInPandas(parse, MISSION_FRAME_SCHEMA)


def _scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path).select("path", "content")


def read_stanag4676(spark: SparkSession, path: str) -> DataFrame:
    """track_point features (Stanag4676Utils.createPointDataType
    analog), image chips attached by exact timestamp."""

    def parse(batches):
        for pdf in batches:
            rows: list = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_message(p, bytes(content))[0])
            yield pd.DataFrame(rows, columns=[f.name for f in TRACK_POINT_SCHEMA])

    return _scan(spark, path).mapInPandas(parse, TRACK_POINT_SCHEMA)


def read_stanag4676_motion(spark: SparkSession, path: str) -> DataFrame:
    """motion_point features (createMotionDataType analog)."""

    def parse(batches):
        for pdf in batches:
            rows: list = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_message(p, bytes(content))[1])
            yield pd.DataFrame(rows, columns=[f.name for f in MOTION_POINT_SCHEMA])

    return _scan(spark, path).mapInPandas(parse, MOTION_POINT_SCHEMA)


def tracks_from_points(points: DataFrame) -> DataFrame:
    """track features (createTrackDataType analog): one LINESTRING +
    summary row per track — the rollup the reference computes in its
    MapReduce reducer, here as ONE groupBy of pure Column algebra (the
    only shuffle in the ingest path; map-side combine applies).

    Distance is the planar degree-space polyline length (the engine's
    geometry currency everywhere else); the reference's EarthVector
    geodesic metres are a post-hoc unit choice, not a different shape.
    """
    pts = points.filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    seq = F.array_sort(
        F.collect_list(F.struct("ts_us", "lon", "lat", "speed"))
    )
    agg = pts.groupBy("track_uuid").agg(
        F.first("mission", ignorenulls=True).alias("mission"),
        F.first("track_number", ignorenulls=True).alias("track_number"),
        F.max("track_status").alias("track_status"),
        F.max("classification").alias("classification"),
        F.min("ts_us").alias("start_ts_us"),
        F.max("ts_us").alias("end_ts_us"),
        F.min("speed").alias("min_speed"),
        F.max("speed").alias("max_speed"),
        F.avg("speed").alias("avg_speed"),
        F.count(F.lit(1)).cast("int").alias("point_count"),
        seq.alias("_seq"),
    )
    coords = F.transform(
        F.col("_seq"),
        lambda s: F.concat(s["lon"].cast("string"), F.lit(" "), s["lat"].cast("string")),
    )
    # consecutive-pair hypot sum over the time-ordered polyline
    dist = F.aggregate(
        F.zip_with(
            F.slice(F.col("_seq"), 1, F.size(F.col("_seq")) - 1),
            F.slice(F.col("_seq"), 2, F.size(F.col("_seq")) - 1),
            lambda a, b: F.sqrt(
                (b["lon"] - a["lon"]) * (b["lon"] - a["lon"])
                + (b["lat"] - a["lat"]) * (b["lat"] - a["lat"])
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wkt = F.when(
        F.col("point_count") == 1,
        F.concat(F.lit("POINT ("), F.element_at(coords, 1), F.lit(")")),
    ).otherwise(
        F.concat(F.lit("LINESTRING ("), F.array_join(coords, ", "), F.lit(")"))
    )
    first = F.element_at(F.col("_seq"), 1)
    last = F.element_at(F.col("_seq"), -1)
    return agg.select(
        "track_uuid",
        "mission",
        "track_number",
        "track_status",
        "classification",
        "start_ts_us",
        "end_ts_us",
        ((F.col("end_ts_us") - F.col("start_ts_us")) / F.lit(1e6)).alias("duration_s"),
        "min_speed",
        "max_speed",
        "avg_speed",
        F.when(F.col("point_count") > 1, dist).otherwise(F.lit(0.0)).alias("distance"),
        first["lat"].alias("start_lat"),
        first["lon"].alias("start_lon"),
        last["lat"].alias("end_lat"),
        last["lon"].alias("end_lon"),
        "point_count",
        wkt.alias("wkt"),
    )
