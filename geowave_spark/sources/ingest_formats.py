"""Ingest format plugins: GeoJSON and GPX → DataFrame.

The reference ships per-format ingest plugins that turn files into
GeoTools SimpleFeatures (extensions/formats/geojson/.../GeoJsonIngestPlugin,
extensions/formats/gpx/.../GpxIngestPlugin — the two most used).  The
Spark-first shape: a distributed file scan (binaryFile / text source) and
an Arrow-batched parse to rows whose geometry is the engine's WKT
currency, so the output plugs straight into geometry_join /
write_indexed / cql_filter.

Parsing runs in mapInPandas — the ingest path, not a query hot path
(same trade the Hilbert write path makes); scans parallelize per file,
so a million-file crawl scales with the cluster.

GeoJSON: both whole-file FeatureCollections (``*.geojson``) and
newline-delimited features (``*.geojsonl`` / ndjson).  GPX: waypoints,
route points and track points with elevation/time attributes.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GEOJSON_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("feature_id", T.StringType()),
        T.StructField("wkt", T.StringType()),
        T.StructField("properties", T.StringType()),  # canonical JSON
    ]
)

GPX_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("kind", T.StringType()),  # wpt | rtept | trkpt
        T.StructField("track", T.IntegerType()),  # 0-based <trk> index; -1 for wpt/rtept
        T.StructField("seq", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("ele", T.DoubleType()),
        T.StructField("time", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)


def geometry_to_wkt(geom: dict) -> str | None:
    """GeoJSON geometry object → WKT (the engine's geometry currency)."""
    if not geom or "type" not in geom:
        return None
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        x, y, *_ = c
        return f"POINT ({float(x)} {float(y)})"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({float(x)} {float(y)})" for x, y, *_ in c) + ")"
    if t == "LineString":
        return "LINESTRING (" + ", ".join(f"{float(x)} {float(y)}" for x, y, *_ in c) + ")"
    if t == "MultiLineString":
        return (
            "MULTILINESTRING ("
            + ", ".join(
                "(" + ", ".join(f"{float(x)} {float(y)}" for x, y, *_ in part) + ")"
                for part in c
            )
            + ")"
        )
    if t == "Polygon":
        return (
            "POLYGON ("
            + ", ".join(
                "(" + ", ".join(f"{float(x)} {float(y)}" for x, y, *_ in ring) + ")"
                for ring in c
            )
            + ")"
        )
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "("
                + ", ".join(
                    "(" + ", ".join(f"{float(x)} {float(y)}" for x, y, *_ in ring) + ")"
                    for ring in poly
                )
                + ")"
                for poly in c
            )
            + ")"
        )
    return None  # GeometryCollection etc. — unsupported, row dropped


def _feature_row(path: str, idx: int, feat: dict) -> dict | None:
    wkt = geometry_to_wkt(feat.get("geometry"))
    if wkt is None:
        return None
    fid = feat.get("id")
    return {
        "source_file": path,
        "feature_id": str(fid) if fid is not None else f"{path}#{idx}",
        "wkt": wkt,
        "properties": json.dumps(feat.get("properties") or {}, sort_keys=True),
    }


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Distributed GeoJSON ingest: whole-file FeatureCollections or
    single-Feature files (binaryFile source, one task per file)."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                doc = json.loads(bytes(content).decode("utf-8"))
                feats = doc.get("features", [doc]) if isinstance(doc, dict) else []
                for i, f in enumerate(feats):
                    r = _feature_row(p, i, f)
                    if r:
                        rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in GEOJSON_SCHEMA])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, GEOJSON_SCHEMA)


def read_geojsonl(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON (one Feature per line) — the streaming /
    crawl-output shape; line-splittable, so big files parallelize too."""

    from pyspark.sql import functions as F

    def parse(batches):
        for pdf in batches:
            rows = []
            for p, rid, line in zip(pdf["_f"], pdf["_rowid"], pdf["value"]):
                line = line.strip()
                if not line:
                    continue
                r = _feature_row(p, int(rid), json.loads(line))
                if r:
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in GEOJSON_SCHEMA])

    # source file rides along via input_file_name; the fallback feature_id
    # (features without an explicit "id") uses a globally-unique row id —
    # a per-batch index would collide across files and Arrow batches
    lines = (
        spark.read.text(path)
        .select(F.input_file_name().alias("_f"), F.monotonically_increasing_id().alias("_rowid"), "value")
    )
    return lines.mapInPandas(parse, GEOJSON_SCHEMA)


def read_gpx(spark: SparkSession, path: str) -> DataFrame:
    """GPX ingest (GpxIngestPlugin analog): waypoints, route points and
    track points, flattened with a per-file sequence number."""

    def parse(batches):
        import xml.etree.ElementTree as ET

        def local(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                root = ET.fromstring(bytes(content).decode("utf-8"))
                seq = 0

                def emit(el, k: str, track: int):
                    nonlocal seq
                    ele = time = name = None
                    for ch in el:
                        ck = local(ch.tag)
                        if ck == "ele":
                            ele = float(ch.text)
                        elif ck == "time":
                            time = ch.text
                        elif ck == "name":
                            name = ch.text
                    rows.append(
                        {
                            "source_file": p,
                            "kind": k,
                            "track": track,
                            "seq": seq,
                            "lon": float(el.attrib["lon"]),
                            "lat": float(el.attrib["lat"]),
                            "ele": ele,
                            "time": time,
                            "name": name,
                        }
                    )
                    seq += 1

                # structured walk (not root.iter()): trkpt rows carry the
                # index of the <trk> that owns them, so a multi-track file
                # yields one feature PER TRACK (the reference's
                # one-feature-per-track contract), never a merged line
                # with phantom segments between unrelated tracks
                track_idx = 0
                for child in root:
                    ck = local(child.tag)
                    if ck == "wpt":
                        emit(child, "wpt", -1)
                    elif ck == "rte":
                        for pt in child:
                            if local(pt.tag) == "rtept":
                                emit(pt, "rtept", -1)
                    elif ck == "trk":
                        for seg in child:
                            if local(seg.tag) == "trkseg":
                                for pt in seg:
                                    if local(pt.tag) == "trkpt":
                                        emit(pt, "trkpt", track_idx)
                        track_idx += 1
            yield pd.DataFrame(rows, columns=[f.name for f in GPX_SCHEMA])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, GPX_SCHEMA)


def gpx_tracks_to_wkt(points: DataFrame) -> DataFrame:
    """Collapse trkpt rows into one LINESTRING WKT per (source file,
    track) — the reference's one-feature-per-GPX-track contract; a
    multi-track file yields one row per <trk>, never a merged line with
    phantom segments between unrelated tracks."""
    from pyspark.sql import functions as F

    pts = points.filter(F.col("kind") == "trkpt")
    coords = F.transform(
        F.array_sort(F.collect_list(F.struct("seq", "lon", "lat"))),
        lambda s: F.concat(
            s["lon"].cast("string"), F.lit(" "), s["lat"].cast("string")
        ),
    )
    agg = pts.groupBy("source_file", "track").agg(
        coords.alias("_coords"), F.count(F.lit(1)).alias("n_points")
    )
    # a one-trkpt track must emit POINT: 'LINESTRING (x y)' is invalid WKT
    # and crashes every downstream WKT parser (JTS/GEOS and ours)
    wkt = F.when(
        F.col("n_points") == 1,
        F.concat(F.lit("POINT ("), F.element_at(F.col("_coords"), 1), F.lit(")")),
    ).otherwise(
        F.concat(F.lit("LINESTRING ("), F.array_join(F.col("_coords"), ", "), F.lit(")"))
    )
    return agg.select("source_file", "track", wkt.alias("wkt"), "n_points")


# ---------------------------------------------------------------------------
# Delimited text formats: GDELT / T-Drive / GeoLife
#
# Unlike the XML/JSON plugins above, these three are line-oriented, so the
# Spark-first parse is a distributed `spark.read.text` scan plus pure Column
# algebra (split / element_at / casts) — the whole parse stays inside
# whole-stage codegen; NO Python runs per row.  Malformed lines drop out via
# the same null-cast filters the reference applies in Java.
# ---------------------------------------------------------------------------

# column ids from the reference's GDELT 1.0 event-table layout
# (extensions/formats/gdelt/.../GDELTUtils.java:41-90)
_GDELT_COLS = {
    "event_id": 0,       # GLOBALEVENTID
    "event_date": 1,     # SQLDATE, yyyyMMdd
    "actor1": 6,         # Actor1Name
    "actor2": 16,        # Actor2Name
    "num_mentions": 31,
    "num_sources": 32,
    "num_articles": 33,
    "avg_tone": 34,
    "country_code": 51,  # ActionGeo_CountryCode
    "lat": 53,           # ActionGeo_Lat
    "lon": 54,           # ActionGeo_Long
    "source_url": 57,    # present only in the 58-column variant
}
_GDELT_MIN_COLUMNS = 57  # GDELTUtils.GDELT_MIN_COLUMNS


def read_gdelt(spark: SparkSession, path: str) -> DataFrame:
    """GDELT 1.0 event TSV → typed rows (GDELTIngestPlugin analog).

    Keeps the reference's semantics: rows must have >= 57 tab-separated
    fields and a parseable ActionGeo lat/lon (events without a geocode are
    skipped, GDELTIngestPlugin.java:150-160); the optional 58th column is
    SOURCEURL.  The parse is one codegen stage over a distributed text
    scan — at 100 TB this is `spark.read.text` over the daily-file corpus
    with per-file parallelism.
    """
    from pyspark.sql import functions as F

    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"), F.col("value")
    )
    c = F.split(F.col("value"), "\t")
    g = {k: F.element_at(c, i + 1) for k, i in _GDELT_COLS.items()}
    out = (
        lines.withColumn("_n", F.size(c))
        .filter(F.col("_n") >= _GDELT_MIN_COLUMNS)
        .select(
            "source_file",
            g["event_id"].try_cast("long").alias("event_id"),
            F.try_to_timestamp(g["event_date"], F.lit("yyyyMMdd")).try_cast("date").alias("event_date"),
            F.nullif(g["actor1"], F.lit("")).alias("actor1"),
            F.nullif(g["actor2"], F.lit("")).alias("actor2"),
            g["num_mentions"].try_cast("int").alias("num_mentions"),
            g["num_sources"].try_cast("int").alias("num_sources"),
            g["num_articles"].try_cast("int").alias("num_articles"),
            g["avg_tone"].try_cast("double").alias("avg_tone"),
            F.nullif(g["country_code"], F.lit("")).alias("country_code"),
            g["lat"].try_cast("double").alias("lat"),
            g["lon"].try_cast("double").alias("lon"),
            F.when(F.col("_n") > _GDELT_MIN_COLUMNS, g["source_url"]).alias("source_url"),
        )
        .filter(
            F.col("event_id").isNotNull()
            & F.col("lat").isNotNull()
            & F.col("lon").isNotNull()
        )
    )
    return out


def read_tdrive(spark: SparkSession, path: str) -> DataFrame:
    """T-Drive taxi trace CSV: ``taxiid,datetime,lon,lat`` per line
    (TdriveUtils.java:52-70 — exactly 4 comma fields, timestamp format
    yyyy-MM-dd HH:mm:ss; other lines are invalid and drop)."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"), F.col("value")
    )
    c = F.split(F.col("value"), ",")
    return (
        lines.filter(F.size(c) == 4)
        .select(
            "source_file",
            F.element_at(c, 1).try_cast("long").alias("taxi_id"),
            F.try_to_timestamp(F.element_at(c, 2), F.lit("yyyy-MM-dd HH:mm:ss")).alias("ts"),
            F.element_at(c, 3).try_cast("double").alias("lon"),
            F.element_at(c, 4).try_cast("double").alias("lat"),
        )
        .filter(
            F.col("taxi_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("lon").isNotNull()
            & F.col("lat").isNotNull()
        )
    )


def read_geolife(spark: SparkSession, path: str) -> DataFrame:
    """GeoLife PLT trajectories: after a 6-line header each line is
    ``lat,lon,0,alt_feet,days,yyyy-MM-dd,HH:mm:ss``
    (GeoLifeIngestPlugin.java:162-189).  Header lines fail the 7-field /
    numeric-cast gate and drop — a stateless filter, so the scan stays
    embarrassingly parallel across millions of .plt files.  The
    trajectory id is the reference's convention: the file path's user
    segment + file stem."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"), F.col("value")
    )
    c = F.split(F.col("value"), ",")
    return (
        lines.filter(F.size(c) == 7)
        .select(
            "source_file",
            F.element_at(c, 1).try_cast("double").alias("lat"),
            F.element_at(c, 2).try_cast("double").alias("lon"),
            F.element_at(c, 4).try_cast("double").alias("alt_feet"),
            F.try_to_timestamp(
                F.concat(F.element_at(c, 6), F.lit(" "), F.element_at(c, 7)),
                F.lit("yyyy-MM-dd HH:mm:ss"),
            ).alias("ts"),
        )
        .filter(
            F.col("lat").isNotNull() & F.col("lon").isNotNull() & F.col("ts").isNotNull()
        )
        .withColumn(
            "trajectory_id",
            # user segment + file stem ("<user>/<stem>"); files staged
            # outside the <user>/Trajectory/<stem>.plt layout fall back to
            # the full path — never '' (which would merge every trajectory)
            F.when(
                F.regexp_extract(F.col("source_file"), r"([^/]+)/Trajectory/([^/]+)\.plt", 1) != "",
                F.concat(
                    F.regexp_extract(F.col("source_file"), r"([^/]+)/Trajectory/([^/]+)\.plt", 1),
                    F.lit("/"),
                    F.regexp_extract(F.col("source_file"), r"([^/]+)/Trajectory/([^/]+)\.plt", 2),
                ),
            ).otherwise(F.col("source_file")),
        )
    )


def read_twitter(spark: SparkSession, path: str) -> DataFrame:
    """Geotagged-tweet archives (gzipped ndjson) → typed rows
    (TwitterIngestPlugin analog).

    Mirrors the reference's parse (TwitterIngestPlugin.java:159-246,
    TwitterUtils.java:40-51): one JSON tweet per line; rows without a
    ``coordinates.coordinates`` [lon, lat] pair drop (the reference only
    ingests geotagged tweets); attribute set = user_id / user_name / text /
    in_reply_to_user_id / in_reply_to_status_id / retweet_count / lang and
    ``dtg`` parsed from ``created_at`` ("EEE MMM dd HH:mm:ss Z yyyy",
    TwitterUtils.java:32 — the day-of-week token is positional, so the
    Spark-side parse skips the first 4 chars).

    Spark-first shape: ``spark.read.text`` handles .gz transparently and
    splits per file, ``from_json`` + column algebra keep the whole parse
    inside one codegen stage — no Python in the loop, so a 100 TB tweet
    corpus scans at cluster width (gzip files are splittable only at file
    granularity; the per-file parallelism matches the reference's
    one-AvroWholeFile-per-mapper layout, TwitterIngestPlugin.java:90-101).
    """
    from pyspark.sql import functions as F

    tweet_schema = T.StructType(
        [
            T.StructField("id_str", T.StringType()),
            T.StructField("created_at", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("retweet_count", T.IntegerType()),
            T.StructField("in_reply_to_user_id_str", T.StringType()),
            T.StructField("in_reply_to_status_id_str", T.StringType()),
            T.StructField(
                "coordinates",
                T.StructType(
                    [T.StructField("coordinates", T.ArrayType(T.DoubleType()))]
                ),
            ),
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("id_str", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    lines = spark.read.text(path).select(
        F.input_file_name().alias("source_file"), F.col("value")
    )
    j = F.from_json(F.col("value"), tweet_schema)
    out = (
        lines.select("source_file", j.alias("t"))
        .select(
            "source_file",
            F.col("t.id_str").alias("tweet_id"),
            F.col("t.user.id_str").alias("user_id"),
            F.col("t.user.name").alias("user_name"),
            F.col("t.text").alias("text"),
            F.col("t.in_reply_to_user_id_str").alias("in_reply_to_user_id"),
            F.col("t.in_reply_to_status_id_str").alias("in_reply_to_status_id"),
            F.coalesce(F.col("t.retweet_count"), F.lit(0)).alias("retweet_count"),
            F.col("t.lang").alias("lang"),
            F.try_to_timestamp(
                F.expr("substring(t.created_at, 5)"),
                F.lit("MMM dd HH:mm:ss Z yyyy"),
            ).alias("dtg"),
            F.element_at(F.col("t.coordinates.coordinates"), 1).alias("lon"),
            F.element_at(F.col("t.coordinates.coordinates"), 2).alias("lat"),
        )
        .filter(
            F.col("tweet_id").isNotNull()
            & F.col("dtg").isNotNull()
            & F.col("lon").isNotNull()
            & F.col("lat").isNotNull()
        )
        .withColumn(
            "wkt",
            F.concat(
                F.lit("POINT ("),
                F.col("lon").cast("string"),
                F.lit(" "),
                F.col("lat").cast("string"),
                F.lit(")"),
            ),
        )
    )
    return out
