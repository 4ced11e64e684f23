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

    def parse(batches):
        for pdf in batches:
            rows = []
            for i, line in enumerate(pdf["value"]):
                line = line.strip()
                if not line:
                    continue
                r = _feature_row("", i, json.loads(line))
                if r:
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in GEOJSON_SCHEMA])

    return spark.read.text(path).mapInPandas(parse, GEOJSON_SCHEMA)


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
                for el in root.iter():
                    k = local(el.tag)
                    if k not in ("wpt", "rtept", "trkpt"):
                        continue
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
                            "seq": seq,
                            "lon": float(el.attrib["lon"]),
                            "lat": float(el.attrib["lat"]),
                            "ele": ele,
                            "time": time,
                            "name": name,
                        }
                    )
                    seq += 1
            yield pd.DataFrame(rows, columns=[f.name for f in GPX_SCHEMA])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, GPX_SCHEMA)


def gpx_tracks_to_wkt(points: DataFrame) -> DataFrame:
    """Collapse trkpt rows into one LINESTRING WKT per source file —
    ready for the geometry joins (the reference emits one track feature
    per GPX track the same way)."""
    from pyspark.sql import functions as F

    pts = points.filter(F.col("kind") == "trkpt")
    return (
        pts.groupBy("source_file")
        .agg(
            F.concat(
                F.lit("LINESTRING ("),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seq", "lon", "lat"))
                        ),
                        lambda s: F.concat(
                            s["lon"].cast("string"), F.lit(" "), s["lat"].cast("string")
                        ),
                    ),
                    ", ",
                ),
                F.lit(")"),
            ).alias("wkt"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
