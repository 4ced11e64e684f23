"""Avro Object Container File ingest → DataFrame (pure-Python decoder).

The reference stages every HDFS ingest through Avro (core/ingest/avro:
GeoWaveAvroFormatPlugin, AbstractStageWholeFileToAvro with wholefile.avsc,
plus per-format schemas like tdrivepoint.avsc and gpxtrack.avsc) and ships
an `avro` ingest format (extensions/formats/avro/GeoWaveAvroIngestPlugin).
This container has neither the spark-avro datasource jar nor a Python avro
library, so — like the shapefile parser — the reader is implemented from
the public spec (Apache Avro 1.11 specification, "Object Container Files"
+ binary encoding): magic ``Obj\\x01``, metadata map carrying
``avro.schema`` / ``avro.codec``, 16-byte sync marker, then blocks of
(count, byte-size, data) with zigzag-varint primitives.

Spark-first shape: ``binaryFile`` scan (one task per .avro file — a
container file is the reference's unit of ingest parallelism too), schema
read ONCE driver-side from the first file (or passed explicitly), block
decode in ``mapInPandas`` batches.  Codecs: null, deflate (raw zlib);
snappy raises clearly (no snappy lib here).

Type mapping: record→struct, union[null, X]→nullable X, enum→string,
fixed/bytes→binary, array→array, map→map; logical types decode as their
underlying primitive (the caller casts — same convention as the delimited
ingest plugins).  Non-null multi-branch unions are rejected loudly rather
than silently stringified.

NOTE the scope cut vs the reference's own `avro` format: GeoWave's
AvroSimpleFeature wraps each attribute as GeoTools-serialized bytes
(adapter/vector/avro/AvroSimpleFeature.avsc `values: array<bytes>` +
GeoWaveAvroFeatureUtils), i.e. the payload is a Java-serialization format,
not Avro data — that stays a documented scope-out.  Generic Avro records
(the tdrive/gpx staging schemas and any user Avro table) decode fully.
"""

from __future__ import annotations

import json
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Binary decoder (Avro spec: binary encoding)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise AvroError("truncated avro data")
        self.pos += n
        return b

    def zlong(self) -> int:
        """Zigzag-encoded variable-length long."""
        shift, acc = 0, 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def zbytes(self) -> bytes:
        n = self.zlong()
        if n < 0:
            raise AvroError("negative byte length")
        return self.read(n)


# ---------------------------------------------------------------------------
# Schema handling: normalize JSON schema + named-type environment


def _normalize(schema, env: dict, namespace: str = "", open_names: set | None = None):
    """Resolve named-type references; return a normalized schema node.

    ``open_names`` tracks records whose fields are mid-normalization: a
    reference back into that set is a RECURSIVE schema — legal Avro, but
    unrepresentable as a Spark StructType (and unserializable by the
    deterministic json.dumps fingerprint) — rejected loudly by the
    module's convention instead of surfacing as 'Circular reference
    detected' from json.dumps or a RecursionError."""
    if open_names is None:
        open_names = set()
    if isinstance(schema, str):
        if schema in (
            "null", "boolean", "int", "long", "float", "double", "bytes", "string",
        ):
            return schema
        full = schema if "." in schema else (f"{namespace}.{schema}" if namespace else schema)
        if full in open_names or schema in open_names:
            raise AvroError(
                f"recursive schema: {schema!r} references itself (directly or "
                "via a cycle) — self-referential Avro records have no Spark "
                "StructType equivalent and are not supported"
            )
        if full in env:
            return env[full]
        if schema in env:
            return env[schema]
        raise AvroError(f"unknown type reference {schema!r}")
    if isinstance(schema, list):
        return [_normalize(s, env, namespace, open_names) for s in schema]
    if not isinstance(schema, dict):
        raise AvroError(f"bad schema node {schema!r}")
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        ns = schema.get("namespace", namespace)
        name = schema["name"]
        full = name if "." in name else (f"{ns}.{name}" if ns else name)
        node = dict(schema)
        env[full] = node
        env.setdefault(name, node)
        if t == "record":
            open_names = open_names | {name, full}
            node["fields"] = [
                {**f, "type": _normalize(f["type"], env, ns, open_names)}
                for f in schema["fields"]
            ]
        return node
    if t == "array":
        return {"type": "array", "items": _normalize(schema["items"], env, namespace, open_names)}
    if t == "map":
        return {"type": "map", "values": _normalize(schema["values"], env, namespace, open_names)}
    if isinstance(t, (dict, list)):
        return _normalize(t, env, namespace, open_names)
    if isinstance(t, str):
        return _normalize(t, env, namespace, open_names)
    raise AvroError(f"bad schema node {schema!r}")


def parse_schema(schema_json):
    """Schema JSON (str or parsed) → normalized node tree.

    A top-level LIST of named schemas (the reference's AvroSimpleFeature.avsc
    layout) normalizes each and returns the LAST — Avro's convention for a
    schema file defining helper records first."""
    s = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    env: dict = {}
    if isinstance(s, list) and s and all(isinstance(x, dict) and "name" in x for x in s):
        out = [_normalize(x, env) for x in s]
        return out[-1]
    return _normalize(s, env)


def _decode(r: _Reader, schema):
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return r.read(1) != b"\x00"
        if schema in ("int", "long"):
            return r.zlong()
        if schema == "float":
            return struct.unpack("<f", r.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", r.read(8))[0]
        if schema == "bytes":
            return r.zbytes()
        if schema == "string":
            return r.zbytes().decode("utf-8")
        raise AvroError(f"unexpected primitive {schema!r}")
    if isinstance(schema, list):  # union: long index then value
        idx = r.zlong()
        if not 0 <= idx < len(schema):
            raise AvroError("union index out of range")
        return _decode(r, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.zlong()]
    if t == "fixed":
        return r.read(int(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:  # block with byte size
                n = -n
                r.zlong()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.zlong()
            for _ in range(n):
                k = r.zbytes().decode("utf-8")
                out[k] = _decode(r, schema["values"])
    raise AvroError(f"unsupported schema node {schema!r}")


# ---------------------------------------------------------------------------
# Container file


def read_header(content: bytes):
    """OCF header → (normalized schema, codec, sync marker, body offset)."""
    if content[:4] != _MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    r = _Reader(content, 4)
    meta = {}
    while True:
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zlong()
        for _ in range(n):
            k = r.zbytes().decode("utf-8")
            meta[k] = r.zbytes()
    sync = r.read(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r} (null/deflate only)")
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    return schema, codec, sync, r.pos


def iter_records(content: bytes):
    """Decode every record of one container file."""
    schema, codec, sync, pos = read_header(content)
    r = _Reader(content, pos)
    while r.pos < len(content):
        count = r.zlong()
        size = r.zlong()
        data = r.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        br = _Reader(data)
        for _ in range(count):
            yield _decode(br, schema)
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch")


# ---------------------------------------------------------------------------
# Avro schema → Spark schema


def _spark_type(schema) -> tuple[T.DataType, bool]:
    prim = {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }
    if isinstance(schema, str):
        return prim[schema], False
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise AvroError(
                "multi-branch non-null unions are not supported "
                f"({[s if isinstance(s, str) else s.get('type') for s in schema]})"
            )
        dt, _ = _spark_type(branches[0])
        return dt, True
    t = schema["type"]
    if t == "record":
        sub = []
        for f in schema["fields"]:
            dt, nullable = _spark_type(f["type"])
            sub.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(sub), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    if t == "array":
        dt, nullable = _spark_type(schema["items"])
        return T.ArrayType(dt, containsNull=nullable), False
    if t == "map":
        dt, nullable = _spark_type(schema["values"])
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    raise AvroError(f"unsupported schema node {schema!r}")


def spark_schema(schema) -> T.StructType:
    """Top-level Avro schema → Spark StructType (record fields become
    columns; a non-record top level becomes one ``value`` column)."""
    if isinstance(schema, dict) and schema.get("type") == "record":
        fields = [T.StructField("source_file", T.StringType())]
        for f in schema["fields"]:
            dt, nullable = _spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields)
    dt, nullable = _spark_type(schema)
    return T.StructType(
        [T.StructField("source_file", T.StringType()), T.StructField("value", dt, nullable)]
    )


# ---------------------------------------------------------------------------
# DataFrame reader


def read_avro(spark: SparkSession, path: str, avro_schema=None) -> DataFrame:
    """Avro container files → DataFrame.

    ``avro_schema``: optional schema JSON (str/dict) — when omitted, the
    schema is read from the header of the first file (one small driver-side
    read, the same single-file schema probe spark-avro performs).  All
    files must share the schema (per-file mismatch raises in the task).
    """
    files = spark.read.format("binaryFile").load(path)
    if avro_schema is None:
        first = files.select("content").first()
        if first is None:
            raise AvroError(f"no files matched {path!r}")
        schema, _, _, _ = read_header(bytes(first["content"]))
    else:
        schema = parse_schema(avro_schema)
    out_schema = spark_schema(schema)
    is_record = isinstance(schema, dict) and schema.get("type") == "record"
    cols = [f.name for f in out_schema.fields]
    want = json.dumps(schema, sort_keys=True)

    def parse(batches):
        for pdf in batches:
            rows = []
            for pth, content in zip(pdf["path"], pdf["content"]):
                fschema, _, _, _ = read_header(bytes(content))
                if json.dumps(fschema, sort_keys=True) != want:
                    raise AvroError(f"schema mismatch in {pth}")
                for rec in iter_records(bytes(content)):
                    if is_record:
                        rows.append({"source_file": pth, **rec})
                    else:
                        rows.append({"source_file": pth, "value": rec})
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                {c: [] for c in cols}
            )

    return files.select("path", "content").mapInPandas(parse, out_schema)
