"""Avro OCF ingest: pure-Python decoder vs an independent test-side encoder.

The encoder below is written directly from the Avro spec's binary-encoding
section (zigzag varints, blocks, sync markers) and shares no code with the
reader — matching fixtures therefore check both directions of the format.
Fixture schemas mirror the reference's staging schemas
(tdrivepoint.avsc, wholefile.avsc)."""

from __future__ import annotations

import json
import os
import struct
import sys
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.sources import avro


# --- independent encoder (spec-derived, no shared code with the reader) ---

def _zz(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _zz(len(b)) + b


def _enc_bytes(b: bytes) -> bytes:
    return _zz(len(b)) + b


def _enc(value, schema, env=None):
    env = {} if env is None else env
    if isinstance(schema, str):
        prims = {
            "null": lambda v: b"",
            "boolean": lambda v: b"\x01" if v else b"\x00",
            "int": _zz,
            "long": _zz,
            "float": lambda v: struct.pack("<f", v),
            "double": lambda v: struct.pack("<d", v),
            "bytes": _enc_bytes,
            "string": _enc_str,
        }
        if schema in prims:
            return prims[schema](value)
        return _enc(value, env[schema], env)  # named-type reference
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if (value is None) == (branch == "null"):
                if value is None or branch != "null":
                    return _zz(i) + _enc(value, branch, env)
        raise AssertionError("no union branch")
    t = schema["type"]
    if t in ("record", "enum", "fixed"):
        env[schema["name"]] = schema
    if t == "record":
        return b"".join(_enc(value[f["name"]], f["type"], env) for f in schema["fields"])
    if t == "enum":
        return _zz(schema["symbols"].index(value))
    if t == "fixed":
        assert len(value) == schema["size"]
        return value
    if t == "array":
        if not value:
            return _zz(0)
        return _zz(len(value)) + b"".join(_enc(v, schema["items"], env) for v in value) + _zz(0)
    if t == "map":
        if not value:
            return _zz(0)
        body = b"".join(_enc_str(k) + _enc(v, schema["values"], env) for k, v in value.items())
        return _zz(len(value)) + body + _zz(0)
    raise AssertionError(f"enc: {schema}")


def write_ocf(path, schema_json: str, records: list, codec: str = "null",
              block_size: int = 2) -> None:
    schema = json.loads(schema_json)
    sync = bytes(range(16))
    enc_env: dict = {}
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out = bytearray(b"Obj\x01")
    out += _zz(len(meta))
    for k, v in meta.items():
        out += _enc_str(k) + _enc_bytes(v)
    out += _zz(0)
    out += sync
    for i in range(0, len(records), block_size):
        chunk = records[i : i + block_size]
        data = b"".join(_enc(r, schema, enc_env) for r in chunk)
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += _zz(len(chunk)) + _zz(len(data)) + data + sync
    with open(path, "wb") as f:
        f.write(out)


TDRIVE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "AvroTdrivePoint",
        "namespace": "org.locationtech.geowave.format.tdrive",
        "fields": [
            {"name": "taxiid", "type": "int"},
            {"name": "pointinstance", "type": "long"},
            {"name": "timestamp", "type": "long"},
            {"name": "latitude", "type": "double"},
            {"name": "longitude", "type": "double"},
        ],
    }
)

WHOLEFILE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "AvroWholeFile",
        "namespace": "org.locationtech.geowave.core.ingest.avro",
        "fields": [
            {"name": "originalFile", "type": "bytes"},
            {"name": "originalFilePath", "type": ["string", "null"]},
        ],
    }
)


def _tdrive_records(n, base=0):
    return [
        {
            "taxiid": base + i,
            "pointinstance": i,
            "timestamp": 1201955448000 + i * 1000,
            "latitude": 39.88 + i * 0.001,
            "longitude": 116.37 - i * 0.001,
        }
        for i in range(n)
    ]


def test_read_avro_tdrive_multifile_deflate(spark, tmp_path):
    write_ocf(tmp_path / "a.avro", TDRIVE_SCHEMA, _tdrive_records(5), codec="null")
    write_ocf(tmp_path / "b.avro", TDRIVE_SCHEMA, _tdrive_records(7, base=100),
              codec="deflate", block_size=3)
    df = avro.read_avro(spark, str(tmp_path / "*.avro"))
    rows = df.orderBy("taxiid").collect()
    assert [r["taxiid"] for r in rows] == list(range(5)) + list(range(100, 107))
    r0 = rows[0]
    assert r0["pointinstance"] == 0 and r0["timestamp"] == 1201955448000
    assert r0["latitude"] == pytest.approx(39.88) and r0["longitude"] == pytest.approx(116.37)
    assert rows[-1]["latitude"] == pytest.approx(39.886)
    # schema came from the header: all five typed columns + provenance
    assert set(df.columns) == {
        "source_file", "taxiid", "pointinstance", "timestamp", "latitude", "longitude"
    }
    assert dict(df.dtypes)["taxiid"] == "int" and dict(df.dtypes)["latitude"] == "double"


def test_read_avro_union_null_and_bytes(spark, tmp_path):
    recs = [
        {"originalFile": b"\x00\x01\xffpayload", "originalFilePath": "/data/a.gpx"},
        {"originalFile": b"", "originalFilePath": None},
    ]
    write_ocf(tmp_path / "wf.avro", WHOLEFILE_SCHEMA, recs)
    df = avro.read_avro(spark, str(tmp_path / "wf.avro"))
    rows = df.orderBy("originalFilePath").collect()
    got = {(bytes(r["originalFile"]), r["originalFilePath"]) for r in rows}
    assert got == {(b"\x00\x01\xffpayload", "/data/a.gpx"), (b"", None)}


def test_read_avro_nested_types(spark, tmp_path):
    schema = json.dumps(
        {
            "type": "record",
            "name": "Nest",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "props", "type": {"type": "map", "values": "double"}},
                {"name": "kind", "type": {"type": "enum", "name": "K",
                                          "symbols": ["A", "B"]}},
                {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
                {
                    "name": "pt",
                    "type": {
                        "type": "record",
                        "name": "Pt",
                        "fields": [
                            {"name": "x", "type": "double"},
                            {"name": "y", "type": "double"},
                        ],
                    },
                },
                {"name": "pt2", "type": ["null", "Pt"]},
            ],
        }
    )
    recs = [
        {
            "id": 1, "tags": ["a", "b"], "props": {"w": 1.5},
            "kind": "B", "fp": b"\x01\x02\x03\x04",
            "pt": {"x": 1.0, "y": 2.0}, "pt2": {"x": 3.0, "y": 4.0},
        },
        {
            "id": 2, "tags": [], "props": {},
            "kind": "A", "fp": b"\xff\xfe\xfd\xfc",
            "pt": {"x": -1.0, "y": -2.0}, "pt2": None,
        },
    ]
    write_ocf(tmp_path / "n.avro", schema, recs)
    df = avro.read_avro(spark, str(tmp_path / "n.avro"))
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["tags"] == ["a", "b"] and rows[2]["tags"] == []
    assert rows[1]["props"] == {"w": 1.5} and rows[2]["props"] == {}
    assert rows[1]["kind"] == "B" and bytes(rows[2]["fp"]) == b"\xff\xfe\xfd\xfc"
    assert rows[1]["pt"]["y"] == 2.0 and rows[1]["pt2"]["x"] == 3.0
    assert rows[2]["pt2"] is None


def test_read_avro_errors(spark, tmp_path):
    # bad magic
    (tmp_path / "bad.avro").write_bytes(b"NOPE" + b"\x00" * 32)
    with pytest.raises(Exception, match="bad magic"):
        avro.read_avro(spark, str(tmp_path / "bad.avro"))
    # unsupported codec is loud
    write_ocf(tmp_path / "s.avro", TDRIVE_SCHEMA, _tdrive_records(1), codec="snappy")
    with pytest.raises(Exception, match="codec"):
        avro.read_avro(spark, str(tmp_path / "s.avro"))
    # multi-branch non-null union is loud, not stringified
    sch = json.dumps(
        {"type": "record", "name": "U",
         "fields": [{"name": "v", "type": ["int", "string"]}]}
    )
    write_ocf(tmp_path / "u.avro", sch, [{"v": 3}])
    with pytest.raises(Exception, match="union"):
        avro.read_avro(spark, str(tmp_path / "u.avro"))


def test_avro_feeds_tdrive_contract(spark, tmp_path):
    """The staged-avro path lands in the same column contract as the
    delimited T-Drive plugin, so downstream joins/indexing are identical."""
    from pyspark.sql import functions as F

    write_ocf(tmp_path / "t.avro", TDRIVE_SCHEMA, _tdrive_records(4))
    df = avro.read_avro(spark, str(tmp_path / "t.avro"))
    out = df.select(
        "source_file",
        F.col("taxiid").cast("long").alias("taxi_id"),
        F.timestamp_millis(F.col("timestamp")).alias("ts"),
        F.col("longitude").alias("lon"),
        F.col("latitude").alias("lat"),
    )
    assert out.filter(F.col("lon").isNotNull() & F.col("ts").isNotNull()).count() == 4


def test_recursive_schema_rejected_loudly():
    """Self-referential records are legal Avro but have no Spark
    StructType equivalent — the module's 'reject loudly' convention must
    name recursion, not leak json.dumps' circular-reference error."""
    import json

    import pytest

    from geowave_spark.sources.avro import AvroError, parse_schema

    rec = {
        "type": "record", "name": "Node",
        "fields": [{"name": "v", "type": "int"},
                   {"name": "next", "type": ["null", "Node"]}],
    }
    with pytest.raises(AvroError, match="recursive"):
        parse_schema(json.dumps(rec))
    # non-recursive reuse of a named sibling type stays legal
    ok = [
        {"type": "record", "name": "P", "fields": [{"name": "x", "type": "double"}]},
        {"type": "record", "name": "Q",
         "fields": [{"name": "a", "type": "P"}, {"name": "b", "type": "P"}]},
    ]
    assert parse_schema(json.dumps(ok))["name"] == "Q"
