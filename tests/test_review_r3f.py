"""Round-3 sixth-batch review regressions: ANSI-safe cosine, stored-layout
column contract, ingest id/WKT edge cases, st helper-column leaks, and the
streaming broadcast pin."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.operators import similarity as sim
from geowave_spark.operators import spatiotemporal as st
from geowave_spark.sources import ingest_formats as fmts
from geowave_spark.sources import vectors as vec


# --- ANSI-safe cosine ---------------------------------------------------------

def test_zero_norm_embedding_does_not_crash(spark):
    """Spark 4 ANSI mode: a bare division would raise DIVIDE_BY_ZERO on the
    first all-zero vector.  cosine_mu defines it as cos 0 (ranked last)."""
    vs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cos_mu"] for r in sim.cosine_topk(vs, qs, k=3).collect()}
    assert got[1] == 0          # zero-norm clamps to 0, not a crash
    assert got[0] == 1_000_000  # exact self-cosine
    assert got[1] < got[2]      # degenerate vector ranks below real ones


def test_nan_component_does_not_crash(spark):
    vs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>",
    )
    qs = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["cos_mu"] for r in sim.cosine_topk(vs, qs, k=2).collect()}
    assert got[1] == 0


# --- PQ train small inputs ----------------------------------------------------

def test_pq_train_fewer_rows_than_k(spark):
    vs = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    books = sim.pq_train(vs, m=2, k=16)  # 5 rows < k=16 must not raise
    assert books.shape == (2, 16, 2)


def test_pq_train_empty_raises(spark):
    vs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        sim.pq_train(vs, m=2, k=4)


# --- stored IVF+PQ layout contract ---------------------------------------------

def test_stored_ann_custom_column_names(spark, tmp_path):
    """write_vectors_ivf normalizes storage to vec_id/embedding; the probe
    must work when the ORIGINAL frames used different names."""
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(8).tolist()) for i in range(64)]
    df = spark.createDataFrame(rows, "pid long, emb array<double>")
    path = str(tmp_path / "ann_custom")
    vec.write_vectors_ivf(df, path, n_lists=4, pq_m=2, pq_k=8, id_col="pid", vec_col="emb")
    out = vec.stored_ann_topk(
        spark, path, df.limit(2), k=3, n_probe=4, id_col="pid", vec_col="emb"
    )
    got = out.collect()
    assert len(got) == 6
    assert set(out.columns) == {"query_id", "vec_id", "cos_mu", "rank"}
    # self-match at rank 1 with exact cosine 1.0
    r1 = {r["query_id"]: r["vec_id"] for r in got if r["rank"] == 1}
    assert r1 == {0: 0, 1: 1}


def test_write_vectors_ivf_forwards_seed(spark, tmp_path):
    """Different seeds must produce different PQ codebooks (the sidecar's
    recorded seed must describe the artifacts it sits next to)."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(8).tolist()) for i in range(128)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1 = vec.write_vectors_ivf(df, str(tmp_path / "s1"), n_lists=2, pq_m=2, pq_k=8, seed=1)
    m2 = vec.write_vectors_ivf(df, str(tmp_path / "s2"), n_lists=2, pq_m=2, pq_k=8, seed=2)
    assert not np.array_equal(np.asarray(m1["codebooks"]), np.asarray(m2["codebooks"]))


# --- ingest format edge cases ---------------------------------------------------

def test_geojsonl_ids_unique_across_files(spark, tmp_path):
    """Two ndjson files of id-less features must not collide on feature_id,
    and source_file must carry the real path."""
    feat = '{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0]},"properties":{}}'
    for name in ("a.geojsonl", "b.geojsonl"):
        (tmp_path / name).write_text(feat + "\n" + feat + "\n")
    out = fmts.read_geojsonl(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert len({r["feature_id"] for r in out}) == 4
    assert all(r["source_file"].endswith(".geojsonl") for r in out)


def test_gpx_single_point_track_emits_point(spark, tmp_path):
    gpx = (
        '<?xml version="1.0"?><gpx xmlns="http://www.topografix.com/GPX/1/1">'
        '<trk><trkseg><trkpt lon="3.5" lat="-1.25"></trkpt></trkseg></trk></gpx>'
    )
    (tmp_path / "one.gpx").write_text(gpx)
    pts = fmts.read_gpx(spark, str(tmp_path))
    trk = fmts.gpx_tracks_to_wkt(pts).collect()
    assert len(trk) == 1
    assert trk[0]["wkt"] == "POINT (3.5 -1.25)"
    assert trk[0]["n_points"] == 1
    # and the WKT parses in the engine's kernel
    from geowave_spark import geom

    g = geom.geometry_from_wkt(trk[0]["wkt"])
    assert g is not None


def test_geolife_trajectory_id_layout_and_fallback(spark, tmp_path):
    line = "39.9,116.3,0,200,39000.5,2010-01-01,12:00:00\n"
    d1 = tmp_path / "017" / "Trajectory"
    d1.mkdir(parents=True)
    (d1 / "20100101.plt").write_text(line)
    d2 = tmp_path / "flat"
    d2.mkdir()
    (d2 / "x.plt").write_text(line)
    out = fmts.read_geolife(spark, str(tmp_path / "*" / "**")).collect()
    ids = {r["trajectory_id"] for r in out}
    assert "017/20100101" in ids
    # non-matching layout falls back to the full path, never ''
    assert "" not in ids
    assert any(i.endswith("x.plt") for i in ids)


# --- spatio-temporal contracts ---------------------------------------------------

def test_st_range_query_returns_caller_schema(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 10.0, "2021-06-01 00:00:00")],
        "event_id long, lon double, lat double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = st.st_range_query(df, (0.0, 0.0, 20.0, 20.0), 0, 10**18)
    assert set(out.columns) == {"event_id", "lon", "lat", "ts"}
    assert out.count() == 1


def test_st_join_broadcast_carries_time(spark):
    pts = spark.createDataFrame(
        [(1, 5.0, 5.0, "2021-06-01 00:00:00"), (2, 5.0, 5.0, "2023-06-01 00:00:00")],
        "event_id long, lon double, lat double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    t0 = 1_600_000_000 * 10**6
    t1 = 1_650_000_000 * 10**6  # covers 2021, not 2023
    polys = spark.createDataFrame(
        [("z", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", t0, t1)],
        "polygon_id string, wkt string, t0_us long, t1_us long",
    )
    got = st.st_join(pts, polys).collect()
    assert [(r["event_id"], r["polygon_id"]) for r in got] == [(1, "z")]


# --- streaming broadcast pin ------------------------------------------------------

def test_streaming_join_rejects_unbroadcastable_polygons(spark, monkeypatch):
    from geowave_spark.operators import spatial_join
    from geowave_spark.streaming import ingest as singest

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(F.col("value").alias("image_id"), F.lit(1.0).alias("lon"), F.lit(1.0).alias("lat"))
    )
    polys = spark.createDataFrame(
        [("p", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")], "polygon_id string, wkt string"
    )
    monkeypatch.setattr(spatial_join, "probe_broadcastable", lambda *a, **k: False)
    with pytest.raises(ValueError, match="too large to broadcast"):
        singest.streaming_spatial_join(stream, polys)
