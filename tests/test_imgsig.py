"""Materialized image-signature artifact (sources/imgsig.py).

The artifact is the driver-oracle input for image_codec's perceptual legs;
these tests pin the two facts the oracle design rests on:

1. generation is deterministic and idempotent (both build_oracles() and
   the Spark query may race to create it — whoever wins, same bytes);
2. the DISTRIBUTED Arrow passes (compute_phash / compute_features /
   decode means / resize crc) reproduce the locally-frozen signatures
   bit-for-bit — so an oracle hash match certifies the cluster path, not
   just the local reference functions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from geowave_spark.sources import images as img
from geowave_spark.sources import imgsig


@pytest.fixture(scope="module")
def frame() -> pd.DataFrame:
    return imgsig.build_frame()


def test_deterministic_and_idempotent(tmp_path, frame):
    p1 = imgsig.ensure_sig_artifact(str(tmp_path))
    mtime = os.path.getmtime(p1)
    p2 = imgsig.ensure_sig_artifact(str(tmp_path))
    assert p1 == p2 and os.path.getmtime(p2) == mtime  # write-once
    stored = pd.read_parquet(p1)
    rebuilt = imgsig.build_frame()
    pd.testing.assert_frame_equal(stored, rebuilt)


def test_corpus_shape(frame):
    assert len(frame) == imgsig.N_BASE + imgsig.N_DUP
    assert list(frame["image_id"]) == sorted(frame["image_id"])
    dups = frame[frame["image_id"].str.startswith("dup:")]
    assert len(dups) == imgsig.N_DUP
    assert (dups["caption"] == imgsig.DUP_CAPTION).all()
    # planted re-encodes hash identically to losslessly-stored sources and
    # within a few bits of jpeg-stored ones (PSNR>=40 decode)
    for i in range(imgsig.N_DUP):
        a = frame.loc[frame.image_id == f"dup:img{i:010d}", "phash64"].item()
        b = frame.loc[frame.image_id == f"img{i:010d}", "phash64"].item()
        if img._FMT[i % 3] == "jpeg":
            assert bin(a ^ b).count("1") <= 4
        else:
            assert a == b


def test_distributed_parity(spark, frame):
    """The Arrow-batched Spark passes reproduce the artifact bit-exactly."""
    from pyspark.sql import functions as F

    from geowave_spark.functions import geo_udfs
    from geowave_spark.functions import multimodal as mm
    from geowave_spark.functions import phash as ph
    from geowave_spark.functions.imagefeat import compute_features

    corpus = spark.createDataFrame(imgsig.corpus_rows(), img.SCHEMA)
    local = frame.set_index("image_id")

    hashes = {r["image_id"]: r["phash64"] for r in ph.compute_phash(corpus).collect()}
    assert hashes == local["phash64"].to_dict()

    feats = {r["image_id"]: r["embedding"] for r in compute_features(corpus).collect()}
    for iid, f32 in feats.items():
        np.testing.assert_array_equal(
            np.asarray(f32, dtype=np.float64), np.asarray(local.loc[iid, "feature"])
        )

    means = corpus.mapInPandas(
        geo_udfs.decode_mean_pixel,
        "image_id string, mean_r double, mean_g double, mean_b double",
    )
    mu = means.select(
        "image_id",
        F.floor(F.col("mean_r") * 1e6 + F.lit(0.5)).cast("long").alias("r"),
        F.floor(F.col("mean_g") * 1e6 + F.lit(0.5)).cast("long").alias("g"),
    ).collect()
    for r in mu:
        assert r["r"] == local.loc[r["image_id"], "mean_r_mu"]
        assert r["g"] == local.loc[r["image_id"], "mean_g_mu"]

    crc = (
        mm.resize_images(corpus, imgsig.RESIZE_W, imgsig.RESIZE_H)
        .select("image_id", F.crc32("bytes").alias("crc"))
        .collect()
    )
    for r in crc:
        assert r["crc"] == local.loc[r["image_id"], "resize_crc"]


def test_oracle_registered():
    """image_codec is an oracle-backed driver row (r4 verdict ask #1)."""
    from geowave_spark import entry_queries as eq

    oracles = eq.build_oracles()
    assert "image_codec" in oracles
    assert "read_parquet" in oracles["image_codec"]
    # every queries() entry now has an oracle twin: the no_oracle tail is gone
    assert set(eq.QUERIES) == set(oracles)
