"""Corrupt-payload policy for the decode-bound operators.

At 10^12 rows a handful of corrupt blobs must not kill a cluster-day of
work: compute_phash / compute_features take on_error in {fail, null,
skip}, and decode_health is the never-raising audit pass that makes the
bad-id set a joinable frame."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec as codec
from geowave_spark.functions import imagefeat as feat
from geowave_spark.functions import multimodal as mm
from geowave_spark.functions import phash as ph
from geowave_spark.sources import images as src


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [src.row_for(i) for i in range(30)]
    rows.append({**src.row_for(100), "image_id": "bad:truncated",
                 "bytes": src.row_for(100)["bytes"][:20]})
    rows.append({**src.row_for(101), "image_id": "bad:garbage",
                 "bytes": b"\x00\x01\x02 not an image"})
    rows.append({**src.row_for(102), "image_id": "bad:wrongfmt", "fmt": "webp"})
    return spark.createDataFrame(pd.DataFrame(rows), src.SCHEMA)


BAD = {"bad:truncated", "bad:garbage", "bad:wrongfmt"}


def test_fail_mode_propagates(spark, corpus):
    with pytest.raises(Exception):
        ph.compute_phash(corpus).count()
    with pytest.raises(Exception):
        feat.compute_features(corpus).count()


def test_null_mode_marks_exactly_the_bad_rows(spark, corpus):
    got = ph.compute_phash(corpus, on_error="null").collect()
    assert len(got) == 33
    assert {r["image_id"] for r in got if r["phash64"] is None} == BAD
    fg = feat.compute_features(corpus, on_error="null").collect()
    assert {r["image_id"] for r in fg if r["embedding"] is None} == BAD


def test_skip_mode_drops_only_the_bad_rows(spark, corpus):
    got = ph.compute_phash(corpus, on_error="skip").collect()
    assert len(got) == 30 and not any(r["image_id"] in BAD for r in got)
    # values identical to the clean corpus pass
    clean = {r["image_id"]: r["phash64"] for r in ph.compute_phash(
        corpus.filter(~F.col("image_id").startswith("bad:"))).collect()}
    assert {r["image_id"]: r["phash64"] for r in got} == clean


def test_neardup_pipeline_survives_null_signatures(spark, corpus):
    sigs = ph.compute_phash(corpus, on_error="null")
    pairs = ph.image_neardup_pairs(corpus, signatures=sigs)
    pairs.count()  # must not raise on the NULL rows; nulls never band


def test_decode_health_audit(spark, corpus):
    h = {r["image_id"]: r for r in mm.decode_health(corpus).collect()}
    assert len(h) == 33
    for i, r in h.items():
        if i in BAD:
            assert not r["ok"] and r["error"]
        else:
            assert r["ok"] and r["error"] is None
    # the error text names the failure class
    assert "NotImplementedError" in h["bad:wrongfmt"]["error"]


def test_on_error_validation():
    with pytest.raises(ValueError, match="fail|null|skip"):
        ph.compute_phash(None, on_error="ignore")
    with pytest.raises(ValueError, match="fail|null|skip"):
        feat.compute_features(None, on_error="ignore")


# ---------------------------------------------------------------------------
# r4 ADVICE: corrupt payloads must raise the module's DESCRIPTIVE ValueError
# (never IndexError / struct.error / 'negative shift count') so audit rows
# carry useful text
# ---------------------------------------------------------------------------


def _entropy_truncations():
    """JPEG bytes cut inside the entropy-coded segment, various offsets."""
    import numpy as np

    from geowave_spark.functions import jpegcodec as jc
    from geowave_spark.sources import images as src2

    arr = src2.pixels_for(3)
    full = jc.encode_jpeg(arr, quality=90)
    sos = full.find(b"\xff\xda")
    assert sos > 0
    start = sos + 2 + int.from_bytes(full[sos + 2:sos + 4], "big")
    return [full[:k] for k in range(start + 1, len(full) - 2, 97)]


def test_jpeg_truncated_entropy_is_descriptive_valueerror():
    from geowave_spark.functions import jpegcodec as jc

    hit = 0
    for blob in _entropy_truncations():
        try:
            jc.decode_jpeg(blob)
        except ValueError:
            hit += 1
        # no IndexError / struct.error may escape — pytest would fail loudly
    assert hit > 0  # at least some cuts must be detected as corrupt


def test_gif_first_code_out_of_range_is_valueerror():
    from geowave_spark.functions import mediacodec as mc

    # min_code=2 -> CLEAR=4, EOI=5, table has 6 entries; first code 7 is
    # out of range while prev is None (the formerly-IndexError path)
    import numpy as np

    packed = bytes([0b00000111])  # 3-bit code 7, LSB-first
    with pytest.raises(ValueError, match="corrupt GIF LZW stream"):
        mc._gif_lzw_decode(2, packed, 16)


def test_wav_truncated_fmt_chunk_is_valueerror():
    import struct

    from geowave_spark.functions import mediacodec as mc

    # fmt chunk declares 16 bytes but the payload is cut after 6
    body = struct.pack("<HHI", 1, 1, 8000)[:6]
    blob = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WAVE" \
        + b"fmt " + struct.pack("<I", 16) + body
    with pytest.raises(ValueError, match="truncated WAV fmt chunk"):
        mc.decode_wav(blob)
