"""Materialized image-signature artifact — the driver-oracle input for the
perceptual-dedup / retrieval legs of ``image_codec``.

Round-4 verdict ask #1: the one remaining ``no_oracle`` driver row was the
image pipeline, whose upstream (the from-scratch codecs) DuckDB cannot
re-run.  The fix mirrors how ``ann_ivf_pq`` became oracle-exact: freeze the
engine-computed per-image signatures into a deterministic parquet artifact
that BOTH sides consume —

* the Spark query keeps running the full distributed pipeline
  (decode → pHash/feature extraction → banding → clustering → retrieval);
* the DuckDB oracle reads this artifact with ``read_parquet`` and
  recomputes every DOWNSTREAM stage (hamming pairs, connected components,
  quality keep, caption conflicts, cosine top-k) in pure SQL.

A hash match therefore certifies two independent facts: (a) the
distributed Arrow decode path reproduces the local per-image reference
functions bit-for-bit (``phash.phash64_pixels`` / ``imagefeat.histogram64``
/ ``multimodal._resize_nn`` are called per row by both), and (b) the
banding / CC / keep / conflict / retrieval logic agrees with an
independent SQL formulation.  The only self-certified surface left is the
raw codec byte math, which tests/test_codec.py, test_jpeg.py (PSNR,
roundtrip, 30k-case fuzz) pin.

Generation is pure numpy/pandas/pyarrow over the deterministic fixture
(sources/images.row_for, seed 42) — 310 rows, no Spark needed — so
``build_oracles()`` can ensure the artifact exists regardless of whether
the driver evaluates the oracle before or after the Spark query.

Reference parity note: GeoWave has no perceptual image dedup; this is the
training-data-pipeline extension surface (SURVEY "beyond the reference").
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd

from ..functions import imagecodec as codec
from ..functions.imagefeat import histogram64
from ..functions.multimodal import _resize_nn
from ..functions.phash import phash64_pixels
from . import images as img

VERSION = "v1"
N_BASE = 300   # the image_codec corpus: first 300 fixture rows ...
N_DUP = 10     # ... plus 10 planted lossless re-encodes (near-dup seeds)
N_DECODE = 300  # decode-stats leg covers the full base
N_RESIZE = 200  # resize leg covers the first 200 base rows
RESIZE_W, RESIZE_H = 16, 12
DUP_CAPTION = "planted re-encode"


def corpus_rows(seed: int = img.SEED) -> list[dict]:
    """The exact 310-row corpus q_image_codec assembles: fixture rows
    0..N_BASE-1 plus N_DUP planted BMP re-encodes of rows 0..N_DUP-1."""
    rows = [img.row_for(i, seed) for i in range(N_BASE)]
    for i in range(N_DUP):
        arr = img.pixels_for(i, seed)
        rows.append(
            {
                "image_id": f"dup:img{i:010d}",
                "bytes": codec.encode_image(arr, "bmp"),
                "w": arr.shape[1],
                "h": arr.shape[0],
                "fmt": "bmp",
                "caption": DUP_CAPTION,
                "phash": 0,
            }
        )
    return rows


def _mu_local(x: float) -> int:
    # bit-twin of entry_queries._mu: floor(x * 1e6 + 0.5) over float64
    return int(np.floor(x * 1e6 + 0.5))


def build_frame(seed: int = img.SEED) -> pd.DataFrame:
    """One row per corpus image with every engine-computed signature the
    oracle legs need.  Calls the SAME per-image numpy reference functions
    the Arrow-batched Spark passes call per row."""
    recs = []
    for r in corpus_rows(seed):
        arr = codec.decode_image(r["bytes"], r["fmt"])
        means = arr.reshape(-1, 3).mean(axis=0)  # geo_udfs.decode_mean_pixel
        # imagefeat.compute_features stores float32; cosine folds run on
        # the double upcast of those floats — freeze exactly that.
        feat = histogram64(arr).astype(np.float32).astype(np.float64)
        resized = _resize_nn(arr, RESIZE_W, RESIZE_H)
        recs.append(
            {
                "image_id": r["image_id"],
                "phash64": phash64_pixels(arr),
                "w": int(r["w"]),
                "h": int(r["h"]),
                "caption": r["caption"],
                "feature": feat.tolist(),
                "mean_r_mu": _mu_local(float(means[0])),
                "mean_g_mu": _mu_local(float(means[1])),
                "resize_crc": zlib.crc32(codec.encode_image(resized, "png")),
            }
        )
    recs.sort(key=lambda d: d["image_id"])
    return pd.DataFrame(recs)


def sig_path(root: str, seed: int = img.SEED) -> str:
    return os.path.join(root, f"imgsig_{VERSION}_s{seed}.parquet")


def ensure_sig_artifact(root: str, seed: int = img.SEED) -> str:
    """Write-once deterministic artifact (single parquet file, atomic
    tmp+rename so a concurrent Spark query / oracle build cannot observe a
    partial file).  Safe to call from both build_oracles() and the query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    path = sig_path(root, seed)
    if not os.path.exists(path):
        table = pa.Table.from_pandas(build_frame(seed), preserve_index=False)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path
