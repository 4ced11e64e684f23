"""Image feature vectors (color histograms) + content similarity search.

Bridges the image payload into the engine's ANN family: decode → a
64-dim color-histogram embedding (4x4x4 RGB bins, L2-normalized) →
`operators.similarity` / the stored IVF+PQ layout (`sources.vectors`).
At 10^12 images the feature pass is one Arrow-batched map over the
image table (no shuffle), and search runs on whichever ANN tier fits:
brute cosine (labeled oracle), LSH buckets, IVF lists, or the written
IVF+PQ store with partition-pruned probes.

Histogram features are the classic pre-deep-learning content descriptor
(Swain & Ballard color indexing); they are deterministic pure-numpy, so
tests pin exact parity against a driver-side oracle.  A production
deployment swaps `histogram64` for a real model embedding behind the
same (id, embedding) contract — everything downstream is unchanged.

Reference parity note: GeoWave stores raster content but has no
content-based image retrieval; this is training-data-pipeline extension
surface (SURVEY "beyond the reference"), sharing the audited ANN plans
with the text/embedding path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity
from . import imagecodec as codec

BINS = 4  # per channel → BINS**3 = 64-dim feature, matching similarity.DIM


def histogram64(arr: np.ndarray) -> np.ndarray:
    """L2-normalized 64-dim RGB color histogram of an (h, w, 3) uint8 array.

    Deterministic pure-numpy reference — the Spark path calls exactly this
    per row, so driver-side recomputation is a bit-exact oracle.  Bin =
    (r//64)*16 + (g//64)*4 + (b//64); counts normalized to unit L2 so
    cosine similarity is the inner product of the stored vectors."""
    q = (arr.astype(np.int64) // (256 // BINS)).clip(0, BINS - 1)
    idx = q[..., 0] * BINS * BINS + q[..., 1] * BINS + q[..., 2]
    h = np.bincount(idx.ravel(), minlength=BINS**3).astype(np.float64)
    n = float(np.sqrt((h * h).sum()))
    return h / n if n > 0 else h


def compute_features(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    out_col: str = "embedding",
    on_error: str = "fail",
) -> DataFrame:
    """(id, embedding array<float>): decode + featurize, Arrow-batched.

    One mapInPandas pass (no per-row Python UDFs — input_hint mandate);
    output schema matches the embeddings table contract, so the result
    drops into cosine_topk / lsh_ann_topk / ivf_ann_topk /
    write_vectors_ivf unchanged.

    ``on_error``: corrupt-payload policy — "fail" (default) propagates,
    "null" emits a NULL embedding for the bad row, "skip" drops it (see
    phash.compute_phash — one policy across the decode-bound operators)."""
    if on_error not in ("fail", "null", "skip"):
        raise ValueError(f"on_error must be fail|null|skip, got {on_error!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, b, f in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                if on_error == "fail":
                    v = histogram64(codec.decode_image(b, f)).astype(np.float32).tolist()
                else:
                    try:
                        v = histogram64(codec.decode_image(b, f)).astype(np.float32).tolist()
                    except Exception:
                        if on_error == "skip":
                            continue
                        v = None
                ids.append(i)
                feats.append(v)
            yield pd.DataFrame({id_col: ids, out_col: feats})

    from .phash import ensure_decode_splits

    return ensure_decode_splits(df.select(id_col, bytes_col, fmt_col)).mapInPandas(
        fn, f"{id_col} string, {out_col} array<float>"
    )


def image_similarity_topk(
    images: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Content-based image retrieval: (query_id, image_id, cos_mu, rank).

    Features both sides, then brute-force cosine top-k (the labeled exact
    tier: one codegen scan x broadcast queries — zero shuffle until the
    tiny per-query top-k).  For 10^12-image corpora, write the corpus
    features once with `sources.vectors.write_vectors_ivf` and probe with
    `stored_ann_topk` instead — identical (id, embedding) contract."""
    corpus = compute_features(images, id_col, bytes_col, fmt_col, out_col="embedding")
    qf = compute_features(queries, id_col, bytes_col, fmt_col, out_col="embedding")
    return similarity.cosine_topk(
        corpus, qf, k=k, id_col=id_col, query_id="query_id", vec_col="embedding"
    )
