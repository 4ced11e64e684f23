"""Multimodal opaque-binary column operators — decode / resize /
feature-extract / frame-sample over `mapInPandas`.

Per the engine brief: image/audio/video payloads are opaque `binary`
columns with typed metadata; the Spark-side plumbing (schemas, Arrow batch
shapes, partition behavior) is REAL and tested.  Decoders are implemented
from scratch where the public spec needs no library — PNG/BMP/TIFF/DCT in
imagecodec.py, WAV + animated GIF in mediacodec.py — and stubbed behind
clearly-marked NotImplementedError (with a deterministic fake for tests)
only for the genuinely library-bound ones (mp4/mkv video, mp3/flac audio).

All operators are `mapInPandas` (iterator of pandas batches → iterator of
pandas batches): constant memory per batch, no driver involvement, and at
cluster scale each Arrow batch decodes within one Python worker.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import imagecodec as codec

RESIZED_SCHEMA = "image_id string, w int, h int, fmt string, bytes binary"
FRAMES_SCHEMA = "media_id string, frame_idx int, frame_png binary"
AUDIO_FEAT_SCHEMA = "media_id string, n_windows int, rms_mu long, zcr_mu long"


def _resize_nn(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (no external image libs)."""
    h, w = arr.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h, 0, h - 1).astype(np.int64)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w, 0, w - 1).astype(np.int64)
    return arr[ys][:, xs]


def resize_images(df: DataFrame, out_w: int, out_h: int, out_fmt: str = "png") -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode, one Arrow batch at a
    time (the canonical multimodal transform shape)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = codec.decode_image(bytes(r["bytes"]), r["fmt"])
                out = _resize_nn(arr, out_w, out_h)
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "w": out_w,
                        "h": out_h,
                        "fmt": out_fmt,
                        "bytes": codec.encode_image(out, out_fmt),
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "fmt", "bytes"])

    return df.mapInPandas(fn, RESIZED_SCHEMA)


DECODE_HEALTH_SCHEMA = "image_id string, fmt string, ok boolean, error string"


def decode_health(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Corpus decode audit: (id, fmt, ok, error) per payload.

    The curation pass a 10^12-row ingest runs BEFORE the strict
    (on_error="fail") pipelines: one Arrow-batched attempt-decode per row,
    never raising — corrupt blobs come back as ok=false with the exception
    text, so the bad-id set is a joinable frame rather than a dead job."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b, f in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                try:
                    codec.decode_image(bytes(b), f)
                    rows.append({"image_id": i, "fmt": f, "ok": True, "error": None})
                except Exception as e:
                    rows.append(
                        {"image_id": i, "fmt": f, "ok": False,
                         "error": f"{type(e).__name__}: {e}"[:200]}
                    )
            yield pd.DataFrame(rows, columns=["image_id", "fmt", "ok", "error"])

    return df.select(
        F.col(id_col).alias("image_id"), F.col(bytes_col).alias("bytes"), F.col(fmt_col).alias("fmt")
    ).mapInPandas(fn, DECODE_HEALTH_SCHEMA)


# ---------------------------------------------------------------------------
# Video frame sampling — gif real, ffmpeg-bound formats stubbed
# ---------------------------------------------------------------------------

def decode_video_frames(data: bytes, fmt: str) -> list[np.ndarray]:
    """Motion-format decode: animated GIF is REAL (pure-spec LZW decoder,
    mediacodec.py — full GIF89a semantics: interlace, transparency,
    disposal compositing).  mp4/mkv/webm genuinely require ffmpeg/pyav,
    absent in this container — those stay a clearly-marked stub; replace
    this one branch on a real cluster, everything downstream (sampling,
    schema, batching) is live code either way.
    """
    if fmt == "gif":
        from . import mediacodec

        return mediacodec.decode_gif_frames(data)
    raise NotImplementedError(
        f"video decode for {fmt!r} needs ffmpeg/pyav — not available in this container"
    )


def fake_video_frames(data: bytes, fmt: str) -> list[np.ndarray]:
    """Deterministic fake decoder for tests: derives N 8x8 frames from the
    payload hash so the sampling plumbing is fully exercised."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    n = 4 + seed % 5
    return [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(n)]


def sample_video_frames(
    df: DataFrame,
    every_nth: int = 2,
    media_id: str = "image_id",
    decoder: Callable[[bytes, str], list[np.ndarray]] = decode_video_frames,
) -> DataFrame:
    """(media_id, frame_idx, frame_png) for every n-th frame."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = decoder(bytes(r["bytes"]), r["fmt"])
                for i in range(0, len(frames), every_nth):
                    rows.append(
                        {
                            "media_id": r[media_id],
                            "frame_idx": i,
                            "frame_png": codec.encode_png(frames[i]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_png"])

    return df.mapInPandas(fn, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Audio features — decoder stubbed the same way
# ---------------------------------------------------------------------------

def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Audio decode: WAV (RIFF PCM/float, any bit depth/channels) is REAL
    (mediacodec.decode_wav, mono-mixed float32).  Compressed formats
    (mp3/flac/ogg) require soundfile/librosa, absent here — stubbed."""
    if fmt == "wav":
        from . import mediacodec

        return mediacodec.decode_wav(data)[0]
    raise NotImplementedError(
        f"audio decode for {fmt!r} needs soundfile/librosa — not available in this container"
    )


def fake_audio(data: bytes, fmt: str) -> np.ndarray:
    """Deterministic fake PCM from the payload hash."""
    import hashlib

    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(1600).astype(np.float32)


def audio_features(
    df: DataFrame,
    window: int = 400,
    media_id: str = "image_id",
    decoder: Callable[[bytes, str], np.ndarray] = decode_audio,
) -> DataFrame:
    """Windowed RMS + zero-crossing-rate features (micro-unit ints)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pcm = decoder(bytes(r["bytes"]), r["fmt"])
                n_w = len(pcm) // window
                if n_w == 0:
                    # clip shorter than one window: emit zero features
                    # instead of NaN -> int crash on the whole job
                    rows.append(
                        {"media_id": r[media_id], "n_windows": 0,
                         "rms_mu": 0, "zcr_mu": 0}
                    )
                    continue
                x = pcm[: n_w * window].reshape(n_w, window)
                rms = float(np.sqrt((x**2).mean()))
                zcr = float((np.diff(np.signbit(x), axis=1) != 0).mean())
                rows.append(
                    {
                        "media_id": r[media_id],
                        "n_windows": n_w,
                        "rms_mu": int(np.floor(rms * 1e6 + 0.5)),
                        "zcr_mu": int(np.floor(zcr * 1e6 + 0.5)),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_windows", "rms_mu", "zcr_mu"])

    return df.mapInPandas(fn, AUDIO_FEAT_SCHEMA)
