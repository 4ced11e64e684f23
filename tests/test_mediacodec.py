"""Real WAV + animated-GIF codecs (mediacodec.py) and their wiring into the
multimodal operators: pure-spec decoders for the two media formats that
need no external library, closing the round-3 'video/audio decoders
stubbed' gap for everything that is not genuinely ffmpeg-bound.

Reference note: the reference engine has no audio/video surface; these are
training-data-pipeline extensions over the opaque-binary payload contract
(BASELINE.json input_hint), same shape as the image codecs."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec as codec
from geowave_spark.functions import mediacodec as mc
from geowave_spark.functions import multimodal as mm

# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_pcm16_roundtrip_quantization_bound():
    rng = np.random.default_rng(7)
    pcm = np.clip(rng.standard_normal(16000) * 0.3, -1, 1).astype(np.float32)
    dec, rate = mc.decode_wav(mc.encode_wav(pcm, 8000))
    assert rate == 8000 and len(dec) == 16000
    # 0.5 LSB rounding + the 32767/32768 scale asymmetry at full amplitude
    assert np.abs(dec - pcm).max() <= 1.6 / 32768


def test_wav_stereo_mean_mix():
    rng = np.random.default_rng(8)
    pcm = np.clip(rng.standard_normal(4000) * 0.5, -1, 1).astype(np.float32)
    st = np.stack([pcm, -pcm], axis=1)  # mirrored channels mix to ~0
    dec, rate = mc.decode_wav(mc.encode_wav(st, 44100))
    assert rate == 44100
    assert np.abs(dec).max() <= 1.0 / 32768


def _wav_raw(fmt_tag: int, n_ch: int, rate: int, bits: int, payload: bytes) -> bytes:
    balign = max(1, bits // 8) * n_ch
    fmt = struct.pack("<HHIIHH", fmt_tag, n_ch, rate, rate * balign, balign, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_8bit_unsigned_and_24bit_and_float():
    # 8-bit unsigned: 128 is silence, 255 ≈ +1, 0 = -1
    w8 = _wav_raw(1, 1, 8000, 8, bytes([128, 255, 0, 192]))
    x, _ = mc.decode_wav(w8)
    assert abs(x[0]) < 1e-6 and x[1] > 0.98 and x[2] <= -0.99
    # 24-bit signed little-endian: +2^22 → +0.5, sign wrap for negatives
    v = 1 << 22
    neg = (1 << 24) - v
    w24 = _wav_raw(1, 1, 8000, 24, struct.pack("<I", v)[:3] + struct.pack("<I", neg)[:3])
    x24, _ = mc.decode_wav(w24)
    assert abs(x24[0] - 0.5) < 1e-6 and abs(x24[1] + 0.5) < 1e-6
    # float32 passthrough
    wf = _wav_raw(3, 1, 48000, 32, np.array([0.25, -0.75], "<f4").tobytes())
    xf, rf = mc.decode_wav(wf)
    assert rf == 48000 and np.allclose(xf, [0.25, -0.75])


def test_wav_extensible_resolves_subformat():
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16: base(16) + cbSize/valid/mask(8)
    # + SubFormat GUID(16, leading format code = 1 = PCM)
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    ext += struct.pack("<HHI", 22, 16, 0x4)  # cbSize, wValidBits, channel mask
    ext += struct.pack("<H", 1) + b"\x00" * 14
    payload = np.array([16384, -16384], "<i2").tobytes()
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
    body += b"data" + struct.pack("<I", len(payload)) + payload
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    x, _ = mc.decode_wav(data)
    assert np.allclose(x, [0.5, -0.5])


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        mc.decode_wav(b"OggS" + b"\x00" * 40)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_animated_roundtrip_exact():
    rng = np.random.default_rng(11)
    base = (rng.integers(0, 6, (24, 32, 3)) * 42).astype(np.uint8)
    frames = []
    for k in range(5):
        f = base.copy()
        f[k : k + 4, :, 0] = 252
        frames.append(f)
    out = mc.decode_gif_frames(mc.encode_gif(frames))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_gif_width_growth_and_table_full_exact():
    rng = np.random.default_rng(12)
    huge = rng.integers(0, 250, (200, 300), dtype=np.uint16).astype(np.uint8)
    fh = np.stack([huge, np.zeros_like(huge), np.zeros_like(huge)], axis=2)
    out = mc.decode_gif_frames(mc.encode_gif([fh]))
    assert np.array_equal(out[0], fh)


def test_gif_palette_limit_raises():
    rng = np.random.default_rng(13)
    f = rng.integers(0, 256, (32, 32, 3), dtype=np.uint16).astype(np.uint8)
    with pytest.raises(ValueError, match="quantize"):
        mc.encode_gif([f])


def _manual_gif(
    w: int,
    h: int,
    palette: np.ndarray,
    blocks: list[bytes],
) -> bytes:
    pbits = max(1, int(np.ceil(np.log2(len(palette)))))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1), 0, 0)
    pal = np.zeros((1 << pbits, 3), np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    for b in blocks:
        out += b
    out += b"\x3b"
    return bytes(out)


def _image_block(x0, y0, w, h, idx: np.ndarray, min_code: int, interlace=False) -> bytes:
    out = bytearray(b"\x2c")
    out += struct.pack("<HHHHB", x0, y0, w, h, 0x40 if interlace else 0)
    out += bytes([min_code])
    lzw = mc._gif_lzw_encode(min_code, idx.ravel())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def test_gif_interlaced_decode():
    # rows written in interlace pass order must come back in display order
    rng = np.random.default_rng(14)
    h, w = 11, 7  # odd sizes exercise the pass boundaries
    disp = rng.integers(0, 4, (h, w)).astype(np.uint8)
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    stored = disp[order]  # what an interlacing writer stores
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]], np.uint8)
    gif = _manual_gif(w, h, pal, [_image_block(0, 0, w, h, stored, 2, interlace=True)])
    out = mc.decode_gif_frames(gif)
    assert np.array_equal(out[0], pal[disp])


def test_gif_transparency_and_disposal_compositing():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    # frame 1: full 4x4 red
    f1 = np.full((4, 4), 1, np.uint8)
    # frame 2: 2x2 sub-rectangle at (1,1) with transparent index 0 in one cell
    f2 = np.array([[2, 0], [0, 3]], np.uint8)
    gce_keep = b"\x21\xf9\x04" + bytes([1 << 2, 0, 0, 0]) + b"\x00"  # disposal=1
    gce_trans = b"\x21\xf9\x04" + bytes([(1 << 2) | 1, 0, 0, 0]) + b"\x00"  # transparent idx 0
    gif = _manual_gif(
        4,
        4,
        pal,
        [
            gce_keep,
            _image_block(0, 0, 4, 4, f1, 2),
            gce_trans,
            _image_block(1, 1, 2, 2, f2, 2),
        ],
    )
    out = mc.decode_gif_frames(gif)
    assert len(out) == 2
    assert np.array_equal(out[0], pal[f1])
    want = pal[f1].copy()
    want[1, 1] = pal[2]  # green lands
    want[2, 2] = pal[3]  # blue lands
    # transparent cells keep frame 1's red
    assert np.array_equal(out[1], want)


def test_gce_scope_is_single_image():
    # GIF89a §23: a graphic control extension governs ONLY the next image.
    # Frame 2 reuses index 0 but has NO GCE -> must render opaquely.
    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0]], np.uint8)
    f1 = np.array([[1, 0], [0, 1]], np.uint8)
    f2 = np.array([[0, 0], [2, 2]], np.uint8)
    gce_trans = b"\x21\xf9\x04" + bytes([(1 << 2) | 1, 0, 0, 0]) + b"\x00"  # transp idx 0
    gif = _manual_gif(
        2, 2, pal,
        [gce_trans, _image_block(0, 0, 2, 2, f1, 2), _image_block(0, 0, 2, 2, f2, 2)],
    )
    out = mc.decode_gif_frames(gif)
    # frame 1: index-0 cells transparent over black canvas
    want1 = np.zeros((2, 2, 3), np.uint8)
    want1[0, 0] = pal[1]
    want1[1, 1] = pal[1]
    assert np.array_equal(out[0], want1)
    # frame 2: index 0 is OPAQUE color 9,9,9 (transparency did not stick)
    assert np.array_equal(out[1], pal[f2])


def test_gif_frame_overrunning_screen_is_clipped():
    # broken writers emit frames extending past the logical screen;
    # browsers clip — decode must not crash on the broadcast mismatch
    pal = np.array([[0, 0, 0], [255, 0, 0]], np.uint8)
    f = np.ones((3, 3), np.uint8)
    gif = _manual_gif(2, 2, pal, [_image_block(1, 1, 3, 3, f, 2)])
    out = mc.decode_gif_frames(gif)
    want = np.zeros((2, 2, 3), np.uint8)
    want[1, 1] = pal[1]  # only the in-screen cell lands
    assert np.array_equal(out[0], want)


def test_gif_restore_previous_disposal():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
    f1 = np.full((3, 3), 1, np.uint8)
    f2 = np.full((3, 3), 2, np.uint8)
    f3 = np.full((1, 1), 0, np.uint8)
    gce_restore_prev = b"\x21\xf9\x04" + bytes([3 << 2, 0, 0, 0]) + b"\x00"
    gce_keep = b"\x21\xf9\x04" + bytes([1 << 2, 0, 0, 0]) + b"\x00"
    gif = _manual_gif(
        3,
        3,
        pal,
        [
            gce_keep,
            _image_block(0, 0, 3, 3, f1, 2),
            gce_restore_prev,
            _image_block(0, 0, 3, 3, f2, 2),
            gce_keep,
            _image_block(1, 1, 1, 1, f3, 2),
        ],
    )
    out = mc.decode_gif_frames(gif)
    # frame 3 composites onto the RESTORED frame-1 canvas, not frame 2
    want = pal[f1].copy()
    want[1, 1] = pal[0]
    assert np.array_equal(out[2], want)


# ---------------------------------------------------------------------------
# Spark wiring: the default decoders now really decode gif/wav
# ---------------------------------------------------------------------------


def _media_df(spark, n_gif: int, n_wav: int):
    import pandas as pd

    rng = np.random.default_rng(21)
    rows = []
    for i in range(n_gif):
        frames = [
            (np.full((10, 12, 3), (i * 40 + 17 * k) % 250, np.uint8)) for k in range(3 + i % 3)
        ]
        rows.append(
            {"image_id": f"gif{i:04d}", "bytes": mc.encode_gif(frames), "fmt": "gif"}
        )
    for i in range(n_wav):
        pcm = np.clip(
            np.sin(np.arange(1600) * (0.01 + 0.003 * i))
            + 0.1 * rng.standard_normal(1600),
            -1,
            1,
        ).astype(np.float32)
        rows.append(
            {"image_id": f"wav{i:04d}", "bytes": mc.encode_wav(pcm, 8000), "fmt": "wav"}
        )
    return spark.createDataFrame(pd.DataFrame(rows)), rows


def test_sample_video_frames_real_gif(spark):
    df, rows = _media_df(spark, 6, 0)
    out = mm.sample_video_frames(df, every_nth=2).collect()
    by_id: dict[str, dict[int, bytes]] = {}
    for r in out:
        by_id.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame_png"])
    for src_row in rows:
        frames = mc.decode_gif_frames(bytes(src_row["bytes"]))
        got = by_id[src_row["image_id"]]
        assert sorted(got) == list(range(0, len(frames), 2))
        for i in range(0, len(frames), 2):
            assert np.array_equal(codec.decode_png(got[i]), frames[i])


def test_audio_features_real_wav(spark):
    df, rows = _media_df(spark, 0, 5)
    out = {r["media_id"]: r for r in mm.audio_features(df, window=400).collect()}
    assert len(out) == 5
    for src_row in rows:
        pcm, _ = mc.decode_wav(bytes(src_row["bytes"]))
        n_w = len(pcm) // 400
        x = pcm[: n_w * 400].reshape(n_w, 400)
        rms = float(np.sqrt((x**2).mean()))
        zcr = float((np.diff(np.signbit(x), axis=1) != 0).mean())
        r = out[src_row["image_id"]]
        assert r["n_windows"] == n_w
        assert r["rms_mu"] == int(np.floor(rms * 1e6 + 0.5))
        assert r["zcr_mu"] == int(np.floor(zcr * 1e6 + 0.5))


def test_library_bound_formats_still_raise():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.decode_video_frames(b"\x00\x00\x00\x18ftypmp42", "mp4")
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm.decode_audio(b"ID3\x03", "mp3")
