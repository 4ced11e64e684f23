"""Pure-numpy/stdlib image codecs for the binary `bytes` column.

The container has no PIL/libjpeg, so the engine ships its own deterministic
codecs.  BMP and PNG are REAL, spec-conformant encoders/decoders (lossless).
"jpeg" is a clearly-marked STAND-IN lossy codec (8x8 block DCT + uniform
quantization + zlib) — it is deterministic, genuinely lossy, and tuned so
PSNR >= 40 dB, exercising the BASELINE.json per-row invariant
("decoded-pixel allclose, PSNR>=40dB for lossy") with real plumbing; swap in
libjpeg on a cluster with the real library installed.

All functions take/return HxWx3 uint8 numpy arrays.  They run inside
Arrow-batched pandas UDFs (see sources/images.py and functions/geo_udfs.py);
nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up rows, BGR)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported BMP bpp {bpp}")
    # negative biHeight = spec-conformant TOP-DOWN row order (no flip)
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if top_down:
        return rows[:, :, ::-1].copy()
    return rows[::-1, :, ::-1].copy()


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filter 0, single zlib IDAT)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = np.concatenate([np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(kind: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Undo PNG row filter (all 5 types, so foreign PNGs also decode)."""
    if kind not in (0, 1, 2, 3, 4):
        raise ValueError(f"invalid PNG filter type {kind}")
    out = cur.astype(np.int32)
    n = cur.size
    if kind == 0:
        return cur.copy()
    if kind == 2:  # Up
        return ((out + prev) & 0xFF).astype(np.uint8)
    res = np.empty(n, np.uint8)
    for i in range(n):
        a = res[i - bpp] if i >= bpp else 0
        b = prev[i]
        if kind == 1:
            v = out[i] + a
        elif kind == 3:
            v = out[i] + ((int(a) + int(b)) >> 1)
        else:  # Paeth
            c = prev[i - bpp] if i >= bpp else 0
            p = int(a) + int(b) - int(c)
            pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = out[i] + pred
        res[i] = v & 0xFF
    return res


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit, color, _comp, _filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload
            )
            if bit != 8 or color != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    out = np.empty((h, w * 3), np.uint8)
    prev = np.zeros(w * 3, np.uint8)
    for r in range(h):
        prev = _unfilter(int(raw[r, 0]), raw[r, 1:], prev, 3)
        out[r] = prev
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# "JPEG" stand-in: 8x8 DCT + uniform quantization + zlib (LOSSY, deterministic)
# ---------------------------------------------------------------------------

_MAGIC = b"GWDC"  # geowave-spark DCT codec
_Q = 5.0  # uniform quant step → RMSE ≈ q/sqrt(12) ≈ 1.44 → PSNR ≈ 45 dB


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_D = _dct_matrix()


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = chan.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    pad = np.zeros((ph, pw), np.float64)
    pad[:h, :w] = chan
    pad[h:, :w] = chan[-1:, :]  # edge-replicate padding
    pad[:, w:] = pad[:, w - 1 : w]
    blocks = pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    return blocks, ph, pw


def encode_dct(arr: np.ndarray, q: float = _Q) -> bytes:
    """Deterministic lossy encode (JPEG STAND-IN — see module docstring)."""
    h, w, _ = arr.shape
    coeffs = []
    for c in range(3):
        blocks, ph, pw = _blockify(arr[:, :, c].astype(np.float64) - 128.0)
        # broadcast matmul over the (bh, bw) block grid — identical
        # contraction to einsum("ij,bcjk,lk->bcil", D, blocks, D) but ~20x
        # faster on small images (einsum's path overhead dominates there)
        f = (_D @ blocks) @ _D.T
        quant = np.round(f / q)
        if abs(quant).max() > np.iinfo(np.int16).max:
            # the payload stores int16 coefficients; a too-small q would
            # silently WRAP the DC terms (corrupting blocks with no error)
            raise ValueError(
                f"encode_dct: q={q} too small for int16 coefficient storage "
                f"(max |coeff| {int(abs(quant).max())}); use q >= "
                f"{abs(f).max() / np.iinfo(np.int16).max:.4f}"
            )
        coeffs.append(quant.astype(np.int16))
    payload = zlib.compress(np.concatenate([c.ravel() for c in coeffs]).tobytes(), 6)
    head = _MAGIC + struct.pack("<HHf", w, h, q)
    return head + payload


def decode_dct(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a GWDC payload")
    w, h, q = struct.unpack_from("<HHf", data, 4)
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    nb = (ph // 8) * (pw // 8) * 64
    flat = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16).astype(np.float64)
    out = np.empty((h, w, 3), np.uint8)
    for c in range(3):
        f = flat[c * nb : (c + 1) * nb].reshape(ph // 8, pw // 8, 8, 8) * q
        # inverse transform as broadcast matmul (see encode_dct note)
        blocks = (_D.T @ f) @ _D
        img = blocks.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        out[:, :, c] = np.clip(np.round(img[:h, :w]), 0, 255).astype(np.uint8)
    return out


# ---------------------------------------------------------------------------
# Dispatch + metrics
# ---------------------------------------------------------------------------

_ENCODERS = {"png": encode_png, "bmp": encode_bmp, "jpeg": encode_dct}
_DECODERS = {"png": decode_png, "bmp": decode_bmp, "jpeg": decode_dct}
LOSSLESS = {"png", "bmp"}


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    try:
        enc = _ENCODERS[fmt]
    except KeyError:
        raise NotImplementedError(f"no codec for format {fmt!r} in this container")
    return enc(arr)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise NotImplementedError(f"no codec for format {fmt!r} in this container")
    return dec(data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
