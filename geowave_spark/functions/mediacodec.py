"""Pure-stdlib/numpy audio + video-frame codecs for opaque binary columns.

Closes the two decoder stubs in multimodal.py for the formats whose public
specs need no external library:

- WAV (RIFF WAVE, PCM 8/16/24/32-bit int + 32/64-bit float, any channel
  count) — the container ships no soundfile/librosa, but RIFF PCM is a
  chunk walk + a dtype view.  Public spec: Microsoft/IBM RIFF WAVE 1.0.
- GIF (GIF87a/GIF89a, global+local color tables, interlace, transparency,
  frame disposal, LSB-first variable-width LZW) — the motion format whose
  decode is pure bit twiddling, so animated GIFs stand in for "video" in
  this container.  Public spec: CompuServe GIF89a (1990), W3C mirror.

Both get matching encoders so fixtures are self-contained: WAV writes
canonical PCM16; GIF writes GIF89a with an exact ≤256-color palette and
spec-valid LZW (table-building encoder, LSB-first).  Real mp4/mkv/mp3
decode stays behind the clearly-marked NotImplementedError in
multimodal.py — those genuinely need ffmpeg.

Reference parity note: GeoWave's multimedia story is raster/vector only;
these operators are part of the training-data-pipeline extension surface
(opaque binary payload + typed metadata, decoded inside Arrow batches),
mirroring how sources/images.py treats image bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV — RIFF chunk walk + numpy dtype view
# ---------------------------------------------------------------------------


from .imagecodec import corrupt_guard as _corrupt_guard


@_corrupt_guard("wav")
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono PCM in [-1, 1], sample_rate).

    Accepts PCM (format 1) at 8/16/24/32 bits and IEEE float (format 3) at
    32/64 bits, any channel count (channels are mean-mixed to mono, the
    contract audio_features expects).  WAVE_FORMAT_EXTENSIBLE (0xFFFE) is
    resolved through its SubFormat GUID.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    pos = 12
    fmt_tag = n_ch = rate = bits = None
    pcm_raw = None
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:  # declared size may exceed the actual bytes
                raise ValueError("truncated WAV fmt chunk")
            fmt_tag, n_ch, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if fmt_tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE → SubFormat GUID
                if size < 40 or len(body) < 26:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
                fmt_tag = struct.unpack_from("<H", body, 24)[0]
        elif tag == b"data":
            pcm_raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_tag is None or pcm_raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_tag == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is UNSIGNED per spec
            x = np.frombuffer(pcm_raw, np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(pcm_raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(pcm_raw, np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(pcm_raw, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt_tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(pcm_raw, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(pcm_raw, "<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {fmt_tag} (need PCM/float)")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return np.ascontiguousarray(x, np.float32), int(rate)


def encode_wav(pcm: np.ndarray, rate: int = 16000, n_ch: int = 1) -> bytes:
    """float [-1,1] (1-D mono, or (n, ch)) → canonical PCM16 WAV bytes."""
    a = np.asarray(pcm, np.float64)
    if a.ndim == 1:
        a = a[:, None].repeat(n_ch, axis=1) if n_ch > 1 else a[:, None]
    n_ch = a.shape[1]
    q = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    raw = q.tobytes()
    balign = 2 * n_ch
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * balign, balign, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# GIF — LSB-first variable-width LZW (note: the TIFF LZW in imagecodec.py is
# MSB-first with the early-change rule; GIF packs code bits little-endian
# and switches width one code later, so the two decoders cannot share a
# bitreader)
# ---------------------------------------------------------------------------


def _gif_lzw_decode(min_code: int, buf: bytes, n_pixels: int) -> np.ndarray:
    """Reference-clear GIF LZW decoder (bytes-table variant).

    Table entries are materialized byte strings; for GIF's ≤4096-entry
    table on small-to-medium frames this is both simpler and fast enough
    (the hot loop is one dict-free list index + a bytearray extend).
    """
    CLEAR = 1 << min_code
    EOI = CLEAR + 1
    width = min_code + 1
    acc = nbits = pos = 0
    n = len(buf)
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(CLEAR)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                a = np.frombuffer(bytes(out[:n_pixels]), np.uint8)
                if len(a) < n_pixels:  # truncated stream: pad like below
                    a = np.concatenate([a, np.zeros(n_pixels - len(a), np.uint8)])
                return a
            acc |= buf[pos] << nbits  # LSB-first
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == CLEAR:
            table = [bytes([i]) for i in range(CLEAR)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):  # first code after CLEAR must be literal
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        # GIF width bump: when the NEXT code to assign no longer fits
        # (no early-change — unlike TIFF)
        if len(table) == (1 << width) and width < 12:
            width += 1
    a = np.frombuffer(bytes(out), np.uint8)
    if len(a) < n_pixels:  # pad truncated frames (some writers under-run)
        a = np.concatenate([a, np.zeros(n_pixels - len(a), np.uint8)])
    return a[:n_pixels]


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@_corrupt_guard("gif")
def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes → list of HxWx3 uint8 composited frames.

    Full GIF89a semantics: global/local color tables, interlaced images,
    transparency, inter-frame disposal (none/keep, restore-background,
    restore-previous), sub-rectangle frames composited onto the logical
    screen.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3

    frames: list[np.ndarray] = []
    # canvas starts transparent-black; GIF background color is only honored
    # for disposal=2 regions (matching browser behavior)
    canvas = np.zeros((sh, sw, 3), np.uint8)
    transparent_idx = -1
    disposal = 0
    prev_canvas = canvas.copy()

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            ln = data[p]
            p += 1
            if ln == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + ln])
            p += ln

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9:  # graphic control
                blen = data[pos + 2]
                gflags = data[pos + 3]
                disposal = (gflags >> 2) & 7
                transparent_idx = data[pos + 6] if gflags & 1 else -1
                pos += 3 + blen
                while data[pos] != 0:  # skip trailing sub-blocks
                    pos += 1 + data[pos]
                pos += 1
            else:  # comment / app / plain-text: skip sub-blocks
                pos += 2
                while data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if iflags & 0x80:  # local color table
            size = 2 << (iflags & 7)
            ct = np.frombuffer(data, np.uint8, size * 3, pos).reshape(size, 3)
            pos += size * 3
        if ct is None:
            raise ValueError("GIF image without any color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _gif_lzw_decode(min_code, lzw, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced row order
            de = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        prev_canvas = canvas.copy()
        # clip frames that overrun the logical screen (broken writers emit
        # them; browsers render the clipped part, so decode must too)
        ch = min(h, sh - y0) if y0 < sh else 0
        cw = min(w, sw - x0) if x0 < sw else 0
        region = canvas[y0 : y0 + ch, x0 : x0 + cw]
        idx_c = idx[:ch, :cw]
        rgb = ct[np.minimum(idx_c, len(ct) - 1)]
        if transparent_idx >= 0:
            mask = idx_c != transparent_idx
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        # disposal applies AFTER the frame is shown, preparing the canvas
        # for the next frame
        if disposal == 2:  # restore background (transparent-black here)
            canvas[y0 : y0 + h, x0 : x0 + w] = 0
        elif disposal == 3:  # restore previous
            canvas = prev_canvas.copy()
        # GCE scope is ONLY "the first graphic rendering block to follow"
        # (GIF89a §23): a GCE-less next frame renders opaquely, disposal 0
        transparent_idx = -1
        disposal = 0
    return frames


# ---------------------------------------------------------------------------
# GIF encoder (fixtures): exact palette, table-building LZW, LSB-first
# ---------------------------------------------------------------------------


def _gif_lzw_encode(min_code: int, idx: np.ndarray) -> bytes:
    """Index stream → GIF LZW bytes (table-building, emits CLEAR at 4096)."""
    CLEAR = 1 << min_code
    EOI = CLEAR + 1
    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(CLEAR)}
    next_code = EOI + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(CLEAR)
    s = b""
    for v in idx.tobytes():
        s2 = s + bytes([v])
        if s2 in table:
            s = s2
            continue
        emit(table[s])
        if next_code < 4096:
            table[bytes(s2)] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(CLEAR)}
            next_code = EOI + 1
            width = min_code + 1
        s = bytes([v])
    if s:
        emit(table[s])
    emit(EOI)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray], loop: bool = True) -> bytes:
    """Frames (HxWx3 uint8, ≤256 distinct colors total) → animated GIF89a.

    The palette is exact (built from the union of frame colors); >256
    distinct colors raise — fixtures should quantize first.  Frames use
    disposal=1 (keep), full-rectangle updates, no transparency: decode is
    therefore pixel-exact, which the roundtrip tests assert.
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors > 256; quantize first")
    # palette size must be a power of two ≥ 2
    pbits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    psize = 1 << pbits
    pal = np.zeros((psize, 3), np.uint8)
    pal[: len(colors)] = colors
    # color → index lookup via a packed-int dict (exact)
    packed = (
        colors[:, 0].astype(np.int64) << 16
        | colors[:, 1].astype(np.int64) << 8
        | colors[:, 2].astype(np.int64)
    )

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pbits - 1) << 4 | (pbits - 1), 0, 0)
    out += pal.tobytes()
    if loop:  # Netscape looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, pbits)
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share the logical screen size")
        fp = (
            f[:, :, 0].astype(np.int64) << 16
            | f[:, :, 1].astype(np.int64) << 8
            | f[:, :, 2].astype(np.int64)
        )
        flat = fp.ravel()
        # vectorize the lookup: searchsorted over the sorted packed palette
        # (np.unique returns packed already sorted lexicographically by
        # (r,g,b), which equals numeric order of the packed int)
        loc = np.searchsorted(packed, flat)
        idx = np.clip(loc, 0, len(packed) - 1).astype(np.uint8)
        # graphic control (disposal=1 keep, 4/100 s delay, no transparency)
        out += b"\x21\xf9\x04" + bytes([1 << 2, 4, 0, 0]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        lzw = _gif_lzw_encode(min_code, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
