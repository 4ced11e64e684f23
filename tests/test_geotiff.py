"""GeoTIFF ingest: pure-spec TIFF decoder + geo tags vs an independent
test-side encoder (written from the TIFF 6.0 / GeoTIFF 1.1 specs, sharing
no code with the reader — same strategy as the Avro fixtures)."""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geowave_spark.functions import imagecodec
from geowave_spark.sources import geotiff


# --- independent encoder ---------------------------------------------------

def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW writer (MSB-first, early change)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    emit(CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
        else:
            emit(table[cur], width)
            table[cand] = nxt
            nxt += 1
            # early change: the code width grows when the NEXT code to be
            # assigned would not fit (writer switches at 511/1023/2047)
            if nxt == (1 << width) - 1 and width < 12:
                width += 1
            if nxt == 4094:  # keep the table small: reset
                emit(CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                nxt, width = 258, 9
            cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 127:
            j += 1
        if j > i:  # run
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:  # literal run
            j = i
            while (
                j + 1 < n and data[j + 1] != data[j] and j - i < 127
            ):
                j += 1
            if j + 1 >= n:
                j = min(i + 127, n - 1)
            out += bytes([j - i]) + data[i : j + 1]
            i = j + 1
    return bytes(out)


def _compress(seg: bytes, comp: int) -> bytes:
    if comp == 1:
        return seg
    if comp == 8:
        return zlib.compress(seg)
    if comp == 5:
        return _lzw_encode(seg)
    if comp == 32773:
        return _packbits_encode(seg)
    raise AssertionError(comp)


def write_tiff(
    path,
    arr: np.ndarray,
    comp: int = 1,
    tile: int | None = None,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
    geo=None,  # (x0, y1, sx, sy)
    epsg: int | None = None,
    nodata: float | None = None,
) -> None:
    e = ">" if big_endian else "<"
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    bits = dt.itemsize * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    a = arr.astype(dt.newbyteorder(e))
    if predictor == 2:
        d = a.astype(np.int64)
        d[:, 1:] -= d[:, :-1]
        a = d.astype(dt).astype(dt.newbyteorder(e))

    segs, seg_dims = [], []
    if tile:
        th = tw = tile
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros((th, tw, spp), a.dtype)
                ys, xs = min(th, h - ty), min(tw, w - tx)
                block[:ys, :xs] = a[ty : ty + ys, tx : tx + xs]
                segs.append(_compress(block.tobytes(), comp))
    else:
        rps = rows_per_strip or h
        for y in range(0, h, rps):
            segs.append(_compress(a[y : y + rps].tobytes(), comp))
        seg_dims = None

    entries = []  # (tag, type, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [bits] * spp))
    entries.append((259, 3, 1, [comp]))
    entries.append((262, 3, 1, [1 if spp == 1 else 2]))
    entries.append((277, 3, 1, [spp]))
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    entries.append((339, 3, spp, [sfmt] * spp))
    if geo:
        x0, y1, sx, sy = geo
        entries.append((33550, 12, 3, [sx, sy, 0.0]))
        entries.append((33922, 12, 6, [0.0, 0.0, 0.0, x0, y1, 0.0]))
    if epsg is not None:
        key_id = 2048 if epsg < 32000 or 4000 <= epsg <= 4999 else 3072
        entries.append((34735, 3, 8, [1, 1, 0, 1, key_id, 0, 1, epsg]))
    if nodata is not None:
        s = (str(nodata) + "\x00").encode()
        entries.append((42113, 2, len(s), list(s)))

    # data area layout: header(8) + payload, IFD written after payload
    payload = bytearray()
    seg_offsets, seg_counts = [], []
    base = 8
    for sgm in segs:
        seg_offsets.append(base + len(payload))
        seg_counts.append(len(sgm))
        payload += sgm
    if tile:
        entries.append((322, 3, 1, [tile]))
        entries.append((323, 3, 1, [tile]))
        entries.append((324, 4, len(seg_offsets), seg_offsets))
        entries.append((325, 4, len(seg_counts), seg_counts))
    else:
        entries.append((273, 4, len(seg_offsets), seg_offsets))
        entries.append((278, 4, 1, [rows_per_strip or h]))
        entries.append((279, 4, len(seg_counts), seg_counts))
    entries.sort(key=lambda x: x[0])

    type_fmt = {2: "c", 3: "H", 4: "I", 12: "d"}
    type_size = {2: 1, 3: 2, 4: 4, 12: 8}

    # out-of-line value payloads go after the IFD
    ifd_off = 8 + len(payload)
    ifd_size = 2 + 12 * len(entries) + 4
    extra = bytearray()
    ents = b""
    for tag, typ, cnt, vals in entries:
        total = type_size[typ] * cnt
        if typ == 2:
            raw = bytes(vals)
        else:
            raw = struct.pack(e + type_fmt[typ] * cnt, *vals)
        if total <= 4:
            raw = raw.ljust(4, b"\x00")
            ents += struct.pack(e + "HHI", tag, typ, cnt) + raw
        else:
            voff = ifd_off + ifd_size + len(extra)
            ents += struct.pack(e + "HHII", tag, typ, cnt, voff)
            extra += raw
    hdr = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_off)
    with open(path, "wb") as f:
        f.write(hdr + payload + struct.pack(e + "H", len(entries)) + ents
                + struct.pack(e + "I", 0) + extra)


def _img(h, w, spp=1, dtype=np.uint8, seed=0):
    rng = np.random.default_rng(seed)
    hi = 255 if dtype == np.uint8 else 60000
    a = rng.integers(0, hi, (h, w, spp)).astype(dtype)
    return a[:, :, 0] if spp == 1 else a


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_decode_strips_all_compressions(tmp_path, comp):
    a = _img(37, 23, seed=comp)
    p = tmp_path / f"c{comp}.tif"
    write_tiff(p, a, comp=comp, rows_per_strip=16)
    got = imagecodec.decode_tiff_raw(p.read_bytes())
    assert np.array_equal(got, a)


def test_decode_tiled_rgb_deflate_bigendian(tmp_path):
    a = _img(40, 50, spp=3, seed=7)
    p = tmp_path / "t.tif"
    write_tiff(p, a, comp=8, tile=16, big_endian=True)
    got = imagecodec.decode_tiff_raw(p.read_bytes())
    assert got.shape == (40, 50, 3) and np.array_equal(got, a)


def test_decode_uint16_predictor_lzw(tmp_path):
    a = _img(21, 33, dtype=np.uint16, seed=3)
    p = tmp_path / "p.tif"
    write_tiff(p, a, comp=5, predictor=2, rows_per_strip=8)
    got = imagecodec.decode_tiff_raw(p.read_bytes())
    assert got.dtype == np.uint16 and np.array_equal(got, a)
    # the HxWx3 uint8 mosaic contract scales 16-bit down
    u8 = imagecodec.decode_tiff(p.read_bytes())
    assert u8.shape == (21, 33, 3) and np.array_equal(u8[:, :, 0], (a >> 8).astype(np.uint8))


def test_decode_float32(tmp_path):
    rng = np.random.default_rng(9)
    a = rng.uniform(0, 300, (9, 11)).astype(np.float32)
    p = tmp_path / "f.tif"
    write_tiff(p, a, comp=8)
    got = imagecodec.decode_tiff_raw(p.read_bytes())
    assert got.dtype == np.float32 and np.array_equal(got, a)


def test_geotiff_meta_and_reader(spark, tmp_path):
    a = _img(20, 30, seed=1)
    # 30x20 px at 0.1 deg/px anchored at (10E, 55N)
    write_tiff(tmp_path / "a.tif", a, comp=8, geo=(10.0, 55.0, 0.1, 0.1),
               epsg=4326, nodata=0.0)
    b = _img(16, 16, spp=3, seed=2)
    write_tiff(tmp_path / "b.tif", b, comp=1, geo=(-120.0, 40.0, 0.25, 0.25),
               epsg=32611)
    df = geotiff.read_geotiff(spark, str(tmp_path / "*.tif"))
    rows = {os.path.basename(r["source_file"]): r for r in df.collect()}
    ra = rows["a.tif"]
    assert (ra["width"], ra["height"], ra["bands"]) == (30, 20, 1)
    assert ra["x0"] == pytest.approx(10.0) and ra["y1"] == pytest.approx(55.0)
    assert ra["x1"] == pytest.approx(13.0) and ra["y0"] == pytest.approx(53.0)
    assert ra["epsg"] == 4326 and ra["nodata"] == 0.0 and ra["dtype"] == "u1"
    rb = rows["b.tif"]
    assert rb["epsg"] == 32611 and rb["bands"] == 3 and rb["nodata"] is None
    # bytes round-trip through the registered codec
    assert np.array_equal(
        imagecodec.decode_tiff_raw(bytes(ra["bytes"])), a
    )


def test_geotiff_feeds_mosaic(spark, tmp_path):
    """read_geotiff rows drive the true-pixel mosaic path end-to-end."""
    from pyspark.sql import functions as F

    from geowave_spark.operators import tiling

    # constant-value raster -> every covered mosaic pixel has that value
    a = np.full((32, 32), 200, np.uint8)
    write_tiff(tmp_path / "m.tif", a, comp=8, geo=(0.0, 45.0, 0.5, 0.5),
               epsg=4326)
    df = geotiff.read_geotiff(spark, str(tmp_path / "m.tif"))
    imgs = df.select(
        F.lit(1).alias("image_id"),
        ((F.col("x0") + F.col("x1")) / 2).alias("lon"),
        ((F.col("y0") + F.col("y1")) / 2).alias("lat"),
        F.col("width").alias("w"), F.col("height").alias("h"),
        "bytes", "fmt", "x0", "y0", "x1", "y1",
    )
    tiles = tiling.mosaic_tiles(
        imgs, level=4, tile_px=16, footprint_cols=("x0", "y0", "x1", "y1")
    ).collect()
    assert tiles
    px = imagecodec.decode_png(bytes(tiles[0]["tile_png"]))
    vals = set(np.unique(px))
    assert vals <= {0, 200} and 200 in vals


def test_tiff_error_paths(tmp_path):
    with pytest.raises(ValueError, match="byte-order"):
        imagecodec.tiff_tags(b"XX" + b"\x00" * 16)
    a = _img(4, 4)
    p = tmp_path / "x.tif"
    write_tiff(p, a, comp=1)
    data = bytearray(p.read_bytes())
    data[2:4] = struct.pack("<H", 43)  # BigTIFF magic
    with pytest.raises(NotImplementedError, match="BigTIFF"):
        imagecodec.tiff_tags(bytes(data))
    with pytest.raises(ValueError, match="georeferenced"):
        geotiff.geotiff_meta(p.read_bytes())  # no geo tags


def test_lzw_roundtrip_stress():
    """Cross every code-width boundary (9->10->11->12) and the writer's
    table reset; mixed compressible / incompressible content."""
    rng = np.random.default_rng(17)
    cases = [
        bytes(rng.integers(0, 256, 40_000).astype(np.uint8)),   # random
        bytes(np.repeat(rng.integers(0, 4, 30_000), 3).astype(np.uint8)),
        b"".join(bytes([i % 7]) * (i % 13 + 1) for i in range(8_000)),
        bytes(10_000),                                            # all zero
    ]
    for data in cases:
        enc = _lzw_encode(data)
        assert imagecodec._lzw_decode(enc) == data


def test_projected_epsg_wins_over_geographic(tmp_path):
    """ArcGIS/libgeotiff writers emit BOTH GeographicTypeGeoKey (2048, the
    datum's geographic CRS) and ProjectedCSTypeGeoKey (3072) for projected
    rasters; GeoKeys sort ascending, so a first-match walk reports 4326
    for a UTM raster.  The projected code must win."""
    import struct as _s

    import numpy as np

    from geowave_spark.functions import imagecodec as IC
    from geowave_spark.sources import geotiff as gt

    # minimal gray uint8 TIFF with a GeoKeyDirectory holding both keys
    w = h = 2
    data = bytes(range(4))
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [8]), (259, 3, 1, [1]),
        (262, 3, 1, [1]), (277, 3, 1, [1]), (339, 3, 1, [1]),
        (273, 4, 1, [8]), (279, 4, 1, [len(data)]), (278, 4, 1, [h]),
        (33550, 12, 3, [1.0, 1.0, 0.0]),
        (33922, 12, 6, [0.0, 0.0, 0.0, 500000.0, 4650000.0, 0.0]),
        (34735, 3, 16,
         [1, 1, 0, 3,
          1024, 0, 1, 1,          # ModelTypeProjected
          2048, 0, 1, 4326,       # geographic datum CRS
          3072, 0, 1, 32633]),    # the raster's ACTUAL (projected) CRS
    ]
    out = bytearray(b"II*\x00")
    ifd_off = 8 + len(data)
    out += _s.pack("<I", ifd_off)
    out += data
    # value area after the IFD
    n = len(entries)
    val_off = ifd_off + 2 + 12 * n + 4
    body = bytearray()
    ifd = _s.pack("<H", n)
    tsize = {3: 2, 4: 4, 12: 8}
    tfmt = {3: "H", 4: "I", 12: "d"}
    for tag, typ, cnt, vals in entries:
        raw = b"".join(_s.pack("<" + tfmt[typ], v) for v in vals)
        if len(raw) <= 4:
            ifd += _s.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
        else:
            ifd += _s.pack("<HHI", tag, typ, cnt) + _s.pack("<I", val_off + len(body))
            body += raw
    ifd += _s.pack("<I", 0)
    out += ifd + body
    meta = gt.geotiff_meta(bytes(out))
    assert meta["epsg"] == 32633
    assert IC.decode_tiff(bytes(out)).shape == (2, 2, 3)
