"""PNG codec (operators/png.py) — spec-anchored tests.

The decoder is NOT tested only against our own encoder: filter-type
cases build IDAT streams by hand (explicit filter bytes per RFC 2083 §6)
with expected unfiltered pixels computed manually, so a matched
encode/decode bug cannot hide. Media-operator integration checks that
PNG rows take the real path while non-PNG rows keep the stub."""

from __future__ import annotations

import struct
import zlib

import pytest

from ocaml_rdf_spark.operators.png import (
    PngError,
    png_decode,
    png_encode,
    png_histogram,
    png_meta,
    png_resize,
)

MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png(width, height, bit_depth, color_type, raw_scanlines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


# --- hand-built filter-type vectors (grayscale, color type 0) --------------

def test_filter_none_and_sub():
    # 3x2 gray. Row 0 filter None: 10 20 30. Row 1 filter Sub (ch=1):
    # stored deltas 5 6 7 → recon 5, 11, 18.
    raw = bytes([0, 10, 20, 30]) + bytes([1, 5, 6, 7])
    w, h, rows = png_decode(_png(3, 2, 8, 0, raw))
    assert (w, h) == (3, 2)
    assert [p[0] for p in rows[0]] == [10, 20, 30]
    assert [p[0] for p in rows[1]] == [5, 11, 18]
    assert all(p[0] == p[1] == p[2] and p[3] == 255 for r in rows for p in r)


def test_filter_up_and_average():
    # Row 0 None: 100 50. Row 1 Up: stored 10 20 → 110 70.
    # Row 2 Average: stored 4 6; a=left_recon, b=up.
    #   x0: avg(0,110)=55 → 59 ; x1: avg(59,70)=64 → 70.
    raw = bytes([0, 100, 50]) + bytes([2, 10, 20]) + bytes([3, 4, 6])
    _w, _h, rows = png_decode(_png(2, 3, 8, 0, raw))
    assert [p[0] for p in rows[1]] == [110, 70]
    assert [p[0] for p in rows[2]] == [59, 70]


def test_filter_paeth():
    # Row 0 None: 10 20. Row 1 Paeth: stored 1 2.
    #   x0: a=0,b=10,c=0 → p=10 → pa=10,pb=0,pc=10 → pred=b=10 → 11
    #   x1: a=11,b=20,c=10 → p=21 → pa=10,pb=1,pc=11 → pred=b=20 → 22
    raw = bytes([0, 10, 20]) + bytes([4, 1, 2])
    _w, _h, rows = png_decode(_png(2, 2, 8, 0, raw))
    assert [p[0] for p in rows[1]] == [11, 22]


def test_rgb_and_palette_and_gray_alpha():
    # color type 2 (RGB), 2x1
    raw = bytes([0, 255, 0, 0, 0, 0, 255])
    _w, _h, rows = png_decode(_png(2, 1, 8, 2, raw))
    assert rows[0] == [(255, 0, 0, 255), (0, 0, 255, 255)]
    # color type 3 (palette) with tRNS on entry 0
    plte = _chunk(b"PLTE", bytes([9, 8, 7, 1, 2, 3])) + _chunk(b"tRNS", bytes([128]))
    raw = bytes([0, 0, 1])
    _w, _h, rows = png_decode(_png(2, 1, 8, 3, raw, extra=plte))
    assert rows[0] == [(9, 8, 7, 128), (1, 2, 3, 255)]
    # color type 4 (gray+alpha)
    raw = bytes([0, 200, 17])
    _w, _h, rows = png_decode(_png(1, 1, 8, 4, raw))
    assert rows[0] == [(200, 200, 200, 17)]


def test_roundtrip_encode_decode():
    rows = [[(x * 37 % 256, y * 91 % 256, (x + y) % 256, 255) for x in range(5)] for y in range(4)]
    b = png_encode(rows)
    w, h, got = png_decode(b)
    assert (w, h) == (5, 4) and got == rows
    # deterministic bytes
    assert png_encode(rows) == b


def test_meta_resize_histogram():
    rows = [[(255, 255, 255, 255), (0, 0, 0, 255)], [(0, 0, 0, 255), (255, 255, 255, 255)]]
    b = png_encode(rows)
    assert png_meta(b) == {"width": 2, "height": 2, "n_frames": 1}
    # 2x2 checkerboard → 4x4 nearest neighbor: each pixel doubles
    rb = png_resize(b, 4, 4)
    _w, _h, rr = png_decode(rb)
    assert rr[0] == [rows[0][0]] * 2 + [rows[0][1]] * 2
    assert rr[3] == [rows[1][0]] * 2 + [rows[1][1]] * 2
    # histogram: half black (bin 0), half white (top bin)
    hist = png_histogram(b, bins=16)
    assert hist[0] == 0.5 and hist[-1] == 0.5 and sum(hist) == 1.0


def test_rejections():
    with pytest.raises(PngError, match="signature"):
        png_decode(b"not a png at all")
    # bad CRC
    good = _png(1, 1, 8, 0, bytes([0, 1]))
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(PngError, match="CRC"):
        png_decode(bytes(bad))
    # interlace / bit depth out of scope
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    doc = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes([0, 1]))) + _chunk(b"IEND", b"")
    with pytest.raises(PngError, match="interlaced"):
        png_decode(doc)
    # illegal depth/color-type combos (spec §11.2.2): 16-bit palette,
    # sub-byte RGB/RGBA
    with pytest.raises(PngError, match="bit depth"):
        png_decode(_png(1, 1, 16, 3, bytes([0, 0, 0])))
    with pytest.raises(PngError, match="bit depth"):
        png_decode(_png(1, 1, 4, 2, bytes([0, 1, 1])))
    with pytest.raises(PngError, match="bit depth"):
        png_decode(_png(1, 1, 2, 6, bytes([0, 1])))
    # IDAT size mismatch (lying IHDR)
    with pytest.raises(PngError, match="does not match"):
        png_decode(_png(3, 3, 8, 0, bytes([0, 1])))


def test_media_operators_take_real_png_path(spark):
    from ocaml_rdf_spark.operators.media import media_metadata, media_features, resize_media

    rows = [[(x * 10, 0, 0, 255) for x in range(8)] for _ in range(6)]
    png = png_encode(rows)
    df = spark.createDataFrame(
        [("png1", bytearray(png)), ("txt1", bytearray(b"plain bytes"))],
        "media_id string, content binary",
    )
    meta = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert (meta["png1"]["width"], meta["png1"]["height"], meta["png1"]["n_frames"]) == (8, 6, 1)
    assert meta["png1"]["kind"] == "image"
    assert meta["txt1"]["kind"] == "unknown"  # stub path

    rz = {r["media_id"]: r for r in resize_media(df, width=4, height=3).collect()}
    _w, _h, rr = png_decode(bytes(rz["png1"]["content"]))
    assert (_w, _h) == (4, 3)
    assert len(bytes(rz["txt1"]["content"])) == 12  # stub plane: 4*3 bytes

    feats = {r["media_id"]: list(r["feature"]) for r in media_features(df).collect()}
    assert sum(feats["png1"]) == pytest.approx(1.0)  # histogram normalizes
    assert min(feats["txt1"]) >= -1.0 and any(v < 0 for v in feats["txt1"])  # stub range


# --- r5: full non-interlaced bit-depth matrix ------------------------------

def test_gray16_hand_built_with_filters():
    # 2x2 gray 16-bit (stride 4, bpp 2). Row 0 None: samples 0x0102,
    # 0xFF00. Row 1 Sub with bpp=2: stored bytes (1,2, 1,0); Sub adds
    # line[i-2], so recon bytes are (1,2, 2,2) = samples 0x0102, 0x0202.
    raw = bytes([0, 0x01, 0x02, 0xFF, 0x00]) + bytes([1, 0x01, 0x02, 0x01, 0x00])
    w, h, rows = png_decode(_png(2, 2, 16, 0, raw))
    assert (w, h) == (2, 2)
    # to8 = high byte
    assert [p[0] for p in rows[0]] == [0x01, 0xFF]
    assert [p[0] for p in rows[1]] == [0x01, 0x02]  # 0x0102, 0x0202
    assert all(p[3] == 255 for r in rows for p in r)


def test_rgba16_sub_filter_uses_8_byte_offset():
    # 2-pixel RGBA16 row, Sub filter: bpp = 8 bytes. Pixel 0 stored
    # literally; pixel 1 stored as per-byte delta vs pixel 0. A decoder
    # wrongly using ch=4 as the offset would mix channels.
    p0 = struct.pack(">HHHH", 0x1000, 0x2000, 0x3000, 0xFFFF)
    delta = bytes([0x01, 0x00, 0x02, 0x00, 0x03, 0x00, 0x00, 0x00])
    raw = bytes([1]) + p0 + delta
    w, h, rows = png_decode(_png(2, 1, 16, 6, raw))
    assert rows[0][0] == (0x10, 0x20, 0x30, 0xFF)
    assert rows[0][1] == (0x11, 0x22, 0x33, 0xFF)


def test_encode16_roundtrip_high_byte():
    rows = [
        [(0x0000, 0x8081, 0xFFFF, 0xFFFF), (0x1234, 0x5678, 0x9ABC, 0xDEF0)],
        [(0x0101, 0x0202, 0x0303, 0x0404), (0xAAAA, 0xBBBB, 0xCCCC, 0xDDDD)],
    ]
    w, h, got = png_decode(png_encode(rows, bit_depth=16))
    assert (w, h) == (2, 2)
    want = [[tuple(v >> 8 for v in p) for p in r] for r in rows]
    assert got == want


def test_gray_subbyte_depths_scale_to_255():
    # 1-bit: 8 pixels packed MSB-first into one byte. 0b10110001
    raw = bytes([0, 0b10110001])
    _w, _h, rows = png_decode(_png(8, 1, 1, 0, raw))
    assert [p[0] for p in rows[0]] == [255, 0, 255, 255, 0, 0, 0, 255]
    # 2-bit: values 0..3 scale to 0,85,170,255; 4 pixels per byte
    raw = bytes([0, 0b00011011])  # 0,1,2,3
    _w, _h, rows = png_decode(_png(4, 1, 2, 0, raw))
    assert [p[0] for p in rows[0]] == [0, 85, 170, 255]
    # 4-bit: 0xF -> 255, 0x8 -> 136 (8*255//15)
    raw = bytes([0, 0xF8])
    _w, _h, rows = png_decode(_png(2, 1, 4, 0, raw))
    assert [p[0] for p in rows[0]] == [255, 136]


def test_gray_subbyte_stride_rounds_up():
    # width 3 at 2 bits = 6 bits -> 1 byte stride; trailing bits ignored
    raw = bytes([0, 0b01_10_11_00])
    _w, _h, rows = png_decode(_png(3, 1, 2, 0, raw))
    assert [p[0] for p in rows[0]] == [85, 170, 255]


def test_palette_subbyte_indices_not_scaled():
    plte = _chunk(b"PLTE", bytes([10, 11, 12,  20, 21, 22,  30, 31, 32,  40, 41, 42]))
    # 2-bit indices 3,0,2,1 — indices index the palette directly
    raw = bytes([0, 0b11_00_10_01])
    _w, _h, rows = png_decode(_png(4, 1, 2, 3, raw, extra=plte))
    assert [p[:3] for p in rows[0]] == [(40, 41, 42), (10, 11, 12), (30, 31, 32), (20, 21, 22)]


def test_gray_alpha16_and_rgb16():
    # gray+alpha 16-bit, 1 pixel: v=0xABCD a=0x00FF -> (0xAB,…,0x00)
    raw = bytes([0]) + struct.pack(">HH", 0xABCD, 0x00FF)
    _w, _h, rows = png_decode(_png(1, 1, 16, 4, raw))
    assert rows[0][0] == (0xAB, 0xAB, 0xAB, 0x00)
    # RGB 16-bit Up filter across two rows
    r0 = struct.pack(">HHH", 0x0100, 0x0200, 0x0300)
    up = bytes([0x01, 0x00, 0x01, 0x00, 0x01, 0x00])
    raw = bytes([0]) + r0 + bytes([2]) + up
    _w, _h, rows = png_decode(_png(1, 2, 16, 2, raw))
    assert rows[0][0] == (0x01, 0x02, 0x03, 255)
    assert rows[1][0] == (0x02, 0x03, 0x04, 255)
