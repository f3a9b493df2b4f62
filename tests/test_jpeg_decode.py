"""Baseline JPEG pixel decode (operators/multimodal.decode_jpeg_pixels).

The container has no JPEG encoder (no PIL), so these tests carry a
minimal deterministic baseline encoder: custom canonical Huffman tables
(emitted in DHT — the decoder must honor whatever the stream declares),
all-ones quant tables, and hand-placed quantized coefficients. Expected
pixels are computed with the same orthonormal IDCT + round + clip the
decoder pins, so every comparison is exact."""

import struct

import numpy as np
import pytest

from marie_icr_spark.operators.multimodal import (
    _ZIGZAG,
    _idct_basis,
    decode_jpeg_pixels,
)

# custom canonical tables: 12 DC symbols at code length 4, 16 AC symbols
# at length 5 (covers EOB, ZRL and every (run,size) the tests emit)
DC_BITS = [0, 0, 0, 12] + [0] * 12
DC_VALS = list(range(12))
AC_BITS = [0, 0, 0, 0, 19] + [0] * 11
AC_VALS = [0x00, 0xF0, 0x01, 0x02, 0x03, 0x04, 0x05, 0x11,
           0x21, 0x31, 0x41, 0x51, 0x12, 0x22, 0x13, 0x61,
           0x45, 0xB3, 0xD2]


def _codes(bits, vals):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODE = _codes(DC_BITS, DC_VALS)
AC_CODE = _codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def huff(self, table, sym):
        ln, code = table[sym]
        self.bits(code, ln)

    def flush(self):
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill pad


def _encode_block(bw, zz, pred):
    diff = zz[0] - pred
    size = abs(diff).bit_length()
    bw.huff(DC_CODE, size)
    if size:
        bw.bits(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = [k for k in range(1, 64) if zz[k]]
    last = nz[-1] if nz else 0
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.huff(AC_CODE, 0xF0)
            run -= 16
        s = abs(v).bit_length()
        bw.huff(AC_CODE, (run << 4) | s)
        bw.bits(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        bw.huff(AC_CODE, 0x00)  # EOB


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(w, h, comps, blocks_per_mcu, restart=0):
    """comps: [(cid, hs, vs)]; blocks_per_mcu: per MCU, list over comps of
    lists of zigzag coefficient arrays (row-major block order)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0 if cid == 1 else 1])
    out += _seg(0xC0, sof)
    dht = b""
    for tc in (0, 1):
        for th in (0, 1):
            bits, vals = (DC_BITS, DC_VALS) if tc == 0 else (AC_BITS, AC_VALS)
            dht += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += _seg(0xC4, dht)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _hs, _vs in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    bw = _BitWriter()
    pred = {c[0]: 0 for c in comps}
    rst = 0
    for mi, mcu in enumerate(blocks_per_mcu):
        if restart and mi and mi % restart == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = {c[0]: 0 for c in comps}
        for (cid, _hs, _vs), blocks in zip(comps, mcu):
            for zz in blocks:
                _encode_block(bw, zz, pred[cid])
                pred[cid] = zz[0]
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _flat_zz(value):
    zz = [0] * 64
    zz[0] = 8 * (value - 128)  # orthonormal DCT of a flat block
    return zz


def _expected_from_zz(zz):
    a = _idct_basis()
    m = np.zeros((8, 8))
    m.flat[_ZIGZAG] = zz
    return np.clip(np.floor(a.T @ m @ a + 128.0 + 0.5), 0, 255).astype(
        np.uint8)


def test_grayscale_flat_blocks_and_dc_prediction():
    # 16x8: two MCUs; DC prediction chains across them
    jpg = encode_jpeg(
        16, 8, [(1, 1, 1)],
        [[[_flat_zz(100)]], [[_flat_zz(200)]]],
    )
    px = decode_jpeg_pixels(jpg)
    assert px is not None and px.shape == (8, 16, 1)
    assert (px[:, :8, 0] == 100).all()
    assert (px[:, 8:, 0] == 200).all()


def test_grayscale_ac_coefficients_exact():
    zz = [0] * 64
    zz[0] = 80
    zz[5] = -31
    zz[17] = 7
    zz[63] = -2  # forces a long AC run (ZRL path)
    jpg = encode_jpeg(8, 8, [(1, 1, 1)], [[[zz]]])
    px = decode_jpeg_pixels(jpg)
    assert px is not None and px.shape == (8, 8, 1)
    assert (px[:, :, 0] == _expected_from_zz(zz)).all()


def test_color_444_flat():
    y, cb, cr = 120, 140, 90
    jpg = encode_jpeg(
        8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)],
        [[[_flat_zz(y)], [_flat_zz(cb)], [_flat_zz(cr)]]],
    )
    px = decode_jpeg_pixels(jpg)
    assert px is not None and px.shape == (8, 8, 3)
    want = np.clip(np.floor(np.array([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]) + 0.5), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all()


def test_color_420_subsampled_flat():
    y, cb, cr = 200, 100, 160
    # one MCU of 16x16: 4 Y blocks + 1 Cb + 1 Cr
    jpg = encode_jpeg(
        16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
        [[[_flat_zz(y)] * 4, [_flat_zz(cb)], [_flat_zz(cr)]]],
    )
    px = decode_jpeg_pixels(jpg)
    assert px is not None and px.shape == (16, 16, 3)
    want = np.clip(np.floor(np.array([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]) + 0.5), 0, 255).astype(np.uint8)
    assert (px == want[None, None, :]).all()


def test_restart_intervals_reset_dc_prediction():
    jpg = encode_jpeg(
        32, 8, [(1, 1, 1)],
        [[[_flat_zz(v)]] for v in (50, 90, 130, 170)],
        restart=2,
    )
    px = decode_jpeg_pixels(jpg)
    assert px is not None and px.shape == (8, 32, 1)
    for i, v in enumerate((50, 90, 130, 170)):
        assert (px[:, i * 8 : (i + 1) * 8, 0] == v).all()


def test_unsupported_and_malformed_fail_open():
    good = encode_jpeg(8, 8, [(1, 1, 1)], [[[_flat_zz(100)]]])
    assert decode_jpeg_pixels(good) is not None
    # progressive (SOF2) → None
    assert decode_jpeg_pixels(good.replace(b"\xff\xc0", b"\xff\xc2")) is None
    # truncated entropy data → None (never raises)
    assert decode_jpeg_pixels(good[:-8]) is None
    # 16-bit quant table → None
    assert decode_jpeg_pixels(good.replace(b"\xdb\x00\x43\x00",
                                           b"\xdb\x00\x43\x10")) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg at all") is None


def test_pipeline_integration_pixel_stats_and_resize(spark):
    """JPEG assets flow through media_pixel_stats and resize_media like
    PNG/PPM (the _rgb_image decode policy picks up the new codec)."""
    from pyspark.sql import Row

    from marie_icr_spark.operators.multimodal import (
        media_pixel_stats,
        resize_media,
    )

    y, cb, cr = 120, 140, 90
    jpg = encode_jpeg(
        8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)],
        [[[_flat_zz(y)], [_flat_zz(cb)], [_flat_zz(cr)]]],
    )
    df = spark.createDataFrame(
        [Row(asset_id="j1", media_type="image/jpeg", content=bytearray(jpg))]
    )
    got = media_pixel_stats(df).collect()[0]
    want = np.clip(np.floor(np.array([
        y + 1.402 * (cr - 128),
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
        y + 1.772 * (cb - 128),
    ]) + 0.5), 0, 255)
    assert got["ok"]
    assert got["mean_r"] == pytest.approx(want[0])
    assert got["mean_g"] == pytest.approx(want[1])
    assert got["mean_b"] == pytest.approx(want[2])

    rs = resize_media(df, 4, 4).collect()[0]
    assert rs["ok"] and rs["width"] == 4 and rs["height"] == 4
