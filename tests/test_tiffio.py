"""Pure-python tests for the baseline TIFF container + codecs.

No TIFF library ships in this container, so correctness is certified by
roundtrip property tests (encode → decode identity for every supported
mode) plus structural checks of the ITU T.4/T.6 code tables themselves
(prefix-freeness, coverage), mirroring the PNG/JPEG test strategy.
Reference contract: multi-page frame-per-page loading
(marie/utils/docs.py:224, :372-380) and CCITT G4 archival output
(marie/pipe/extract_pipeline.py:594-604).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from marie_icr_spark.operators import tiffio as T


# ---------------------------------------------------------------------------
# code tables
# ---------------------------------------------------------------------------


def _all_codes(tbl):
    return [(nbits, code) for code, nbits in tbl.values()]


def test_t4_tables_prefix_free_and_complete():
    # every run length 0..63 terminating + makeups in 64-steps
    for tbl, makeup_max in ((T._WHITE_CODES, 1728), (T._BLACK_CODES, 1728)):
        assert all(v in tbl for v in range(64))
        assert all(v in tbl for v in range(64, makeup_max + 1, 64))
    assert all(v in T._EXT_CODES for v in range(1792, 2561, 64))

    # prefix-freeness within each decode alphabet (white+ext, black+ext):
    # no codeword is a prefix of another
    for tables in ([T._WHITE_CODES, T._EXT_CODES],
                   [T._BLACK_CODES, T._EXT_CODES]):
        codes = []
        for tbl in tables:
            codes += _all_codes(tbl)
        assert len(set(codes)) == len(codes)
        for na, ca in codes:
            for nb, cb in codes:
                if (na, ca) == (nb, cb):
                    continue
                if na < nb and (cb >> (nb - na)) == ca:
                    raise AssertionError(
                        f"{ca:0{na}b} is a prefix of {cb:0{nb}b}"
                    )


def test_run_code_roundtrip_all_lengths():
    for color in (0, 1):
        for run in list(range(0, 130)) + [1728, 1729, 2560, 2623, 2624,
                                          5000, 9999]:
            bw = T._BitWriter()
            T._put_run(bw, run, color)
            bw.flush()
            br = T._BitReader(bytes(bw.buf))
            assert T._get_run(br, color) == run, (color, run)


# ---------------------------------------------------------------------------
# packbits
# ---------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_packbits_roundtrip(row):
    enc = T.packbits_encode(row)
    assert T.packbits_decode(enc, len(row)) == row


def test_packbits_worst_cases():
    # long literal run (>128), long repeat run (>128), alternation
    for row in (bytes(range(256)) * 2, b"\x07" * 1000,
                b"\x00\x01" * 99, b"", b"\x42"):
        assert T.packbits_decode(T.packbits_encode(row), len(row)) == row


def test_packbits_truncated_fails_closed():
    with pytest.raises(ValueError):
        T.packbits_decode(b"\x05ab", 6)  # literal run cut short
    with pytest.raises(ValueError):
        T.packbits_decode(b"\xfe", 3)  # repeat run missing its byte
    with pytest.raises(ValueError):
        T.packbits_decode(b"", 1)


# ---------------------------------------------------------------------------
# G4 codec
# ---------------------------------------------------------------------------


def _rand_bilevel(rng, h, w, p):
    return (rng.random((h, w)) < p).astype(np.uint8)


def test_g4_roundtrip_structured():
    # the shapes G4 is built for: text-like runs, vertical edges, all-white,
    # all-black, single-pixel columns, width-1
    cases = [
        np.zeros((5, 40), np.uint8),
        np.ones((5, 40), np.uint8),
        np.eye(16, dtype=np.uint8),
        np.tile(np.array([0, 1], np.uint8), (8, 20)),
    ]
    img = np.zeros((12, 64), np.uint8)
    img[3:9, 10:50] = 1  # solid block: pass/vertical modes
    cases.append(img)
    col = np.zeros((20, 1), np.uint8)
    col[::3, 0] = 1
    cases.append(col)
    for img in cases:
        h, w = img.shape
        assert np.array_equal(T.g4_decode(T.g4_encode(img), w, h), img)


@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=70),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.sampled_from([0.05, 0.3, 0.5, 0.8]),
)
@settings(max_examples=60, deadline=None)
def test_g4_roundtrip_random(h, w, seed, p):
    img = _rand_bilevel(np.random.default_rng(seed), h, w, p)
    assert np.array_equal(T.g4_decode(T.g4_encode(img), w, h), img)


def test_g4_garbage_fails_closed():
    with pytest.raises(ValueError):
        T.g4_decode(b"\x00" * 8, 16, 4)  # EOL run inside image data
    with pytest.raises(ValueError):
        T.g4_decode(b"", 0, 4)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def test_multipage_container_roundtrip_all_modes():
    rng = np.random.default_rng(11)
    bl = _rand_bilevel(rng, 21, 33, 0.4)
    gray = bytes(rng.integers(0, 256, 7 * 4, dtype=np.uint8))
    rgb = bytes(rng.integers(0, 256, 5 * 3 * 3, dtype=np.uint8))
    frames = [
        dict(mode="bilevel", width=33, height=21, pixels=bl,
             compression=T.COMP_G4),
        dict(mode="bilevel", width=33, height=21, pixels=bl,
             compression=T.COMP_NONE),
        dict(mode="bilevel", width=33, height=21, pixels=bl,
             compression=T.COMP_PACKBITS),
        dict(mode="gray", width=7, height=4, pixels=gray,
             compression=T.COMP_PACKBITS),
        dict(mode="rgb", width=5, height=3, pixels=rgb,
             compression=T.COMP_NONE),
    ]
    blob = T.encode_tiff(frames)
    pages = T.decode_tiff_frames(blob)
    assert [(p[0], p[1]) for p in pages] == [
        (33, 21), (33, 21), (33, 21), (7, 4), (5, 3)
    ]
    # all three bilevel compressions decode to identical pixels,
    # photometric 0: bit 1 = black = rgb 0
    expect = np.where(bl == 1, 0, 255).astype(np.uint8)
    for p in pages[:3]:
        arr = np.frombuffer(p[2], np.uint8).reshape(21, 33, 3)
        assert np.array_equal(arr[:, :, 0], expect)
        assert np.array_equal(arr[:, :, 0], arr[:, :, 2])
    g = np.frombuffer(pages[3][2], np.uint8).reshape(4, 7, 3)
    assert g[:, :, 1].tobytes() == gray  # photometric 1: identity
    assert pages[4][2] == rgb


def test_page_info_walks_ifd_chain():
    frames = [
        dict(mode="gray", width=3, height=2, pixels=b"\x00" * 6)
        for _ in range(4)
    ]
    pages = T.tiff_page_info(T.encode_tiff(frames))
    assert len(pages) == 4
    assert all(p[256] == [3] and p[257] == [2] for p in pages)
    assert T.tiff_page_info(T.encode_tiff(frames), max_pages=2)
    assert len(T.tiff_page_info(T.encode_tiff(frames), max_pages=2)) == 2


def test_container_fails_closed():
    good = T.encode_tiff(
        [dict(mode="gray", width=3, height=2, pixels=b"\x00" * 6)]
    )
    with pytest.raises(ValueError):
        T.tiff_page_info(b"II*\x00")  # short header
    with pytest.raises(ValueError):
        T.tiff_page_info(b"XX*\x00\x08\x00\x00\x00")  # bad magic
    # IFD cycle: patch first IFD's next-pointer to itself
    import struct

    (ifd_off,) = struct.unpack_from("<I", good, 4)
    (n,) = struct.unpack_from("<H", good, ifd_off)
    cyc = bytearray(good)
    struct.pack_into("<I", cyc, ifd_off + 2 + 12 * n, ifd_off)
    with pytest.raises(ValueError):
        T.tiff_page_info(bytes(cyc))
    # strip offset out of range
    trunc = good[: len(good) // 2]
    with pytest.raises(ValueError):
        T.decode_tiff_frames(trunc)


def test_strip_layout_multiple_rows_per_strip():
    # hand-build: uncompressed gray page split into 3 strips (rps=2, h=5)
    import struct

    w, h, rps = 4, 5, 2
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offs, counts = [], []
    for y0 in range(0, h, rps):
        strip = img[y0 : y0 + rps].tobytes()
        offs.append(len(out))
        counts.append(len(strip))
        out += strip
    if len(out) & 1:
        out.append(0)
    # offsets/counts arrays (3 longs each, > 4 bytes -> stored out of line)
    offs_at = len(out)
    out += struct.pack("<3I", *offs)
    counts_at = len(out)
    out += struct.pack("<3I", *counts)
    ifd_off = len(out)
    struct.pack_into("<I", out, 4, ifd_off)

    def e(tag, typ, count, value):
        if typ == 3:
            return struct.pack("<HHIHH", tag, typ, count, value, 0)
        return struct.pack("<HHII", tag, typ, count, value)

    entries = [
        e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 8),
        e(259, 3, 1, T.COMP_NONE), e(262, 3, 1, 1),
        e(273, 4, 3, offs_at), e(277, 3, 1, 1), e(278, 4, 1, rps),
        e(279, 4, 3, counts_at),
    ]
    out += struct.pack("<H", len(entries))
    for x in entries:
        out += x
    out += b"\x00\x00\x00\x00"
    pages = T.decode_tiff_frames(bytes(out))
    assert len(pages) == 1
    arr = np.frombuffer(pages[0][2], np.uint8).reshape(h, w, 3)
    assert np.array_equal(arr[:, :, 0], img)


def test_big_endian_header_parses():
    # minimal MM (big-endian) single-page header, no strips -> page_info ok
    import struct

    out = bytearray(b"MM\x00*")
    out += struct.pack(">I", 8)
    entries = [
        struct.pack(">HHIHH", 256, 3, 1, 9, 0),
        struct.pack(">HHIHH", 257, 3, 1, 7, 0),
    ]
    out += struct.pack(">H", len(entries))
    for x in entries:
        out += x
    out += b"\x00\x00\x00\x00"
    pages = T.tiff_page_info(bytes(out))
    assert pages[0][256] == [9] and pages[0][257] == [7]


def test_big_endian_pixel_decode_multipage():
    """Full MM (big-endian) pixel decode — the encoder only writes II, so
    this path is reachable only from foreign files: two uncompressed gray
    pages, second with an out-of-line (>4 byte) StripOffsets/ByteCounts
    array, chained IFDs, values byte-swapped vs the II layout."""
    import struct

    rng = np.random.default_rng(11)
    img1 = rng.integers(0, 256, (3, 5), dtype=np.uint8)
    img2 = rng.integers(0, 256, (4, 2), dtype=np.uint8)

    def e(tag, typ, count, value):
        if typ == 3 and count == 1:
            return struct.pack(">HHIHH", tag, typ, count, value, 0)
        return struct.pack(">HHII", tag, typ, count, value)

    out = bytearray(b"MM\x00*\x00\x00\x00\x00")
    patch_at = 4
    for img, split in ((img1, False), (img2, True)):
        h, w = img.shape
        if split:  # rps=2 → 2 strips, arrays stored out of line
            rps = 2
            offs, counts = [], []
            for y0 in range(0, h, rps):
                strip = img[y0 : y0 + rps].tobytes()
                offs.append(len(out))
                counts.append(len(strip))
                out += strip
            if len(out) & 1:
                out.append(0)
            offs_at = len(out)
            out += struct.pack(">%dI" % len(offs), *offs)
            counts_at = len(out)
            out += struct.pack(">%dI" % len(counts), *counts)
            strip_entries = [
                e(273, 4, len(offs), offs_at),
                e(279, 4, len(counts), counts_at),
            ]
        else:
            rps = h
            strip_off = len(out)
            out += img.tobytes()
            if len(out) & 1:
                out.append(0)
            strip_entries = [
                e(273, 4, 1, strip_off),
                e(279, 4, 1, img.size),
            ]
        ifd_off = len(out)
        struct.pack_into(">I", out, patch_at, ifd_off)
        entries = [
            e(256, 4, 1, w), e(257, 4, 1, h), e(258, 3, 1, 8),
            e(259, 3, 1, T.COMP_NONE), e(262, 3, 1, 1),
            *strip_entries, e(277, 3, 1, 1), e(278, 4, 1, rps),
        ]
        entries.sort(key=lambda b: struct.unpack_from(">H", b)[0])
        out += struct.pack(">H", len(entries))
        for x in entries:
            out += x
        patch_at = len(out)
        out += b"\x00\x00\x00\x00"
    pages = T.decode_tiff_frames(bytes(out))
    assert len(pages) == 2
    for (pw, ph, rgb), img in zip(pages, (img1, img2)):
        h, w = img.shape
        assert (pw, ph) == (w, h)
        arr = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        assert np.array_equal(arr, np.repeat(img[:, :, None], 3, axis=2))


def test_zip_stored_size_formula():
    """Pin the stdlib zipfile layout q_zip_pack's oracle relies on: a
    STORED archive with pinned 1980 timestamps has the exact arithmetic
    size 30+name+data per local header, 46+name per central entry, 22
    EOCD — including non-ascii payloads counted in BYTES."""
    import io
    import zipfile

    entries = [
        ("000001.adlib.xml", "<Page>héllo — ünïcode</Page>"),
        ("000002.adlib.xml", "<Page></Page>"),
        ("000010.adlib.xml", "x" * 7000),
    ]
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, xml in entries:
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, xml.encode("utf-8"), zipfile.ZIP_STORED)
    got = len(bio.getvalue())
    expect = (
        sum(30 + len(n) + len(x.encode("utf-8")) for n, x in entries)
        + sum(46 + len(n) for n, _ in entries)
        + 22
    )
    assert got == expect


def test_zip_name_length_grows_past_six_digits():
    """turn_idx >= 10^6 (a 10^12-turn corpus) makes %06d names grow past
    16 bytes; the oracle formula sizes names per entry, mirrored here."""
    import io
    import zipfile

    for ti in (0, 999_999, 1_000_000, 1_234_567_890):
        name = f"{ti:06d}.adlib.xml"
        name_len = max(6, len(str(ti))) + 10
        assert len(name) == name_len
        bio = io.BytesIO()
        with zipfile.ZipFile(bio, "w") as zf:
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zf.writestr(zi, b"<x/>", zipfile.ZIP_STORED)
        assert len(bio.getvalue()) == (30 + 46) + 2 * name_len + 4 + 22
