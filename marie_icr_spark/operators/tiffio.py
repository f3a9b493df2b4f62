"""Baseline TIFF container + codec support, pure stdlib + numpy.

Multi-page TIFF is the reference's primary scanned-document input format
(``marie/utils/docs.py:24`` allows it, ``:224`` loads it page-per-frame via
``cv2.imreadmulti``) and its archival output (CCITT Group-4 pack,
``marie/utils/tiff_ops.py`` / ``marie/pipe/extract_pipeline.py:594-604``).
The reference delegates to cv2/tifffile/ImageMagick; none of those exist in
this container, so — like the PNG/JPEG decoders in ``multimodal.py`` — this
is a from-scratch transposition of the *format contract*:

* **container**: header (II/MM endian), IFD chain walk (multi-page),
  baseline tags (dims, bits, compression, photometric, strips), bounded
  loops + fail-closed ``ValueError`` on malformed input (callers fail
  open as ``ok=False`` rows);
* **compression 1** (none): raw strips, 1/8-bit, bit-packed bilevel rows;
* **compression 32773** (PackBits): the classic byte RLE, per-row restart
  on encode;
* **compression 4** (CCITT T.6 / Group 4 MMR): the full 2-D coding pass —
  pass / horizontal / vertical modes against the reference line, T.4
  white/black run-length Huffman tables with makeup chaining, EOFB.

Both encode and decode are implemented for every mode so correctness is
certified by roundtrip property tests (no TIFF library exists in the
container to cross-check against; the T.4/T.6 code tables are transcribed
from the published ITU tables and checked prefix-free by test).

Pixel conventions: bilevel arrays use 1 = black; photometric 0
(WhiteIsZero — the G4 convention) maps 1-bits to black pixels.
"""

from __future__ import annotations

import struct
from bisect import bisect_right

import numpy as np

# ---------------------------------------------------------------------------
# bit IO (MSB-first, TIFF fill order 1)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.buf.append((self._acc << (8 - self._n)) & 0xFF)
            self._acc = 0
            self._n = 0


class _BitReader:
    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self._pos >> 3
        if byte >= len(self._d):
            raise ValueError("g4: bitstream exhausted")
        bit = (self._d[byte] >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def peek_all_ones(self, n: int) -> bool:
        """True iff the next ``n`` bits are all 1, without advancing.
        Bulk byte-window compare (one int.from_bytes), not n bit reads —
        the repeated-row fast path of the G4 decoder rides on this."""
        pos = self._pos
        end = pos + n
        if end > len(self._d) * 8:
            return False
        first = pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self._d[first : last + 1], "big")
        shift = (last - first + 1) * 8 - (end - (first << 3))
        mask = (1 << n) - 1
        return (chunk >> shift) & mask == mask

    def skip(self, n: int) -> None:
        self._pos += n


# ---------------------------------------------------------------------------
# PackBits (compression 32773)
# ---------------------------------------------------------------------------


def packbits_encode(row: bytes) -> bytes:
    """One row's PackBits stream (TIFF restarts the coder per row)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # run of >= 2 identical bytes -> replicate packet (worth it at 2)
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        # literal: until the next >=3 run or 128 bytes
        start = i
        i += 1
        while i < n and i - start < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - start - 1)
        out += row[start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("packbits: truncated literal")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("packbits: truncated run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # 128 = noop
    if len(out) < expected:
        raise ValueError("packbits: short output")
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# T.4 run-length code tables (ITU-T T.4 §2.2.2.2, shared by T.6 horizontal
# mode). value -> (code, nbits). Transcribed from the published tables;
# prefix-freeness is asserted by test_tiffio.py.
# ---------------------------------------------------------------------------

_WHITE_CODES = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6),
    15: (0b110101, 6), 16: (0b101010, 6), 17: (0b101011, 6),
    18: (0b0100111, 7), 19: (0b0001100, 7), 20: (0b0001000, 7),
    21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7),
    27: (0b0100100, 7), 28: (0b0011000, 7), 29: (0b00000010, 8),
    30: (0b00000011, 8), 31: (0b00011010, 8), 32: (0b00011011, 8),
    33: (0b00010010, 8), 34: (0b00010011, 8), 35: (0b00010100, 8),
    36: (0b00010101, 8), 37: (0b00010110, 8), 38: (0b00010111, 8),
    39: (0b00101000, 8), 40: (0b00101001, 8), 41: (0b00101010, 8),
    42: (0b00101011, 8), 43: (0b00101100, 8), 44: (0b00101101, 8),
    45: (0b00000100, 8), 46: (0b00000101, 8), 47: (0b00001010, 8),
    48: (0b00001011, 8), 49: (0b01010010, 8), 50: (0b01010011, 8),
    51: (0b01010100, 8), 52: (0b01010101, 8), 53: (0b00100100, 8),
    54: (0b00100101, 8), 55: (0b01011000, 8), 56: (0b01011001, 8),
    57: (0b01011010, 8), 58: (0b01011011, 8), 59: (0b01001010, 8),
    60: (0b01001011, 8), 61: (0b00110010, 8), 62: (0b00110011, 8),
    63: (0b00110100, 8),
    # makeup
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9), 1152: (0b011010111, 9),
    1216: (0b011011000, 9), 1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9), 1536: (0b010011001, 9),
    1600: (0b010011010, 9), 1664: (0b011000, 6), 1728: (0b010011011, 9),
}

_BLACK_CODES = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7),
    11: (0b0000101, 7), 12: (0b0000111, 7), 13: (0b00000100, 8),
    14: (0b00000111, 8), 15: (0b000011000, 9), 16: (0b0000010111, 10),
    17: (0b0000011000, 10), 18: (0b0000001000, 10),
    19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11),
    23: (0b00000101000, 11), 24: (0b00000010111, 11),
    25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12),
    29: (0b000011001101, 12), 30: (0b000001101000, 12),
    31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12),
    35: (0b000011010011, 12), 36: (0b000011010100, 12),
    37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12),
    41: (0b000001101101, 12), 42: (0b000011011010, 12),
    43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12),
    47: (0b000001010111, 12), 48: (0b000001100100, 12),
    49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12),
    53: (0b000000110111, 12), 54: (0b000000111000, 12),
    55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12),
    59: (0b000000101011, 12), 60: (0b000000101100, 12),
    61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
    # makeup
    64: (0b0000001111, 10), 128: (0b000011001000, 12),
    192: (0b000011001001, 12), 256: (0b000001011011, 12),
    320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13),
    576: (0b0000001101101, 13), 640: (0b0000001001010, 13),
    704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13),
    960: (0b0000001110011, 13), 1024: (0b0000001110100, 13),
    1088: (0b0000001110101, 13), 1152: (0b0000001110110, 13),
    1216: (0b0000001110111, 13), 1280: (0b0000001010010, 13),
    1344: (0b0000001010011, 13), 1408: (0b0000001010100, 13),
    1472: (0b0000001010101, 13), 1536: (0b0000001011010, 13),
    1600: (0b0000001011011, 13), 1664: (0b0000001100100, 13),
    1728: (0b0000001100101, 13),
}

# extended makeup codes (shared between colors), T.4 table 3
_EXT_CODES = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11),
    1920: (0b00000001101, 11), 1984: (0b000000010010, 12),
    2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12),
    2304: (0b000000010111, 12), 2368: (0b000000011100, 12),
    2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}


def _decode_tree(tables: list[dict]) -> dict:
    tree = {}
    for tbl in tables:
        for value, (code, nbits) in tbl.items():
            key = (nbits, code)
            if key in tree and tree[key] != value:
                raise AssertionError("T.4 table conflict")
            tree[key] = value
    return tree


_WHITE_TREE = _decode_tree([_WHITE_CODES, _EXT_CODES])
_BLACK_TREE = _decode_tree([_BLACK_CODES, _EXT_CODES])
_MAX_CODE_BITS = 13


def _put_run(bw: _BitWriter, run: int, color: int) -> None:
    tbl = _BLACK_CODES if color else _WHITE_CODES
    while run > 2560 + 63:
        code, nbits = _EXT_CODES[2560]
        bw.write(code, nbits)
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        code, nbits = tbl[m] if m <= 1728 else _EXT_CODES[m]
        bw.write(code, nbits)
        run -= m
    code, nbits = tbl[run]
    bw.write(code, nbits)


def _get_run(br: _BitReader, color: int) -> int:
    tree = _BLACK_TREE if color else _WHITE_TREE
    total = 0
    while True:
        acc = 0
        nbits = 0
        while True:
            acc = (acc << 1) | br.read_bit()
            nbits += 1
            if (nbits, acc) in tree:
                v = tree[(nbits, acc)]
                break
            if nbits > _MAX_CODE_BITS:
                raise ValueError("g4: bad run code")
        total += v
        if v < 64:  # terminating code ends the run
            return total


# ---------------------------------------------------------------------------
# CCITT T.6 (Group 4) 2-D coding
# ---------------------------------------------------------------------------


def _transitions(row: np.ndarray) -> list[int]:
    """Color-change positions of a 0/1 row (imaginary white pixel before
    position 0); even indices are white->black changes."""
    prep = np.concatenate((np.zeros(1, row.dtype), row))
    return np.flatnonzero(prep[1:] != prep[:-1]).tolist()


def _ref_b1_b2(ref: list[int], a0: int, color: int, width: int):
    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


_VCODES = {  # d -> (code, nbits)
    0: (0b1, 1), 1: (0b011, 3), -1: (0b010, 3),
    2: (0b000011, 6), -2: (0b000010, 6),
    3: (0b0000011, 7), -3: (0b0000010, 7),
}


def _enc_row(cur: list[int], ref: list[int], width: int, bw: _BitWriter):
    a0, color = -1, 0
    while a0 < width:
        k = bisect_right(cur, a0)
        a1 = cur[k] if k < len(cur) else width
        b1, b2 = _ref_b1_b2(ref, a0, color, width)
        if b2 < a1:
            bw.write(0b0001, 4)  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            code, nbits = _VCODES[a1 - b1]
            bw.write(code, nbits)
            a0 = a1
            color ^= 1
        else:
            bw.write(0b001, 3)  # horizontal
            s = max(a0, 0)
            a2 = cur[k + 1] if k + 1 < len(cur) else width
            _put_run(bw, a1 - s, color)
            _put_run(bw, a2 - a1, color ^ 1)
            a0 = a2


def _dec_row(ref: list[int], width: int, br: _BitReader) -> np.ndarray:
    row = np.zeros(width, np.uint8)
    a0, color = -1, 0
    while a0 < width:
        b1, b2 = _ref_b1_b2(ref, a0, color, width)
        # mode code
        if br.read_bit():  # 1 -> V0
            mode, d = "v", 0
        elif br.read_bit():  # 01x
            mode, d = "v", 1 if br.read_bit() else -1
        elif br.read_bit():  # 001
            mode, d = "h", 0
        elif br.read_bit():  # 0001
            mode, d = "p", 0
        elif br.read_bit():  # 00001x
            mode, d = "v", 2 if br.read_bit() else -2
        elif br.read_bit():  # 000001x
            mode, d = "v", 3 if br.read_bit() else -3
        else:
            raise ValueError("g4: EOL/extension inside image data")
        s = max(a0, 0)
        if mode == "p":
            if b2 > width:
                raise ValueError("g4: pass beyond row")
            if color:
                row[s:b2] = 1
            a0 = b2
        elif mode == "v":
            a1 = b1 + d
            if a1 < 0 or a1 > width or a1 < s:
                raise ValueError("g4: bad vertical offset")
            if color:
                row[s:a1] = 1
            a0 = a1
            color ^= 1
        else:  # horizontal
            r1 = _get_run(br, color)
            r2 = _get_run(br, color ^ 1)
            if s + r1 + r2 > width:
                raise ValueError("g4: horizontal runs beyond row")
            if color:
                row[s : s + r1] = 1
            else:
                row[s + r1 : s + r1 + r2] = 1
            a0 = s + r1 + r2
    return row


def g4_encode(img: np.ndarray) -> bytes:
    """CCITT Group-4 stream for a 2-D 0/1 array (1 = black), EOFB
    terminated, byte aligned.

    Two bulk fast paths (bit-identical output, certified by byte-compare
    against the plain per-row loop): transitions for ALL rows come from one
    whole-image np.nonzero instead of h per-row calls, and a row identical
    to its reference row encodes as exactly len(ref)+1 V0 codes — i.e.
    len(ref)+1 one-bits written in one call (the encoder loop provably
    emits V0 at every step when cur == ref). Document rasters are
    dominated by repeated rows, so this removes most per-transition work.
    """
    h, w = img.shape
    bw = _BitWriter()
    # all rows' color-change positions in one pass
    prep = np.zeros((h, w + 1), np.uint8)
    prep[:, 1:] = img
    ys, xs = np.nonzero(prep[:, 1:] != prep[:, :-1])
    splits = np.searchsorted(ys, np.arange(1, h))
    per_row = np.split(xs, splits)
    eq_prev = np.zeros(h, dtype=bool)
    if h > 1:
        eq_prev[1:] = (img[1:] == img[:-1]).all(axis=1)

    ref: list[int] = []  # imaginary all-white reference line
    for y in range(h):
        arr = per_row[y]
        # cur == ref  ⟺  pixel row equals previous row (y>0) or is blank
        # (y == 0, ref being the imaginary all-white line)
        if eq_prev[y] if y else arr.size == 0:
            n1 = int(arr.size) + 1
            bw.write((1 << n1) - 1, n1)  # n1 × V0
            continue  # ref unchanged
        cur = arr.tolist()
        _enc_row(cur, ref, w, bw)
        ref = cur
    bw.write(1, 12)  # EOFB = EOL + EOL
    bw.write(1, 12)
    bw.flush()
    return bytes(bw.buf)


def g4_decode(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode a Group-4 stream to a (height, width) 0/1 array (1 = black)."""
    if width <= 0 or height <= 0:
        raise ValueError("g4: bad dimensions")
    br = _BitReader(data)
    ref: list[int] = []
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        # repeated-row fast path, dual of the encoder's: len(ref)+1 leading
        # one-bits can ONLY be len(ref)+1 V0 codes, which exactly complete
        # a row identical to the reference row (the (len(ref)+1)-th V0
        # lands a0 on width regardless of what follows in the stream)
        n1 = len(ref) + 1
        if br.peek_all_ones(n1):
            br.skip(n1)
            if y > 0:
                out[y] = out[y - 1]
            # y == 0: a single leading 1 with the empty reference line is a
            # blank row — out[0] is already zeros, ref stays []
            continue
        row = _dec_row(ref, width, br)
        out[y] = row
        ref = _transitions(row)
    return out


# ---------------------------------------------------------------------------
# TIFF container
# ---------------------------------------------------------------------------

COMP_NONE, COMP_G4, COMP_PACKBITS = 1, 4, 32773
_MAX_PIXELS = 1 << 26  # 64 Mpx/frame decode cap (bounded work on hostile input)


def _pack_bilevel_rows(img: np.ndarray) -> bytes:
    """Bit-pack a 0/1 array row-aligned to bytes, MSB first (fill order 1)."""
    return np.packbits(img.astype(np.uint8), axis=1).tobytes()


def encode_tiff(frames: list[dict]) -> bytes:
    """Multi-page little-endian baseline TIFF.

    Each frame dict: ``mode`` ('rgb' | 'gray' | 'bilevel'), ``width``,
    ``height``, ``pixels`` (rgb/gray: row-major bytes; bilevel: 2-D 0/1
    numpy array, 1 = black), ``compression`` (COMP_NONE / COMP_PACKBITS
    for rgb/gray; COMP_NONE / COMP_G4 / COMP_PACKBITS for bilevel).
    Bilevel pages use photometric 0 (WhiteIsZero, the G4 convention)."""
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_patch_at = 4  # where to write the NEXT ifd offset
    for fr in frames:
        mode, w, h = fr["mode"], fr["width"], fr["height"]
        comp = fr.get("compression", COMP_NONE)
        if mode == "bilevel":
            img = np.asarray(fr["pixels"], np.uint8).reshape(h, w)
            if comp == COMP_G4:
                strip = g4_encode(img)
            else:
                raw = _pack_bilevel_rows(img)
                if comp == COMP_PACKBITS:
                    stride = (w + 7) // 8
                    strip = b"".join(
                        packbits_encode(raw[y * stride : (y + 1) * stride])
                        for y in range(h)
                    )
                elif comp == COMP_NONE:
                    strip = raw
                else:
                    raise ValueError("encode_tiff: unsupported compression")
            bits, spp, photometric = [1], 1, 0
        else:
            spp = 3 if mode == "rgb" else 1
            raw = bytes(fr["pixels"])
            if len(raw) != w * h * spp:
                raise ValueError("encode_tiff: pixel buffer size mismatch")
            if comp == COMP_PACKBITS:
                stride = w * spp
                strip = b"".join(
                    packbits_encode(raw[y * stride : (y + 1) * stride])
                    for y in range(h)
                )
            elif comp == COMP_NONE:
                strip = raw
            else:
                raise ValueError("encode_tiff: unsupported compression")
            bits = [8] * spp
            photometric = 2 if mode == "rgb" else 1

        if len(out) & 1:
            out.append(0)
        strip_off = len(out)
        out += strip
        bits_off = None
        if len(bits) > 1:
            if len(out) & 1:
                out.append(0)
            bits_off = len(out)
            out += struct.pack("<%dH" % len(bits), *bits)
        if len(out) & 1:
            out.append(0)
        ifd_off = len(out)

        def entry(tag, typ, count, value):
            if typ == 3 and count == 1:
                return struct.pack("<HHIHH", tag, typ, count, value, 0)
            return struct.pack("<HHII", tag, typ, count, value)

        entries = [
            entry(256, 4, 1, w),            # ImageWidth
            entry(257, 4, 1, h),            # ImageLength
            (
                entry(258, 3, len(bits), bits_off)
                if bits_off is not None
                else entry(258, 3, 1, bits[0])
            ),                              # BitsPerSample
            entry(259, 3, 1, comp),         # Compression
            entry(262, 3, 1, photometric),  # PhotometricInterpretation
            entry(273, 4, 1, strip_off),    # StripOffsets
            entry(277, 3, 1, spp),          # SamplesPerPixel
            entry(278, 4, 1, h),            # RowsPerStrip
            entry(279, 4, 1, len(strip)),   # StripByteCounts
        ]
        struct.pack_into("<I", out, ifd_patch_at, ifd_off)
        out += struct.pack("<H", len(entries))
        for e in entries:
            out += e
        ifd_patch_at = len(out)
        out += b"\x00\x00\x00\x00"  # next-IFD offset (patched or terminal)
    return bytes(out)


_TYPE_SIZES = {1: 1, 3: 2, 4: 4}


def _read_ifd_values(data: bytes, endian: str, typ: int, count: int,
                     raw: bytes) -> list[int] | None:
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None  # unknown type: caller ignores the tag
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(data):
            raise ValueError("tiff: value offset out of range")
        buf = data[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    return list(struct.unpack(endian + str(count) + fmt, buf))


def tiff_page_info(content: bytes, max_pages: int = 512) -> list[dict]:
    """Walk the IFD chain and return per-page tag dicts (no pixel decode).
    Raises ``ValueError`` on malformed input."""
    if len(content) < 8:
        raise ValueError("tiff: short header")
    if content[:4] == b"II*\x00":
        endian = "<"
    elif content[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("tiff: bad magic")
    (off,) = struct.unpack_from(endian + "I", content, 4)
    pages, seen = [], set()
    while off and len(pages) < max_pages:
        if off in seen or off + 2 > len(content):
            raise ValueError("tiff: bad IFD offset")
        seen.add(off)
        (n,) = struct.unpack_from(endian + "H", content, off)
        end = off + 2 + 12 * n
        if end + 4 > len(content):
            raise ValueError("tiff: truncated IFD")
        tags = {}
        for k in range(n):
            tag, typ, count = struct.unpack_from(
                endian + "HHI", content, off + 2 + 12 * k
            )
            raw = content[off + 10 + 12 * k : off + 14 + 12 * k]
            vals = _read_ifd_values(content, endian, typ, count, raw)
            if vals is not None:
                tags[tag] = vals
        pages.append(tags)
        (off,) = struct.unpack_from(endian + "I", content, end)
    return pages


def decode_tiff_frames(content: bytes, max_pages: int = 64) -> list[tuple]:
    """Decode every page to ``(width, height, rgb_bytes)``.

    Supports the baseline set this module writes: compression 1 / 32773 /
    4, bits 1 or 8, photometric 0/1/2, any strip layout. Raises
    ``ValueError`` outside that envelope (callers fail open)."""
    pages = tiff_page_info(content, max_pages=max_pages)
    out = []
    for tags in pages:
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise ValueError("tiff: bad dimensions")
        bits = tags.get(258, [1])
        comp = tags.get(259, [COMP_NONE])[0]
        photometric = tags.get(262, [0])[0]
        spp = tags.get(277, [1])[0]
        rps = tags.get(278, [h])[0] or h
        offs = tags.get(273)
        counts = tags.get(279)
        if offs is None or counts is None or len(offs) != len(counts):
            raise ValueError("tiff: missing strip tags")
        if spp not in (1, 3) or len(bits) != spp or bits != [bits[0]] * spp:
            raise ValueError("tiff: unsupported sample layout")
        depth = bits[0]
        if depth not in (1, 8) or (depth == 1 and spp != 1):
            raise ValueError("tiff: unsupported bit depth")

        stride = (w * depth * spp + 7) // 8
        rows = np.zeros((h, w * spp) if depth == 8 else (h, w), np.uint8)
        y0 = 0
        for off, cnt in zip(offs, counts):
            if off + cnt > len(content):
                raise ValueError("tiff: strip out of range")
            nrows = min(rps, h - y0)
            if nrows <= 0:
                raise ValueError("tiff: extra strips")
            strip = content[off : off + cnt]
            if comp == COMP_G4:
                if depth != 1:
                    raise ValueError("tiff: G4 needs bilevel")
                rows[y0 : y0 + nrows] = g4_decode(strip, w, nrows)
            else:
                if comp == COMP_PACKBITS:
                    raw = packbits_decode(strip, stride * nrows)
                elif comp == COMP_NONE:
                    if cnt < stride * nrows:
                        raise ValueError("tiff: short strip")
                    raw = strip[: stride * nrows]
                else:
                    raise ValueError("tiff: unsupported compression %d" % comp)
                arr = np.frombuffer(raw, np.uint8).reshape(nrows, stride)
                if depth == 1:
                    bitsarr = np.unpackbits(arr, axis=1)[:, :w]
                    rows[y0 : y0 + nrows] = bitsarr
                else:
                    rows[y0 : y0 + nrows] = arr[:, : w * spp]
            y0 += nrows
        if y0 != h:
            raise ValueError("tiff: missing strips")

        if depth == 1:
            # bilevel: bit 1 = black under photometric 0 (WhiteIsZero)
            if photometric == 0:
                gray = np.where(rows == 1, 0, 255).astype(np.uint8)
            else:
                gray = np.where(rows == 1, 255, 0).astype(np.uint8)
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
        elif spp == 1:
            gray = 255 - rows if photometric == 0 else rows
            rgb = np.repeat(gray.reshape(h, w)[:, :, None], 3, axis=2)
        else:
            rgb = rows.reshape(h, w, 3)
        out.append((w, h, rgb.tobytes()))
    return out
