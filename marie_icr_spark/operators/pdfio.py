"""Minimal PDF 1.4 writer + parser, pure stdlib.

The reference renders per-page word overlays into a searchable PDF via
reportlab + PyPDF4 (``marie/renderer/pdf_renderer.py:33-137``): one canvas
per page sized to the source raster, each word drawn with ``Helvetica`` at
``font_size = int((line_height // 2) * 1.3)``
(``marie/utils/draw_truetype.py:51-63``), positioned at
``(x + 5, img_h - line_y - line_h * 0.80)`` (the ``left_pad``/baseline
transform at ``pdf_renderer.py:108-127``), skipping empty words and
probable vertical text (``len(text) > 2 and w / h < 0.4``,
``pdf_renderer.py:99-106``); pages are concatenated with ``PdfFileWriter``
(``pdf_renderer.py:156-168``).

Neither reportlab nor any PDF library exists in this container, so — like
``tiffio`` — this is a from-scratch transposition of the *format
contract*: a writer that emits a well-formed PDF 1.4 body (catalog, page
tree, one shared Type1 Helvetica resource, per-page uncompressed content
streams of ``BT/Tf/Td/Tj/ET`` text operators, xref table + trailer), and a
parser that walks the xref-free object graph back out, so correctness is
certified by roundtrip property tests plus a DuckDB oracle that replays
the placement arithmetic.

Quantization (repo convention — see CLAUDE.md float rule): the reference's
float baseline ``lh * 0.80`` and font ``* 1.3`` are pinned to the
integer-exact forms ``(lh * 4) // 5`` and ``((lh // 2) * 13) // 10`` so
Spark and the SQL oracle agree bit-for-bit.

Text payloads are written as PDF hex strings (``<...>``) holding UTF-8
bytes: hex strings are legal PDF string syntax, need no escaping, and
roundtrip arbitrary text exactly.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def font_size_for_line(line_h: int) -> int:
    """``determine_font_size`` (draw_truetype.py:51-63), integer-pinned."""
    return ((int(line_h) // 2) * 13) // 10


def baseline_y(img_h: int, line_y: int, line_h: int) -> int:
    """PDF-space baseline for a word on a line (pdf_renderer.py:113-122),
    integer-pinned: ``img_h - ly - lh * 0.80``."""
    return int(img_h) - int(line_y) - (int(line_h) * 4) // 5


LEFT_PAD = 5  # pdf_renderer.py:110 "By observation"


def is_vertical_text(text: str, w: int, h: int) -> bool:
    """Probable-vertical-text skip rule (pdf_renderer.py:99-106):
    ``len(text) > 2 and w / h < 0.4`` (integer-exact cross-multiply)."""
    return len(text) > 2 and 10 * int(w) < 4 * int(h)


@dataclass
class PdfPage:
    width: int
    height: int
    # (font_size, x, y, text) in draw order
    ops: list = field(default_factory=list)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _content_stream(page: PdfPage) -> bytes:
    """Uncompressed text-only content stream.

    Matches the reference's degenerate empty-page behaviour
    (pdf_renderer.py:80-83: a zero-size empty ``drawString``) by emitting
    an empty stream when there are no ops.
    """
    parts = []
    for fs, x, y, text in page.ops:
        hx = text.encode("utf-8").hex()
        parts.append(
            b"BT /F1 %d Tf %d %d Td <%s> Tj ET"
            % (int(fs), int(x), int(y), hx.encode("ascii"))
        )
    return b"\n".join(parts)


def encode_pdf(pages: list[PdfPage]) -> bytes:
    """Emit a complete single-xref PDF 1.4 file.

    Object layout: 1 = Catalog, 2 = Pages, 3 = /F1 Helvetica, then for
    page i (0-based): 4+2i = Page, 5+2i = its Contents stream.
    """
    objs: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join("%d 0 R" % (4 + 2 * i) for i in range(n))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        kids.encode("ascii"),
        n,
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for i, p in enumerate(pages):
        stream = _content_stream(p)
        objs[4 + 2 * i] = (
            b"<< /Type /Page /Parent 2 0 R"
            b" /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % (int(p.width), int(p.height), 5 + 2 * i)
        )
        objs[5 + 2 * i] = (
            b"<< /Length %d >>\nstream\n" % len(stream)
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    nobj = max(objs) + 1
    out += b"xref\n0 %d\n0000000000 65535 f \n" % nobj
    for num in range(1, nobj):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (nobj, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*(-?\d+)\s+(-?\d+)\s+(-?\d+)\s+(-?\d+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_TEXT_OP_RE = re.compile(
    rb"BT\s*/F1\s+(-?\d+)\s+Tf\s+(-?\d+)\s+(-?\d+)\s+Td\s*<([0-9a-fA-F]*)>"
    rb"\s*Tj\s*ET"
)
_MAX_OBJECTS = 1 << 16


def _objects(data: bytes) -> dict[int, bytes]:
    """Scan ``N 0 obj ... endobj`` spans (xref-free recovery walk — the
    same strategy real readers use on a damaged xref). Bounded, and
    fail-closed ``ValueError`` on malformed structure."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if m is None:
            break
        end = data.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("pdf: unterminated object")
        objs[int(m.group(1))] = data[m.end():end]
        if len(objs) > _MAX_OBJECTS:
            raise ValueError("pdf: too many objects")
        pos = end + 6
    if not objs:
        raise ValueError("pdf: no objects")
    return objs


def _stream_body(obj: bytes) -> bytes:
    i = obj.find(b"stream")
    if i < 0:
        raise ValueError("pdf: contents object has no stream")
    j = i + 6
    if obj[j : j + 2] == b"\r\n":
        j += 2
    elif obj[j : j + 1] in (b"\n", b"\r"):
        j += 1
    k = obj.rfind(b"endstream")
    if k < 0:
        raise ValueError("pdf: unterminated stream")
    body = obj[j:k]
    # strip the single EOL the writer puts before "endstream"
    if body.endswith(b"\r\n"):
        body = body[:-2]
    elif body.endswith((b"\n", b"\r")):
        body = body[:-1]
    return body


def decode_pdf_pages(data: bytes, max_pages: int = 4096) -> list[PdfPage]:
    """Parse pages in /Kids order; each page's text ops in stream order.

    Returns ``PdfPage`` objects mirroring what ``encode_pdf`` was given —
    the roundtrip identity the tests pin.
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("pdf: bad magic")
    objs = _objects(data)
    kids_m = None
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            kids_m = _KIDS_RE.search(body)
            break
    if kids_m is None:
        raise ValueError("pdf: no page tree")
    page_ids = [int(g) for g in _REF_RE.findall(kids_m.group(1))]
    if len(page_ids) > max_pages:
        raise ValueError("pdf: too many pages")
    pages: list[PdfPage] = []
    for pid in page_ids:
        body = objs.get(pid)
        if body is None:
            raise ValueError("pdf: dangling page ref")
        mb = _MEDIABOX_RE.search(body)
        cref = _CONTENTS_RE.search(body)
        if mb is None or cref is None:
            raise ValueError("pdf: page missing MediaBox/Contents")
        cobj = objs.get(int(cref.group(1)))
        if cobj is None:
            raise ValueError("pdf: dangling contents ref")
        stream = _stream_body(cobj)
        ops = [
            (
                int(m.group(1)),
                int(m.group(2)),
                int(m.group(3)),
                bytes.fromhex(m.group(4).decode("ascii")).decode("utf-8"),
            )
            for m in _TEXT_OP_RE.finditer(stream)
        ]
        pages.append(
            PdfPage(
                width=int(mb.group(3)) - int(mb.group(1)),
                height=int(mb.group(4)) - int(mb.group(2)),
                ops=ops,
            )
        )
    return pages


def render_word_ops(
    words: list[tuple[str, int, int, int, int, int, int]], img_h: int
) -> list[tuple[int, int, int, str]]:
    """Transpose ``PdfRenderer.__render_page``'s word loop
    (pdf_renderer.py:85-127) into draw ops.

    ``words`` rows are ``(text, x, y, w, h, line_y, line_h)`` in reading
    order; the line fields are the word's owning line (word2line always
    resolves here — every word belongs to exactly one line by
    construction, extractors/layout.py).
    """
    ops = []
    for text, x, _y, w, h, line_y, line_h in words:
        if not text:
            continue  # pdf_renderer.py:92-94
        if is_vertical_text(text, w, h):
            continue
        ops.append(
            (
                font_size_for_line(line_h),
                int(x) + LEFT_PAD,
                baseline_y(img_h, line_y, line_h),
                text,
            )
        )
    return ops
