"""Roundtrip + contract tests for the from-scratch PDF 1.4 codec."""

import pytest

from marie_icr_spark.operators.pdfio import (
    LEFT_PAD,
    PdfPage,
    baseline_y,
    decode_pdf_pages,
    encode_pdf,
    font_size_for_line,
    is_vertical_text,
    render_word_ops,
)


def test_roundtrip_basic():
    pages = [
        PdfPage(200, 100, [(10, 5, 72, "hello"), (10, 60, 72, "world")]),
        PdfPage(300, 50, []),
        PdfPage(80, 400, [(13, 5, 388, "héllo (universe) \\ 末")]),
    ]
    blob = encode_pdf(pages)
    assert blob.startswith(b"%PDF-1.4")
    assert blob.rstrip().endswith(b"%%EOF")
    out = decode_pdf_pages(blob)
    assert [(p.width, p.height, p.ops) for p in out] == [
        (p.width, p.height, p.ops) for p in pages
    ]


def test_damaged_xref_still_decodes():
    """The parser is documented as an xref-free recovery walk — corrupting
    every xref offset (what a truncating writer or transfer glitch leaves
    behind) must not affect decoding, and neither must dropping the whole
    xref/trailer tail after the last endobj."""
    pages = [
        PdfPage(200, 100, [(10, 5, 72, "hello"), (10, 60, 72, "wörld")]),
        PdfPage(80, 400, [(13, 5, 388, "tail")]),
    ]
    blob = encode_pdf(pages)
    want = [(p.width, p.height, p.ops) for p in pages]

    # zero every offset digit in the xref table. NB: a bare rindex(b"xref")
    # matches inside "startxref" (after the trailer), so anchor on the
    # newline-delimited section keywords to slice the actual table.
    xat = blob.rindex(b"\nxref\n") + 1
    tat = blob.rindex(b"\ntrailer\n") + 1
    table = blob[xat:tat]
    broken_table = table.replace(b"1", b"0").replace(
        b"2", b"0"
    ).replace(b"3", b"0").replace(b"4", b"0")
    broken = blob[:xat] + broken_table + blob[tat:]
    # prove an OFFSET entry actually changed (not just the '65535'
    # generation digits): the first 10-digit offset field differs
    import re as _re

    old_off = _re.search(rb"\n(\d{10}) \d{5} n", table)
    new_off = _re.search(rb"\n(\d{10}) \d{5} n", broken_table)
    assert old_off and new_off and old_off.group(1) != new_off.group(1)
    out = decode_pdf_pages(broken)
    assert [(p.width, p.height, p.ops) for p in out] == want

    # amputate the xref + trailer entirely
    cut = blob[: blob.rindex(b"endobj") + 6]
    out = decode_pdf_pages(cut)
    assert [(p.width, p.height, p.ops) for p in out] == want


def test_roundtrip_property():
    import random

    rng = random.Random(11)
    alphabet = "ab cX()<>\\\n\té世"
    for _ in range(25):
        pages = []
        for _p in range(rng.randint(1, 6)):
            ops = [
                (
                    rng.randint(0, 40),
                    rng.randint(-5, 2000),
                    rng.randint(-5, 2000),
                    "".join(
                        rng.choice(alphabet)
                        for _ in range(rng.randint(0, 20))
                    ),
                )
                for _ in range(rng.randint(0, 12))
            ]
            pages.append(
                PdfPage(rng.randint(1, 3000), rng.randint(1, 3000), ops)
            )
        out = decode_pdf_pages(encode_pdf(pages))
        assert [(p.width, p.height, p.ops) for p in out] == [
            (p.width, p.height, p.ops) for p in pages
        ]


def test_xref_offsets_are_exact():
    """The xref table must point at each object's 'N 0 obj' byte."""
    blob = encode_pdf([PdfPage(10, 10, [(8, 1, 2, "x")])])
    xref_at = int(blob.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert blob[xref_at : xref_at + 4] == b"xref"
    lines = blob[xref_at:].split(b"\n")
    # entries start after "xref" and "0 N" lines; entry 0 is the free head
    entries = [l for l in lines[2:] if l.endswith((b" n ", b" n"))]
    for num, entry in enumerate(entries, start=1):
        off = int(entry.split()[0])
        assert blob[off:].startswith(b"%d 0 obj" % num)


def test_reference_placement_constants():
    # determine_font_size(16) == int((16 // 2) * 1.3) == 10
    assert font_size_for_line(16) == 10
    assert font_size_for_line(31) == 19  # int(15 * 1.3) = 19
    assert font_size_for_line(0) == 0
    # baseline: img_h - ly - lh*0.80 with lh=16 -> img_h - ly - 12
    assert baseline_y(100, 20, 16) == 100 - 20 - 12
    assert LEFT_PAD == 5
    # vertical-text rule: len>2 and w/h < 0.4
    assert is_vertical_text("abc", 3, 10)
    assert not is_vertical_text("ab", 3, 10)  # short text exempt
    assert not is_vertical_text("abc", 4, 10)  # 0.4 exactly is NOT < 0.4
    assert not is_vertical_text("abcd", 9, 16)


def test_render_word_ops_contract():
    # (text, x, y, w, h, line_y, line_h)
    words = [
        ("hi", 0, 20, 18, 16, 20, 16),
        ("", 30, 20, 9, 16, 20, 16),  # empty -> skipped
        ("tall", 40, 20, 4, 16, 20, 16),  # vertical -> skipped
        ("ok", 60, 40, 18, 16, 40, 16),
    ]
    ops = render_word_ops(words, img_h=100)
    assert ops == [
        (10, 5, 100 - 20 - 12, "hi"),
        (10, 65, 100 - 40 - 12, "ok"),
    ]


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"not a pdf",
        b"%PDF-1.4\njunk with no objects",
        b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n",  # no page tree
        b"%PDF-1.4\n1 0 obj\n<< /Type /Pages /Kids [9 0 R] /Count 1 >>"
        b"\nendobj\n",  # dangling page ref
        b"%PDF-1.4\n1 0 obj\n<< no endobj terminator",
    ],
)
def test_malformed_inputs_fail_closed(blob):
    with pytest.raises(ValueError):
        decode_pdf_pages(blob)


def test_max_pages_bound():
    pages = [PdfPage(5, 5, []) for _ in range(4)]
    blob = encode_pdf(pages)
    with pytest.raises(ValueError):
        decode_pdf_pages(blob, max_pages=3)
    assert len(decode_pdf_pages(blob, max_pages=4)) == 4


def test_pdf_page_from_turn_fail_soft():
    """Blank turns and dangling line ids must not crash the packer: the
    reference emits a degenerate empty page (pdf_renderer.py:80-83) and
    falls back to the word's own box when word2line misses
    (pdf_renderer.py:113-122)."""
    from marie_icr_spark.queries_ext import _pdf_page_from_turn

    # completely blank turn -> op-less 1x1 page
    pg = _pdf_page_from_turn([], [])
    assert (pg.width, pg.height, pg.ops) == (1, 1, [])

    # words whose line id is missing from the line structs: baseline from
    # the word box itself
    words = [
        {"text": "hi", "box": [0, 20, 18, 16], "line": 7, "word_index": 0}
    ]
    pg = _pdf_page_from_turn(words, [])
    assert (pg.width, pg.height) == (18, 36)
    assert pg.ops == [(10, 5, 36 - 20 - 12, "hi")]

    # normal path still prefers the owning line's bbox
    lines = [{"line": 7, "bbox": [0, 18, 40, 20]}]
    pg = _pdf_page_from_turn(words, lines)
    assert (pg.width, pg.height) == (40, 38)
    assert pg.ops == [(13, 5, 38 - 18 - 16, "hi")]
