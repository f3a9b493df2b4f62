"""Golden tests for the W9 reading-order transposition
(extractors/readingorder.py — LayoutReader contract,
marie/document/layoutreader/text_layout.py:133-231)."""

import random

import pytest

import marie_icr_spark.extractors.readingorder as R


def _grid(lines_words):
    """Build (lines, boxes) for a canonical grid: lines_words is a list of
    word-char-lengths per line; x = 9*offset, w = 9*len, y = 20*ln, h=16."""
    lines, boxes = [], []
    for ln0, lens in enumerate(lines_words):
        x = 0
        for L in lens:
            lines.append(ln0 + 1)  # struct `line` is 1-based
            boxes.append([x, 20 * ln0, 9 * L, 16])
            x += 9 * (L + 1)
    return lines, boxes


def test_two_column_geometry_shape():
    # header line + 4 body lines; body alternates left (b even) / right
    lines, boxes = _grid([[3, 4], [2], [5], [2], [3]])
    xyxy = R.two_column_geometry(lines, boxes)
    # header words keep x and sit at y 0..16
    assert xyxy[0] == [0, 0, 27, 16]
    assert xyxy[1][1] == 0 and xyxy[1][3] == 16
    maxx1 = max(b[0] + b[2] for b in boxes)
    off = maxx1 + R.COL_GAP
    # body line 2 (b=0) -> left col row 0; line 3 (b=1) -> right col row 0
    assert xyxy[2] == [0, R.BODY_Y0, 18, R.BODY_Y0 + 16]
    assert xyxy[3] == [off, R.BODY_Y0, off + 45, R.BODY_Y0 + 16]
    # line 4 (b=2) -> left col row 1; line 5 (b=3) -> right col row 1
    assert xyxy[4][1] == R.BODY_Y0 + 20 and xyxy[4][0] == 0
    assert xyxy[5][0] == off and xyxy[5][1] == R.BODY_Y0 + 20


def test_xy_cut_reads_header_then_left_then_right():
    lines, boxes = _grid([[3, 4], [2, 2], [5], [2, 3], [3]])
    # word order (word_index): header(0,1), b0-left(2,3), b1-right(4),
    # b2-left(5,6), b3-right(7)
    xyxy = R.two_column_geometry(lines, boxes)
    order, reordered = R.xy_cut_order(xyxy)
    assert reordered
    # header first, then the whole left column, then the whole right column
    assert order == [0, 1, 2, 3, 5, 6, 4, 7]
    # and that differs from both the input order and the naive (y, x) scan
    naive = sorted(range(len(xyxy)), key=lambda i: (xyxy[i][1], xyxy[i][0], i))
    assert order != list(range(8)) and order != naive


def test_max_len_fail_open_identity():
    lines, boxes = _grid([[2] * 8 for _ in range(13)])  # 104 words
    assert len(boxes) > R.MAX_REORDER_LEN
    xyxy = R.two_column_geometry(lines, boxes)
    order, reordered = R.xy_cut_order(xyxy)
    assert not reordered and order == list(range(len(boxes)))


def test_single_line_frame_is_x_order():
    lines, boxes = _grid([[3, 1, 4]])
    order, reordered = R.xy_cut_order(R.two_column_geometry(lines, boxes))
    assert reordered and order == [0, 1, 2]


def test_empty_frame():
    assert R.xy_cut_order([]) == ([], True)
    assert R.two_column_geometry([], []) == []


def test_complete_order_reference_contract():
    # dedup keeps first occurrence; out-of-range dropped; unused appended
    # ascending (text_layout.py:208-222)
    assert R.complete_order([2, 2, 0, 9, -1, 3], 5) == [2, 0, 3, 1, 4]
    assert R.complete_order([], 3) == [0, 1, 2]
    assert R.complete_order([1, 0], 2) == [1, 0]


@pytest.mark.parametrize("seed", range(10))
def test_xy_cut_is_always_a_permutation(seed):
    rng = random.Random(seed)
    nlines = rng.randint(0, 13)
    lines, boxes = _grid(
        [[rng.randint(1, 10) for _ in range(rng.randint(1, 8))]
         for _ in range(nlines)]
    )
    xyxy = R.two_column_geometry(lines, boxes)
    order, _ = R.xy_cut_order(xyxy)
    assert sorted(order) == list(range(len(boxes)))
    # deterministic
    assert R.xy_cut_order(xyxy)[0] == order
