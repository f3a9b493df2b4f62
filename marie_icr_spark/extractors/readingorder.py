"""Deterministic reading-order reconstruction (SURVEY §2.5 W9) — the
LayoutReader transposition.

The reference reorders a page's words with a seq2seq LayoutLM model
(``marie/document/layoutreader/text_layout.py:133-231``): ``forward``
predicts an index sequence, ``reconstruct`` dedups it (first occurrence
wins), drops out-of-range indexes, appends the unused indexes in
ascending order (the U3 index-set completion, ``text_layout.py:208-222``)
and fails open to the input order for pages longer than ``max_len``
(``text_layout.py:199-204``).  A GPU seq2seq model has no place in a
deterministic Spark pipeline, so the *order predictor* is transposed to
the classic recursive X-Y cut (Nagy & Seth, 1984 — public document-layout
knowledge): recursively split the page at the widest empty gap in the
x- or y-projection, read top-to-bottom / left-to-right across the cuts.
The surrounding contract (max-len fail-open, index-set completion) is
kept byte-faithful to the reference.

Everything here is pure Python + numpy — this module IS the DuckDB
oracle's twin (the SQL unrolls the same bounded rounds; see
``queries_readorder.py``) and must stay importable without Spark.

Pinned algorithm (both engines implement exactly this):

* ``XY_ROUNDS`` bounded rounds; every region splits at most 2-way per
  round (region id ``reg → reg*2 + bit``; non-split regions propagate
  ``bit=0``, so after K rounds ids are comparable K-bit paths whose
  numeric order IS reading order).
* Projection gaps per region: sort intervals by ``(start, end, idx)``;
  running max of ``end`` over the strict prefix; ``gap = start - cummax``.
  The split is the *largest* gap ``>= MIN_GAP``; among rows sharing the
  largest gap the *smallest* start coordinate wins (deterministic).
* Axis preference: y (horizontal cut) when ``gap_y >= gap_x``, else x.
  ``bit = 1`` for words with ``start >= split`` (below / right of cut).
* Leaf order: ``(y0, x0, input_index)`` lexicographic.
"""

from __future__ import annotations

import numpy as np

MIN_GAP = 12
XY_ROUNDS = 6
MAX_REORDER_LEN = 96
BODY_Y0 = 40  # first body row after the header band (header: y 0..16)
COL_GAP = 36  # empty px between the two body columns


def two_column_geometry(
    lines: list[int], boxes: list[list[int]]
) -> list[list[int]]:
    """Deterministic two-column + header-band projection of the canonical
    single-column word grid (XYWH in, XYXY out).  ``lines`` is the word
    structs' 1-based ``line`` field.

    Line 1 becomes a full-width header at y 0..16.  Body lines alternate
    between a left and a right column (``b % 2`` for body index
    ``b = line - 2``), stacked at ``BODY_Y0 + 20*row``; the right column
    is shifted by ``frame_max_x1 + COL_GAP``.  This is the geometry that
    makes reading order a real problem: the naive ``(y, x)`` scan
    interleaves the columns, the original ``word_index`` order is the
    single-column order, and only a column-aware reader (the reference's
    LayoutReader; here the X-Y cut) yields header → left column → right
    column.
    """
    if not boxes:
        return []
    maxx1 = max(b[0] + b[2] for b in boxes)
    off = maxx1 + COL_GAP
    out = []
    for ln, (x, _y, w, h) in zip(lines, boxes):
        b = ln - 2
        if b < 0:
            out.append([x, 0, x + w, h])
            continue
        col = b % 2
        row = b // 2
        x0 = x + col * off
        y0 = BODY_Y0 + 20 * row
        out.append([x0, y0, x0 + w, y0 + h])
    return out


def _best_gap(s: np.ndarray, e: np.ndarray, idx: np.ndarray):
    """(largest projection gap, split coordinate) for one region's
    intervals, or (0, None) when no positive gap exists."""
    o = np.lexsort((idx, e, s))
    ss, ee = s[o], e[o]
    cm = np.maximum.accumulate(ee)
    gaps = ss[1:] - cm[:-1]
    if gaps.size == 0:
        return 0, None
    g = int(gaps.max())
    if g <= 0:
        return 0, None
    return g, int(ss[1:][gaps == g].min())


def xy_cut_order(
    xyxy: list[list[int]],
    min_gap: int = MIN_GAP,
    rounds: int = XY_ROUNDS,
    max_len: int = MAX_REORDER_LEN,
) -> tuple[list[int], bool]:
    """Reading-order permutation over XYXY boxes: returns
    ``(order, reordered)`` where ``order[k]`` is the input index of the
    k-th word in reading order.  Pages longer than ``max_len`` are not
    reordered (``reordered=False``, identity order) — the reference's
    fail-open (text_layout.py:199-204)."""
    n = len(xyxy)
    if n == 0:
        return [], True
    if n > max_len:
        return list(range(n)), False
    a = np.asarray(xyxy, dtype=np.int64)
    x0, y0, x1, y1 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    idx = np.arange(n, dtype=np.int64)
    reg = np.zeros(n, dtype=np.int64)
    for _ in range(rounds):
        newreg = reg * 2
        for r in np.unique(reg):
            m = reg == r
            gx, sx = _best_gap(x0[m], x1[m], idx[m])
            gy, sy = _best_gap(y0[m], y1[m], idx[m])
            if gy >= min_gap and (gx < min_gap or gy >= gx):
                newreg[m] += y0[m] >= sy
            elif gx >= min_gap:
                newreg[m] += x0[m] >= sx
        reg = newreg
    order = np.lexsort((idx, x0, y0, reg))
    return order.tolist(), True


def complete_order(pred: list[int], n: int) -> list[int]:
    """The reference's index-set completion over a (possibly imperfect)
    predicted order: dedup keeping first occurrence, drop out-of-range
    indexes, append the unused indexes in ascending order
    (text_layout.py:208-222; U3)."""
    seen = list(dict.fromkeys(pred))
    kept = [i for i in seen if 0 <= i < n][:n]
    unused = sorted(set(range(n)) - set(kept))
    return kept + unused
