"""Layout-turn extraction: PDF/OCR word boxes → lines → reading-order text.

Twin of the reference's per-page recognition/assembly path, re-expressed over
a JSON payload of ``[{"text": str, "box": [x, y, w, h]}, ...]`` (scrambled
order, possibly overlapping/degenerate boxes):

* degenerate-region filter (w/h <= 0)      — ``marie/ocr/ocr_engine.py:277-287``
* line clustering (IoU ladder)             — ``marie/boxes/line_processor.py:48-171``
* word→line assignment                     — ``line_processor.py:15-45``
* LTR x-sort, word id = rank               — ``marie/document/ocr_processor.py:160-190``
* per-line regroup in ascending line order, sequential ``word_index``,
  ``" "`` text join, envelope bbox, avg confidence round 4
                                           — ``ocr_processor.py:210-247``
* turn text = line texts sorted by line number joined ``"\n"``
                                           — ``meta_to_text``, ``marie/ocr/util.py:76-82``

Blank payloads return the empty result rather than erroring
(``ocr_processor.py:146-154``).
"""

from __future__ import annotations

import json
from typing import Any

try:  # orjson is ~5x faster for payload parsing; fall back to stdlib
    import orjson as _fastjson

    def _loads(s):
        return _fastjson.loads(s)
except ImportError:  # pragma: no cover
    def _loads(s):
        return json.loads(s)

import numpy as np

from .boxmath import (
    assign_lines,
    cluster_lines,
    envelope,
    fast_band_lines,
    fast_band_lines_py,
)
from .textnorm import join_lines, join_words

# Word confidence for already-textual payloads: there is no recognizer, so
# every span is exact. Rounding contract: word conf round 3, line conf round 4
# (ocr_processor.py:174, :246).
WORD_CONFIDENCE = 1.0
_WORD_CONF_R3 = round(WORD_CONFIDENCE, 3)


def parse_layout_payload(text: str) -> tuple[list[str], list[list[int]]] | None:
    """Parse a layout JSON payload; None if it isn't one.

    Accepts either a bare list of word dicts or ``{"words": [...]}``; each
    word needs a string ``text`` and a 4-element numeric ``box`` (region
    validation contract, ``marie/ocr/ocr_engine.py:249-256`` — required keys,
    ints coerced). Returns parallel (texts, boxes) lists.
    """
    s = text.strip()
    if not s or s[0] not in "[{":
        return None
    try:
        data = _loads(s)
    except (ValueError, RecursionError):
        return None
    if isinstance(data, dict):
        data = data.get("words")
    if not isinstance(data, list):
        return None
    # fast path: well-formed payloads (the overwhelmingly common case) —
    # bulk-extract then validate; fall to the per-item checks on any miss
    try:
        texts = [item["text"] for item in data]
        boxes = [item["box"] for item in data]
    except (TypeError, KeyError):
        return None
    for i, (txt, box) in enumerate(zip(texts, boxes)):
        if type(txt) is not str or type(box) is not list or len(box) != 4:
            return None
        v0, v1, v2, v3 = box
        if not (
            type(v0) is int and type(v1) is int
            and type(v2) is int and type(v3) is int
        ):
            try:
                boxes[i] = [int(v) for v in box]
            except (TypeError, ValueError, OverflowError):
                # OverflowError: int(float('inf')) via the stdlib-json
                # fallback (orjson rejects Infinity at parse time)
                return None
    return texts, boxes


# Page-segmentation modes (PSM contract, marie/boxes/box_processor.py:129-162),
# transposed to text-layout payloads:
#   sparse    full pipeline: cluster lines, assign, reading order (default)
#   word      like 'line': all words onto line 1, x-sorted (the caller may
#             treat the result as one token; assembly is identical — this
#             x-only order is the pinned, oracle-certified contract)
#   line      whole payload is one text line → words x-sorted onto line 1
#   raw_line  no box analysis at all: input order, single line
#   multiline no clustering: each distinct y value is its own line
PSM_MODES = ("sparse", "word", "line", "raw_line", "multiline")


def _normalize_mode(mode: str | None) -> str:
    # unknown/None → sparse (PSMode.from_value, box_processor.py:150-162)
    m = (mode or "sparse").lower()
    return m if m in PSM_MODES else "sparse"


def _line_numbers(boxes_list: list[list[int]], mode: str) -> list[int]:
    """Per-word line number under the given (already-normalized) mode, for
    non-degenerate boxes. 1-based."""
    n = len(boxes_list)
    if mode in ("word", "line"):
        # single line: every word assigned line 1 ('word' additionally means
        # the caller treats the result as one token; assembly is identical)
        return [1] * n
    if mode == "multiline":
        # no clustering: each distinct y is a line, in ascending y order
        uniq = sorted({b[1] for b in boxes_list})
        rank = {y: i + 1 for i, y in enumerate(uniq)}
        return [rank[b[1]] for b in boxes_list]
    # sparse: band fast path (pure Python for small n, numpy above — the
    # twins share preconditions, so a small-n miss goes STRAIGHT to the
    # general ladder) → IoU-ladder clustering
    if n <= 512:
        fast = fast_band_lines_py(boxes_list)
        if fast is not None:
            return fast[1]
    else:
        fastnp = fast_band_lines(np.asarray(boxes_list, dtype=np.int64))
        if fastnp is not None:
            return [int(v) for v in fastnp[1]]
    boxes = np.asarray(boxes_list, dtype=np.int64)
    line_boxes = cluster_lines(boxes)
    return [int(v) for v in assign_lines(boxes, line_boxes)]


def extract_layout_text(
    texts_in: list[str], boxes_in: list[list[int]], mode: str = "sparse"
) -> str:
    """Reading-order text only — the hot path for struct-free extraction.

    Byte-identical to ``extract_layout(...)["text"]``; skips every word/line
    struct allocation (ids, envelopes, confidences), which is most of the
    cost for the default ``with_structs=False`` query.
    """
    mode = _normalize_mode(mode)
    # degenerate-box filter; zero-copy reuse when nothing is filtered (the
    # overwhelmingly common case) — neither list is mutated downstream
    if all(b[2] > 0 and b[3] > 0 for b in boxes_in):
        texts, boxes = texts_in, boxes_in
    else:
        texts, boxes = [], []
        for t, b in zip(texts_in, boxes_in):
            if b[2] > 0 and b[3] > 0:
                texts.append(t)
                boxes.append(b)
    if not texts:
        return ""
    if mode == "raw_line":
        return join_words(texts)
    line_no = _line_numbers(boxes, mode)
    # stable x-sort; bound method key avoids a lambda frame per element
    xs = [b[0] for b in boxes]
    order = sorted(range(len(texts)), key=xs.__getitem__)
    by_line: dict[int, list[str]] = {}
    get = by_line.get
    for i in order:
        ln = line_no[i]
        lst = get(ln)
        if lst is None:
            by_line[ln] = [texts[i]]
        else:
            lst.append(texts[i])
    return join_lines([join_words(by_line[ln]) for ln in sorted(by_line)])


def extract_layout(
    texts_in: list[str], boxes_in: list[list[int]], mode: str = "sparse"
) -> dict[str, Any]:
    """Assemble scrambled word boxes into reading-order lines and text.

    Returns ``{"text", "words", "lines"}`` with the word/line schemas of
    FIXTURES.md §3 (mirroring ocr_processor.py:180-190/:241-247).
    """
    mode = _normalize_mode(mode)
    # Degenerate-box filter (ocr_engine.py:277-287): zero/negative extents.
    usable = [
        (t, b) for t, b in zip(texts_in, boxes_in) if b[2] > 0 and b[3] > 0
    ]
    if not usable:
        return {"text": "", "words": [], "lines": []}

    boxes = np.asarray([b for _, b in usable], dtype=np.int64)
    texts = [t for t, _ in usable]

    if mode == "raw_line":
        # no box analysis: input order, one line (box_processor.py:145-146)
        text = join_words(texts)
        return {
            "text": text,
            "words": [
                {
                    "id": i, "text": t,
                    "confidence": _WORD_CONF_R3,
                    "box": boxes[i].tolist(),
                    "line": 1, "word_index": i,
                }
                for i, t in enumerate(texts)
            ],
            "lines": [
                {
                    "line": 1, "wordids": list(range(len(texts))),
                    "text": text, "bbox": envelope(boxes.tolist()),
                    "confidence": round(WORD_CONFIDENCE, 4),
                }
            ],
        }

    line_list = _line_numbers([b for _, b in usable], mode)

    # LTR reindex by x (ocr_processor.py:160-190): id = rank in x order;
    # group per line in one pass (x order within the line is preserved).
    order = np.argsort(boxes[:, 0], kind="stable")
    boxes_list = boxes.tolist()
    by_line: dict[int, list[dict[str, Any]]] = {}
    for rank, idx in enumerate(order.tolist()):
        w = {
            "id": rank,
            "text": texts[idx],
            "confidence": _WORD_CONF_R3,
            "box": boxes_list[idx],
            "line": line_list[idx],
        }
        by_line.setdefault(w["line"], []).append(w)

    # Per-line regroup in ascending line order (ocr_processor.py:210-247).
    out_words: list[dict[str, Any]] = []
    out_lines: list[dict[str, Any]] = []
    word_index = 0
    for i, ln in enumerate(sorted(by_line)):
        picks = by_line[ln]
        for w in picks:
            w["word_index"] = word_index
            word_index += 1
            out_words.append(w)
        out_lines.append(
            {
                "line": i + 1,
                "wordids": [w["id"] for w in picks],
                "text": join_words([w["text"] for w in picks]),
                "bbox": envelope([w["box"] for w in picks]),
                "confidence": round(
                    sum(w["confidence"] for w in picks) / len(picks), 4
                ),
            }
        )

    text = join_lines([ln["text"] for ln in sorted(out_lines, key=lambda k: k["line"])])
    return {"text": text, "words": out_words, "lines": out_lines}


def extract_layout_tuples(
    texts_in: list[str], boxes_in: list[list[int]], mode: str = "sparse"
) -> tuple[str, list[tuple], list[tuple]]:
    """``extract_layout`` emitting field-ordered tuples for the Arrow
    boundary instead of dicts — (text, word_tuples, line_tuples) with
    word = (id, text, confidence, box, line, word_index) and
    line = (line, wordids, text, bbox, confidence), exactly the schemas of
    ``operators.extraction``. Value-identical to running ``extract_layout``
    and converting each dict (certified by test + corpus diff); skipping
    the dict build + reconversion roughly halves the struct-path cost.
    The pure-Python golden contract keeps using the dict form.
    """
    mode = _normalize_mode(mode)
    if all(b[2] > 0 and b[3] > 0 for b in boxes_in):
        texts, boxes_list = texts_in, boxes_in
    else:
        texts, boxes_list = [], []
        for t, b in zip(texts_in, boxes_in):
            if b[2] > 0 and b[3] > 0:
                texts.append(t)
                boxes_list.append(b)
    if not texts:
        return "", [], []
    n = len(texts)

    if mode == "raw_line":
        text = join_words(texts)
        return (
            text,
            [
                (i, t, _WORD_CONF_R3, boxes_list[i], 1, i)
                for i, t in enumerate(texts)
            ],
            [
                (
                    1,
                    list(range(n)),
                    text,
                    envelope(boxes_list),
                    round(WORD_CONFIDENCE, 4),
                )
            ],
        )

    line_list = _line_numbers(boxes_list, mode)

    # LTR reindex by x: id = rank in x order; group per line in one pass
    # (x order within the line is preserved), exactly as extract_layout.
    xs = [b[0] for b in boxes_list]
    order = sorted(range(n), key=xs.__getitem__)
    by_line: dict[int, list[tuple[int, int]]] = {}
    get = by_line.get
    for rank, idx in enumerate(order):
        ln = line_list[idx]
        e = (rank, idx)
        lst = get(ln)
        if lst is None:
            by_line[ln] = [e]
        else:
            lst.append(e)

    out_words: list[tuple] = []
    out_lines: list[tuple] = []
    line_texts: list[str] = []
    word_index = 0
    for i, ln in enumerate(sorted(by_line)):
        picks = by_line[ln]
        wordids = []
        wtexts = []
        pboxes = []
        for rank, idx in picks:
            out_words.append(
                (rank, texts[idx], _WORD_CONF_R3, boxes_list[idx], ln,
                 word_index)
            )
            word_index += 1
            wordids.append(rank)
            wtexts.append(texts[idx])
            pboxes.append(boxes_list[idx])
        ltext = join_words(wtexts)
        line_texts.append(ltext)
        out_lines.append(
            (
                i + 1,
                wordids,
                ltext,
                envelope(pboxes),
                round(sum(_WORD_CONF_R3 for _ in picks) / len(picks), 4),
            )
        )

    return join_lines(line_texts), out_words, out_lines
