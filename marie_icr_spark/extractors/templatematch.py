"""Template/selector matching golden contract (SURVEY §2.8 B10, deep form).

Deterministic transposition of the reference's composite template-matching
stack to text transcripts:

* **meta matcher** — ``MetaTemplateMatcher.predict``
  (``marie/components/template_matching/meta_template_matching.py:100-237``):
  per frame, per selector, slide word n-gram windows of sizes
  ``{n0-1, n0, n0+1}`` (clipped to ``0 < n <= n_words``) over the page words
  in reading order, skip windows spanning more than one line, join with
  ``' '``/strip/``canon_upper`` both sides, and accept a window when it equals the
  template text exactly OR its similarity exceeds ``score_threshold``
  (strict ``>``; ``document_matched.py:196`` pins 0.9).  The reference's
  ``score()`` blends Levenshtein similarity with two GPU embedding
  similarities (``:271-310``) but returns the pure Levenshtein term whenever
  it is below 0.5; the deterministic twin pins the contract to the
  Levenshtein term throughout: ``sim = round3(1 - d / max(len_a, len_b))``
  (round-half-up for cross-engine exactness; the reference's ``round`` is
  banker's, which differs only at exact .0005 ties that the rational
  ``1 - d/maxlen`` values never hit for our string lengths).
  Accepted candidates are then greedily deduplicated in ``(ngram, start)``
  order against ALL predictions accepted so far in this frame (across
  selectors): a candidate is dropped when it bbox-overlaps
  (``meta_template_matching.py:23-30`` strict inequalities) an accepted
  prediction with the same label (``:214-236``).

* **prefix matcher** — deterministic stand-in for the visual fallback
  matcher (``VQNNFTemplateMatcher``; GPU model, n/a for transcripts):
  windows of exactly ``n0`` words where every page word starts with the
  corresponding template word (``canon_upper``-cased), same-line rule as above,
  ``score = round3(len(template) / len(window_text))`` (1.0 iff exact).
  Same greedy label-aware dedup, ordered by ``(selector, start)``.

* **composite** — ``CompositeTemplateMatcher.run``
  (``composite_template_maching.py:52-117``): run the matchers in order
  ``[meta, prefix]``; with ``break_on_match`` the remaining matchers are
  skipped as soon as one returns any result for the unit (``:99-101``, the
  unit being one conversation's frames).  Results are then grouped by
  frame_index and post-processed per frame with class-aware GREEDYNMM /
  IOS 0.5 (``base.py:379-395``): per (frame, label), repeatedly take the
  highest-scoring remaining prediction (ties: y, x, w, h ascending —
  pinned; the reference's torch sort order is unspecified on ties), merge
  every remaining prediction whose intersection-over-smaller-area with it
  is > 0.5 (union bbox, max score), and emit one merged prediction.

Everything here is pure Python + numpy (no Spark imports) — it IS the
DuckDB-oracle twin; change both sides together.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .boxmath import envelope

MIN_TEMPLATE_LEN = 3  # meta_template_matching.py:134 min_word_length
DEFAULT_SCORE_THRESHOLD = 0.9  # document_matched.py:196
NMM_IOS_THRESHOLD = 0.5  # base.py:382 postprocess_match_threshold


@dataclass(frozen=True)
class Selector:
    """Transcript transposition of ``model.py:28-35`` TemplateSelector
    (frame/bbox image payloads dropped — text + label + top_k remain)."""

    label: str
    text: str
    top_k: int = 2  # document_matched.py:198 max_objects=2


#: The pinned selector set used by the driver-gated queries.  Texts are
#: drawn from the synthetic corpus vocabulary so every matcher path is
#: exercised: a fuzzy-only bigram (Levenshtein 0.909 > 0.9), two exact
#: bigrams, a prefix-only bigram, and an exact unigram.
DEFAULT_SELECTORS: tuple[Selector, ...] = (
    Selector("anchor_merge_sort", "merge sortt", 2),
    Selector("anchor_value_pair", "value value", 2),
    Selector("anchor_group_pair", "group group", 1),
    Selector("anchor_fast_small", "fast sm", 2),
    Selector("anchor_window", "window", 3),
)


def round3(x: float) -> float:
    """Half-up to 3 places (cross-engine twin of the SQL
    ``floor(x*1000 + 0.5)/1000``)."""
    return math.floor(x * 1000.0 + 0.5) / 1000.0


#: Non-ASCII codepoints are projected onto ONE sentinel class (0x1A SUB,
#: never in real text) BEFORE any case mapping or distance math.  Two
#: cross-engine divergences force this, and one projection rule fixes both:
#:
#: * DuckDB's ``levenshtein`` counts BYTES while Python counts codepoints —
#:   after projection every string is single-byte, so byte == codepoint
#:   distance exactly, with char lengths unchanged (projection is 1:1).
#: * DuckDB's ``upper()`` is the Unicode SIMPLE case map (1:1 — ß→ẞ) while
#:   Python ``str.upper()`` is the FULL case map (ß→SS, ligature
#:   expansion), so upper-casing raw text diverges in both content and
#:   length.  Projecting FIRST leaves only ASCII (+ the sentinel), where
#:   the two engines' case maps agree exactly and never change length.
#:
#: SQL twin: ``upper(regexp_replace(s, '[^\x00-\x7F]', chr(26), 'g'))``.
#: Pinned quantization vs the reference's full-unicode matching: two
#: DISTINCT non-ASCII codepoints compare equal (and match case-blind).
_NON_ASCII_SENTINEL = 0x1A


def _project_ascii(s: str) -> str:
    """Replace every non-ASCII codepoint with the sentinel (1:1,
    length-preserving)."""
    if s.isascii():
        return s
    return "".join(c if ord(c) < 128 else "\x1a" for c in s)


def canon_upper(s: str) -> str:
    """THE pinned case/charset canonicalization: project, then upper.

    After ``_project_ascii`` the string is pure ASCII, so ``str.upper()``
    here equals DuckDB ``upper()`` byte-for-byte and ``len`` is invariant
    under it — every window text, template text, char length, equality
    test, and prefix test in this module goes through this one function;
    change it only together with the SQL twin in queries_templates.py."""
    return _project_ascii(s).upper()


def lev_batch(a_strs: list[str], b_strs: list[str]) -> np.ndarray:
    """Vectorized Levenshtein distance over P string pairs (non-ASCII
    codepoints projected per ``_NON_ASCII_SENTINEL`` — see above).

    Classic DP, batched across the pair axis: the row recurrence's
    insertion term (a running min along the row) is closed-form via the
    ``accumulate(base - j) + j`` trick, so each of the ``max_len_a``
    iterations is pure numpy over a ``P × max_len_b`` block.
    """
    P = len(a_strs)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in a_strs), np.int64, P)
    lb = np.fromiter((len(s) for s in b_strs), np.int64, P)
    ma = int(la.max())
    mb = int(lb.max())
    A = np.zeros((P, ma), dtype=np.uint32)
    B = np.zeros((P, mb), dtype=np.uint32)
    for p, s in enumerate(a_strs):
        if s:
            A[p, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for p, s in enumerate(b_strs):
        if s:
            B[p, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    # 0 is the padding value and < 128, so padding is unaffected
    A[A >= 128] = _NON_ASCII_SENTINEL
    B[B >= 128] = _NON_ASCII_SENTINEL
    js = np.arange(mb + 1, dtype=np.int64)
    prev = np.broadcast_to(js, (P, mb + 1)).copy()
    out = lb.copy()  # rows with len(a) == 0
    for i in range(1, ma + 1):
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B)
        base = np.minimum(prev[:, 1:] + 1, sub)
        cur = np.empty_like(prev)
        cur[:, 0] = i
        row = np.concatenate([cur[:, :1], base], axis=1)
        cur[:, :] = np.minimum.accumulate(row - js, axis=1) + js
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out


def _is_overlap(b1, b2) -> bool:
    """Strict XYWH overlap (meta_template_matching.py:23-30)."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    return x1 < x2 + w2 and x1 + w1 > x2 and y1 < y2 + h2 and y1 + h1 > y2


def meta_candidates(
    words: list[str],
    word_lines: list[int],
    boxes: list[list[int]],
    selectors: list[Selector],
) -> list[dict]:
    """Unscored meta-matcher candidate windows for one frame, in the
    greedy-dedup order ``(selector, ngram, start)``."""
    cands = []
    nw = len(words)
    for sidx, sel in enumerate(selectors):
        if sel.text is None or len(sel.text) < MIN_TEMPLATE_LEN:
            continue
        tmpl = canon_upper(sel.text.strip())
        n0 = len(tmpl.split(" "))
        for n in (n0 - 1, n0, n0 + 1):
            if not 0 < n <= nw:
                continue
            for i in range(nw - n + 1):
                if len(set(word_lines[i : i + n])) > 1:
                    continue
                joined = canon_upper(" ".join(words[i : i + n]).strip())
                cands.append(
                    {
                        "sidx": sidx,
                        "label": sel.label,
                        "tmpl": tmpl,
                        "n": n,
                        "start": i,
                        "text": joined,
                        "box": envelope(boxes[i : i + n]),
                    }
                )
    return cands


def meta_candidates_pruned(
    words: list[str],
    word_lines: list[int],
    boxes: list[list[int]],
    selectors: list[Selector],
    threshold: float = DEFAULT_SCORE_THRESHOLD,
) -> list[dict]:
    """``meta_candidates`` with the oracle's length-bound pushdown applied
    at enumeration time (queries_templates.py ``mc`` CTE): a window is
    enumerated only if it could survive ``meta_keep`` at ``threshold``.

    Soundness: ``lev(a, b) >= |len(a) - len(b)|`` and ``round3`` is
    monotone, so ``round3(1 - |L-T|/max(L,T)) <= threshold`` (with
    ``L != T``, which also rules out the exact-equality arm) implies the
    window's real score fails the strict ``>`` cut.  Window text length is
    computed from per-word char lengths + (n-1) separator chars (exact:
    ``canon_upper`` is 1:1, so the canonical text has the raw length) —
    no window string is materialized for pruned windows.  The same-line
    rule uses a cumulative line-change count, exact for arbitrary (even
    non-monotone) line sequences.  Output order is the greedy-dedup order
    ``(selector, ngram, start)``, identical to ``meta_candidates``;
    ``score_meta_candidates(meta_candidates_pruned(...), t)`` ==
    ``score_meta_candidates(meta_candidates(...), t)`` is pinned by
    tests/test_templatematch.py."""
    nw = len(words)
    if nw == 0:
        return []
    ulen = np.fromiter((len(w) for w in words), np.int64, nw)
    csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(ulen)])
    ln = np.asarray(word_lines, dtype=np.int64)
    # chg[k] = number of line transitions among words[0..k]; a window
    # [i, i+n) sits on one line iff chg[i+n-1] == chg[i]
    chg = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(ln[1:] != ln[:-1])]
    )
    cands = []
    for sidx, sel in enumerate(selectors):
        if sel.text is None or len(sel.text) < MIN_TEMPLATE_LEN:
            continue
        tmpl = canon_upper(sel.text.strip())
        T = len(tmpl)
        n0 = len(tmpl.split(" "))
        for n in (n0 - 1, n0, n0 + 1):
            if not 0 < n <= nw:
                continue
            i = np.arange(nw - n + 1)
            L = csum[i + n] - csum[i] + (n - 1)
            mx = np.maximum(L, T)
            bound = (
                np.floor((1.0 - np.abs(L - T) / mx) * 1000.0 + 0.5) / 1000.0
            )
            ok = (chg[i + n - 1] == chg[i]) & ((L == T) | (bound > threshold))
            for ii in i[ok].tolist():
                joined = canon_upper(" ".join(words[ii : ii + n]).strip())
                cands.append(
                    {
                        "sidx": sidx,
                        "label": sel.label,
                        "tmpl": tmpl,
                        "n": n,
                        "start": ii,
                        "text": joined,
                        "box": envelope(boxes[ii : ii + n]),
                    }
                )
    return cands


def meta_sims(texts: list[str], tmpls: list[str]) -> list[float]:
    """The meta-matcher similarity, batched:
    ``round3(1 - lev(text, tmpl) / max(len(text), len(tmpl)))``.
    THE single definition of the score formula — the Spark operator and
    this golden module both call it; change it only together with the
    DuckDB twin in queries_templates.py."""
    d = lev_batch(texts, tmpls)
    return [
        round3(1.0 - dist / max(len(a), len(b)))
        for a, b, dist in zip(texts, tmpls, d.tolist())
    ]


def meta_keep(text: str, tmpl: str, sim: float, threshold: float) -> bool:
    """Exact-or-threshold keep rule (document_matched.py:196, strict >)."""
    return text == tmpl or sim > threshold


def score_meta_candidates(
    cands: list[dict], threshold: float = DEFAULT_SCORE_THRESHOLD
) -> list[dict]:
    """Score candidates (vectorized Levenshtein) and keep exact matches or
    ``sim > threshold``, preserving order."""
    if not cands:
        return []
    sims = meta_sims(
        [c["text"] for c in cands], [c["tmpl"] for c in cands]
    )
    return [
        {**c, "score": sim}
        for c, sim in zip(cands, sims)
        if meta_keep(c["text"], c["tmpl"], sim, threshold)
    ]


def prefix_candidates(
    words: list[str],
    word_lines: list[int],
    boxes: list[list[int]],
    selectors: list[Selector],
) -> list[dict]:
    """Scored prefix-matcher candidates for one frame, in ``(selector,
    start)`` order."""
    out = []
    nw = len(words)
    uwords = [canon_upper(w) for w in words]
    for sidx, sel in enumerate(selectors):
        if sel.text is None or len(sel.text) < MIN_TEMPLATE_LEN:
            continue
        tmpl = canon_upper(sel.text.strip())
        tws = tmpl.split(" ")
        n = len(tws)
        if not 0 < n <= nw:
            continue
        for i in range(nw - n + 1):
            if len(set(word_lines[i : i + n])) > 1:
                continue
            if not all(uwords[i + j].startswith(tws[j]) for j in range(n)):
                continue
            joined = canon_upper(" ".join(words[i : i + n]).strip())
            out.append(
                {
                    "sidx": sidx,
                    "label": sel.label,
                    "tmpl": tmpl,
                    "n": n,
                    "start": i,
                    "text": joined,
                    "box": envelope(boxes[i : i + n]),
                    "score": round3(len(tmpl) / len(joined)),
                }
            )
    return out


def greedy_dedup(cands: list[dict]) -> list[dict]:
    """Label-aware greedy overlap dedup (meta_template_matching.py:214-236):
    accept each candidate in order unless it overlaps an already-accepted
    prediction with the same label.  Dropped candidates do not block later
    ones."""
    preds: list[dict] = []
    for c in cands:
        for p in preds:
            if c["label"] == p["label"] and _is_overlap(c["box"], p["box"]):
                break
        else:
            preds.append(c)
    return preds


def _ios(b1, b2) -> float:
    """Intersection over smaller area for XYWH boxes (sahi IOS metric)."""
    ix = min(b1[0] + b1[2], b2[0] + b2[2]) - max(b1[0], b2[0])
    iy = min(b1[1] + b1[3], b2[1] + b2[3]) - max(b1[1], b2[1])
    if ix <= 0 or iy <= 0:
        return 0.0
    return (ix * iy) / min(b1[2] * b1[3], b2[2] * b2[3])


def greedy_nmm(
    preds: list[dict], ios_threshold: float = NMM_IOS_THRESHOLD
) -> list[dict]:
    """Class-aware greedy non-maximum MERGING over one frame's predictions
    (base.py:379-395, sahi GREEDYNMM / IOS): per label, repeatedly select
    the highest-scoring remaining prediction (tiebreak y, x, w, h asc —
    pinned), merge every remaining same-label prediction whose IOS with the
    *selected* box exceeds the threshold (union bbox, max score), emit one
    merged prediction with ``n_merged``."""
    out = []
    by_label: dict[str, list[dict]] = {}
    for p in preds:
        by_label.setdefault(p["label"], []).append(p)
    for label in by_label:
        rem = sorted(
            by_label[label],
            key=lambda p: (
                -p["score"],
                p["box"][1],
                p["box"][0],
                p["box"][2],
                p["box"][3],
            ),
        )
        while rem:
            sel = rem[0]
            matched, kept = [], []
            for r in rem[1:]:  # one _ios per element per round
                (matched if _ios(r["box"], sel["box"]) > ios_threshold
                 else kept).append(r)
            rem = kept
            group = [sel] + matched
            out.append(
                {
                    "label": label,
                    "box": envelope([g["box"] for g in group]),
                    "score": max(g["score"] for g in group),
                    "n_merged": len(group),
                }
            )
    return out


def match_frame_meta(
    words, word_lines, boxes, selectors, threshold=DEFAULT_SCORE_THRESHOLD
) -> list[dict]:
    """Meta matcher over one frame: candidates → score/threshold → greedy
    dedup (the full ``MetaTemplateMatcher.predict`` twin).  Uses the
    pruned enumerator — output-identical to the unpruned form."""
    return greedy_dedup(
        score_meta_candidates(
            meta_candidates_pruned(
                words, word_lines, boxes, selectors, threshold
            ),
            threshold,
        )
    )


def match_frame_prefix(words, word_lines, boxes, selectors) -> list[dict]:
    """Prefix matcher over one frame (candidates are pre-scored)."""
    return greedy_dedup(prefix_candidates(words, word_lines, boxes, selectors))


def composite_match_unit(
    frames: list[tuple[int, list[str], list[int], list[list[int]]]],
    selectors: list[Selector],
    break_on_match: bool = False,
    threshold: float = DEFAULT_SCORE_THRESHOLD,
) -> list[dict]:
    """Composite matcher over one unit (a conversation's layout frames,
    each ``(frame_index, words, word_lines, boxes)``), then per-frame
    GREEDYNMM.  With ``break_on_match`` the prefix matcher is skipped when
    the meta matcher produced any result for the unit
    (composite_template_maching.py:99-101)."""
    raw: list[dict] = []
    for fi, words, lines, boxes in frames:
        for p in match_frame_meta(words, lines, boxes, selectors, threshold):
            raw.append({**p, "frame_index": fi})
    if not (break_on_match and raw):
        for fi, words, lines, boxes in frames:
            for p in match_frame_prefix(words, lines, boxes, selectors):
                raw.append({**p, "frame_index": fi})
    out = []
    by_frame: dict[int, list[dict]] = {}
    for p in raw:
        by_frame.setdefault(p["frame_index"], []).append(p)
    for fi in by_frame:
        for m in greedy_nmm(by_frame[fi]):
            out.append({**m, "frame_index": fi})
    return out
