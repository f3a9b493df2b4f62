"""Composite template/selector matching queries + DuckDB oracles
(SURVEY §2.8 B10, deep form).

The Spark side wraps ``operators/templates.py`` (golden contract:
``extractors/templatematch.py`` — see its docstring for reference-line
citations).  The oracles replay the full pipeline in SQL:

* word grid reconstruction (same CTE chain as ``_LAYOUT_WORDS_SQL``),
* n-gram window generation with the same-line rule,
* built-in ``levenshtein`` + half-up rounding for the meta score,
* the label-aware greedy overlap dedup as a recursive CTE whose state is
  the accepted-boxes list (``list_filter`` overlap probe per step),
* the per-(frame, label) GREEDYNMM merge as a second recursive CTE whose
  state is the score-sorted remaining list.

Both greedy passes are genuinely sequential in the reference
(``meta_template_matching.py:214-236``, sahi greedy_nmm), so recursion —
not window functions — is the faithful SQL expression; recursion depth is
bounded by the per-frame accepted-candidate count (single digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extractors.templatematch import DEFAULT_SELECTORS, canon_upper
from .functions.columns import WS_TOKENS_SQL as _TOKENS_SQL
from .operators.extraction import extract_turns
from .operators.templates import (
    best_per_selector,
    composite_match_turns,
    meta_match_turns,
)
from .sources.transcripts import CONV_MOD, transcripts_from_docs

# selector literals (must stay in lockstep with DEFAULT_SELECTORS);
# canon_upper = the golden project-then-upper rule, so the literal is
# identical to the Python side's template text by construction
_SEL_VALUES = ",\n    ".join(
    f"({i}, '{s.label}', '{canon_upper(s.text.strip())}', {s.top_k})"
    for i, s in enumerate(DEFAULT_SELECTORS)
)

# word grid per layout turn, as one ordered list column (same derivation
# as _LAYOUT_WORDS_SQL in queries_ext.py)
_WL_CTES = f"""
d AS (
  SELECT doc_id,
         'conv-' || lpad(CAST(doc_id % {CONV_MOD} AS VARCHAR), 6, '0') conv_id,
         CAST(doc_id // {CONV_MOD} AS INTEGER) turn_idx,
         {_TOKENS_SQL.format(e='text')} w
  FROM documents WHERE doc_id % 100 >= 40 AND doc_id % 100 < 65
),
lns AS (
  SELECT doc_id, conv_id, turn_idx,
         unnest(range(CAST(ceil(len(w) / 8.0) AS BIGINT))) ln, w
  FROM d
),
lw AS (
  SELECT doc_id, conv_id, turn_idx, ln,
         list_transform(range(len(lws)), j -> {{'t': lws[j+1], 'j': j}}) pairs
  FROM (SELECT *, w[ln*8+1 : ln*8+8] lws FROM lns)
),
wrd AS (
  SELECT doc_id, conv_id, turn_idx, ln, unnest(pairs) p FROM lw
),
pos AS (
  SELECT doc_id, conv_id, turn_idx, ln, p.t word_text, p.j j,
         9 * (COALESCE(SUM(len(p.t) + 1) OVER (PARTITION BY doc_id, ln
              ORDER BY p.j ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0)) x
  FROM wrd
),
gi AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY ln, j) - 1 g
  FROM pos
),
wl AS MATERIALIZED (
  SELECT doc_id, conv_id, turn_idx,
         list({{'t': upper(regexp_replace(word_text, '[^\\x00-\\x7F]',
                                          chr(26), 'g')),
               'ln': CAST(ln AS INTEGER),
               'x': CAST(x AS INTEGER), 'y': CAST(ln * 20 AS INTEGER),
               'w': CAST(9 * len(word_text) AS INTEGER), 'h': 16}}
              ORDER BY g) ws
  FROM gi GROUP BY doc_id, conv_id, turn_idx
),
sel AS (
  SELECT sidx, label, txt, top_k, string_split(txt, ' ') tw,
         len(string_split(txt, ' ')) n0
  FROM (VALUES
    {_SEL_VALUES}
  ) s(sidx, label, txt, top_k)
  WHERE len(txt) >= 3
)"""

# meta candidates: windows of sizes {n0-1, n0, n0+1}, same-line only,
# exact-or-(round3 Levenshtein sim > 0.9) keep rule, ordered (sidx, n, i).
#
# Two semantics-preserving pushdowns keep this cheap at scale:
# * same-line = first.ln == last.ln (words are in reading order, so a
#   contiguous window spans one line iff its endpoints agree);
# * window char length is an integer list_sum over the window's per-word
#   canonical-text lengths (+ n-1 separators) — ws.t went through the
#   project-then-upper rule (1:1, length-preserving: see canon_upper in
#   extractors/templatematch.py), so len(e.t) IS the length the real
#   score uses — and
#   levenshtein(a, b) >= |len(a) - len(b)|, so any window whose
#   length-difference bound already fails the strict 0.9 cut (and is not
#   length-equal, a precondition for the exact rule) can be dropped
#   BEFORE any window string is materialized.  round3 is monotone, so
#   the bound transfers through the rounding.
_META_CTES = """
mc0 AS (
  SELECT w.doc_id, w.conv_id, w.turn_idx, s.sidx, s.label, s.txt,
         ni.n, ni.i,
         w.ws[ni.i+1].x bx, w.ws[ni.i+1].y bby,
         w.ws[ni.i+ni.n].x + w.ws[ni.i+ni.n].w - w.ws[ni.i+1].x bw,
         16 bh,
         list_sum(list_transform(w.ws[ni.i+1 : ni.i+ni.n], e -> len(e.t)))
           + ni.n - 1 wlen
  FROM wl w
  CROSS JOIN sel s
  CROSS JOIN LATERAL (
    SELECT n, i FROM
      (SELECT unnest([s.n0 - 1, s.n0, s.n0 + 1]) AS n) tn,
      (SELECT unnest(range(len(w.ws))) AS i) ti
    WHERE n > 0 AND i + n <= len(w.ws)
  ) ni
  WHERE w.ws[ni.i+1].ln = w.ws[ni.i+ni.n].ln
),
mc AS (
  SELECT mc0.*,
         array_to_string(list_transform(w2.ws[mc0.i+1 : mc0.i+mc0.n],
                                        e -> e.t), ' ') joined
  FROM mc0 JOIN wl w2 ON w2.doc_id = mc0.doc_id
  WHERE mc0.wlen = len(mc0.txt)
     OR floor((1.0 - CAST(abs(mc0.wlen - len(mc0.txt)) AS DOUBLE)
               / greatest(mc0.wlen, len(mc0.txt))) * 1000.0 + 0.5)
          / 1000.0 > 0.9
),
msc AS (
  -- joined/txt are already canonical (project-then-upper at the wl /
  -- selector-literal sites — extractors/templatematch.py canon_upper):
  -- pure single-byte ASCII, so DuckDB's BYTE-counting levenshtein equals
  -- Python's codepoint distance directly, no per-call projection needed.
  SELECT *,
         floor((1.0 - CAST(levenshtein(joined, txt) AS DOUBLE)
                / greatest(len(joined), len(txt))) * 1000.0 + 0.5)
           / 1000.0 sim
  FROM mc
),
mk AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY sidx, n, i) rn
  FROM msc WHERE joined = txt OR sim > 0.9
),
macc(doc_id, rn, kept, boxes) AS (
  SELECT doc_id, 0, NULL::BOOLEAN,
         []::STRUCT("label" VARCHAR, x INTEGER, y INTEGER,
                    w INTEGER, h INTEGER)[]
  FROM (SELECT DISTINCT doc_id FROM mk)
  UNION ALL
  SELECT c.doc_id, c.rn, len(z.hits) = 0,
         CASE WHEN len(z.hits) = 0
              THEN list_append(a.boxes, {'label': c."label", 'x': c.bx,
                                         'y': c.bby, 'w': c.bw, 'h': c.bh})
              ELSE a.boxes END
  FROM macc a
  JOIN mk c ON c.doc_id = a.doc_id AND c.rn = a.rn + 1,
  LATERAL (SELECT list_filter(a.boxes,
             b -> b."label" = c."label"
                  AND c.bx < b.x + b.w AND c.bx + c.bw > b.x
                  AND c.bby < b.y + b.h AND c.bby + c.bh > b.y) AS hits) z
),
meta_preds AS (
  SELECT c.doc_id, c.conv_id, c.turn_idx, c."label", c.joined, c.bx, c.bby,
         c.bw, c.bh, c.sim
  FROM macc a JOIN mk c ON c.doc_id = a.doc_id AND c.rn = a.rn
  WHERE a.kept
)"""

# prefix candidates: windows of exactly n0 where every page word starts
# with the corresponding template word; score = round3(len(txt)/len(win))
_PREFIX_CTES = """
pc AS (
  SELECT w.doc_id, w.conv_id, w.turn_idx, s.sidx, s.label, s.txt, st.i,
         array_to_string(list_transform(w.ws[st.i+1 : st.i+s.n0],
                                        e -> e.t), ' ') joined,
         w.ws[st.i+1].x bx, w.ws[st.i+1].y bby,
         w.ws[st.i+s.n0].x + w.ws[st.i+s.n0].w - w.ws[st.i+1].x bw,
         16 bh
  FROM wl w
  CROSS JOIN sel s
  CROSS JOIN LATERAL (
    SELECT i FROM (SELECT unnest(range(len(w.ws))) AS i) ti
    WHERE i + s.n0 <= len(w.ws)
      -- cheap first-word precheck before the full per-position filter
      AND starts_with(w.ws[i+1].t, s.tw[1])
  ) st
  WHERE w.ws[st.i+1].ln = w.ws[st.i+s.n0].ln
    AND len(list_filter(range(s.n0),
              j -> NOT starts_with(w.ws[st.i + j + 1].t, s.tw[j + 1]))) = 0
),
pk AS MATERIALIZED (
  SELECT *,
         floor(CAST(len(txt) AS DOUBLE) / len(joined) * 1000.0 + 0.5)
           / 1000.0 sim,
         row_number() OVER (PARTITION BY doc_id ORDER BY sidx, i) rn
  FROM pc
),
pacc(doc_id, rn, kept, boxes) AS (
  SELECT doc_id, 0, NULL::BOOLEAN,
         []::STRUCT("label" VARCHAR, x INTEGER, y INTEGER,
                    w INTEGER, h INTEGER)[]
  FROM (SELECT DISTINCT doc_id FROM pk)
  UNION ALL
  SELECT c.doc_id, c.rn, len(z.hits) = 0,
         CASE WHEN len(z.hits) = 0
              THEN list_append(a.boxes, {'label': c."label", 'x': c.bx,
                                         'y': c.bby, 'w': c.bw, 'h': c.bh})
              ELSE a.boxes END
  FROM pacc a
  JOIN pk c ON c.doc_id = a.doc_id AND c.rn = a.rn + 1,
  LATERAL (SELECT list_filter(a.boxes,
             b -> b."label" = c."label"
                  AND c.bx < b.x + b.w AND c.bx + c.bw > b.x
                  AND c.bby < b.y + b.h AND c.bby + c.bh > b.y) AS hits) z
),
prefix_preds AS (
  SELECT c.doc_id, c.conv_id, c.turn_idx, c."label", c.joined, c.bx, c.bby,
         c.bw, c.bh, c.sim
  FROM pacc a JOIN pk c ON c.doc_id = a.doc_id AND c.rn = a.rn
  WHERE a.kept
)"""


def _nmm_ctes(pred_cte: str, sfx: str = "") -> str:
    """GREEDYNMM / IOS 0.5 over ``pred_cte`` rows, per (doc, label):
    score-sorted remaining-list state, one merged prediction per step.
    ``sfx`` namespaces the CTEs so two NMM passes can share one WITH."""
    return f"""
srt{sfx} AS (
  SELECT doc_id, conv_id, turn_idx, "label",
         list({{'x': bx, 'y': bby, 'w': bw, 'h': bh, 's': sim}}
              ORDER BY sim DESC, bby ASC, bx ASC, bw ASC, bh ASC) rem
  FROM {pred_cte} GROUP BY doc_id, conv_id, turn_idx, "label"
),
nmm{sfx}(doc_id, conv_id, turn_idx, "label", rem, out) AS (
  SELECT doc_id, conv_id, turn_idx, "label", rem,
         []::STRUCT(x INTEGER, y INTEGER, w INTEGER, h INTEGER,
                    s DOUBLE, c INTEGER)[]
  FROM srt{sfx}
  UNION ALL
  -- z.fl tags every remaining element with its IOS-vs-selected flag ONCE
  -- per round (the 10-line predicate used to be evaluated twice per
  -- element: once negated for the kept list, once for the merge group)
  SELECT doc_id, conv_id, turn_idx, "label",
         list_transform(list_filter(z.fl, e -> NOT e.m), e -> e.r),
         list_append(out,
           list_reduce(
             list_transform(
               list_prepend(rem[1],
                 list_transform(list_filter(z.fl, e -> e.m), e -> e.r)),
               e -> {{'x': e.x, 'y': e.y, 'w': e.w, 'h': e.h,
                      's': e.s, 'c': 1}}),
             (a, b) -> {{'x': least(a.x, b.x), 'y': least(a.y, b.y),
                         'w': greatest(a.x + a.w, b.x + b.w)
                              - least(a.x, b.x),
                         'h': greatest(a.y + a.h, b.y + b.h)
                              - least(a.y, b.y),
                         's': greatest(a.s, b.s), 'c': a.c + b.c}}))
  FROM nmm{sfx}, LATERAL (
    SELECT list_transform(rem[2:], r -> {{'r': r, 'm':
      least(r.x + r.w, rem[1].x + rem[1].w) > greatest(r.x, rem[1].x)
      AND least(r.y + r.h, rem[1].y + rem[1].h) > greatest(r.y, rem[1].y)
      AND CAST((least(r.x + r.w, rem[1].x + rem[1].w)
                - greatest(r.x, rem[1].x))
             * (least(r.y + r.h, rem[1].y + rem[1].h)
                - greatest(r.y, rem[1].y)) AS DOUBLE)
          / least(r.w * r.h, rem[1].w * rem[1].h) > 0.5}}) fl) z
  WHERE len(rem) > 0
),
merged{sfx} AS (
  SELECT conv_id, turn_idx, "label",
         unnest(out, recursive := true)
  FROM nmm{sfx} WHERE len(rem) = 0
)"""


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_docs(spark, sf_dir)
    return extract_turns(t, with_structs=True).filter(
        F.col("payload_kind") == "layout"
    )


def q_template_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta matcher predictions (post greedy dedup, pre NMM)."""
    return meta_match_turns(_extracted(spark, sf_dir)).select(
        "conv_id", "turn_idx", "label", "matched_text",
        "x", "y", "w", "h", "score",
    )


ORACLE_TEMPLATE_META = f"""
WITH RECURSIVE
{_WL_CTES},
{_META_CTES}
SELECT conv_id, turn_idx, "label", joined matched_text,
       bx x, bby y, bw w, bh h, sim score
FROM meta_preds
"""


def q_template_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite [meta, prefix] + per-frame GREEDYNMM, no break (both
    matchers always run; the merge is load-bearing for duplicated
    anchors)."""
    return composite_match_turns(
        _extracted(spark, sf_dir), break_on_match=False
    ).select("conv_id", "turn_idx", "label", "x", "y", "w", "h", "score",
             "n_merged")


ORACLE_TEMPLATE_COMPOSITE = f"""
WITH RECURSIVE
{_WL_CTES},
{_META_CTES},
{_PREFIX_CTES},
allp AS MATERIALIZED (
  SELECT * FROM meta_preds UNION ALL SELECT * FROM prefix_preds
),
{_nmm_ctes('allp')}
SELECT conv_id, turn_idx, "label", x, y, w, h, s score, c n_merged
FROM merged
"""


def q_template_composite_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite with break_on_match: per conversation, the prefix
    fallback runs only when meta matched nothing in any frame of the
    conv (composite_template_maching.py:99-101)."""
    return composite_match_turns(
        _extracted(spark, sf_dir), break_on_match=True
    ).select("conv_id", "turn_idx", "label", "x", "y", "w", "h", "score",
             "n_merged")


ORACLE_TEMPLATE_COMPOSITE_BREAK = f"""
WITH RECURSIVE
{_WL_CTES},
{_META_CTES},
{_PREFIX_CTES},
allp AS MATERIALIZED (
  SELECT * FROM meta_preds
  UNION ALL
  SELECT * FROM prefix_preds p
  WHERE p.conv_id NOT IN (SELECT DISTINCT conv_id FROM meta_preds)
),
{_nmm_ctes('allp')}
SELECT conv_id, turn_idx, "label", x, y, w, h, s score, c n_merged
FROM merged
"""


def q_template_best_per_selector(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-unit anchor sets: top ``top_k`` composite predictions per
    (conv, label) — the max_objects cut of document_matched.py:198."""
    comp = composite_match_turns(
        _extracted(spark, sf_dir), break_on_match=False
    )
    return best_per_selector(comp).select(
        "conv_id", "turn_idx", "label", "x", "y", "w", "h", "score", "rank"
    )


ORACLE_TEMPLATE_BEST = f"""
WITH RECURSIVE
{_WL_CTES},
{_META_CTES},
{_PREFIX_CTES},
allp AS MATERIALIZED (
  SELECT * FROM meta_preds UNION ALL SELECT * FROM prefix_preds
),
{_nmm_ctes('allp')},
ranked AS (
  SELECT m.conv_id, m.turn_idx, m."label", m.x, m.y, m.w, m.h,
         m.s score, m.c,
         CAST(row_number() OVER (PARTITION BY m.conv_id, m."label"
              ORDER BY m.s DESC, m.turn_idx ASC, m.y ASC, m.x ASC)
              AS INTEGER) rank,
         s.top_k
  FROM merged m JOIN sel s ON s."label" = m."label"
)
SELECT conv_id, turn_idx, "label", x, y, w, h, score, rank
FROM ranked WHERE rank <= top_k
"""


TPL_QUERIES = {
    "template_meta": q_template_meta,
    "template_composite": q_template_composite,
    "template_composite_break": q_template_composite_break,
    "template_best_per_selector": q_template_best_per_selector,
}

TPL_ORACLES = {
    "template_meta": ORACLE_TEMPLATE_META,
    "template_composite": ORACLE_TEMPLATE_COMPOSITE,
    "template_composite_break": ORACLE_TEMPLATE_COMPOSITE_BREAK,
    "template_best_per_selector": ORACLE_TEMPLATE_BEST,
}


# Single-pass suite oracle: the four members share one WITH — the word
# grid, candidate generation, threshold filters, and both greedy-dedup
# recursions are computed ONCE (they dominate the cost; the per-member
# UNION branches are cheap projections).  Heavy CTEs referenced from
# inside recursive parts carry AS MATERIALIZED, since a recursive CTE
# re-evaluates every non-materialized CTE it references on each
# iteration (measured 7x slowdown without the hint).
ORACLE_TEMPLATE_SUITE = f"""
WITH RECURSIVE
{_WL_CTES},
{_META_CTES},
{_PREFIX_CTES},
allp AS MATERIALIZED (
  SELECT * FROM meta_preds UNION ALL SELECT * FROM prefix_preds
),
allp_brk AS MATERIALIZED (
  SELECT * FROM meta_preds
  UNION ALL
  SELECT * FROM prefix_preds p
  WHERE p.conv_id NOT IN (SELECT DISTINCT conv_id FROM meta_preds)
),
{_nmm_ctes('allp')},
{_nmm_ctes('allp_brk', '_b')},
ranked AS (
  SELECT m.conv_id, m.turn_idx, m."label", m.x, m.y, m.w, m.h,
         m.s score,
         CAST(row_number() OVER (PARTITION BY m.conv_id, m."label"
              ORDER BY m.s DESC, m.turn_idx ASC, m.y ASC, m.x ASC)
              AS INTEGER) rank,
         s.top_k
  FROM merged m JOIN sel s ON s."label" = m."label"
)
SELECT 'template_meta' AS member, conv_id, turn_idx, "label",
       joined AS text, bx AS x, bby AS y, bw AS w, bh AS h,
       sim AS score, CAST(NULL AS INTEGER) AS extra
FROM meta_preds
UNION ALL
SELECT 'template_composite', conv_id, turn_idx, "label",
       CAST(NULL AS VARCHAR), x, y, w, h, s, c
FROM merged
UNION ALL
SELECT 'template_composite_break', conv_id, turn_idx, "label",
       CAST(NULL AS VARCHAR), x, y, w, h, s, c
FROM merged_b
UNION ALL
SELECT 'template_best_per_selector', conv_id, turn_idx, "label",
       CAST(NULL AS VARCHAR), x, y, w, h, score, rank
FROM ranked WHERE rank <= top_k
"""
