"""Reading-order query + DuckDB oracle (SURVEY §2.5 W9 — LayoutReader
transposed to the deterministic bounded X-Y cut; golden contract:
``extractors/readingorder.py``, reference
``marie/document/layoutreader/text_layout.py:133-231``).

The oracle replays the ENTIRE algorithm in SQL: the two-column + header
geometry, then ``XY_ROUNDS`` unrolled split rounds (three CTEs per
round: per-row projection gaps via a strict-prefix running-max window,
per-region split decision via ``min_by`` over ``[-gap, start]``, region
re-labeling), then the ``(region path, y, x, word_index)`` final order —
with the ``MAX_REORDER_LEN`` fail-open branch (pages too long are
emitted untouched in input order, original coordinates), exactly the
reference's guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extractors.readingorder import (
    BODY_Y0,
    COL_GAP,
    MAX_REORDER_LEN,
    MIN_GAP,
    XY_ROUNDS,
)
from .operators.extraction import extract_turns
from .operators.readingorder import xy_cut_reading_order
from .sources.transcripts import transcripts_from_docs


def q_xy_cut_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reading-order permutation of every layout turn's words (W9)."""
    t = transcripts_from_docs(spark, sf_dir)
    e = extract_turns(t, with_structs=True).filter(
        F.col("payload_kind") == "layout"
    )
    return xy_cut_reading_order(e)


def _xy_round_ctes(i: int) -> str:
    """One split round: r{i} → r{i+1} (see module docstring)."""
    return f"""
p{i} AS (
  SELECT *,
    x0 - MAX(x1) OVER (PARTITION BY conv_id, turn_idx, reg
                       ORDER BY x0, x1, word_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) gapx,
    y0 - MAX(y1) OVER (PARTITION BY conv_id, turn_idx, reg
                       ORDER BY y0, y1, word_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) gapy
  FROM r{i}
),
a{i} AS (
  SELECT conv_id, turn_idx, reg,
    MAX(CASE WHEN gapx >= {MIN_GAP} THEN gapx END) gx,
    MAX_BY(x0, CAST(gapx AS BIGINT) * 1000000000 - x0)
      FILTER (WHERE gapx >= {MIN_GAP}) sx,
    MAX(CASE WHEN gapy >= {MIN_GAP} THEN gapy END) gy,
    MAX_BY(y0, CAST(gapy AS BIGINT) * 1000000000 - y0)
      FILTER (WHERE gapy >= {MIN_GAP}) sy
  FROM p{i} GROUP BY conv_id, turn_idx, reg
),
r{i + 1} AS (
  SELECT p.conv_id, p.turn_idx, p.word_index, p.word_text,
         p.x0, p.y0, p.x1, p.y1,
         p.reg * 2 + CASE
           WHEN a.gy IS NOT NULL AND (a.gx IS NULL OR a.gy >= a.gx)
             THEN CASE WHEN p.y0 >= a.sy THEN 1 ELSE 0 END
           WHEN a.gx IS NOT NULL
             THEN CASE WHEN p.x0 >= a.sx THEN 1 ELSE 0 END
           ELSE 0 END reg
  FROM p{i} p JOIN a{i} a USING (conv_id, turn_idx, reg)
)"""


def _oracle_xy_cut() -> str:
    from .queries_ext import _LAYOUT_WORDS_SQL

    rounds = ",".join(_xy_round_ctes(i) for i in range(XY_ROUNDS))
    return f"""
WITH base AS ({_LAYOUT_WORDS_SQL}),
geo AS (
  SELECT conv_id, turn_idx, word_index, word_text,
         x0 ox, y0 oy, line_no, x1 - x0 w, y1 - y0 h,
         MAX(x1) OVER (PARTITION BY conv_id, turn_idx) + {COL_GAP} coloff,
         COUNT(*) OVER (PARTITION BY conv_id, turn_idx) nw
  FROM base
),
r0 AS (
  SELECT conv_id, turn_idx, word_index, word_text,
         CASE WHEN line_no = 1 THEN ox
              ELSE ox + ((line_no - 2) % 2) * coloff END x0,
         CASE WHEN line_no = 1 THEN 0
              ELSE {BODY_Y0} + 20 * ((line_no - 2) // 2) END y0,
         CASE WHEN line_no = 1 THEN ox
              ELSE ox + ((line_no - 2) % 2) * coloff END + w x1,
         CASE WHEN line_no = 1 THEN 0
              ELSE {BODY_Y0} + 20 * ((line_no - 2) // 2) END + h y1,
         CAST(0 AS BIGINT) reg
  FROM geo WHERE nw <= {MAX_REORDER_LEN}
),{rounds}
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY reg, y0, x0, word_index) - 1 AS INTEGER) pos,
       word_index, word_text,
       CAST(x0 AS INTEGER) cx, CAST(y0 AS INTEGER) cy
FROM r{XY_ROUNDS}
UNION ALL
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
            ORDER BY word_index) - 1 AS INTEGER) pos,
       word_index, word_text,
       CAST(ox AS INTEGER) cx, CAST(oy AS INTEGER) cy
FROM geo WHERE nw > {MAX_REORDER_LEN}
"""


RO_QUERIES = {"xy_cut_order": q_xy_cut_order}
RO_ORACLES = {"xy_cut_order": _oracle_xy_cut()}
