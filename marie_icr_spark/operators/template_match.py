"""Anchor/template matching over extracted text (SURVEY §2.8 B10).

The reference matches visual templates against page regions with a score
threshold and per-frame grouping
(``marie/components/template_matching/document_matched.py:162-221``,
``score_threshold=0.9``). The transcript transposition matches *anchor
phrases* against each unit's text lines with a normalized edit-distance
score, keeps matches above the threshold, and picks the best line per
(unit, anchor) — all JVM-side (``levenshtein`` is a builtin in both Spark
and the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.columns import round_half_up

DEFAULT_SCORE_THRESHOLD = 0.9  # document_matched.py score_threshold


def match_anchors(
    lines: DataFrame,
    anchors: list[str],
    unit_cols: list[str],
    line_col: str = "line_text",
    order_col: str = "line_no",
    threshold: float = DEFAULT_SCORE_THRESHOLD,
) -> DataFrame:
    """Best line per (unit, anchor) with similarity ≥ threshold.

    similarity = 1 − levenshtein(line, anchor) / greatest(len(line),
    len(anchor), 1). Output: unit_cols + (anchor, matched_line, match_line_no,
    score) with deterministic best-pick (score desc, line order asc).
    """
    anchor_col = F.explode(
        F.array(*[F.lit(a) for a in anchors])
    ).alias("anchor")
    # non-ASCII codepoints projected to one sentinel class (0x1A) before
    # the distance: Spark levenshtein counts codepoints but the DuckDB
    # twin counts BYTES — projection makes the two identical on every
    # input (see extractors/templatematch.py _NON_ASCII_SENTINEL).
    proj = lambda c: F.regexp_replace(c, r"[^\x00-\x7F]", "\u001A")
    scored = lines.select(*unit_cols, order_col, line_col, anchor_col).withColumn(
        "score",
        1.0
        - F.levenshtein(proj(F.col(line_col)), proj(F.col("anchor")))
        / F.greatest(
            F.length(line_col), F.length("anchor"), F.lit(1)
        ),
    )
    w = Window.partitionBy(*unit_cols, "anchor").orderBy(
        F.col("score").desc(), F.col(order_col).asc()
    )
    return (
        scored.filter(F.col("score") >= threshold)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *unit_cols,
            "anchor",
            F.col(line_col).alias("matched_line"),
            F.col(order_col).alias("match_line_no"),
            round_half_up(F.col("score"), 6).alias("score"),
        )
    )
