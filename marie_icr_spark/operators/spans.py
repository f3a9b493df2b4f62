"""Span grouping operators (the NER-aggregation idioms of SURVEY §2.9).

``runlength_spans`` is the distributed form of the reference's contiguous
B-/I- run collection (``marie/executor/ner/ner_extraction_executor.py:447-532``):
a new span starts whenever the label changes along the ordered sequence —
the classic gaps-and-islands ``sum(label != lag(label))`` window trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def runlength_spans(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    label_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Collapse consecutive equal labels into spans.

    Output: key_cols + (span_id, label, span_len[, value_sum]) where span_id
    is 1-based in sequence order.
    """
    seq = Window.partitionBy(*key_cols).orderBy(*order_cols)
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn(
        "_chg",
        F.when(
            F.lag(label_col).over(seq).isNull()
            | (F.lag(label_col).over(seq) != F.col(label_col)),
            1,
        ).otherwise(0),
    ).withColumn("span_id", F.sum("_chg").over(run).cast("int"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("span_len"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return (
        flagged.groupBy(*key_cols, "span_id", F.col(label_col).alias("label"))
        .agg(*aggs)
    )


def topk_per_group(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` desc (W7 — classifier top_k,
    marie/components/document_classifier/transformers.py:70), deterministic
    tie-break. Output: input + rank."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
