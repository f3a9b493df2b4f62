"""Entity-span aggregation and key/value pairing (SURVEY §2.9 N4–N6).

Distributed forms of the reference's NER post-processing:

* ``aggregate_entity_spans`` — contiguous same-label runs within a line are
  collapsed into spans with envelope bbox and mean score rounded 6
  (``marie/executor/ner/ner_extraction_executor.py:447-532``);
* ``merge_spans_horizontal`` — horizontally-overlapping same-label spans on
  the same line merge (mislabeled-token merge, strategy ``aggregate``,
  ``ner_extraction_executor.py:550-599``);
* ``kv_pairs`` — per line: the first key span, then the first value span to
  its right (``bbox_v.x >= bbox_k.x``); lines without that shape are skipped
  (``ner_extraction_executor.py:620-664``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.columns import round_half_up

# span/token input schema: (doc_id, line_no, token_idx, label, text,
#                           x, y, w, h, score)


def aggregate_entity_spans(tokens: DataFrame) -> DataFrame:
    """Collapse contiguous same-label token runs (per doc+line) into spans.

    Output: (doc_id, line_no, span_id, label, span_text, x, y, w, h,
    score, n_tokens) — bbox is the envelope, score the mean rounded 6
    (ner_extraction_executor.py:505-521: block-merge + mean round 6).
    'O' tokens break runs and emit no span (F6 filter, :453-461).
    """
    seq = Window.partitionBy("doc_id", "line_no").orderBy("token_idx")
    run = (
        Window.partitionBy("doc_id", "line_no")
        .orderBy("token_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = tokens.withColumn(
        "_chg",
        F.when(
            F.lag("label").over(seq).isNull()
            | (F.lag("label").over(seq) != F.col("label")),
            1,
        ).otherwise(0),
    ).withColumn("span_id", F.sum("_chg").over(run).cast("int"))
    return (
        flagged.filter(F.col("label") != "O")
        .groupBy("doc_id", "line_no", "span_id", "label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("token_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("span_text"),
            F.min("x").alias("x"),
            F.min("y").alias("y"),
            (F.max(F.col("x") + F.col("w")) - F.min("x")).alias("w"),
            (F.max(F.col("y") + F.col("h")) - F.min("y")).alias("h"),
            round_half_up(F.avg("score"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


def merge_spans_horizontal(spans: DataFrame, band: float = 0.5) -> DataFrame:
    """Merge horizontally-overlapping same-label spans on the same line.

    Chain-merges via connected intervals: spans sorted by x; a span joins
    the open group while its x < the group's running max(x+w); groups get
    the envelope bbox and max score (interval-merge twin of
    ner_extraction_executor.py:550-599).
    """
    seq = Window.partitionBy("doc_id", "line_no", "label").orderBy("x")
    runmax = (
        Window.partitionBy("doc_id", "line_no", "label")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = (
        Window.partitionBy("doc_id", "line_no", "label")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        spans.withColumn("_prev_max", F.max(F.col("x") + F.col("w")).over(runmax))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_max").isNull() | (F.col("x") >= F.col("_prev_max")),
                1,
            ).otherwise(0),
        )
        .withColumn("group_id", F.sum("_new").over(grp).cast("int"))
    )
    return (
        flagged.groupBy("doc_id", "line_no", "label", "group_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("x", "span_text"))),
                    lambda s: s["span_text"],
                ),
                " ",
            ).alias("span_text"),
            F.min("x").alias("x"),
            F.min("y").alias("y"),
            (F.max(F.col("x") + F.col("w")) - F.min("x")).alias("w"),
            (F.max(F.col("y") + F.col("h")) - F.min("y")).alias("h"),
            F.max("score").alias("score"),
        )
    )


def kv_pairs(spans: DataFrame) -> DataFrame:
    """Per (doc, line): first 'key' span paired with the first 'value' span
    at or right of it; unmatched lines are dropped with a skip reason the
    caller can count (ner_extraction_executor.py:620-664 warns+skips).

    Input needs (doc_id, line_no, label in {'key','value'}, span_text, x).
    Output: (doc_id, line_no, key_text, value_text, key_x, value_x).
    """
    wk = Window.partitionBy("doc_id", "line_no").orderBy("x")
    keys = (
        spans.filter(F.col("label") == "key")
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id", "line_no",
            F.col("span_text").alias("key_text"),
            F.col("x").alias("key_x"),
        )
    )
    vals = spans.filter(F.col("label") == "value").select(
        "doc_id", "line_no",
        F.col("span_text").alias("value_text"),
        F.col("x").alias("value_x"),
    )
    joined = keys.join(vals, ["doc_id", "line_no"]).filter(
        F.col("value_x") >= F.col("key_x")
    )
    wv = Window.partitionBy("doc_id", "line_no").orderBy("value_x")
    return (
        joined.withColumn("_rv", F.row_number().over(wv))
        .filter(F.col("_rv") == 1)
        .select("doc_id", "line_no", "key_text", "value_text", "key_x", "value_x")
    )
