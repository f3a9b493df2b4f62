"""Composite-entity grouping (SURVEY §2.9 N8).

Distributed form of the reference's ``group_composite_entities``
(``marie/components/document_indexer/transformers.py:703-843``): per
configured composite ``{"name": n, "entities": [labels...]}``, spans whose
label belongs to the composite are walked in (line, x) order and split into
instances wherever the line gap exceeds ``max_line_diff`` (:747-760:
``line_diff > max_line_diff → new group``); each instance gets the envelope
bbox (``merge_bboxes_as_block``, :790) and its members' text joined in
reading order. The per-document sequential scan is a window cumulative sum —
bounded by spans-per-document, never corpus-wide.

The reference's in-group horizontal overlap merge (:765-785) is available as
``kv.merge_spans_horizontal`` applied upstream; spans from
``aggregate_entity_spans`` are already disjoint per line.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_composite_entities(
    spans: DataFrame,
    entities: list[dict[str, Any]],
    max_line_diff: int = 2,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Group labeled spans into composite-entity instances.

    ``spans``: (doc_id, line_no, label, span_text, x, y, w, h, score).
    ``entities``: ``[{"name": str, "entities": [label, ...]}, ...]`` — the
    reference's ``entities_to_group`` config shape.

    Output: (doc_id, entity_name, group_id, text, labels, x, y, w, h,
    n_spans, score) — bbox is the instance envelope, text joins members in
    (line_no, x) order, labels is the sorted distinct member-label list,
    score the max member score.
    """
    from functools import reduce

    outs = []
    for ent in entities:
        name, labels = ent["name"], list(ent["entities"])
        f = spans.filter(F.col("label").isin(labels))
        seq = Window.partitionBy(doc_col).orderBy("line_no", "x", "label")
        run = (
            Window.partitionBy(doc_col)
            .orderBy("line_no", "x", "label")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flagged = f.withColumn(
            "_new",
            F.when(
                F.lag("line_no").over(seq).isNull()
                | (F.col("line_no") - F.lag("line_no").over(seq) > max_line_diff),
                1,
            ).otherwise(0),
        ).withColumn("group_id", F.sum("_new").over(run).cast("int"))
        outs.append(
            flagged.groupBy(doc_col, "group_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("line_no", "x", "label", "span_text")
                            )
                        ),
                        lambda s: s["span_text"],
                    ),
                    " ",
                ).alias("text"),
                F.array_join(
                    F.array_sort(F.collect_set("label")), ","
                ).alias("labels"),
                F.min("x").alias("x"),
                F.min("y").alias("y"),
                (F.max(F.col("x") + F.col("w")) - F.min("x")).alias("w"),
                (F.max(F.col("y") + F.col("h")) - F.min("y")).alias("h"),
                F.count(F.lit(1)).cast("long").alias("n_spans"),
                F.max("score").alias("score"),
            )
            .withColumn("entity_name", F.lit(name))
            .select(
                doc_col, "entity_name", "group_id", "text", "labels",
                "x", "y", "w", "h", "n_spans", "score",
            )
        )
    if not outs:
        raise ValueError("entities config must be non-empty")
    return reduce(lambda a, b: a.unionByName(b), outs)
