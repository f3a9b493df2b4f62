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


SUBWORD_PIECE_LEN = 4


def subword_pieces(tokens: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic wordpiece-style tokenization: each token splits into
    fixed-width pieces (SUBWORD_PIECE_LEN chars); continuation pieces carry
    the '##' prefix and their char_start offset — the shape a HF tokenizer's
    offset_mapping exposes (ner_extraction_executor.py:300-301: a piece is a
    subword iff its offset start != 0). Pure Column expressions.

    Output: input columns + (piece_idx, char_start, piece_text, n_pieces).
    """
    n_pieces = F.greatest(
        F.ceil(F.length(text_col) / SUBWORD_PIECE_LEN), F.lit(1)
    ).cast("int")
    with_n = tokens.withColumn("n_pieces", n_pieces)
    exploded = with_n.select(
        "*", F.posexplode(F.sequence(F.lit(0), F.col("n_pieces") - 1)).alias("piece_idx", "_i")
    ).drop("_i")
    start = F.col("piece_idx") * SUBWORD_PIECE_LEN
    sub = F.col(text_col).substr(start + 1, F.lit(SUBWORD_PIECE_LEN))
    return exploded.select(
        "*",
        start.cast("int").alias("char_start"),
        F.when(F.col("piece_idx") > 0, F.concat(F.lit("##"), sub))
        .otherwise(sub)
        .alias("piece_text"),
    )


def first_subword_filter(pieces: DataFrame) -> DataFrame:
    """F5: keep only non-subword predictions — pieces whose offset start is
    0 — and drop [0,0,0,0] boxes (ner_extraction_executor.py:300-330)."""
    zero_box = (
        (F.col("x") == 0) & (F.col("y") == 0)
        & (F.col("w") == 0) & (F.col("h") == 0)
    )
    return pieces.filter((F.col("char_start") == 0) & ~zero_box)


def kv_pairs(spans: DataFrame) -> DataFrame:
    """Per (doc, line): first 'key' span paired with the first 'value' span
    at or right of it; unmatched lines are dropped with a skip reason the
    caller can count (ner_extraction_executor.py:620-664 warns+skips).

    Input needs (doc_id, line_no, label in {'key','value'}, span_text, x).
    Output: (doc_id, line_no, key_text, value_text, key_x, value_x).
    """
    # total order (x, then span_text): two spans can share an x after the
    # horizontal merges, and an x-only sort would pick nondeterministically
    # across runs/partitionings — the same flake class voting.py pins out
    wk = Window.partitionBy("doc_id", "line_no").orderBy("x", "span_text")
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
    wv = Window.partitionBy("doc_id", "line_no").orderBy(
        "value_x", "value_text"
    )
    return (
        joined.withColumn("_rv", F.row_number().over(wv))
        .filter(F.col("_rv") == 1)
        .select("doc_id", "line_no", "key_text", "value_text", "key_x", "value_x")
    )
