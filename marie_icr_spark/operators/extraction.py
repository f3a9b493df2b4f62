"""The extraction operator: transcripts → per-turn extracted content.

Spark-first design notes (the reference loops pages in-process,
``marie/pipe/extract_pipeline.py:263-387``; here every turn is an independent
row, so the hot path is a **narrow** ``mapInPandas`` — zero shuffle, scales
linearly with executors at 10^12 turns):

* payload parsing/extraction runs Arrow-batched via the pure-Python twin
  (``extractors.core.extract_turn``) — no row-at-a-time Python UDFs;
* ``salt_repartition`` is used *before* extraction only to even out skewed
  input splits (hot conversations in few files); extraction itself never
  groups by conv_id;
* the full word/line structs (layout turns) are optional — column pruning
  keeps the bench path lean, mirroring the reference's base64 payload pruning
  (``marie/ocr/ocr_engine.py:392-412``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extractors.core import extract_turn

WORD_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("confidence", T.DoubleType()),
            T.StructField("box", T.ArrayType(T.IntegerType())),
            T.StructField("line", T.IntegerType()),
            T.StructField("word_index", T.IntegerType()),
        ]
    )
)
LINE_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("line", T.IntegerType()),
            T.StructField("wordids", T.ArrayType(T.IntegerType())),
            T.StructField("text", T.StringType()),
            T.StructField("bbox", T.ArrayType(T.IntegerType())),
            T.StructField("confidence", T.DoubleType()),
        ]
    )
)

_BASE_FIELDS = [
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("payload_kind", T.StringType()),
    T.StructField("extracted_text", T.StringType()),
    T.StructField("span_count", T.IntegerType()),
]

EXTRACTED_SCHEMA = T.StructType(_BASE_FIELDS)
EXTRACTED_FULL_SCHEMA = T.StructType(
    _BASE_FIELDS
    + [T.StructField("words", WORD_TYPE), T.StructField("lines", LINE_TYPE)]
)


def _extract_batches(
    batches: Iterator[pd.DataFrame], with_structs: bool, mode: str
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = pdf["text"]
        kinds, outs, spans = [], [], []
        words, lines = [], []
        for t in texts:
            r = extract_turn(t, mode=mode, with_structs=with_structs)
            kinds.append(r.payload_kind)
            outs.append(r.extracted_text)
            spans.append(r.span_count)
            if with_structs:
                words.append(r.words)
                lines.append(r.lines)
        res = pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy(),
                "turn_idx": pdf["turn_idx"].to_numpy(),
                "role": pdf["role"].to_numpy(),
                "tool": pdf["tool"].to_numpy(),
                "ts": pdf["ts"],
                "payload_kind": kinds,
                "extracted_text": outs,
                "span_count": pd.Series(spans, dtype="int32"),
            }
        )
        if with_structs:
            res["words"] = pd.Series(words, dtype="object")
            res["lines"] = pd.Series(lines, dtype="object")
        yield res


def extract_turns(
    df: DataFrame, with_structs: bool = False, mode: str = "sparse"
) -> DataFrame:
    """Run main-content extraction over a transcript DataFrame.

    Input columns: at least (conv_id, turn_idx, role, text, tool). Output is
    one row per turn with (payload_kind, extracted_text, span_count) and,
    when ``with_structs``, the layout word/line structs (FIXTURES.md §3).
    ``mode`` = PSM contract for layout payloads (extractors.layout.PSM_MODES,
    honored per call as the reference honors it per region,
    marie/ocr/ocr_engine.py:319-322).
    """
    schema = EXTRACTED_FULL_SCHEMA if with_structs else EXTRACTED_SCHEMA
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return df.select(*cols).mapInPandas(
        lambda it: _extract_batches(it, with_structs, mode), schema=schema
    )


def salt_repartition(
    df: DataFrame, num_partitions: int, salt_buckets: int = 64
) -> DataFrame:
    """Spread hot conversations across ``salt_buckets`` sub-keys.

    Hash-partitioning on (conv_id, salt) instead of conv_id alone bounds any
    single task's share of a hot conversation to ~1/salt_buckets — the
    explicit skew story required at 10^12 turns (SURVEY.md §4). The salt is
    derived from turn_idx, so it is deterministic and reassembly can unsalt
    by simply re-grouping on conv_id.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt_buckets))
    )
    return salted.repartition(num_partitions, F.col("conv_id"), F.col("_salt")).drop(
        "_salt"
    )
