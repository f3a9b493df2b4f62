"""Query registry: every implemented operator exposed as (spark, sf_dir) ->
DataFrame, plus the matching DuckDB oracle SQL.

Column names are aliased identically on both sides — the driver's comparator
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.assembly import assemble_conversations
from .operators.extraction import extract_turns
from .sources.transcripts import CONV_MOD, WORDS_PER_LINE, transcripts_from_docs

# ---------------------------------------------------------------------------
# Extraction pipeline (SURVEY.md §2.8/§7.0 — the core semantics)
# ---------------------------------------------------------------------------

# DuckDB fragment: canonical transcript derivation from `documents`
# (must mirror sources.transcripts.transcripts_from_docs with replicate=1).
from .oracle_common import _ORACLE_DERIVE  # noqa: E402



def q_extract_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-turn main-content extraction (html/layout/markdown/plain)."""
    t = transcripts_from_docs(spark, sf_dir)
    out = extract_turns(t)
    return out.select("conv_id", "turn_idx", "extracted_text", "span_count")


ORACLE_EXTRACT_TURNS = (
    _ORACLE_DERIVE
    + "SELECT conv_id, turn_idx, extracted_text, span_count FROM g"
)


def q_extract_kind_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload-kind routing check (engine-selection parity, SURVEY §2.8 B12)."""
    t = transcripts_from_docs(spark, sf_dir)
    # projection pushed through the mapInArrow boundary: the scan reads only
    # `text`, and the corpus-sized extracted_text column is never built
    return (
        extract_turns(t, columns=("payload_kind", "span_count"))
        .groupBy("payload_kind")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum("span_count").alias("total_spans"),
        )
    )


ORACLE_EXTRACT_KIND_COUNTS = (
    _ORACLE_DERIVE
    + """
SELECT
  CASE WHEN kb < 40 THEN 'html' WHEN kb < 65 THEN 'layout'
       WHEN kb < 90 THEN 'markdown' WHEN kb < 98 THEN 'plain'
       ELSE 'empty' END AS payload_kind,
  COUNT(*) AS turn_count,
  CAST(SUM(span_count) AS BIGINT) AS total_spans
FROM g GROUP BY 1
"""
)


def q_assemble_conversations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted reassembly: conversation text in stable turn order
    joined with "\\f" (SURVEY §2.5 W6 / renderer S8)."""
    t = transcripts_from_docs(spark, sf_dir)
    return assemble_conversations(extract_turns(t)).select(
        "conv_id", "conversation_text", "turn_count"
    )


ORACLE_ASSEMBLE = (
    _ORACLE_DERIVE
    + """
SELECT conv_id,
       string_agg(extracted_text, chr(12) ORDER BY turn_idx) AS conversation_text,
       COUNT(*) AS turn_count
FROM g GROUP BY conv_id
"""
)


def q_turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn-ordering window (north rule; SURVEY §2.5 W6/W2)."""
    from pyspark.sql.window import Window

    t = transcripts_from_docs(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return t.select(
        "conv_id",
        "turn_idx",
        F.row_number().over(w).cast("int").alias("turn_rank"),
    )


ORACLE_TURN_ORDER = (
    _ORACLE_DERIVE
    + """
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INTEGER)
         AS turn_rank
FROM g
"""
)


from .queries_embed import EMB_ORACLES, EMB_QUERIES  # noqa: E402
from .queries_ext import EXT_ORACLES, EXT_QUERIES  # noqa: E402
from .queries_readorder import RO_ORACLES, RO_QUERIES  # noqa: E402
from .queries_templates import TPL_ORACLES, TPL_QUERIES  # noqa: E402
from .suites import (  # noqa: E402
    MERGED_MEMBERS,
    SUITE_ORACLES,
    SUITE_QUERIES,
)

# full registry: every individual operator query plus the compound suites —
# this is what `make sweep` (sweep_oracles.py) checks, so no operator ever
# loses its standalone oracle
ALL_QUERIES = {
    "extract_turns": q_extract_turns,
    "extract_kind_counts": q_extract_kind_counts,
    "assemble_conversations": q_assemble_conversations,
    "turn_order": q_turn_order,
    **EXT_QUERIES,
    **RO_QUERIES,
    **TPL_QUERIES,
    **EMB_QUERIES,
    **SUITE_QUERIES,
}

ALL_ORACLES = {
    "extract_turns": ORACLE_EXTRACT_TURNS,
    "extract_kind_counts": ORACLE_EXTRACT_KIND_COUNTS,
    "assemble_conversations": ORACLE_ASSEMBLE,
    "turn_order": ORACLE_TURN_ORDER,
    **EXT_ORACLES,
    **RO_ORACLES,
    **TPL_ORACLES,
    **EMB_ORACLES,
    **SUITE_ORACLES,
}

# driver-facing registry (__spark_entry__.queries()): suites replace their
# members so every registered query fits inside the driver's ~50-row
# CORRECTNESS gate (it recorded exactly the first 50 of 67 for two rounds)
QUERIES = {k: v for k, v in ALL_QUERIES.items() if k not in MERGED_MEMBERS}
ORACLES = {k: v for k, v in ALL_ORACLES.items() if k not in MERGED_MEMBERS}
