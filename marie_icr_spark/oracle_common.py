"""Shared oracle SQL fragments (DuckDB side of the extraction contract)."""

from __future__ import annotations

from .sources.transcripts import CONV_MOD, WORDS_PER_LINE

_ORACLE_DERIVE = f"""
WITH d AS (
  SELECT
    doc_id,
    'conv-' || lpad(CAST(doc_id % {CONV_MOD} AS VARCHAR), 6, '0') AS conv_id,
    CAST(doc_id // {CONV_MOD} AS INTEGER) AS turn_idx,
    doc_id % 100 AS kb,
    string_split(regexp_replace(trim(text), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ') AS w
  FROM documents
),
g AS (
  SELECT
    conv_id,
    turn_idx,
    kb,
    CASE WHEN kb >= 98 THEN '' ELSE
      array_to_string(
        list_transform(
          range(CAST(ceil(len(w) / {WORDS_PER_LINE}.0) AS BIGINT)),
          i -> array_to_string(w[i*{WORDS_PER_LINE}+1 : i*{WORDS_PER_LINE}+{WORDS_PER_LINE}], ' ')
        ), chr(10))
    END AS extracted_text,
    CAST(CASE WHEN kb >= 98 THEN 0
         ELSE ceil(len(w) / {WORDS_PER_LINE}.0) END AS INTEGER) AS span_count
  FROM d
)
"""
