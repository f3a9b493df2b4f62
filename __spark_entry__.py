"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the pre-registered testdata views.

The extraction queries use an *invertible payload construction*
(marie_icr_spark.sources.transcripts): transcripts are derived
deterministically from ``documents`` — each doc's text reflowed into 8-word
lines and wrapped in HTML / layout-JSON / markdown / plain noise — so the
Spark side must genuinely parse and de-boilerplate the payload while the
oracle computes the expected text directly from ``documents.text`` in SQL.
A value-hash match therefore certifies the whole extraction pipeline.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# allow invocation from any cwd (spark-submit, driver harness)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from marie_icr_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction over transcripts at sf0.001."""
    return Q.q_extract_turns(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
