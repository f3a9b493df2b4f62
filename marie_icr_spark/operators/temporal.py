"""Temporal operators: as-of join and gap sessionization.

The reference has no stream-relational operators (SURVEY §2.10); these are
the standard temporal primitives a transcript/event pipeline needs at scale,
built the shuffle-frugal way:

* ``asof_join`` — "latest right row at or before each left row" via the
  union+window trick: ONE shuffle on (key), no range explosion, no
  per-key driver loops. (A naive approach joins then filters — quadratic
  per key; Spark has no native ASOF join.)
* ``sessionize`` — gaps-and-islands session ids from inactivity gaps
  (one window shuffle on the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same key (ties: the right row wins —
    "at or before"). Left rows with no prior right row keep NULLs.

    Implementation: tag and union both sides, sort within key by
    (event time, side) with right rows first at equal times, and carry the
    right values forward with ``last(ignorenulls=True)`` — a single shuffle.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    ).select(*lcols, "_t", "_side", *[f"_v_{c}" for c in value_cols])

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign 1-based session ids per key: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``. Output: input +
    (session_id int)."""
    seq = Window.partitionBy(*key_cols).orderBy(ts_col)
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # microsecond precision: unix_timestamp truncates to seconds and would
    # disagree with the sub-second event data (oracle uses epoch_us)
    def _us(c):
        # parquet timestamps are NTZ; session TZ is pinned UTC so the cast
        # is value-preserving (oracle uses epoch_us on the naive value)
        return F.unix_micros(c.cast("timestamp"))

    gap = _us(F.col(ts_col)) - _us(F.lag(ts_col).over(seq))
    new_session = F.when(
        gap.isNull() | (gap > int(gap_minutes * 60) * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(new_session).over(run).cast("int")
    )


def session_stats(sessions: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """Per-session aggregates: event count and duration seconds."""
    return sessions.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            )
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )
