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

Skew note: both operators sort each key's rows inside ONE task (inherent
to their per-event output contract) — a single pathological key with 10^8
events lands in one partition. When the consumer only needs *session
aggregates* (the common case), use ``session_stats_bucketed``: it salts
the heavy per-event phase across (key, time-bucket) tasks and runs the
per-key sequential pass over session-level rows only (≪ events). For
``asof_join`` there is no general escape hatch — an as-of value per left
row is inherently a per-key ordered scan — but the same time-bucketing
decomposition applies when left rows only need aggregates of their as-of
matches.
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

    Row-level semantics, pinned: the value columns come from ONE right
    row — they are carried as a single struct, so (a) a legitimately-NULL
    field of the latest right row stays NULL (it is never back-filled from
    an older row), and (b) columns can never mix across right rows.
    Multiple right rows at the SAME timestamp resolve deterministically to
    the greatest value tuple (struct comparison — an arbitrary but pinned
    total order; Spark and DuckDB compare structs field-wise the same way).

    Implementation: tag and union both sides, sort within key by
    (event time, side, value struct) with right rows first at equal times,
    and carry the right struct forward with ``last(ignorenulls=True)`` — a
    single shuffle.

    Scale note: the per-key window sort is inherent to as-of semantics, so
    ONE hot key (e.g. a single conversation with 10^8 events) lands in one
    task. When the consumer only needs per-session/per-bucket aggregates,
    prefer the salted two-phase pattern of
    :func:`session_stats_bucketed` — shuffle on (key, time bucket) first,
    then merge at the boundary — which spreads a hot key over
    ``span / bucket`` tasks.
    """
    lcols = left.columns
    vtype = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ) + ">"
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(vtype).alias("_vs"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_vs"),
    ).select(*lcols, "_t", "_side", "_vs")

    unioned = l.unionByName(r)
    # _vs in the sort key = the pinned equal-timestamp tiebreak among right
    # rows (left rows carry a NULL struct, which ignorenulls skips, so
    # their relative order is immaterial)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_vs").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        F.last("_vs", ignorenulls=True).over(w).alias("_vc"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_vc.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign 1-based session ids per key: a new session starts when the gap
    since the previous event exceeds ``gap_minutes``. Output: input +
    (session_id int).

    Scale note: per-key window sort — a single hot key serializes into one
    task. If only session AGGREGATES are needed downstream, use
    :func:`session_stats_bucketed` (skew-safe two-phase twin, identical
    output contract) instead of ``session_stats(sessionize(...))``."""
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


def session_stats_bucketed(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: float = 30.0,
    bucket_minutes: float = 1440.0,
) -> DataFrame:
    """Skew-safe twin of ``session_stats(sessionize(...))`` — identical
    output ``(key..., session_id, n_events, duration_sec)``, different
    plan shape:

    1. **Per-event phase shuffles on (key, time bucket)** — a hot key's
       events spread over ``span / bucket_minutes`` tasks instead of one.
       Within each bucket, ordinary gaps-and-islands sessionization.
    2. **Per-(key, bucket, local session) aggregate** — map-side
       combinable; output is one row per bucket-local session.
    3. **Per-key sequential pass over SESSION rows only**: adjacent
       bucket-local sessions merge when the boundary gap is within the
       threshold (the session-level gap rule reconstructs exactly the
       maximal event runs), then 1-based renumbering + final aggregate.

    Sessions are maximal runs of events with consecutive gaps <= the
    threshold; bucketing only ever *splits* runs at bucket edges, and step
    3 re-joins exactly those splits, so equivalence to the single-window
    form is structural (and certified by the shared oracle row). The
    per-key phase touches ``n_sessions`` rows, which for any real gap
    threshold is orders of magnitude below ``n_events``; the adversarial
    worst case (every event its own session) degrades to the plain form's
    cost, never worse.
    """
    gap_us = int(gap_minutes * 60) * 1_000_000
    bucket_us = int(bucket_minutes * 60) * 1_000_000

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(*key_cols, us.alias("_us")).withColumn(
        "_b", F.floor(F.col("_us") / F.lit(bucket_us))
    )
    seq = Window.partitionBy(*key_cols, "_b").orderBy("_us")
    run = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("_us") - F.lag("_us").over(seq)
    local = ev.withColumn(
        "_sid",
        F.sum(
            F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
        ).over(run),
    )
    per_session = local.groupBy(*key_cols, "_b", "_sid").agg(
        F.min("_us").alias("_first"),
        F.max("_us").alias("_last"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    sw = Window.partitionBy(*key_cols).orderBy("_first")
    srun = sw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sgap = F.col("_first") - F.lag("_last").over(sw)
    merged = per_session.withColumn(
        "session_id",
        F.sum(
            F.when(sgap.isNull() | (sgap > gap_us), 1).otherwise(0)
        ).over(srun).cast("int"),
    )
    return merged.groupBy(*key_cols, "session_id").agg(
        F.sum("_n").cast("long").alias("n_events"),
        ((F.max("_last") - F.min("_first")) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_sec"),
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
