"""Temporal operators: bucketed session stats == single-window form.

The sf0.01 oracle row (`sessionize_bucketed`) already certifies the
equivalence on real event data; these tests pin the hard structural cases
— sessions straddling bucket edges, chains of merges across many buckets,
and a hot key — on adversarial synthetic input.
"""

from datetime import datetime, timedelta

import pytest

from marie_icr_spark.operators.temporal import (
    session_stats,
    session_stats_bucketed,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _stats_pair(spark, rows, gap_minutes=30.0, bucket_minutes=60.0):
    ev = _events(spark, rows)
    plain = session_stats(
        sessionize(ev, ["user_id"], "ts", gap_minutes), ["user_id"], "ts"
    )
    bucketed = session_stats_bucketed(
        ev, ["user_id"], "ts", gap_minutes, bucket_minutes
    )
    key = lambda r: (r["user_id"], r["session_id"])
    return (
        sorted([r.asDict() for r in plain.collect()], key=key),
        sorted([r.asDict() for r in bucketed.collect()], key=key),
    )


def test_bucket_edge_straddle(spark):
    """One session whose events straddle an hour-bucket edge must merge;
    a >gap jump inside the same bucket must split."""
    t0 = datetime(2024, 1, 1, 0, 50)
    rows = [
        (1, t0),                                # bucket 0
        (1, t0 + timedelta(minutes=15)),        # bucket 1, gap 15m: merge
        (1, t0 + timedelta(minutes=20)),        # same bucket, same session
        (1, t0 + timedelta(minutes=80)),        # gap 60m: new session
    ]
    plain, bucketed = _stats_pair(spark, rows)
    assert plain == bucketed
    assert [r["session_id"] for r in plain] == [1, 2]
    assert [r["n_events"] for r in plain] == [3, 1]


def test_merge_chain_across_many_buckets(spark):
    """Events every 20 min for 12 h in 1-h buckets: a single session whose
    bucket-local pieces must chain-merge transitively."""
    t0 = datetime(2024, 3, 1, 0, 0)
    rows = [(7, t0 + timedelta(minutes=20 * i)) for i in range(36)]
    plain, bucketed = _stats_pair(spark, rows)
    assert plain == bucketed
    assert len(plain) == 1
    assert plain[0]["n_events"] == 36
    assert plain[0]["duration_sec"] == 35 * 20 * 60


def test_hot_key_and_mixed_keys(spark):
    """A hot key with many events plus sparse keys; exact-gap boundary
    (gap == threshold stays in-session, strict > splits)."""
    t0 = datetime(2024, 6, 1)
    rows = [(1, t0 + timedelta(seconds=13 * i)) for i in range(500)]
    rows += [(2, t0), (2, t0 + timedelta(minutes=30)),        # == gap: merge
             (2, t0 + timedelta(minutes=60, seconds=1))]       # > gap: split
    rows += [(3, t0 + timedelta(days=i)) for i in range(5)]
    plain, bucketed = _stats_pair(spark, rows, bucket_minutes=15.0)
    assert plain == bucketed
    u2 = [r for r in plain if r["user_id"] == 2]
    assert [(r["session_id"], r["n_events"]) for r in u2] == [(1, 2), (2, 1)]


@pytest.mark.parametrize("bucket_minutes", [1.0, 47.0, 100000.0])
def test_bucket_size_invariance(spark, bucket_minutes):
    """Output must not depend on the bucket span (including one so large
    everything lands in a single bucket)."""
    t0 = datetime(2024, 2, 2, 12, 0)
    rows = [
        (u, t0 + timedelta(minutes=m))
        for u in (1, 2)
        for m in (0, 5, 50, 51, 52, 200, 229, 231)
    ]
    plain, bucketed = _stats_pair(
        spark, rows, gap_minutes=30.0, bucket_minutes=bucket_minutes
    )
    assert plain == bucketed


def test_asof_join_single_right_row_semantics(spark):
    """The as-of values come from ONE right row: a legitimately-NULL field
    of the latest right row stays NULL (never back-filled from an older
    row), and fields never mix across right rows."""
    from marie_icr_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 3))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 1), 5, 7),
            (1, datetime(2024, 1, 1, 0, 2), None, 9),
        ],
        "user_id long, rts timestamp, v1 int, v2 int",
    )
    out = asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="rts",
        value_cols=["v1", "v2"],
    ).collect()
    assert len(out) == 1
    # most recent right row is (NULL, 9): v1 must be NULL, not the stale 5
    assert out[0]["v1_asof"] is None
    assert out[0]["v2_asof"] == 9


def test_asof_join_equal_timestamp_tiebreak_pinned(spark):
    """Two right rows at the same timestamp resolve to the greatest value
    tuple — deterministically, across shuffles/partitionings."""
    from marie_icr_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 5))], "user_id long, ts timestamp"
    )
    t = datetime(2024, 1, 1, 0, 1)
    right = spark.createDataFrame(
        [(1, t, 10), (1, t, 20)], "user_id long, rts timestamp, v int"
    ).repartition(4)
    for _ in range(3):
        out = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="rts",
            value_cols=["v"],
        ).collect()
        assert out[0]["v_asof"] == 20
