"""Kill → rerun → byte-identical final state (FIXTURES.md §4 resume test)."""

import pandas as pd
import pytest

from marie_icr_spark.plans.lineage import (
    STATUS_COMPLETED,
    SimulatedFailure,
    completed_buckets,
    read_lineage,
    read_results,
    run_extraction_job,
)
from marie_icr_spark.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts


@pytest.fixture(scope="module")
def sdf(spark):
    tdf, _ = synth_transcripts(n_convs=30, seed=7, hot_factor=10)
    return spark.createDataFrame(tdf, schema=TRANSCRIPT_SCHEMA)


def _collect_sorted(spark, path):
    df = read_results(spark, path).toPandas()
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_uninterrupted_run_commits_all_buckets(spark, sdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("results_full"))
    summary = run_extraction_job(spark, sdf, out, n_buckets=8, buckets_per_commit=3)
    assert sorted(summary["buckets_processed"]) == list(range(8))
    lineage = read_lineage(spark, out).toPandas()
    assert set(lineage["bucket"]) == set(range(8))
    assert (lineage["status"] == STATUS_COMPLETED).all()
    res = _collect_sorted(spark, out)
    assert len(res) == sdf.count()


def test_kill_then_resume_is_byte_identical(spark, sdf, tmp_path_factory):
    ref_dir = str(tmp_path_factory.mktemp("results_ref"))
    run_extraction_job(spark, sdf, ref_dir, n_buckets=8, buckets_per_commit=3)
    reference = _collect_sorted(spark, ref_dir)

    out = str(tmp_path_factory.mktemp("results_killed"))
    with pytest.raises(SimulatedFailure):
        run_extraction_job(
            spark, sdf, out, n_buckets=8, buckets_per_commit=3,
            fail_after_commits=1,
        )
    done_after_kill = completed_buckets(spark, out)
    assert 0 < len(done_after_kill) < 8, "kill must land mid-run"

    summary = run_extraction_job(
        spark, sdf, out, n_buckets=8, buckets_per_commit=3
    )
    # resume skipped exactly the committed buckets
    assert set(summary["buckets_skipped"]) == done_after_kill
    assert set(summary["buckets_processed"]) == set(range(8)) - done_after_kill

    resumed = _collect_sorted(spark, out)
    pd.testing.assert_frame_equal(resumed, reference)

    # lineage carries identical per-bucket content hashes for both runs
    lin_ref = read_lineage(spark, ref_dir).toPandas().set_index("bucket")
    lin_res = read_lineage(spark, out).toPandas().set_index("bucket")
    for b in range(8):
        assert lin_ref.loc[b, "partition_hash"] == lin_res.loc[b, "partition_hash"]


def test_single_extraction_pass_over_source(spark, sdf, tmp_path_factory, monkeypatch):
    """The 100-TB contract: one extraction plan / one source scan per run,
    regardless of how many lineage commit units follow."""
    from marie_icr_spark.operators import extraction as X

    calls = {"n": 0}
    real = X.extract_turns

    def counting(df, *a, **kw):
        calls["n"] += 1
        return real(df, *a, **kw)

    monkeypatch.setattr(X, "extract_turns", counting)
    out = str(tmp_path_factory.mktemp("results_onepass"))
    summary = run_extraction_job(spark, sdf, out, n_buckets=8, buckets_per_commit=2)
    assert summary["commits"] == 4
    assert calls["n"] == 1, "source must be extracted in a single pass"


def test_changed_source_snapshot_reprocesses_stale_buckets(
    spark, tmp_path_factory
):
    """ADVICE: a bucket committed under a different source snapshot is stale
    and must be reprocessed, not silently kept."""
    tdf, _ = synth_transcripts(n_convs=20, seed=11, hot_factor=5)
    old = spark.createDataFrame(tdf, schema=TRANSCRIPT_SCHEMA)
    out = str(tmp_path_factory.mktemp("results_stale"))
    run_extraction_job(spark, old, out, n_buckets=4)

    tdf2, _ = synth_transcripts(n_convs=25, seed=12, hot_factor=5)
    new = spark.createDataFrame(tdf2, schema=TRANSCRIPT_SCHEMA)
    summary = run_extraction_job(spark, new, out, n_buckets=4)
    assert summary["buckets_skipped"] == [], "stale buckets must not be skipped"
    assert sorted(summary["buckets_processed"]) == list(range(4))
    res = read_results(spark, out)
    assert res.count() == new.count()


def test_committed_only_read_hides_uncommitted_buckets(spark, sdf, tmp_path_factory):
    """Reader-side atomicity: after a kill between data write and lineage
    commit, committed_only readers see exactly the committed buckets."""
    out = str(tmp_path_factory.mktemp("results_snapshot"))
    with pytest.raises(SimulatedFailure):
        run_extraction_job(
            spark, sdf, out, n_buckets=8, buckets_per_commit=3,
            fail_after_commits=1,
        )
    done = completed_buckets(spark, out)
    visible = read_results(spark, out, committed_only=True)
    assert {
        r["bucket"] for r in visible.select("bucket").distinct().collect()
    } == done
    # the raw read sees more (the one-pass write landed all buckets)
    raw = read_results(spark, out)
    assert raw.count() > visible.count()


def test_bucket_emptied_by_new_snapshot_is_purged(spark, tmp_path_factory):
    """Code-review regression: a bucket with rows under snapshot A and ZERO
    rows under snapshot B must end up empty on disk (not keep stale files
    re-certified by a fresh lineage row)."""
    from pyspark.sql import functions as F

    tdf, _ = synth_transcripts(n_convs=20, seed=3, hot_factor=4)
    full = spark.createDataFrame(tdf, schema=TRANSCRIPT_SCHEMA)
    out = str(tmp_path_factory.mktemp("results_purge"))
    run_extraction_job(spark, full, out, n_buckets=4)
    # new snapshot: keep only conversations landing in one bucket
    from marie_icr_spark.plans.lineage import with_bucket

    keep_bucket = 0
    reduced = (
        with_bucket(full, 4).filter(F.col("bucket") == keep_bucket).drop("bucket")
    )
    assert 0 < reduced.count() < full.count()
    run_extraction_job(spark, reduced, out, n_buckets=4)
    res = read_results(spark, out)
    assert res.count() == reduced.count(), "stale rows from snapshot A survived"
    assert {r["bucket"] for r in res.select("bucket").distinct().collect()} == {keep_bucket}
    # emptied buckets carry zero-count completed lineage rows (resume is done)
    lin = read_lineage(spark, out).toPandas()
    latest = lin.sort_values("committed_at").groupby("bucket").last()
    empties = latest[latest.index != keep_bucket]
    assert (empties["turn_count"] == 0).all()


def test_empty_source_completes_with_zero_rows(spark, tmp_path_factory):
    """Code-review regression: a zero-row source must complete cleanly (no
    parquet schema-inference crash) and commit zero-count lineage."""
    empty = spark.createDataFrame([], schema=TRANSCRIPT_SCHEMA)
    out = str(tmp_path_factory.mktemp("results_empty"))
    summary = run_extraction_job(spark, empty, out, n_buckets=4)
    assert sorted(summary["buckets_processed"]) == list(range(4))
    lin = read_lineage(spark, out).toPandas()
    assert set(lin["bucket"]) == set(range(4))
    assert (lin["turn_count"] == 0).all()
    # second run is a noop
    summary2 = run_extraction_job(spark, empty, out, n_buckets=4)
    assert summary2["buckets_processed"] == []
    # public readers of the zero-row output must not crash on inference
    assert read_results(spark, out).count() == 0
    assert read_results(spark, out, committed_only=True).count() == 0


def test_rerun_on_complete_output_is_noop(spark, sdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("results_noop"))
    run_extraction_job(spark, sdf, out, n_buckets=4)
    before = _collect_sorted(spark, out)
    summary = run_extraction_job(spark, sdf, out, n_buckets=4)
    assert summary["buckets_processed"] == []
    assert summary["commits"] == 0
    pd.testing.assert_frame_equal(_collect_sorted(spark, out), before)
