"""CDC-driven incremental curation (plans/incremental.py).

The equivalence contract — curate_incremental == full build_corpus — is
value-hash certified by the corpus_incremental oracle; these tests pin
the surrounding machinery: the CDC-derived affected set, the stage-table
merge semantics (grown / new / quality-dropped conversations), and the
O(delta) property of the re-parse."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from marie_icr_spark.plans import corpus as C
from marie_icr_spark.plans import incremental as INC
from marie_icr_spark.plans import manifest as M
from marie_icr_spark.sources.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts


@pytest.fixture(scope="module")
def turns(spark):
    tdf, _ = synth_transcripts(n_convs=40, seed=11, hot_factor=5)
    return spark.createDataFrame(tdf, schema=TRANSCRIPT_SCHEMA)


def _corpus_pdf(df):
    return (
        df.toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_incremental_equals_full_recompute(spark, turns, tmp_path_factory):
    """Grown + new conversations arrive; incremental over the merged
    stage equals build_corpus over everything (including sampling)."""
    base_dir = str(tmp_path_factory.mktemp("inc"))
    h = F.pmod(F.xxhash64("conv_id"), F.lit(4))
    base = turns.filter(
        ~((h == 0) | ((h == 1) & (F.col("turn_idx") >= 2)))
    )
    affected = turns.filter((h == 0) | (h == 1)).select("conv_id").distinct()
    assert affected.count() > 0

    INC.commit_stage(C.stage_convs(base), f"{base_dir}/stage", n_buckets=4)
    inc = INC.curate_incremental(
        spark, turns, affected, f"{base_dir}/stage",
        rates=dict(C.SAMPLE_RATES), n_buckets=4,
    )
    full = C.build_corpus(turns, rates=dict(C.SAMPLE_RATES))
    pd.testing.assert_frame_equal(_corpus_pdf(inc), _corpus_pdf(full))
    # the merged stage equals a from-scratch stage over all turns
    stage = M.read_results(spark, f"{base_dir}/stage")
    fresh = C.stage_convs(turns)
    assert stage.count() == fresh.count()


def test_incremental_drops_degraded_conversation(
    spark, turns, tmp_path_factory
):
    """A conversation whose re-assembled text now FAILS the quality gate
    must disappear from the stage (replace includes delete)."""
    base_dir = str(tmp_path_factory.mktemp("inc_drop"))
    INC.commit_stage(C.stage_convs(turns), f"{base_dir}/stage", n_buckets=4)
    stage0 = M.read_results(spark, f"{base_dir}/stage")
    victim = stage0.select("conv_id").orderBy("conv_id").limit(1)
    vid = victim.collect()[0]["conv_id"]

    # the conversation's turns degrade to punctuation soup (quality → 0)
    junk = spark.createDataFrame(
        [(vid, i, "user", "!!! ??? ;;; :::", None, None) for i in range(3)],
        TRANSCRIPT_SCHEMA,
    )
    updated = turns.filter(F.col("conv_id") != vid).unionByName(junk)
    INC.curate_incremental(
        spark, updated, victim, f"{base_dir}/stage", n_buckets=4,
        jaccard_threshold=None,
    )
    stage1 = M.read_results(spark, f"{base_dir}/stage")
    assert stage1.filter(F.col("conv_id") == vid).count() == 0
    assert stage1.count() == stage0.count() - 1


def test_affected_convs_from_cdc(spark, turns, tmp_path_factory):
    """The affected set derives from the results catalog's manifest diff:
    commit v1, extend two conversations, commit v2 — the CDC feed names
    exactly the conversations in the changed buckets (a superset of the
    changed conversations, bucket-granular), and drives an incremental
    run equal to full recompute."""
    out = str(tmp_path_factory.mktemp("inc_cdc"))
    M.run_extraction_job_atomic(spark, turns, out, n_buckets=4)
    v1 = M.load_manifest(out)["version"]

    grown = turns.filter(
        F.pmod(F.xxhash64("conv_id"), F.lit(7)) == 0
    ).select("conv_id").distinct()
    n_grown = grown.count()
    assert n_grown > 0
    extra_rows = [
        (r["conv_id"], 99, "user", "one more plain turn of text", None, None)
        for r in grown.collect()
    ]
    updated = turns.unionByName(
        spark.createDataFrame(extra_rows, TRANSCRIPT_SCHEMA)
    )
    M.run_extraction_job_atomic(spark, updated, out, n_buckets=4)

    affected = INC.affected_convs_from_cdc(spark, out, v1)
    got = {r["conv_id"] for r in affected.collect()}
    want = {r["conv_id"] for r in grown.collect()}
    assert want <= got  # bucket-granular: superset of the truly changed

    stage_dir = str(tmp_path_factory.mktemp("inc_cdc_stage"))
    INC.commit_stage(C.stage_convs(turns), stage_dir, n_buckets=4)
    inc = INC.curate_incremental(
        spark, updated, affected, stage_dir, n_buckets=4
    )
    full = C.build_corpus(updated)
    pd.testing.assert_frame_equal(_corpus_pdf(inc), _corpus_pdf(full))


def test_cdc_detects_deleted_conversation(spark, turns, tmp_path_factory):
    """A conversation deleted upstream emits nothing in the append feed —
    the affected set must still name it (old-side diff of changed
    buckets) and the incremental run must drop it, matching full
    recompute."""
    out = str(tmp_path_factory.mktemp("inc_del"))
    M.run_extraction_job_atomic(spark, turns, out, n_buckets=4)
    v1 = M.load_manifest(out)["version"]

    vid = turns.select("conv_id").orderBy("conv_id").limit(1).collect()[0][0]
    shrunk = turns.filter(F.col("conv_id") != vid)
    M.run_extraction_job_atomic(spark, shrunk, out, n_buckets=4)

    affected = INC.affected_convs_from_cdc(spark, out, v1)
    got = {r["conv_id"] for r in affected.collect()}
    assert vid in got, "deleted conversation missing from the CDC set"

    stage_dir = str(tmp_path_factory.mktemp("inc_del_stage"))
    INC.commit_stage(C.stage_convs(turns), stage_dir, n_buckets=4)
    inc = INC.curate_incremental(
        spark, shrunk, affected, stage_dir, n_buckets=4
    )
    assert inc.filter(F.col("conv_id") == vid).count() == 0
    full = C.build_corpus(shrunk)
    pd.testing.assert_frame_equal(_corpus_pdf(inc), _corpus_pdf(full))
    stage = M.read_results(spark, stage_dir)
    assert stage.filter(F.col("conv_id") == vid).count() == 0


def test_incremental_bootstrap_from_absent_stage(
    spark, turns, tmp_path_factory
):
    """curate_incremental over a never-committed stage catalog must
    bootstrap cleanly (empty old stage in the STAGE schema, not the
    extraction-schema fallback that would fail the column select) and
    equal a full build over the affected set."""
    base_dir = str(tmp_path_factory.mktemp("inc_boot"))
    affected = turns.select("conv_id").distinct()
    inc = INC.curate_incremental(
        spark, turns, affected, f"{base_dir}/stage",
        rates=dict(C.SAMPLE_RATES), n_buckets=4,
    )
    full = C.build_corpus(turns, rates=dict(C.SAMPLE_RATES))
    pd.testing.assert_frame_equal(_corpus_pdf(inc), _corpus_pdf(full))
