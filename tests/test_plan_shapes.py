"""Physical-plan regression guards: the scale properties PLANS.md promises
must survive refactors — zero-shuffle extraction, parquet pushdown/pruning,
and no nested-loop/cartesian joins in any pair generator."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extract_turns_is_zero_shuffle(spark):
    from marie_icr_spark.operators.extraction import extract_turns
    from marie_icr_spark.sources.transcripts import transcripts_from_docs

    plan = _plan(extract_turns(transcripts_from_docs(spark, SF_DIR)))
    assert "Exchange" not in plan, "extraction hot path must not shuffle"


def test_parquet_scan_prunes_columns_and_pushes_filters(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("doc_id") < 100).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in plan
    # projection reaches the reader: text column must NOT be read
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200]


def test_assemble_is_two_phase_not_global_window(spark):
    from marie_icr_spark.operators.assembly import assemble_conversations
    from marie_icr_spark.operators.extraction import extract_turns
    from marie_icr_spark.sources.transcripts import transcripts_from_docs

    plan = _plan(
        assemble_conversations(
            extract_turns(transcripts_from_docs(spark, SF_DIR))
        )
    )
    assert plan.count("Exchange") <= 3  # two hash-agg phases (+AQE reads)
    assert "Window" not in plan, "reassembly must not sort whole conversations"


def test_xy_cut_reorder_is_zero_shuffle(spark):
    from marie_icr_spark.queries_readorder import q_xy_cut_order

    plan = _plan(q_xy_cut_order(spark, SF_DIR))
    assert "Exchange" not in plan, "W9 reorder is per-page; must not shuffle"


def test_pdf_pack_single_shuffle(spark):
    from marie_icr_spark import queries_ext as X

    plan = _plan(X.q_pdf_pack(spark, SF_DIR))
    assert plan.count("Exchange") <= 1  # one groupBy(conv_id) collect
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", [
    "jaccard_pairs", "minhash_lsh_pairs", "emb_near_dup", "ann_batch_topk",
    "dedup_exact",
])
def test_no_cartesian_or_nested_loop_in_pair_generators(spark, name):
    import __spark_entry__ as E

    plan = _plan(E.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_pipeline_equi_joins_only(spark):
    """The curation pipeline composes only equi-joins (broadcast or
    shuffle) — no cartesian/nested-loop anywhere in the composition."""
    from marie_icr_spark.plans.corpus import SAMPLE_RATES, build_corpus
    from marie_icr_spark.sources.transcripts import transcripts_from_docs

    plan = _plan(
        build_corpus(
            transcripts_from_docs(spark, SF_DIR), rates=dict(SAMPLE_RATES)
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_no_cartesian(spark):
    from marie_icr_spark.queries import ALL_QUERIES

    plan = _plan(ALL_QUERIES["decontaminate"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
