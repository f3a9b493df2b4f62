"""End-to-end training-corpus curation pipeline over transcripts.

One declarative plan chains the engine's certified operators into the
pipeline a large-scale LLM-data run needs (the reference's pipeline stages
feed archived docs through extract → classify → store one job at a time,
``/root/reference/marie/pipe/extract_pipeline.py``; here the corpus shape
is the product):

    extraction → conversation assembly → quality gate → language ID →
    exact dedup → near-dup survivors (inverted-index Jaccard + connected
    components) → stratified hash sampling

Every stage is pure Column algebra or an already-scale-audited operator
(PLANS.md): the only shuffles are the assembly two-phase agg, the dedup
joins, and the component rounds — no new scan shapes. The result commits
through the atomic catalog (``plans.manifest.commit_table``) from the CLI
(``jobs/run_corpus_pipeline.py``), and the whole composition is
hash-certified against DuckDB by the ``corpus_pipeline`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pinned defaults — replayed verbatim by the corpus_pipeline oracle
MIN_QUALITY = 0.5
JACCARD_THRESHOLD = 0.5
SAMPLE_RATES = {"en": 0.6, "und": 1.0}
SAMPLE_DEFAULT_RATE = 0.3
SAMPLE_SALT = "sample:v1"


def build_corpus(
    transcripts: DataFrame,
    min_quality: float = MIN_QUALITY,
    jaccard_threshold: float | None = JACCARD_THRESHOLD,
    rates: dict[str, float] | None = None,
    default_rate: float = SAMPLE_DEFAULT_RATE,
    sample_salt: str = SAMPLE_SALT,
    mode: str = "sparse",
    persist_handles: list | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Transcripts → curated conversation corpus.

    Output: (conv_id, conversation_text, turn_count, n_tokens, quality,
    pred_lang). ``jaccard_threshold=None`` skips the near-dup stage;
    ``rates=None`` skips sampling (rates are per ``pred_lang``).
    ``persist_handles``: pass a list to receive the frames this pipeline
    persists (see below) — the caller can ``unpersist()`` exactly those
    after materializing the result, without touching other session cache.
    ``checkpoint_dir``: reliable (executor-loss-safe) checkpoint location
    for the connected-component rounds — pass it on a real cluster; the
    default keeps executor-local checkpoints (fine on local mode).
    """
    convs = stage_convs(transcripts, min_quality=min_quality, mode=mode)

    # the curated frame fans out (dedup group-agg + join, shingle index,
    # survivor anti-join) and the component loop re-derives its edges every
    # round — without a persist the whole extract→assemble→score upstream
    # re-runs once per consumer. Persisting is strictly OPT-IN via
    # persist_handles (the caller owns unpersist; without handles the plan
    # stays pure/lazy — slower to execute, but composable and leak-free).
    persisting = persist_handles is not None
    if persisting:
        from pyspark import StorageLevel

        convs = convs.persist(StorageLevel.MEMORY_AND_DISK)
        persist_handles.append(convs)
        # persist() is lazy: the dedup stages below branch over this frame
        # several times WITHIN one job, and cache blocks only serve tasks
        # that start after they materialize — without forcing, the first
        # job recomputes the upstream once per branch (119s → ~20s at
        # sf0.1). One count() materializes the cache up front.
        convs.count()

    return finalize_corpus(
        convs,
        jaccard_threshold=jaccard_threshold,
        rates=rates,
        default_rate=default_rate,
        sample_salt=sample_salt,
        persist_handles=persist_handles,
        checkpoint_dir=checkpoint_dir,
    )


def stage_convs(
    transcripts: DataFrame,
    min_quality: float = MIN_QUALITY,
    mode: str = "sparse",
) -> DataFrame:
    """The PER-CONVERSATION half of the pipeline: extract → assemble →
    quality gate → language ID. Output = the pre-dedup curated "stage"
    frame (conv_id, conversation_text, turn_count, n_tokens, quality,
    pred_lang). This is the expensive half (Python payload parse), and it
    touches each conversation independently — which is what makes the
    CDC-driven incremental path (``plans.incremental``) possible: only
    affected conversations re-run it."""
    from ..operators.assembly import assemble_conversations
    from ..operators.extraction import extract_turns
    from ..operators.textstats import language_id, quality_score

    convs = assemble_conversations(extract_turns(transcripts, mode=mode))

    q = quality_score(
        convs, text_col="conversation_text", id_cols=("conv_id",)
    ).select("conv_id", "n_tokens", "quality")
    convs = convs.join(q, "conv_id").filter(F.col("quality") >= min_quality)

    lang = language_id(
        convs, text_col="conversation_text", id_cols=("conv_id",)
    ).select("conv_id", "pred_lang")
    return convs.join(lang, "conv_id")


def finalize_corpus(
    convs: DataFrame,
    jaccard_threshold: float | None = JACCARD_THRESHOLD,
    rates: dict[str, float] | None = None,
    default_rate: float = SAMPLE_DEFAULT_RATE,
    sample_salt: str = SAMPLE_SALT,
    persist_handles: list | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The GLOBAL half: exact dedup → near-dup survivors → stratified
    sampling over a stage frame (see :func:`stage_convs`). Deterministic
    in the stage CONTENT alone — which conversations are present and
    their text — so running it over an incrementally-merged stage equals
    running it after a full recompute (the ``corpus_incremental`` oracle
    certifies exactly this)."""
    from ..functions.columns import portable_hash31
    from ..operators.dedup import jaccard_pairs
    from ..operators.textstats import stratified_hash_sample

    persisting = persist_handles is not None

    # exact dedup: smallest conv_id survives per identical text (grouping on
    # the md5, not the full string — the shuffle key stays 32 bytes)
    content = F.md5(F.col("conversation_text"))
    keep = (
        convs.select(content.alias("_m"), "conv_id")
        .groupBy("_m")
        .agg(F.min("conv_id").alias("_keep"))
    )
    convs = (
        convs.withColumn("_m", content)
        .join(keep, "_m")
        .filter(F.col("conv_id") == F.col("_keep"))
        .drop("_m", "_keep")
    )

    if jaccard_threshold is not None:
        from ..operators.components import connected_components

        # vertex ids must be integral for the component rounds; the
        # cross-engine portable hash keeps the min-label choice (and any
        # 31-bit collision) identical in the oracle replay
        ids = convs.withColumn("cid", portable_hash31(F.col("conv_id")))
        pairs = jaccard_pairs(
            ids,
            jaccard_threshold,
            id_col="cid",
            text_col="conversation_text",
            # conversation texts are LONG: shingle construction dominates,
            # so the inverted index must be built once, not once per branch
            persist_handles=persist_handles,
        )
        if persisting:
            from pyspark import StorageLevel

            pairs = pairs.persist(
                StorageLevel.MEMORY_AND_DISK
            )  # reused every CC round
            persist_handles.append(pairs)
        losers = (
            connected_components(pairs, checkpoint_dir=checkpoint_dir)
            .filter(F.col("component") < F.col("vertex"))
            .select(F.col("vertex").alias("cid"))
        )
        convs = ids.join(losers, "cid", "left_anti").drop("cid")

    # rates=None skips sampling; rates={} means "no per-language override,
    # sample everything at default_rate" (a falsy check would silently
    # skip sampling and inflate the corpus 1/default_rate-fold)
    if rates is not None:
        convs = stratified_hash_sample(
            convs,
            rates,
            strata_col="pred_lang",
            key_col="conv_id",
            default_rate=default_rate,
            salt=sample_salt,
        )

    return convs.select(
        "conv_id",
        "conversation_text",
        "turn_count",
        "n_tokens",
        "quality",
        "pred_lang",
    )
