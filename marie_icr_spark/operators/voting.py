"""Ensemble voting operators as distributed hash aggregations.

Re-expresses the reference's voting stack — word-level majority voting across
OCR engines (``marie/ocr/voting_ocr_engine.py:186-254``), max-confidence
candidate pick (``voting_ocr_engine.py:156-184``) and page-classification
``MajorityVoter``/``MaxScoreVoter`` with ``abstain``/``best``/
``best_with_diff`` tie policies (``marie/pipe/voting.py:63-233``) — as
groupBy + window aggregations (partial/map-side combine comes free from
Catalyst; no driver-side loops).

Determinism note: where the reference's tie behavior depends on Python dict /
list iteration order, we pin a total order (vote count desc, score desc,
value asc) so results are stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.columns import round_half_up

TIE_ABSTAIN = "abstain"
TIE_BEST = "best"
TIE_BEST_WITH_DIFF = "best_with_diff"


def word_majority_vote(
    df: DataFrame,
    key_cols: list[str],
    candidate_col: str,
    confidence_col: str,
    min_vote_count: int = 2,
) -> DataFrame:
    """Per key, the candidate with the most votes; ties broken by summed
    confidence then candidate text (voting_ocr_engine.py:186-254). Groups
    whose winner has fewer than ``min_vote_count`` votes fall back to the
    single highest-confidence candidate (:246-254 → max-confidence pick).

    Output: key_cols + (voted, votes, vote_confidence).
    """
    grouped = df.groupBy(*key_cols, candidate_col).agg(
        F.count(F.lit(1)).alias("votes"),
        F.sum(confidence_col).alias("conf_sum"),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("votes").desc(), F.col("conf_sum").desc(), F.col(candidate_col).asc()
    )
    ranked = grouped.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)

    # fallback: below the vote threshold, pick max-confidence single candidate
    wmax = Window.partitionBy(*key_cols).orderBy(
        F.col(confidence_col).desc(), F.col(candidate_col).asc()
    )
    # the fallback row must report the RETURNED candidate's own vote count
    # — pairing the max-confidence text with the majority winner's count
    # would let a consumer thresholding on `votes` miscount its support
    wcnt = Window.partitionBy(*key_cols, candidate_col)
    maxconf = (
        df.withColumn("_cand_votes", F.count(F.lit(1)).over(wcnt))
        .withColumn("_rm", F.row_number().over(wmax))
        .filter(F.col("_rm") == 1)
        .select(*key_cols, F.col(candidate_col).alias("_best_single"),
                F.col(confidence_col).alias("_best_conf"),
                F.col("_cand_votes").alias("_best_votes"))
    )
    majority = F.col("votes") >= min_vote_count
    return (
        ranked.join(maxconf, key_cols)
        .select(
            *key_cols,
            F.when(majority, F.col(candidate_col))
            .otherwise(F.col("_best_single"))
            .alias("voted"),
            F.when(majority, F.col("votes"))
            .otherwise(F.col("_best_votes"))
            .alias("votes"),
            round_half_up(
                F.when(majority, F.col("conf_sum") / F.col("votes"))
                .otherwise(F.col("_best_conf")),
                4,
            ).alias("vote_confidence"),
        )
    )


def max_score_pick(
    df: DataFrame, key_cols: list[str], value_col: str, score_col: str
) -> DataFrame:
    """Per key, the candidate with the highest score (MaxScoreVoter /
    max-confidence pick, voting_ocr_engine.py:156-184); deterministic
    tie-break on value asc. Output: key_cols + (picked, best_score)."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(score_col).desc(), F.col(value_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *key_cols,
            F.col(value_col).alias("picked"),
            F.col(score_col).alias("best_score"),
        )
    )


def class_majority_vote(
    df: DataFrame,
    key_cols: list[str],
    class_col: str,
    score_col: str,
    tie_break: str = TIE_ABSTAIN,
    max_diff: float = 0.1,
) -> DataFrame:
    """MajorityVoter semantics (marie/pipe/voting.py:63-148): per key, the
    class with the most votes; winner score = round(avg of winner candidate
    scores, 4). On a vote tie:

      abstain        → NULL class, score 0.0
      best           → highest-scoring candidate among tied classes
      best_with_diff → top candidate if top-2 scores differ < max_diff,
                       else abstain

    Output: key_cols + (classification, vote_score, n_candidates).
    """
    aggs = [
        F.count(F.lit(1)).alias("votes"),
        round_half_up(F.avg(score_col), 4).alias("avg_score"),
        F.max(score_col).alias("max_score"),
    ]
    if tie_break == TIE_BEST_WITH_DIFF:
        # second-highest individual score within the class (null if only one
        # candidate); list is bounded by the ensemble size, never
        # corpus-sized — only best_with_diff needs it
        aggs.append(
            F.get(
                F.sort_array(F.collect_list(F.col(score_col)), asc=False), 1
            ).alias("_s2c")
        )
    per_class = df.groupBy(*key_cols, class_col).agg(*aggs)
    wk = Window.partitionBy(*key_cols)
    stats = (
        per_class.withColumn("_max_votes", F.max("votes").over(wk))
        .withColumn(
            "_tied",
            F.sum(F.when(F.col("votes") == F.col("_max_votes"), 1).otherwise(0)).over(wk),
        )
        .withColumn("_n_cand", F.sum("votes").over(wk))
    )
    winners = stats.filter(F.col("votes") == F.col("_max_votes"))
    worder = Window.partitionBy(*key_cols).orderBy(
        F.col("max_score").desc(), F.col(class_col).asc()
    )
    ranked = winners.withColumn("_rn", F.row_number().over(worder)).withColumn(
        "_second_score", F.lead("max_score").over(worder)
    )
    top = ranked.filter(F.col("_rn") == 1)

    if tie_break == TIE_ABSTAIN:
        cls = F.when(F.col("_tied") > 1, F.lit(None)).otherwise(F.col(class_col))
        score = F.when(F.col("_tied") > 1, F.lit(0.0)).otherwise(F.col("avg_score"))
    elif tie_break == TIE_BEST:
        cls = F.col(class_col)
        score = F.when(F.col("_tied") > 1, F.col("max_score")).otherwise(
            F.col("avg_score")
        )
    elif tie_break == TIE_BEST_WITH_DIFF:
        # Reference (marie/pipe/voting.py BEST_WITH_DIFF) sorts the INDIVIDUAL
        # candidates of all tied classes and diffs the top two — which may
        # both belong to one class. The global top candidate is the top
        # class's max_score (classes are ranked by max_score); the global
        # second is max(second-in-top-class, next class's max).
        top2 = F.when(F.col("_s2c").isNull(), F.col("_second_score")).otherwise(
            F.greatest(F.col("_s2c"), F.col("_second_score"))
        )
        close = F.abs(F.col("max_score") - top2) < max_diff
        keep = (F.col("_tied") <= 1) | close
        cls = F.when(keep, F.col(class_col)).otherwise(F.lit(None))
        score = F.when(F.col("_tied") > 1, F.when(close, F.col("max_score")).otherwise(F.lit(0.0))).otherwise(F.col("avg_score"))
    else:
        raise ValueError(f"unknown tie_break {tie_break!r}")

    return top.select(
        *key_cols,
        cls.alias("classification"),
        round_half_up(score, 4).alias("vote_score"),
        F.col("_n_cand").cast("long").alias("n_candidates"),
    )


def vote_extractions(
    outputs: list[DataFrame],
    key_cols: list[str] = ("conv_id", "turn_idx"),
    text_col: str = "extracted_text",
    min_vote_count: int = 2,
) -> DataFrame:
    """Ensemble the per-turn text of several extraction strategies.

    The 'best' engine of the reference runs multiple OCR engines and
    majority-votes the results (voting_ocr_engine.py:424-471, engine registry
    marie/ocr/util.py:89-151). Each input DataFrame is one strategy's
    extraction output; candidates vote per turn with confidence = span_count
    (denser extraction wins ties), falling back to the highest-confidence
    single candidate below the vote threshold.

    Output: key_cols + (voted, votes, vote_confidence).
    """
    from functools import reduce

    key_cols = list(key_cols)
    candidates = reduce(
        lambda a, b: a.unionByName(b),
        [
            df.select(*key_cols, text_col, F.col("span_count").cast("double").alias("_conf"))
            for df in outputs
        ],
    )
    return word_majority_vote(
        candidates, key_cols, text_col, "_conf", min_vote_count=min_vote_count
    )
