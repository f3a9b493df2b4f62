"""Golden asserts for voting policies — ports the exact-expectation style of
the reference's tests/core/test_voting.py:20-47 to DataFrame operators."""

import pytest

from marie_icr_spark.operators.voting import (
    class_majority_vote,
    max_score_pick,
    word_majority_vote,
)

SCHEMA = "page int, classification string, score double, classifier string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_majority_clear_winner(spark):
    # two of three agree → winner, score = round(avg of winner scores, 4)
    df = _df(spark, [
        (0, "invoice", 0.9, "a"), (0, "invoice", 0.7, "b"), (0, "letter", 0.99, "c"),
    ])
    r = _one(class_majority_vote(df, ["page"], "classification", "score"))
    assert r["classification"] == "invoice"
    assert r["vote_score"] == pytest.approx(0.8)
    assert r["n_candidates"] == 3


def test_majority_tie_abstain(spark):
    df = _df(spark, [(0, "invoice", 0.9, "a"), (0, "letter", 0.8, "b")])
    r = _one(class_majority_vote(df, ["page"], "classification", "score", "abstain"))
    assert r["classification"] is None
    assert r["vote_score"] == 0.0


def test_majority_tie_best(spark):
    df = _df(spark, [(0, "invoice", 0.9, "a"), (0, "letter", 0.8, "b")])
    r = _one(class_majority_vote(df, ["page"], "classification", "score", "best"))
    assert r["classification"] == "invoice"
    assert r["vote_score"] == pytest.approx(0.9)


def test_majority_tie_best_with_diff_close(spark):
    df = _df(spark, [(0, "invoice", 0.85, "a"), (0, "letter", 0.80, "b")])
    r = _one(class_majority_vote(
        df, ["page"], "classification", "score", "best_with_diff", max_diff=0.1))
    assert r["classification"] == "invoice"
    assert r["vote_score"] == pytest.approx(0.85)


def test_majority_tie_best_with_diff_far_abstains(spark):
    df = _df(spark, [(0, "invoice", 0.95, "a"), (0, "letter", 0.5, "b")])
    r = _one(class_majority_vote(
        df, ["page"], "classification", "score", "best_with_diff", max_diff=0.1))
    assert r["classification"] is None
    assert r["vote_score"] == 0.0


def test_majority_tie_best_with_diff_top2_same_class(spark):
    # Reference BEST_WITH_DIFF diffs the top-2 INDIVIDUAL candidates of the
    # tied classes — both may sit in one class. invoice has 0.90 and 0.88
    # (diff 0.02 < 0.1) while letter's max is far below: the reference
    # returns invoice@0.90; diffing per-class maxes (0.90 vs 0.50) would
    # wrongly abstain.
    df = _df(spark, [
        (0, "invoice", 0.90, "a"), (0, "invoice", 0.88, "b"),
        (0, "letter", 0.50, "c"), (0, "letter", 0.10, "d"),
    ])
    r = _one(class_majority_vote(
        df, ["page"], "classification", "score", "best_with_diff", max_diff=0.1))
    assert r["classification"] == "invoice"
    assert r["vote_score"] == pytest.approx(0.90)


def test_single_result_short_circuit(spark):
    df = _df(spark, [(0, "invoice", 0.42, "a")])
    r = _one(class_majority_vote(df, ["page"], "classification", "score"))
    assert r["classification"] == "invoice"
    assert r["vote_score"] == pytest.approx(0.42)


def test_max_score_pick(spark):
    df = _df(spark, [(0, "x", 0.3, "a"), (0, "y", 0.9, "b"), (0, "z", 0.9, "c")])
    r = _one(max_score_pick(df, ["page"], "classification", "score"))
    # deterministic tie-break: value asc among equal scores
    assert r["picked"] == "y" and r["best_score"] == pytest.approx(0.9)


def test_word_majority_vote_and_fallback(spark):
    # word 1: three engines, two agree; word 2: all disagree → max-confidence
    df = spark.createDataFrame(
        [
            (1, "cat", 0.8), (1, "cat", 0.6), (1, "cot", 0.99),
            (2, "dog", 0.5), (2, "dag", 0.9), (2, "dug", 0.7),
        ],
        "word_id int, text string, confidence double",
    )
    rows = {r["word_id"]: r for r in
            word_majority_vote(df, ["word_id"], "text", "confidence").collect()}
    assert rows[1]["voted"] == "cat" and rows[1]["votes"] == 2
    assert rows[1]["vote_confidence"] == pytest.approx(0.7)
    assert rows[2]["voted"] == "dag"  # min_vote_count unmet → best single
    assert rows[2]["vote_confidence"] == pytest.approx(0.9)
    # the fallback row reports the RETURNED candidate's own vote count —
    # not the majority winner's (dag has exactly 1 vote)
    assert rows[2]["votes"] == 1


def test_vote_extractions_across_strategies(spark):
    from marie_icr_spark.operators.voting import vote_extractions

    def eng(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, extracted_text string, span_count int"
        )

    # turn 0: engines 1+2 agree; turn 1: all disagree → densest single wins
    e1 = eng([("c", 0, "hello world", 2), ("c", 1, "alpha", 1)])
    e2 = eng([("c", 0, "hello world", 2), ("c", 1, "beta beta", 2)])
    e3 = eng([("c", 0, "hello wurld", 2), ("c", 1, "gamma", 1)])
    out = {r["turn_idx"]: r for r in vote_extractions([e1, e2, e3]).collect()}
    assert out[0]["voted"] == "hello world" and out[0]["votes"] == 2
    assert out[1]["voted"] == "beta beta"  # fallback: max confidence
