"""Model-stage API (N1/N3), routing registry (J6), composite entities (N8)."""

from pyspark.sql import functions as F

from marie_icr_spark.operators.composite import group_composite_entities
from marie_icr_spark.operators.inference import (
    StubLinearClassifier,
    TextClassifierStage,
    route_subclassifiers,
)


def test_stub_model_is_deterministic_and_normalized():
    m = StubLinearClassifier(["a", "b"])
    p1, p2 = m(["hello world"]), m(["hello world"])
    assert p1 == p2
    assert p1[0]["label"] in ("a", "b")
    assert 0.0 <= p1[0]["score"] <= 1.0
    assert p1[0]["raw"] <= p1[0]["total"]


def test_stage_swappable_predict_fn(spark):
    """The stage is pluggable: any list[str] -> list[dict] model slots in —
    the HF-pipeline shape (transformers.py:196-215) without the weights."""
    df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")

    def fake(texts):
        return [
            {"label": f"L{t}", "score": 1.0, "raw": 1, "total": 1} for t in texts
        ]

    out = {
        r["doc_id"]: r["label"]
        for r in TextClassifierStage(["L"], predict_fn=fake).transform(df).collect()
    }
    assert out == {1: "Lx", 2: "Ly"}


def test_routing_registry_exact_and_unmatched_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id long, text string",
    )
    primary = spark.createDataFrame(
        [(1, "invoice"), (2, "letter"), (3, "invoice")],
        "doc_id long, label string",
    )
    registry = {
        "sub_invoice": {
            "filter": {"type": "exact", "pattern": "invoice"},
            "stage": TextClassifierStage(["paid", "unpaid"]),
        }
    }
    rows = route_subclassifiers(primary, docs, registry).collect()
    assert {r["doc_id"] for r in rows} == {1, 3}  # letter doc dropped
    for r in rows:
        assert r["classifier"] == "sub_invoice"
        assert r["primary_label"] == "invoice"
        assert r["sub_label"] in ("paid", "unpaid")


def test_composite_line_gap_split(spark):
    spans = spark.createDataFrame(
        [
            (1, 1, "name", "john", 0, 0, 36, 16, 0.1),
            (1, 1, "name", "doe", 50, 0, 27, 16, 0.3),
            (1, 4, "addr", "main st", 0, 60, 63, 16, 0.7),
            (1, 2, "other", "xx", 0, 20, 18, 16, 0.5),
        ],
        "doc_id long, line_no int, label string, span_text string,"
        " x int, y int, w int, h int, score double",
    )
    out = group_composite_entities(
        spans, [{"name": "contact", "entities": ["name", "addr"]}], max_line_diff=2
    ).collect()
    by_gid = {r["group_id"]: r for r in out}
    assert len(by_gid) == 2  # line gap 1→4 exceeds max_line_diff=2
    assert by_gid[1]["text"] == "john doe"
    assert by_gid[1]["labels"] == "name"
    assert by_gid[2]["text"] == "main st"
    # envelope bbox of group 1 spans x 0..77
    assert (by_gid[1]["x"], by_gid[1]["w"]) == (0, 77)


# -- NumpyLinearClassifier: real-weights load + vectorized predict ----------

def test_numpy_classifier_matches_manual_math():
    import json
    import math

    from marie_icr_spark.operators.inference import (
        NumpyLinearClassifier,
        _token_bucket,
        _ws_tokens_py,
        default_weights_path,
    )

    clf = NumpyLinearClassifier(default_weights_path())
    with open(default_weights_path()) as f:
        spec = json.load(f)
    texts = ["total amount due now", "", "the the the", "report report annual"]
    preds = clf(texts)
    assert len(preds) == len(texts)
    for t, p in zip(texts, preds):
        raws = {}
        for lab in clf.labels:
            w = spec["weights"][lab]
            raws[lab] = spec["bias"][lab] + sum(
                w[_token_bucket(tok)] for tok in _ws_tokens_py(t)
            )
        best = max(raws.values())
        lab = min(k for k, v in raws.items() if v == best)
        total = sum(raws.values())
        assert p["label"] == lab
        assert p["raw"] == raws[lab]
        assert p["total"] == total
        assert p["score"] == math.floor(raws[lab] / total * 1e6 + 0.5) / 1e6


def test_numpy_classifier_rejects_bad_fixture(tmp_path):
    import json

    import pytest as _pytest

    from marie_icr_spark.operators.inference import NumpyLinearClassifier

    bad = tmp_path / "w.json"
    bad.write_text(json.dumps({"format": "linear-v2"}))
    with _pytest.raises(ValueError, match="unsupported weight format"):
        NumpyLinearClassifier(str(bad))
    bad.write_text(
        json.dumps(
            {
                "format": "linear-v1",
                "labels": ["a"],
                "vocab_buckets": 8,
                "weights": {"a": [1] * 8},
                "bias": {"a": 0},
            }
        )
    )
    with _pytest.raises(ValueError, match="vocab_buckets"):
        NumpyLinearClassifier(str(bad))


def test_numpy_classifier_through_stage(spark):
    from marie_icr_spark.operators.inference import (
        NumpyLinearClassifier,
        TextClassifierStage,
        default_weights_path,
    )

    clf = NumpyLinearClassifier(default_weights_path())
    df = spark.createDataFrame(
        [(1, "invoice total due"), (2, "dear sir"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            TextClassifierStage(clf.labels, predict_fn=clf)
            .transform(df).collect()}
    assert set(rows) == {1, 2, 3}
    local = {1: clf(["invoice total due"])[0], 2: clf(["dear sir"])[0],
             3: clf([""])[0]}
    for d, p in local.items():
        assert rows[d]["label"] == p["label"]
        assert rows[d]["score"] == p["score"]
        assert rows[d]["raw_best"] == p["raw"]
        assert rows[d]["raw_total"] == p["total"]
