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
