"""Deterministic hashed-embedding family: Python-twin pins, exact integer
ranking, and plan-shape guards for the distributed top-k."""

import duckdb
import pytest

from marie_icr_spark.functions.columns import HASH_P
from marie_icr_spark.operators.embeddings import (
    DIMS,
    _hash31,
    _py_tokens,
    py_embed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash31_matches_duckdb():
    for s in ("", "a", "emb:foo bar baz", "sgn:x", "héllo wörld"):
        got = duckdb.sql(
            "SELECT (list_reduce(list_transform(string_split(substr(md5(?)"
            ",1,15),''), c -> CAST(strpos('0123456789abcdef', c) - 1 AS "
            f"BIGINT)), (a,b) -> a*16 + b) % {HASH_P})",
            params=[s],
        ).fetchone()[0]
        assert _hash31(s) == got, s


def test_tokens_strip_spaces_only():
    # trim() in Spark/DuckDB strips spaces, not tabs — the twin must too
    assert _py_tokens("\tfoo bar") == ["", "foo", "bar"]
    assert _py_tokens("  foo \n bar  ") == ["foo", "bar"]
    assert _py_tokens("") == [""]
    assert _py_tokens(None) == [""]


def test_py_embed_shapes_and_edges():
    assert py_embed("") == [0.0] * DIMS
    assert py_embed("one two") == [0.0] * DIMS  # < ngram tokens
    v = py_embed("one two three")
    assert len(v) == DIMS and sum(abs(x) for x in v) == 1.0
    # multiplicity: a repeated gram doubles its (signed) contribution
    v2 = py_embed("one two three one two three one two three")
    # grams: 7 grams total, the 'one two three' gram appears 3 times
    assert sum(abs(x) for x in v2) >= 1.0
    assert all(float(x).is_integer() for x in v2)


def test_embed_rows_matches_python_twin(spark):
    from marie_icr_spark.operators.embeddings import embed_rows

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, "x y z x y z")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in embed_rows(df).collect()}
    for did, text in ((1, "alpha beta gamma delta"), (2, ""), (3, "x y z x y z")):
        exp = py_embed(text)
        assert list(rows[did]["embedding"]) == exp
        assert rows[did]["norm_sq"] == int(sum(x * x for x in exp))


def test_embed_topk_exact_and_no_nested_loop(spark):
    from marie_icr_spark.operators.embeddings import embed_rows, embed_topk

    df = spark.createDataFrame(
        [
            (i, f"tok{i % 3} tok{(i + 1) % 3} tok{(i + 2) % 3} common suffix run")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    corpus = embed_rows(df)
    probes = [
        (int(r["doc_id"]), list(r["embedding"]))
        for r in corpus.filter("doc_id < 2").collect()
    ]
    out = embed_topk(corpus, probes, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = out.collect()
    assert {r["probe_id"] for r in got} == {0, 1}
    for r in got:
        assert r["hit_id"] != r["probe_id"]
    # exact ranking: brute-force in python
    emb = {r["doc_id"]: list(r["embedding"]) for r in corpus.collect()}
    for pid in (0, 1):
        dots = sorted(
            (
                (-int(sum(a * b for a, b in zip(emb[pid], emb[d]))), d)
                for d in emb
                if d != pid
            ),
        )[:3]
        exp = [(d, -nd) for nd, d in dots]
        got_p = [
            (r["hit_id"], r["dot"])
            for r in sorted(got, key=lambda r: r["rank"])
            if r["probe_id"] == pid
        ]
        assert got_p == exp


def test_embed_topk_empty_probes(spark):
    """No probes → empty result frame (not a per-task matmul crash)."""
    from marie_icr_spark.operators.embeddings import embed_rows, embed_topk

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    out = embed_topk(embed_rows(df), [], k=3)
    assert out.columns == ["probe_id", "hit_id", "dot", "rank"]
    assert out.count() == 0
