"""Benchmark decontamination (operators/textstats.py::decontaminate)."""

from pyspark.sql import functions as F

from marie_icr_spark.operators.textstats import decontaminate


def _frames(spark):
    docs = spark.createDataFrame(
        [
            # 8+ shared tokens with the benchmark → contaminated
            (1, "the quick brown fox jumps over the lazy dog every day"),
            # shares only a 7-gram prefix → clean at n=8
            (2, "the quick brown fox jumps over the sleepy cat tonight"),
            (3, "completely unrelated text with no overlap at all here now"),
            (4, "short"),  # fewer than n tokens → no grams, clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "question: the quick brown fox jumps over the lazy dog every")],
        "doc_id long, text string",
    )
    return docs, bench


def test_decontaminate_flags_planted_overlap(spark):
    docs, bench = _frames(spark)
    got = {
        r["doc_id"]: (r["contaminated_ngrams"], r["contaminated"])
        for r in decontaminate(docs, bench, n=8).collect()
    }
    assert got[1][1] and got[1][0] >= 1
    assert got[2] == (0, False)  # 7-gram overlap is below the n=8 test
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    # every input doc gets a row (left join, no drops)
    assert set(got) == {1, 2, 3, 4}


def test_decontaminate_broadcast_off_same_result(spark):
    docs, bench = _frames(spark)
    a = sorted(map(tuple, decontaminate(docs, bench, n=8).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(
                docs, bench, n=8, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b


def test_decontaminate_plan_broadcasts_benchmark(spark):
    docs, bench = _frames(spark)
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# -- token-window chunking ----------------------------------------------------

def test_chunk_documents_windows_and_overlap(spark):
    from marie_icr_spark.operators.textstats import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, max_tokens=4, overlap=2).collect()
    }
    # doc 1: 10 tokens, stride 2 -> ceil((10-2)/2)=4 chunks
    assert got[(1, 0)][0] == "w0 w1 w2 w3"
    assert got[(1, 1)][0] == "w2 w3 w4 w5"  # 2-token overlap
    assert got[(1, 3)] == ("w6 w7 w8 w9", 4)
    assert (1, 4) not in got
    # short doc: one (short) chunk
    assert got[(2, 0)] == ("a b", 2)
    # empty doc: exactly one chunk (DuckDB ws-token twin yields [''])
    assert got[(3, 0)][1] == 1


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from marie_icr_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


# -- sequence packing ---------------------------------------------------------

def test_pack_sequences_straddles_and_covers(spark):
    from pyspark.sql import functions as F

    from marie_icr_spark.operators.textstats import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, " ".join(["a"] * 5)),   # before=0,  n=5  -> pack 0
            (2, " ".join(["b"] * 6)),   # before=5,  n=6  -> packs 0,1 (3+3)
            (3, " ".join(["c"] * 2)),   # before=11, n=2  -> pack 1
            (4, ""),                    # before=13, n=1  -> pack 1
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["pack_id"], r["doc_id"]): (r["start_tok"], r["n_toks"])
        for r in pack_sequences(docs, ctx=8, bucket_size=2).collect()
    }
    assert rows == {
        (0, 1): (0, 5),
        (0, 2): (0, 3),   # first 3 tokens of doc 2 finish pack 0
        (1, 2): (3, 3),   # remaining 3 straddle into pack 1
        (1, 3): (0, 2),
        (1, 4): (0, 1),
    }
    # conservation: every doc's tokens are fully assigned exactly once
    tot = (
        pack_sequences(docs, ctx=8, bucket_size=2)
        .groupBy("doc_id").agg(F.sum("n_toks").alias("s"))
        .collect()
    )
    assert {r["doc_id"]: r["s"] for r in tot} == {1: 5, 2: 6, 3: 2, 4: 1}


def test_pack_sequences_rejects_string_ids(spark):
    import pytest as _pytest

    from marie_icr_spark.operators.textstats import pack_sequences

    df = spark.createDataFrame([("conv-1", "a b c")], "doc_id string, text string")
    with _pytest.raises(TypeError, match="integral"):
        pack_sequences(df, ctx=8)
