"""Connected components / dedup grouping."""

from marie_icr_spark.operators.components import connected_components, dedup_groups


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    out = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert out[1] == out[2] == out[3] == out[4] == 1
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == 20


def test_dedup_groups_on_jaccard_pairs(spark):
    """Compose: corpus near-dup pairs → canonical survivor per group."""
    from marie_icr_spark.operators.dedup import jaccard_pairs
    from marie_icr_spark.queries_ext import _corpus

    pairs = jaccard_pairs(_corpus(spark, "/root/testdata/sf0.001"), 0.5)
    groups = dedup_groups(pairs).collect()
    assert groups, "corpus construction guarantees near-dup pairs"
    for r in groups:
        assert r["keep_id"] <= r["doc_id"]
        # canonical id is always an original document id (< 1e6 offsets)
    keeps = {r["keep_id"] for r in groups}
    assert all(k < 1_000_000 for k in keeps)


def test_reliable_checkpoint_mode(spark, tmp_path):
    """With a checkpoint dir configured, rounds use reliable checkpoint()
    (executor-loss-safe on a real cluster); results identical."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = {
        r["vertex"]: r["component"]
        for r in connected_components(
            edges, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    assert spark.sparkContext.getCheckpointDir() is not None


def test_no_self_inflicted_warning_after_reliable_calls(spark, tmp_path):
    """Two reliable calls with different dirs, then a bare call: the
    'checkpoint dir set but checkpoint_dir not passed' warning must NOT
    fire — every dir the operator itself installed (including the
    UUID-resolved 'restore' path) is tracked as self-set."""
    import warnings

    edges = spark.createDataFrame([(1, 2), (7, 8)], "id_a long, id_b long")
    connected_components(
        edges, checkpoint_dir=str(tmp_path / "ck_a")
    ).count()
    connected_components(
        edges, checkpoint_dir=str(tmp_path / "ck_b")
    ).count()
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        assert connected_components(edges).count() == 4


def test_long_chain_converges(spark):
    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_shingle_twin_equivalence(spark):
    """The pandas-UDF shingle path must match the Column form
    (shingles(ws_tokens(col))) byte-for-byte — incl. Spark trim (spaces
    only), Java \\s collapse, empty/short texts, and distinct order."""
    from pyspark.sql import functions as F

    from marie_icr_spark.functions.columns import shingles, ws_tokens
    from marie_icr_spark.operators.dedup import shingle_sets

    rows = [
        (1, "a b c d e f"),
        (2, "  leading and trailing  "),
        (3, "tab\tand\nnewline\fand\rcr collapse  runs"),
        (4, "dup a dup a dup a dup a"),          # repeated shingles
        (5, ""),                                  # empty
        (6, "one two"),                           # shorter than n
        (7, "\tstarts with java-ws not space"),   # trim is SPACE-only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = {r["did"]: r["sh"] for r in shingle_sets(df).collect()}
    slow = {
        r["did"]: r["sh"]
        for r in df.select(
            F.col("doc_id").alias("did"),
            shingles(ws_tokens(F.col("text")), 3).alias("sh"),
        ).collect()
    }
    assert fast == slow


def test_repetition_counts_twin_equivalence(spark):
    """The vectorized repetition counter must match the Column form
    (ngrams + array_distinct over ws_tokens) on every edge the shingle
    twin pins — tokenize quirks, empty text, texts shorter than n."""
    from pyspark.sql import functions as F

    from marie_icr_spark.functions.columns import ngrams, ws_tokens
    from marie_icr_spark.operators.textstats import _py_repetition_counts

    rows = [
        (1, "a b c d e f"),
        (2, "  leading and trailing  "),
        (3, "tab\tand\nnewline\fand\rcr collapse  runs"),
        (4, "dup a dup a dup a dup a"),
        (5, ""),
        (6, "one two"),
        (7, "\tstarts with java-ws not space"),
        (8, "x x x x x x x x x x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = ws_tokens(F.col("text"))
    exprs = []
    for n in (1, 2, 3):
        grams = toks if n == 1 else ngrams(toks, n)
        exprs += [
            F.size(grams).cast("long"),
            F.size(F.array_distinct(grams)).cast("long"),
        ]
    slow = {
        r["doc_id"]: [max(v, 0) for v in r["c"]]
        for r in df.select("doc_id", F.array(*exprs).alias("c")).collect()
    }
    fast = {i: _py_repetition_counts(t) for i, t in rows}
    assert fast == slow


def test_cc_materializes_edges_once(spark):
    """The symmetrized edge set is checkpointed before the round loop, so
    the edge frame's upstream is evaluated exactly once per call — NOT once
    per round (regression guard for the round-multiplied pair-generation
    cost found in round 6)."""
    from pyspark.sql import functions as F

    from marie_icr_spark.operators.components import connected_components

    acc = spark.sparkContext.accumulator(0)

    def count_rows(pdfs):
        for pdf in pdfs:
            acc.add(len(pdf))
            yield pdf

    # a 12-vertex chain needs several propagation rounds even with pointer
    # jumping, so a per-round recomputation would multiply the accumulator
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    ).mapInPandas(count_rows, "id_a long, id_b long")

    labels = {
        r["vertex"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert labels == {v: 0 for v in range(12)}
    # one evaluation of the 11-row upstream (the sym checkpoint); a
    # per-round recompute would make this a multiple of 11
    assert acc.value == 11
