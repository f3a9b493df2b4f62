"""Subword tokenizer + sliding-window contract tests (N1/N3 depth).

Pins the golden contract of extractors/subword.py — greedy longest-match
from the vocab FILE, per-char [UNK] fail-soft, the reference's
max_length=512/stride=128 window math — and the Spark operator's
window rows, alignment and head output."""

import pytest

from marie_icr_spark.extractors.subword import (
    CLS_ID,
    SEP_ID,
    UNK_ID,
    WordPieceTokenizer,
    default_vocab_path,
    load_vocab,
    window_fingerprint,
    window_spans,
)


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.from_vocab(load_vocab(default_vocab_path()))


def test_vocab_pins_specials():
    v = load_vocab(default_vocab_path())
    assert v["[PAD]"] == 0 and v["[UNK]"] == 1
    assert v["[CLS]"] == CLS_ID and v["[SEP]"] == SEP_ID


def test_greedy_longest_match(tok):
    v = load_vocab(default_vocab_path())
    # 'the' is a word-initial piece: one token, not t-h-e
    assert tok.encode_word("the") == [v["the"]]
    # 'there' → the + ##re (longest-first at pos 0, continuation after)
    assert tok.encode_word("there") == [v["the"], v["##re"]]
    # continuation pieces differ from word-initial: 'xthe' → x + ##the
    assert tok.encode_word("xthe") == [v["x"], v["##the"]]
    # single chars always cover alnum words (no [UNK] on clean text)
    assert UNK_ID not in tok.encode_word("zzqqkk")


def test_unk_per_char_fail_soft(tok):
    v = load_vocab(default_vocab_path())
    # '@' has no piece: [UNK] consumes ONE char, the rest still tokenizes
    assert tok.encode_word("@the") == [UNK_ID, v["##the"]]
    assert tok.encode_word("a@b") == [v["a"], UNK_ID, v["##b"]]
    assert tok.encode_word("@@") == [UNK_ID, UNK_ID]
    assert tok.encode_word("") == []


def test_encode_text_word_alignment(tok):
    ids, wids = tok.encode_text("  the   there ")
    assert len(ids) == len(wids)
    assert wids == [0, 1, 1]  # the | the ##re
    # the PINNED whitespace contract: \xa0 is NOT a separator (ASCII \s
    # only, matching the oracle's _TOKENS_SQL) — it stays inside the word
    # and tokenizes through the [UNK] fail-soft path
    ids2, wids2 = tok.encode_text("a\xa0b")
    assert wids2 == [0, 0, 0] and ids2[1] == UNK_ID
    # first-subword mask (F5): one True per word
    first = [i == 0 or wids[i] != wids[i - 1] for i in range(len(wids))]
    assert sum(first) == 2


def test_window_spans_reference_contract():
    # the reference's 512/128: C=510, step=382
    assert window_spans(0) == []
    assert window_spans(510) == [(0, 510)]
    assert window_spans(511) == [(0, 510), (382, 511)]
    spans = window_spans(2000)
    assert spans[0] == (0, 510)
    # consecutive windows overlap by exactly stride tokens
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 - s1 == 128 or e1 == 2000 and e0 - s1 >= 128
        assert s1 - s0 == 510 - 128
    assert spans[-1][1] == 2000
    # every token covered
    cover = set()
    for s, e in spans:
        cover |= set(range(s, e))
    assert cover == set(range(2000))
    with pytest.raises(ValueError):
        window_spans(10, max_length=2)
    with pytest.raises(ValueError):
        window_spans(10, max_length=64, stride=62)


def test_window_fingerprint_order_sensitive():
    assert window_fingerprint([]) == 0
    assert window_fingerprint([1, 2]) != window_fingerprint([2, 1])
    assert window_fingerprint([0]) == 1  # id+1 distinguishes [PAD] from empty


def test_tokenize_windows_operator(spark):
    from pyspark.sql import functions as F

    from marie_icr_spark.operators.inference import default_weights_path
    from marie_icr_spark.operators.tokenizer import tokenize_windows

    docs = spark.createDataFrame(
        [(1, "the " * 100), (2, "a"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = tokenize_windows(
        docs, max_length=64, stride=16,
        weights_path=default_weights_path(),
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 tokens > C=62 → ceil((100-62)/46)+1 = 2 windows
    w1 = sorted(by_doc[1], key=lambda r: r["window_idx"])
    assert [r["window_idx"] for r in w1] == [0, 1]
    assert all(r["n_windows"] == 2 for r in w1)
    assert w1[0]["n_tokens"] == 62 and w1[1]["n_tokens"] == 100 - 46
    # input_ids wrap content with CLS/SEP; word_ids align with -1 specials
    assert w1[0]["input_ids"][0] == CLS_ID
    assert w1[0]["input_ids"][-1] == SEP_ID
    assert len(w1[0]["input_ids"]) == w1[0]["n_tokens"] + 2
    assert w1[0]["word_ids"][0] == -1 and w1[0]["word_ids"][-1] == -1
    # overlap: last `stride` content ids of w0 == first of w1
    assert w1[0]["input_ids"][-17:-1] == w1[1]["input_ids"][1:17]
    # single-token and empty docs
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 1
    assert 3 not in by_doc and 4 not in by_doc  # zero tokens → no rows
    # head output present and deterministic
    assert all(r["label"] in ("invoice", "letter", "report") for r in out)
    assert all(r["raw_total"] >= r["raw_best"] > 0 for r in out)

    # zero-shuffle plan: tokenization is a single narrow map
    plan = (
        tokenize_windows(docs, max_length=64, stride=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    # fingerprint matches the pure-Python twin on a sampled row
    ids = w1[0]["input_ids"][1:-1]
    assert window_fingerprint(list(ids)) == w1[0]["window_fp"]


def test_pack_subword_exact_coverage(spark):
    """Subword-exact packing: every subword token lands in exactly one
    pack slice, packs fill to ctx except the last, and zero-token docs
    emit nothing."""
    from marie_icr_spark.extractors.subword import (
        WordPieceTokenizer,
        default_vocab_path,
        load_vocab,
    )
    from marie_icr_spark.operators.tokenizer import pack_subword

    tok = WordPieceTokenizer.from_vocab(load_vocab(default_vocab_path()))
    texts = ["the there", "spark stream table " * 7, "", "a", "query row"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ctx = 16
    out = pack_subword(docs, ctx=ctx, bucket_size=2).collect()

    counts = {i: len(tok.encode_text(t)[0]) for i, t in enumerate(texts)}
    assert counts[2] == 0
    assert {r["doc_id"] for r in out} == {
        i for i, n in counts.items() if n > 0
    }
    # per-doc slices cover the doc exactly (contiguous, in pack order)
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: (r["pack_id"], r["start_tok"]))
        covered = sum(r["n_toks"] for r in rows)
        assert covered == counts[did], (did, covered, counts[did])
        assert rows[0]["start_tok"] == 0
        for a, b in zip(rows, rows[1:]):
            assert b["start_tok"] == a["start_tok"] + a["n_toks"]
    # every pack except the last is exactly full
    per_pack = {}
    for r in out:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_toks"]
    last = max(per_pack)
    for pid, tot in per_pack.items():
        assert tot == ctx or pid == last, (pid, tot)
    assert sum(per_pack.values()) == sum(counts.values())


def test_whitespace_class_cross_engine_exact():
    """The tokenizer's ASCII-\\s class must agree with BOTH engines'
    tokenization: Spark ws_tokens uses Java \\s ([ \\t\\n\\x0b\\f\\r])
    and the oracle SQL spells the same class out (RE2's \\s lacks \\x0b
    — the latent divergence this test pins closed)."""
    import duckdb

    from marie_icr_spark.extractors.subword import _ASCII_WS
    from marie_icr_spark.functions.columns import WS_TOKENS_SQL

    hostile = "a\x0bb\tc\nd\fe\rf g\xa0h"
    py = _ASCII_WS.sub(" ", hostile.strip(" ")).split(" ")
    sql = duckdb.sql(
        "SELECT " + WS_TOKENS_SQL.format(e="'" + hostile + "'")
    ).fetchall()[0][0]
    assert list(sql) == py == ["a", "b", "c", "d", "e", "f", "g\xa0h"]
