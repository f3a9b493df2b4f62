"""Golden tests for the composite template-matching contract
(extractors/templatematch.py), pinning the reference semantics:
meta n-gram windows + Levenshtein threshold
(meta_template_matching.py:100-237), greedy label-aware dedup (:214-236),
composite break_on_match (composite_template_maching.py:99-101), and
GREEDYNMM/IOS postprocess (base.py:379-395)."""

import random

import pytest

from marie_icr_spark.extractors import templatematch as G


def _grid(words_by_line):
    """Build (words, lines, boxes) with the synthetic layout geometry
    (x = 9·char_offset, y = 20·line, w = 9·len, h = 16)."""
    words, lines, boxes = [], [], []
    for ln, ws in enumerate(words_by_line):
        x = 0
        for w in ws:
            words.append(w)
            lines.append(ln)
            boxes.append([x, ln * 20, 9 * len(w), 16])
            x += 9 * (len(w) + 1)
    return words, lines, boxes


def _lev_ref(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        ndp = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            ndp[j] = min(dp[j] + 1, ndp[j - 1] + 1, dp[j - 1] + (ca != cb))
        dp = ndp
    return dp[len(b)]


def test_lev_batch_matches_reference_dp():
    rng = random.Random(7)
    alpha = "abcd "
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15))),
        )
        for _ in range(300)
    ] + [("", ""), ("abc", ""), ("", "xy"), ("same", "same")]
    got = G.lev_batch([a for a, _ in pairs], [b for _, b in pairs])
    assert got.tolist() == [_lev_ref(a, b) for a, b in pairs]


SEL = [G.Selector("lab_ms", "merge sortt", 2)]


def test_meta_fuzzy_threshold_is_strict():
    # "MERGE SORT" vs "MERGE SORTT": d=1, maxlen=11 → round3 = 0.909 > 0.9
    words, lines, boxes = _grid([["merge", "sort", "agg"]])
    preds = G.match_frame_meta(words, lines, boxes, SEL)
    assert [(p["text"], p["score"]) for p in preds] == [("MERGE SORT", 0.909)]
    # exactly at the threshold → rejected (strict >):
    # "AAAAAAAAA" (9) vs "AAAAAAAAAB" (10): d=1 → 0.9, not > 0.9
    s2 = [G.Selector("lab", "aaaaaaaaab", 1)]
    preds = G.match_frame_meta(*_grid([["aaaaaaaaa"]]), s2)
    assert preds == []


def test_meta_exact_match_kept_even_without_threshold():
    s = [G.Selector("lab", "agg agg", 1)]
    preds = G.match_frame_meta(*_grid([["agg", "agg"]]), s)
    assert len(preds) == 1 and preds[0]["score"] == 1.0


def test_meta_same_line_rule():
    # bigram split across two lines is skipped
    s = [G.Selector("lab", "merge sortt", 1)]
    preds = G.match_frame_meta(*_grid([["agg", "merge"], ["sort", "agg"]]), s)
    assert preds == []


def test_meta_ngram_clipping():
    # n0=2 → window sizes {1,2,3} clipped to the word count
    words, lines, boxes = _grid([["merge"]])
    cands = G.meta_candidates(words, lines, boxes, SEL)
    assert {c["n"] for c in cands} == {1}


def test_min_template_len_gate():
    s = [G.Selector("lab", "ab", 1)]  # < 3 chars → selector skipped
    assert G.match_frame_meta(*_grid([["ab"]]), s) == []


def test_greedy_dedup_order_and_label_awareness():
    # same label: first candidate in (ngram, start) order wins, the
    # overlapping later one is dropped; a dropped candidate does not
    # block subsequent ones
    cands = [
        {"label": "a", "box": [0, 0, 10, 10]},
        {"label": "a", "box": [5, 5, 10, 10]},   # overlaps #1 → dropped
        {"label": "a", "box": [20, 0, 5, 5]},    # clear → kept
        {"label": "b", "box": [0, 0, 10, 10]},   # other label → kept
    ]
    kept = G.greedy_dedup(cands)
    assert [c["box"] for c in kept] == [[0, 0, 10, 10], [20, 0, 5, 5],
                                        [0, 0, 10, 10]]


def test_prefix_matcher_score_and_window_size():
    s = [G.Selector("lab_fs", "fast sm", 2)]
    words, lines, boxes = _grid([["fast", "small", "agg"]])
    preds = G.match_frame_prefix(words, lines, boxes, s)
    assert len(preds) == 1
    p = preds[0]
    assert p["text"] == "FAST SMALL"
    assert p["score"] == G.round3(7 / 10)
    # non-prefix window rejected
    preds = G.match_frame_prefix(*_grid([["fas", "small"]]), s)
    assert preds == []


def test_greedy_nmm_merges_ios_over_half_same_label_only():
    preds = [
        {"label": "a", "box": [0, 0, 10, 10], "score": 0.95},
        {"label": "a", "box": [2, 2, 10, 10], "score": 0.99},  # IOS 0.64
        {"label": "a", "box": [30, 0, 5, 5], "score": 0.93},
        {"label": "b", "box": [0, 0, 10, 10], "score": 0.91},
    ]
    out = sorted(
        G.greedy_nmm(preds), key=lambda m: (m["label"], m["box"])
    )
    assert out == [
        {"label": "a", "box": [0, 0, 12, 12], "score": 0.99, "n_merged": 2},
        {"label": "a", "box": [30, 0, 5, 5], "score": 0.93, "n_merged": 1},
        {"label": "b", "box": [0, 0, 10, 10], "score": 0.91, "n_merged": 1},
    ]


def test_greedy_nmm_threshold_strict():
    # IOS exactly 0.5 must NOT merge
    preds = [
        {"label": "a", "box": [0, 0, 10, 10], "score": 0.9},
        {"label": "a", "box": [5, 0, 10, 10], "score": 0.8},  # IOS = 0.5
    ]
    assert len(G.greedy_nmm(preds)) == 2


def test_composite_break_on_match_routes_per_unit():
    sels = [
        G.Selector("lab_ms", "merge sortt", 2),
        G.Selector("lab_fs", "fast sm", 2),
    ]
    # unit 1: meta fires (merge sort) → prefix skipped, fast small NOT found
    f1 = [(0, *_grid([["merge", "sort", "fast", "small"]]))]
    out = G.composite_match_unit(f1, sels, break_on_match=True)
    assert {p["label"] for p in out} == {"lab_ms"}
    # unit 2: no meta match anywhere → prefix fallback fires
    f2 = [(0, *_grid([["fast", "small", "agg"]]))]
    out = G.composite_match_unit(f2, sels, break_on_match=True)
    assert {p["label"] for p in out} == {"lab_fs"}
    # no break: both fire on unit 1's frame
    out = G.composite_match_unit(f1, sels, break_on_match=False)
    assert {p["label"] for p in out} == {"lab_ms", "lab_fs"}


def test_composite_nmm_merges_duplicate_meta_prefix_hits():
    sels = [G.Selector("lab_vv", "value value", 2)]
    frames = [(0, *_grid([["value", "value", "agg"]]))]
    out = G.composite_match_unit(frames, sels, break_on_match=False)
    # meta exact + prefix exact at the same box → one merged pred, n=2
    assert len(out) == 1 and out[0]["n_merged"] == 2
    assert out[0]["score"] == 1.0


@pytest.mark.parametrize("seed", range(5))
def test_greedy_dedup_invariant_no_same_label_overlaps(seed):
    rng = random.Random(seed)
    cands = [
        {
            "label": rng.choice("ab"),
            "box": [rng.randint(0, 30), rng.randint(0, 30),
                    rng.randint(1, 15), rng.randint(1, 15)],
        }
        for _ in range(40)
    ]
    kept = G.greedy_dedup(cands)
    for i, a in enumerate(kept):
        for b in kept[i + 1:]:
            if a["label"] == b["label"]:
                assert not G._is_overlap(a["box"], b["box"])


def test_lev_projection_matches_duckdb_bytes():
    """Non-ASCII codepoints project to the 0x1A sentinel on both sides, so
    DuckDB's byte-based levenshtein over the same regex projection equals
    lev_batch exactly — the cross-engine contract for unicode text."""
    import duckdb

    pairs = [
        ("CAFÉ X", "CAFE X"),
        ("日本語 TEXT", "NIHONGO TEXT"),
        ("naïve café", "naive cafe"),
        ("ÀÉÎ", "AEI"),
        ("ÀÉÎ", "ÜÖß"),  # distinct non-ASCII compare EQUAL (pinned)
        ("plain ascii", "plain ascii"),
        ("", "É"),
    ]
    got = G.lev_batch([a for a, _ in pairs], [b for _, b in pairs]).tolist()
    con = duckdb.connect()
    for (a, b), d in zip(pairs, got):
        sql = con.execute(
            "SELECT levenshtein("
            "regexp_replace($1, '[^\\x00-\\x7F]', chr(26), 'g'),"
            "regexp_replace($2, '[^\\x00-\\x7F]', chr(26), 'g'))",
            [a, b],
        ).fetchone()[0]
        assert d == sql, (a, b, d, sql)
    # the pinned quantization: all non-ASCII are one equivalence class
    assert got[4] == 0
    # and char-length denominators are unchanged by projection
    assert G.meta_sims(["CAFÉ X"], ["CAFE X"])[0] == G.round3(1 - 1 / 6)


def test_canon_upper_matches_duckdb_simple_case_map():
    """canon_upper (project non-ASCII → sentinel, THEN upper) equals
    DuckDB's ``upper(regexp_replace(...))`` byte-for-byte, including on
    codepoints where Python's FULL case map diverges from DuckDB's SIMPLE
    one: ß (Python SS / DuckDB ẞ), the ﬁ ligature (Python FI / DuckDB
    unchanged), ŉ (Python ʼN).  Projecting first removes the divergence
    and makes the case map length-preserving — the template oracle's
    window lengths, equality tests, and prefix tests all rely on this."""
    import duckdb

    cases = [
        "straße",
        "ﬁle ﬂow",      # ligatures
        "ŉgram",         # U+0149, full map expands to ʼN
        "İstanbul",      # dotted capital I
        "Mixed ASCII only",
        "",
        "ǰunk ﬆring",
    ]
    con = duckdb.connect()
    for s in cases:
        sql = con.execute(
            "SELECT upper(regexp_replace($1, '[^\\x00-\\x7F]', chr(26), 'g'))",
            [s],
        ).fetchone()[0]
        got = G.canon_upper(s)
        assert got == sql, (s, got, sql)
        assert len(got) == len(s)  # 1:1 — length-preserving


@pytest.mark.parametrize("seed", range(8))
def test_pruned_enumeration_equals_full_after_scoring(seed):
    """The length-bound pushdown is invisible after scoring: for random
    frames (including non-monotone line sequences and non-ASCII words like
    straße, which canon_upper projects 1:1 — no length change),
    score_meta_candidates over the pruned enumerator
    equals the same over the full enumerator, in the same order."""
    rng = random.Random(seed)
    vocab = ["merge", "sortt", "sort", "value", "group", "x", "straße",
             "windowpane", "fast", "sm", "q"]
    nw = rng.randint(0, 25)
    words = [rng.choice(vocab) for _ in range(nw)]
    # deliberately non-monotone lines to exercise the line-change counter
    lines = [rng.randint(0, 3) for _ in range(nw)]
    boxes = [[rng.randint(0, 200), rng.randint(0, 80),
              rng.randint(1, 90), 16] for _ in range(nw)]
    sels = list(G.DEFAULT_SELECTORS) + [G.Selector("lab_str", "STRASSE", 1)]
    for thr in (0.9, 0.5):
        full = G.score_meta_candidates(
            G.meta_candidates(words, lines, boxes, sels), thr)
        pruned = G.score_meta_candidates(
            G.meta_candidates_pruned(words, lines, boxes, sels, thr), thr)
        assert pruned == full
