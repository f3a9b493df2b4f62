"""Composite template/selector matching over layout turns (SURVEY §2.8
B10, deep form — the shallow line-anchor form lives in
``template_match.py``).

Spark-side wrapper around the pure-Python golden contract in
``extractors/templatematch.py`` (the DuckDB-oracle twin; see its module
docstring for the reference-line citations:
``marie/components/template_matching/meta_template_matching.py``,
``composite_template_maching.py``, ``document_matched.py:162-221``,
``base.py:379-395``).

Plan shape (designed for the 10^12-turn scale):

* ``break_on_match=False`` (the default composite and the meta matcher)
  is **per-frame** work: every turn row already carries its own word
  structs, so the whole match runs inside one Arrow-batched
  ``mapInPandas`` with ZERO shuffle — candidate windows are generated per
  frame but Levenshtein scoring is batched across the entire Arrow batch
  (one vectorized numpy DP per batch, not per window).
* ``break_on_match=True`` needs the unit (conversation) as the routing
  scope — whether the fallback matcher runs depends on every frame of the
  conv — so it is one ``groupBy(conv_id).applyInPandas`` (a single
  hash-partition shuffle of the *layout turns only*, pre-projected to
  three columns).  Conversation sizes are bounded by the transcript
  bursting contract (turn_idx < CONV span), so there is no hot-key risk;
  a conv with pathologically many frames would bound at the frame-burst
  cap long before the shuffle skews.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..extractors import templatematch as G

RESULT_DDL = (
    "conv_id string, turn_idx int, label string, matched_text string, "
    "x int, y int, w int, h int, score double, n_merged int"
)


def _frame_arrays(words_cell) -> tuple[list, list, list]:
    """(words, lines, boxes) for one turn's word structs, in word_index
    (reading) order."""
    ws = sorted(words_cell, key=lambda w: w["word_index"])
    return (
        [w["text"] for w in ws],
        [w["line"] for w in ws],
        [list(w["box"]) for w in ws],
    )


def _score_batch(per_frame_cands: list[list[dict]], threshold: float):
    """Batch the Levenshtein DP across every frame's meta candidates in the
    Arrow batch, then apply the golden module's keep rule per frame (the
    formula/rule live ONLY in extractors.templatematch)."""
    flat = [c for cands in per_frame_cands for c in cands]
    if not flat:
        return [[] for _ in per_frame_cands]
    sims = iter(
        G.meta_sims(
            [c["text"] for c in flat], [c["tmpl"] for c in flat]
        )
    )
    out = []
    for cands in per_frame_cands:
        kept = []
        for c in cands:
            sim = next(sims)
            if G.meta_keep(c["text"], c["tmpl"], sim, threshold):
                kept.append({**c, "score": sim})
        out.append(kept)
    return out


def _rows(conv_id, turn_idx, preds, with_text: bool):
    for p in preds:
        b = p["box"]
        yield (
            conv_id,
            turn_idx,
            p["label"],
            p["text"] if with_text else None,
            b[0],
            b[1],
            b[2],
            b[3],
            p["score"],
            p.get("n_merged"),
        )


def _result_df(rows_iter) -> "pd.DataFrame":  # noqa: F821
    import pandas as pd

    return pd.DataFrame(
        rows_iter,
        columns=[
            "conv_id",
            "turn_idx",
            "label",
            "matched_text",
            "x",
            "y",
            "w",
            "h",
            "score",
            "n_merged",
        ],
    )


def meta_match_turns(
    extracted: DataFrame,
    selectors: list[G.Selector] | None = None,
    threshold: float = G.DEFAULT_SCORE_THRESHOLD,
) -> DataFrame:
    """Meta (n-gram Levenshtein) matcher over layout turns: one prediction
    row per accepted candidate after the label-aware greedy dedup."""
    sel = list(selectors or G.DEFAULT_SELECTORS)

    def run(batches):
        for pdf in batches:
            frames = [
                _frame_arrays(w) for w in pdf["words"]
            ]
            cands = [
                G.meta_candidates_pruned(ws, ls, bs, sel, threshold)
                for ws, ls, bs in frames
            ]
            scored = _score_batch(cands, threshold)
            rows = []
            for conv, ti, kept in zip(pdf["conv_id"], pdf["turn_idx"], scored):
                rows.extend(_rows(conv, ti, G.greedy_dedup(kept), True))
            yield _result_df(rows)

    return extracted.select("conv_id", "turn_idx", "words").mapInPandas(
        run, RESULT_DDL
    )


def composite_match_turns(
    extracted: DataFrame,
    selectors: list[G.Selector] | None = None,
    break_on_match: bool = False,
    threshold: float = G.DEFAULT_SCORE_THRESHOLD,
) -> DataFrame:
    """Composite [meta, prefix] matcher + per-frame GREEDYNMM merge.

    ``break_on_match=False`` runs shuffle-free per frame;
    ``break_on_match=True`` groups by conversation (the reference's run
    unit) so the prefix fallback fires only for convs where meta found
    nothing anywhere."""
    sel = list(selectors or G.DEFAULT_SELECTORS)
    src = extracted.select("conv_id", "turn_idx", "words")

    if not break_on_match:

        def run(batches):
            for pdf in batches:
                frames = [_frame_arrays(w) for w in pdf["words"]]
                cands = [
                    G.meta_candidates_pruned(ws, ls, bs, sel, threshold)
                    for ws, ls, bs in frames
                ]
                scored = _score_batch(cands, threshold)
                rows = []
                for (ws, ls, bs), kept, conv, ti in zip(
                    frames, scored, pdf["conv_id"], pdf["turn_idx"]
                ):
                    preds = G.greedy_dedup(kept) + G.match_frame_prefix(
                        ws, ls, bs, sel
                    )
                    rows.extend(_rows(conv, ti, G.greedy_nmm(preds), False))
                yield _result_df(rows)

        return src.mapInPandas(run, RESULT_DDL)

    def run_group(pdf):
        frames = [
            (int(ti), *_frame_arrays(w))
            for ti, w in zip(pdf["turn_idx"], pdf["words"])
        ]
        conv = pdf["conv_id"].iloc[0]
        preds = G.composite_match_unit(frames, sel, True, threshold)
        return _result_df(
            (conv, p["frame_index"], p["label"], None, *p["box"],
             p["score"], p["n_merged"])
            for p in preds
        )

    return src.groupBy("conv_id").applyInPandas(run_group, RESULT_DDL)


def best_per_selector(
    results: DataFrame, selectors: list[G.Selector] | None = None
) -> DataFrame:
    """Per-unit anchor sets: top ``selector.top_k`` predictions per
    (conv, label) by score (tiebreak turn_idx, y, x asc — pinned), the
    ``max_objects`` cut of ``document_matched.py:198``."""
    sel = list(selectors or G.DEFAULT_SELECTORS)
    topk = F.create_map(
        *[x for s in sel for x in (F.lit(s.label), F.lit(s.top_k))]
    )
    w = Window.partitionBy("conv_id", "label").orderBy(
        F.col("score").desc(),
        F.col("turn_idx").asc(),
        F.col("y").asc(),
        F.col("x").asc(),
    )
    return (
        results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk[F.col("label")])
        .select(
            "conv_id", "turn_idx", "label", "x", "y", "w", "h", "score",
            "rank",
        )
    )
