"""Reading-order reconstruction over layout turns (SURVEY §2.5 W9 —
LayoutReader transposition; golden contract:
``extractors/readingorder.py``, reference
``marie/document/layoutreader/text_layout.py:133-231``).

Plan shape: turns are independent pages, so the whole reorder runs
inside ONE Arrow-batched ``mapInPandas`` over the extraction structs —
zero shuffle, linear in executors, per-task memory bounded by the Arrow
batch (8192 turns × ≤~100 word structs).  At 100 TB the cost is the scan
plus a narrow Python stage; no grouping, no skew surface (the
``max_len`` fail-open also bounds the per-page O(rounds·n log n) cut to
``MAX_REORDER_LEN`` words, exactly like the reference's guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..extractors import readingorder as G

RESULT_DDL = (
    "conv_id string, turn_idx int, pos int, word_index int, "
    "word_text string, cx int, cy int"
)


def xy_cut_reading_order(extracted: DataFrame) -> DataFrame:
    """One row per word in reading order: ``pos`` is the reading
    position, ``word_index`` the original grid index, ``(cx, cy)`` the
    word's top-left in the two-column projection (original coordinates
    for pages the ``max_len`` guard refuses to reorder — the reference
    returns those pages untouched)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for conv_id, turn_idx, words in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["words"]
            ):
                ws = sorted(words, key=lambda w: w["word_index"])
                lines = [w["line"] for w in ws]
                boxes = [list(w["box"]) for w in ws]
                xyxy = G.two_column_geometry(lines, boxes)
                order, reordered = G.xy_cut_order(xyxy)
                order = G.complete_order(order, len(ws))
                for pos, i in enumerate(order):
                    w = ws[i]
                    cx, cy = (
                        (xyxy[i][0], xyxy[i][1])
                        if reordered
                        else (w["box"][0], w["box"][1])
                    )
                    rows.append(
                        (
                            conv_id,
                            int(turn_idx),
                            pos,
                            int(w["word_index"]),
                            w["text"],
                            int(cx),
                            int(cy),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id",
                    "turn_idx",
                    "pos",
                    "word_index",
                    "word_text",
                    "cx",
                    "cy",
                ],
            )

    return extracted.select("conv_id", "turn_idx", "words").mapInPandas(
        run, schema=RESULT_DDL
    )
