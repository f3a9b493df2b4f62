"""Subword tokenization + sliding-window inference stage (N1/N3 depth).

The Spark twin of the reference's tokenize→window→model loop
(``marie/executor/ner/ner_extraction_executor.py:192-374``: pretrained
subword tokenizer, ``max_length=512, stride=128`` overflowing windows,
subword→word realignment): one Arrow-batched ``mapInPandas`` pass per
document emits one row per sliding window with the exact input_ids a
model consumes, the subword→word alignment (``word_ids``), an
order-sensitive fingerprint certifying the id sequence, and — when a
weight file is supplied — the integer linear head's per-window
classification (same ``linear-v1`` format as
:class:`~.inference.NumpyLinearClassifier`).

Scale shape: tokenization is embarrassingly parallel per document — zero
shuffle, no driver round-trip; the vocab (a few hundred pieces) and the
weight matrix ride the task closure. At 10^12 documents this is a single
narrow map over the corpus scan, exactly like the extraction boundary.

Golden contract: ``extractors.subword`` (pure Python, no Spark) — the
DuckDB oracle replays it from the same vocab file via a recursive CTE.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractors.subword import (
    CLS_ID,
    MAX_LENGTH,
    SEP_ID,
    STRIDE,
    WordPieceTokenizer,
    default_vocab_path,
    load_vocab,
    window_fingerprint,
    window_spans,
)


def tokenize_windows(
    df: DataFrame,
    vocab_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_length: int = MAX_LENGTH,
    stride: int = STRIDE,
    weights_path: str | None = None,
) -> DataFrame:
    """Documents → one row per sliding subword window.

    Output columns: ``id_col`` (passthrough), ``window_idx``,
    ``n_windows``, ``n_tokens`` (content tokens, excluding [CLS]/[SEP]),
    ``window_fp`` (rolling hash over the content id sequence),
    ``input_ids`` ([CLS] + content ids + [SEP] — length n_tokens + 2),
    ``word_ids`` (aligned to input_ids; -1 for the specials — the F5
    first-subword mask is ``word_ids[i] != word_ids[i-1]``), and, when
    ``weights_path`` is given, ``label``/``score``/``raw_best``/
    ``raw_total`` from the linear head over hashed-id bucket counts
    (bucket = id mod vocab_buckets; specials excluded).

    Documents with zero content tokens emit no rows (pinned in the
    golden contract).
    """
    window_spans(1, max_length, stride)  # validate params eagerly
    vocab = load_vocab(vocab_path or default_vocab_path())
    tok = WordPieceTokenizer.from_vocab(vocab)

    head = None
    if weights_path is not None:
        import json

        import numpy as np

        with open(weights_path) as f:
            spec = json.load(f)
        if spec.get("format") != "linear-v1":
            raise ValueError(
                f"unsupported weight format {spec.get('format')!r}"
            )
        labels = sorted(spec["labels"])
        head = (
            labels,
            int(spec["vocab_buckets"]),
            np.array([spec["weights"][lb] for lb in labels], dtype=np.int64),
            np.array([spec["bias"][lb] for lb in labels], dtype=np.int64),
        )

    in_schema = df.select(id_col, text_col).schema
    id_ddl = in_schema[0].dataType.simpleString()
    out_ddl = (
        f"{id_col} {id_ddl}, window_idx int, n_windows int, n_tokens int, "
        "window_fp long, input_ids array<int>, word_ids array<int>"
    )
    if head is not None:
        out_ddl += ", label string, score double, raw_best long, raw_total long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[tuple] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ids, wids = tok.encode_text(text or "")
                spans = window_spans(len(ids), max_length, stride)
                nw = len(spans)
                for k, (s, e) in enumerate(spans):
                    content = ids[s:e]
                    row = (
                        did, k, nw, e - s,
                        window_fingerprint(content),
                        [CLS_ID, *content, SEP_ID],
                        [-1, *wids[s:e], -1],
                    )
                    if head is not None:
                        labels, nb, W, bias = head
                        x = np.bincount(
                            np.asarray(content, dtype=np.int64) % nb,
                            minlength=nb,
                        )
                        raws = W @ x + bias
                        tot = int(raws.sum())
                        bi = int(raws.argmax())  # first max = label asc
                        raw = int(raws[bi])
                        score = (
                            math.floor(raw / tot * 1_000_000 + 0.5)
                            / 1_000_000
                            if tot
                            else 0.0
                        )
                        row = (*row, labels[bi], score, raw, tot)
                    rows.append(row)
            cols = [
                id_col, "window_idx", "n_windows", "n_tokens", "window_fp",
                "input_ids", "word_ids",
            ]
            if head is not None:
                cols += ["label", "score", "raw_best", "raw_total"]
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(run, out_ddl)


def subword_token_counts(
    df: DataFrame,
    vocab_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_subword): the document's total subword token count —
    the sizing input for subword-exact packing. One scalar pandas UDF,
    zero shuffle."""
    from pyspark.sql import types as T

    vocab = load_vocab(vocab_path or default_vocab_path())
    tok = WordPieceTokenizer.from_vocab(vocab)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.IntegerType())
    def cnt(texts):
        return texts.map(lambda t: len(tok.encode_text(t or "")[0]))

    return df.select(F.col(id_col), cnt(F.col(text_col)).alias("n_subword"))


def pack_subword(
    df: DataFrame,
    ctx: int = 512,
    vocab_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
) -> DataFrame:
    """Subword-exact GPT-style sequence packing: the concat-then-chunk
    layout of ``textstats.pack_sequences``, but sized by the REAL subword
    token counts a model trains on (vocab-file-driven WordPiece) instead
    of whitespace counts — the end-to-end tokenize→pack composition of a
    training-data pipeline. Output: (pack_id, ``id_col``, start_tok
    — offset into the doc's subword stream, n_toks). Docs with zero
    subword tokens (empty text) emit no rows."""
    from .textstats import pack_counted

    counts = subword_token_counts(df, vocab_path, text_col, id_col)
    return pack_counted(
        counts, ctx=ctx, id_col=id_col, count_col="n_subword",
        bucket_size=bucket_size,
    )
