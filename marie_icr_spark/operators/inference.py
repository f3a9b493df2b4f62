"""Pluggable model-inference stage (SURVEY §2.9 N1/N3, §2.3 J6).

Rebuilds the reference's transformer classification stage shape — batch
iterator over documents feeding a text-classification pipeline that tags
each document with ``{label, score, details}``
(``marie/components/document_classifier/transformers.py:33-360``, batch loop
:200-283) — as an Arrow-batched ``mapInPandas`` stage: ``predict_fn`` takes a
list of texts and returns one ``{label, score, raw, total}`` dict per text.
On a GPU cluster ``predict_fn`` is a real HF pipeline; here the default is
:class:`StubLinearClassifier`, a deterministic integer-arithmetic model whose
scores replay exactly in DuckDB SQL (the oracle twin) — the API hole closes
without shipping model weights.

``route_subclassifiers`` is the sub-classifier routing registry
(``marie/pipe/base_pipeline.py:184-216``): per registry entry, rows whose
primary classification matches the entry's exact/regex filter are re-scored
by that entry's stage; matches from all entries union.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator
from functools import lru_cache
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import portable_hash31_py, ws_tokens_py

VOCAB_BUCKETS = 64
WEIGHT_MOD = 1000

# the pinned tokenizer contract lives in functions.columns.ws_tokens_py
# (this module once carried a str.strip() copy that silently diverged
# from the WS_TOKENS_SQL oracles on leading non-space whitespace)
_ws_tokens_py = ws_tokens_py


def stub_weight(label: str, bucket: int) -> int:
    """Pinned pseudo-weight for (label, vocab bucket) — pure function of the
    pair, so Spark, Python and DuckDB agree without shipping a weight file."""
    return portable_hash31_py(f"{label}:{bucket}") % WEIGHT_MOD


@lru_cache(maxsize=1 << 20)
def _token_bucket(tok: str) -> int:
    return portable_hash31_py(tok) % VOCAB_BUCKETS


class StubLinearClassifier:
    """Deterministic text classifier: bag-of-hashed-tokens dotted with pinned
    per-label weights; winner = argmax raw score (ties → label asc);
    score = raw/total rounded 6 (integer sums → cross-engine-exact)."""

    def __init__(self, labels: list[str]):
        if not labels:
            raise ValueError("labels must be non-empty")
        self.labels = list(labels)
        self._w = {
            lab: [stub_weight(lab, b) for b in range(VOCAB_BUCKETS)]
            for lab in self.labels
        }

    def __call__(self, texts: list[str]) -> list[dict[str, Any]]:
        out = []
        for t in texts:
            counts = Counter(
                _token_bucket(tok) for tok in _ws_tokens_py(t or "")
            )
            raws = {
                lab: sum(n * w[b] for b, n in counts.items())
                for lab, w in self._w.items()
            }
            total = sum(raws.values())
            # deterministic argmax: highest raw, then label asc
            best = max(raws.values())
            label = min(lab for lab in self.labels if raws[lab] == best)
            score = (
                math.floor(raws[label] / total * 1_000_000 + 0.5) / 1_000_000
                if total
                else 0.0
            )
            out.append(
                {"label": label, "score": score, "raw": raws[label], "total": total}
            )
        return out


class NumpyLinearClassifier:
    """Real-weights inference path (N3): loads a weight file and predicts
    with one vectorized NumPy matmul per Arrow batch — the same
    load-weights → batch-iterate → pipeline-call shape as the reference's
    transformer classifier (``marie/components/document_classifier/
    transformers.py:33-360``, batch loop :200-283), with the torch model
    replaced by an integer linear head (no torch in this container).

    Weight file format ``linear-v1`` (JSON): ``labels``, ``vocab_buckets``,
    per-label integer ``weights`` (len = vocab_buckets) and ``bias``.
    Features are hashed bag-of-tokens counts (same ``portable_hash31``
    bucketing as the stub), so ``raw = X @ W.T + bias`` is exact int64
    arithmetic and replays verbatim in SQL. Labels are sorted at load so
    argmax-first-index == the argmax-ties-to-label-asc contract.
    """

    def __init__(self, weights_path: str):
        import json

        import numpy as np

        with open(weights_path) as f:
            spec = json.load(f)
        if spec.get("format") != "linear-v1":
            raise ValueError(f"unsupported weight format {spec.get('format')!r}")
        self.labels = sorted(spec["labels"])
        self.vocab_buckets = int(spec["vocab_buckets"])
        self._W = np.array(
            [spec["weights"][lab] for lab in self.labels], dtype=np.int64
        )  # [L, B]
        self._bias = np.array(
            [spec["bias"][lab] for lab in self.labels], dtype=np.int64
        )  # [L]
        if self._W.shape != (len(self.labels), self.vocab_buckets):
            raise ValueError("weight matrix shape mismatch")
        if self.vocab_buckets != VOCAB_BUCKETS:
            # the cached _token_bucket is pinned to the module constant
            raise ValueError(
                f"vocab_buckets {self.vocab_buckets} != engine {VOCAB_BUCKETS}"
            )

    def __call__(self, texts: list[str]) -> list[dict[str, Any]]:
        import numpy as np

        B = self.vocab_buckets
        X = np.zeros((len(texts), B), dtype=np.int64)
        for i, t in enumerate(texts):
            for tok in _ws_tokens_py(t or ""):
                X[i, _token_bucket(tok)] += 1
        raws = X @ self._W.T + self._bias  # [n, L] int64
        totals = raws.sum(axis=1)
        best_idx = raws.argmax(axis=1)  # first max = label asc on ties
        out = []
        for i in range(len(texts)):
            raw = int(raws[i, best_idx[i]])
            total = int(totals[i])
            score = (
                math.floor(raw / total * 1_000_000 + 0.5) / 1_000_000
                if total
                else 0.0
            )
            out.append(
                {
                    "label": self.labels[best_idx[i]],
                    "score": score,
                    "raw": raw,
                    "total": total,
                }
            )
        return out


def default_weights_path() -> str:
    """The checked-in tiny fixture (fixtures/tiny_text_classifier.json)."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures",
        "tiny_text_classifier.json",
    )


class TextClassifierStage:
    """The pluggable inference stage. ``transform`` appends
    (label, score, raw_best, raw_total) to the passthrough columns via one
    Arrow-batched ``mapInPandas`` pass — the Spark twin of the reference's
    ``batch_iterator`` + pipeline call (transformers.py:196-215)."""

    def __init__(
        self,
        labels: list[str],
        predict_fn: Callable[[list[str]], list[dict[str, Any]]] | None = None,
    ):
        self.labels = list(labels)
        self.predict_fn = predict_fn or StubLinearClassifier(labels)

    def transform(
        self,
        df: DataFrame,
        text_col: str = "text",
        passthrough: tuple[str, ...] = ("doc_id",),
    ) -> DataFrame:
        predict = self.predict_fn
        keep = list(passthrough)
        in_schema = df.select(*keep, text_col).schema
        out_ddl = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema if f.name != text_col)
            + ", label string, score double, raw_best long, raw_total long"
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                preds = predict(list(pdf[text_col].fillna("")))
                res = pdf[keep].copy()
                res["label"] = [p["label"] for p in preds]
                res["score"] = [p["score"] for p in preds]
                res["raw_best"] = pd.Series(
                    [p["raw"] for p in preds], dtype="int64"
                )
                res["raw_total"] = pd.Series(
                    [p["total"] for p in preds], dtype="int64"
                )
                yield res

        return df.select(*keep, text_col).mapInPandas(run, out_ddl)


def route_subclassifiers(
    classified: DataFrame,
    source: DataFrame,
    registry: dict[str, dict[str, Any]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-classifier routing (base_pipeline.py:184-216): for each registry
    entry ``{name: {"filter": {"type": "exact"|"regex", "pattern": p},
    "stage": TextClassifierStage}}``, rows of ``classified`` whose ``label``
    matches are re-scored by the entry's stage over ``source``'s text.

    Output: (id_col, primary_label, classifier, sub_label, sub_score) — one
    row per (row, matching registry entry); rows matching no entry are
    dropped, as in the reference (no sub_classifier tag is attached).
    """
    from functools import reduce

    outs = []
    for name, spec in registry.items():
        filt = spec["filter"]
        if filt["type"] == "exact":
            cond = F.col("label") == filt["pattern"]
        elif filt["type"] == "regex":
            cond = F.col("label").rlike(filt["pattern"])
        else:
            raise ValueError(f"unknown filter type {filt['type']!r}")
        matched = classified.filter(cond).select(
            id_col, F.col("label").alias("primary_label")
        )
        subset = matched.join(source.select(id_col, text_col), id_col)
        sub = spec["stage"].transform(
            subset, text_col=text_col, passthrough=(id_col, "primary_label")
        )
        outs.append(
            sub.select(
                id_col,
                "primary_label",
                F.lit(name).alias("classifier"),
                F.col("label").alias("sub_label"),
                F.col("score").alias("sub_score"),
            )
        )
    if not outs:
        raise ValueError("empty registry")
    return reduce(lambda a, b: a.unionByName(b), outs)
