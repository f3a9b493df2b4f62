"""Similarity search over embedding columns.

Brute-force cosine top-k as the exactness baseline (and oracle target) plus a
random-hyperplane LSH-bucketed variant as the scale path: at 10^12 rows the
bucketed index turns a full scan into a handful of bucket probes; candidates
are re-ranked exactly.

All arithmetic is quantized-integer (q = floor(x·1000 + 0.5)) so Spark and
DuckDB produce bit-identical cosines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import round_half_up

QUANT = 1000
LSH_PLANES = 12  # hyperplane count → 2^12 buckets
EMB_DIM = 64
_rng = random.Random(20250817)
# quantized hyperplane components in [-50, 50]
HYPERPLANES = [
    [_rng.randint(-50, 50) for _ in range(EMB_DIM)] for _ in range(LSH_PLANES)
]


def quantize(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn(
        "q",
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QUANT + 0.5).cast("long"),
        ),
    ).withColumn(
        "nrm",
        F.aggregate(F.col("q"), F.lit(0).cast("long"), lambda a, v: a + v * v),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    emb: DataFrame, query: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against a (broadcast) one-row query vector.
    Ties broken by vec_id asc. Output: (vec_id, cosine)."""
    qn = quantize(emb)
    qv = quantize(query).select(
        F.col("q").alias("qq"), F.col("nrm").alias("qnrm"),
        F.col("vec_id").alias("qid"),
    )
    scored = (
        qn.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "vec_id",
            round_half_up(
                _dot(F.col("q"), F.col("qq"))
                / (F.sqrt(F.col("nrm")) * F.sqrt(F.col("qnrm"))),
                6,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def lsh_bucket(emb: DataFrame) -> DataFrame:
    """Random-hyperplane signature bucket per vector (the ANN index key).
    Output: input + (bucket long)."""
    qn = quantize(emb)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(HYPERPLANES)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return qn.withColumn("bucket", total)


def lsh_topk(emb: DataFrame, query: DataFrame, k: int = 10) -> DataFrame:
    """ANN top-k: probe only vectors sharing the query's LSH bucket (plus
    Hamming-1 neighbor buckets for recall), exact re-rank inside.
    Output: (vec_id, cosine)."""
    indexed = lsh_bucket(emb)
    qrow = lsh_bucket(query).select(
        F.col("q").alias("qq"), F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"), F.col("vec_id").alias("qid"),
    )
    probe_buckets = F.array(
        F.col("qbucket"),
        *[
            F.col("qbucket").bitwiseXOR(F.lit(1 << i)).cast("long")
            for i in range(LSH_PLANES)
        ],
    )
    cands = (
        indexed.crossJoin(F.broadcast(qrow))
        .filter(
            F.array_contains(probe_buckets, F.col("bucket"))
            & (F.col("vec_id") != F.col("qid"))
        )
        .select(
            "vec_id",
            round_half_up(
                _dot(F.col("q"), F.col("qq"))
                / (F.sqrt(F.col("nrm")) * F.sqrt(F.col("qnrm"))),
                6,
            ).alias("cosine"),
        )
    )
    return cands.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
