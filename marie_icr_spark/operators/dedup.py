"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard (shingle inverted-index join — never a
cross join), MinHash+LSH (signature → band → bucket join → exact verify),
SimHash, and embedding-cosine near-dup. The reference's only dedup is
box-level (``marie/executor/ner/ner_extraction_executor.py:338-362``,
dropDuplicates-style); these generalize that to corpus scale.

All hashing uses the md5-derived portable hash so every operator has an
exact DuckDB oracle twin (see queries.py).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import (
    HASH_P,
    portable_hash31,
    round_half_up,
    shingles,
    ws_tokens,
)

# MinHash parameters (pinned; the oracle embeds the same constants).
MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS
_rng = random.Random(20250816)
MINHASH_A = [_rng.randrange(1, HASH_P) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, HASH_P) for _ in range(MINHASH_K)]

SIMHASH_BITS = 32


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: per content hash keep the smallest id.
    Output: (content_md5, keep_id, dup_count)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("did"),
        shingles(ws_tokens(F.col(text_col)), n).alias("sh"),
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index.

    shuffle profile: explode → hash-join on shingle → hash-agg on (a, b).
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 6.
    """
    sets_ = shingle_sets(df, id_col, text_col, n)
    sizes = sets_.select("did", F.size("sh").alias("sz"))
    inv = sets_.select("did", F.explode("sh").alias("s"))
    inter = (
        inv.alias("x")
        .join(inv.alias("y"), "s")
        .filter(F.col("x.did") < F.col("y.did"))
        .groupBy(F.col("x.did").alias("id_a"), F.col("y.did").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("did", "id_a").withColumnRenamed("sz", "sza"), "id_a")
        .join(sizes.withColumnRenamed("did", "id_b").withColumnRenamed("sz", "szb"), "id_b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> DataFrame:
    """MinHash signature array (length MINHASH_K) per document."""
    sets_ = shingle_sets(df, id_col, text_col, n)
    base = F.transform(F.col("sh"), lambda s: portable_hash31(s))
    sig = F.array(
        *[
            F.array_min(
                F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % HASH_P)
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
        ]
    )
    return sets_.select("did", F.when(F.size("sh") > 0, sig).alias("sig"), "sh")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified.

    signature → LSH_BANDS band keys → bucket equi-join finds candidates →
    candidates verified with exact Jaccard over shingle sets. Deterministic
    (no probabilistic acceptance beyond band collision), so it is
    oracle-checkable: the DuckDB twin replays the same signatures and bands.
    Output: (id_a, id_b, jaccard).
    """
    sigs = minhash_signatures(df, id_col, text_col, n).filter(
        F.col("sig").isNotNull()
    )
    bands = sigs.select(
        "did",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ":",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(b * LSH_ROWS, (b + 1) * LSH_ROWS)
                            ],
                        )
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .filter(F.col("x.did") < F.col("y.did"))
        .select(F.col("x.did").alias("id_a"), F.col("y.did").alias("id_b"))
        .distinct()
    )
    sets_ = sigs.select("did", "sh")
    verified = (
        cand.join(sets_.withColumnRenamed("did", "id_a").withColumnRenamed("sh", "sha"), "id_a")
        .join(sets_.withColumnRenamed("did", "id_b").withColumnRenamed("sh", "shb"), "id_b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.size(F.array_intersect("sha", "shb"))
                / F.size(F.array_union("sha", "shb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SIMHASH_BITS-bit SimHash over the whitespace-token multiset: bit b is
    set when strictly more than half the tokens have bit b set in their
    portable hash. Output: (doc_id, simhash)."""
    toks = ws_tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: portable_hash31(t))
    n = F.size(toks)
    bits = [
        F.when(
            F.size(
                F.filter(
                    hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1
                )
            )
            * 2
            > n,
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(SIMHASH_BITS)
    ]
    total = bits[0]
    for bcol in bits[1:]:
        total = total + bcol
    return df.select(F.col(id_col).alias("doc_id"), total.alias("simhash"))


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float, quant: int = 1000
) -> DataFrame:
    """Embedding-cosine near-dup pairs via quantized integer dot products
    (exact cross-engine arithmetic: q = floor(x*quant + 0.5)).
    Output: (id_a, id_b, cosine) with id_a < id_b, cosine rounded 6."""
    q = emb.select(
        F.col("vec_id").alias("vid"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * quant + 0.5).cast("long"),
        ).alias("q"),
    )
    qn = q.withColumn(
        "nrm",
        F.aggregate(
            F.col("q"), F.lit(0).cast("long"), lambda a, v: a + v * v
        ),
    )
    pairs = (
        qn.alias("x")
        .join(qn.alias("y"), F.col("x.vid") < F.col("y.vid"))
        .select(
            F.col("x.vid").alias("id_a"),
            F.col("y.vid").alias("id_b"),
            round_half_up(
                F.aggregate(
                    F.zip_with(F.col("x.q"), F.col("y.q"), lambda a, b: a * b),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                )
                / (F.sqrt(F.col("x.nrm")) * F.sqrt(F.col("y.nrm"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs
