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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import (
    HASH_P,
    portable_hash31,
    round_half_up,
    shingles,
    ws_tokens,
    ws_tokens_py,
)

# MinHash parameters (pinned; the oracle embeds the same constants).
MINHASH_K = 32
LSH_BANDS = 8
LSH_ROWS = MINHASH_K // LSH_BANDS
_rng = random.Random(20250816)
MINHASH_A = [_rng.randrange(1, HASH_P) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, HASH_P) for _ in range(MINHASH_K)]

# 31, not 32: portable_hash31 values are < 2^31 (mod the Mersenne prime),
# so a 32nd bit would be structurally zero — a dead filter expression per
# row and a biased 32-bit Hamming space for consumers. Values are
# identical to the old 32-bit form (the dead bit never contributed).
SIMHASH_BITS = 31


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


def _py_shingle_list(text: str | None, n: int) -> list[str]:
    """Python twin of ``shingles(ws_tokens(col), n)`` — must match the
    Column form byte-for-byte:

    * tokenize = ``functions.columns.ws_tokens_py`` (the ONE pinned
      tokenizer-contract definition: trim SPACES only, collapse Java
      ``\\s`` runs, split on ' ');
    * shingle = ' '-joined n-grams, distinct with first-occurrence order
      (``array_distinct`` semantics; order is irrelevant downstream but
      kept equal anyway).
    """
    toks = ws_tokens_py(text)
    k = len(toks) - (n - 1)
    if k <= 0:
        return []
    return list(dict.fromkeys(
        " ".join(toks[i : i + n]) for i in range(k)
    ))


def shingle_array_udf(n: int):
    """Arrow-batched ``pandas_udf`` computing the distinct n-gram shingle
    array of a text column (the fast twin of ``shingles(ws_tokens(c), n)``;
    see :func:`_py_shingle_list` for the pinned equivalence)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda x: _py_shingle_list(x, n))

    return sh


def shingle_sets(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 n: int = 3) -> DataFrame:
    """(did, sh: array<string>) — distinct n-gram shingles per row.

    Built in an Arrow-batched ``pandas_udf``: the Column form
    (``shingles(ws_tokens(col), n)``) evaluates interpreted per-element
    array expressions at ~50-90µs/shingle, which dominates every dedup
    query; the Python twin is ~20× faster and byte-identical (the DuckDB
    oracles and ``test_shingle_twin_equivalence`` pin the equivalence).
    """
    return df.select(
        F.col(id_col).alias("did"),
        shingle_array_udf(n)(F.col(text_col)).alias("sh"),
    )


# Guard rails for the candidate-generation joins (PLANS.md §similarity):
# a shingle appearing in d documents contributes d·(d-1)/2 candidate rows,
# so one boilerplate shingle with DF=10^6 would alone emit 5·10^11 pairs.
# Shingles above MAX_SHINGLE_DF are treated as stopwords — dropped from the
# inverted index AND the sets, so Jaccard stays exact over the filtered
# shingle universe. Band buckets above MAX_BUCKET_SIZE (near-identical
# boilerplate clusters) are likewise dropped before the pair join. Both caps
# are deterministic and replayed verbatim in the DuckDB oracles.
MAX_SHINGLE_DF = 512
MAX_BUCKET_SIZE = 256


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_shingle_df: int | None = MAX_SHINGLE_DF,
    persist_handles: list | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index.

    shuffle profile: explode → DF-cap agg → hash-join on shingle →
    hash-agg on (a, b). Shingles with document frequency > ``max_shingle_df``
    are stopworded out of both the index and the set sizes (bounds the
    posting-list self-join at d²·|hot shingles|).

    NOTE (semantics vs the uncapped form): the default cap changes the
    Jaccard universe — scores are exact over the *DF-filtered* shingle set.
    Pass ``max_shingle_df=None`` for the uncapped exact semantics (safe only
    when no shingle is near-universal; at corpus scale keep the cap).
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 6.

    ``persist_handles``: the exploded index is referenced by several plan
    branches (DF-cap agg, sizes, both sides of the intersection self-join),
    and building shingles is the expensive part (per-element Catalyst array
    ops over every token) — so each branch re-paying it multiplies the cost
    ~5×. Pass a list to persist the index once (MEMORY_AND_DISK; the
    handle is appended for the caller to unpersist). Long-text inputs (the
    corpus pipeline) need this; short-document oracles run fine without.
    """
    sets_ = shingle_sets(df, id_col, text_col, n)
    inv_all = sets_.select("did", F.explode("sh").alias("s"))
    if persist_handles is not None:
        from pyspark import StorageLevel

        inv_all = inv_all.persist(StorageLevel.MEMORY_AND_DISK)
        persist_handles.append(inv_all)
    if max_shingle_df is None:
        inv = inv_all
    else:
        # document frequency per shingle (sh is distinct per doc by construction)
        keep = (
            inv_all.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        inv = inv_all.join(keep, "s")
    sizes = inv.groupBy("did").agg(F.count(F.lit(1)).alias("sz"))
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


def _minhash_sig_udf():
    """Vectorized (Arrow-batched numpy) MinHash signature over the shingle
    array: one [K,1]·[1,m] broadcast matmul-min per row replaces K
    interpreted ``array_min(transform(...))`` Catalyst lambdas (the same
    hotspot class the shingle UDF removed). Identical integer math —
    ``portable_hash31_py`` is the pinned twin of the Column hash, and
    (a·h+b) stays < 2^62 in int64 — so the DuckDB oracle is unchanged."""
    import numpy as np
    from pyspark.sql import types as T

    from ..functions.columns import portable_hash31_py

    a = np.array(MINHASH_A, dtype=np.int64)[:, None]  # [K, 1]
    b = np.array(MINHASH_B, dtype=np.int64)[:, None]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(sh):
        out = []
        for lst in sh:
            if lst is None or len(lst) == 0:
                out.append(None)
                continue
            h = np.fromiter(
                (portable_hash31_py(s) for s in lst),
                dtype=np.int64,
                count=len(lst),
            )
            out.append(((a * h + b) % HASH_P).min(axis=1))
        return pd.Series(out)

    return sig


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3) -> DataFrame:
    """MinHash signature array (length MINHASH_K) per document."""
    sets_ = shingle_sets(df, id_col, text_col, n)
    return sets_.select("did", _minhash_sig_udf()(F.col("sh")).alias("sig"),
                        "sh")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_bucket_size: int = MAX_BUCKET_SIZE,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified.

    signature → LSH_BANDS band keys → bucket-size cap → bucket equi-join
    finds candidates → candidates verified with exact Jaccard over shingle
    sets. A degenerate bucket of d near-identical docs yields d²/2 candidate
    rows, so buckets larger than ``max_bucket_size`` are dropped before the
    self-join (their members still pair through any other non-degenerate
    band). Deterministic (no probabilistic acceptance beyond band
    collision), so it is oracle-checkable: the DuckDB twin replays the same
    signatures, bands, and cap. Output: (id_a, id_b, jaccard).
    """
    sigs = minhash_signatures(df, id_col, text_col, n).filter(
        F.col("sig").isNotNull()
    )
    bands_all = sigs.select(
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
    small = (
        bands_all.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz") <= max_bucket_size)
        .select("band", "bucket")
    )
    bands = bands_all.join(small, ["band", "bucket"])
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


def _cosine_pair(xq, yq, xn, yn):
    return round_half_up(
        F.aggregate(
            F.zip_with(xq, yq, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        / (F.sqrt(xn) * F.sqrt(yn)),
        6,
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    max_bucket_size: int | None = MAX_BUCKET_SIZE,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (the 100-TB shape).

    Candidates come from a self-equi-join of the random-hyperplane LSH index
    (``similarity.lsh_bucket``: L tables × P planes, deterministic): two
    vectors are candidates iff they share a bucket in ≥1 table. Candidates
    are verified with the exact quantized cosine — the same
    candidates → exact-verify pattern as :func:`minhash_lsh_pairs`. Buckets
    larger than ``max_bucket_size`` are dropped before the self-join
    (degenerate-cluster guard; ``None`` disables the guard — candidates are
    still LSH-bucketed, so full-recall exactness needs
    :func:`embedding_near_dup_pairs_exact`). Pairs whose vectors share no
    bucket are not reported (the documented recall trade vs the O(n²) exact
    form, which survives as :func:`embedding_near_dup_pairs_exact` for
    cross-checks).
    Output: (id_a, id_b, cosine) with id_a < id_b, cosine rounded 6.
    """
    from .similarity import lsh_bucket

    idx = lsh_bucket(emb.select("vec_id", "embedding"))
    pe = idx.select(
        F.col("vec_id").alias("vid"),
        "q",
        "nrm",
        F.posexplode("buckets").alias("tbl", "bucket"),
    )
    if max_bucket_size is None:
        keys = pe.select("tbl", "bucket", "vid")
    else:
        small = (
            pe.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") <= max_bucket_size)
            .select("tbl", "bucket")
        )
        keys = pe.join(small, ["tbl", "bucket"]).select("tbl", "bucket", "vid")
    cand = (
        keys.alias("x")
        .join(keys.alias("y"), ["tbl", "bucket"])
        .filter(F.col("x.vid") < F.col("y.vid"))
        .select(F.col("x.vid").alias("id_a"), F.col("y.vid").alias("id_b"))
        .distinct()
    )
    vecs = idx.select(F.col("vec_id").alias("vid"), "q", "nrm")
    return (
        cand.join(
            vecs.select(
                F.col("vid").alias("id_a"), F.col("q").alias("qa"), F.col("nrm").alias("na")
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("vid").alias("id_b"), F.col("q").alias("qb"), F.col("nrm").alias("nb")
            ),
            "id_b",
        )
        .withColumn(
            "cosine",
            _cosine_pair(F.col("qa"), F.col("qb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs_exact(
    emb: DataFrame, threshold: float, quant: int = 1000
) -> DataFrame:
    """Exact all-pairs embedding near-dup (O(n²) theta-join). Correctness
    cross-check for :func:`embedding_near_dup_pairs` — NOT a scale path.
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
    return (
        qn.alias("x")
        .join(qn.alias("y"), F.col("x.vid") < F.col("y.vid"))
        .select(
            F.col("x.vid").alias("id_a"),
            F.col("y.vid").alias("id_b"),
            _cosine_pair(
                F.col("x.q"), F.col("y.q"), F.col("x.nrm"), F.col("y.nrm")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
