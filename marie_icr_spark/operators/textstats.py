"""Text-analysis operators for training-data pipelines over ``documents``.

Language-ID (stopword-ratio heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting (rolling hash). All are pure Column expressions — JVM-side,
whole-stage-codegen, no Python in the hot path — and every formula has an
exact DuckDB twin for the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.columns import (
    rolling_fingerprint,
    round_half_up,
    ws_tokens,
    ws_tokens_py,
)

# Pinned stopword sets (deterministic heuristic, not a model).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "los", "y", "un", "una", "es", "por", "con"),
    "fr": ("le", "les", "et", "de", "une", "est", "que", "pour"),
}
LANG_MIN_SCORE = 0.05
WORD_REGEX = "[A-Za-z]+|[0-9]+"  # BPE-ish word/number split (pinned)


def token_stats(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(id_cols..., n_chars, n_ws_tokens, n_word_tokens, avg_token_len)."""
    toks = ws_tokens(F.col(text_col))
    return df.select(
        *id_cols,
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_REGEX), 0))
        .cast("long")
        .alias("n_word_tokens"),
        round_half_up(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def _lang_scores(toks):
    return {
        lang: round_half_up(
            F.size(F.filter(toks, lambda t: t.isin(*words))) / F.size(toks), 6
        )
        for lang, words in STOPWORDS.items()
    }


def language_id(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Stopword-ratio language ID: argmax score, tie → lang asc, 'und' when
    the best score is below LANG_MIN_SCORE.
    Output: (id_cols..., pred_lang, lang_score)."""
    toks = ws_tokens(F.col(text_col))
    scores = _lang_scores(toks)
    pairs = F.array(
        *[
            F.struct(
                F.lit(lang).alias("lang"), scores[lang].alias("score")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    # argmax with lang-asc tie-break: sort by (-score, lang) and take head
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .when(a["lang"] < b["lang"], -1)
        .when(a["lang"] > b["lang"], 1)
        .otherwise(0),
    )[0]
    return df.select(
        *id_cols,
        F.when(best["score"] >= LANG_MIN_SCORE, best["lang"])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
        best["score"].alias("lang_score"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Composite quality in [0,1] (pinned formula):
    0.4·min(1, tokens/64) + 0.3·(1 − min(1, 4·punct_ratio))
    + 0.3·min(1, 4·stopword_ratio).
    Output: (id_cols..., n_tokens, punct_ratio, stop_ratio, quality)."""
    toks = ws_tokens(F.col(text_col))
    n_toks = F.size(toks)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", "")
    )
    all_stop = tuple({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    punct_ratio = round_half_up(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = round_half_up(n_stop / F.greatest(n_toks, F.lit(1)), 6)
    quality = round_half_up(
        0.4 * F.least(F.lit(1.0), n_toks / F.lit(64.0))
        + 0.3 * (1.0 - F.least(F.lit(1.0), punct_ratio * 4))
        + 0.3 * F.least(F.lit(1.0), stop_ratio * 4),
        4,
    )
    return df.select(
        *id_cols,
        n_toks.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def document_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling token hash (doc_id, fingerprint)."""
    return df.select(
        "doc_id",
        rolling_fingerprint(ws_tokens(F.col(text_col))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene): regex redaction with placeholder
# tokens. Patterns are RE2-compatible (no lookaround) so Spark (Java regex)
# and DuckDB (RE2) agree; applied in pinned order, counts taken on the
# progressively-scrubbed text so overlapping patterns never double-count.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Redact PII spans with typed placeholders.

    Output: (id_cols..., scrubbed_text, n_email, n_ssn, n_phone, n_ipv4,
    n_redactions). Pure Column expressions (whole-stage codegen)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return df.select(
        *id_cols,
        cur.alias("scrubbed_text"),
        *counts,
        total.cast("long").alias("n_redactions"),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k distinguishing terms per document by rational tf-idf.

    score = tf · N / df (monotonic in tf/df — the log in classic idf only
    compresses the scale and is not cross-engine bit-exact, so the rational
    form is used; integer products stay < 2^53, then one division rounded 6).
    Shuffle profile: explode → two hash aggs (term stats) → broadcast N →
    window top-k per doc. Ties break on term asc.
    Output: (doc_id, term, tf, df, score, rank)."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("did"), F.explode(ws_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("did", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            round_half_up(F.col("tf") * F.col("n_docs") / F.col("df"), 6),
        )
    )
    w = Window.partitionBy("did").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("did").alias(id_col), "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )




def _py_repetition_counts(text: str | None) -> list[int]:
    """(total, distinct) n-gram counts for n = 1, 2, 3 as a flat 6-list.

    Tokenization is ``functions.columns.ws_tokens_py`` (the ONE pinned
    ``ws_tokens`` twin) — empty text yields one empty 1-gram token,
    matching ``F.split`` semantics.
    """
    toks = ws_tokens_py(text)
    out: list[int] = []
    for n in (1, 2, 3):
        k = len(toks) - (n - 1)
        if k <= 0:
            out += [0, 0]
        elif n == 1:
            out += [k, len(set(toks))]
        else:
            out += [k, len({tuple(toks[i : i + n]) for i in range(k)})]
    return out


def _repetition_counts_udf():
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def rc(texts: pd.Series) -> pd.Series:
        return texts.map(_py_repetition_counts)

    return rc


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Gopher/RefinedWeb-style within-document repetition signals: the
    fraction of duplicated word n-grams (n = 1, 2, 3), computed as
    (total - distinct) / total rounded 6 (0.0 for empty). High values flag
    boilerplate-looping documents a training pipeline should drop.

    Counting runs in ONE Arrow-batched pandas UDF (the interpreted-Catalyst
    ``ngrams``/``array_distinct`` form evaluated per-element array
    expressions at ~50-90µs/shingle — the same bottleneck the dedup
    queries vectorized away); the fractions and half-up rounding stay in
    Column form so the emitted doubles are bit-identical to the SQL
    oracle's."""
    c = F.col("_rc")
    cols = []
    for i, n in enumerate((1, 2, 3)):
        total, distinct = c[2 * i], c[2 * i + 1]
        cols.append(
            F.when(
                total > 0,
                round_half_up((total - distinct) / total, 6),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_frac")
        )
    return (
        df.withColumn("_rc", _repetition_counts_udf()(F.col(text_col)))
        .select(*id_cols, *cols)
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "sample:v1",
) -> DataFrame:
    """Deterministic stratified sampling — the data-mixing primitive of a
    training pipeline: per stratum, keep a row iff
    ``portable_hash31(salt || key) % 10^6 < rate·10^6``. Hash-based (not
    rand()) so the sample is reproducible across runs, engines, and
    partitionings, and a row's fate never depends on cluster layout."""
    from ..functions.columns import portable_hash31, rate_millionths

    h = portable_hash31(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))) % 1_000_000
    expr = F.lit(rate_millionths(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(rate_millionths(rate))
        ).otherwise(expr)
    return df.filter(h < expr)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any word ``n``-gram with
    a benchmark corpus — the eval-leak guard of a training-data pipeline
    (the GPT-3/PaLM 8-gram membership test).

    Output: (``id_col``, contaminated_ngrams bigint — DISTINCT doc n-grams
    that appear anywhere in the benchmark, contaminated boolean).

    Scale: the benchmark gram set is tiny next to the corpus (eval suites
    are ~1e5-1e6 grams), so it broadcasts and the probe is a map-side hash
    join against the exploded doc grams — the corpus is scanned once, no
    corpus-wide shuffle before the per-doc count. Set
    ``broadcast_benchmark=False`` for a shuffle join when it is not small.
    """
    from .dedup import shingle_array_udf

    sh = shingle_array_udf(n)
    bench_grams = (
        benchmark.select(
            F.explode(sh(F.col(bench_text_col))).alias("g")
        ).distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(sh(F.col(text_col))).alias("g"),
    )
    hits = (
        doc_grams.join(bench_grams, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("contaminated_ngrams"))
    )
    c = F.coalesce("contaminated_ngrams", F.lit(0)).cast("long")
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            c.alias("contaminated_ngrams"),
            (c > 0).alias("contaminated"),
        )
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-window chunking with overlap — the context-window prep stage of
    a training pipeline (fixed windows over whitespace tokens, stride =
    ``max_tokens - overlap``; chunk ``i`` covers tokens
    ``[i·stride, i·stride + max_tokens)``; the last window may be short;
    an empty/short doc yields exactly one chunk).

    Pure Column algebra: tokenized once, chunk starts come from
    ``sequence``, the fan-out is ``explode`` — zero shuffles, zero Python.
    Output: (``id_col``, chunk_idx int, chunk_text string,
    n_chunk_tokens int).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    # smallest c with c·stride + overlap >= n, floored at 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    return (
        df.select(F.col(id_col), toks.alias("_t"), chunk)
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(
                    F.col("_t"), F.col("chunk_idx") * stride + 1, max_tokens
                ),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(
                    F.col("_t"), F.col("chunk_idx") * stride + 1, max_tokens
                )
            ).cast("int").alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    ctx: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1024,
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in ``id_col`` order
    and chunk the global token stream into fixed ``ctx`` windows (docs may
    straddle a boundary — the concat-then-chunk pretraining layout).

    Returns the assignment table: (pack_id long, ``id_col``, start_tok int —
    offset INSIDE the doc, n_toks int). A doc spanning k windows emits k
    rows; pack text materializes downstream by grouping on pack_id and
    slicing each doc's tokens.

    Scale shape — the global prefix sum is two-phase, never a
    single-partition window over the corpus: per-range-bucket token sums
    (one hash agg) roll up to bucket offsets over #buckets ≈ n/bucket_size
    rows (driver-size, like the IVF centroid row), broadcast back, and each
    bucket computes its local cumsum independently.
    """
    n = F.size(ws_tokens(F.col(text_col)))  # >= 1 even for empty text
    return pack_counted(
        df.select(F.col(id_col), n.alias("_n")),
        ctx=ctx,
        id_col=id_col,
        count_col="_n",
        bucket_size=bucket_size,
    )


def pack_counted(
    df: DataFrame,
    ctx: int,
    id_col: str,
    count_col: str,
    bucket_size: int = 1024,
) -> DataFrame:
    """The packing machinery of :func:`pack_sequences` over PRECOMPUTED
    per-document token counts (``count_col``) — the shared core for
    whitespace counts and subword counts (``tokenizer.pack_subword``).
    Zero-count documents contribute nothing and emit no rows."""
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # a non-numeric id would cast to NULL, and the bucket join would
        # silently drop every row — fail loudly instead
        raise TypeError(
            f"sequence packing needs an integral {id_col!r} (got {id_type}); "
            "derive one first, e.g. portable_hash31(col) — and for sparse/"
            "hashed ids pick bucket_size ≈ id_range/n_target_buckets so the "
            "offsets table stays small"
        )
    # integer `div`, not double division: exact over the full long range
    # (doubles lose integer precision past 2^53) and order-consistent —
    # buckets stay contiguous id ranges, so the bucket-ordered prefix sum
    # below reproduces the global id order. The _n > 0 filter matters for
    # zero-count docs: sequence(p0, p1) with p1 < p0 would DESCEND and
    # fabricate negative-length slices.
    sized = df.select(
        F.col(id_col),
        F.expr(f"`{id_col}` div {int(bucket_size)}").alias("_b"),
        F.col(count_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    btot = sized.groupBy("_b").agg(F.sum("_n").alias("_bn"))
    from pyspark.sql.window import Window

    # offsets table is tiny (#buckets rows) — the single-partition window
    # here is over metadata, not data
    woff = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = btot.select(
        "_b", (F.sum("_bn").over(woff) - F.col("_bn")).alias("_off")
    )
    win = Window.partitionBy("_b").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    placed = (
        sized.join(F.broadcast(offsets), "_b")
        .withColumn(
            "_before", F.col("_off") + F.sum("_n").over(win) - F.col("_n")
        )
    )
    # integer `div` here too (same rationale as the bucket key above):
    # _before is a corpus-wide cumulative token count — at 10^12-turn
    # scale it exceeds 2^53 and double division would misassign
    # boundary docs to the wrong pack
    p0 = F.expr(f"_before div {int(ctx)}")
    p1 = F.expr(f"(_before + _n - 1) div {int(ctx)}")
    packed = placed.select(
        id_col, "_before", "_n",
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
    )
    start = F.greatest(F.col("pack_id") * ctx - F.col("_before"), F.lit(0))
    end = F.least(
        (F.col("pack_id") + 1) * ctx - F.col("_before"), F.col("_n")
    )
    return packed.select(
        F.col("pack_id").cast("long").alias("pack_id"),
        id_col,
        start.cast("int").alias("start_tok"),
        (end - start).cast("int").alias("n_toks"),
    )
