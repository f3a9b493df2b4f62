"""Native Column helpers + portable hashing.

``portable_hash31`` produces the SAME value in Spark SQL and DuckDB SQL
(md5 hex → int → mod 2^31-1), which lets the minhash / simhash / fingerprint
operators be verified value-exact against a DuckDB oracle. Spark's builtin
``xxhash64``/``hash`` have no DuckDB twin, so they are reserved for
engine-internal keys (salting, lineage buckets) only.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne prime): products with multipliers < 2^31 stay < 2^63,
# so the arithmetic never overflows BIGINT under ANSI mode in either engine.
HASH_P = 2_147_483_647
FP_MULT = 257  # rolling-fingerprint base


def round_half_up(col: Column, n: int) -> Column:
    """Cross-engine-exact rounding: floor(x·10ⁿ + 0.5)/10ⁿ.

    Spark's ``round`` goes through decimal HALF_UP while DuckDB rounds the
    binary double — they disagree on decimal-tie values. Pure binary floor
    arithmetic is bit-identical in both engines.
    """
    scale = float(10**n)
    return F.floor(col * scale + 0.5) / scale


def round_half_up_sql(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def portable_hash31(col: Column) -> Column:
    """md5-derived integer hash in [0, 2^31-1), identical in DuckDB."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % HASH_P
    )


def portable_hash31_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`portable_hash31` over ``expr``."""
    return (
        "(list_reduce(list_transform(string_split(substr(md5(" + expr + "),1,15),'')"
        ", c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
        f" (a,b) -> a*16 + b) % {HASH_P})"
    )


def portable_hash31_py(s: str) -> int:
    """Pure-Python twin of :func:`portable_hash31` — the ONE definition of
    the cross-engine hash contract (md5 hex[:15] mod HASH_P). Every Python
    golden that must replay a hash-keyed oracle imports this; do not
    re-implement it inline (three copies once drifted silently)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % HASH_P


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of a trimmed, whitespace-collapsed string."""
    return F.split(F.regexp_replace(F.trim(col), r"\s+", " "), " ")


WS_TOKENS_SQL = "string_split(regexp_replace(trim({e}), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ')"

# Java's \s class ([ \t\n\x0b\f\r]) — NOT Python's unicode-aware \s
_JAVA_WS_RE = re.compile("[ \t\n\x0b\f\r]+")


def rate_millionths(rate: float) -> int:
    """THE sampling-threshold quantization: ``round(rate · 10^6)``.

    Both the Spark sampling filter and the DuckDB oracle literals build
    their thresholds through this one function, so they cannot disagree;
    ``round`` (not ``int``) so a decimal rate like 0.29 maps to exactly
    290000 — truncation of the binary double (289999.99…) would silently
    drop the boundary hash value the documented keep-rule
    ``h % 10^6 < rate·10^6`` includes."""
    return round(rate * 1_000_000)


def ws_tokens_py(text: str | None) -> list[str]:
    """Pure-Python twin of :func:`ws_tokens` / ``WS_TOKENS_SQL`` — the ONE
    tokenizer-contract definition for Python goldens and Arrow UDFs: strip
    SPACES only (Spark/DuckDB ``trim`` strips ``' '``, not tabs), collapse
    Java ``\\s`` runs to one space, split on ``' '``. Empty text yields one
    empty token, matching ``F.split`` semantics. Do not re-implement
    inline: of four historical inline copies, one silently drifted to
    ``str.strip()`` (all unicode whitespace) — a latent oracle divergence
    on any text with a leading tab."""
    return _JAVA_WS_RE.sub(" ", (text or "").strip(" ")).split(" ")


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (the document
    fingerprint; same role as the reference's content-addressed frame hash,
    marie/utils/image_utils.py:136-149, but token-structural)."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_MULT + portable_hash31(t)) % HASH_P,
    )


def rolling_fingerprint_sql(tokens_expr: str) -> str:
    h = portable_hash31_sql("t")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_expr}, t -> {h})), "
        f"(a,b) -> (a*{FP_MULT} + b) % {HASH_P})"
    )


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles as strings ('w1 w2 w3')."""
    return F.array_distinct(ngrams(tokens, n))


def ngrams(tokens: Column, n: int) -> Column:
    """All n-gram token strings, duplicates preserved (repetition stats)."""
    k = F.size(tokens) - (n - 1)
    joined = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
    )
    return F.when(k > 0, joined).otherwise(F.array().cast("array<string>"))


def ngrams_sql(tokens_expr: str, n: int) -> str:
    parts = " || ' ' || ".join(f"({tokens_expr})[i+{j + 1}]" for j in range(n))
    return (
        f"(CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(range(len({tokens_expr}) - {n - 1}), i -> {parts}) "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    return f"list_distinct{ngrams_sql(tokens_expr, n)}"
