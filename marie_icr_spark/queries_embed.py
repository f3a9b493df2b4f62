"""Driver queries + DuckDB oracles for the deterministic embedding family.

``embed_docs`` certifies the hashed n-gram embedder bit-for-bit (the oracle
rebuilds every vector in SQL from the same portable md5 hash); ``embed_topk``
certifies the distributed brute-force dot-product top-k consumer (exact
integer ranking — ``list_dot_product`` is exact for integer-valued doubles).

Reference parity: the contract of ``marie/embeddings/base.py``
(``get_embeddings: text -> fixed-width vector``) + the pgvector similarity
consumer (``marie/vectorstores/pgvector/pgvector.py``), model replaced by the
feature-hashing featurizer (see ``operators/embeddings.py`` docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.columns import WS_TOKENS_SQL as _TOKENS_SQL
from .functions.columns import ngrams_sql, portable_hash31_sql
from .operators.embeddings import DIMS, NGRAM, embed_rows, embed_topk
from .sources.tables import load_table
_TOPK_K = 5
_PROBE_MOD = 97


def q_embed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the vector serialized to ','-joined exact integers —
    the driver/sweep value-hash factorizes cell values, so certified
    queries emit scalars only (array fidelity is lossless: counts are
    integer-valued)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb_txt = F.array_join(
        F.transform("embedding", lambda v: v.cast("long").cast("string")),
        ",",
    )
    return embed_rows(docs).select(
        "doc_id", emb_txt.alias("embedding_csv"), "norm_sq"
    )


_EMBED_CELLS_SQL = f"""
WITH tw AS (SELECT doc_id, {_TOKENS_SQL.format(e='text')} w FROM documents),
g AS (SELECT doc_id, unnest({ngrams_sql('w', NGRAM)}) AS g FROM tw),
bk AS (SELECT doc_id,
         {portable_hash31_sql("'emb:' || g")} % {DIMS} AS b,
         CASE WHEN {portable_hash31_sql("'sgn:' || g")} % 2 = 0
              THEN 1 ELSE -1 END AS s
       FROM g),
c AS (SELECT doc_id, b, SUM(s) AS v FROM bk GROUP BY doc_id, b),
cells AS (
  SELECT d.doc_id, dim.b AS b, COALESCE(c.v, 0) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range({DIMS})) AS b) dim
  LEFT JOIN c ON c.doc_id = d.doc_id AND c.b = dim.b)
SELECT doc_id,
       list(CAST(v AS DOUBLE) ORDER BY b) AS embedding,
       CAST(SUM(v * v) AS BIGINT) AS norm_sq
FROM cells GROUP BY doc_id
"""

ORACLE_EMBED_DOCS = f"""
WITH emb AS ({_EMBED_CELLS_SQL})
SELECT doc_id,
       array_to_string(list_transform(embedding,
         v -> CAST(CAST(v AS BIGINT) AS VARCHAR)), ',') AS embedding_csv,
       norm_sq
FROM emb
"""


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = embed_rows(docs)
    probes = [
        (int(r["doc_id"]), list(r["embedding"]))
        for r in corpus.filter(F.col("doc_id") % _PROBE_MOD == 0).collect()
    ]
    return embed_topk(corpus, probes, k=_TOPK_K)


ORACLE_EMBED_TOPK = f"""
WITH emb AS ({_EMBED_CELLS_SQL}),
p AS (SELECT * FROM emb WHERE doc_id % {_PROBE_MOD} = 0),
d AS (SELECT p.doc_id AS probe_id, c.doc_id AS hit_id,
        CAST(list_dot_product(p.embedding, c.embedding) AS BIGINT) AS dot
      FROM p JOIN emb c ON c.doc_id != p.doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        ORDER BY dot DESC, hit_id) AS rank FROM d)
SELECT probe_id, hit_id, dot, CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= {_TOPK_K}
"""


EMB_QUERIES = {
    "embed_docs": q_embed_docs,
    "embed_topk": q_embed_topk,
}

EMB_ORACLES = {
    "embed_docs": ORACLE_EMBED_DOCS,
    "embed_topk": ORACLE_EMBED_TOPK,
}
