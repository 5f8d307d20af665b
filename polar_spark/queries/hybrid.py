"""Hybrid retrieval: lexical (BM25) and dense (embedding dot-product)
ranked lists fused with Reciprocal Rank Fusion.

RRF (Cormack/Clarke/Buettcher 2009) scores a document by
Σ_lists 1/(K + rank) — it depends only on RANKS, never on the lists'
incomparable raw scores, which is why production search stacks use it
to merge a BM25 posting traversal with an ANN probe. Quantized here to
exact integers (contribution = SCALE DIV (K + rank), K = 60,
SCALE = 1e9) so the fused ordering is engine-exact and the whole
hybrid pipeline — both rankers AND the fusion — carries a DuckDB
value-hash oracle. The synthetic corpus aligns `embeddings.vec_id`
with `documents.doc_id`, which is what makes fusing the two lists on
one id meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.functions.retrieval import bm25_topk
from polar_spark.functions.similarity import brute_force_topk, quantize
from polar_spark.queries.registry import query
from polar_spark.queries.text import BM25_TERMS, _BM25_ORACLE_TERM
from polar_spark.sources.tables import load_table, parallelize_small_scan

# fusion constants: standard K = 60; SCALE makes DIV contributions exact
_RRF_K = 60
_RRF_SCALE = 1_000_000_000
_DEPTH = 20  # per-list candidate depth feeding the fusion

_QV = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

_HYBRID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), corp AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tok FROM dl
), qtf AS (
  SELECT doc_id,
    COUNT(*) FILTER (term = 'dup')    AS tf1,
    COUNT(*) FILTER (term = 'vector') AS tf2,
    COUNT(*) FILTER (term = 'join')   AS tf3
  FROM tok WHERE term IN ('dup', 'vector', 'join') GROUP BY doc_id
), dfs AS (
  SELECT
    COUNT(*) FILTER (tf1 > 0) AS df1,
    COUNT(*) FILTER (tf2 > 0) AS df2,
    COUNT(*) FILTER (tf3 > 0) AS df3
  FROM qtf
), base AS (
  SELECT q.doc_id, tf1, tf2, tf3, df1, df2, df3, n_docs,
    CAST(dl.dl AS DOUBLE)
      / (CAST(corp.total_tok AS DOUBLE) / corp.n_docs) AS ndl
  FROM qtf q JOIN dl ON q.doc_id = dl.doc_id CROSS JOIN corp CROSS JOIN dfs
), scored AS (
  SELECT doc_id, tf1, tf2, tf3,{_BM25_ORACLE_TERM.format(i=1)},{_BM25_ORACLE_TERM.format(i=2)},{_BM25_ORACLE_TERM.format(i=3)}
  FROM base
), lexr AS (
  SELECT doc_id, lex_rn FROM (
    SELECT doc_id,
      ROW_NUMBER() OVER (ORDER BY s1 + s2 + s3 DESC, doc_id) AS lex_rn
    FROM scored
  ) t WHERE lex_rn <= {_DEPTH}
), qv AS (
  SELECT {_QV} AS v FROM embeddings WHERE vec_id = 0
), cand AS (
  SELECT vec_id, {_QV} AS v FROM embeddings WHERE vec_id <> 0
), dots AS (
  SELECT cand.vec_id,
    CAST(list_sum(list_transform(range(1, len(qv.v) + 1),
                                 i -> qv.v[i] * cand.v[i])) AS BIGINT) AS dot
  FROM cand CROSS JOIN qv
), knnr AS (
  SELECT vec_id AS doc_id, knn_rn FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY dot DESC, vec_id) AS knn_rn
    FROM dots
  ) t WHERE knn_rn <= {_DEPTH}
), fused AS (
  SELECT coalesce(l.doc_id, k.doc_id) AS doc_id,
    l.lex_rn AS lex_rn, k.knn_rn AS knn_rn,
    coalesce({_RRF_SCALE} // ({_RRF_K} + l.lex_rn), 0)
      + coalesce({_RRF_SCALE} // ({_RRF_K} + k.knn_rn), 0) AS rrf_scaled
  FROM lexr l FULL OUTER JOIN knnr k ON l.doc_id = k.doc_id
)
SELECT doc_id, lex_rn, knn_rn, rrf_scaled
FROM fused ORDER BY rrf_scaled DESC, doc_id LIMIT 10
"""


@query("hybrid_rrf_retrieval", oracle=_HYBRID_ORACLE)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 top-20 for the fixed three-term query fused
    with the quantized-dot top-20 for query vector 0 via integer RRF
    (SCALE DIV (60 + rank), summed per list the doc appears in), top-10
    by fused score. Both rankers reuse this repo's exact machinery —
    `bm25_topk` (shared fixed-order scoring) and `brute_force_topk`
    (int64 quantized dots) — so every rank, and therefore the fusion,
    is value-hash-checked end-to-end.

    Scale: each ranker keeps its own 100 TB shape (term-filtered
    posting trickle + one dl aggregate; per-partition running top-k
    with an O(partitions·k) merge — or the IVF stored-cell probe when
    the corpus outgrows brute force). The fusion itself touches only
    the two DEPTH-row lists: rank assignment and the full-outer join
    run on ≤2·DEPTH rows regardless of corpus size — RRF's cost is by
    construction independent of n, which is exactly why it is the
    industry-standard hybrid merge."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")

    # lexical list: top-DEPTH already bounded by TakeOrdered; the rank
    # window runs over those ≤DEPTH rows only
    lex = (
        bm25_topk(parallelize_small_scan(d), BM25_TERMS, k=_DEPTH)
        .select("doc_id", "score")
        .withColumn(
            "lex_rn",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), "doc_id")
            ),
        )
        .select("doc_id", "lex_rn")
    )
    dense = (
        brute_force_topk(
            e.filter(F.col("vec_id") == 0).select(
                F.col("vec_id").alias("qid"), quantize("embedding").alias("qv")
            ),
            e.select("vec_id", quantize("embedding").alias("cv")),
            k=_DEPTH,
        )
        .select(F.col("vec_id").alias("doc_id"), F.col("rn").alias("knn_rn"))
    )
    contrib = "coalesce({s}L DIV ({k} + {col}), 0L)"
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rn",
        "knn_rn",
        (
            F.expr(contrib.format(s=_RRF_SCALE, k=_RRF_K, col="lex_rn"))
            + F.expr(contrib.format(s=_RRF_SCALE, k=_RRF_K, col="knn_rn"))
        ).alias("rrf_scaled"),
    )
    return fused.orderBy(F.col("rrf_scaled").desc(), "doc_id").limit(10)
