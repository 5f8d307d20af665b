"""Embedding similarity-search queries over `embeddings`.

Quantization contract with the oracle: dots are computed on
``floor(double(x)·1e4)`` int64 vectors — exact, order-independent sums
(functions/similarity.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.functions.similarity import (
    brute_force_topk,
    lsh_bucket,
    quantize,
)
from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table

_QV = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"

_KNN_CTE = f"""
WITH q AS (
  SELECT vec_id AS qid, {_QV} AS qv FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id, label, {_QV} AS cv FROM embeddings
), dots AS (
  SELECT qid, vec_id, label,
    CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) AS BIGINT) AS dot
  FROM q, c WHERE vec_id <> qid
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rn
  FROM dots
)
"""


@query(
    "knn_bruteforce_dot",
    oracle=_KNN_CTE + "SELECT qid, vec_id, dot, rn FROM ranked WHERE rn <= 5",
)
def knn_bruteforce_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force ANN baseline: exact top-5 neighbors per query vector
    by quantized dot product (broadcast queries, no candidate shuffle)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), quantize("embedding").alias("qv")
    )
    cands = e.select("vec_id", quantize("embedding").alias("cv"))
    return brute_force_topk(queries, cands, k=5).select("qid", "vec_id", "dot", "rn")


@query(
    "knn_label_vote",
    oracle=_KNN_CTE
    + """
, votes AS (
  SELECT qid, label, COUNT(*) AS c FROM ranked WHERE rn <= 5 GROUP BY qid, label
)
SELECT qid, label AS pred_label FROM (
  SELECT qid, label, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, label) AS r
  FROM votes
) t WHERE r = 1
""",
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification: majority label among the top-5 neighbors
    (deterministic tie-break: count desc, label asc)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), quantize("embedding").alias("qv")
    )
    cands = e.select("vec_id", "label", quantize("embedding").alias("cv"))
    topk = brute_force_topk(queries, cands, k=5)
    votes = topk.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("label"))
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("qid", F.col("label").alias("pred_label"))
    )


@query(
    "embedding_lsh_buckets",
    oracle=f"""
WITH c AS (
  SELECT vec_id, {_QV} AS qv FROM embeddings
), proj AS (
  SELECT vec_id, p,
    SUM((strpos('0123456789abcdef', substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 1)) - 9) * qv[i]) AS s
  FROM c
  CROSS JOIN (SELECT unnest(range(0, 8)) AS p) ps
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) idx
  GROUP BY vec_id, p
), b AS (
  SELECT vec_id, string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM proj GROUP BY vec_id
)
SELECT bucket, COUNT(*) AS n_vecs FROM b GROUP BY bucket
""",
)
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane LSH bucketing (8 md5-derived planes → sign bits): the
    scale path that shrinks ANN candidate sets ~256× before scoring."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id", lsh_bucket(quantize("embedding"), dims=64).alias("bucket")
    )
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))
