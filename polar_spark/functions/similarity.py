"""Embedding similarity search: brute-force top-k and LSH bucketing.

Scale design:
- **Quantized dot product**: embeddings are quantized to int ``floor(x·1e4)``
  so distributed summation is exact and order-independent — a reduction
  that is both deterministic (oracle-comparable) and SIMD-friendly.
- **Brute-force top-k** (the baseline): broadcast the query set, compute
  dots JVM-side with ``zip_with``+``aggregate`` (whole-stage codegen, no
  Python), window top-k per query. Cost O(|Q|·n) — right answer for
  |Q| small; at 100 TB candidates stay partition-local, nothing shuffles
  but the per-query top-k rows (AQE-coalesced).
- **Hyperplane LSH buckets** (the scale path): 8 deterministic md5-derived
  hyperplanes → 256 sign buckets; top-k search then probes only the
  query's bucket (± neighbors), shrinking the candidate set ~256×.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 10000
N_PLANES = 8


def quantize(col: str | Column) -> Column:
    """float32 embedding → exact int64 vector: ``floor(double(x)·1e4)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint")
    )


def dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (JVM-side
    fold — order-independent because integer addition is associative)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Double-precision cosine similarity (sequential left-fold — use for
    ranking; for oracle-exact comparisons prefer the quantized dot)."""
    d = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return d / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    cand_id: str = "vec_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """Exact top-k by quantized dot product; queries are broadcast so the
    candidate scan stays partition-local (no shuffle of the big side)."""
    j = candidates.crossJoin(F.broadcast(queries)).filter(
        F.col(cand_id) != F.col(query_id)
    )
    carry = [c for c in candidates.columns if c not in (cand_id, cand_vec)]
    scored = j.select(
        query_id,
        cand_id,
        *carry,
        dot(F.col(query_vec), F.col(cand_vec)).alias("dot"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dot").desc(), F.col(cand_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def hyperplane_weights(dims: int, planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: weight(p, i) =
    first-md5-hex-digit(p:i) − 8 ∈ [−8, 7]. Reproducible in any engine
    (same construction as the DuckDB oracle in queries/similarity.py)."""
    return [
        [
            int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) - 8
            for i in range(1, dims + 1)
        ]
        for p in range(planes)
    ]


def lsh_bucket(vec_col: str | Column, dims: int, planes: int = N_PLANES) -> Column:
    """Sign-of-projection LSH bucket id as a ``planes``-char bit-string.
    The projection is an exact integer dot with md5-derived weights."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for w in hyperplane_weights(dims, planes):
        warr = F.array(*[F.lit(x).cast("bigint") for x in w])
        proj = dot(c, warr)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
