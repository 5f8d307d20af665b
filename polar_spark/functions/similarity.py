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
NLIST = 16  # IVF coarse cells (small by construction: always inlineable)
NPROBE = 4


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


def cosine_exact(a: Column, b: Column) -> Column:
    """Cosine from exact integer dot products: ``dot/(√(a·a)·√(b·b))``.

    The three dots are exact int64 sums (< 2⁵³, so their double casts are
    exact); sqrt/multiply/divide are correctly-rounded IEEE ops — the
    result is bit-identical in any engine, hence oracle-comparable."""
    return dot(a, b).cast("double") / (
        F.sqrt(dot(a, a).cast("double")) * F.sqrt(dot(b, b).cast("double"))
    )


def centroid_scores(
    vec_col: str | Column, centroids: list[tuple[int, list[int]]]
) -> Column:
    """``array<struct<d2,cid>>`` of squared-L2 distance to each centroid.

    Centroids are inlined as literals — the coarse codebook of an IVF
    index is tiny by construction, so assignment is a narrow per-row
    expression (whole-stage codegen, zero shuffle) even at 100 TB."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # two single Literal nodes (array<bigint> ids + array<array<bigint>>
    # vectors) + one transform lambda: the expression tree and generated
    # code stay O(1) in nlist × dims — an unrolled or element-wise-literal
    # form compiles nlist·dims more code for no gain
    ordered = sorted(centroids)
    cids = F.lit([int(cid) for cid, _ in ordered])
    cvs = F.lit([[int(x) for x in cv] for _, cv in ordered])
    return F.transform(
        F.sequence(F.lit(1), F.lit(len(ordered))),
        lambda i: F.struct(
            F.aggregate(
                F.zip_with(
                    c, F.element_at(cvs, i), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("d2"),
            F.element_at(cids, i).alias("cid"),
        ),
    )


def ivf_cell(vec_col: str | Column, centroids: list[tuple[int, list[int]]]) -> Column:
    """Nearest-centroid cell id (ties → lowest cid; struct comparison is
    lexicographic on (d2, cid))."""
    return F.array_min(centroid_scores(vec_col, centroids)).getField("cid")


def ivf_probe_cells(
    vec_col: str | Column,
    centroids: list[tuple[int, list[int]]],
    nprobe: int = NPROBE,
) -> Column:
    """The ``nprobe`` nearest cell ids for a query vector (sorted by
    distance, ties → lowest cid)."""
    return F.transform(
        F.slice(F.array_sort(centroid_scores(vec_col, centroids)), 1, nprobe),
        lambda s: s.getField("cid"),
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[tuple[int, list[int]]],
    k: int = 5,
    nprobe: int = NPROBE,
    query_id: str = "qid",
    cand_id: str = "vec_id",
    query_vec: str = "qv",
    cand_vec: str = "cv",
) -> DataFrame:
    """IVF-style ANN: assign candidates to coarse cells (narrow pass),
    probe only each query's ``nprobe`` nearest cells, exact top-k inside.

    At 100 TB: the inverted lists are the big table hash-partitioned by
    ``cell``; queries explode to nprobe rows and broadcast, so the big
    side never shuffles and scoring touches nprobe/nlist of the corpus."""
    asg = candidates.withColumn("cell", ivf_cell(cand_vec, centroids))
    probes = queries.withColumn(
        "cell", F.explode(ivf_probe_cells(query_vec, centroids, nprobe))
    )
    j = asg.join(F.broadcast(probes), "cell").filter(
        F.col(cand_id) != F.col(query_id)
    )
    scored = j.select(
        query_id, cand_id, dot(F.col(query_vec), F.col(cand_vec)).alias("dot")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dot").desc(), F.col(cand_id))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


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
