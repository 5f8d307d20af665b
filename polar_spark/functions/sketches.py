"""Distinct-count sketching: KMV (k-minimum-values).

Why KMV and not HyperLogLog: Spark's ``approx_count_distinct`` HLL and
any other engine's HLL disagree bit-for-bit (different hash/encodings),
so it can never be oracle-checked. KMV with an md5-derived hash is fully
deterministic and engine-independent — the estimate is a pure function
of the data — while keeping the same O(k) summary size and ~1/√k
relative error (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002).

Estimator: hash every value to (0, 1]; keep the k smallest distinct
hashes per group. If fewer than k distinct hashes exist the count is
exact; otherwise estimate (k-1)/h_k with h_k the k-th smallest hash.

Scale shape: dedupe shuffle on (keys, hash) with map-side combine, then
a per-key top-k window over at most the distinct values — the classic
two-stage reduction; summary state is O(k) per group from the window on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K = 64
# 2^60 as the hash-space size: md5's first 15 hex chars, exact in bigint
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame, keys: list[str], value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: keys…, n_kept (≤ k), est_distinct (double; exact when the
    group has < k distinct values)."""
    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    dedup = df.select(*keys, h).groupBy(*keys, "h").agg(F.lit(1)).select(*keys, "h")
    w = Window.partitionBy(*keys).orderBy("h")
    mins = dedup.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        mins.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("h_k"),
        )
        .select(
            *keys,
            "n_kept",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise((F.lit(float(k - 1))) / (F.col("h_k") / F.lit(HASH_SPACE)))
            .alias("est_distinct"),
        )
    )
