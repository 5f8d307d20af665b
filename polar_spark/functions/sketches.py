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


def _k_smallest_hashes(hashed: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Per-group k smallest DISTINCT values of column ``h`` — the
    selection shared by sketch build and sketch merge (they must stay
    identical or merged ≠ direct)."""
    dedup = (
        hashed.select(*keys, "h").groupBy(*keys, "h").agg(F.lit(1)).select(*keys, "h")
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*keys, "h")
    )


def kmv_partial(
    df: DataFrame, keys: list[str], value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group KMV summary: the ≤ k smallest distinct md5-derived
    hashes of ``value_col`` as (keys…, h) rows — the sketch STATE, the
    thing a 100 TB pipeline persists per segment/partition/day and later
    merges without touching raw data again."""
    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    return _k_smallest_hashes(df.select(*keys, h), keys, k)


def _kmv_estimate(mins: DataFrame, keys: list[str], k: int) -> DataFrame:
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


def kmv_distinct(
    df: DataFrame, keys: list[str], value_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: keys…, n_kept (≤ k), est_distinct (double; exact when the
    group has < k distinct values)."""
    return _kmv_estimate(kmv_partial(df, keys, value_col, k), keys, k)


def kmv_merge(
    partials: DataFrame, keys: list[str], k: int = DEFAULT_K
) -> DataFrame:
    """Union-merge KMV partials down to coarser ``keys`` (must be a
    subset of the partials' grouping columns; the dropped columns are
    the merged-away dimension, e.g. month → all-time).

    KMV is losslessly mergeable: every hash among the k smallest of the
    union is among the k smallest of whichever partial contained it, so
    re-selecting the k smallest over the unioned summaries gives
    EXACTLY the sketch of the combined data — merged estimates are
    bit-identical to direct ones (Bar-Yossef et al. 2002, §2). Merge
    input is O(k · groups) rows, never the raw data."""
    return _kmv_estimate(_k_smallest_hashes(partials, keys, k), keys, k)


CM_ROWS = 4
CM_WIDTH = 64


def _cm_bucket(col, row: int, width: int = CM_WIDTH):
    """Deterministic bucket: fold of md5(row:value) mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), F.col(col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cm_counters(
    df: DataFrame, value_col: str, rows: int = CM_ROWS, width: int = CM_WIDTH
) -> DataFrame:
    """Count-min sketch counter table (cm_row, cm_bucket, cnt): each
    occurrence increments one bucket per hash row. The counter table is
    O(rows·width) regardless of cardinality — partial aggregation means
    the shuffle carries at most rows·width rows per map task (Cormode &
    Muthukrishnan, J. Algorithms 2005)."""
    exploded = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cm_row"),
                        _cm_bucket(value_col, j, width).alias("cm_bucket"),
                    )
                    for j in range(rows)
                ]
            )
        ).alias("rb")
    ).select("rb.cm_row", "rb.cm_bucket")
    return exploded.groupBy("cm_row", "cm_bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cm_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    rows: int = CM_ROWS,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-query the sketch: estimate = min over hash rows of the
    key's bucket counter. Always ≥ the true count; error bounded by
    collisions (≤ n/width per row w.h.p.). Counters are tiny → broadcast."""
    kb = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cm_row"),
                        _cm_bucket(key_col, j, width).alias("cm_bucket"),
                    )
                    for j in range(rows)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.cm_row", "rb.cm_bucket")
    return (
        kb.join(F.broadcast(counters), ["cm_row", "cm_bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
