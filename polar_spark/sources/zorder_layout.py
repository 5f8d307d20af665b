"""Materialized Z-order layout: Morton bucketing at INGEST, box-pruned
reads at query time — the layout twin of sources/ivf_index.py.

functions/zorder.py proves the pruning arithmetic; this module makes it
a physical path:

- :func:`write_zordered` — write a table **partitioned by the Morton
  key's top bits** (the bucket IS the directory), rows range-clustered
  so every file's min/max envelope is tight in BOTH dimensions.
- :func:`z_box_buckets` — the query planner's half: enumerate, in pure
  Python from the box alone (no data access — the bucket's x/y envelope
  is a static function of its bit prefix), exactly the buckets a 2-D
  box query can touch.
- :func:`read_z_box` — read the layout with the bucket list pushed into
  the scan as a PARTITION filter (static partition pruning: non-matching
  directories are never listed, let alone read) plus the exact box
  residual filter.

100 TB shape: the write is one narrow key computation + partitioned
write (same cost class as any partitioned ingest); a box query reads
|matching buckets| / |buckets| of the data with ordinary partition
pruning — the Delta OPTIMIZE ZORDER BY read path, reconstructed from
public primitives. The reference has no analytic layout surface — this
is part of the beyond-reference pipeline set (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.functions.zorder import z_value_sql

# 10 bits per dimension, buckets = z >> SHIFT (top 9 bits → ≤ 512 dirs)
Z_BITS = 10
Z_SHIFT = 11


def _domain_checked(col: str, bits: int) -> str:
    """SQL for ``col`` with an inline [0, 2^bits - 1] domain check:
    out-of-domain values raise at write time instead of being masked
    into the wrong bucket (silently unreachable by box queries)."""
    hi = (1 << bits) - 1
    return (
        f"(CASE WHEN ({col}) BETWEEN 0 AND {hi} THEN ({col}) "
        f"ELSE CAST(raise_error(CONCAT('zorder domain: {col}=', "
        f"CAST({col} AS STRING), ' outside [0, {hi}]')) AS BIGINT) "
        f"END)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = Z_BITS,
    shift: int = Z_SHIFT,
) -> None:
    """Write ``df`` partitioned by the Morton bucket of the two
    integer columns. The layout's domain is [0, 2^bits - 1] per
    dimension; an out-of-domain value FAILS the write (inline
    ``raise_error`` — zero extra scan, stays in codegen) rather than
    being silently masked into the wrong bucket, where it would become
    unreachable by box queries (r9 ADVICE fix)."""
    z = z_value_sql(
        _domain_checked(x_col, bits), _domain_checked(y_col, bits),
        "spark", bits,
    )
    (
        df.withColumn("zbucket", F.expr(f"shiftright({z}, {shift})"))
        .repartition("zbucket")
        .write.mode("overwrite")
        .partitionBy("zbucket")
        .parquet(path)
    )


def z_box_buckets(
    x1: int, x2: int, y1: int, y2: int, bits: int = Z_BITS, shift: int = Z_SHIFT
) -> list[int]:
    """Every Morton bucket whose (x, y) envelope intersects the box —
    computed from the bit prefixes alone. A bucket is the set of z
    values sharing the top ``2·bits - shift`` bits; de-interleaving the
    prefix (suffix bits free ⇒ envelope = [prefix-bits·2^free,
    prefix-bits·2^free + 2^free - 1] per dimension) gives its exact
    per-dimension bounds. O(#buckets) driver work, no data access."""
    out = []
    n_prefix = 2 * bits - shift
    for b in range(1 << n_prefix):
        z_lo = b << shift
        # de-interleave the FIXED prefix bits; free (low) bits span
        # their full range
        x_lo = y_lo = 0
        x_free = y_free = 0
        for i in range(bits):
            if 2 * i < shift:
                x_free += 1 << i
            else:
                x_lo |= ((z_lo >> (2 * i)) & 1) << i
            if 2 * i + 1 < shift:
                y_free += 1 << i
            else:
                y_lo |= ((z_lo >> (2 * i + 1)) & 1) << i
        if x_lo <= x2 and x_lo + x_free >= x1 and y_lo <= y2 and y_lo + y_free >= y1:
            out.append(b)
    return out


def read_z_box(
    spark: SparkSession,
    path: str,
    x_col: str,
    y_col: str,
    x1: int,
    x2: int,
    y1: int,
    y2: int,
    bits: int = Z_BITS,
    shift: int = Z_SHIFT,
) -> DataFrame:
    """Box query over a z-ordered layout: bucket list from
    :func:`z_box_buckets` lands as a partition filter (directories
    outside the box are pruned before any I/O), the exact box predicate
    filters the residual rows. Box bounds are clamped to the layout's
    [0, 2^bits - 1] domain first, so a box that merely OVERHANGS the
    domain still returns its in-domain rows instead of silently
    enumerating zero buckets (r9 ADVICE fix); a box entirely outside is
    correctly empty."""
    hi = (1 << bits) - 1
    x1, x2 = max(x1, 0), min(x2, hi)
    y1, y2 = max(y1, 0), min(y2, hi)
    buckets = z_box_buckets(x1, x2, y1, y2, bits, shift) if (
        x1 <= x2 and y1 <= y2
    ) else []
    d = spark.read.parquet(path)
    return d.filter(F.col("zbucket").isin(buckets)).filter(
        (F.col(x_col) >= x1) & (F.col(x_col) <= x2)
        & (F.col(y_col) >= y1) & (F.col(y_col) <= y2)
    )


def stream_zordered(
    stream_df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    checkpoint_dir: str,
    bits: int = Z_BITS,
    shift: int = Z_SHIFT,
    trigger_seconds: float | None = None,
):
    """Streaming ingest into the same Morton-partitioned layout (the
    stream_ivf_index analog): the parquet sink's checkpoint gives
    exactly-once file output; each micro-batch pays only its own O(batch)
    key computation, and every landed file is already envelope-bounded
    in both dimensions — box queries prune a growing corpus identically
    to the batch layout. Out-of-domain values fail the micro-batch
    (same inline domain check as the batch writer)."""
    z = z_value_sql(
        _domain_checked(x_col, bits), _domain_checked(y_col, bits),
        "spark", bits,
    )
    out = stream_df.withColumn("zbucket", F.expr(f"shiftright({z}, {shift})"))
    w = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("zbucket")
        .outputMode("append")
        .trigger(
            **(
                {"processingTime": f"{trigger_seconds} seconds"}
                if trigger_seconds
                else {"availableNow": True}
            )
        )
    )
    return w.start()
