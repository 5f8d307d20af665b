"""Time-bucket gap-filling with last-observation-carried-forward (LOCF).

Hypertable-style continuous-aggregate companion to the multi-resolution
rollup (queries/streamlike.rollup_time_multires): downsample to fixed
buckets AND materialize the empty buckets, interpolating measures from
the last seen value — `time_bucket_gapfill` + `locf` semantics.

Scale design: the dense bucket grid is built per GROUP KEY with
``sequence(min_bucket, max_bucket, step)`` + explode — grid size is
(span / bucket) rows per key, independent of event count, and the only
shuffles are the per-(key, bucket) aggregation and the per-key window
for LOCF (both keyed the same, so the exchange is reused). No driver
loops, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts: str,
    bucket_seconds: int,
    aggs: dict[str, F.Column],
    locf_cols: list[str],
) -> DataFrame:
    """Aggregate ``df`` into ``bucket_seconds`` buckets per ``key``,
    densify every key's [min_bucket, max_bucket] span, and carry the
    last non-null observation forward into empty buckets for
    ``locf_cols`` (others stay NULL; counts stay 0 via coalesce by the
    caller if desired).

    Returns columns: ``key, bucket, n_rows, *aggs`` where ``n_rows`` is
    0 for gap buckets.
    """
    bucketed = (
        df.withColumn(
            "bucket",
            F.timestamp_seconds(
                (F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("bigint")
                * bucket_seconds
            ),
        )
        .groupBy(key, "bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), *[c.alias(n) for n, c in aggs.items()])
    )
    spans = bucketed.groupBy(key).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = spans.select(
        key, F.explode(F.expr(f"sequence(_lo, _hi, INTERVAL {bucket_seconds} SECONDS)")).alias("bucket")
    )
    dense = grid.join(bucketed, [key, "bucket"], "left").withColumn(
        "n_rows", F.coalesce("n_rows", F.lit(0))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in locf_cols:
        dense = dense.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return dense
