"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

At 100 TB the dominant join cost is shuffling both sides on the key.
Writing fact tables bucketed on the join key trades one up-front shuffle
at ingest for ZERO exchanges on every subsequent join/aggregation keyed
the same way — the Spark analog of the reference pinning a key's data to
one broker's token range so lookups never cross nodes
(internal/types/token.go ring placement).

Bucketed tables require the session catalog (``saveAsTable``); pass
``path`` to keep the data external. Join two tables bucketed with the
SAME bucket count on the SAME key and Catalyst plans a SortMergeJoin
with no ShuffleExchange on either side (verified by
tests/test_plans.py::test_bucketed_join_has_no_exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed catalog table (overwrites)."""
    w = df.write.mode("overwrite").bucketBy(buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact."""
    return spark.table(table)
