"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Timestamp normalization: every testdata generation so far has needed one.

- TIMESTAMP(NANOS) parquet (rounds 1-2) surfaces as LONG nanos under
  ``spark.sql.legacy.parquet.nanosAsLong``; the loader inspects the
  parquet footer with pyarrow (metadata-only, no data read) and converts
  to microsecond timestamps.
- TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet (round 3 testdata)
  surfaces as TIMESTAMP_NTZ in Spark 4, which half the timestamp
  function surface (``unix_micros``, ``window`` joins against TZ
  columns, ...) rejects. The loader casts NTZ → TIMESTAMP; with the
  session timezone pinned to UTC (session.py) the wall-clock values are
  unchanged and bit-identical to what DuckDB's oracle reads.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@lru_cache(maxsize=256)
def _ns_timestamp_cols(path: str) -> tuple[str, ...]:
    if os.path.isdir(path):
        # directory-shaped parquet (e.g. a Spark-written scaled corpus):
        # inspect the first part file's footer
        parts = sorted(
            os.path.join(dp, fn)
            for dp, _dn, fns in os.walk(path)
            for fn in fns
            if fn.endswith(".parquet")
        )
        if not parts:
            return ()
        path = parts[0]
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with timestamp columns normalized to
    session-timezone TIMESTAMP (session tz is UTC, see session.py)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        # integer div — double division would lose precision on ~1e18 nanos
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def parallelize_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism IFF its
    scan is under-split — a parquet row group is the unit of split, so a
    small table written as one file/one row group scans as ONE task and
    starves every core but one, no matter what ``maxPartitionBytes``
    says. CPU-heavy per-row work downstream (tokenize/explode/Arrow
    UDFs) then runs single-threaded and scales linearly with corpus
    bytes (BENCH r5: bpe 5.13×, tfidf 4.13× at 10× — both single-task
    scans of the one-row-group documents file).

    At real scale this is a NO-OP: a 100 TB table scans as thousands of
    splits ≥ default parallelism, so the condition is false and no
    exchange enters the plan. The shuffle this adds on small inputs
    moves only the small input itself."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL surface."""
    for name in tables or TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
