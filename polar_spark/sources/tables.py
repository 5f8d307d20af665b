"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

The testdata is written with parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects. With ``spark.sql.legacy.parquet.nanosAsLong``
those columns surface as LONG nanos; this loader inspects the parquet
footer with pyarrow (metadata-only, no data read) and converts them to
microsecond timestamps — lossless for the generator's µs-granular values
and bit-identical to what DuckDB's oracle sees after its own ns→µs cast.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@lru_cache(maxsize=256)
def _ns_timestamp_cols(path: str) -> tuple[str, ...]:
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with ns-timestamp columns normalized."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        # integer div — double division would lose precision on ~1e18 nanos
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register testdata tables as temp views for the SQL surface."""
    for name in tables or TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
