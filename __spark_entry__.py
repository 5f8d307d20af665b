"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query smoke check at sf0.001.
``queries``/``oracle_sql``: the SURVEY.md §2 operator inventory, each
Spark implementation paired with a DuckDB oracle (polar_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from polar_spark.queries.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polar_spark.queries import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    from polar_spark.queries import oracle_map

    return oracle_map()
