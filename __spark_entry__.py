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
    from polar_spark.session import ensure_driver_session

    ensure_driver_session(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polar_spark.queries import query_map
    from polar_spark.session import ensure_driver_session

    def _hardened(fn):
        # the driver brings its OWN SparkSession: make sure it can read
        # the ns-timestamp testdata and its workers can import polar_spark
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_driver_session(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _hardened(fn) for name, fn in query_map().items()}


def oracle_sql() -> dict[str, str]:
    from polar_spark.queries import oracle_map

    return oracle_map()
