"""Skew-operator queries: salted forms must be result-identical to the
plain forms, so the oracles are simply the UNSALTED SQL — the strongest
possible check that salting changes the physical distribution only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.operators.skew import salted_agg, salted_join
from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table


@query(
    "skew_salted_agg",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
  MIN(user_id) AS min_user, MAX(user_id) AS max_user
FROM events GROUP BY event_type
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over `events` keyed by event_type —
    a handful of hot keys is exactly the shape that saturates one
    reducer without salting."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
        "user_id",
    )
    return salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_type"),
            "sum_cents": ("sum", "cents"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
    )


@query(
    "skew_salted_join",
    oracle="""
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 100000
""",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join orders⋈customer — result-identical to the plain
    join (oracle is the unsalted SQL)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return salted_join(o, c, ["o_custkey"]).select(
        "o_orderkey", "c_name", "o_totalprice"
    )
