"""Graph analytics over the event stream (LLM-pipeline surface).

Connected components already live in functions/dedup.py (transitive
dup clusters); this module holds the rank-propagation side. Like
`kmeans_lloyd_quantized`, the iterative algorithm is made fully
oracle-checkable by quantizing to integer arithmetic: every update is
an exact function of the data, so a fixed-iteration run carries a
DuckDB value-hash oracle — the property float PageRank (whose sums
accumulate in engine-owned order) can never have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from polar_spark.queries.registry import query
from polar_spark.sources.tables import load_table


@query(
    "pagerank_event_graph",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), e AS (
  SELECT prev AS u, event_type AS v, COUNT(*) AS w
  FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type
), outw AS (
  SELECT u, SUM(w) AS wu FROM e GROUP BY u
), nodes AS (
  SELECT DISTINCT event_type AS node FROM events
), r0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
), c1 AS (
  SELECT e.v, SUM((r0.r * e.w) // outw.wu) AS s
  FROM e JOIN outw ON e.u = outw.u JOIN r0 ON r0.node = e.u
  GROUP BY e.v
), r1 AS (
  SELECT node,
    CAST(150000 + (85 * coalesce(c1.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN c1 ON c1.v = nodes.node
), c2 AS (
  SELECT e.v, SUM((r1.r * e.w) // outw.wu) AS s
  FROM e JOIN outw ON e.u = outw.u JOIN r1 ON r1.node = e.u
  GROUP BY e.v
), r2 AS (
  SELECT node,
    CAST(150000 + (85 * coalesce(c2.s, 0)) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN c2 ON c2.v = nodes.node
)
SELECT node, r AS rank_scaled FROM r2
""",
)
def pagerank_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (2 iterations, damping 0.85) over the
    event-type transition graph — nodes are event types, edge weights
    the consecutive-transition counts top_event_transitions mines.
    Quantized to exact integers (ranks scaled by 1e6; per-edge
    contribution = (r·w) DIV out_weight; update = 150000 +
    (85·Σcontrib) DIV 100), so the full iterative computation is
    bit-reproducible and value-hash-checked — the same discipline as
    `kmeans_lloyd_quantized`. Dangling-node mass leaks by design (the
    standard simplification); documenting it is part of the contract.

    Scale: the edge build is ONE user-hash window + a map-side-combined
    count into ≤ |types|² groups. Iteration runs through
    operators/pagerank.py's CO-PARTITIONED form: edges hash-partitioned
    once on the source node and persisted, ranks re-emitted on the same
    node-key layout each iteration — the edge table (the 100 TB side on
    a web graph) moves exactly once no matter how many iterations, and
    per-iteration exchanges carry only rank-table-sized data
    (plan-asserted in tests/test_plans.py).
    """
    from polar_spark.operators.pagerank import pagerank_quantized

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("u"), F.col("event_type").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    return pagerank_quantized(edges, nodes, iterations=2)
