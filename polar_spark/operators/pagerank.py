"""Co-partitioned quantized PageRank — the web-scale iteration shape.

The naive DataFrame PageRank re-broadcasts (or worse, re-shuffles) the
edge list every iteration; at web scale the edge list is the 100 TB
side and must move ZERO times after setup. This operator implements the
standard co-partitioned form (the same layout GraphX/Pregel and the
Google paper's sharded implementation use, expressed in DataFrame ops):

- edges are hash-partitioned ONCE on the source node and persisted —
  every subsequent iteration's rank join lands on that fixed layout;
- the rank table is produced each iteration ALREADY partitioned on the
  node key (the destination-aggregation's own shuffle provides it), so
  the edges⋈ranks join needs no exchange on either side;
- per iteration exactly TWO exchanges move data, both rank-table-sized
  (node cardinality, not edge cardinality): the contribution aggregation
  by destination and the node-table left join that re-attaches
  zero-in-degree nodes.

Rank arithmetic is quantized to exact integers (ranks scaled by 1e6,
per-edge contribution ``(r·w) DIV out_weight``, damping as
``150000 + (85·Σ) DIV 100``), so a fixed-iteration run is
bit-reproducible across engines and carries a full value-hash DuckDB
oracle — float PageRank's engine-owned accumulation order can never.
Dangling-node mass leaks by design (the standard simplification).

Provenance: the co-partitioned prescription documented (but not
implemented) in the r7 ``queries/graph.py`` docstring; VERDICT r7 next
#8 is the contract: total setup exchanges ≤ 2 beyond the edge build,
≤ 3 per iteration, results bit-identical to the broadcast form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank fixed-point scale and damping (85/100) — all integer arithmetic
PR_SCALE = 1_000_000


def pagerank_quantized(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 2,
    n_parts: int | None = None,
) -> DataFrame:
    """Integer-quantized weighted PageRank over ``edges (u, v, w)`` and
    ``nodes (node)``, co-partitioned on the node key.

    Returns (node, rank_scaled bigint). ``n_parts`` fixes the hash
    layout (default: session shuffle partitions); every iteration's
    joins reuse it, so the edge table is shuffled exactly once no
    matter how many iterations run."""
    spark = edges.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    outw = edges.groupBy("u").agg(F.sum("w").alias("wu"))
    # ONE edge shuffle, persisted: iterations join against this layout.
    # eager persist (plans/cache discipline): the loop body references
    # the table once per iteration within one final job — fill the
    # cache before fan-out so no branch recomputes the edge build.
    from polar_spark.plans.cache import persist_slot

    e = persist_slot(
        edges.join(outw, "u")
        .select("u", "v", "w", "wu")
        .repartition(n_parts, "u"),
        "pagerank.edges",
        eager=True,
    )
    # node table on the same layout (re-attaches zero-in-degree nodes)
    n = persist_slot(
        nodes.repartition(n_parts, "node"), "pagerank.nodes", eager=True
    )
    ranks = n.select("node", F.lit(PR_SCALE).cast("long").alias("r"))

    for _ in range(iterations):
        # edges are hash(u, n_parts); the incoming ranks table is
        # hash(node, n_parts) (from n / from the previous update's
        # repartition) — co-partitioned join, no exchange on either side
        contrib = (
            e.join(ranks, e["u"] == ranks["node"])
            .select("v", F.expr("(r * w) DIV wu").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        # the destination aggregation shuffled by v ≡ node key; the node
        # left join re-keys onto the fixed node layout so the NEXT
        # iteration's edge join is exchange-free again
        ranks = (
            n.join(contrib, n["node"] == contrib["v"], "left")
            .select(
                "node",
                (F.lit(150000) + F.expr("(85 * coalesce(s, 0L)) DIV 100"))
                .cast("long")
                .alias("r"),
            )
            .repartition(n_parts, "node")
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
