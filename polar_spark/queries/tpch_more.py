"""TPC-H completion: the remaining dwarf shapes the testdata schema supports.

relational.py carries q1/q3/q5/q7/q18; this module adds the remaining
SEVENTEEN query shapes, completing all 22 TPC-H dwarfs over the trimmed
TPC-H-ish tables (TESTDATA.md: no partsupp, no l_commitdate /
l_receiptdate / l_shipmode, no o_comment / c_phone). Queries touching a
missing column are ADAPTED — the predicate is re-targeted at an available
column while the query's structural dwarf (the join/subquery/aggregation
shape Catalyst must handle) is preserved exactly; each docstring states
its substitution:

- q4/q9/q13/q17/q19/q22: light adaptations (noted per query).
- q2: partsupp supply-cost -> per-(part,supplier) lineitem quantity; the
  correlated-MIN-subquery + dimension-chain dwarf is intact.
- q11: partsupp stock value -> per-part revenue from one region's
  suppliers; the HAVING-fraction-of-global-scalar dwarf is intact.
- q12: l_shipmode/l_receiptdate -> l_linestatus/late-ship; the
  join + two-way conditional-count dwarf is intact.
- q16: partsupp -> lineitem supplier facts; the COUNT(DISTINCT) +
  NOT-IN-subquery-exclusion dwarf is intact.
- q20: partsupp availqty -> per-(supplier,part) shipped quantity vs the
  part's total; the nested-IN-with-correlated-aggregate dwarf is intact.
- q21: l_commitdate/l_receiptdate lateness -> shipped >60 days after the
  order date; the EXISTS + NOT-EXISTS-on-the-same-fact dwarf is intact.

The reference (polarstreams/polar) has no relational algebra at all
(SURVEY.md §2.2) — this is capability-superset surface, all Catalyst
built-ins, all DuckDB-oracle-checked.

Float determinism contract (same as relational.py): monetary/quantity
doubles are cast to DECIMAL at the scan and summed exactly; ratios and
threshold comparisons are reformulated to multiply-through-by-count
integer-exact decimal forms so row membership can never flip on a
last-bit float difference between engines; only final values are cast
back to DOUBLE with identical expression order on both sides.

Scale notes per query; the shared shape: fact (lineitem/orders) never
broadcast, every dimension (part 2k, supplier 100, nation 25, region 5,
customer 1.5k·sf) broadcast — at 100 TB the facts partition-prune on the
pushed date filters and the only shuffles are the final small-key
aggregations with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# the determinism-critical decimal helpers are SHARED with relational.py —
# a precision change must apply to the whole TPC-H surface at once
from polar_spark.queries.registry import query
from polar_spark.queries.relational import _DEC, _dec
from polar_spark.sources.tables import load_table

_D64 = "DECIMAL(6,4)"
# revenue term shared by most queries: extendedprice * (1 - discount), exact
_REV_SQL = (
    f"CAST(l_extendedprice AS {_DEC}) * "
    f"(CAST(1 AS {_D64}) - CAST(l_discount AS {_D64}))"
)


def _rev():
    one = F.lit(1).cast("decimal(6,4)")
    return _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(6,4)"))


# ---------------------------------------------------------------------------
@query(
    "q4_priority_late_ship",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted: the testdata has
    no l_commitdate, so "late" = a lineitem shipped >60 days after the
    order date (same EXISTS-semi-join structure).

    Scale: the quarter filter pushes to the orders scan; the semi join is
    a shuffled hash semi on orderkey (both sides filtered first — the
    lineitem side only needs l_orderkey + l_shipdate, column-pruned);
    final agg is 5 groups with map-side partials.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
SELECT
  CAST(SUM(CAST(l_extendedprice AS {_DEC}) * CAST(l_discount AS {_D64})) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate.

    Scale: every predicate pushes to the parquet scan (plan-asserted in
    test_plans), projection prunes to 3 columns, and the aggregation is a
    single global partial+final — the cheapest possible shape; at 100 TB
    this is I/O-bound and embarrassingly parallel.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(6,4)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
  CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS {_DEC}) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV_SQL} AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer,
       nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the 8-way join dwarf. Share of
    AMERICA-region ECONOMY-part revenue supplied from NATION_5, by year.

    Scale: lineitem is the only big input; part/supplier/customer/nation
    ×2/region all broadcast (plan-asserted) so the fact table streams
    through 7 broadcast-hash joins with zero pre-join shuffle, then a
    2-group aggregation. Catalyst pushes p_type and the date range to the
    dimension/fact scans.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast("decimal(15,4)")
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            F.col("nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
@query(
    "q9_profit_by_nation",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV_SQL} AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
""",
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit), adapted: the testdata has no
    partsupp, so profit omits the ps_supplycost*l_quantity term and is the
    discounted revenue of '%bolt%' parts by supplier nation and year.

    Scale: part filtered by the LIKE then broadcast; supplier+nation
    broadcast; the lineitem-orders join is the one real shuffle (both
    sides hash on orderkey); ~25·7 output groups.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_rev()).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
  c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY SUM({_REV_SQL}) DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a quarter (ties broken by custkey for a
    deterministic oracle compare).

    Scale: returnflag + date filters push to the fact scans; customer and
    nation broadcast; one shuffle for the per-customer agg; TakeOrdered
    top-20 (no global sort).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q13_order_count_dist",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: the
    o_comment NOT LIKE filter becomes an o_orderpriority exclusion (same
    left-outer-join-with-residual-predicate structure, which is the point
    of the dwarf: the filter must ride the JOIN, not a WHERE — customers
    whose every order is excluded still count at c_count=0).

    Scale: two shuffles (custkey agg, then c_count agg with map-side
    partials). COUNT(o_orderkey) counts non-null matches only — the
    left-outer NULL row contributes 0, identical in both engines.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    oracle=f"""
SELECT
  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS {_DEC}) END) AS DOUBLE)
       * 100.0 / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    PROMO-type parts.

    Scale: date filter pushed to the lineitem scan, part broadcast, one
    global two-accumulator aggregation — no shuffle of fact rows at all.
    Both engines compute (promo*100)/total in the same association order
    on bit-identical decimal sums.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(15,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)).alias("_p"),
            F.sum(_rev()).alias("_t"),
        )
        .select(
            (F.col("_p").cast("double") * F.lit(100.0) / F.col("_t").cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the max quarterly
    revenue — the scalar-subquery-on-an-aggregate dwarf.

    Scale: the fact aggregation shuffles once into |suppliers| rows; the
    max-filter window runs over that already-tiny aggregate (a single
    partition of ~|suppliers| rows, NOT the fact table — the empty
    partitionBy is safe because the windowed input is dimension-sized).
    Exact decimal equality picks the winner identically in both engines.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    w = Window.partitionBy()
    top = rev.withColumn("_mx", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("_mx")
    )
    return top.join(F.broadcast(s), top.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
    )


# ---------------------------------------------------------------------------
@query(
    "q17_small_qty_revenue",
    oracle=f"""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         SUM(CAST(l_quantity AS {_DEC})) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) pa ON a_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND CAST(l_quantity AS {_DEC}) * 5 * cnt < sum_qty
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: p_container
    doesn't exist, so the part filter is brand-only. The correlated
    ``l_quantity < 0.2 * avg(l_quantity)`` predicate is multiplied
    through by ``5 * count`` into exact decimal integer arithmetic —
    row membership cannot flip on a float last bit between engines.

    Scale: the per-part average is ONE extra aggregation over lineitem
    (partkey-hashed, map-side partials) whose 2k-row result broadcasts
    back onto the fact scan — the classic re-aggregation join; the brand
    filter broadcasts part as usual. No fact-fact shuffle join.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey"))
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q19_bracketed_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30))
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: p_container/l_shipmode
    don't exist, so the three disjunctive branches bracket on
    brand × size × quantity (same OR-of-conjunctions-across-the-join
    structure Catalyst must split into join-key + residual).

    Scale: part broadcast; the disjunction stays a residual predicate on
    the broadcast join (no fact shuffle); single global aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 10) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 15) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 25) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q22_dormant_customers",
    oracle=f"""
WITH rich AS (
  SELECT SUM(CAST(c_acctbal AS {_DEC})) AS tot, COUNT(*) AS cnt
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2)
)
SELECT c_nationkey % 5 AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS totacctbal
FROM customer, rich
WHERE c_nationkey % 5 IN (0, 1, 2)
  AND CAST(c_acctbal AS {_DEC}) * cnt > tot
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey % 5
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: no c_phone, so the
    country code is ``c_nationkey % 5``; and because every testdata
    customer has at least one order, "dormant" = no order since
    2000-01-01 (the anti join stays non-vacuous). Above-average-balance
    dormant customers counted per code. The ``c_acctbal > avg(...)``
    scalar-subquery compare is multiplied through by count into exact
    decimal arithmetic (membership can't flip on a float bit).

    Scale: the scalar aggregate is a 1-row broadcast cross join; the
    NOT EXISTS is a shuffled anti join on custkey (orders side pruned to
    one column); final agg is 3 groups.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 5).isin(0, 1, 2)
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("tot"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        c.join(F.broadcast(rich))
        .filter(_dec("c_acctbal") * F.col("cnt") > F.col("tot"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle=f"""
WITH cost AS (
  SELECT l_partkey AS c_partkey, l_suppkey AS c_suppkey,
         SUM(CAST(l_quantity AS {_DEC})) AS supply_qty
  FROM lineitem GROUP BY 1, 2
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(supply_qty AS DOUBLE) AS supply_qty
FROM part, cost, supplier, nation, region
WHERE p_partkey = c_partkey AND s_suppkey = c_suppkey
  AND p_size = 15 AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND supply_qty = (
    SELECT MIN(c2.supply_qty)
    FROM cost c2, supplier s2, nation n2, region r2
    WHERE c2.c_partkey = p_partkey AND s2.s_suppkey = c2.c_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: no partsupp, so
    "supply cost" becomes the total quantity each supplier has ever
    shipped of the part (an exact-decimal per-(part,supplier) aggregate
    over lineitem) — the correlated-MIN-scalar-subquery + dimension-chain
    (supplier -> nation -> region) dwarf is intact. All EUROPE suppliers
    tied at the per-part minimum are returned (no LIMIT: the output is
    bounded by |parts with p_size=15| and fully deterministic).

    Scale: the size-15 part filter broadcasts onto the fact scan BEFORE
    the aggregation (only filtered-part rows are ever aggregated — the
    subquery's cost table restricted to the parts the outer query can
    reference, value-identical); ONE shuffle then builds the
    (part,supplier) aggregate with map-side partials, and the
    correlated min runs as a window over a dimension-sized slice
    (partitionBy part — groups are |suppliers per part|);
    supplier/nation/region all broadcast. No fact-fact join.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cost = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("l_partkey").alias("c_partkey"),
            F.col("l_suppkey").alias("c_suppkey"),
            "p_partkey",
            "p_name",
        )
        .agg(F.sum(_dec("l_quantity")).alias("supply_qty"))
    )
    eu = (
        cost.join(F.broadcast(s), F.col("c_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    w = Window.partitionBy("c_partkey")
    return (
        eu.withColumn("_mn", F.min("supply_qty").over(w))
        .filter(F.col("supply_qty") == F.col("_mn"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("supply_qty").cast("double").alias("supply_qty"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey AS p_key, SUM({_REV_SQL}) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 3
  GROUP BY 1
)
SELECT p_key, CAST(val AS DOUBLE) AS part_value
FROM pv, (SELECT SUM(val) AS tot FROM pv) t
WHERE val * 1000 > tot
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted: no
    partsupp, so a part's "value" is its discounted revenue from region-3
    suppliers instead of supplycost*availqty — the
    HAVING-fraction-of-a-global-scalar-subquery dwarf is intact. The
    0.1% fraction is multiplied through (``val * 1000 > tot``) into exact
    decimal arithmetic so membership can't flip on a float bit.

    Scale: supplier+nation broadcast onto the fact scan (no pre-join
    shuffle), one partkey-hashed aggregation with map-side partials; the
    global total re-aggregates the part-sized result and broadcasts back
    as a 1-row cross join (same pattern as q22).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(_rev()).alias("val"))
    )
    tot = pv.agg(F.sum("val").alias("tot"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("val") * F.lit(1000) > F.col("tot"))
        .select("p_key", F.col("val").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
@query(
    "q12_late_lines_by_status",
    oracle="""
SELECT l_linestatus AS ship_class,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority), adapted: no l_shipmode /
    l_commitdate / l_receiptdate, so the grouping attribute is
    l_linestatus and "late" is shipped >30 days after the order date —
    the fact-fact-join + two-way conditional-count dwarf (the CASE sums
    must ride one pass, not two queries) is intact.

    Scale: the year filter pushes to the lineitem scan; the join shuffles
    both sides on orderkey with the lateness predicate as a join
    residual; the final aggregation is |linestatus| groups with map-side
    partials. At 100 TB the only cost is the one orderkey shuffle.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
@query(
    "q16_supplier_cnt_by_part",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), adapted: no
    partsupp, so the supplier-of-part facts come from lineitem, and the
    "customer complaints" exclusion subquery becomes suppliers with a
    negative account balance — the COUNT(DISTINCT) over a join with a
    NOT-IN-subquery exclusion dwarf is intact (s_suppkey is non-null, so
    NOT IN == anti join in both engines).

    Scale: the brand/type/size filters broadcast part onto the fact
    scan; the exclusion list is a handful of suppliers, broadcast as an
    anti join; COUNT(DISTINCT) expands to the standard two-shuffle
    partial-distinct plan on (brand,type,size,suppkey) — both
    aggregations keyed on low-cardinality composites with map-side
    partials.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
@query(
    "q20_excess_qty_suppliers",
    oracle=f"""
WITH sup_part AS (
  SELECT l_suppkey AS sp_suppkey, l_partkey AS sp_partkey,
         SUM(CAST(l_quantity AS {_DEC})) AS sup_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
), part_tot AS (
  SELECT l_partkey AS pt_partkey, SUM(CAST(l_quantity AS {_DEC})) AS tot_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1
)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 2
  AND s_suppkey IN (
    SELECT sp_suppkey FROM sup_part
    JOIN part_tot ON sp_partkey = pt_partkey
    JOIN part ON p_partkey = sp_partkey
    WHERE p_name LIKE '%bolt%' AND sup_qty * 5 > tot_qty)
""",
)
def q20_excess_qty_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: no partsupp
    availqty, so a supplier qualifies if, for some '%bolt%' part, their
    own 1996 shipped quantity exceeds 20% of the part's total 1996
    quantity (``sup_qty * 5 > tot_qty``, exact decimal) — the
    nested-IN-with-correlated-aggregate dwarf is intact.

    Scale: the '%bolt%' part filter broadcasts onto the fact scan
    BEFORE any aggregation (only qualifying-part rows are aggregated —
    the subquery never references other parts, value-identical); ONE
    reduced fact pass builds the (supplier,part) aggregate; the
    per-part total re-aggregates that already-reduced result (no second
    fact scan — decimal sums re-associate exactly) and broadcasts back;
    the IN becomes a broadcast semi join (the eligible set is bounded
    by qualifying (supplier,part) pairs — dimension-sized), so the
    supplier table never shuffles. Region filter on the broadcast
    nation dimension.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    sup_part = l.groupBy(
        F.col("l_suppkey").alias("sp_suppkey"), F.col("l_partkey").alias("sp_partkey")
    ).agg(F.sum(_dec("l_quantity")).alias("sup_qty"))
    part_tot = sup_part.groupBy(F.col("sp_partkey").alias("pt_partkey")).agg(
        F.sum("sup_qty").alias("tot_qty")
    )
    eligible = (
        sup_part.join(F.broadcast(part_tot), F.col("sp_partkey") == F.col("pt_partkey"))
        .filter(F.col("sup_qty") * F.lit(5) > F.col("tot_qty"))
        .select("sp_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(eligible), s.s_suppkey == F.col("sp_suppkey"), "left_semi")
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted: no
    l_commitdate/l_receiptdate, so a line is "late" when shipped >60 days
    after the order date (the q4 lateness proxy). The EXISTS /
    NOT-EXISTS-on-the-same-fact dwarf is intact in the ORACLE; the Spark
    plan rewrites both correlated subqueries into ONE per-order
    aggregation — a NATION_2 supplier's late line counts iff the order
    is multi-supplier (EXISTS) and that supplier is the ONLY late one
    (NOT EXISTS) — which is the scale-correct form: correlated
    per-row subqueries over a 100 TB fact would rescan it per match.

    Scale: ONE orderkey exchange serves the whole per-order pipeline
    (guide §2.4 — operations keyed the same way share an exchange): the
    'F'-orders join is broadcast (status filter pushed), the fact is
    hash-repartitioned by l_orderkey once, and both the
    (orderkey,suppkey) aggregation and the per-order windows reuse that
    partitioning (HashPartitioning(l_orderkey) satisfies the aggregate's
    ClusteredDistribution(l_orderkey, l_suppkey) and the window's
    ClusteredDistribution(l_orderkey)) — the pre-rework plan paid two
    back-to-back fact-sized exchanges here. Supplier+nation broadcast;
    final agg is supplier-sized with a deterministic top-100.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "_late",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(F.col("_late"), 1).otherwise(0)).alias("n_late_lines"))
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        per_os.withColumn("_nsup", F.count(F.lit(1)).over(w))
        .withColumn(
            "_nlate",
            F.sum(F.when(F.col("n_late_lines") > 0, 1).otherwise(0)).over(w),
        )
        .filter(
            (F.col("n_late_lines") > 0) & (F.col("_nsup") > 1) & (F.col("_nlate") == 1)
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        qual.join(F.broadcast(s), qual.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )
