"""TPC-H completion: the remaining dwarf shapes the testdata schema supports.

relational.py carries q1/q3/q5/q7/q18; this module adds the other eleven
query shapes expressible over the trimmed TPC-H-ish tables (TESTDATA.md:
no partsupp, no l_commitdate/l_receiptdate/l_shipmode, no o_comment /
c_phone — q2/q11/q12/q16/q20/q21 are out of reach; q4/q9/q13/q17/q19/q22
are adapted to available columns, noted per query).

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
