"""Bench headliners: classic TPC-H-shaped queries over the testdata.

These exercise the fact-heavy plans that dominate at 100 TB — selective
scans with full predicate pushdown (Q6), fact x dims with broadcast +
one shuffle agg (Q3/Q5/Q10), and semi-join-by-aggregation (Q18). Each
doubles as operator coverage the reference lacks (multi-way fact joins,
HAVING, exact COUNT(DISTINCT), exact percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import dsum, dsum_sql
from ..sources.catalog import load_table
from .registry import register

def _one() -> F.Column:
    return F.lit(1).cast("decimal(3,2)")


def _ep(c: str = "l_extendedprice") -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _disc() -> F.Column:
    return F.col("l_discount").cast("decimal(12,2)")


_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"
)


@register(
    "q6_forecast_revenue",
    group="bench 2.2-P10",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: the pushdown benchmark — every predicate reaches the "
    "parquet scan (PushedFilters on shipdate/discount/quantity), zero "
    "joins, map-side partial agg to a scalar.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_ep() * _disc()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "q3_shipping_priority",
    group="bench 2.3-J1 2.6-O1",
    oracle=f"""
SELECT l.l_orderkey,
  {_REV_SQL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} AS revenue,
  CAST(o.o_orderdate AS VARCHAR) AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3 shape: filtered customer dim broadcast into orders, "
    "then into lineitem; one shuffle agg by orderkey; top-10 via "
    "TakeOrderedAndProject (no global sort).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_ep() * (_one() - _disc())).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    group="bench 2.3-J6",
    oracle=f"""
SELECT n.n_name,
  {_REV_SQL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
    doc="TPC-H Q5: 6-way join; region/nation/supplier broadcast, the "
    "local-supplier constraint (s_nationkey = c_nationkey) applied as "
    "a join predicate, one agg by nation.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        o.join(
            F.broadcast(
                c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                )
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_ep() * (_one() - _disc())).cast("double").alias("revenue"))
    )


@register(
    "q10_returned_items",
    group="bench 2.3-J1/J2",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
  {_REV_SQL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount")} AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10: returned-revenue per customer; returnflag filter "
    "pushed to the lineitem scan, top-20 via TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_ep() * (_one() - _disc())).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    group="bench 2.4-A1 semi-join",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
  CAST(o.o_orderdate AS VARCHAR) AS orderdate, o.o_totalprice
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    doc="TPC-H Q18 shape: HAVING-filtered aggregation used as a "
    "semi-join (big-order keys), then joined back to dims — the "
    "aggregate shrinks the build side before any wide join.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            "o_totalprice",
        )
    )


@register(
    "distinct_customers",
    group="2.4-A7 count-distinct",
    oracle="""
SELECT o_orderpriority,
  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
  CAST(COUNT(*) AS BIGINT) AS orders_cnt
FROM orders GROUP BY o_orderpriority
""",
    doc="Exact COUNT(DISTINCT) per group (absent from the reference; "
    "expands to a two-phase partial-distinct aggregate in Spark).",
)
def distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("orders_cnt"),
    )


@register(
    "quantity_percentiles",
    group="2.4 percentiles",
    oracle="""
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS p50,
  quantile_cont(l_quantity, 0.9) AS p90,
  quantile_cont(l_quantity, 0.99) AS p99
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact interpolated percentiles per group (Spark percentile == "
    "DuckDB quantile_cont, both 1-based (n-1)p interpolation). The "
    "scale path swaps in approx_percentile (t-digest sketch) — kept "
    "exact here for the oracle.",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.9).alias("p90"),
        F.percentile("l_quantity", 0.99).alias("p99"),
    )


@register(
    "q4_late_shipments",
    group="bench 2.3 semi non-equi",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_cnt
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS with an equi key PLUS a non-equi "
    "row-vs-row predicate (shipdate > orderdate + 90d), planned as a "
    "left-semi hash join with the extra condition evaluated on the "
    "matched pair — no pre-aggregation or distinct needed.",
)
def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_cnt")
    )


@register(
    "q14_promo_share",
    group="bench 2.4 conditional-agg",
    oracle="""
WITH rev AS (
  SELECT p.p_type,
    CAST(l.l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS r
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
)
SELECT 100.0 * COALESCE(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN r END)
                        AS DOUBLE), 0.0)
     / CAST(SUM(r) AS DOUBLE) AS promo_share,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM rev
""",
    doc="TPC-H Q14 shape: part dim broadcast into a one-month lineitem "
    "slice, promo share via null-skipping conditional sum over the "
    "same decimal revenue expression — one scan, one scalar.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_type", (_ep() * (_one() - _disc())).alias("r")
    )
    return rev.agg(
        (
            F.lit(100.0)
            * F.coalesce(
                F.sum(F.when(F.col("p_type").like("PROMO%"), F.col("r"))).cast(
                    "double"
                ),
                F.lit(0.0),
            )
            / F.sum("r").cast("double")
        ).alias("promo_share"),
        F.count(F.lit(1)).alias("line_cnt"),
    )


@register(
    "q2_min_price_supplier",
    group="bench 2.3 correlated-subquery",
    oracle="""
SELECT p.p_partkey, p.p_name, s.s_name, l.l_extendedprice AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 15
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
""",
    doc="TPC-H Q2 shape: correlated scalar subquery (min price per "
    "part) re-expressed as a window MIN partitioned by partkey — one "
    "pass over lineitem instead of a per-row rescan; ties kept, "
    "matching the correlated-equality semantics exactly.",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_partkey")
    cheapest = (
        li.withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .select("l_partkey", "l_suppkey", F.col("l_extendedprice").alias("min_price"))
    )
    return (
        cheapest.join(F.broadcast(p), cheapest.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cheapest.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "min_price")
    )


@register(
    "q16_supplier_breadth",
    group="bench 2.3 anti 2.4 count-distinct",
    oracle="""
SELECT p.p_brand, p.p_size,
  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
    doc="TPC-H Q16 shape: NOT IN over a filtered dim planned as a "
    "broadcast anti join (no null keys in testdata, so anti == NOT IN "
    "here), then exact COUNT(DISTINCT suppkey) per brand x size — the "
    "two-shuffle expanded distinct aggregate.",
)
def q16_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != "Brand#45"
    ).select("p_partkey", "p_brand", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
