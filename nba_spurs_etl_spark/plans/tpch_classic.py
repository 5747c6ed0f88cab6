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

from ..functions.scalar import davg_sql, dsum, dsum_sql
from ..sources.catalog import load_table
from .registry import register

def _one() -> F.Column:
    return F.lit(1).cast("decimal(3,2)")


def _ep(c: str = "l_extendedprice") -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _disc() -> F.Column:
    return F.col("l_discount").cast("decimal(4,2)")


_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)


@register(
    "q6_forecast_revenue",
    group="bench 2.2-P10",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
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
    group="2.4 count-distinct",
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
