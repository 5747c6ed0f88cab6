"""Remaining classic TPC-H query shapes, adapted to the driver testdata.

The testdata is a cut-down TPC-H (no partsupp, no l_shipmode /
l_commitdate / l_receiptdate / c_phone — see TESTDATA.md), so the
queries that touch those columns are re-parameterized onto available
columns while keeping the *plan shape* that makes each query a
benchmark classic:

- Q7  two-nation trade volume: disjunctive pair predicate across two
  aliased dim joins + year bucketing.
- Q8  market share: conditional-numerator / total-denominator ratio
  per group over a region-restricted fact join.
- Q9  product profit: revenue-minus-cost arithmetic across a 4-way
  join, substring part filter (cost = retailprice x qty, standing in
  for the absent ps_supplycost).
- Q11 value concentration: HAVING against a global scalar subquery.
- Q12 shipmode priority: fact-to-fact join + cross-table date
  predicate + conditional priority-class counts (mode = returnflag,
  late = shipped >60 days after order date).
- Q13 customer order-count histogram: LEFT OUTER join preserved into
  a two-level aggregation (distribution of counts).
- Q15 top supplier: argmax via scalar-subquery equality on an exact
  decimal (ties kept, deterministically).
- Q17 small-quantity revenue: per-key correlated average threshold.
- Q19 disjunctive OR-of-ANDs predicate spanning both join sides.
- Q20 excess suppliers: correlated availqty threshold decorrelated
  into one conditional-sum pass (year slice + total together), semi
  joins through part-name prefix and nation.
- Q21 waiting-supplier: multi-EXISTS per group re-expressed as one
  grouped pass (count-distinct + conditional count-distinct), late =
  shipped >90 days after order date.
- Q22 dormant customers: anti join + global-average scalar filter.

All money aggregates follow the engine determinism contract
(``functions.scalar``): exact decimal accumulation, double only at the
surface, so the DuckDB oracles hash-match bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# exact-revenue building blocks (shared shape with tpch_classic)
_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"
)


def _rev() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(12,2)"))
    ).cast("double")


def _rev_dec() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(12,2)"))
    )


@register(
    "q7_nation_trade",
    group="bench 2.3-J6 disjunctive-pair",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l.l_shipdate) AS INT) AS l_year,
  """ + _REV_SQL + """ AS revenue,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 shape: the same dim table joined twice under two "
    "roles (supplier nation / customer nation) with a disjunctive "
    "pair predicate, grouped by derived year. Both nation joins "
    "broadcast; the filter prunes to ~ (2/25)^2 of the fact rows "
    "post-join but the nation equality cannot reach the scan — the "
    "selective pair filter lands right on top of the broadcast joins.",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # The OR-pair implies supp_nation IN {1,2} AND cust_nation IN {1,2};
    # filtering the broadcast dims to 2 rows turns each nation join into
    # a ~2/25 semi-filter on the fact side, long before the residual
    # pair predicate runs.
    names = ["NATION_1", "NATION_2"]
    n1 = n.filter(F.col("n_name").isin(names)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(names)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_rev().alias("revenue"), F.count(F.lit(1)).alias("line_cnt"))
    )


@register(
    "q8_market_share",
    group="bench 2.4 ratio-agg",
    oracle="""
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
           ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
  / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS vol,
    n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) GROUP BY o_year
""",
    doc="TPC-H Q8 shape: market share = conditional numerator over "
    "unconditional denominator in ONE aggregation pass (no self-join, "
    "no second scan) across a 7-way star join; region+type predicates "
    "prune via broadcast dims before the two fact shuffles.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(12,2)")
    )
    dec0 = F.lit(0).cast("decimal(17,4)")
    base = (
        li.join(
            F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA").select("r_regionkey")),
            F.col("n1_reg") == F.col("r_regionkey"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("vol")).otherwise(
                    dec0
                )
            ).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    group="bench 2.4 profit-arith",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
  CAST(SUM(
    CAST(l.l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
    - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2))
  ) AS DOUBLE) AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape: profit = revenue minus cost computed inside "
    "the aggregate across columns from BOTH join sides (part cost x "
    "lineitem qty stands in for the absent ps_supplycost), substring "
    "LIKE filter on the part dim, grouped by supplier nation x year. "
    "Exact decimal subtraction keeps the sum order-independent.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    profit = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(12,2)")
    ) - F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast(
        "decimal(12,2)"
    )
    return (
        li.join(
            F.broadcast(
                p.filter(F.col("p_name").like("%widget%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "q11_value_concentration",
    group="bench 2.4 having-vs-global",
    oracle="""
WITH per_part AS (
  SELECT l.l_partkey,
    SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(v AS DOUBLE) AS value FROM per_part
WHERE CAST(v AS DOUBLE)
      > 1.5 * (CAST((SELECT SUM(v) FROM per_part) AS DOUBLE)
               / (SELECT COUNT(*) FROM per_part))
""",
    doc="TPC-H Q11 shape: per-key value filtered against a global "
    "scalar (1.5x the mean per-part value) — the aggregate is "
    "computed once and reused for both the rows and the threshold "
    "(the oracle's scalar subquery becomes a 1-row broadcast cross "
    "join, not a second scan). Total and mean stay exact decimal "
    "until one final double division, so the boundary comparison is "
    "partitioning-independent.",
)
def q11_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_part = (
        li.join(
            F.broadcast(
                s.join(
                    F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey")
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(_rev_dec().alias("v"))
    )
    mean = per_part.agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("m")
    )
    return (
        per_part.crossJoin(F.broadcast(mean))
        .filter(F.col("v").cast("double") > 1.5 * F.col("m"))
        .select("l_partkey", F.col("v").cast("double").alias("value"))
    )


@register(
    "q13_order_count_histogram",
    group="bench 2.3-J3 2.4 two-level-agg",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) GROUP BY c_count
""",
    doc="TPC-H Q13: distribution of per-customer order counts — LEFT "
    "OUTER join with a join-side predicate (customers with zero "
    "surviving orders must appear as c_count=0), then a second "
    "aggregation over the first's output. The second agg is nearly "
    "free: AQE sees the tiny intermediate and coalesces.",
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "5-LOW"),
            c["c_custkey"] == o["o_custkey"],
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "q15_top_supplier",
    group="bench 2.4-A9 argmax",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
    SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = (SELECT MAX(r) FROM rev)
""",
    doc="TPC-H Q15: top supplier by quarterly revenue — argmax via "
    "equality against a scalar MAX. The comparison happens on the "
    "EXACT decimal (before the double surface cast) so ties and the "
    "max itself are partitioning-independent; the scalar is a 1-row "
    "broadcast, the supplier dim join is a broadcast.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(_rev_dec().alias("r"))
    )
    mx = rev.agg(F.max("r").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    group="bench 2.4 correlated-avg",
    oracle="""
WITH thresh AS (
  SELECT l_partkey,
    0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(l_quantity)) AS t
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
JOIN thresh th ON th.l_partkey = l.l_partkey
WHERE l.l_quantity < th.t
""",
    doc="TPC-H Q17: lines below 20% of their part's average quantity — "
    "the correlated scalar subquery is decorrelated into ONE grouped "
    "pass over lineitem joined back on partkey (no per-row re-scan). "
    "The threshold is an exact-decimal average surfaced as double, so "
    "the < comparison is bit-identical across engines.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("t")
    )
    return (
        li.join(
            F.broadcast(
                p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(thresh, F.col("t_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("t"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    group="bench 2.2-P4 or-of-ands",
    oracle="""
SELECT """ + _REV_SQL.replace("l_extendedprice", "l.l_extendedprice").replace("l_discount", "l.l_discount") + """ AS revenue,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    doc="TPC-H Q19: OR-of-ANDs mixing columns from both join sides. "
    "Catalyst extracts the common single-side implications (brand IN "
    "3-list onto part, quantity in [1,30] onto lineitem) and pushes "
    "them into both scans; the residual disjunction evaluates "
    "post-join inside codegen. The part side shrinks enough to "
    "broadcast.",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(_rev().alias("revenue"), F.count(F.lit(1)).alias("line_cnt"))
    )


@register(
    "q21_waiting_supplier",
    group="bench 2.3 multi-exists",
    oracle="""
WITH per_order AS (
  SELECT l.l_orderkey,
    COUNT(DISTINCT l.l_suppkey) AS n_supp,
    COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN l.l_suppkey END) AS n_late,
    MIN(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
             THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON s.s_suppkey = po.late_supp
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
""",
    doc="TPC-H Q21 shape: suppliers who alone held up a multi-supplier "
    "order (late = shipped >90 days after order date, standing in for "
    "the absent receipt/commit dates). The classic EXISTS + NOT "
    "EXISTS self-joins collapse into ONE grouped pass per order "
    "(count-distinct suppliers vs count-distinct late suppliers) — "
    "two scans and two shuffles become one of each.",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    per_order = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_dormant_customers",
    group="bench 2.3 anti+scalar",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(c_acctbal) AS a
  FROM customer
  WHERE c_acctbal > 0.0
    AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
)
SELECT c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS numcust,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY', 'HOUSEHOLD')
  AND c.c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
    doc="TPC-H Q22 shape: well-funded customers with no orders — "
    "global-average scalar filter (exact-decimal average, identical "
    "on both engines) + NOT EXISTS as a left_anti join against the "
    "orders keys, grouped by segment (segment stands in for the "
    "absent phone country code).",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    segs = ["BUILDING", "MACHINERY", "HOUSEHOLD"]
    seg_c = c.filter(F.col("c_mktsegment").isin(segs))
    avg_bal = seg_c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("a")
    )
    return (
        seg_c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o.select("o_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@register(
    "q12_shipmode_priority",
    group="bench 2.4 conditional-count",
    oracle="""
SELECT l.l_returnflag,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('A', 'R')
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
    doc="TPC-H Q12 shape (l_shipmode/l_commitdate/l_receiptdate absent "
    "from the cut-down schema): 'mode' = l_returnflag IN ('A','R'), "
    "'late' = shipped >60 days after order date (the commit<receipt "
    "ordering predicate re-parameterized). The classic plan: "
    "fact-to-fact equi join on orderkey with the selective lineitem "
    "filter pushed to the scan, then conditional counts split one "
    "pass by a priority-class predicate on the OTHER side of the "
    "join. The cross-table date predicate can only be a post-join "
    "filter — Catalyst still pushes the single-table conjuncts down.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q20_excess_suppliers",
    group="bench 2.4 decorrelated-threshold",
    oracle="""
WITH agg AS (
  SELECT l_partkey, l_suppkey,
    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
        THEN CAST(l_quantity AS DECIMAL(18,2))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS qty_96,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_all
  FROM lineitem GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT a.l_suppkey
  FROM agg a
  JOIN part p ON p.p_partkey = a.l_partkey AND p.p_name LIKE 'red %'
  WHERE a.qty_96 * 2 > a.qty_all
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN excess e ON e.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
""",
    doc="TPC-H Q20 shape (no partsupp): suppliers of 'red' parts whose "
    "1996 shipped quantity exceeds half their all-history quantity "
    "for that part, restricted to one nation. The original's "
    "correlated ps_availqty > 0.5*sum(qty) subquery decorrelates into "
    "ONE conditional-sum pass computing the year slice and the total "
    "together (no second scan, no per-row re-aggregation); the part "
    "name-prefix filter semi-joins the pair aggregate via a broadcast, "
    "and DISTINCT suppkeys make the final supplier join a semi join. "
    "The exact-decimal qty_96*2 > qty_all comparison avoids the 0.5 "
    "float multiply, so the threshold is bit-identical across engines.",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    in_96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    agg = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_96, qty).otherwise(zero)).alias("qty_96"),
        F.sum(qty).alias("qty_all"),
    )
    excess = (
        agg.filter(F.col("qty_96") * 2 > F.col("qty_all"))
        .join(
            F.broadcast(
                p.filter(F.col("p_name").like("red %")).select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_name", "s_acctbal")
    )
