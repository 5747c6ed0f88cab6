"""Core operator catalog: reference-parity query shapes over testdata.

Each query re-expresses one or more operators from SURVEY.md §2 (the
reference's full analytical surface: the 6 dbt gold models in
``/root/reference/dbt/models/spurs_analysis/*.sql`` plus the DAG-side
transforms) as an idiomatic DataFrame pipeline over the driver's
TPC-H-ish tables, paired with a DuckDB oracle.

Scale design notes are inline per query; the common rules:
- dimension joins (region/nation/part/supplier at TPC-H ratios) are
  broadcast — no shuffle of the fact table;
- aggregates are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the shuffle;
- filters/projections sit directly on the scan so they push into
  parquet (PushedFilters/ReadSchema);
- every ranking/limit has a unique tiebreak key → deterministic at any
  parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import davg, davg_sql, dbig, dbig_sql, dsum, dsum_sql
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# A1+A3+F2 — TPC-H Q1-shaped pricing summary (hash agg, conditional math)
# maps: summary_by_season.sql:22-31 aggregation pattern (reference)
# ---------------------------------------------------------------------------

_PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)                       AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)                  AS sum_base_price,
  {disc_price} AS sum_disc_price,
  {charge} AS sum_charge,
  {avg_qty}   AS avg_qty,
  {avg_price} AS avg_price,
  {avg_disc}  AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".format(
    avg_qty=davg_sql("l_quantity"),
    avg_price=davg_sql("l_extendedprice"),
    avg_disc=davg_sql("l_discount", scale=2),
    # dbig (hi/lo split): the scale-4/scale-6 product sums can exceed
    # 2^53 unscaled on edge-fuzzed groups (measured: a charge sum of
    # -9.66e9 at scale 6 = 9.7e15 unscaled, just past 2^53), where
    # DuckDB's int128->double conversion double-rounds 1 ulp off
    # Spark's correctly-rounded cast; splitting into integer +
    # fraction makes each conversion exact on both engines.
    disc_price=dbig_sql(
        "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2))))"
    ),
    charge=dbig_sql(
        "SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))"
        " * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(12,2))))"
    ),
)


@register(
    "pricing_summary",
    group="2.4-A1/A3 2.8-F2/F4",
    oracle=_PRICING_SUMMARY_SQL,
    doc="TPC-H Q1 shape: multi-key hash agg with exact decimal arithmetic. "
    "Partial agg happens map-side (2 flags x 2 statuses = tiny shuffle).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            # dbig: see the oracle-side comment — these product sums
            # breach the 2^53-unscaled direct-cast envelope on edge
            # groups; hi/lo split keeps both engines exactly equal
            dbig(F.sum(ep * (one - disc))).alias("sum_disc_price"),
            dbig(F.sum(ep * (one - disc) * (one + tax))).alias(
                "sum_charge"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Flagship — J1+A1+W1+O2: join dim, conditional sums, dense_rank league table
# maps: summary_by_season.sql:3-42 (games x teams -> wins/losses/rank)
# ---------------------------------------------------------------------------

_SUMMARY_RANK_SQL = """
WITH base AS (
  SELECT
    c.c_mktsegment,
    o.o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS orders_cnt,
    CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
    CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
    {avg_price} AS avg_price
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
)
SELECT
  c_mktsegment, o_orderpriority, orders_cnt, finished_cnt, open_cnt, avg_price,
  CAST(DENSE_RANK() OVER (
    PARTITION BY c_mktsegment
    ORDER BY finished_cnt DESC, open_cnt ASC, avg_price DESC
  ) AS INT) AS segment_rank
FROM base
""".format(avg_price=davg_sql("o.o_totalprice"))


@register(
    "summary_rank",
    group="2.3-J1 2.4-A1 2.5-W1 2.6-O2",
    oracle=_SUMMARY_RANK_SQL,
    doc="Flagship: summary_by_season semantics (join dim, conditional "
    "win/loss sums, dense_rank league table). customer is broadcast at "
    "TPC-H ratios; the window partitions by segment so no single-task "
    "bottleneck at scale.",
)
def summary_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("orders_cnt"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "finished_cnt"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
                "open_cnt"
            ),
            davg("o_totalprice").alias("avg_price"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("finished_cnt"), F.asc("open_cnt"), F.desc("avg_price")
    )
    return base.withColumn("segment_rank", F.dense_rank().over(w).cast("int"))


# ---------------------------------------------------------------------------
# P8+P5+A2 — derived CASE class + LIKE predicates + 3-key group
# maps: home_vs_away.sql:13-34 (venue from LIKE on matchup)
# ---------------------------------------------------------------------------

_PRIORITY_SPLIT_SQL = """
SELECT
  CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
       THEN 'High' ELSE 'Low' END AS priority_class,
  o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  {avg_price} AS avg_price,
  {sum_price} AS total_price
FROM orders
GROUP BY 1, 2
""".format(avg_price=davg_sql("o_totalprice"), sum_price=dsum_sql("o_totalprice"))


@register(
    "priority_class_split",
    group="2.2-P5/P8 2.4-A2 2.8-F3",
    oracle=_PRIORITY_SPLIT_SQL,
    doc="home_vs_away shape: LIKE-derived class as a grouping column.",
)
def priority_class_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cls = F.when(
        F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"),
        F.lit("High"),
    ).otherwise(F.lit("Low"))
    return (
        orders.withColumn("priority_class", cls)
        .groupBy("priority_class", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            davg("o_totalprice").alias("avg_price"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# P3+P4+P5 — equality / IN-list / LIKE predicates pushed into the scan
# maps: players_recommendations.sql:66..132 (position IN-lists), P2/P3 filters
# ---------------------------------------------------------------------------

_FILTER_IN_LIKE_SQL = """
SELECT
  p_brand,
  p_type,
  CAST(COUNT(*) AS BIGINT) AS parts_cnt,
  {avg_price} AS avg_retail
FROM part
WHERE p_type IN ('PROMO', 'ECONOMY') AND p_brand LIKE 'Brand#1%'
GROUP BY p_brand, p_type
""".format(avg_price=davg_sql("p_retailprice"))


@register(
    "filter_in_like",
    group="2.2-P3/P4/P5",
    oracle=_FILTER_IN_LIKE_SQL,
    doc="IN-list + LIKE prefix predicates; both push down to the parquet "
    "scan (verify PushedFilters: In(p_type,..), StringStartsWith).",
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_brand").like("Brand#1%")
        )
        .groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("parts_cnt"),
            davg("p_retailprice").alias("avg_retail"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — fact x broadcast dim join with pushed filter on the dim
# ---------------------------------------------------------------------------

_PROMO_REVENUE_SQL = """
SELECT
  p.p_brand,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_revenue,
  CAST(COUNT(*) AS BIGINT) AS line_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_type = 'PROMO'
GROUP BY p.p_brand
"""


@register(
    "join_dim_broadcast",
    group="2.3-J1",
    oracle=_PROMO_REVENUE_SQL,
    doc="lineitem x part broadcast hash join; part filter applied before "
    "the broadcast so only PROMO part keys ship to executors.",
)
def join_dim_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_brand")
    )
    one = F.lit(1).cast("decimal(3,2)")
    ep = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(ep * (one - disc)).cast("double").alias("promo_revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# J3+J4+J5 — left-join existence flags + max-per-key sub-aggregate
# maps: players_recommendations.sql:16-17,48-51 (is_free_agent/is_injured/
#       max salary via left joins)
# ---------------------------------------------------------------------------

_CUSTOMER_FLAGS_SQL = """
SELECT
  c.c_custkey,
  c.c_name,
  CASE WHEN o.o_custkey IS NOT NULL THEN TRUE ELSE FALSE END AS has_orders,
  CASE WHEN u.o_custkey IS NOT NULL THEN TRUE ELSE FALSE END AS has_urgent,
  o.max_price
FROM customer c
LEFT JOIN (
  SELECT o_custkey, MAX(o_totalprice) AS max_price FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
LEFT JOIN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
) u ON c.c_custkey = u.o_custkey
"""


@register(
    "left_join_flags",
    group="2.3-J3/J4/J5 2.4-A5/A6",
    oracle=_CUSTOMER_FLAGS_SQL,
    doc="Existence flags via left join on pre-aggregated/deduped keys — "
    "the reference's is_free_agent/is_injured/max-salary pattern. "
    "Pre-aggregation shrinks the build side before the join.",
)
def left_join_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders")
    max_price = orders.groupBy("o_custkey").agg(F.max("o_totalprice").alias("max_price"))
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .withColumnRenamed("o_custkey", "u_custkey")
    )
    return (
        cust.join(max_price, cust.c_custkey == max_price.o_custkey, "left")
        .join(urgent, cust.c_custkey == urgent.u_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("o_custkey").isNotNull().alias("has_orders"),
            F.col("u_custkey").isNotNull().alias("has_urgent"),
            "max_price",
        )
    )


# ---------------------------------------------------------------------------
# J6 — multi-way broadcast join over the geo dims
# ---------------------------------------------------------------------------

_GEO_SUPPLIERS_SQL = """
SELECT
  r.r_name,
  n.n_name,
  CAST(COUNT(*) AS BIGINT) AS supplier_cnt,
  {avg_bal} AS avg_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""".format(avg_bal=davg_sql("s.s_acctbal"))


@register(
    "join_three_way_geo",
    group="2.3-J6 2.4-A3",
    oracle=_GEO_SUPPLIERS_SQL,
    doc="3-way chained equi-join; nation+region broadcast, zero shuffle "
    "of supplier until the final tiny aggregation.",
)
def join_three_way_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("supplier_cnt"),
            davg("s_acctbal").alias("avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# W3 — top-1 per group via partitioned row_number
# maps: dbt/target/compiled/.../team_weaknesses.sql:76-79 (best team per season)
# ---------------------------------------------------------------------------

_TOP1_PER_NATION_SQL = """
SELECT n_nationkey, c_custkey, c_name, c_acctbal
FROM (
  SELECT
    c_nationkey AS n_nationkey, c_custkey, c_name, c_acctbal,
    ROW_NUMBER() OVER (
      PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
    ) AS rn
  FROM customer
) t
WHERE rn = 1
"""


@register(
    "top1_per_group",
    group="2.5-W3 2.2-P6",
    oracle=_TOP1_PER_NATION_SQL,
    doc="Classic top-1-per-group; partitioned window scales (one shuffle "
    "by nationkey), tiebreak on custkey keeps it deterministic.",
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            "c_custkey",
            "c_name",
            "c_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# W2+P6 — global ranking with rank-threshold filter
# maps: players_recommendations.sql:26-32,66 (global ROW_NUMBER + rank<=5)
# ---------------------------------------------------------------------------

_GLOBAL_RANK_SQL = """
SELECT s_suppkey, s_name, s_acctbal, bal_rank
FROM (
  SELECT s_suppkey, s_name, s_acctbal,
    CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS INT) AS bal_rank
  FROM supplier
) t
WHERE bal_rank <= 5
"""


@register(
    "global_rank_topk",
    group="2.5-W2 2.2-P6",
    oracle=_GLOBAL_RANK_SQL,
    doc="Un-partitioned ROW_NUMBER is a single-task pattern; at scale we "
    "cut the input to a per-partition top-k first (orderBy+limit does "
    "exactly this: TakeOrderedAndProject), then rank the tiny result.",
)
def global_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    # Scale path: TakeOrderedAndProject(5) per partition + merge on driver,
    # then a trivial 5-row window instead of a global single-task sort.
    top5 = supp.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey")).limit(5)
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return top5.withColumn("bal_rank", F.row_number().over(w).cast("int"))


# ---------------------------------------------------------------------------
# W4+A8+O1 — gaps-and-islands: longest streak of consecutive 'F' orders
# maps: streaks_and_rivals.sql:23-56 (win/loss streaks via running SUM)
# ---------------------------------------------------------------------------

_STREAKS_SQL = """
WITH seq AS (
  SELECT
    o_custkey, o_orderkey,
    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_f,
    SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS brk
  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
),
islands AS (
  SELECT o_custkey, brk, CAST(SUM(is_f) AS BIGINT) AS streak_len
  FROM seq WHERE is_f = 1 GROUP BY o_custkey, brk
),
best AS (
  SELECT o_custkey, MAX(streak_len) AS max_streak FROM islands GROUP BY o_custkey
)
SELECT o_custkey, max_streak
FROM best
ORDER BY max_streak DESC, o_custkey ASC
LIMIT 5
"""


@register(
    "streaks_gaps_islands",
    group="2.5-W4 2.4-A8 2.6-O1",
    oracle=_STREAKS_SQL,
    doc="Gaps-and-islands via running sum of breaks — streaks_and_rivals "
    "semantics. Partitioned by customer (the reference's un-partitioned "
    "ORDER BY game_date would serialize; see SURVEY §7.5). Tiebreak "
    "(o_orderdate, o_orderkey) everywhere.",
)
def streaks_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a streak needs an owner and an order position: NULL custkey would
    # form a pseudo-customer whose tie at the LIMIT boundary resolves
    # differently per engine (NULLS FIRST vs LAST), and NULL dates
    # scramble the island order (differential-fuzzer find)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = orders.select(
        "o_custkey",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_f"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 0).otherwise(1)).over(w).alias("brk"),
    )
    islands = (
        seq.filter(F.col("is_f") == 1)
        .groupBy("o_custkey", "brk")
        .agg(F.sum("is_f").alias("streak_len"))
    )
    best = islands.groupBy("o_custkey").agg(F.max("streak_len").alias("max_streak"))
    return best.orderBy(F.desc("max_streak"), F.asc("o_custkey")).limit(5)


# ---------------------------------------------------------------------------
# U1/U2 — unpivot wide metrics to long
# maps: team_weaknesses_unpivoted.sql:67-156 (7-branch UNION ALL unpivot)
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = """
WITH cust_avg AS (
  SELECT c_nationkey, {avg_cust} AS customer_acctbal
  FROM customer GROUP BY c_nationkey
),
supp_avg AS (
  SELECT s_nationkey, {avg_supp} AS supplier_acctbal
  FROM supplier GROUP BY s_nationkey
),
wide AS (
  SELECT n.n_name, ca.customer_acctbal, sa.supplier_acctbal
  FROM nation n
  JOIN cust_avg ca ON n.n_nationkey = ca.c_nationkey
  LEFT JOIN supp_avg sa ON n.n_nationkey = sa.s_nationkey
)
SELECT n_name, 'customer_acctbal' AS metric, customer_acctbal AS value FROM wide
UNION ALL
SELECT n_name, 'supplier_acctbal' AS metric, supplier_acctbal AS value FROM wide
""".format(avg_cust=davg_sql("c_acctbal"), avg_supp=davg_sql("s_acctbal"))


@register(
    "unpivot_nation_metrics",
    group="2.7-U1/U2",
    oracle=_UNPIVOT_SQL,
    doc="Wide->long via native DataFrame.unpivot (single pass; the "
    "reference's 7x UNION ALL re-reads its CTE once per branch).",
)
def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust_avg = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(davg("c_acctbal").alias("customer_acctbal"))
    )
    supp_avg = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(davg("s_acctbal").alias("supplier_acctbal"))
    )
    wide = (
        n.join(cust_avg, n.n_nationkey == cust_avg.c_nationkey)
        .join(supp_avg, n.n_nationkey == supp_avg.s_nationkey, "left")
        .select("n_name", "customer_acctbal", "supplier_acctbal")
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["customer_acctbal", "supplier_acctbal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# U3 — UNION ALL of per-branch top-k lists with literal labels
# maps: players_recommendations.sql:54-147 (7 top-5 branches)
# ---------------------------------------------------------------------------


def _branch_sql(segment: str, label: str, reason: str) -> str:
    return f"""
SELECT c_custkey, c_name, c_acctbal,
       '{label}' AS target_type, '{reason}' AS reason
FROM (
  SELECT c_custkey, c_name, c_acctbal,
    ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer WHERE c_mktsegment = '{segment}'
) t WHERE rn <= 3"""


_UNION_BRANCHES_SQL = (
    _branch_sql("BUILDING", "Construcción", "Mejores clientes de construcción")
    + "\nUNION ALL\n"
    + _branch_sql("MACHINERY", "Maquinaria", "Mejores clientes de maquinaria")
    + "\nUNION ALL\n"
    + _branch_sql("AUTOMOBILE", "Automóvil", "Mejores clientes de automóvil")
)


@register(
    "union_topk_branches",
    group="2.7-U3 2.8-F5",
    oracle=_UNION_BRANCHES_SQL,
    doc="Heterogeneous top-k branches with UTF-8 literal labels (the "
    "reference's Spanish output contract), unioned by name.",
)
def union_topk_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")

    def branch(segment: str, label: str, reason: str) -> DataFrame:
        # orderBy+limit IS the rank filter (TakeOrderedAndProject —
        # no global sort, no window): re-ranking the 3 surviving rows
        # with a row_number window would be pure dead weight
        return (
            cust.filter(F.col("c_mktsegment") == segment)
            .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
            .limit(3)
            .select(
                "c_custkey",
                "c_name",
                "c_acctbal",
                F.lit(label).alias("target_type"),
                F.lit(reason).alias("reason"),
            )
        )

    b1 = branch("BUILDING", "Construcción", "Mejores clientes de construcción")
    b2 = branch("MACHINERY", "Maquinaria", "Mejores clientes de maquinaria")
    b3 = branch("AUTOMOBILE", "Automóvil", "Mejores clientes de automóvil")
    return b1.unionByName(b2).unionByName(b3)


# ---------------------------------------------------------------------------
# J8+A9 — one-row snapshot assembled from scalar aggregates
# maps: streaks_and_rivals.sql:92-102 (10 scalar subqueries -> 1 row)
# ---------------------------------------------------------------------------

_SCALAR_SNAPSHOT_SQL = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)   AS orders_cnt,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS customers_cnt,
  (SELECT MAX(o_totalprice) FROM orders)          AS max_order_price,
  (SELECT MIN(o_totalprice) FROM orders)          AS min_order_price,
  (SELECT {sum_price} FROM orders)                AS total_order_value
""".format(sum_price=dsum_sql("o_totalprice"))


@register(
    "scalar_snapshot",
    group="2.3-J8 2.4-A9",
    oracle=_SCALAR_SNAPSHOT_SQL,
    doc="Degenerate cross join of scalar aggregates -> exactly 1 row.",
)
def scalar_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.agg(
        F.count(F.lit(1)).alias("orders_cnt"),
        F.max("o_totalprice").alias("max_order_price"),
        F.min("o_totalprice").alias("min_order_price"),
        dsum("o_totalprice").alias("total_order_value"),
    )
    c = cust.agg(F.count(F.lit(1)).alias("customers_cnt"))
    return o.crossJoin(c).select(
        "orders_cnt",
        "customers_cnt",
        "max_order_price",
        "min_order_price",
        "total_order_value",
    )


# ---------------------------------------------------------------------------
# P9 — derived normalization expression reused as a join key
# maps: team_weaknesses_unpivoted.sql:6-7,22-23,49-50,76-77 (season2 join)
# ---------------------------------------------------------------------------

_DERIVED_KEY_JOIN_SQL = """
WITH o_by_period AS (
  SELECT
    CASE WHEN CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) = 1995
         THEN '1995-96'
         ELSE CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS VARCHAR) END AS period,
    CAST(COUNT(*) AS BIGINT) AS orders_cnt
  FROM orders GROUP BY 1
),
l_by_period AS (
  SELECT
    CASE WHEN CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) = 1995
         THEN '1995-96'
         ELSE CAST(CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS VARCHAR) END AS period,
    {rev} AS revenue
  FROM lineitem GROUP BY 1
)
SELECT o.period, o.orders_cnt, l.revenue
FROM o_by_period o
JOIN l_by_period l ON o.period = l.period
""".format(rev=dsum_sql("l_extendedprice"))


@register(
    "derived_key_join",
    group="2.2-P9 2.3-J6",
    oracle=_DERIVED_KEY_JOIN_SQL,
    doc="The season-normalization-as-join-key trap (SURVEY §7.4.3): the "
    "identical derived expression computed on both sides pre-join.",
)
def derived_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    def period(col):
        y = F.year(col).cast("int")
        return F.when(y == 1995, F.lit("1995-96")).otherwise(y.cast("string"))

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        orders.groupBy(period(F.col("o_orderdate")).alias("period"))
        .agg(F.count(F.lit(1)).alias("orders_cnt"))
    )
    l = (
        li.groupBy(period(F.col("l_shipdate")).alias("period"))
        .agg(dsum("l_extendedprice").alias("revenue"))
    )
    return o.join(l, "period").select("period", "orders_cnt", "revenue")


# ---------------------------------------------------------------------------
# F1 — split_part extraction
# maps: streaks_and_rivals.sql:64-65,80-81 (opponent from matchup)
# ---------------------------------------------------------------------------

_SPLIT_PART_SQL = """
SELECT
  CASE WHEN p_brand IS NULL THEN NULL
       ELSE split_part(p_brand, '#', 2) END AS brand_series,
  CAST(COUNT(*) AS BIGINT) AS parts_cnt,
  {avg_sz} AS avg_size
FROM part
GROUP BY 1
""".format(avg_sz=davg_sql("p_size", scale=0))
# explicit NULL branch: DuckDB's split_part(NULL, ...) returns ''
# (documented quirk) while Spark NULL-propagates — without it a NULL
# brand merges into the '' series group (differential-fuzzer class)


@register(
    "split_part_extract",
    group="2.8-F1",
    oracle=_SPLIT_PART_SQL,
    doc="split_part string surgery (Postgres-compatible '' on missing).",
)
def split_part_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_series")
        )
        .agg(
            F.count(F.lit(1)).alias("parts_cnt"),
            davg("p_size", scale=0).alias("avg_size"),
        )
    )


# ---------------------------------------------------------------------------
# §2.11 — data-quality assertions as a query (dbt-test semantics)
# ---------------------------------------------------------------------------

_QUALITY_SQL = """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer WHERE c_name IS NULL)  AS null_names,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
    WHERE o_orderstatus NOT IN ('P','O','F'))                           AS bad_status,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events
    WHERE event_type NOT IN ('click','view','signup','purchase','error')) AS bad_event_type
"""


@register(
    "quality_assertions",
    group="2.11",
    oracle=_QUALITY_SQL,
    doc="not_null + accepted_values checks compiled to violation counts "
    "(the reference's 12 dbt schema tests -> SELECTs that must be 0).",
)
def quality_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    a = cust.filter(F.col("c_name").isNull()).agg(
        F.count(F.lit(1)).alias("null_names")
    )
    b = orders.filter(~F.col("o_orderstatus").isin("P", "O", "F")).agg(
        F.count(F.lit(1)).alias("bad_status")
    )
    c = events.filter(
        ~F.col("event_type").isin("click", "view", "signup", "purchase", "error")
    ).agg(F.count(F.lit(1)).alias("bad_event_type"))
    return a.crossJoin(b).crossJoin(c)
