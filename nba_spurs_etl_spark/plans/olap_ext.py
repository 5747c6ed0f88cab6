"""Catalog registration: OLAP-completeness operators.

Operators absent from the reference (SURVEY §2 marks them absent) but
table-stakes for a general engine: explicit semi/anti joins, INTERSECT/
EXCEPT, pivot, rollup/cube grouping sets, as-of joins, and approximate
sketches. All but the sketches carry exact DuckDB oracles (sketch
algorithms differ across engines by design -> rows-only check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import (
    davg_sql,
    dbig,
    dbig_sql,
    dsum,
    dsum_sql,
    epoch_us,
    md5_long_sql,
)
from ..operators.joins import asof_join_backward
from ..sources.catalog import load_table
from .registry import register

#: one shared justification for the five prefix-sum entries'
#: SINGLE_PARTITION_DATA suppressions — a single constant so a future
#: correction cannot leave a stale rationale on a live suppression
_PREFIX_SUM_ALLOW_WHY = (
    "the only SinglePartition exchange is the two-phase prefix sum's "
    "|buckets|-row offsets window (operators/prefix.py) — bucket count "
    "is a small literal, never data- or key-grain"
)

# ---------------------------------------------------------------------------
# explicit semi / anti joins (the reference only emulates them, J3/J4)
# ---------------------------------------------------------------------------


@register(
    "join_semi_anti",
    group="2.3 semi/anti",
    oracle="""
SELECT c_mktsegment,
  CAST(SUM(CASE WHEN EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  ) THEN 1 ELSE 0 END) AS BIGINT) AS with_orders,
  CAST(SUM(CASE WHEN NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  ) THEN 1 ELSE 0 END) AS BIGINT) AS without_orders
FROM customer c
GROUP BY c_mktsegment
""",
    doc="left_semi / left_anti joins (EXISTS / NOT EXISTS): Spark plans "
    "these as broadcast/shuffled hash joins that never materialize "
    "right-side columns.",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return (
        semi.join(anti, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


# ---------------------------------------------------------------------------
# set operations (absent from the reference: SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "setops_intersect_except",
    group="2.7 intersect/except",
    oracle="""
WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
low AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'),
both_kinds AS (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM low),
only_urgent AS (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM low)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM both_kinds)  AS both_priorities,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM only_urgent) AS urgent_only
""",
    doc="INTERSECT / EXCEPT (distinct set semantics) — planned as "
    "left-semi/anti over distinct inputs.",
)
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both_kinds = urgent.intersect(low).agg(
        F.count(F.lit(1)).alias("both_priorities")
    )
    only_urgent = urgent.subtract(low).agg(  # subtract == EXCEPT DISTINCT
        F.count(F.lit(1)).alias("urgent_only")
    )
    return both_kinds.crossJoin(only_urgent)


# ---------------------------------------------------------------------------
# pivot (reverse of the reference's unpivots)
# ---------------------------------------------------------------------------


@register(
    "pivot_status_counts",
    group="2.7 pivot",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f
FROM orders GROUP BY o_orderpriority
""",
    doc="groupBy().pivot() with explicit pivot values (never let Spark "
    "scan for distinct pivot values at 100 TB — pass them).",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["P", "O", "F"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("P", F.lit(0)).alias("cnt_p"),
            F.coalesce("O", F.lit(0)).alias("cnt_o"),
            F.coalesce("F", F.lit(0)).alias("cnt_f"),
        )
    )


# ---------------------------------------------------------------------------
# rollup / cube grouping sets
# ---------------------------------------------------------------------------


@register(
    "rollup_orders",
    group="2.4 rollup",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS orders_cnt,
  {dsum_sql("o_totalprice")} AS total_value
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
HAVING COUNT(*) > 0
""",
    doc="ROLLUP hierarchy subtotals (priority -> status -> grand total) "
    "— one pass, grouping-set expansion handled by the engine. "
    "EMPTY-INPUT CONTRACT (edge-fuzz find, r07k): ANSI/Postgres/DuckDB "
    "emit the grand-total grouping set even on an empty table; Spark "
    "does not (the internal grouping_id is itself a grouping key), and "
    "this engine keeps Spark's semantics — synthesizing the row would "
    "cost a second full input scan, the wrong trade at 100 TB. The "
    "oracle's HAVING COUNT(*) > 0 is a no-op on any non-empty input "
    "(every real group has >= 1 row) and encodes exactly that contract.",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("orders_cnt"),
        dsum("o_totalprice").alias("total_value"),
    )


@register(
    "cube_orders",
    group="2.4 cube",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS orders_cnt,
  {davg_sql("o_totalprice")} AS avg_value
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
HAVING COUNT(*) > 0
""",
    doc="CUBE over (priority, status): all 4 grouping sets in one pass. "
    "Empty-input contract as rollup_orders: Spark's grouping-sets "
    "aggregation emits nothing on an empty table (no ANSI grand-total "
    "row); the oracle's HAVING COUNT(*) > 0 is a no-op on non-empty "
    "input and pins that engine semantics.",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import davg

    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("orders_cnt"),
        davg("o_totalprice").alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# as-of join (purchase -> latest preceding click per user)
# ---------------------------------------------------------------------------


@register(
    "asof_purchase_click",
    group="ext-join asof",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
  CAST(epoch_us(c.ts) AS BIGINT) AS last_click_us
FROM (SELECT * FROM purchases WHERE ts IS NOT NULL) p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
UNION ALL
SELECT event_id, user_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM purchases WHERE ts IS NULL
""",
    doc="As-of (backward) join: latest click at-or-before each purchase, "
    "per user. Spark composition: union + one key-partitioned sort + "
    "last(ignorenulls) window — no range-join explosion (see "
    "operators/joins.py). Oracle: DuckDB's native ASOF JOIN, with the "
    "NULL-probe-time branch made explicit: a purchase with no "
    "timestamp matches NO click ('ts >= NULL' is not a match; "
    "DuckDB's ASOF implementation would otherwise hand it the user's "
    "LATEST click via its NULLS-LAST merge order — differential-"
    "fuzzer find), and NULL-key/NULL-time clicks are non-matches on "
    "both sides (operators/joins.asof_join_backward).",
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_us("ts").alias("purchase_us")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", epoch_us("ts").alias("click_us")
    )
    joined = asof_join_backward(
        purchases,
        clicks,
        key="user_id",
        left_time="purchase_us",
        right_time="click_us",
        payload={"click_us": "last_click_us"},
    )
    return joined.select("event_id", "user_id", "purchase_us", "last_click_us")


# ---------------------------------------------------------------------------
# approximate sketches, bracket-checked (sketch values are
# engine-specific; the published error BOUNDS are not)
# ---------------------------------------------------------------------------

#: approx_count_distinct's rsd, passed EXPLICITLY below so the bound
#: and the sketch configuration cannot drift apart across Spark
#: upgrades (ADVICE r08); _ACD_BOUND is its 3-sigma
_ACD_RSD = 0.05
_ACD_BOUND = 0.15
#: approx_percentile accuracy, likewise explicit: rank error <=
#: n/accuracy
_APCT_ACC = 10_000


@register(
    "approx_sketches",
    group="2.4 approx",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS users_within_bound,
  TRUE AS p50_within_bound,
  TRUE AS p99_within_bound
FROM events GROUP BY event_type
""",
    doc="approx_count_distinct (HyperLogLog++) + approx_percentile "
    "(Greenwald-Khanna) per event_type — the sub-linear-memory forms "
    "of distinct_customers / quantity_percentiles for 100 TB "
    "cardinality work. Sketch VALUES are engine-specific, so the "
    "BRACKET is the oracle contract (the events_hll_daily_rollup "
    "pattern): the exact count-distinct rides along with "
    "users_within_bound = |est - exact| <= 3-sigma of the default "
    "rsd, and each percentile estimate is checked against its "
    "published rank-error guarantee (n/accuracy, +2 ranks slack for "
    "rounding) — DuckDB recomputes the exact side and asserts TRUE. "
    "The rank check is SORT-FREE: the estimate (a real data point) "
    "occupies ranks (count(value<est), count(value<=est)] in the "
    "group's order, so in-bound ≡ that interval overlaps the "
    "permitted window [ceil(q*n)-err, ceil(q*n)+err] — one broadcast "
    "of the tiny estimate frame back onto events plus conditional "
    "counts, instead of a per-group full sort (measured 8.5 s -> "
    "~1 s at sf0.1).",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", _ACD_RSD).alias("approx_users"),
        F.approx_percentile("value", 0.5, _APCT_ACC).alias("approx_p50"),
        F.approx_percentile("value", 0.99, _APCT_ACC).alias("approx_p99"),
        F.count(F.lit(1)).alias("events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    # null-safe join keys throughout: the NULL event_type group is a
    # real group in both frames, and a plain equi-join would drop it
    # (NULL != NULL), leaving NULL bound booleans vs the oracle's TRUE
    est = sk.select(
        F.col("event_type").alias("_bt"), "approx_p50", "approx_p99"
    )
    counted = (
        ev.join(
            F.broadcast(est), ev["event_type"].eqNullSafe(F.col("_bt"))
        )
        .groupBy("_bt")
        .agg(
            F.count("value").alias("n"),
            F.count(
                F.when(F.col("value") < F.col("approx_p50"), 1)
            ).alias("lt50"),
            F.count(
                F.when(F.col("value") <= F.col("approx_p50"), 1)
            ).alias("le50"),
            F.count(
                F.when(F.col("value") < F.col("approx_p99"), 1)
            ).alias("lt99"),
            F.count(
                F.when(F.col("value") <= F.col("approx_p99"), 1)
            ).alias("le99"),
        )
    )
    err = (F.col("n") / F.lit(_APCT_ACC)).cast("long") + F.lit(2)

    def lo(q):
        return F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(q) * F.col("n")).cast("long") - err,
        )

    def hi(q):
        return F.least(
            F.col("n"), F.ceil(F.lit(q) * F.col("n")).cast("long") + err
        )

    def pct_ok(lt, le, q):
        # zero non-null values => NULL estimate and empty rank window:
        # vacuously in bound, like the oracle's TRUE. Otherwise the
        # estimate's occupied rank interval (lt, le] must overlap
        # [lo, hi] — equivalent to value_at(lo) <= est <= value_at(hi)
        # without materializing the order statistics.
        return F.when(
            F.coalesce(F.col("n"), F.lit(0)) == 0, F.lit(True)
        ).otherwise(
            (F.col(lt) + F.lit(1) <= hi(q)) & (F.col(le) >= lo(q))
        )

    return sk.join(
        counted, sk["event_type"].eqNullSafe(F.col("_bt")), "left"
    ).select(
        sk["event_type"],
        "events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(_ACD_BOUND) * F.col("exact_users")
        ).alias("users_within_bound"),
        pct_ok("lt50", "le50", 0.5).alias("p50_within_bound"),
        pct_ok("lt99", "le99", 0.99).alias("p99_within_bound"),
    )


# ---------------------------------------------------------------------------
# range join (point-in-interval) via bucketing
# ---------------------------------------------------------------------------

_SIX_H = 6 * 3600 * 1_000_000
_TWELVE_H = 2 * _SIX_H
_EIGHTEEN_H = 3 * _SIX_H


@register(
    "range_join_user_windows",
    group="ext-join range",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, MIN(epoch_us(ts)) AS f FROM events GROUP BY user_id
),
intervals AS (
  SELECT user_id, user_id * 10 AS interval_id,
         f AS start_us, f + {_SIX_H} AS end_us
  FROM firsts
  UNION ALL
  SELECT user_id, user_id * 10 + 1,
         f + {_TWELVE_H}, f + {_EIGHTEEN_H}
  FROM firsts
)
SELECT i.interval_id, i.user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM intervals i
JOIN events e ON e.user_id = i.user_id
  AND epoch_us(e.ts) >= i.start_us AND epoch_us(e.ts) < i.end_us
GROUP BY i.interval_id, i.user_id
""",
    doc="Range (point-in-interval) join: per-user activity inside two "
    "6-hour windows anchored at the user's first event. Spark "
    "composition: interval -> covering-hour-bucket explosion + "
    "(key, bucket) equi-join + exact containment filter (see "
    "operators/joins.range_join_buckets). Oracle: plain inequality "
    "join in DuckDB.",
)
def range_join_user_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join_buckets

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("us"), "value"
    )
    firsts = ev.groupBy("user_id").agg(F.min("us").alias("f"))
    iv1 = firsts.select(
        "user_id",
        (F.col("user_id") * 10).alias("interval_id"),
        F.col("f").alias("start_us"),
        (F.col("f") + _SIX_H).alias("end_us"),
    )
    iv2 = firsts.select(
        "user_id",
        (F.col("user_id") * 10 + 1).alias("interval_id"),
        (F.col("f") + _TWELVE_H).alias("start_us"),
        (F.col("f") + _EIGHTEEN_H).alias("end_us"),
    )
    intervals = iv1.unionByName(iv2)
    joined = range_join_buckets(
        ev, intervals, key="user_id", point_time="us",
        start="start_us", end="end_us", bucket_width=3600 * 1_000_000,
    )
    return joined.groupBy("interval_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


#: fixed-point field: coords in [0, 10000) centi-units (a 100x100
#: plane), radius 150 = 1.5 units -> expected pair density
#: |S|*|C|*pi*r^2/1e8, ~100 pairs at sf0.01
_GEO_MOD, _GEO_R = 10_000, 150


@register(
    "geo_radius_join_grid",
    group="ext-join spatial",
    oracle=f"""
WITH s AS (
  SELECT s_suppkey,
    {md5_long_sql("'gxs_' || CAST(s_suppkey AS VARCHAR)")} % {_GEO_MOD} AS sx,
    {md5_long_sql("'gys_' || CAST(s_suppkey AS VARCHAR)")} % {_GEO_MOD} AS sy
  FROM supplier
),
c AS (
  SELECT c_custkey,
    {md5_long_sql("'gxc_' || CAST(c_custkey AS VARCHAR)")} % {_GEO_MOD} AS cx,
    {md5_long_sql("'gyc_' || CAST(c_custkey AS VARCHAR)")} % {_GEO_MOD} AS cy
  FROM customer
)
SELECT s_suppkey, c_custkey,
  CAST((sx-cx)*(sx-cx) + (sy-cy)*(sy-cy) AS BIGINT) AS dist2
FROM s JOIN c ON (sx-cx)*(sx-cx) + (sy-cy)*(sy-cy) <= {_GEO_R * _GEO_R}
""",
    doc="Spatial radius join (supplier x customer within 1.5 units on "
    "a hash-synthesized 100x100 plane): the grid-bucketed composition "
    "Spark lacks natively — cell width = radius, the left side "
    "explodes into its 3x3 neighbor cells, candidates are a plain "
    "equi-join on (cell_x, cell_y), and the refine dx^2+dy^2 <= r^2 "
    "runs in pure BIGINT (no float geometry; bit-exact cross-engine). "
    "A cross join + filter plans a cartesian and dies at scale; the "
    "grid form shuffles on the cell key and is AQE-splittable on "
    "density skew (operators/joins.py::grid_radius_join). The oracle "
    "IS the naive quadratic form — DuckDB proves the grid composition "
    "loses no pair.",
)
def geo_radius_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import md5_long
    from ..operators.joins import grid_radius_join

    def coords(df, key, px, py, xc, yc):
        k = F.col(key).cast("string")
        return df.select(
            key,
            (md5_long(F.concat(F.lit(px), k)) % _GEO_MOD).alias(xc),
            (md5_long(F.concat(F.lit(py), k)) % _GEO_MOD).alias(yc),
        )

    s = coords(
        load_table(spark, sf_dir, "supplier"), "s_suppkey",
        "gxs_", "gys_", "sx", "sy",
    )
    c = coords(
        load_table(spark, sf_dir, "customer"), "c_custkey",
        "gxc_", "gyc_", "cx", "cy",
    )
    return grid_radius_join(s, c, "sx", "sy", "cx", "cy", _GEO_R).select(
        "s_suppkey", "c_custkey", "dist2"
    )


# ---------------------------------------------------------------------------
# hypertable-style cascade rollup + skew-safe aggregation
# ---------------------------------------------------------------------------


@register(
    "hypertable_rollup_1h",
    group="ext-rollup hypertable",
    oracle="""
SELECT
  CAST(make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS VARCHAR)
    AS bucket_start,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
GROUP BY 1, 2
""",
    doc="Hypertable cascade rollup: raw -> 1-min partials -> 5-min -> "
    "1-hour, each level derived from the previous (raw data scanned "
    "ONCE); avg carried as sum+count and finalized last. The oracle "
    "aggregates raw directly — proving the cascade re-aggregation is "
    "lossless.",
)
def hypertable_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import rollups

    ev = load_table(spark, sf_dir, "events")
    m1 = rollups.rollup_finest(ev, "ts", ["event_type"], "value", 60)
    m5 = rollups.rollup_coarser(m1, ["event_type"], 300, finer_seconds=60)
    h1 = rollups.rollup_coarser(m5, ["event_type"], 3600, finer_seconds=300)
    return rollups.finalize_rollup(h1, ["event_type"])


@register(
    "salted_two_phase_agg",
    group="ext-skew 2.4",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events
GROUP BY event_type
""",
    doc="Skew-safe two-phase aggregation: salt (16 buckets) -> partial "
    "agg on (key, salt) -> merge per key. Identical result to the "
    "direct groupBy (the oracle), which is the point — the salt only "
    "changes the shuffle layout, spreading a hot key over 16 tasks.",
)
def salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import rollups

    ev = load_table(spark, sf_dir, "events")
    return rollups.two_phase_agg(ev, ["event_type"], "value", salt_buckets=16)


# ---------------------------------------------------------------------------
# analytic window functions (absent from the reference, SURVEY §2.5:
# "Analytic functions (lag/lead/ntile) absent")
# ---------------------------------------------------------------------------


@register(
    "window_analytics",
    group="2.5 analytic",
    oracle="""
SELECT o_custkey, o_orderkey,
  CAST(o_orderdate AS VARCHAR) AS orderdate,
  o_totalprice,
  LAG(o_totalprice) OVER w AS prev_price,
  LEAD(o_totalprice) OVER w AS next_price,
  o_totalprice - LAG(o_totalprice) OVER w AS price_delta,
  CAST(NTILE(4) OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT
  ) AS spend_quartile,
  FIRST_VALUE(o_orderkey) OVER w AS first_order,
  LAST_VALUE(o_orderkey) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS latest_order
FROM orders WHERE o_orderdate IS NOT NULL
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Analytic window family over per-customer order history: "
    "lag/lead deltas, ntile spend quartiles, first/last order. One "
    "shuffle on o_custkey serves every function (same partitioning "
    "reused across window specs); frames are explicit where the "
    "default RANGE frame would truncate (last_value).",
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:

    # dateless orders have no position in the per-customer date order
    # (differential-fuzzer find, same contract as window_dist_functions)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ntile_w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("string").alias("orderdate"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias(
            "price_delta"
        ),
        F.ntile(4).over(ntile_w).alias("spend_quartile"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("latest_order"),
    )


# ---------------------------------------------------------------------------
# CDC merge / upsert (lakehouse MERGE INTO expressed over bare parquet)
# ---------------------------------------------------------------------------


def orders_cdc_frames(o: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(base snapshot, I/U/D changelog) derived from orders — shared by
    the batch merge query and its streaming foreachBatch twin (which
    reuses the same oracle). Changelog keys are mutually disjoint, so
    any micro-batch partitioning of it converges to the same state."""
    base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    k = F.col("o_orderkey")
    updates = o.filter(k % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("op"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    deletes = o.filter((k % 7 != 0) & (k % 11 == 0)).select(
        "o_orderkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    inserts = o.filter(k % 13 == 0).select(
        (k + 100000000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.5).alias("o_totalprice"),
    )
    changelog = updates.unionByName(deletes).unionByName(inserts)
    return base, changelog


#: SQL twin of orders_cdc_frames + merge_cdc, shared by BOTH oracles
#: below (merge_cdc_orders, cdc_snapshot_diff) so the changelog rule
#: has exactly one definition per engine: editing the %7/%11/%13
#: moduli or the +1000 update delta in one hand-kept copy but not the
#: other would silently break the diff entry's documented
#: added==inserts / removed==deletes validation invariant (same
#: rationale as analytics_ext._MARKOV_PAIR_CTES).
_CDC_MERGED_CTES = """chg AS (
  SELECT o_orderkey, 'U' AS op, 'X' AS o_orderstatus,
    o_totalprice + 1000 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, 'D', NULL, NULL
  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, 'I', 'N', 1.5
  FROM orders WHERE o_orderkey % 13 = 0
),
merged AS (
  SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
    CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
         ELSE b.o_orderstatus END AS o_orderstatus,
    CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
         ELSE b.o_totalprice END AS o_totalprice
  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) b
  FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
  WHERE c.op IS NULL OR c.op <> 'D'
)"""


@register(
    "merge_cdc_orders",
    group="ext-merge",
    oracle=f"""
WITH {_CDC_MERGED_CTES}
SELECT o_orderkey, o_orderstatus, o_totalprice FROM merged
""",
    doc="CDC merge: I/U/D changelog applied onto the orders snapshot "
    "via one full-outer join on the merge key (operators/merge.py). "
    "Full-outer can never broadcast, so the scale layout is bucketing "
    "both sides by the key; changelog is one-winning-op-per-key.",
)
def merge_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_cdc

    base, changelog = orders_cdc_frames(load_table(spark, sf_dir, "orders"))
    return merge_cdc(base, changelog, ["o_orderkey"])


@register(
    "grouping_sets_orders",
    group="2.4 grouping-sets",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
  CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT)
    AS gid,
  CAST(COUNT(*) AS BIGINT) AS orders_cnt,
  {dsum_sql("o_totalprice")} AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
HAVING COUNT(*) > 0
""",
    doc="Arbitrary GROUPING SETS (neither ROLLUP nor CUBE): per-priority "
    "totals, per-status totals, and the grand total in ONE pass, with "
    "grouping_id disambiguating the all-NULL grand-total row from any "
    "genuine NULL group. Same single-shuffle expansion as rollup/cube, "
    "and the same empty-input contract (HAVING COUNT(*) > 0 in the "
    "oracle — see rollup_orders).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("orders_cnt"),
            dsum("o_totalprice").alias("total_value"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "gid", "orders_cnt", "total_value"
        )
    )


@register(
    "rolling_7d_customer_revenue",
    group="2.5 range-frame",
    oracle=f"""
WITH per_day AS (
  SELECT o_custkey, (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day_no,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev,
    CAST(COUNT(*) AS BIGINT) AS day_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_custkey, CAST(day_no AS BIGINT) AS day_no,
  CAST(SUM(day_rev) OVER w AS DOUBLE) AS rev_7d,
  CAST(SUM(day_orders) OVER w AS BIGINT) AS orders_7d
FROM per_day
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="Rolling 7-day revenue per customer: a true RANGE frame over an "
    "integer day index (date-diff from epoch, calendar-exact and\n    timezone-free on both "
    "engines; an interval frame over raw timestamps would tie-break "
    "differently). Pre-aggregating to customer-days first shrinks the "
    "window input from |orders| to |customer-days| BEFORE the sort — "
    "the frame never re-reads raw orders. Decimal day sums keep the "
    "running totals exact.",
)
def rolling_7d_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:

    orders = load_table(spark, sf_dir, "orders")
    per_day = (
        orders.groupBy(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_no"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_rev"),
            F.count(F.lit(1)).alias("day_orders"),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-6, Window.currentRow)
    )
    return per_day.select(
        "o_custkey",
        "day_no",
        F.sum("day_rev").over(w).cast("double").alias("rev_7d"),
        F.sum("day_orders").over(w).alias("orders_7d"),
    )


@register(
    "table_profile_orders",
    group="2.11 ext-quality",
    oracle="""
WITH m AS (
  SELECT 'o_orderkey' AS col_name, CAST(NULL AS VARCHAR) AS value_str,
         CAST(o_orderkey AS DOUBLE) AS value_num FROM orders
  UNION ALL SELECT 'o_custkey', CAST(NULL AS VARCHAR),
         CAST(o_custkey AS DOUBLE) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus,
         CAST(NULL AS DOUBLE) FROM orders
  UNION ALL SELECT 'o_totalprice', CAST(NULL AS VARCHAR),
         o_totalprice FROM orders
  UNION ALL SELECT 'o_orderdate', CAST(NULL AS VARCHAR),
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS DOUBLE)
         FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority,
         CAST(NULL AS DOUBLE) FROM orders
)
SELECT col_name,
  CAST(COUNT(*) AS BIGINT) AS row_cnt,
  CAST(COUNT(*) FILTER (WHERE value_str IS NULL AND value_num IS NULL)
       AS BIGINT) AS null_cnt,
  CAST(COUNT(DISTINCT value_str) + COUNT(DISTINCT value_num) AS BIGINT)
       AS distinct_cnt,
  MIN(value_num) AS min_num, MAX(value_num) AS max_num,
  MIN(value_str) AS min_str, MAX(value_str) AS max_str
FROM m GROUP BY col_name
""",
    doc="Whole-table column profiler in ONE scan: per column, exact "
    "row/null/distinct counts plus min/max. Columns are melted to "
    "(col_name, value_str, value_num) rows via a generator projection "
    "— the table is read once and the melt is narrow (no shuffle "
    "before the agg), vs the naive per-column UNION that scans the "
    "fact table |columns| times (the oracle's shape — identical "
    "semantics, 6x the reads). Numerics profile on an exact double "
    "axis, timestamps on epoch days, strings lexicographically, so no "
    "engine-specific float-to-string rendering is ever compared. "
    "Exact COUNT(DISTINCT) costs a two-phase expand; swap in "
    "approx_count_distinct at 100 TB when +-2% is acceptable "
    "(approx_sketches shows that path).",
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spec = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
    null_str = F.lit(None).cast("string")
    null_num = F.lit(None).cast("double")
    entries = []
    for c, kind in spec:
        if kind == "str":
            vs, vn = F.col(c).cast("string"), null_num
        elif kind == "ts":
            # epoch-day axis: NTZ-safe and timezone-free on both engines
            vs = null_str
            vn = F.datediff(
                F.col(c).cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("double")
        else:
            vs, vn = null_str, F.col(c).cast("double")
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                vs.alias("value_str"),
                vn.alias("value_num"),
            )
        )
    melted = orders.select(F.explode(F.array(*entries)).alias("m")).select("m.*")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum(
            (F.col("value_str").isNull() & F.col("value_num").isNull()).cast(
                "bigint"
            )
        ).alias("null_cnt"),
        (F.count_distinct("value_str") + F.count_distinct("value_num")).alias(
            "distinct_cnt"
        ),
        F.min("value_num").alias("min_num"),
        F.max("value_num").alias("max_num"),
        F.min("value_str").alias("min_str"),
        F.max("value_str").alias("max_str"),
    )


@register(
    "stats_linear_fit",
    group="2.4 ext-stats",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    (CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2)))) AS DOUBLE)
     + CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2)))
          - FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2)))) AS DOUBLE)) AS sxx,
    (CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)
     + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))
          - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)) AS syy,
    (CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)
     + CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))
          - FLOOR(SUM(CAST(l_quantity AS DECIMAL(18,2))
           * CAST(l_extendedprice AS DECIMAL(18,2)))) AS DOUBLE)) AS sxy
  FROM lineitem GROUP BY 1
),
s AS (
  SELECT l_returnflag, n, sx, sy,
    (CAST(n AS DOUBLE) * sxy - sx * sy)
      / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
    (CAST(n AS DOUBLE) * sxy - sx * sy)
      / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
           * (CAST(n AS DOUBLE) * syy - sy * sy)) AS corr
  FROM m
)
SELECT l_returnflag, n, slope,
  (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept, corr
FROM s
""",
    doc="Distributed least-squares fit + Pearson correlation of "
    "extendedprice on quantity per returnflag, the map-combinable "
    "way: ONE grouped pass accumulates the five moment sums "
    "(sx, sy, sxx, syy, sxy) in EXACT decimal — each is partial-agg "
    "friendly, so the shuffle carries 5 numbers per group, not rows. "
    "slope/intercept/corr are then closed-form float expressions over "
    "those exact sums, written identically on both engines (decimal "
    "to double is correctly rounded on both), so the floats are "
    "bit-identical despite arbitrary partitioning. The textbook "
    "float-accumulation version (F.corr / REGR_SLOPE) is "
    "order-dependent across retries and engines — this one is not.",
)
def stats_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        # dbig: scale-4 moment sums exceed 2^53 unscaled, where the
        # naive decimal->double cast diverges between engines
        dbig(F.sum(x * x)).alias("sxx"),
        dbig(F.sum(y * y)).alias("syy"),
        dbig(F.sum(x * y)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    s = m.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        ((nd * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (nd * F.col("sxx") - F.col("sx") * F.col("sx"))).alias("slope"),
        ((nd * F.col("sxy") - F.col("sx") * F.col("sy"))
         / F.sqrt((nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                  * (nd * F.col("syy") - F.col("sy") * F.col("sy")))).alias("corr"),
    )
    return s.select(
        "l_returnflag",
        "n",
        "slope",
        ((F.col("sy") - F.col("slope") * F.col("sx")) / nd).alias("intercept"),
        "corr",
    )


@register(
    "outlier_orders_zscore",
    group="2.11 ext-stats",
    oracle="""
WITH m AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    (CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST(o_totalprice AS DECIMAL(18,2)))) AS DOUBLE)
     + CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST(o_totalprice AS DECIMAL(18,2)))
          - FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST(o_totalprice AS DECIMAL(18,2)))) AS DOUBLE)) AS sxx
  FROM orders GROUP BY 1
),
s AS (
  SELECT o_orderpriority, sx / CAST(n AS DOUBLE) AS mean,
    sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
  FROM m
)
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
  (o.o_totalprice - s.mean) / s.sigma AS zscore
FROM orders o JOIN s ON s.o_orderpriority = o.o_orderpriority
WHERE (o.o_totalprice - s.mean) / s.sigma > 1.5
""",
    doc="Per-group z-score outlier scan (anomaly detection): group "
    "mean/sigma from EXACT decimal moment sums (the stats_linear_fit "
    "pattern), broadcast back onto the fact, keep rows >1.5 sigma "
    "above their group mean. Two passes over a 100 TB fact is the "
    "honest cost of exact global stats; the per-group stats frame is "
    "|groups| rows, so the second pass is a broadcast join + narrow "
    "filter — no second shuffle. The double formulas are written "
    "identically on both engines, so zscore is bit-exact.",
)
def outlier_orders_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    m = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        dbig(F.sum(x * x)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    s = m.select(
        F.col("o_orderpriority").alias("g_priority"),
        (F.col("sx") / nd).alias("mean"),
        F.sqrt(
            (nd * F.col("sxx") - F.col("sx") * F.col("sx")) / (nd * nd)
        ).alias("sigma"),
    )
    z = (F.col("o_totalprice") - F.col("mean")) / F.col("sigma")
    return (
        orders.join(
            F.broadcast(s), F.col("o_orderpriority") == F.col("g_priority")
        )
        .filter(z > 1.5)
        .select(
            "o_orderkey", "o_orderpriority", "o_totalprice", z.alias("zscore")
        )
    )


@register(
    "sql_lateral_top_customers",
    group="ext-sql lateral 2.3",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
""",
    doc="SQL-surface entry: per-nation top-2 customers by account "
    "balance via a correlated LATERAL subquery (spark.sql over "
    "registered testdata views — the engine's second front door next "
    "to the DataFrame API; both build the same Catalyst plan). Spark "
    "decorrelates the LATERAL into a ranked join, so execution is a "
    "partitioned window, not |nations| subqueries; the unique-key "
    "tiebreak keeps the LIMIT deterministic (SURVEY 7.4.5).",
)
def sql_lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM v_nation n, LATERAL (
          SELECT c_name, c_acctbal FROM v_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) t
    """)


@register(
    "cdc_snapshot_diff",
    group="ext-merge diff 2.3",
    oracle=f"""
WITH {_CDC_MERGED_CTES},
d AS (
  SELECT
    CASE WHEN b.o_orderkey IS NULL THEN 'added'
         WHEN m.o_orderkey IS NULL THEN 'removed'
         WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus)
           OR NOT (b.o_totalprice IS NOT DISTINCT FROM m.o_totalprice)
           THEN 'changed'
         ELSE 'unchanged' END AS status,
    COALESCE(m.o_totalprice, 0) - COALESCE(b.o_totalprice, 0) AS delta
  FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders) b
  FULL OUTER JOIN merged m ON b.o_orderkey = m.o_orderkey
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(CAST(delta AS DECIMAL(18,2))) AS DOUBLE) AS price_delta
FROM d GROUP BY status
""",
    doc="Keyed snapshot diff: the post-CDC-apply orders snapshot "
    "diffed against the base via one null-safe full-outer join "
    "(operators/merge.snapshot_diff), rolled up to per-status key "
    "counts and exact-decimal price deltas — the validation query an "
    "incremental pipeline runs after every apply (added==inserts, "
    "removed==deletes, changed==updates, and any other number is a "
    "merge bug). Layout rule matches the merge: bucket both snapshots "
    "by key, the full-outer can never broadcast.",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.merge import merge_cdc, snapshot_diff

    base, changelog = orders_cdc_frames(load_table(spark, sf_dir, "orders"))
    merged = merge_cdc(base, changelog, ["o_orderkey"])
    diff = snapshot_diff(base, merged, ["o_orderkey"])
    delta = F.coalesce(F.col("_new_o_totalprice"), F.lit(0.0)) - F.coalesce(
        F.col("_old_o_totalprice"), F.lit(0.0)
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(delta.cast("decimal(18,2)")).cast("double").alias("price_delta"),
    )


@register(
    "schema_evolution_read",
    group="ext-source schema-evolution 2.1",
    oracle="""
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(o_orderpriority) AS BIGINT) AS with_priority,
  CAST(COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS v1_rows,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 <> 0
)
""",
    doc="Schema-evolution ingestion: two parquet generations written "
    "with different schemas (v2 adds o_orderpriority), read back as "
    "ONE DataFrame with mergeSchema=true — old files surface the new "
    "column as NULL, the standard additive-evolution contract of a "
    "long-lived landing zone. mergeSchema costs a footer read per "
    "file, so production pins the merged schema explicitly once known "
    "(.schema(...)); counts prove which generation each row came from.",
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    # deterministic scratch path per source dir, cleared before each
    # build: mkdtemp here leaked one orders-sized directory per
    # invocation (bench + parity runs invoke this dozens of times per
    # round), growing /tmp without bound
    work = os.path.join(
        tempfile.gettempdir(),
        "spark_schema_evo_"
        + hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:12],
    )
    shutil.rmtree(work, ignore_errors=True)
    k = F.col("o_orderkey")
    orders.filter(k % 2 == 0).select("o_orderkey", "o_totalprice").write.mode(
        "append"
    ).parquet(work)
    orders.filter(k % 2 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("append").parquet(work)
    evolved = spark.read.option("mergeSchema", "true").parquet(work)
    return evolved.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("with_priority"),
        # count(when(...)) not sum(flag): COUNT is 0 on an empty read
        # where SUM is NULL — the oracle's COUNT(*) FILTER semantics
        # (edge-fuzz find, r07k: orders truncated wholesale)
        F.count(F.when(F.col("o_orderkey") % 2 == 0, F.lit(1))).alias(
            "v1_rows"
        ),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (materialized-view refresh)
# ---------------------------------------------------------------------------


INCR_KEYS = ["o_orderstatus", "order_month"]


def orders_incremental_frames(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(base, signed changelog) split shared by incremental_agg_orders
    and stream_incremental_agg — both register the SAME oracle, so the
    split must live in exactly one place."""
    orders = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
            "order_month"
        ),
    )
    k = F.col("o_orderkey")
    base = orders.filter(k % 10 != 9)
    changelog = base.filter(k % 100 == 3).withColumn(
        "sign", F.lit(-1)
    ).unionByName(orders.filter(k % 10 == 9).withColumn("sign", F.lit(1)))
    return base, changelog


@register(
    "incremental_agg_orders",
    group="ext-warehouse 2.4",
    oracle=f"""
SELECT o_orderstatus,
  substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS order_month,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  {dbig_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")} AS sum_amount,
  {dbig_sql("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")} / COUNT(*)
    AS avg_amount
FROM orders
WHERE (o_orderkey % 10 <> 9 AND o_orderkey % 100 <> 3)
   OR o_orderkey % 10 = 9
GROUP BY 1, 2
""",
    doc="Incremental materialized-view refresh (operators/incremental.py): "
    "base state built from 90% of orders, then ONE changelog batch "
    "(inserts = the held-out 10%, retractions = every base row with "
    "o_orderkey%100==3) folded in via mergeable (count, exact-decimal "
    "sum) state — the refresh touches |delta| rows + |touched keys| "
    "state rows, never rescanning the base fact. The oracle recomputes "
    "the post-changelog set FROM SCRATCH, proving merge == rebuild. "
    "Fully-retracted keys drop out (net count 0), matching the rebuild. "
    "The reference's weekly drop+reload (dags:437-440) is the "
    "full-rescan anti-pattern this replaces at 100 TB.",
)
def incremental_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import incremental as inc

    base, changelog = orders_incremental_frames(
        load_table(spark, sf_dir, "orders")
    )
    state0 = inc.agg_state(base, INCR_KEYS, "o_totalprice")
    delta = inc.agg_state(changelog, INCR_KEYS, "o_totalprice", sign="sign")
    return inc.finalize(inc.merge_states(state0, delta))


# ---------------------------------------------------------------------------
# z-order layout key (multi-dimensional data skipping)
# ---------------------------------------------------------------------------

from ..operators.layout import (  # noqa: E402
    morton_z,
    morton_z_sql,
    norm_to_bits,
    norm_to_bits_sql,
)

_Z_BITS = 8  # per-dimension bit budget: 256 range ids each

_ZORDER_ORACLE = f"""
WITH raw AS (
  SELECT o_custkey AS ck,
    (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day_no
  FROM orders
),
s AS (
  SELECT MIN(ck) AS mnc, MAX(ck) AS mxc,
         MIN(day_no) AS mnd, MAX(day_no) AS mxd
  FROM raw
),
n AS (
  SELECT ck, day_no,
    {norm_to_bits_sql("ck", "mnc", "mxc", 8)} AS xn,
    {norm_to_bits_sql("day_no", "mnd", "mxd", 8)} AS yn
  FROM raw CROSS JOIN s
)
SELECT ({morton_z_sql("xn", "yn", 8)} >> 8) AS z_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  MIN(ck) AS min_cust, MAX(ck) AS max_cust,
  MIN(day_no) AS min_day, MAX(day_no) AS max_day
FROM n GROUP BY 1
"""


@register(
    "zorder_orders_buckets",
    group="ext-layout",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton) clustering key over (o_custkey, order day): "
    "each dimension is first linear-scaled to an equal 8-bit range-id "
    "budget (raw interleaving would let the wider dimension's high "
    "bits own the whole sort order — the classic z-order mistake), "
    "then bit-interleaved (operators/layout.morton_z — pure codegen "
    "bit arithmetic, the min/max normalizers come from one broadcast "
    "scalar agg). The profile of the induced coarse buckets (top 8 z "
    "bits) shows every bucket's min/max rectangle tight in BOTH "
    "columns — exactly why a z-sorted file layout lets stock parquet "
    "min/max stats prune scans filtered on either dimension. "
    "tests/test_bucketing.py proves per-file locality of the actual "
    "zorder_write layout against a single-column sort.",
)
def zorder_orders_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day_no"),
    )
    s = orders.agg(
        F.min("ck").alias("mnc"),
        F.max("ck").alias("mxc"),
        F.min("day_no").alias("mnd"),
        F.max("day_no").alias("mxd"),
    )
    j = orders.crossJoin(F.broadcast(s))
    z = morton_z(
        norm_to_bits(F.col("ck"), F.col("mnc"), F.col("mxc"), _Z_BITS),
        norm_to_bits(F.col("day_no"), F.col("mnd"), F.col("mxd"), _Z_BITS),
        _Z_BITS,
    )
    return (
        j.select(F.shiftright(z, 8).alias("z_bucket"), "ck", "day_no")
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("ck").alias("min_cust"),
            F.max("ck").alias("max_cust"),
            F.min("day_no").alias("min_day"),
            F.max("day_no").alias("max_day"),
        )
    )


# ---------------------------------------------------------------------------
# bucketed table checksum (anti-entropy diff locator)
# ---------------------------------------------------------------------------

_CK_BUCKETS = 64
_CK_MOD = 1 << 60


@register(
    "table_checksum_buckets",
    group="ext-quality 2.11",
    oracle=f"""
WITH h AS (
  SELECT {md5_long_sql(
      "CAST(o_orderkey AS VARCHAR) || '|' || "
      "COALESCE(o_orderstatus, '<NULL>') || '|' || "
      "COALESCE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),"
      " '<NULL>')"
  )} AS rh
  FROM orders
)
SELECT rh % {_CK_BUCKETS} AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(rh) % {_CK_MOD} AS BIGINT) AS checksum
FROM h GROUP BY 1
""",
    doc="Bucketed content checksum of a keyed table: rows hash to one "
    f"of {_CK_BUCKETS} buckets and each bucket aggregates an "
    "order-independent additive checksum (exact decimal SUM of 60-bit "
    "row hashes, reduced mod 2^60) plus a row count. Comparing two "
    "table copies (replica, migration target, backup restore) then "
    "costs one kilobyte exchange, and a mismatch pinpoints 1/"
    f"{_CK_BUCKETS} of the keyspace to re-diff — the anti-entropy "
    "pattern, vs diffing whole tables. The checksum value is canonical "
    "(decimal-formatted price, NULL fields encoded as an explicit "
    "'<NULL>' sentinel — concat_ws's silent NULL-skip would make "
    "('A', NULL) and (NULL, 'A') collide AND diverge from any "
    "engine whose || nulls the whole row, found by the differential "
    "fuzzer), so ANY engine computing the same formula agrees; "
    "addition is commutative, so partitioning and retry order never "
    "change it. One map-combined shuffle of "
    f"{_CK_BUCKETS} partial rows per task.",
)
def table_checksum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import md5_long

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    null_s = F.lit("<NULL>")
    rh = md5_long(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.coalesce(F.col("o_orderstatus"), null_s),
            F.coalesce(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                null_s,
            ),
        )
    )
    return (
        orders.select(rh.alias("rh"))
        .groupBy((F.col("rh") % _CK_BUCKETS).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("rh").cast("decimal(38,0)")) % _CK_MOD)
            .cast("long")
            .alias("checksum"),
        )
    )


@register(
    "window_dist_functions",
    group="2.5 ext-window",
    oracle="""
SELECT o_custkey, o_orderkey,
  percent_rank() OVER w AS pr,
  cume_dist() OVER w AS cd,
  nth_value(o_totalprice, 2) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS second_price
FROM orders
WHERE o_orderdate IS NOT NULL
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Distribution window functions (completes the analytic-function "
    "surface next to window_analytics' lag/lead/ntile/first/last): "
    "percent_rank and cume_dist over each customer's order history, "
    "plus nth_value with an EXPLICIT full frame (default frames stop "
    "at CURRENT ROW, where nth_value(2) would be NULL on each "
    "partition's first row — the classic frame trap). Both ratios are "
    "single IEEE divisions of exact integer rank/count operands, so "
    "engines agree bit-for-bit. One window shuffle shared by all "
    "three functions (same partitioning + ordering).",
)
def window_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:

    # a dateless order has no rank position in the per-customer date
    # order — engines place its NULL at opposite ends
    # (differential-fuzzer find); mirrored in the oracle
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    )


@register(
    "top1_per_group_maxby",
    group="2.4 2.5-W3 max_by",
    oracle="""
SELECT o_custkey,
  CAST(arg_max(o_orderkey,
       (CAST(o_orderdate AS DATE) - DATE '1970-01-01') * 10000000000
       + o_orderkey) AS BIGINT) AS latest_orderkey,
  -- struct-packed: arg_max(o_totalprice, ...) would SKIP rows whose
  -- price is NULL (DuckDB aggregates ignore NULL inputs) and return
  -- the max over priced rows, while Spark's max_by returns the
  -- latest ROW's price even when that price is NULL — the row
  -- semantics are the contract (differential-fuzzer find)
  arg_max(struct_pack(p := o_totalprice),
       (CAST(o_orderdate AS DATE) - DATE '1970-01-01') * 10000000000
       + o_orderkey).p AS latest_price,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_custkey
""",
    doc="Top-1 per key WITHOUT a window: max_by aggregates are "
    "partial-aggregatable (map-side combine keeps one candidate per "
    "key per task), so the shuffle carries one row per key instead of "
    "sorting every row inside window partitions — at scale this beats "
    "the row_number form (top1_per_group) whenever only the top row "
    "is needed. Deterministic via a composite (day, orderkey) "
    "ordering scalar; oracle uses DuckDB's arg_max.",
)
def top1_per_group_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ord_ = (
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint")
        * F.lit(10_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", ord_).cast("bigint").alias("latest_orderkey"),
        F.max_by("o_totalprice", ord_).alias("latest_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "orders_equidepth_price_histogram",
    group="2.4 ext-prefix histogram",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER () AS n
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT CAST((rn - 1) * 16 // n AS BIGINT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  MIN(o_totalprice) AS lo,
  MAX(o_totalprice) AS hi
FROM ranked GROUP BY 1
""",
    doc="EXACT equi-depth histogram (16 buckets) without the "
    "single-task global ntile: global row_number = a distributed "
    "prefix COUNT over the (price, orderkey) total order "
    "(operators/prefix.py), bucket = (rn-1)*16 div n — "
    "floor-division bucketing identical in the SQL oracle. The "
    "equi-depth boundaries fall out of the per-bucket MIN/MAX. "
    "Integer div avoids float boundary misbuckets. NULL prices are "
    "excluded up front: they have no position in a price order, and "
    "engines disagree on where NULL sorts (differential-fuzzer find).",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why=_PREFIX_SUM_ALLOW_WHY,
)
def orders_equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import (
        global_running_sum,
        quantile_bounds_and_count,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice")
    )
    # ONE probe job computes the prefix-sum bucket boundaries AND the
    # scalar n (r11: the separate count() pass re-scanned orders)
    bounds, n = quantile_bounds_and_count(
        orders,
        F.col("o_totalprice"),
        orders.sparkSession.sparkContext.defaultParallelism,
    )
    ranked = global_running_sum(
        orders,
        ["o_totalprice", "o_orderkey"],
        F.lit(1).cast("bigint"),
        out_col="rn",
        bucket_on=F.col("o_totalprice"),
        bounds=bounds,
    )
    return (
        ranked.withColumn(
            "bucket", F.expr(f"(rn - 1) * 16 div {n}").cast("bigint")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "fuzzy_match_customers",
    group="2.3 ext-fuzzy",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
    doc="Fuzzy entity matching within edit distance 1 via SymSpell "
    "deletion blocking (operators/fuzzy.py): every name posts itself "
    "plus its single-character deletions, candidates come from shared "
    "keys (exact superset by the deletion-neighborhood property), and "
    "levenshtein runs on candidates only — one key shuffle instead of "
    "the oracle's O(n^2) self-join, which is the point: the naive "
    "form evaluates ~1.1M distances at sf0.01 and dies at any real "
    "size.",
)
def fuzzy_match_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import edit_distance_pairs

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=1).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("dist").cast("int").alias("dist"),
    )


@register(
    "fuzzy_match_customers_d2",
    group="2.3 ext-fuzzy d2",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
  CAST(levenshtein(substr(a.c_name, 1, 64), substr(b.c_name, 1, 64))
    AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
WHERE a.c_custkey % 50 = 0 AND b.c_custkey % 50 = 0
  AND levenshtein(substr(a.c_name, 1, 64), substr(b.c_name, 1, 64)) <= 2
""",
    doc="Distance-2 fuzzy matching via delete-<=2 SymSpell keys "
    "(~|s|^2/2 keys/string — the quadratic key volume makes d2 an "
    "explicit opt-in, run here over a 1-in-50 blocked slice exactly "
    "as production would pre-block). Same exact-superset guarantee "
    "and naive-oracle cross-check as the distance-1 form. Inputs are "
    "TRUNCATED to the operator's MAX_D2_LEN=64 on both sides — the "
    "documented pre-blocking for the quadratic key volume (a 4 KB "
    "string would post ~8M delete keys; the operator raises rather "
    "than degrade — r07b edge-fuzz find); names longer than 64 chars "
    "compare by prefix, a no-op on the pristine domain.",
)
def fuzzy_match_customers_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import edit_distance_pairs

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", F.substring("c_name", 1, 64).alias("c_name"))
    )
    return edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=2).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("dist").cast("int").alias("dist"),
    )


@register(
    "sql_udf_scalar_functions",
    group="2.8 2.10 ext-sql-udf",
    oracle="""
SELECT
  CASE WHEN o_orderpriority LIKE '%-%'
       THEN substr(o_orderpriority, 1, 1) ELSE o_orderpriority END
    AS prio_code,
  -- explicit NULL branch: DuckDB's split_part(NULL, ...) returns ''
  -- (documented quirk) while Spark NULL-propagates, the SQL-standard
  -- behavior the UDF inherits (differential-fuzzer find)
  CASE WHEN o_orderpriority IS NULL THEN NULL
       ELSE split_part(o_orderpriority, '-', 2) END AS prio_name,
  CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders
GROUP BY 1, 2
""",
    doc="Spark 4 SQL UDF surface (CREATE FUNCTION ... RETURN): the "
    "reference's scalar helpers — the season-normalization CASE used "
    "as a join key (dbt team_weaknesses.sql) and the split_part "
    "opponent extraction (streaks_and_rivals.sql) — declared as "
    "engine-resident SQL functions instead of Python. SQL UDFs inline "
    "into the plan as expressions (full codegen, no serialization "
    "wall), so unlike Python UDFs they are the FAST path; the oracle "
    "inlines the identical logic.",
)
def sql_udf_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION prio_code(s STRING)
RETURNS STRING
RETURN CASE WHEN s LIKE '%-%' THEN substr(s, 1, 1) ELSE s END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION prio_name(s STRING)
RETURNS STRING
RETURN split_part(s, '-', 2)""")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_orders_sqludf"
    )
    return spark.sql("""
SELECT prio_code(o_orderpriority) AS prio_code,
       prio_name(o_orderpriority) AS prio_name,
       COUNT(*) AS cnt
FROM _orders_sqludf
GROUP BY 1, 2
""")


# ---------------------------------------------------------------------------
# global running totals — two-phase distributed prefix sum
# (operators/prefix.py; no reference analog — its windows are all
#  partitioned ranks, dbt/models/spurs_analysis/*.sql)
# ---------------------------------------------------------------------------


@register(
    "orders_running_revenue",
    group="2.5 ext-prefix",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    ORDER BY CAST(o_orderdate AS DATE), o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_revenue
FROM orders WHERE o_orderdate IS NOT NULL
""",
    doc="GLOBAL running revenue over the (orderdate, orderkey) total "
    "order — the window shape Spark executes as ONE task when written "
    "naively (Window.orderBy with no partitionBy). Implemented as the "
    "two-phase distributed prefix sum (range-partition, parallel local "
    "windows, |partitions|-row offset pass, broadcast add): "
    "operators/prefix.py. Decimal-exact, so the two-phase result is "
    "bit-identical to the one-task form and the SQL oracle.",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why=_PREFIX_SUM_ALLOW_WHY,
)
def orders_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_running_sum

    # a dateless order has no position in the (orderdate, orderkey)
    # total order — engines place its NULL at opposite ends
    # (differential-fuzzer find); mirrored in the oracle
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        # integer day index: same ordering as the date, and numeric so it
        # doubles as the quantile-bucket axis
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("_day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("_rev"),
    )
    out = global_running_sum(
        orders, ["_day", "o_orderkey"], "_rev", out_col="_run"
    )
    return out.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("_run").cast("double").alias("running_revenue"),
    )


@register(
    "events_concurrency_hourly",
    group="2.5 ext-prefix sweep",
    oracle="""
WITH b AS (
  SELECT epoch_us(ts) AS t_us, 1 AS delta, event_id AS tb
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT epoch_us(ts) + 600000000, -1, event_id
  FROM events WHERE ts IS NOT NULL
),
r AS (
  SELECT t_us,
    SUM(delta) OVER (ORDER BY t_us, delta, tb
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM b
)
SELECT CAST(t_us // 3600000000 AS BIGINT) AS hour_no,
       CAST(MAX(conc) AS BIGINT) AS max_concurrency
FROM r GROUP BY 1
""",
    doc="Sweep-line max concurrency per hour: each event holds a "
    "resource for 10 minutes ([ts, ts+10m)); boundaries become +1/-1 "
    "deltas and a GLOBAL running sum over (time, delta, event_id) "
    "counts open intervals at every boundary. Half-open semantics: at "
    "equal timestamps the -1 sorts first, so back-to-back intervals "
    "never double-count. Runs on the two-phase distributed prefix sum "
    "(operators/prefix.py) — no single-task window. Integer-microsecond "
    "time axis (DuckDB epoch_us == Spark unix_micros truncation of the "
    "ns source), so both engines bucket identically.",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why=_PREFIX_SUM_ALLOW_WHY,
)
def events_concurrency_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import interval_concurrency

    # an interval with no start time doesn't exist — NULL ts would
    # otherwise become a NULL hour bucket placed differently by the
    # two engines' sweep orders (differential-fuzzer find)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(epoch_us("ts").alias("t_us"), "event_id")
    )
    sweep = interval_concurrency(
        ev,
        start=F.col("t_us"),
        end=F.col("t_us") + F.lit(600000000).cast("bigint"),
        order_tiebreak=F.col("event_id"),
    )
    return (
        sweep.groupBy(
            # integer div — a double division then cast can misbucket at
            # hour boundaries (us magnitudes ~1.7e15 exceed double's
            # exact-integer range headroom for the quotient rounding)
            F.expr("t div 3600000000").cast("bigint").alias("hour_no")
        )
        .agg(F.max("concurrency").cast("bigint").alias("max_concurrency"))
    )


# ---------------------------------------------------------------------------
# round 4: changepoint detection + winsorized robust stats
# ---------------------------------------------------------------------------


@register(
    "events_cusum_changepoint",
    group="ext-stats changepoint",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
tot AS (SELECT CAST(SUM(k) AS DOUBLE) / COUNT(*) AS mean_k,
               CAST(COUNT(*) AS BIGINT) AS n_hours FROM hourly),
dev AS (
  SELECT h.bucket_us,
    ABS(CAST(SUM(h.k) OVER (ORDER BY h.bucket_us) AS DOUBLE)
        - (ROW_NUMBER() OVER (ORDER BY h.bucket_us)) * t.mean_k) AS d,
    t.n_hours
  FROM hourly h CROSS JOIN tot t
)
SELECT bucket_us AS changepoint_us, d AS max_dev, n_hours
FROM dev ORDER BY d DESC, bucket_us LIMIT 1
""",
    doc="Offline mean-shift changepoint (the non-resetting CUSUM "
    "statistic): hour i's deviation = |prefix_sum(counts) - i*mean|, "
    "maximized over hours — the classic argmax-of-cumulative-"
    "deviation estimator for a single level shift. Hourly counts are "
    "one map-combined agg; the prefix sum runs over the TINY hourly "
    "frame (744 rows at sf0.1 — a single-task window over an "
    "already-aggregated series is the correct plan, unlike the "
    "row-level global sums in operators/prefix.py); counts are exact "
    "ints and mean one exact division, so max_dev is bit-identical. "
    "Top-1 via TakeOrdered, no global sort.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:

    # a NULL-ts row would form a NULL hour bucket and shift the whole
    # cumulative-deviation series (differential-fuzzer find)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = epoch_us("ts")
    hourly = (
        ev.select((us - us % 3_600_000_000).alias("bucket_us"))
        .groupBy("bucket_us")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    tot = hourly.agg(
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("mean_k"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    w = Window.orderBy("bucket_us")
    dev = hourly.crossJoin(F.broadcast(tot)).select(
        "bucket_us",
        F.abs(
            F.sum("k").over(w).cast("double")
            - F.row_number().over(w) * F.col("mean_k")
        ).alias("d"),
        "n_hours",
    )
    return (
        dev.orderBy(F.col("d").desc(), F.col("bucket_us").asc())
        .limit(1)
        .select(
            F.col("bucket_us").alias("changepoint_us"),
            F.col("d").alias("max_dev"),
            "n_hours",
        )
    )


@register(
    "orders_winsorized_stats",
    group="ext-stats robust",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_totalprice IS NOT NULL
),
bounds AS (
  SELECT o_orderpriority,
    MIN(CASE WHEN rn = GREATEST(1,
          CAST(CEIL(CAST(0.01 AS DOUBLE) * n) AS BIGINT))
        THEN o_totalprice END) AS p01,
    MIN(CASE WHEN rn = CAST(CEIL(CAST(0.99 AS DOUBLE) * n) AS BIGINT)
        THEN o_totalprice END) AS p99
  FROM ranked GROUP BY 1
)
SELECT r.o_orderpriority,
  CAST(MAX(r.n) AS BIGINT) AS n,
  MAX(b.p01) AS p01,
  MAX(b.p99) AS p99,
  CAST(SUM(CASE WHEN r.o_totalprice < b.p01 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_low,
  CAST(SUM(CASE WHEN r.o_totalprice > b.p99 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_high,
  CAST(SUM(CAST(LEAST(GREATEST(r.o_totalprice, b.p01), b.p99)
      AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS winsorized_mean
FROM ranked r JOIN bounds b USING (o_orderpriority)
GROUP BY 1
""",
    doc="Per-group winsorized statistics: DISC percentiles (the exact "
    "order-statistic ELEMENT at ceil(p*n), immune to interpolation-"
    "formula drift between engines), clip counts, and the winsorized "
    "mean via exact decimal sums (davg pattern). One group-keyed "
    "window ranks the rows; bounds reduce to |groups| rows and join "
    "back broadcast. The robust-moments companion to "
    "outlier_orders_zscore for heavy-tailed value columns.",
)
def orders_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:

    # order statistics are positions in the PRICE order — a NULL price
    # has none, and the engines would place it at opposite ends
    # (differential-fuzzer find); mirrored in the oracle
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = ranked.groupBy("o_orderpriority").agg(
        F.min(
            F.when(
                F.col("rn")
                == F.greatest(
                    F.lit(1), F.ceil(0.01 * F.col("n")).cast("bigint")
                ),
                F.col("o_totalprice"),
            )
        ).alias("p01"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(0.99 * F.col("n")).cast("bigint"),
                F.col("o_totalprice"),
            )
        ).alias("p99"),
    )
    clipped = ranked.join(F.broadcast(bounds), "o_orderpriority")
    return clipped.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.max("p01").alias("p01"),
        F.max("p99").alias("p99"),
        F.sum(
            F.when(F.col("o_totalprice") < F.col("p01"), 1).otherwise(0)
        ).alias("n_clipped_low"),
        F.sum(
            F.when(F.col("o_totalprice") > F.col("p99"), 1).otherwise(0)
        ).alias("n_clipped_high"),
        (
            F.sum(
                F.least(
                    F.greatest(F.col("o_totalprice"), F.col("p01")),
                    F.col("p99"),
                ).cast("decimal(18,2)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("winsorized_mean"),
    )


@register(
    "events_seasonal_anomaly",
    group="ext-stats seasonal",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
    CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hod,
    CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT hod, CAST(SUM(k) AS DOUBLE) / COUNT(*) AS baseline
  FROM hourly GROUP BY 1
)
SELECT h.bucket_us, h.hod, h.k, b.baseline,
  (h.k - b.baseline) / b.baseline AS rel_residual
FROM hourly h JOIN base b USING (hod)
WHERE ABS((h.k - b.baseline) / b.baseline) > 0.25
""",
    doc="Seasonal-naive anomaly scan: per-hour event counts vs the "
    "hour-of-day baseline (mean count over all days at that hour); "
    "hours deviating more than 25% from their seasonal baseline "
    "surface with their relative residual. Two map-combined "
    "aggregations — the hourly frame and the 24-row baseline — then a "
    "broadcast join; integer counts and one exact division keep the "
    "residual bit-identical. The time-series companion to the "
    "global-shift events_cusum_changepoint.",
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = epoch_us("ts")
    hourly = (
        ev.select(
            (us - us % 3_600_000_000).alias("bucket_us"),
            ((us % 86_400_000_000) / 3_600_000_000)
            .cast("bigint")
            .alias("hod"),
        )
        .groupBy("bucket_us", "hod")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    base = hourly.groupBy("hod").agg(
        (F.sum("k").cast("double") / F.count(F.lit(1))).alias("baseline")
    )
    res = (F.col("k") - F.col("baseline")) / F.col("baseline")
    return (
        hourly.join(F.broadcast(base), "hod")
        .select("bucket_us", "hod", "k", "baseline", res.alias("rel_residual"))
        .filter(F.abs(res) > 0.25)
    )


@register(
    "orders_hhi_concentration",
    group="ext-stats concentration",
    oracle=f"""
WITH spend AS (
  SELECT o_orderpriority, o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
      AS s
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  {dsum_sql("s")} AS total_spend,
  {dbig_sql("SUM(CAST(s AS DECIMAL(19,2)) * CAST(s AS DECIMAL(19,2)))")}
    / ({dsum_sql("s")} * {dsum_sql("s")}) AS hhi,
  CAST(MAX(s) AS DOUBLE) / {dsum_sql("s")} AS top_share
FROM spend GROUP BY 1
""",
    doc="Herfindahl-Hirschman concentration of customer spend within "
    "each order priority: HHI = sum(share_i^2) computed as "
    "sum(s_i^2)/total^2 so every aggregate is an EXACT decimal sum "
    "(sum of per-customer squared spend, decimal(37,4)) and the only "
    "float ops are the final casts/divide — bit-identical across "
    "engines where a per-share float sum would drift with partition "
    "order. dbig handles the >2^53-unscaled squared sum; the oracle "
    "squares via DECIMAL(19,2) operands because DuckDB keeps the "
    "source width for the product (an 18-digit square overflows on "
    "whale customers — differential-fuzzer find) while Spark widens "
    "to decimal(37,4) automatically. Two "
    "map-combined aggregations, no window, no join.",
)
def orders_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy("o_orderpriority", "o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("s")
    )
    tot = F.sum(F.col("s").cast("decimal(18,2)")).cast("double")
    return spend.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_customers"),
        tot.alias("total_spend"),
        (dbig(F.sum(F.col("s") * F.col("s"))) / (tot * tot)).alias("hhi"),
        (F.max("s").cast("double") / tot).alias("top_share"),
    )


@register(
    "orders_skyline_pareto",
    group="ext-olap skyline",
    oracle="""
WITH d AS (
  SELECT o_orderpriority AS prio, o_orderdate AS od,
    MAX(o_totalprice) AS maxp
  FROM orders GROUP BY 1, 2
),
s AS (
  SELECT prio, od, maxp,
    MAX(maxp) OVER (PARTITION BY prio ORDER BY od DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_later
  FROM d
)
SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice, o.o_orderdate
FROM orders o
JOIN s ON o.o_orderpriority = s.prio AND o.o_orderdate = s.od
WHERE o.o_totalprice = s.maxp
  AND (s.best_later IS NULL OR s.maxp > s.best_later)
""",
    doc="2-D skyline (Pareto frontier) per order priority, maximizing "
    "(o_totalprice, o_orderdate): an order survives iff no other "
    "order in its priority has both a later-or-equal date and a "
    "higher-or-equal price with one strict. The 2-D maxima scan "
    "collapses to per-date MAX plus a running max over STRICTLY later "
    "dates (grouped frame -> ROWS 1 PRECEDING is exactly 'later "
    "dates'), then a join back keyed on (priority, date) — no "
    "quadratic NOT EXISTS. The window runs over the per-(priority, "
    "date) frame (~distinct dates), not the fact table, and the join "
    "back broadcasts it; ties at the frontier price all survive, "
    "matching dominance with no-strict-equality.",
)
def orders_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:

    od = load_table(spark, sf_dir, "orders")
    d = od.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("od"),
    ).agg(F.max("o_totalprice").alias("maxp"))
    w = (
        Window.partitionBy("prio")
        .orderBy(F.col("od").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sky = d.withColumn("best_later", F.max("maxp").over(w)).filter(
        F.col("best_later").isNull() | (F.col("maxp") > F.col("best_later"))
    )
    return (
        od.join(
            F.broadcast(sky),
            (od.o_orderpriority == sky.prio) & (od.o_orderdate == sky.od),
        )
        .filter(F.col("o_totalprice") == F.col("maxp"))
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "o_orderdate")
    )


@register(
    "part_copurchase_lift",
    group="ext-basket association",
    oracle="""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lp),
pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lp
       GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
    CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT p1, p2, c_ab,
  CAST(c_ab AS DOUBLE) / CAST(c1.c AS DOUBLE) AS conf_1to2,
  CAST(c_ab AS DOUBLE) / CAST(c2.c AS DOUBLE) AS conf_2to1,
  CAST(n.n_orders * c_ab AS DOUBLE)
    / CAST(c1.c * c2.c AS DOUBLE) AS lift
FROM pair
JOIN pc c1 ON pair.p1 = c1.l_partkey
JOIN pc c2 ON pair.p2 = c2.l_partkey
CROSS JOIN n
""",
    doc="Market-basket association rules over order baskets: part "
    "pairs co-purchased in >= 3 orders, with both confidences and "
    "lift = N*c_ab/(c_a*c_b). Every ratio is ONE IEEE division (or "
    "exact BIGINT products) of exact counts — bit-identical across "
    "engines. The self-join is keyed on l_orderkey, so its volume is "
    "sum of per-basket line counts squared (baskets are <= 13 lines "
    "here; bounded per-key fan-out, not quadratic in the table); part "
    "counts attach via two part-keyed joins of a parts-sized frame "
    "and the scalar N via a 1-row broadcast cross join.",
)
def part_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    n = lp.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    pc = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = lp.alias("a"), lp.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    c1 = pc.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    c2 = pc.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    return (
        pair.join(c1, "p1")
        .join(c2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "c_ab",
            (F.col("c_ab").cast("double") / F.col("c1").cast("double"))
            .alias("conf_1to2"),
            (F.col("c_ab").cast("double") / F.col("c2").cast("double"))
            .alias("conf_2to1"),
            (
                (F.col("n_orders") * F.col("c_ab")).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double")
            ).alias("lift"),
        )
    )


_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    step = (
        "n{n} AS (SELECT src FROM e{p} GROUP BY src "
        "HAVING COUNT(*) >= {k}),\n"
        "e{n} AS (SELECT e.src, e.dst FROM e{p} e "
        "JOIN n{n} a ON e.src = a.src JOIN n{n} b ON e.dst = b.src)"
    )
    iters = ",\n".join(
        step.format(n=i + 1, p=i, k=_KCORE_K)
        for i in range(_KCORE_ROUNDS)
    )
    return f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
{iters}
SELECT src AS l_partkey, CAST(COUNT(*) AS BIGINT) AS deg
FROM e{_KCORE_ROUNDS} GROUP BY 1
"""


@register(
    "part_copurchase_kcore",
    group="ext-graph iterative",
    oracle=_kcore_oracle(),
    doc="Fixed-round k-core peeling (k=3, 3 rounds) of the part "
    "co-purchase graph (edges = part pairs sharing >= 2 baskets): "
    "each round drops nodes whose degree in the INDUCED subgraph "
    "fell below k and re-restricts the edge list — the truncated "
    "form of full k-core decomposition (data-dependent round counts "
    "don't unroll into a SQL oracle; 3 rounds is the deterministic "
    "contract, and the remaining frontier shrinks geometrically). "
    "Per round: one map-combined degree count plus two node-keyed "
    "semi-join restrictions; the edge frame is localCheckpoint'ed "
    "once so the basket self-join never re-runs.",
)
def part_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    for _ in range(_KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("src")
        )
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
        )
    return edges.groupBy(F.col("src").alias("l_partkey")).agg(
        F.count(F.lit(1)).alias("deg")
    )


@register(
    "lineitem_median_twophase",
    group="ext-stats selection",
    oracle="""
WITH s AS (
  SELECT l_extendedprice AS p,
    ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
    COUNT(*) OVER () AS n
  FROM lineitem WHERE l_extendedprice IS NOT NULL
)
SELECT CAST(n AS BIGINT) AS n, CAST((n + 1) // 2 AS BIGINT) AS k,
  p AS median
FROM s WHERE rn = (n + 1) // 2
""",
    doc="Exact global median (lower median, k = (n+1)//2) of "
    "l_extendedprice via two-phase distributed selection "
    "(operators/prefix.exact_kth_smallest): quantile-bucket "
    "histogram locates the rank-holding bucket from <= 64 driver "
    "rows, then a TakeOrdered over that ONE bucket reads off the "
    "j-th — no global sort, no single-task window, no driver-side "
    "top-k of the whole table. The oracle global-sorts in DuckDB "
    "(fine at oracle scale); the Spark plan is the one that "
    "survives 100 TB. Value equality is exact: the median is a "
    "stored double, never arithmetic.",
)
def lineitem_median_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import exact_kth_smallest_counting

    # the median is a position in the PRICE order; a NULL price has
    # none, and n must count only ranked rows (differential-fuzzer
    # find) — mirrored in the oracle. The count is FUSED into the
    # selection's boundary-probe job (r11: the separate li.count()
    # pass was one of four full lineitem scans in this entry).
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    n, k, med = exact_kth_smallest_counting(
        li, "l_extendedprice", lambda total: (total + 1) // 2
    )
    schema = "n bigint, k bigint, median double"
    if n == 0:
        # no ranked rows → no median row; the oracle's WHERE rn = k
        # matches nothing on an empty table, so the contract relation
        # is EMPTY, not (0, 0, NULL) (edge-fuzz find, r07a)
        return spark.createDataFrame([], schema)
    return spark.createDataFrame([(n, k, float(med))], schema)


@register(
    "orders_salted_skew_join",
    group="ext-skew salted-join",
    oracle="""
SELECT c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
    AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
    doc="Skew-hardened fact-to-dim join (operators/joins.salted_join): "
    "the fact side salts each row by a content hash (deterministic, "
    "retry-stable), the dim side replicates once per salt, and the "
    "join runs on (custkey, salt) — a hot customer's rows land on 8 "
    "reducers instead of one. The oracle is the PLAIN join: salting "
    "must be result-invariant, which this entry proves on real data "
    "while the plan pin proves the salt actually reaches the join "
    "keys. Complements AQE skew-join (runtime, stats-driven) with "
    "the planned-ahead form that also works in stream-static joins "
    "where AQE is off.",
)
def orders_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import salted_join

    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = salted_join(od, cust, "o_custkey", "c_custkey", num_salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


def _fd_profile(df: DataFrame, fd: str, det: str, dep: str) -> DataFrame:
    per_key = df.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
    return per_key.agg(
        F.lit(fd).alias("fd"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_violating"),
        (
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("violation_rate"),
        F.max("nd").alias("worst_distinct"),
    )


_FD_SQL = """
SELECT '{fd}' AS fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violating,
  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS violation_rate,
  MAX(nd) AS worst_distinct
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM {tbl} GROUP BY 1)
"""

_FD_SPECS = [
    ("orders.o_custkey->o_orderstatus", "orders", "o_custkey",
     "o_orderstatus"),
    ("lineitem.l_orderkey->l_shipdate", "lineitem", "l_orderkey",
     "l_shipdate"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
]


@register(
    "fd_violation_audit",
    group="ext-quality fd",
    oracle="\nUNION ALL\n".join(
        _FD_SQL.format(fd=fd, tbl=tbl, det=det, dep=dep)
        for fd, tbl, det, dep in _FD_SPECS
    ),
    doc="Functional-dependency audit — the profiling query behind "
    "'is this column derivable from that key?' schema-inference and "
    "data-contract checks (the reference's dbt tests assert FDs "
    "implicitly via uniqueness; this measures arbitrary det->dep "
    "pairs). Per FD: one two-level aggregate (count-distinct per "
    "determinant, map-side partial; then a scalar profile), each "
    "reading only its two columns; the three FD branches touch "
    "different tables so the union re-scans nothing.",
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for fd, tbl, det, dep in _FD_SPECS:
        prof = _fd_profile(load_table(spark, sf_dir, tbl), fd, det, dep)
        out = prof if out is None else out.unionByName(prof)
    return out


@register(
    "orders_abc_classification",
    group="ext-olap abc pareto",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(r) AS t FROM rev),
run AS (
  SELECT l_partkey, r,
    SUM(r) OVER (ORDER BY r DESC, l_partkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM rev
)
SELECT run.l_partkey, CAST(r AS DOUBLE) AS revenue,
  CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS cum_share,
  CASE
    WHEN CAST(c AS DOUBLE) / CAST(t AS DOUBLE) <= 0.8 THEN 'A'
    WHEN CAST(c AS DOUBLE) / CAST(t AS DOUBLE) <= 0.95 THEN 'B'
    ELSE 'C'
  END AS abc
FROM run CROSS JOIN tot
""",
    doc="ABC / Pareto classification of parts by revenue: rank parts "
    "by exact-decimal revenue descending, take the global running "
    "share, and label A (first 80% of revenue), B (next 15%), C "
    "(tail). The running sum is the two-phase "
    "operators/prefix.global_running_sum (ordered by (-revenue, "
    "part)) — |parts| is key-cardinality, which at 100 TB is far too "
    "big for the naive single-task global window; the share is one "
    "division of two exact decimals per row and the class thresholds "
    "compare identically on both engines. The scalar total rides the "
    "boundary-probe job and inlines as an exact-typed literal (r11 — "
    "previously a 1-row broadcast whose subtree re-ran the revenue "
    "aggregation).",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why=_PREFIX_SUM_ALLOW_WHY,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_running_sum, quantile_bounds_and_aggs

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    neg = rev.withColumn("neg_r", -F.col("r"))
    # ONE probe job yields the prefix-sum bucket boundaries AND the
    # grand total (r11: the total previously attached as a 1-row
    # broadcast whose subtree re-aggregated lineitem, one more full
    # pass). The total is a literal of the SAME decimal type the agg
    # produced, so the share division is bit-identical.
    bounds, row = quantile_bounds_and_aggs(
        neg, F.col("neg_r"),
        neg.sparkSession.sparkContext.defaultParallelism,
        {"t": F.sum("r")},
    )
    ranked = global_running_sum(
        neg,
        ["neg_r", "l_partkey"],
        "r",
        out_col="c",
        bounds=bounds,
    )
    tot_lit = F.lit(row["t"]).cast("decimal(28,2)")
    share = F.col("c").cast("double") / tot_lit.cast("double")
    return (
        ranked
        .select(
            "l_partkey",
            F.col("r").cast("double").alias("revenue"),
            share.alias("cum_share"),
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc"),
        )
    )


@register(
    "customer_entity_resolution",
    group="ext-fuzzy entity-resolution",
    oracle="""
WITH RECURSIVE cand AS (
  SELECT a.c_custkey AS src, b.c_custkey AS dst
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
  WHERE a.c_custkey % 10 = 0 AND b.c_custkey % 10 = 0
    AND levenshtein(a.c_name, b.c_name) <= 1
),
edges AS (
  SELECT src, dst FROM cand UNION ALL SELECT dst, src FROM cand
),
nodes AS (SELECT DISTINCT src AS doc FROM edges),
walk(doc, label) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON w.doc = e.src
),
comp AS (SELECT doc, MIN(label) AS component FROM walk GROUP BY doc),
lab AS (
  SELECT c.c_custkey, c.c_acctbal,
    COALESCE(p.component, c.c_custkey) AS component
  FROM customer c LEFT JOIN comp p ON c.c_custkey = p.doc
  WHERE c.c_custkey % 10 = 0
),
agg AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      AS total_acctbal
  FROM lab GROUP BY 1
),
rep AS (
  SELECT component, c_custkey AS keep_custkey FROM (
    SELECT component, c_custkey, ROW_NUMBER() OVER (
      PARTITION BY component ORDER BY c_acctbal DESC, c_custkey
    ) AS rk FROM lab
  ) WHERE rk = 1
)
SELECT CAST(a.component AS BIGINT) AS component,
  CAST(r.keep_custkey AS BIGINT) AS keep_custkey,
  a.n_members, a.total_acctbal
FROM agg a JOIN rep r USING (component)
""",
    doc="End-to-end entity resolution (MDM golden-record shape) "
    "composed from the engine's own operators: SymSpell "
    "deletion-blocked fuzzy matching (edit distance <= 1) -> "
    "min-label connected components -> per-cluster survivorship "
    "(master = highest account balance, tie -> min key, via a "
    "max_by AGGREGATE — no per-cluster window sort) with member "
    "count and exact-decimal balance rollup; unmatched customers "
    "stay as their own single-member entity via the left join, and "
    "the whole run is PRE-BLOCKED to a 1-in-10 key slice exactly as "
    "production ER blocks before matching (unblocked, the serial "
    "names chain-collapse into one entity and the pair volume "
    "explodes ~100x — measured before blocking; transitive closure "
    "over a weak pairwise rule is the classic ER over-linking "
    "pathology, countered by blocking plus cluster-splitting such "
    "as the LPA communities of graph_label_propagation). The "
    "oracle recomputes the whole chain independently: naive "
    "quadratic levenshtein join + recursive-CTE components.",
)
def customer_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components
    from ..operators.fuzzy import edit_distance_pairs

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    pairs = edit_distance_pairs(cust, "c_custkey", "c_name", max_dist=1).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    lab = (
        cust.join(comp, cust.c_custkey == comp.doc, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce("component", "c_custkey").alias("component"),
        )
    )
    return lab.groupBy("component").agg(
        F.max_by(
            "c_custkey",
            F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("nk")),
        ).alias("keep_custkey"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_acctbal"),
    ).select("component", "keep_custkey", "n_members", "total_acctbal")


@register(
    "join_skew_planner",
    group="ext-skew planner",
    oracle="""
WITH a AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
b AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
),
j AS (SELECT a.k, a.c * b.c AS contrib FROM a JOIN b USING (k))
SELECT CAST(SUM(contrib) AS BIGINT) AS join_rows,
  CAST(COUNT(*) AS BIGINT) AS join_keys,
  CAST(MAX(contrib) AS BIGINT) AS max_key_rows,
  CAST(MAX(contrib) AS DOUBLE) * COUNT(*)
    / CAST(SUM(contrib) AS DOUBLE) AS skew_ratio
FROM j
""",
    doc="Join-skew planning profile: the EXACT output cardinality of "
    "orders x lineitem on orderkey, its key count, the largest "
    "single-key contribution, and the skew ratio (max/avg key "
    "contribution) — computed from per-key counts WITHOUT executing "
    "the join (sum over keys of c_a * c_b is the equi-join row count "
    "identity every optimizer's stats module approximates; here it "
    "is exact). Two map-combined counts plus a |keys|-sized count "
    "join — the cheap pre-pass that decides whether the real join "
    "needs orders_salted_skew_join's salting or AQE skew handling. "
    "skew_ratio is the one shared float expression, evaluated in "
    "the same op order on both engines.",
)
def join_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = od.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    j = a.join(b, "k").select((F.col("ca") * F.col("cb")).alias("contrib"))
    return j.agg(
        F.sum("contrib").alias("join_rows"),
        F.count(F.lit(1)).alias("join_keys"),
        F.max("contrib").alias("max_key_rows"),
        (
            F.max("contrib").cast("double") * F.count(F.lit(1))
            / F.sum("contrib").cast("double")
        ).alias("skew_ratio"),
    )


@register(
    "orders_ks_statistic",
    group="ext-stats ks",
    oracle="""
WITH v AS (
  SELECT o_totalprice AS p,
    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    AND o_totalprice IS NOT NULL
),
g AS (
  SELECT p, CAST(SUM(a) AS BIGINT) AS c1,
    CAST(COUNT(*) - SUM(a) AS BIGINT) AS c2
  FROM v GROUP BY 1
),
r AS (
  SELECT p,
    SUM(c1) OVER (ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
    SUM(c2) OVER (ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM g
),
t AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM g
)
SELECT n1, n2,
  MAX(ABS(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2))
    AS ks
FROM r CROSS JOIN t GROUP BY n1, n2
""",
    doc="Exact two-sample Kolmogorov-Smirnov statistic comparing the "
    "order-price distributions of '1-URGENT' vs '5-LOW': KS = max "
    "over observed values of |F1(x) - F2(x)|, with both empirical "
    "CDFs built from integer cumulative counts over the per-distinct-"
    "value frame. The cumulative counts are GLOBAL prefix sums over "
    "|distinct prices| — key-cardinality, so they run through the "
    "two-phase bucketed form (operators/prefix.global_running_sums: "
    "ONE bucketing pass carries both CDFs — chaining the "
    "single-column form re-shuffled per column, measured 2x slower), "
    "never a single-task window. Each "
    "CDF value is one exact-int division; KS is a max over "
    "identically-computed doubles — bit-identical across engines. "
    "NULL prices are excluded up front: a row with no price has no "
    "position in a price ECDF, and engines disagree on where NULL "
    "sorts (Spark windows default NULLS FIRST ascending, DuckDB "
    "NULLS LAST — found by the differential fuzzer). "
    "The continuous-distribution companion to events_drift_chi2.",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why=_PREFIX_SUM_ALLOW_WHY,
)
def orders_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import global_running_sums

    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
        & F.col("o_totalprice").isNotNull()
    )
    v = od.select(
        F.col("o_totalprice").alias("p"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("a"),
    )
    g = v.groupBy("p").agg(
        F.sum("a").alias("c1"),
        (F.count(F.lit(1)) - F.sum("a")).alias("c2"),
    )
    # ONE probe job yields the prefix-sum bucket boundaries AND the
    # two sample sizes (r11: n1/n2 previously attached as a 1-row
    # broadcast whose subtree re-ran the per-price aggregation — one
    # more pass; both are exact integers, so the literals divide
    # bit-identically to the broadcast columns)
    from ..operators.prefix import quantile_bounds_and_aggs

    bounds, row = quantile_bounds_and_aggs(
        g, F.col("p"), g.sparkSession.sparkContext.defaultParallelism,
        {"n1": F.sum("c1"), "n2": F.sum("c2")},
    )
    r = global_running_sums(
        g, ["p"], {"cum1": "c1", "cum2": "c2"}, bounds=bounds
    )
    n1 = F.lit(row["n1"]).cast("long")
    n2 = F.lit(row["n2"]).cast("long")
    return (
        r.select(
            n1.alias("n1"),
            n2.alias("n2"),
            F.abs(
                F.col("cum1").cast("double") / n1
                - F.col("cum2").cast("double") / n2
            ).alias("_d"),
        )
        .groupBy("n1", "n2")
        .agg(F.max("_d").alias("ks"))
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval (deterministic, hash-seeded)
# ---------------------------------------------------------------------------

_BOOT_B = 20
#: cumulative Poisson(1) probabilities for k = 0..4 (then k = 5)
_POIS_CUM = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
)
_TWO60 = "1152921504606846976.0"  # 2^60: md5_long is a 60-bit uniform


def _boot_w_sql(b: int) -> str:
    keyed = md5_long_sql(f"(CAST(o_orderkey AS VARCHAR) || ':{b}')")
    u = f"(CAST({keyed} AS DOUBLE) / {_TWO60})"
    w = "CASE "
    for k, t in enumerate(_POIS_CUM):
        w += f"WHEN {u} < {t} THEN {k} "
    return w + "ELSE 5 END"


def _boot_weight(b: int):
    """Spark twin of _boot_w_sql: replica ``b``'s deterministic
    Poisson(1) weight for a row, from md5(orderkey:b) against the
    hard-coded cumulative thresholds. Shared by the global and the
    grouped entry — the 'consistent resamples of the same virtual
    bootstrap population' property requires the two to stay in
    lockstep."""
    from ..functions.scalar import md5_long

    u = (
        md5_long(
            F.concat(F.col("o_orderkey").cast("string"), F.lit(f":{b}"))
        ).cast("double")
        / F.lit(float(2**60))
    )
    expr = None
    for k, t in enumerate(_POIS_CUM):
        cond = u < float(t)
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    return expr.otherwise(5)


def _boot_aggs() -> list:
    """The 2B+1 aggregate expressions of one bootstrap scan: per-replica
    weighted sum + weight total, plus the exact point mean."""
    p = F.col("o_totalprice").cast("decimal(18,2)")
    aggs = []
    for b in range(_BOOT_B):
        wb = _boot_weight(b)
        aggs.append(F.sum(wb * p).alias(f"s{b}"))
        aggs.append(F.sum(wb).alias(f"n{b}"))
    aggs.append(
        (F.sum(p).cast("double") / F.count(F.lit(1))).alias("point_mean")
    )
    return aggs


def _boot_means():
    """Sorted array of the B replica means over the aggregate row."""
    return F.array_sort(
        F.array(
            *[
                (F.col(f"s{b}").cast("double") / F.col(f"n{b}"))
                for b in range(_BOOT_B)
            ]
        )
    )


def _bootstrap_oracle(group_col: str | None = None) -> str:
    """DuckDB twin of the bootstrap scan; ``group_col`` switches
    between the global 1-row form and the per-group form."""
    aggs = ",\n  ".join(
        f"SUM(w{b} * p) AS s{b}, CAST(SUM(w{b}) AS BIGINT) AS n{b}"
        for b in range(_BOOT_B)
    )
    ws = ",\n    ".join(f"{_boot_w_sql(b)} AS w{b}" for b in range(_BOOT_B))
    means = ", ".join(
        f"CAST(s{b} AS DOUBLE) / n{b}" for b in range(_BOOT_B)
    )
    g = f"{group_col}, " if group_col else ""
    gby = "GROUP BY 1" if group_col else ""
    tail = (
        ""
        if group_col
        else f",\n  CAST({_BOOT_B} AS INT) AS b"
    )
    return f"""
WITH r AS (
  SELECT {g}o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
    {ws}
  FROM orders
),
a AS (
  SELECT {g}{aggs},
    CAST(SUM(p) AS DOUBLE) / COUNT(*) AS point_mean
  FROM r {gby}
),
m AS (SELECT {g}point_mean, list_sort([{means}]) AS ms FROM a)
SELECT {g}point_mean, ms[2] AS boot_lo, ms[{_BOOT_B - 1}] AS boot_hi{tail}
FROM m
"""


@register(
    "orders_bootstrap_ci",
    group="ext-stats bootstrap",
    oracle=_bootstrap_oracle(),
    doc="Poisson-bootstrap confidence interval for the mean order "
    "price (Chamandy et al., 'Estimating Uncertainty for Massive "
    "Data Streams' — THE bootstrap for data too big to resample by "
    "index): each of 20 replicas weights every row by a Poisson(1) "
    "draw derived DETERMINISTICALLY from md5(orderkey:replica) "
    "against hard-coded cumulative thresholds, so all 20 weighted "
    "sums accumulate in ONE scan as exact decimals (no 20x data "
    "blow-up, no RNG — retries and engines agree bit-for-bit). CI = "
    "2nd / 19th order statistic of the replica means via array_sort "
    "on the 1-row aggregate. Per-replica mean is one double "
    "division of exact operands.",
)
def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "orders").agg(*_boot_aggs())
    means = _boot_means()
    return a.select(
        "point_mean",
        F.element_at(means, 2).alias("boot_lo"),
        F.element_at(means, _BOOT_B - 1).alias("boot_hi"),
        F.lit(_BOOT_B).alias("b"),
    )


@register(
    "orders_bootstrap_ci_by_priority",
    group="ext-stats bootstrap grouped",
    oracle=_bootstrap_oracle("o_orderpriority"),
    doc="Per-group Poisson-bootstrap CIs (the grouped form of "
    "orders_bootstrap_ci): every priority class gets its own 20 "
    "deterministic replica means and a [2nd, 19th] order-statistic "
    "interval, still in ONE scan — the 40 weighted aggregates ride "
    "the same map-combined groupBy the point estimate uses, so "
    "uncertainty costs no extra pass over the data. Weight reuse is "
    "deliberate: replica b's weight for a row depends only on "
    "(orderkey, b), so group CIs and the global CI are consistent "
    "resamples of the same virtual bootstrap population.",
)
def orders_bootstrap_ci_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    a = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(*_boot_aggs())
    )
    means = _boot_means()
    return a.select(
        "o_orderpriority",
        "point_mean",
        F.element_at(means, 2).alias("boot_lo"),
        F.element_at(means, _BOOT_B - 1).alias("boot_hi"),
    )
