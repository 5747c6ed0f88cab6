"""Event-analytics and text-similarity extensions.

The reference is strictly batch ELT over NBA tables; a large-scale
engine additionally needs the classic event-log analytics — funnels,
retention cohorts, gap-filled time series — and weighted text
similarity. Each lands here as a catalog query with a DuckDB oracle
over the driver testdata (`events`, `documents`).

Scale notes are per-query; the common theme is that every operator is
ONE window-or-aggregation pass partitioned by its natural key (user_id
/ term), so the shuffle is the unavoidable one and nothing is
quadratic except the explicitly-capped posting-list emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import dbig, epoch_us
from ..operators import similarity
from ..sources.catalog import load_table
from .registry import register

_FUNNEL_STAGES = [("signup", None), ("view", "s1"), ("click", "s2"), ("purchase", "s3")]


@register(
    "events_funnel",
    group="ext-events 2.5-W4",
    oracle="""
WITH d1 AS (
  SELECT user_id, ts, event_type,
    min(CASE WHEN event_type = 'signup' THEN ts END)
      OVER (PARTITION BY user_id) AS s1
  FROM events
),
d2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts > s1 THEN ts END)
      OVER (PARTITION BY user_id) AS s2 FROM d1
),
d3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > s2 THEN ts END)
      OVER (PARTITION BY user_id) AS s3 FROM d2
),
d4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > s3 THEN ts END)
      OVER (PARTITION BY user_id) AS s4 FROM d3
),
pu AS (SELECT DISTINCT user_id, s1, s2, s3, s4 FROM d4),
agg AS (
  SELECT CAST(COUNT(s1) AS BIGINT) AS c1, CAST(COUNT(s2) AS BIGINT) AS c2,
         CAST(COUNT(s3) AS BIGINT) AS c3, CAST(COUNT(s4) AS BIGINT) AS c4
  FROM pu
)
SELECT 1 AS stage_no, 'signup' AS stage, c1 AS users FROM agg
UNION ALL SELECT 2, 'view', c2 FROM agg
UNION ALL SELECT 3, 'click', c3 FROM agg
UNION ALL SELECT 4, 'purchase', c4 FROM agg
""",
    doc="Ordered conversion funnel signup > view > click > purchase: "
    "each stage's timestamp is the user's first qualifying event "
    "STRICTLY AFTER the previous stage (chained window minima). Four "
    "dependent window exprs share one user_id partitioning, so the "
    "whole funnel costs a single shuffle regardless of stage count; "
    "per-user state is 4 timestamps, never the event list.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    d = ev
    for i, (etype, prev) in enumerate(_FUNNEL_STAGES, start=1):
        cond = F.col("event_type") == etype
        if prev is not None:
            cond = cond & (F.col("ts") > F.col(prev))
        d = d.withColumn(f"s{i}", F.min(F.when(cond, F.col("ts"))).over(w))
    per_user = d.select("user_id", "s1", "s2", "s3", "s4").dropDuplicates(
        ["user_id"]
    )
    agg = per_user.agg(
        F.count("s1").alias("c1"),
        F.count("s2").alias("c2"),
        F.count("s3").alias("c3"),
        F.count("s4").alias("c4"),
    )
    return agg.select(
        F.expr(
            "stack(4, 1, 'signup', c1, 2, 'view', c2,"
            " 3, 'click', c3, 4, 'purchase', c4)"
            " AS (stage_no, stage, users)"
        )
    )


@register(
    "events_retention_cohorts",
    group="ext-events 2.4",
    oracle="""
WITH fu AS (
  SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts
  FROM events
)
SELECT CAST(CAST(date_trunc('week', first_ts) AS TIMESTAMP) AS VARCHAR)
    AS cohort_week,
  CAST((epoch_us(ts) - epoch_us(first_ts)) // 604800000000 AS INT) AS week_no,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM fu GROUP BY 1, 2
""",
    doc="Weekly retention cohorts: cohort = week of the user's first "
    "event (window min over user_id), week_no = integer weeks since "
    "that first event (exact microsecond integer division — no float "
    "date math), active_users = COUNT DISTINCT per cell. One window "
    "shuffle + one agg shuffle; the cohort matrix is tiny output.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    fu = ev.select(
        "user_id", "ts", F.min("ts").over(w).alias("first_ts")
    )
    week_us = 7 * 24 * 3600 * 1000000
    return (
        fu.select(
            F.date_trunc("week", F.col("first_ts"))
            .cast("string")
            .alias("cohort_week"),
            (
                (epoch_us("ts") - epoch_us("first_ts"))
                / F.lit(week_us)
            )
            .cast("int")
            .alias("week_no"),
            "user_id",
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "events_hour_gapfill",
    group="ext-events timeseries",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
    SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
nb AS (
  SELECT user_id, h, v,
    lag(h) OVER (PARTITION BY user_id ORDER BY h) AS ph
  FROM hourly
),
fills AS (
  SELECT user_id,
    unnest(generate_series(ph + INTERVAL 1 HOUR, h - INTERVAL 1 HOUR,
                           INTERVAL 1 HOUR)) AS h,
    CAST(NULL AS DECIMAL(18,2)) AS v
  FROM nb
  WHERE ph IS NOT NULL AND date_diff('hour', ph, h) BETWEEN 2 AND 2160
),
joined AS (
  SELECT user_id, h, v FROM hourly
  UNION ALL SELECT user_id, h, v FROM fills
)
SELECT user_id, CAST(h AS VARCHAR) AS hour,
  CAST(last_value(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS value_filled,
  v IS NULL AS gap_filled
FROM joined
""",
    doc="Hourly gap-fill + LOCF (the timescale-style resample): per "
    "user, densify every INTERNAL gap up to 90 days (2160 hours) via "
    "lag + sequence()/explode, then carry the last observed hourly "
    "sum forward with last(ignorenulls) over an ordered window. "
    "Bounded-gap fill is the production contract (edge-fuzz find, "
    "r06: a single 1970 timestamp outlier made the former global "
    "min..max grid emit ~2e6 rows per affected user — at 100 TB one "
    "bad row must cost O(cap), not O(span)); every observed hour "
    "always surfaces, and gaps beyond the cap are left unfilled "
    "rather than interpolated across months of silence. Grid "
    "generation is per-user-local (no cross-user shuffle beyond the "
    "hourly agg); hour sums stay exact decimal until the surface. "
    "Pristine-data output is identical to the unbounded form (max "
    "observed gap 141 h << cap).",
)
def events_hour_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NULL-ts rows never enter the grid (the former min/max grid form
    # ignored them implicitly; the lag/LOCF windows below would order
    # a NULL hour NULLS-FIRST in Spark vs NULLS-LAST in DuckDB)
    hourly = (
        ev.filter(F.col("ts").isNotNull())
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    wlag = Window.partitionBy("user_id").orderBy("h")
    nb = hourly.select(
        "user_id", "h", "v", F.lag("h").over(wlag).alias("ph")
    )
    fills = (
        nb.filter(
            F.col("ph").isNotNull()
            & F.expr("timestampdiff(HOUR, ph, h) BETWEEN 2 AND 2160")
        )
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.expr("ph + INTERVAL 1 HOUR"),
                    F.expr("h - INTERVAL 1 HOUR"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("h"),
            F.lit(None).cast("decimal(18,2)").alias("v"),
        )
    )
    joined = hourly.select("user_id", "h", "v").unionByName(fills)
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").cast("string").alias("hour"),
        F.last("v", ignorenulls=True).over(w).cast("double").alias("value_filled"),
        F.col("v").isNull().alias("gap_filled"),
    )


@register(
    "embedding_int8_quantize",
    group="ext-similarity quantize",
    oracle="""
WITH dv AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
mx AS (
  SELECT vec_id, v,
    list_reduce(list_transform(v, x -> abs(x)),
                (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS m
  FROM dv
),
q AS (
  SELECT vec_id, v, m / 127.0 AS scale,
    list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)) AS qv
  FROM mx WHERE m > 0
)
SELECT vec_id, scale,
  CAST(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b)
       AS BIGINT) AS qnorm_sq,
  list_reduce(
    list_transform(generate_series(1, len(v)),
                   i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)),
    (a, b) -> a + b) AS recon_err_sq
FROM q
""",
    doc="Per-vector symmetric int8 quantization: scale = max|x|/127, "
    "q_i = floor(x*127/max + 0.5) — explicit floor arithmetic instead "
    "of round() so both engines share one IEEE formula (round() "
    "half-up vs half-even would diverge). Surfaces the quantized "
    "norm (integer-exact) and the squared reconstruction error "
    "(sequential in-order fold, partitioning-independent). Pure "
    "narrow map — no shuffle at any scale; the compression stage of "
    "an embedding-index build. All-zero (and empty) vectors have no "
    "quantization scale (0/0), so both engines drop them via m > 0 "
    "rather than emitting NaN-derived rows / cast errors.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", v.alias("v"))
    m = F.aggregate(
        F.transform(F.col("v"), lambda x: F.abs(x)),
        F.lit(float("-inf")),
        lambda a, b: F.when(b > a, b).otherwise(a),
    )
    # all-zero vectors: x*127/m = 0/0 = NaN -> NULL qv Spark-side but a
    # hard cast error in the DuckDB twin; empty vectors leave m = -inf.
    # Neither has a defined int8 scale — drop them on both engines.
    d = d.select("vec_id", "v", m.alias("m")).filter(F.col("m") > 0)
    qv = F.transform(
        F.col("v"),
        lambda x: F.floor(x * 127.0 / F.col("m") + 0.5).cast("bigint"),
    )
    d = d.select(
        "vec_id", "v", (F.col("m") / 127.0).alias("scale"), qv.alias("qv")
    )
    qnorm = F.aggregate(
        F.transform(F.col("qv"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda a, b: a + b,
    )
    err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("qv"),
            lambda x, q: (x - q * F.col("scale")) * (x - q * F.col("scale")),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return d.select(
        "vec_id",
        "scale",
        qnorm.alias("qnorm_sq"),
        err.alias("recon_err_sq"),
    )


@register(
    "embedding_matryoshka_energy",
    group="ext-similarity truncate",
    oracle="""
WITH dv AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
norms AS (
  SELECT vec_id, label,
    list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS full_sq,
    list_reduce(list_transform(v[1:16], x -> x * x), (a, b) -> a + b)
      AS head_sq
  FROM dv
)
SELECT vec_id, label, sqrt(full_sq) AS l2_full, sqrt(head_sq) AS l2_head16,
  CASE WHEN full_sq <> 0 THEN head_sq / full_sq END AS energy_ratio
FROM norms
""",
    doc="Matryoshka-style truncation diagnostics: L2 of the full "
    "64-dim vector vs its 16-dim head, and the retained-energy ratio "
    "that decides whether a truncated index is safe. In-order "
    "sequential folds over the array -> identical doubles on both "
    "engines; narrow map, no shuffle. Zero vectors surface a NULL "
    "energy ratio on BOTH sides (edge-fuzz find, r06: Spark ANSI "
    "raised DIVIDE_BY_ZERO where DuckDB's double 0/0 is NULL).",
)
def embedding_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", "label", v.alias("v"))

    def sumsq(col: F.Column) -> F.Column:
        return F.aggregate(
            F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )

    full_sq = sumsq(F.col("v"))
    head_sq = sumsq(F.slice(F.col("v"), 1, 16))
    return d.select(
        "vec_id",
        "label",
        F.sqrt(full_sq).alias("l2_full"),
        F.sqrt(head_sq).alias("l2_head16"),
        # zero-norm guard (NULL, like the oracle's double 0/0):
        # ANSI division would raise on an all-zero vector
        F.when(full_sq != F.lit(0.0), head_sq / full_sq).alias(
            "energy_ratio"
        ),
    )


@register(
    "text_tfcosine_pairs",
    group="ext-dedup ext-similarity",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))
         AS UBIGINT)::BIGINT AS term
  FROM toks, unnest(generate_series(1, greatest(len(w) - 2, 0))) u(i)
),
tf0 AS (
  SELECT doc_id AS doc, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM grams GROUP BY 1, 2
),
tf AS (
  SELECT tf0.* FROM tf0
  JOIN (SELECT term FROM tf0 GROUP BY term HAVING COUNT(*) <= 25) cold
  USING (term)
),
norms AS (SELECT doc, CAST(SUM(tf * tf) AS BIGINT) AS nsq FROM tf GROUP BY 1),
dots AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM tf a JOIN tf b ON a.term = b.term AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT d.doc_a, d.doc_b, d.dot,
  CAST(d.dot AS DOUBLE) / (sqrt(na.nsq) * sqrt(nb.nsq)) AS cosine
FROM dots d
JOIN norms na ON na.doc = d.doc_a
JOIN norms nb ON nb.doc = d.doc_b
WHERE CAST(d.dot AS DOUBLE) / (sqrt(na.nsq) * sqrt(nb.nsq)) >= 0.5
""",
    doc="Weighted near-dup: 3-gram term-frequency cosine >= 0.5 over "
    "all doc pairs via the sparse inverted-index join "
    "(operators/similarity.tf_cosine_pairs). Integer dots and squared "
    "norms, one float sqrt/divide at the surface — bit-identical to "
    "the oracle. The posting-list emit is the only quadratic step; "
    "max_term_freq=25 caps it (identical results at bench scale, where "
    "every df <= 25 anyway, but a replicated-corpus stress at 10x "
    "sf0.1 measured 19x runtime and 1000x output without the cap — "
    "hot boilerplate shingles are exactly what it drops at 100 TB).",
)
def text_tfcosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return similarity.tf_cosine_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_term_freq=25
    )


@register(
    "events_click_purchase_join",
    group="ext-events 2.3",
    oracle="""
SELECT c.user_id,
  CAST(epoch_us(c.ts) AS BIGINT) AS click_us,
  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
  p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
""",
    doc="Attribution-style interval join: every (click, purchase) pair "
    "for the same user with the purchase inside [click, click+30min]. "
    "The equi-key (user_id) carries the shuffle; the time range is a "
    "post-join filter, so this is a hash join, never a cartesian. All "
    "comparisons are integer microseconds (unix_micros on both "
    "engines) — no interval/timezone arithmetic to diverge on. This "
    "is the batch twin of stream_stream_join, whose watermarked "
    "range condition bounds both sides' state at unbounded scale.",
)
def events_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", epoch_us("ts").alias("click_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        epoch_us("ts").alias("purchase_us"),
        F.col("value").alias("purchase_value"),
    )
    return (
        clicks.join(
            purchases,
            (clicks["user_id"] == purchases["p_user"])
            & (purchases["purchase_us"] >= clicks["click_us"])
            & (purchases["purchase_us"] <= clicks["click_us"] + 1800000000),
            "inner",
        )
        .select("user_id", "click_us", "purchase_us", "purchase_value")
    )


@register(
    "events_segment_enrich",
    group="ext-events 2.3 2.4",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
    doc="Dimension enrichment of the event log: events joined to the "
    "customer dim on user_id, aggregated per market segment x event "
    "type. The dim is broadcast, so the fact never shuffles for the "
    "join — the only exchange is the final tiny-keyspace agg. Batch "
    "twin of stream_static_enrich (the stream-static join pattern).",
)
def events_segment_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(cust), F.col("c_custkey") == F.col("user_id"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "events_props_json",
    group="ext-events semi-structured",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS BIGINT)
    AS k_present,
  CAST(SUM(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS BIGINT)
    AS k_sum,
  MIN(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS k_min,
  MAX(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS k_max,
  CAST(COUNT(DISTINCT TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT))
    AS BIGINT) AS k_distinct
FROM events
GROUP BY event_type
""",
    doc="Semi-structured extraction: the event log's ``props`` JSON "
    "string column parsed with a typed schema (``from_json`` — one "
    "vectorized JVM parse per row, no Python) and profiled per event "
    "type. At 100 TB the parse cost dominates, so it runs exactly once "
    "in the projection and every aggregate reuses the struct field; "
    "schema-on-read keeps the raw column intact for other consumers. "
    "Malformed JSON yields NULL (PERMISSIVE), counted by k_present "
    "vs events.",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    parsed = ev.withColumn(
        "k", F.from_json("props", "k INT").getField("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.count("k").alias("k_present"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count_distinct("k").alias("k_distinct"),
    )


@register(
    "events_value_mad",
    group="ext-events 2.4 robust-stats",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.cents, m.med_cents,
         abs(c.cents - m.med_cents) AS adev
  FROM c JOIN med m ON c.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  d.med_cents AS med_cents,
  md.mad_cents AS mad_cents,
  CAST(COUNT(*) FILTER (
    WHERE md.mad_cents > 0 AND d.adev / md.mad_cents > 3.0
  ) AS BIGINT) AS outliers
FROM dev d JOIN mad md ON d.event_type = md.event_type
GROUP BY d.event_type, d.med_cents, md.mad_cents
""",
    doc="Robust per-group dispersion: median + MAD (median absolute "
    "deviation) of event value, plus a |x-med|/MAD > 3 outlier count — "
    "the heavy-tail-safe twin of outlier_orders_zscore (mean/stddev "
    "break under the contamination they're meant to find). Values are "
    "quantized to integer cents first, so every interpolated median "
    "lands on exact binary fractions (halves/quarters) and both "
    "engines agree bit-exactly — the same fixed-point trick as the "
    "EWMA profile. Exact percentiles sort within each group; at "
    "100 TB swap in approx_percentile (approx_sketches shows that "
    "path) when rank error is acceptable.",
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("mad_cents") > 0)
                    & (F.col("adev") / F.col("mad_cents") > 3.0),
                    1,
                )
                .otherwise(0)
                .cast("bigint")
            ).alias("outliers"),
        )
        .select("event_type", "n", "med_cents", "mad_cents", "outliers")
    )


@register(
    "events_props_variant",
    group="ext-events semi-structured variant",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(SUM(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS BIGINT)
    AS k_sum,
  MIN(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS k_min,
  MAX(TRY_CAST(json_extract_string(TRY_CAST(props AS JSON), '$.k') AS INT)) AS k_max
FROM events
GROUP BY event_type
""",
    doc="The VARIANT path for semi-structured props (Spark 4): "
    "parse_json once into the binary-encoded Variant type, then typed "
    "variant_get extraction. Versus from_json (events_props_json), "
    "Variant needs no up-front schema — fields not touched are never "
    "decoded, which at 100 TB means a pipeline can land raw "
    "heterogeneous JSON once and every consumer pays only for the "
    "paths it reads. try_parse_json + try_variant_get yield NULL on "
    "malformed input / type mismatch (PERMISSIVE twin — edge-fuzz "
    "find r06: parse_json FAILFASTs on a non-JSON props string where "
    "the oracle's TRY_CAST is NULL).",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    parsed = ev.withColumn(
        "k", F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


#: HLL sketch precision, passed EXPLICITLY to hll_sketch_agg so the
#: bound below and the sketch configuration cannot drift apart if a
#: Spark upgrade changes the default (ADVICE r08): 3-sigma relative
#: error for lgConfigK=12 is RSE = 1.04/sqrt(2^12) ~= 1.63%,
#: 3 sigma ~= 4.9%
_HLL_LGK = 12
_HLL_BOUND = 0.05


@register(
    "events_hll_daily_rollup",
    group="ext-events 2.4 approx sketch-rollup",
    oracle=f"""
WITH base AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_no, user_id
  FROM events WHERE ts IS NOT NULL
),
d AS (
  SELECT date_trunc('month',
           DATE '1970-01-01' + CAST(day_no AS INTEGER))::DATE AS month,
         day_no, user_id
  FROM base
),
daily AS (
  SELECT month, day_no, CAST(COUNT(*) AS BIGINT) AS events
  FROM d GROUP BY 1, 2
),
m AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS days,
         CAST(SUM(events) AS BIGINT) AS events
  FROM daily GROUP BY 1
),
x AS (
  SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM d GROUP BY 1
)
SELECT CAST(m.month AS VARCHAR) AS month, m.days, m.events,
       x.exact_users, TRUE AS sketch_within_bound
FROM m JOIN x USING (month)
""",
    doc="Mergeable-sketch distinct rollup (the continuous-aggregate "
    "trick for COUNT DISTINCT): per-day HLL sketches of user_id "
    "(hll_sketch_agg), then the MONTHLY distinct estimated by UNIONING "
    "the daily sketches (hll_union_agg) — raw data scanned once at "
    "daily grain, every coarser resolution derived from kilobyte "
    "sketches, exactly how hypertable_rollup_1h cascades its exact "
    "counts. Sketch binaries are engine-specific, so the BRACKET is "
    "what the oracle checks (VERDICT r07 item 4): the entry emits the "
    "exact monthly distinct plus sketch_within_bound = |est - exact| "
    f"<= {_HLL_BOUND} * exact (3-sigma of the published lgK=12 RSE), "
    "and DuckDB recomputes the exact side and asserts TRUE. Date "
    "grain is tz-free integer epoch-day -> calendar month (the "
    "TIMESTAMP_NTZ class from r01). The exact column rides along for "
    "the bracket only; the production rollup keeps just the sketches.",
)
def events_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            (epoch_us("ts") / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("day_no"),
            "user_id",
        )
        .withColumn(
            "month",
            F.trunc(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_no").cast("int")),
                "month",
            ),
        )
    )
    daily = ev.groupBy("month", "day_no").agg(
        F.hll_sketch_agg("user_id", _HLL_LGK).alias("sk"),
        F.count(F.lit(1)).alias("events"),
    )
    monthly = daily.groupBy("month").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("events").alias("events"),
        F.count(F.lit(1)).alias("days"),
    )
    exact = ev.groupBy("month").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        monthly.join(exact, "month")
        .select(
            F.col("month").cast("string").alias("month"),
            "days",
            "events",
            "exact_users",
            (
                # a month whose user_ids are all NULL yields a NULL
                # sketch (aggregates skip NULLs) — read as estimate 0,
                # matching exact_users = 0, instead of a NULL bound
                F.abs(F.coalesce(F.col("est"), F.lit(0)) - F.col("exact_users"))
                <= _HLL_BOUND * F.col("exact_users")
            ).alias("sketch_within_bound"),
        )
    )


@register(
    "events_rfm_segments",
    group="ext-events 2.4 rfm",
    oracle="""
WITH rfm AS (
  SELECT user_id,
    MAX(epoch_us(ts)) AS recency_us,
    CAST(COUNT(*) AS BIGINT) AS frequency,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS monetary_cents
  FROM events GROUP BY user_id
),
th AS (
  SELECT quantile_cont(recency_us, 0.5) AS r_med,
         quantile_cont(frequency, 0.5) AS f_med,
         quantile_cont(monetary_cents, 0.5) AS m_med
  FROM rfm
)
SELECT
  CASE WHEN recency_us >= r_med THEN 'R1' ELSE 'R0' END ||
  CASE WHEN frequency > f_med THEN 'F1' ELSE 'F0' END ||
  CASE WHEN monetary_cents > m_med THEN 'M1' ELSE 'M0' END AS segment,
  CAST(COUNT(*) AS BIGINT) AS users,
  CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
FROM rfm CROSS JOIN th
GROUP BY 1
""",
    doc="RFM (recency/frequency/monetary) segmentation of the event "
    "log: per-user aggregates on exact integer axes (epoch micros, "
    "counts, cents), split at the global medians into 8 segments. "
    "Exact interpolated medians over integers land on binary "
    "fractions, so the >=/> threshold comparisons are identical on "
    "both engines — no float-boundary flicker in segment membership. "
    "Plan: one user-keyed agg, one tiny median pass broadcast back, "
    "one 8-key final agg.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        epoch_us("ts").alias("us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    rfm = ev.groupBy("user_id").agg(
        F.max("us").alias("recency_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    th = rfm.agg(
        F.percentile("recency_us", F.lit(0.5)).alias("r_med"),
        F.percentile("frequency", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary_cents", F.lit(0.5)).alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("recency_us") >= F.col("r_med"), F.lit("R1")).otherwise(
            F.lit("R0")
        ),
        F.when(F.col("frequency") > F.col("f_med"), F.lit("F1")).otherwise(
            F.lit("F0")
        ),
        F.when(F.col("monetary_cents") > F.col("m_med"), F.lit("M1")).otherwise(
            F.lit("M0")
        ),
    )
    return (
        rfm.crossJoin(F.broadcast(th))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.sum("monetary_cents").alias("segment_cents"),
        )
    )


@register(
    "events_twap",
    group="ext-events timeseries 2.5",
    oracle="""
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS us,
    lead(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us
  FROM events
),
agg AS (
  SELECT user_id,
    SUM(CAST(value AS DECIMAL(18,2)) * (next_us - us)) AS wsum,
    CAST(MAX(COALESCE(next_us, us)) - MIN(us) AS BIGINT) AS span_us,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM seq GROUP BY user_id
)
SELECT user_id, n_events, span_us,
  (CAST(FLOOR(wsum) AS DOUBLE) + CAST(wsum - FLOOR(wsum) AS DOUBLE))
    / span_us AS twap
FROM agg WHERE span_us > 0
""",
    doc="Time-weighted average value per user (the TWAP / "
    "time_weight('locf') aggregate of time-series stores): each "
    "observation is held until the next one, weights are exact integer "
    "microsecond intervals times exact-decimal values, one float "
    "division at the surface. One lead window + one agg sharing the "
    "user_id shuffle. The plain AVG over-weights burst periods; TWAP "
    "is the duration-correct summary.",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.withColumn("next_us", F.lead("us").over(w))
    agg = seq.groupBy("user_id").agg(
        F.sum(
            F.col("value").cast("decimal(18,2)")
            * (F.col("next_us") - F.col("us"))
        ).alias("wsum"),
        (F.max(F.coalesce("next_us", "us")) - F.min("us"))
        .cast("bigint")
        .alias("span_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # wsum's unscaled value can exceed 2^53 (micros x cents): dbig
    # splits the decimal before the double cast so both engines round
    # identically (see functions.scalar.dbig)
    return agg.filter(F.col("span_us") > 0).select(
        "user_id",
        "n_events",
        "span_us",
        (dbig(F.col("wsum")) / F.col("span_us")).alias("twap"),
    )


@register(
    "events_ohlc_hourly",
    group="ext-events timeseries 2.4",
    oracle="""
WITH b AS (
  SELECT date_trunc('hour', ts) AS h, event_type, value,
    epoch_us(ts) AS us, event_id
  FROM events WHERE ts IS NOT NULL
),
r AS (
  SELECT h, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY h, event_type
                       ORDER BY us ASC, event_id ASC) AS rn_open,
    ROW_NUMBER() OVER (PARTITION BY h, event_type
                       ORDER BY us DESC, event_id DESC) AS rn_close
  FROM b
)
SELECT CAST(CAST(h AS TIMESTAMP) AS VARCHAR) AS hour, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MAX(CASE WHEN rn_close = 1 THEN value END) AS close
FROM r GROUP BY 1, 2
""",
    doc="Hourly OHLC (open/high/low/close) bars per event type — the "
    "candlestick rollup every market/telemetry store ships. Open and "
    "close are deterministic first/last by (event time, event_id) via "
    "a struct-min/max fold (min_by alone is tie-ambiguous), high/low "
    "are plain extremes; one bucketed agg shuffle, map-side combined.",
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a timeless event belongs to no bar, and the all-NULL-us group's
    # open/close order is engine-dependent (differential-fuzzer find)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        "event_type",
        "value",
        epoch_us("ts").alias("us"),
        "event_id",
    )
    key = F.struct("us", "event_id", "value")
    return ev.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(key).getField("value").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(key).getField("value").alias("close"),
    )


@register(
    "events_value_histogram",
    group="ext-events 2.4 profiling",
    oracle="""
WITH s AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
b AS (
  SELECT LEAST(CAST(floor((value - mn) / (mx - mn) * 10) AS INT), 9)
           AS bucket,
         mn, mx
  FROM events CROSS JOIN s
)
SELECT bucket,
  mn + bucket * ((mx - mn) / 10) AS lo,
  mn + (bucket + 1) * ((mx - mn) / 10) AS hi,
  CAST(COUNT(*) AS BIGINT) AS cnt
FROM b GROUP BY bucket, mn, mx
""",
    doc="Equi-width 10-bucket histogram of event value: global min/max "
    "from one map-combined scalar agg broadcast back, bucket index and "
    "bounds from pure IEEE multiply/divide (no engine histogram "
    "builtin, so both engines run the identical arithmetic — DuckDB "
    "lacks width_bucket and Spark's is this formula anyway). The max "
    "value clamps into the top bucket. Distribution profiling shape: "
    "two passes over the fact, the second purely row-local.",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("value")
    s = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    width = (F.col("mx") - F.col("mn")) / 10
    bucket = F.least(
        F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 10)
        .cast("int"),
        F.lit(9),
    )
    return (
        ev.crossJoin(F.broadcast(s))
        .select(bucket.alias("bucket"), "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            (F.col("mn") + F.col("bucket") * width).alias("lo"),
            (F.col("mn") + (F.col("bucket") + 1) * width).alias("hi"),
            "cnt",
        )
    )


@register(
    "events_scd2_intervals",
    group="ext-events warehouse",
    oracle="""
SELECT user_id,
  CAST(ROW_NUMBER() OVER w AS INT) AS version,
  value,
  CAST(epoch_us(ts) AS BIGINT) AS effective_from_us,
  CAST(LEAD(epoch_us(ts)) OVER w AS BIGINT) AS effective_to_us,
  LEAD(epoch_us(ts)) OVER w IS NULL AS is_current
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
""",
    doc="SCD Type-2 dimension build: each user's event stream becomes "
    "versioned validity intervals — effective_from = the change's "
    "timestamp, effective_to = the NEXT change's (NULL + is_current "
    "for the open row), version = change ordinal. One user-keyed "
    "window shuffle; the half-open [from, to) convention means "
    "point-in-time lookups are a single BETWEEN, and the build is "
    "idempotent (re-running on the same changelog yields identical "
    "intervals — no state carried between runs).",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a change row without an identity or a timestamp cannot version a
    # dimension (and NULL placement in the time order differs between
    # engines — differential-fuzzer class); mirrored in the oracle and
    # in scd2_asof_enrich's dim CTE, which reuses this builder
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "value", epoch_us("ts").alias("us"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("int").alias("version"),
        "value",
        F.col("us").alias("effective_from_us"),
        F.lead("us").over(w).alias("effective_to_us"),
        F.lead("us").over(w).isNull().alias("is_current"),
    )


@register(
    "key_skew_profile",
    group="ext-events 2.4 profiling",
    oracle="""
WITH cnts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
hist AS (
  SELECT cnt, CAST(COUNT(*) AS BIGINT) AS freq FROM cnts GROUP BY cnt
),
h AS (
  SELECT cnt, freq,
    SUM(freq) OVER (ORDER BY cnt
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_keys,
    SUM(freq) OVER () AS total_keys,
    SUM(cnt * freq) OVER () AS total_rows
  FROM hist
)
SELECT CAST(MAX(total_rows) AS BIGINT) AS n_rows,
  CAST(MAX(total_keys) AS BIGINT) AS n_keys,
  CAST(MAX(cnt) AS BIGINT) AS max_cnt,
  CAST(MIN(CASE WHEN cum_keys >= ceil(CAST(0.50 AS DOUBLE) * total_keys)
    THEN cnt END) AS BIGINT) AS p50_cnt,
  CAST(MIN(CASE WHEN cum_keys >= ceil(CAST(0.90 AS DOUBLE) * total_keys)
    THEN cnt END) AS BIGINT) AS p90_cnt,
  CAST(MIN(CASE WHEN cum_keys >= ceil(CAST(0.99 AS DOUBLE) * total_keys)
    THEN cnt END) AS BIGINT) AS p99_cnt,
  CAST(MAX(cnt) AS DOUBLE) / MAX(total_rows) AS top1_share,
  CAST(MAX(cnt) AS DOUBLE) * CAST(MAX(total_keys) AS DOUBLE)
    / MAX(total_rows) AS max_over_mean
FROM h
""",
    doc="Key-skew diagnostic — the profile you run BEFORE choosing a "
    "partitioning/salting strategy for a join or agg key. Two "
    "map-combined aggregations reduce the fact to a COUNT-OF-COUNTS "
    "histogram (|distinct per-key counts| rows — kilobytes at any "
    "corpus size), and the key-count quantiles (p50/p90/p99, discrete "
    "'smallest count covering >= ceil(q*keys)' — pure integer logic, "
    "no interpolation to diverge cross-engine) come from one window "
    "pass over that tiny table. max_over_mean is the classic skew "
    "factor (hottest key vs mean key); >> shuffle-partition count "
    "means AQE skew-split or salting. Raw keys never sort globally.",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why="the global window runs over the count-of-counts "
    "histogram, bounded by |distinct frequencies| = O(sqrt(n_rows)) "
    "(sum of distinct counts <= n_rows) — kilobytes-to-megabytes at "
    "any corpus size, never row- or key-grain",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cnts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    hist = cnts.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
    w_cum = (
        Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    h = hist.select(
        "cnt",
        "freq",
        F.sum("freq").over(w_cum).alias("cum_keys"),
        F.sum("freq").over(w_all).alias("total_keys"),
        F.sum(F.col("cnt") * F.col("freq")).over(w_all).alias("total_rows"),
    )

    def pq(q: float, alias: str):
        return F.min(
            F.when(
                F.col("cum_keys") >= F.ceil(F.lit(q) * F.col("total_keys")),
                F.col("cnt"),
            )
        ).cast("long").alias(alias)

    return h.agg(
        F.max("total_rows").cast("long").alias("n_rows"),
        F.max("total_keys").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        pq(0.50, "p50_cnt"),
        pq(0.90, "p90_cnt"),
        pq(0.99, "p99_cnt"),
        (F.max("cnt").cast("double") / F.max("total_rows")).alias("top1_share"),
        # cast BEFORE multiplying: max_cnt * n_keys can exceed int64 at
        # large scale (silent wrap in Spark, error in DuckDB)
        (
            F.max("cnt").cast("double")
            * F.max("total_keys").cast("double")
            / F.max("total_rows")
        ).alias("max_over_mean"),
    )


@register(
    "scd2_asof_enrich",
    group="ext-events warehouse 2.3",
    oracle="""
WITH dim AS (
  SELECT user_id,
    CAST(ROW_NUMBER() OVER w AS INT) AS version,
    CAST(epoch_us(ts) AS BIGINT) AS effective_from_us,
    CAST(LEAD(epoch_us(ts)) OVER w AS BIGINT) AS effective_to_us
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
purchases AS (
  SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, d.version AS dim_version
FROM purchases p JOIN dim d
  ON p.user_id = d.user_id
 AND p.us >= d.effective_from_us
 AND (d.effective_to_us IS NULL OR p.us < d.effective_to_us)
""",
    doc="Point-in-time (as-of) lookup against the SCD2 dimension: each "
    "purchase joins the dimension version whose half-open validity "
    "interval [from, to) contains the event time — the query an SCD2 "
    "dimension exists to answer. The join is EQUI on user_id (that key "
    "carries the shuffle/broadcast); the interval containment is a "
    "row-local post-filter, so there is no range-only cartesian. The "
    "half-open convention guarantees exactly one matching version per "
    "event (the build row's own timestamp falls in its own interval).",
)
def scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import registry as _reg

    dim = (
        _reg()["events_scd2_intervals"]
        .builder(spark, sf_dir)
        .select("user_id", "version", "effective_from_us", "effective_to_us")
    )
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", epoch_us("ts").alias("us")
    )
    d = dim.alias("d")
    p = purchases.alias("p")
    return (
        p.join(
            d,
            (F.col("p.user_id") == F.col("d.user_id"))
            & (F.col("p.us") >= F.col("d.effective_from_us"))
            & (
                F.col("d.effective_to_us").isNull()
                | (F.col("p.us") < F.col("d.effective_to_us"))
            ),
        )
        .select(
            F.col("p.event_id").alias("event_id"),
            F.col("p.user_id").alias("user_id"),
            F.col("d.version").alias("dim_version"),
        )
    )


@register(
    "events_drift_chi2",
    group="ext-events quality monitoring",
    oracle="""
WITH s AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
b AS (
  SELECT CAST(CAST(date_trunc('week', ts) AS TIMESTAMP) AS VARCHAR) AS wk,
    LEAST(CAST(floor((value - mn) / (mx - mn) * 10) AS INT), 9) AS bucket
  FROM events CROSS JOIN s
),
base AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS base_cnt,
    SUM(COUNT(*)) OVER () AS base_total
  FROM b GROUP BY bucket
),
wk_tot AS (
  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_events FROM b GROUP BY wk
),
obs AS (
  SELECT wk, bucket, CAST(COUNT(*) AS BIGINT) AS o FROM b GROUP BY wk, bucket
),
grid AS (
  SELECT w.wk, w.n_events, bb.bucket, bb.base_cnt, bb.base_total,
    COALESCE(o.o, 0) AS o
  FROM wk_tot w CROSS JOIN base bb
  LEFT JOIN obs o ON o.wk = w.wk AND o.bucket = bb.bucket
),
terms AS (
  SELECT wk, n_events, bucket,
    power(o - n_events * base_cnt / CAST(base_total AS DOUBLE), 2)
      / (n_events * base_cnt / CAST(base_total AS DOUBLE)) AS term
  FROM grid
)
SELECT wk, n_events,
  list_reduce(
    list_transform(
      list_sort(list({'b': bucket, 't': term})), x -> x['t']),
    (a, x) -> a + x) AS chi2
FROM terms GROUP BY wk, n_events
""",
    doc="Distribution-drift monitor: weekly chi-square statistic of the "
    "event-value histogram against the whole-corpus baseline — the "
    "data-quality check a training pipeline runs to catch upstream "
    "shifts before they poison a training run. Buckets are global-min/"
    "max equi-width (one broadcast scalar frame); expected counts are "
    "rational expressions of integer counts; missing buckets "
    "contribute their full (0-e)^2/e via a weeks x buckets grid "
    "(|weeks|*10 rows — tiny). The per-week sum runs as an IN-ORDER "
    "fold over the bucket-sorted term list, so both engines add the "
    "10 IEEE terms in the identical order (a bare SUM() is "
    "partition-order-dependent at the last ulp). Two fact passes "
    "(bucket+count), everything downstream kilobyte-scale.",
)
def events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    s = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = ev.crossJoin(F.broadcast(s)).select(
        F.date_trunc("week", F.col("ts")).cast("string").alias("wk"),
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * 10
            ).cast("int"),
            F.lit(9),
        ).alias("bucket"),
    )

    # ONE fact aggregation; base and week totals are re-aggregations of
    # the kilobyte-sized (weeks x buckets) frame, not extra fact scans.
    # localCheckpoint pins obs so the three consumers share the
    # materialized frame instead of re-executing the scan subtree.
    obs = (
        b.groupBy("wk", "bucket")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    base = (
        obs.groupBy("bucket")
        .agg(F.sum("o").alias("base_cnt"))
        .withColumn(
            "base_total",
            F.sum("base_cnt").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    wk_tot = obs.groupBy("wk").agg(F.sum("o").alias("n_events"))
    grid = (
        wk_tot.crossJoin(F.broadcast(base))
        .join(obs, ["wk", "bucket"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
    )
    exp = (
        F.col("n_events")
        * F.col("base_cnt")
        / F.col("base_total").cast("double")
    )
    terms = grid.select(
        "wk",
        "n_events",
        "bucket",
        (F.pow(F.col("o") - exp, 2) / exp).alias("term"),
    )
    return (
        terms.groupBy("wk", "n_events")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "term"))),
                    lambda x: x["term"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("chi2")
        )
    )


#: 30-minute session gap shared by every consecutive-pair entry
_MARKOV_GAP_US = 1_800_000_000

#: Shared oracle fragment: per-user consecutive (src, dst) pairs within
#: the session gap, counted into the k*k transition matrix. Both
#: events_markov_transitions and events_bigram_lift interpolate this
#: CTE chain, so their documented "same pairs" equivalence is enforced
#: by construction, not by keeping two copies in lockstep.
_MARKOV_PAIR_CTES = """seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
    lead(event_type) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst,
    lead(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dus
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
),
pair AS (
  SELECT event_type AS src_type, dst AS dst_type FROM seq
  WHERE dst IS NOT NULL AND dus - us <= 1800000000
),
c AS (
  SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pair GROUP BY 1, 2
)"""


def _markov_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _MARKOV_PAIR_CTES: one user-keyed window pass
    emits consecutive pairs, then a map-combined count.

    Rows lacking an identity, a timestamp, or a type cannot form a
    typed per-user transition step, and engines disagree on where NULL
    sorts inside the user partition's time order (differential-fuzzer
    find) — excluded up front, mirrored in the CTE.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_id", "event_type", epoch_us("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
            (F.lead("us").over(w) - F.col("us")).alias("gap"),
        )
        .filter(
            F.col("dst_type").isNotNull() & (F.col("gap") <= _MARKOV_GAP_US)
        )
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_markov_transitions",
    group="ext-events markov",
    oracle=f"""
WITH {_MARKOV_PAIR_CTES}
SELECT src_type, dst_type, n,
  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src_type) AS DOUBLE)
    AS p
FROM c
""",
    doc="First-order Markov transition matrix over per-user event "
    "streams: consecutive (type -> next type) pairs within a 30-min "
    "gap, counted globally, with row-normalized transition "
    "probabilities. One user-keyed window pass emits the pairs, then "
    "a map-combined count; the normalizing window runs over the "
    "k*k-row matrix, not the events. p is one IEEE division of two "
    "exact integer counts — bit-identical across engines.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _markov_pair_counts(spark, sf_dir)
    norm = Window.partitionBy("src_type")
    return c.select(
        "src_type",
        "dst_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm).cast("double"))
        .alias("p"),
    )


@register(
    "events_path_trigrams",
    group="ext-events markov",
    oracle="""
WITH seq AS (
  SELECT event_type AS t0, epoch_us(ts) AS us,
    lead(event_type, 1) OVER w AS t1,
    lead(event_type, 2) OVER w AS t2,
    lead(epoch_us(ts), 1) OVER w AS us1,
    lead(epoch_us(ts), 2) OVER w AS us2
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
SELECT t0 || '>' || t1 || '>' || t2 AS path,
  CAST(COUNT(*) AS BIGINT) AS n
FROM seq
WHERE t2 IS NOT NULL
  AND us1 - us <= 1800000000 AND us2 - us1 <= 1800000000
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
""",  # seq filters NULL user/ts/type: see _markov_pair_counts
    doc="Clickstream path mining: the 20 most frequent 3-step "
    "event-type paths across users, steps at most 30 min apart "
    "(path = 'a>b>c'). Same single user-keyed window exchange as "
    "sessionize (two leads share one sort), map-combined counting, "
    "then a global top-20 via TakeOrdered on the tiny path-count "
    "frame — deterministic (n DESC, path ASC) tie-break.",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same typed/timed/identified-step contract as _markov_pair_counts
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_id", "event_type", epoch_us("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        (F.lead("us", 1).over(w) - F.col("us")).alias("g1"),
        (F.lead("us", 2).over(w) - F.lead("us", 1).over(w)).alias("g2"),
    )
    return (
        seq.filter(
            F.col("t2").isNotNull()
            & (F.col("g1") <= _MARKOV_GAP_US)
            & (F.col("g2") <= _MARKOV_GAP_US)
        )
        .select(
            F.concat_ws(">", "t0", "t1", "t2").alias("path"),
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@register(
    "events_last_touch_attribution",
    group="ext-events attribution",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS us,
    max(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END)
      OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_us
  FROM events
),
pur AS (
  SELECT user_id, value,
    CASE WHEN us - last_us <= 1800000000 THEN last_us END AS touch_us
  FROM seq WHERE event_type = 'purchase'
),
ch AS (
  SELECT user_id, epoch_us(ts) AS us, MIN(event_type) AS channel
  FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(ch.channel, 'direct') AS channel,
  CAST(COUNT(*) AS BIGINT) AS purchases,
  CAST(SUM(CAST(pur.value AS DECIMAL(18,2))) AS DOUBLE)
    AS attributed_value
FROM pur
LEFT JOIN ch ON pur.user_id = ch.user_id AND pur.touch_us = ch.us
GROUP BY 1
""",
    doc="Last-touch attribution: each purchase credits the most "
    "recent non-purchase event of the same user within 30 minutes "
    "(else 'direct'); output is per-channel purchase count and "
    "exact-decimal attributed revenue. The 'most recent strictly "
    "earlier' lookup is a RANGE frame (UNBOUNDED..1 PRECEDING over "
    "integer microseconds = strictly earlier timestamps — no "
    "self-as-of join), so one user-keyed window exchange does the "
    "lookup; simultaneous touches resolve deterministically to the "
    "MIN event_type at that timestamp before the join back.",
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", epoch_us("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.withColumn(
        "last_us",
        F.max(
            F.when(F.col("event_type") != "purchase", F.col("us"))
        ).over(w),
    )
    pur = seq.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.when(
            F.col("us") - F.col("last_us") <= _MARKOV_GAP_US, F.col("last_us")
        ).alias("touch_us"),
    )
    ch = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "us")
        .agg(F.min("event_type").alias("channel"))
    )
    return (
        pur.join(
            ch,
            (pur.user_id == ch.user_id) & (pur.touch_us == ch.us),
            "left",
        )
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "events_wow_change",
    group="ext-events trend",
    oracle="""
WITH weekly AS (
  SELECT event_type,
    (epoch_us(ts) // 604800000000) AS week_no,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, CAST(week_no AS BIGINT) AS week_no, n,
  CAST(lag(n) OVER (PARTITION BY event_type ORDER BY week_no)
    AS BIGINT) AS prev_n,
  CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY week_no)
    AS DOUBLE)
    / CAST(lag(n) OVER (PARTITION BY event_type ORDER BY week_no)
    AS DOUBLE) AS wow_change
FROM weekly
""",
    doc="Week-over-week relative change per event type: weekly counts "
    "(integer epoch-week bucket — no calendar/timezone ambiguity "
    "between engines), then lag over the per-type weekly series. The "
    "window runs over the aggregated |types| x |weeks| frame, never "
    "the event stream; wow_change is one IEEE division of exact "
    "integer deltas. First week per type reports NULL (no baseline), "
    "kept — dropping it would hide series starts from the trend "
    "consumer.",
)
def events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts rows belong to no week, and the NULL week group would sit
    # at opposite ends of the lag order in the two engines
    # (differential-fuzzer find)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    weekly = (
        ev.select(
            "event_type",
            (epoch_us("ts") / F.lit(604_800_000_000))
            .cast("bigint")
            .alias("week_no"),
        )
        .groupBy("event_type", "week_no")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("week_no")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type",
        "week_no",
        "n",
        prev.alias("prev_n"),
        ((F.col("n") - prev).cast("double") / prev.cast("double"))
        .alias("wow_change"),
    )


@register(
    "events_cumulative_users",
    group="ext-events growth",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day_no
  FROM events GROUP BY 1
),
daily AS (
  SELECT day_no, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY 1
)
SELECT CAST(day_no AS BIGINT) AS day_no, new_users,
  CAST(SUM(new_users) OVER (ORDER BY day_no
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cumulative_users
FROM daily
""",
    doc="Cumulative-user growth curve: first-seen day per user "
    "(integer epoch-day — no timezone/calendar drift), daily "
    "new-user counts, and the running total of users ever seen. The "
    "user-keyed MIN is the only data-scale aggregate; the running "
    "sum windows the |days| frame, which is bounded by the calendar "
    "(not the data), so the single-task window is safe at any "
    "volume — unlike key-cardinality prefix sums, which use the "
    "two-phase form (orders_abc_classification).",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why="the running sum windows the per-day frame — calendar-"
    "bounded (~thousands of rows over years), not data- or key-grain",
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        (F.min(epoch_us("ts")) / F.lit(86_400_000_000))
        .cast("bigint")
        .alias("day_no")
    )
    daily = first_seen.groupBy("day_no").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day_no").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day_no",
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


@register(
    "events_sliding_distinct_users",
    group="ext-events sliding-distinct",
    oracle="""
WITH d AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events WHERE ts IS NOT NULL
),
w AS (
  SELECT d.day + t.i AS win_end, d.user_id
  FROM d CROSS JOIN (SELECT unnest(range(0, 7)) AS i) t
)
SELECT CAST(win_end AS BIGINT) AS win_end,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
FROM w GROUP BY 1
""",
    doc="7-day sliding-window distinct active users (DAU->WAU curve): "
    "a user active on day d counts toward every window ending in "
    "[d, d+6]. Distinct counts do NOT decompose into per-day sums "
    "(users overlap), so the scalable form pre-distincts (day, user) "
    "— collapsing event volume to at most |users| x |days| — then "
    "explodes each pair into its 7 windows (bounded fan-out = "
    "window/slide, the standard sliding trade) and runs one "
    "count-distinct per window end. Event-volume work is one "
    "map-combined distinct; the x7 blow-up applies only to the "
    "already-collapsed frame.",
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeless rows belong to no activity window (differential-fuzzer
    # find, same contract as the tumbling/sliding aggregates)
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.select(
        (epoch_us("ts") / F.lit(86_400_000_000)).cast("bigint").alias("day"),
        "user_id",
    ).distinct()
    w = d.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("win_end"),
        "user_id",
    )
    return w.groupBy("win_end").agg(
        F.countDistinct("user_id").alias("active_users")
    )


@register(
    "events_gap_log2_histogram",
    group="ext-events gaps",
    oracle="""
WITH seq AS (
  SELECT epoch_us(ts)
    - lag(epoch_us(ts)) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
)
SELECT CAST(length(printf('%b', gap)) AS INT) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN(gap) AS BIGINT) AS min_gap_us,
  CAST(MAX(gap) AS BIGINT) AS max_gap_us
FROM seq WHERE gap IS NOT NULL
GROUP BY 1
""",
    doc="Exact log2-bucketed histogram of inter-event gaps per user "
    "(microseconds): bucket = BIT LENGTH of the integer gap — the "
    "msb index, computed as the length of the base-2 string render "
    "(Spark conv(_,10,2) == DuckDB printf('%b'), verified "
    "digit-identical), NOT floor(log2(x)) whose libm rounding can "
    "misbucket exact powers of two across engines. The power-of-two "
    "banding every latency/gap dashboard uses, with zero float ops; "
    "one user-keyed lag window then a 64-bucket-bounded "
    "map-combined count.",
)
def events_gap_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select((F.col("us") - F.lag("us").over(w)).alias("gap"))
    return (
        seq.filter(F.col("gap").isNotNull())
        .select(
            F.length(F.conv(F.col("gap").cast("string"), 10, 2))
            .cast("int")
            .alias("bucket"),
            "gap",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("gap").alias("min_gap_us"),
            F.max("gap").alias("max_gap_us"),
        )
    )


_CMS_D = 4
_CMS_W = 512


def _cms_oracle() -> str:
    from ..functions.scalar import md5_long_sql

    cell = md5_long_sql("(CAST(user_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR))")
    return f"""
WITH cms AS (
  SELECT t.r AS r, CAST({cell} % {_CMS_W} AS INT) AS cell,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS r) t
  GROUP BY 1, 2
),
probe AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events WHERE user_id % 97 = 0 GROUP BY 1
),
lookup AS (
  SELECT p.user_id, p.true_n, MIN(cms.c) AS est_n
  FROM probe p
  CROSS JOIN (SELECT unnest(range(0, {_CMS_D})) AS r) t
  JOIN cms ON cms.r = t.r AND cms.cell = CAST(
    {md5_long_sql("(CAST(p.user_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR))")}
      % {_CMS_W} AS INT)
  GROUP BY 1, 2
)
SELECT user_id, true_n, est_n, CAST(est_n - true_n AS BIGINT) AS overcount
FROM lookup
"""


@register(
    "events_countmin_estimate",
    group="ext-sketch countmin",
    oracle=_cms_oracle(),
    doc="Count-min sketch (Cormode & Muthukrishnan) built portably "
    "from md5 row-hashes — unlike the engine-internal HLL/t-digest "
    "sketches this one is EXACTLY reproducible in any engine, so the "
    "whole sketch-build + point-query path carries a full oracle. "
    "Build: d=4 x w=512 cell counts in one map-combined aggregate — "
    "2048 cells of bounded state vs |users| exact counters, the "
    "entire point at 100 TB (the sketch broadcasts; the exact "
    "counter table does not). Probe: a 1-in-97 user slice looks up "
    "its 4 cells and takes the min; est >= true always, and the "
    "overcount column quantifies collision error against the exact "
    "twin computed alongside.",
)
def events_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import md5_long

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def cell(uid, r):
        return (
            md5_long(
                F.concat(
                    uid.cast("string"), F.lit(":"), r.cast("string")
                )
            )
            % _CMS_W
        ).cast("int")

    rows = ev.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r"),
    )
    cms = (
        rows.select("r", cell(F.col("user_id"), F.col("r")).alias("cell"))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe = (
        ev.filter(F.col("user_id") % 97 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    probed = probe.select(
        "user_id",
        "true_n",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r"),
    ).withColumn("cell", cell(F.col("user_id"), F.col("r")))
    return (
        probed.join(F.broadcast(cms), ["r", "cell"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
        .select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overcount"),
        )
    )


#: Misra-Gries capacity: small enough that compression is ACTIVE on
#: the mildly-skewed testdata (the summary actually subtracts and
#: drops), large enough to keep a few guaranteed hitters per group
_MG_M = 8


def _mg_oracle() -> str:
    m = _MG_M
    return f"""
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS est FROM events
  WHERE user_id IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY est DESC, user_id ASC) AS rn
  FROM c
),
d AS (
  SELECT event_type,
    COALESCE(MAX(CASE WHEN rn = {m + 1} THEN est END), 0) AS d
  FROM r WHERE rn <= {m + 1} GROUP BY event_type
)
SELECT r.event_type, r.user_id,
  CAST(r.est - d.d AS BIGINT) AS est_count,
  CAST(d.d AS BIGINT) AS err_bound
FROM r JOIN d ON r.event_type IS NOT DISTINCT FROM d.event_type
WHERE r.rn <= {m} AND r.est - d.d > 0
"""


@register(
    "events_heavy_hitters_mg",
    group="ext-sketch heavy-hitters",
    oracle=_mg_oracle(),
    doc=f"Misra-Gries heavy hitters (capacity {_MG_M} keys per "
    "event_type): bounded-memory top-frequency users with the "
    "published deterministic bound est_count <= true <= est_count + "
    "err_bound, and any key whose true count exceeds err_bound is "
    "guaranteed kept. Unlike count-min (hash collisions, "
    "probabilistic) the MG summary is exactly reproducible in any "
    "engine — full oracle even in the COMPRESSED regime, because the "
    "subtracted d is the (m+1)-th largest count VALUE (a multiset "
    "property, immune to tie-breaks). Summaries are mergeable "
    "(Agarwal et al., TODS'13), which is what the streaming twin "
    "folds per micro-batch with O(groups x m) state forever "
    "(operators/heavyhitters.py; compression plans a WindowGroupLimit "
    "partial top-k, never a full per-group sort).",
)
def events_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import heavyhitters as hh

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return hh.mg_heavy_hitters(ev, "event_type", "user_id", _MG_M)


@register(
    "events_bigram_lift",
    group="ext-events markov lift",
    oracle=f"""
WITH {_MARKOV_PAIR_CTES},
marg AS (
  SELECT src_type, dst_type, n,
    CAST(SUM(n) OVER (PARTITION BY src_type) AS BIGINT) AS n_src,
    CAST(SUM(n) OVER (PARTITION BY dst_type) AS BIGINT) AS n_dst,
    CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM c
)
SELECT src_type, dst_type, n,
  CAST(total * n AS DOUBLE) / CAST(n_src * n_dst AS DOUBLE) AS lift
FROM marg WHERE n >= 5
""",
    doc="Association-normalized transition lift: observed bigram "
    "frequency over the frequency expected if source and target "
    "occurred independently — lift = N*n_ab/(n_a*n_b) over the same "
    "30-min consecutive pairs events_markov_transitions counts "
    "(which answer 'where do users go next'; lift answers 'which "
    "hops are SURPRISING'). All three marginals window the k*k "
    "transition matrix, never the event stream; exact BIGINT "
    "products, one IEEE division.",
    advisor_allow={"SINGLE_PARTITION_DATA"},
    allow_why="the global total windows the k*k event-type transition "
    "matrix (k = |event types|, a fixed enum) — tens of rows at any "
    "data volume",
)
def events_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _markov_pair_counts(spark, sf_dir)
    marg = (
        c.withColumn("n_src", F.sum("n").over(Window.partitionBy("src_type")))
        .withColumn("n_dst", F.sum("n").over(Window.partitionBy("dst_type")))
        .withColumn(
            "total", F.sum("n").over(Window.partitionBy(F.lit(1)))
        )
    )
    return (
        marg.filter(F.col("n") >= 5)
        .select(
            "src_type",
            "dst_type",
            "n",
            (
                (F.col("total") * F.col("n")).cast("double")
                / (F.col("n_src") * F.col("n_dst")).cast("double")
            ).alias("lift"),
        )
    )
