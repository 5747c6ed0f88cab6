#!/usr/bin/env python
"""Zipf-skew evidence probe: measure the heaviest shuffle operators on
deliberately skewed variants of the sf0.1 tables and record WHICH
defense carries each — the operator's own cap/salting, or AQE's
runtime skew-split (docs/SCALE.md "Skew evidence").

Skew built (one-time, /tmp/skew_sf01):
- documents: every doc_id % 5 == 0 (20%, 1k docs at sf0.1) gets the
  SAME 60-word boilerplate PREPENDED (behind a small rotating "hotK"
  marker word so BM25's first-3-words queries stay distinct) — every
  boilerplate shingle's posting list jumps to ~1k docs (the
  hot-boilerplate worst case), and every query doc (doc_id % 100 == 0
  is a subset) issues hot query terms with 1k-doc postings.
- orders: hash-selected ~20% of orders remapped to o_custkey = 1 (the
  whale-customer join key).
- other tables copied verbatim (pre-parallelized layout).

Experiments:
1. dedup_containment (catalog form, uncapped) pristine vs skewed, vs
   containment_pairs(max_shingle_freq=100) on the skewed corpus. The
   hot posting list is ONE group in the shingle aggregation — AQE
   skew-split divides oversized PARTITIONS, never a single group, so
   the cap is the only defense that can engage.
2. dedup_substring_spans pristine vs skewed (its hot-gram marking is
   the built-in defense: grams above the hot threshold are marked and
   never pair-joined).
3. search_bm25_topk pristine vs skewed (map-side query-term pruning
   bounds the blowup to true hot-term postings).
4. orders⋈customer on the whale key three ways: default broadcast
   (key skew cannot matter — no key shuffle of the probe side),
   forced shuffle join with AQE skew-split, and salted_join
   (planned-ahead form). Plans inspected post-execution for
   isFinalPlan / skew=true markers.

Usage: python scripts/skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_spurs_etl_spark.operators import dedup  # noqa: E402
from nba_spurs_etl_spark.operators.joins import salted_join  # noqa: E402
from nba_spurs_etl_spark.plans.catalog import queries  # noqa: E402
from nba_spurs_etl_spark.session import get_spark  # noqa: E402
from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES, load_table  # noqa: E402
from nba_spurs_etl_spark.sources.repack import ensure_repacked  # noqa: E402
from nba_spurs_etl_spark.session import default_parallelism  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/skew_sf01"

BOILERPLATE = " ".join(
    f"boiler{i} plate{i} legal{i} disclaimer{i}" for i in range(15)
)


def build(spark) -> None:
    # the skewed dir is written PRE-PARALLELIZED (repartition to core
    # count) and read directly — ensure_repacked expects single-file
    # sources, and a parallel layout is the comparable footing anyway
    dp = default_parallelism()
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("hot"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(" " + BOILERPLATE + " "),
                F.col("text"),
            ),
        ).otherwise(F.col("text")),
    )
    docs.repartition(dp).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    orders = orders.withColumn(
        "o_custkey",
        F.when(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(5)) == 0, F.lit(1)
        ).otherwise(F.col("o_custkey")),
    )
    orders.repartition(dp).write.mode("overwrite").parquet(
        f"{DST}/orders.parquet"
    )
    for t in TESTDATA_TABLES:
        if t in ("documents", "orders"):
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").repartition(dp).write.mode(
            "overwrite"
        ).parquet(f"{DST}/{t}.parquet")


def timed(label: str, thunk) -> None:
    thunk()  # warm (Janino + workers)
    t0 = time.perf_counter()
    thunk()
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    spark = get_spark("skew-probe")
    if not os.path.isdir(DST):
        build(spark)
    pristine = ensure_repacked(SRC, default_parallelism())
    skewed = DST  # written pre-parallelized by build()
    qs = queries()

    for name in ("dedup_containment", "dedup_substring_spans",
                 "search_bm25_topk"):
        timed(f"{name} pristine", lambda n=name: noop(qs[n](spark, pristine)))
        timed(f"{name} SKEWED", lambda n=name: noop(qs[n](spark, skewed)))
    timed(
        "containment capped(max_shingle_freq=100) SKEWED",
        lambda: noop(
            dedup.containment_pairs(
                load_table(spark, skewed, "documents"), "doc_id", "text",
                n=3, threshold=0.6, max_shingle_freq=100,
            )
        ),
    )

    # whale-key join three ways
    def whale_join():
        od = load_table(spark, skewed, "orders")
        cust = load_table(spark, skewed, "customer")
        return (
            od.join(cust, od.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    def whale_salted():
        od = load_table(spark, skewed, "orders")
        cust = load_table(spark, skewed, "customer")
        return (
            salted_join(od, cust, "o_custkey", "c_custkey", num_salts=8)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )

    timed("join broadcast SKEWED", lambda: noop(whale_join()))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for label, fn in [("join shuffle+AQEskew SKEWED", whale_join),
                          ("join salted SKEWED", whale_salted)]:
            timed(label, lambda f=fn: noop(f()))
            df = fn()
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            print(
                f"{label} plan: isFinalPlan="
                f"{'isFinalPlan=true' in plan} "
                f"skew_split={'skew=true' in plan}",
                flush=True,
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
