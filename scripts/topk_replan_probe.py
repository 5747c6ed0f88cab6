#!/usr/bin/env python
"""Global top-k plan-shape probe (VERDICT r07 items 1/7).

dsir_topk and vocab_encode_docs were re-planned in r08 from
"unpartitioned row_number then filter rank<=k" to the explicit
"orderBy().limit(k) then k-row window" form. The EXECUTED plans were
identical before and after — Catalyst's LimitPushDownThroughWindow
rewrote the old form into the same TakeOrderedAndProject shape — so
timing the entries before/after shows nothing. What the re-plan
actually buys is independence from that optimizer rule; this probe
measures the hazard directly by timing both plan SHAPES over the same
data-scale frames with the rewrite rule excluded:

  explicit : orderBy(keys).limit(k) + k-row rank window
             (TakeOrderedAndProject: per-partition k-row heaps)
  legacy-x : unpartitioned row_number + filter rank<=k, with
             spark.sql.optimizer.excludedRules =
             LimitPushDownThroughWindow — the full frame serializes
             through ONE WindowExec task, exactly what a conf change
             or Spark upgrade that drops the rule would reintroduce

over the two frames the real entries rank: the distinct-token count
frame (vocab, |tokens| grows with corpus) and the per-doc weight frame
(dsir, one row per document). Run at sf0.1 and the 10x replica
(scripts/scale_probe.build); results recorded in docs/SCALE.md
"Round 8" section.

Usage: python scripts/topk_replan_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_spurs_etl_spark.session import get_spark  # noqa: E402
from nba_spurs_etl_spark.sources.catalog import load_table  # noqa: E402
from scripts.scale_probe import SRC, build  # noqa: E402

#: BOTH rank-filter rescue rules: LimitPushDownThroughWindow turns the
#: rank filter into TakeOrderedAndProject below the window, and
#: InferWindowGroupLimit inserts a per-partition WindowGroupLimit —
#: either one alone keeps the legacy form scale-safe, so the probe
#: excludes both to measure the unprotected shape
_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.LimitPushDownThroughWindow,"
    "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
)


def token_counts(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def doc_weights(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return docs.select(
        F.col("doc_id").alias("doc"),
        (F.col("n_chars").cast("double")).alias("lw"),
    )


def explicit_topk(frame, order, k: int):
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    return (
        frame.orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def legacy_topk(frame, order, k: int):
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    return frame.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def drain(df) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    k_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = f"/tmp/sfx{k_rep}"
    spark = get_spark("topk-replan-probe")
    if not os.path.isdir(dst):
        build(spark, dst, k_rep)

    frames = {
        "vocab-tokens": (
            token_counts,
            [F.desc("cnt"), F.asc("tok")],
            256,
        ),
        "dsir-docs": (
            doc_weights,
            [F.desc("lw"), F.asc("doc")],
            100,
        ),
        # data-grain frame (no aggregation): the raw-pool shape the
        # VERDICT hazard describes — 600k rows at sf0.1, 6M at 10x
        "lineitem-rows": (
            lambda spark, sf_dir: load_table(
                spark, sf_dir, "lineitem"
            ).select(
                F.col("l_orderkey").alias("doc"),
                F.col("l_extendedprice").cast("double").alias("lw"),
            ),
            [F.desc("lw"), F.asc("doc")],
            100,
        ),
    }
    for sf_dir, label in [(SRC, "sf0.1"), (dst, f"sf0.1x{k_rep}")]:
        for fname, (builder, order, k) in frames.items():
            frame = builder(spark, sf_dir)
            t_exp = drain(explicit_topk(frame, order, k))
            spark.conf.set("spark.sql.optimizer.excludedRules", _RULES)
            try:
                t_leg = drain(legacy_topk(frame, order, k))
            finally:
                spark.conf.unset("spark.sql.optimizer.excludedRules")
            print(
                f"{label} {fname}: explicit={t_exp:.2f}s "
                f"legacy-norewrite={t_leg:.2f}s ({t_leg / t_exp:.1f}x)"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
