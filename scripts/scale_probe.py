#!/usr/bin/env python
"""Empirical scaling probe: replicate sf0.1 K times (key-offset facts,
dim tables unchanged) into /tmp and time headline queries at both
scales. Results recorded in docs/SCALE.md §"Measured scaling".

Replication is deliberately adversarial for near-dup operators: every
document exists K times, so every shingle's posting list grows K-fold —
the hot-boilerplate worst case the max_term_freq cap defends against.

Usage: python scripts/scale_probe.py [K]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_spurs_etl_spark.plans.catalog import queries  # noqa: E402
from nba_spurs_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
NAMES = [
    "pricing_summary", "q3_shipping_priority", "q10_returned_items",
    "q6_forecast_revenue", "events_funnel", "events_sessionize",
    "dedup_exact", "text_tfcosine_pairs", "similarity_topk_bruteforce",
    "events_click_purchase_join", "rolling_7d_customer_revenue",
    "dedup_simhash_banded", "dedup_ngram_jaccard", "graph_pagerank_dups",
    "corpus_decontaminate",
    # round-3 additions
    "incremental_agg_orders", "key_skew_profile", "contrastive_negatives",
    "zorder_orders_buckets", "vocab_encode_docs", "balanced_class_sample",
    "table_checksum_buckets", "scd2_asof_enrich", "window_dist_functions",
    # late round-3 additions
    "orders_running_revenue", "events_concurrency_hourly",
    "dedup_incremental_batch", "dedup_jaccard_prefix_filtered",
    "fuzzy_match_customers", "orders_equidepth_price_histogram",
    "top1_per_group_maxby",
    # round-4 additions
    "dedup_components_star", "corpus_decontaminate_bloom",
    "orders_sample_aes_topk",
    "search_bm25_topk", "dedup_containment", "corpus_ngram_novelty",
    "orders_winsorized_stats", "events_cusum_changepoint",
    "similarity_topk_pq", "similarity_topk_ivf_pq",
    # late round-4 additions
    "events_seasonal_anomaly", "graph_label_propagation",
    "events_markov_transitions", "events_path_trigrams",
    "orders_hhi_concentration", "orders_skyline_pareto",
    "part_copurchase_lift", "part_copurchase_kcore",
    "events_last_touch_attribution", "lineitem_median_twophase",
    "orders_salted_skew_join", "events_wow_change", "fd_violation_audit",
    "orders_abc_classification", "events_cumulative_users",
    "customer_entity_resolution", "join_skew_planner",
    "events_sliding_distinct_users", "events_gap_log2_histogram",
    "orders_ks_statistic", "orders_bootstrap_ci",
    "text_feature_hashing", "events_countmin_estimate",
    "orders_bootstrap_ci_by_priority", "events_bigram_lift",
    "dedup_substring_spans", "corpus_dsir_topk", "text_bpe_merges",
    "corpus_decontaminate_neardup", "text_winnow_fingerprints",
    "dedup_substring_spans_winnowed",
    # round-5 additions (the r04 verdict's unprobed list)
    "search_bm25_topk", "stream_markov_transitions",
    "orders_bootstrap_ci_by_priority", "multimodal_audio_pipeline",
    "events_cusum_changepoint",
]


def build(spark, dst: str, k: int) -> None:
    def rep(name: str, offsets: dict[str, int]) -> None:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        reps = []
        for i in range(k):
            d = df
            for c, stride in offsets.items():
                d = d.withColumn(c, F.col(c) + i * stride)
            reps.append(d)
        out = reps[0]
        for d in reps[1:]:
            out = out.unionByName(d)
        # plain part-file directories everywhere (round 5): the
        # streaming readers are layout-aware, and a single-file
        # documents/events replica capped batch scans at
        # size/maxPartitionBytes tasks — measured 3-6x wall on the
        # text/dedup family at 10x
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")

    rep("lineitem", {"l_orderkey": 10_000_000})
    rep("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
    rep("customer", {"c_custkey": 1_000_000})
    rep("events", {"event_id": 100_000_000, "user_id": 1_000_000})
    rep("documents", {"doc_id": 10_000_000})
    rep("embeddings", {"vec_id": 10_000_000})
    for dim in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{dim}.parquet")


def main() -> int:
    # usage: scale_probe.py [K] [name ...] — names restrict the probe
    # to a subset (default: the full NAMES list)
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or NAMES
    dst = f"/tmp/sfx{k}"
    spark = get_spark("scale-probe")
    if not os.path.isdir(dst):
        build(spark, dst, k)
    q = queries()
    for sf_dir, label in [(SRC, "sf0.1"), (dst, f"sf0.1x{k}")]:
        for name in names:
            c = q[name](spark, sf_dir).count()  # warm (and row count)
            t0 = time.perf_counter()
            # noop sink: full evaluation (count() lets Catalyst prune
            # cardinality-preserving expressions — see bench.py)
            q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t1 = time.perf_counter()
            print(f"{label} {name}: rows={c} t={round(t1 - t0, 2)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
