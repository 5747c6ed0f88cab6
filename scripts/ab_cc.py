#!/usr/bin/env python
"""Interleaved A/B adjudication of the r11 connected-components
lazy-checkpoint fusion (VERDICT r11 item 1).

A = HEAD (lazy localCheckpoint materialized by a full-scan count probe,
one job per round); B = the r10 shape (eager localCheckpoint + isEmpty
probe, two jobs per round). The driver's r11 PERF measured three of the
six consumer entries SLOWER under A in a vm_speed_factor-1.604 window;
this script runs the repo's paired protocol (interleaved pairs in ONE
session, ABBA order to cancel drift, medians + job counts) to decide
keep-or-revert.

Usage: python scripts/ab_cc.py [--pairs N] [entry ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

DEFAULT_ENTRIES = [
    "dedup_components_star",
    "dedup_filtered_corpus",
    "dedup_keep_best_per_cluster",
    "dedup_minhash_components",
    "customer_entity_resolution",
    "semantic_dedup_corpus",
    "corpus_split_leakage_safe",
]


# --- the r10 variants, verbatim from 76eac43^ (eager ckpt + isEmpty) ---

def connected_components_r10(pairs: DataFrame, max_iter: int = 25):
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    converged_at = None
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("doc"),
            F.least("src", "nbr_min").alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc)
            .groupBy(F.col("dst").alias("doc"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "doc", "left")
            .select(
                "doc",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                F.coalesce(
                    F.col("nbr_label") < F.col("label"), F.lit(False)
                ).alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        converged = new_labels.filter("moved").isEmpty()
        labels = new_labels.drop("moved")
        if converged:
            converged_at = True
            break
    if converged_at is None:
        raise RuntimeError("connected_components_r10 did not converge")
    return labels.select("doc", F.col("label").alias("component"))


def connected_components_star_r10(pairs: DataFrame, max_rounds: int = 20):
    base = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = base.filter(F.col("u") != F.col("v"))

    from nba_spurs_etl_spark.operators.dedup import (
        _large_star_step,
        _small_star_step,
    )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(least(u, v), greatest(u, v)))"),
                F.lit(0),
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    fp = fingerprint(edges)
    for _ in range(max_rounds):
        edges = _small_star_step(_large_star_step(edges)).localCheckpoint(
            eager=True
        )
        new_fp = fingerprint(edges)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError("connected_components_star_r10 did not converge")
    nodes = (
        base.select(F.col("u").alias("doc"))
        .unionByName(base.select(F.col("v").alias("doc")))
        .distinct()
    )
    return (
        nodes.join(edges, nodes["doc"] == edges["u"], "left")
        .select("doc", F.coalesce(F.col("v"), F.col("doc")).alias("component"))
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.names or DEFAULT_ENTRIES

    from nba_spurs_etl_spark.operators import dedup
    from nba_spurs_etl_spark.plans.catalog import queries
    from nba_spurs_etl_spark.session import default_parallelism, get_spark
    from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES, load_table
    from nba_spurs_etl_spark.sources.repack import ensure_repacked

    qs = queries()
    spark = get_spark("ab-cc")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf_dir = ensure_repacked(args.sf_dir, default_parallelism())
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).limit(1).count()
    qs["summary_rank"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def _py_warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        for b in batches:
            yield b

    n_warm = 2 * default_parallelism()
    spark.range(n_warm).repartition(n_warm).mapInPandas(
        _py_warm, "id long").write.format("noop").mode("overwrite").save()
    st = sc.statusTracker()

    def probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 32_000_000, 1, default_parallelism()).selectExpr(
            "count(xxhash64(id, id+1, id+2)) AS c").collect()
        return time.perf_counter() - t0

    probe()

    cur_cc = dedup.connected_components
    cur_star = dedup.connected_components_star

    def set_variant(v: str) -> None:
        if v == "A":
            dedup.connected_components = cur_cc
            dedup.connected_components_star = cur_star
        else:
            dedup.connected_components = connected_components_r10
            dedup.connected_components_star = connected_components_star_r10

    def run(name: str, variant: str, i: int):
        set_variant(variant)
        group = f"ab_{name}_{variant}_{i}"
        sc.setJobGroup(group, f"{name} [{variant}]")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jids = st.getJobIdsForGroup(group)
        return dt, len(jids)

    for name in names:
        # one unmeasured warm-up of each variant so JIT/caches settle
        run(name, "A", -1)
        run(name, "B", -1)
        a_times, b_times, a_jobs, b_jobs = [], [], [], []
        for p in range(args.pairs):
            order = ("A", "B") if p % 2 == 0 else ("B", "A")
            for v in order:
                dt, nj = run(name, v, p)
                (a_times if v == "A" else b_times).append(dt)
                (a_jobs if v == "A" else b_jobs).append(nj)
        pr = probe()
        ma, mb = statistics.median(a_times), statistics.median(b_times)
        print(
            f"{name}: A(lazy+count) med={ma:.3f} jobs={a_jobs[-1]} "
            f"runs={' '.join(f'{t:.2f}' for t in a_times)} | "
            f"B(eager+isEmpty) med={mb:.3f} jobs={b_jobs[-1]} "
            f"runs={' '.join(f'{t:.2f}' for t in b_times)} | "
            f"A/B={ma / mb:.3f} probe={pr:.3f}",
            flush=True,
        )
    set_variant("A")
    return 0


if __name__ == "__main__":
    sys.exit(main())
