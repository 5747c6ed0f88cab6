#!/usr/bin/env python
"""Interleaved A/B of the r12 kernel-checkpoint candidates.

A = the working-tree shape (lazy lineage checkpoints at the sites the
code currently has); B = the same code with ``_lineage_ckpt`` patched
to identity — i.e. the r11 duplicate-subtree shape. One session, ABBA
pair order, medians + job counts (the repo's paired protocol; single
timings are worthless on this host).

Usage: python scripts/ab_ckpt.py [--pairs N] [entry ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = ["search_bm25_topk", "search_qld_topk"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.names or DEFAULT_ENTRIES

    from nba_spurs_etl_spark.operators import search
    from nba_spurs_etl_spark.plans.catalog import queries
    from nba_spurs_etl_spark.session import default_parallelism, get_spark
    from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES, load_table
    from nba_spurs_etl_spark.sources.repack import ensure_repacked

    qs = queries()
    spark = get_spark("ab-ckpt")
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

    real_ckpt = search._lineage_ckpt

    def set_variant(v: str) -> None:
        search._lineage_ckpt = real_ckpt if v == "A" else (lambda df: df)

    def run(name: str, variant: str, i: int):
        set_variant(variant)
        group = f"abk_{name}_{variant}_{i}"
        sc.setJobGroup(group, f"{name} [{variant}]")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        return dt, len(st.getJobIdsForGroup(group))

    for name in names:
        run(name, "A", -1)
        run(name, "B", -1)
        a_t, b_t, a_j, b_j = [], [], [], []
        for p in range(args.pairs):
            for v in (("A", "B") if p % 2 == 0 else ("B", "A")):
                dt, nj = run(name, v, p)
                (a_t if v == "A" else b_t).append(dt)
                (a_j if v == "A" else b_j).append(nj)
        ma, mb = statistics.median(a_t), statistics.median(b_t)
        print(
            f"{name}: A(ckpt) med={ma:.3f} jobs={a_j[-1]} "
            f"runs={' '.join(f'{t:.2f}' for t in a_t)} | "
            f"B(no-ckpt) med={mb:.3f} jobs={b_j[-1]} "
            f"runs={' '.join(f'{t:.2f}' for t in b_t)} | "
            f"A/B={ma / mb:.3f} probe={probe():.3f}",
            flush=True,
        )
    set_variant("A")
    return 0


if __name__ == "__main__":
    sys.exit(main())
