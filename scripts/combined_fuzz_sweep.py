"""One-shot combined-perturbation sweep: NULL/dup/orphan AND extreme
values AND one salt-rotated empty table in the SAME fixture — the
interaction class the per-dimension CI fuzzers
(tests/test_fuzz_differential.py) never exercise together.

Not a CI test: run it once per round as a convergence check, like the
full-pool sweeps.

    SPARK_GRAFT_FUZZ_SALT=r08comb python scripts/combined_fuzz_sweep.py

First run (salt r07comb, round 7): 186/186 oracled batch entries
green — recorded in docs/SCALE.md "Round-7 campaign".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_FUZZ_SALT", "r07comb")


def main() -> int:
    from pyspark.sql import SparkSession

    from nba_spurs_etl_spark.plans.catalog import registry
    from tests.test_fuzz_differential import (
        _EXCLUDE_PREFIXES,
        SALT,
        _build_edge_tables,
        _build_fuzz_tables,
        _diff_one,
        _materialize,
    )

    dst = f"/tmp/spark_graft_fuzz_comb_{SALT}"
    if not os.path.isdir(dst):

        def both(con):
            _build_fuzz_tables(con)  # NULL / dup-PK / orphan injection
            _build_edge_tables(con)  # extremes + one empty table

        _materialize(dst, both)

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    pool = sorted(
        (
            q
            for q in registry().values()
            if q.oracle is not None
            and not q.name.startswith(_EXCLUDE_PREFIXES)
        ),
        key=lambda q: q.name,
    )
    fails = []
    for i, q in enumerate(pool, 1):
        try:
            _diff_one(spark, dst, q, "combined")
        except Exception as e:  # noqa: BLE001 — report every divergence
            fails.append(q.name)
            msg = str(e).replace("\n", " | ")[:300]
            print(f"FAIL {q.name}: {msg}", flush=True)
        if i % 40 == 0:
            print(f"...{i}/{len(pool)}", flush=True)
    print(f"done {len(pool)} entries, {len(fails)} failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
