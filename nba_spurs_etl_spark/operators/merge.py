"""CDC merge / upsert: apply a changelog batch onto a keyed snapshot.

The lakehouse MERGE INTO shape (Delta/Iceberg expose it as DML; the
engine expresses it as a plain full-outer join so it runs on bare
parquet): a changelog with op codes I/U/D is applied onto the base
snapshot — inserts add rows, updates replace column values, deletes
drop the row.

Scale design: MERGE is inherently a co-partitioned rendezvous on the
merge key — one shuffle of each side keyed by ``keys``. A full-outer
join can never broadcast (both sides must see unmatched rows), so the
right large-scale layout is BUCKETING both the snapshot and the
changelog by the key (see tests/test_bucketing.py for the plan proof
pattern); with bucketed storage the merge runs with zero Exchange.
Skew on hot keys is AQE's skew-join case. The changelog should be
deduplicated to one winning op per key first (``latest_by_key``) —
applying a multi-op log is order-defined, not set-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    changelog: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """One winning row per key: highest ``order_col``; ties broken
    deterministically by the remaining columns in name order (a bare
    DESC(order_col) window picks whichever tied row arrives first —
    run-, partitioning- and retry-dependent, which would make every
    CDC compaction built on this nondeterministic)."""
    rest = sorted(c for c in changelog.columns if c not in keys and c != order_col)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), *[F.asc(c) for c in rest]
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_cdc(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog to a snapshot; returns the new snapshot.

    Semantics (per key):
    - key only in base            -> base row kept
    - key in both, op in (I, U)   -> changelog values win
    - key in both, op = D         -> row dropped
    - key only in changelog, I/U  -> row inserted (upsert semantics:
      U on a missing key inserts, matching MERGE's WHEN NOT MATCHED)
    - key only in changelog, D    -> no row (delete of absent key is a
      no-op, not an error)
    """
    value_cols = [c for c in base.columns if c not in keys]
    b = base.alias("b")
    u = changelog.alias("u")
    joined = b.join(u, on=keys, how="full_outer")
    op = F.col(f"u.{op_col}")
    merged = joined.filter(op.isNull() | (op != "D")).select(
        *[F.col(k) for k in keys],
        *[
            F.when(op.isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"b.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two keyed snapshots: one full-outer join.

    Returns (*keys, status, old/new value columns) with status in
    {'added', 'removed', 'changed', 'unchanged'} — the data-diff an
    incremental pipeline runs to validate a CDC apply, audit a
    backfill, or alert on unexpected churn. Change detection is
    NULL-SAFE per column (eqNullSafe), so NULL -> value and value ->
    NULL both count as changes.

    Scale: same layout rule as the merge itself — a full-outer join
    can never broadcast, so bucket both snapshots by the key; the
    status expression is row-local.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_old_present"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_new_present"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    j = o.join(n, keys, "full_outer")
    # Start from lit(False) so an empty compare_cols list (key-only
    # snapshots) still yields a valid added/removed/unchanged status.
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    status = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[F.col(f"_old_{c}") for c in compare_cols],
        *[F.col(f"_new_{c}") for c in compare_cols],
    )
