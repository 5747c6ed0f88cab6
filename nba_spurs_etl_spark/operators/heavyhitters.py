"""Bounded-memory heavy hitters: Misra-Gries summaries as DataFrames.

A 100 TB stream cannot keep exact per-key counts for every key it has
ever seen; the Misra-Gries (MG) summary keeps at most ``m`` keys per
group and guarantees, for every key k with true count c(k):

    est(k) <= c(k) <= est(k) + err        (k kept in the summary)
    c(k) <= err                           (k dropped from the summary)

where ``err`` is the group's accumulated undercount — so any key whose
true frequency exceeds ``err`` is guaranteed present. Summaries are
MERGEABLE (Agarwal/Cormode/Huang/Phillips/Wei/Yi, "Mergeable
Summaries", ACM TODS 2013): merge = pointwise-sum the counts, then
subtract the (m+1)-th largest and drop non-positives, adding the
subtracted value to the error ledger. That mergeability is what makes
the sketch work as distributed partial state: per-partition or
per-micro-batch summaries combine without ever replaying raw data
(``streaming/heavyhitters.py`` is the foreachBatch fold).

DataFrame representation: one row per kept (group, key) with its
``est``, plus ONE NULL-key LEDGER row per group carrying ``err`` —
the ledger rides the same frame so a store/merge cycle can never lose
the bound (a group whose keys all compress away keeps its nonzero
error). NULL keys are therefore excluded as data ("a NULL key is not
a key", the family convention) and the oracle mirrors the predicate.

Determinism: every step consumes EXACT batch counts (one groupBy),
and the subtracted d is the (m+1)-th largest VALUE of the group's
count multiset — invariant to row order and tie-breaks — so the
summary is bit-reproducible given the same batch partition of the
input, and single-batch == the batch operator exactly (shared DuckDB
oracle).

Scale shape: the compression is a per-group top-(m+1), written as
rank-then-filter so Catalyst plans a WindowGroupLimit (per-partition
partial top-k, no full per-group sort); everything else is
map-combined aggregation over O(groups x m) summary rows.

No reference analog (the reference has no sketches); public
algorithm, original implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: internal frame columns: (grp, key, est); NULL key = error ledger row
_G, _K, _E = "grp", "key", "est"


def _compress(summary: DataFrame, m: int) -> DataFrame:
    """One MG compression round: keep at most ``m`` keys per group,
    folding the subtracted mass into the group's ledger row."""
    real = summary.filter(F.col(_K).isNotNull())
    led = summary.filter(F.col(_K).isNull())

    w = Window.partitionBy(_G).orderBy(F.col(_E).desc(), F.col(_K).asc())
    # rank-then-filter => WindowGroupLimit: per-partition partial
    # top-(m+1), never a full per-group sort
    ranked = real.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= m + 1
    )
    wg = Window.partitionBy(_G)
    # d: the (m+1)-th largest count VALUE (0 when the group fits) —
    # a property of the count multiset, so tie-breaks cannot move it
    d = F.coalesce(
        F.max(F.when(F.col("_rn") == m + 1, F.col(_E))).over(wg),
        F.lit(0).cast("long"),
    )
    kept = (
        ranked.withColumn("_d", d)
        .filter((F.col("_rn") <= m) & (F.col(_E) - F.col("_d") > 0))
        .select(_G, _K, (F.col(_E) - F.col("_d")).alias(_E))
    )
    key_t = dict(summary.dtypes)[_K]
    d_rows = (
        ranked.groupBy(_G)
        .agg(
            F.coalesce(
                F.max(F.when(F.col("_rn") == m + 1, F.col(_E))),
                F.lit(0).cast("long"),
            ).alias(_E)
        )
        .select(_G, F.lit(None).cast(key_t).alias(_K), _E)
    )
    ledger = (
        d_rows.unionByName(led)
        .groupBy(_G, _K)
        .agg(F.sum(_E).cast("long").alias(_E))
    )
    return kept.unionByName(ledger)


def mg_summary(
    df: DataFrame, group_col: str, key_col: str, m: int
) -> DataFrame:
    """Build an MG summary (capacity ``m`` keys per group) from raw
    rows: exact batch counts, then one compression round."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(group_col).alias(_G), F.col(key_col).alias(_K))
        .agg(F.count(F.lit(1)).cast("long").alias(_E))
    )
    return _compress(counts, m)


def mg_merge(a: DataFrame, b: DataFrame, m: int) -> DataFrame:
    """Merge two summaries of the same (group, key) domain: pointwise
    sum (ledger errors add too — NULL keys group together), then one
    compression round. Associative up to the published bound."""
    return _compress(
        a.unionByName(b)
        .groupBy(_G, _K)
        .agg(F.sum(_E).cast("long").alias(_E)),
        m,
    )


def mg_finalize(
    summary: DataFrame,
    group_out: str = "grp",
    key_out: str = "key",
) -> DataFrame:
    """User-facing rows: (group, key, est_count, err_bound) — the
    ledger unrolled onto every kept key of its group; true count is
    inside [est_count, est_count + err_bound]."""
    wg = Window.partitionBy(_G)
    err = F.coalesce(
        F.max(F.when(F.col(_K).isNull(), F.col(_E))).over(wg),
        F.lit(0).cast("long"),
    )
    return (
        summary.withColumn("_err", err)
        .filter(F.col(_K).isNotNull())
        .select(
            F.col(_G).alias(group_out),
            F.col(_K).alias(key_out),
            F.col(_E).alias("est_count"),
            F.col("_err").alias("err_bound"),
        )
    )


def mg_heavy_hitters(
    df: DataFrame, group_col: str, key_col: str, m: int
) -> DataFrame:
    """One-shot batch form: (group, key, est_count, err_bound) for at
    most ``m`` keys per group. Equals the streaming fold's single-batch
    drain exactly (same summary algebra), which is the shared-oracle
    contract."""
    return mg_finalize(
        mg_summary(df, group_col, key_col, m),
        group_out=group_col,
        key_out=key_col,
    )
