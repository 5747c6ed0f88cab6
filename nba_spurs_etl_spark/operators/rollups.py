"""Hierarchical time rollups (hypertable-style continuous aggregates)
and skew-safe aggregation helpers.

``cascade_rollup`` implements the TimescaleDB-style pattern: aggregate
raw events once into the finest bucket, then derive every coarser
resolution FROM the next finer one. At 100 TB this is the difference
between scanning raw data per resolution and scanning it once — the
re-aggregated partials are orders of magnitude smaller. Correctness
requires the aggregates to be decomposable (count/sum/min/max are;
avg is carried as sum+count and finalized per level).

``two_phase_agg`` is the classic salting defense for skewed group
keys: phase 1 aggregates on (key, salt) — the hot key's rows spread
over N partitions — phase 2 merges the N partials per key. AQE's
skew handling covers joins; for aggregations with pathological keys
this is the manual control.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us


def time_bucket(ts: Column, seconds: int) -> Column:
    """Epoch-aligned bucket start (timestamp), integer arithmetic.

    ``us - us % width`` is truncation-aligned, not floor-aligned, for
    pre-1970 timestamps — deliberately: DuckDB's ``%`` takes the
    dividend's sign too, so the oracles bucket identically for any
    sign (the engine-parity idiom pinned in functions/scalar.py)."""
    us = epoch_us(ts)
    width = seconds * 1_000_000
    return F.timestamp_micros(us - us % F.lit(width))


def rollup_finest(
    events: DataFrame, ts_col: str, keys: list[str], value_col: str, seconds: int
) -> DataFrame:
    """Raw events -> finest-resolution partial aggregate.

    Carries decomposable partials (cnt, sum in exact decimal) so
    coarser levels can be derived without touching raw data."""
    return (
        events.groupBy(
            time_bucket(F.col(ts_col), seconds).alias("bucket"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("val_sum"),
            F.min(value_col).alias("val_min"),
            F.max(value_col).alias("val_max"),
        )
    )


def rollup_coarser(
    finer: DataFrame, keys: list[str], seconds: int,
    finer_seconds: int | None = None,
) -> DataFrame:
    """Finer partials -> coarser partials (no raw-data scan).

    PRECONDITION: ``seconds`` must be an integer multiple of the finer
    level's width — each finer bucket is assigned wholly to the
    coarser bucket containing its START, so a non-nesting width would
    silently misplace the tail of every straddling bucket. Pass
    ``finer_seconds`` to have the nesting checked.
    """
    if finer_seconds is not None and seconds % finer_seconds != 0:
        raise ValueError(
            f"coarser width {seconds}s does not nest finer width "
            f"{finer_seconds}s — partials would be misassigned"
        )
    return (
        finer.groupBy(
            time_bucket(F.col("bucket"), seconds).alias("bucket"), *keys
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("val_sum").alias("val_sum"),
            F.min("val_min").alias("val_min"),
            F.max("val_max").alias("val_max"),
        )
    )


def finalize_rollup(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Partials -> user-facing columns (avg finalized from sum/cnt)."""
    return partials.select(
        F.col("bucket").cast("string").alias("bucket_start"),
        *keys,
        F.col("cnt").alias("events"),
        F.col("val_sum").cast("double").alias("total_value"),
        (F.col("val_sum").cast("double") / F.col("cnt")).alias("avg_value"),
        F.col("val_min").alias("min_value"),
        F.col("val_max").alias("max_value"),
    )


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe count+sum per key: salt -> partial agg -> merge.

    The salt is hash-derived from the FULL ROW (like salted_join):
    results are identical to a direct groupBy — what the catalog
    oracle checks — and a hot key spreads across reducers even when
    all its rows share one value (value-derived salting would put the
    classic zero-amount/default-enum hot key back on a single
    reducer). Residual case: exact duplicate rows share a salt; the
    aggregate stays correct, only their spreading degrades.
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("p_cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("p_sum"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("p_cnt").alias("cnt"),
        F.sum("p_sum").cast("double").alias("total"),
    )
