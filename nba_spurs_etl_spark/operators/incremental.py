"""Incremental aggregate-state maintenance (materialized-view refresh).

Reference analog: none — the reference full-refreshes every gold table
weekly (``drop_table`` before each load,
``/root/reference/dags/spurs_historic_games.py:437-440``; dbt
``materialized: table``). At 100 TB a full rescan per refresh is the
single most expensive anti-pattern in a warehouse; the standard fix is
keeping a MERGEABLE per-key aggregate state (counts + exact-decimal
sums) and folding each changelog batch into it, so a refresh touches
O(|delta|) rows and O(|touched keys|) state — never the base fact.

Design rules:
- State holds only COMMUTATIVE-GROUP measures (count, sum): inserts
  add, retractions subtract, merge order never matters, and partial
  (map-side) aggregation applies at every step. Derived measures
  (avg) are finalized from state, never stored.
- MIN/MAX are deliberately NOT supported: they are not retractable
  (deleting the current max requires rescanning the key's rows). A
  production system either restricts deletes, keeps a per-key top-k
  sketch, or falls back to key-scoped recompute for min/max columns.
- Sums are exact decimal (``functions.scalar`` conventions), so state
  merge is bit-reproducible across retries, partitionings, and the
  DuckDB oracle.

Scale: ``agg_state`` over a delta batch is one map-combined shuffle of
the delta; ``merge_states`` shuffles only state rows (one per touched
key). Lay the persisted state out bucketed by the group key so the
merge join/groupBy is co-located.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: State column names — fixed so states from different batches union.
N_COL = "_st_n"
S_COL = "_st_s"


def agg_state(
    df: DataFrame,
    keys: list[str],
    amount: str | Column,
    sign: str | Column | None = None,
    scale: int = 2,
) -> DataFrame:
    """Per-key mergeable aggregate state: (*keys, _st_n, _st_s).

    ``_st_n`` = net row count, ``_st_s`` = net exact-decimal sum of
    ``amount``. ``sign`` (+1 insert / -1 retraction, default all +1)
    makes one call handle a mixed changelog batch.
    """
    amt = F.col(amount) if isinstance(amount, str) else amount
    sgn = (
        F.lit(1)
        if sign is None
        else (F.col(sign) if isinstance(sign, str) else sign)
    )
    dec = amt.cast(f"decimal(18,{scale})")
    return df.groupBy(*keys).agg(
        F.sum(sgn).cast("long").alias(N_COL),
        F.sum(F.when(sgn < 0, -dec).otherwise(dec)).alias(S_COL),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state frames into one; drops keys whose net
    row count reaches zero (fully retracted groups disappear, matching
    a from-scratch recompute)."""
    it = iter(states)
    acc = next(it)
    for s in it:
        acc = acc.unionByName(s)
    keys = [c for c in acc.columns if c not in (N_COL, S_COL)]
    return (
        acc.groupBy(*keys)
        .agg(
            F.sum(N_COL).cast("long").alias(N_COL),
            F.sum(S_COL).alias(S_COL),
        )
        .filter(F.col(N_COL) > 0)
    )


def finalize(
    state: DataFrame, n_alias: str = "n_rows", sum_alias: str = "sum_amount",
    avg_alias: str = "avg_amount",
) -> DataFrame:
    """Derive the user-facing aggregate from state: count, exact sum
    (dbig split — see ``functions.scalar.dbig``), and avg as ONE IEEE
    division of exact operands (reproducible on both engines)."""
    from ..functions.scalar import dbig

    keys = [c for c in state.columns if c not in (N_COL, S_COL)]
    s = F.col(S_COL)
    return state.select(
        *keys,
        F.col(N_COL).alias(n_alias),
        dbig(s).alias(sum_alias),
        (dbig(s) / F.col(N_COL)).alias(avg_alias),
    )
