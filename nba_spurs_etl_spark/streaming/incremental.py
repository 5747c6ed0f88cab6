"""Streaming materialized-view maintenance: a changelog stream folded
into mergeable aggregate state.

The streaming half of ``operators/incremental.py``: each micro-batch is
reduced to per-key (count, exact-decimal-sum) state (one map-combined
aggregation of the batch) and merged into the persisted state snapshot
— the refresh touches O(|batch| + touched keys) rows, never a base
fact. Storage reuses the versioned-parquet snapshot of
``streaming.cdc.CdcSnapshot`` (new committed directory per batch,
vacuum-able), so a consumer always reads a consistent state version.

This is the Structured Streaming equivalent of "incremental
materialized view": what Delta Live Tables / Materialize call
aggregate maintenance, here in ~40 lines over bare parquet because the
state algebra (commutative count/sum with ±1 signs) does all the work.

Scale: the per-batch merge is a state-only groupBy (state rows per
touched key ride one shuffle); snapshot layout should be bucketed by
the group key at 100 TB so merge never re-shuffles the full state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import incremental as inc
from .cdc import CdcSnapshot


class AggStateSnapshot(CdcSnapshot):
    """Versioned parquet snapshot holding mergeable aggregate state."""

    def __init__(
        self,
        spark,
        root: str,
        keys: list[str],
        amount: str,
        sign: str | None = None,
        scale: int = 2,
    ):
        super().__init__(spark, root, keys=keys)
        self.amount = amount
        self.sign = sign
        self.scale = scale

    def init_from(self, base: DataFrame) -> None:
        """Seed state from a base table (one full aggregation — the
        LAST full scan the view ever needs)."""
        self.init(inc.agg_state(base, self.keys, self.amount, scale=self.scale))

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # deterministic version = batch_id + 1 (CdcSnapshot retry
        # contract): merge_states is ADDITIVE, so a foreachBatch retry
        # that re-read the already-merged latest version would double-
        # count every touched key — reading the untouched version
        # <= batch_id and overwriting batch_id + 1 makes the retry a
        # no-op rewrite instead
        delta = inc.agg_state(
            batch_df, self.keys, self.amount, sign=self.sign, scale=self.scale
        )
        merged = inc.merge_states(self.store.read_at_or_before(batch_id), delta)
        self._write(merged, batch_id + 1)

    def result(self) -> DataFrame:
        """Finalized user-facing aggregate from the current state."""
        return inc.finalize(self.read())
