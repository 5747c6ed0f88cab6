"""Streaming heavy hitters: a Misra-Gries summary folded per
micro-batch.

The streaming half of ``operators/heavyhitters.py``: each micro-batch
is reduced to its own MG summary (one map-combined count + a
WindowGroupLimit top-(m+1)) and MERGED into the persisted summary —
state is O(groups x m) rows FOREVER, regardless of how many distinct
keys the stream has carried; the published mergeable-summaries bound
(est <= true <= est + err) survives every merge. This is the
bounded-memory alternative to ``streaming/incremental.py``'s exact
per-key state when the key domain is unbounded (user ids, URLs,
n-grams at web scale).

Storage and retry contract are ``streaming.cdc.CdcSnapshot``'s:
version = batch_id + 1 over a ``VersionStore``; a foreachBatch retry
re-reads the untouched version <= batch_id and overwrites — the
ADDITIVE merge never double-counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import heavyhitters as hh
from .cdc import CdcSnapshot


class MGSnapshot(CdcSnapshot):
    """Versioned parquet snapshot holding one MG summary."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_col: str,
        key_col: str,
        m: int,
    ):
        super().__init__(spark, root, keys=[group_col, key_col])
        self.group_col = group_col
        self.key_col = key_col
        self.m = m

    def seed_empty(self, like: DataFrame) -> None:
        """Version-0 empty summary with the right schema (derived from
        a zero-row MG build over ``like``)."""
        self.init(
            hh.mg_summary(
                like.limit(0), self.group_col, self.key_col, self.m
            )
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        delta = hh.mg_summary(
            batch_df, self.group_col, self.key_col, self.m
        )
        merged = hh.mg_merge(
            self.store.read_at_or_before(batch_id), delta, self.m
        )
        self._write(merged, batch_id + 1)

    def result(self) -> DataFrame:
        """(group, key, est_count, err_bound) from the current state."""
        return hh.mg_finalize(
            self.read(), group_out=self.group_col, key_out=self.key_col
        )
