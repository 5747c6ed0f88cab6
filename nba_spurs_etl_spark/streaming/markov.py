"""Streaming Markov transition counting with cross-batch frontier state.

The streaming twin of ``plans.analytics_ext.events_markov_transitions``:
transition counts are ORDER-SENSITIVE (a pair is two consecutive events
of one user), so unlike counts/sums they do not fold batch-by-batch for
free — the pair spanning a batch boundary (user's last event of batch
k, first event of batch k+1) belongs to neither batch alone. This
operator keeps exactly that boundary as state: a FRONTIER table of one
row per user (their latest event so far). Per micro-batch
(``foreachBatch``):

1. in-batch pairs: lag over (us, event_id) per user within the batch —
   the same window the batch query runs, on batch-local data;
2. boundary pairs: previous frontier joined to each user's FIRST batch
   event (max_by/min_by aggregates, no extra window);
3. the union, gap-filtered (<= 30 min like the batch twin), is counted
   and appended to a ``bid=<k>``-partitioned delta sink (per-directory
   overwrite — idempotent under foreachBatch retries);
4. the frontier upserts to each user's new latest event, written as
   snapshot version ``k+1`` — a DETERMINISTIC version-per-batch
   mapping, so a retry of batch k re-reads the untouched version k and
   overwrites version k+1 instead of stacking a phantom version.

``result()`` sums the deltas (order-insensitive from here on) and
row-normalizes — with batches arriving in event-time order it equals
the batch operator exactly; the multi-batch boundary contract is
pinned by an explicit-batches pytest, and the catalog drain (single
parquet file -> one batch) shares the batch oracle in full.

Scale: state is ONE row per user (the same bound as
``stateful.StreamUserProfile``); per batch one user-keyed window over
batch rows, one frontier join keyed by user, one map-combined pair
count. Nothing ever rescans history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

FRONTIER_SCHEMA = "user_id bigint, us bigint, event_id bigint, event_type string"


class StreamingMarkov:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        gap_us: int = 1_800_000_000,
    ):
        from .cdc import VersionStore

        self.spark = spark
        self.counts_dir = os.path.join(work_dir, "pair_deltas")
        self.frontier_root = os.path.join(work_dir, "frontier")
        # the same versioned-parquet commit protocol the CDC/agg-state/
        # SCD2 snapshots use (deterministic version = batch_id + 1) —
        # one shared implementation, not a second copy of it here
        self.store = VersionStore(spark, self.frontier_root)
        self.gap_us = gap_us

    # -- frontier versioning (deterministic version = batch_id + 1) -------

    def _write_frontier(self, df: DataFrame, v: int) -> None:
        self.store.write(df, v)

    def _read_frontier(self, v: int) -> DataFrame:
        try:
            return self.store.read_at_or_before(v)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no committed frontier <= v{v} under {self.frontier_root}; "
                "call seed_empty() (or seed()) before attaching the stream"
            ) from None

    def seed_empty(self) -> None:
        self._write_frontier(
            self.spark.createDataFrame([], FRONTIER_SCHEMA), 0
        )

    def seed(self, events: DataFrame) -> None:
        """Seed the frontier from already-processed history."""
        self._write_frontier(_latest_per_user(_project(events)), 0)

    # -- per-batch fold ----------------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        b = _project(batch_df)
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        in_batch = (
            b.select(
                F.col("event_type").alias("src_type"),
                F.lead("event_type").over(w).alias("dst_type"),
                (F.lead("us").over(w) - F.col("us")).alias("gap"),
            )
        )
        first = b.groupBy("user_id").agg(
            F.min_by(
                F.struct("us", "event_type"),
                F.struct("us", "event_id"),
            ).alias("f")
        )
        prev = self._read_frontier(batch_id)
        boundary = (
            prev.alias("p")
            .join(first.alias("c"), "user_id")
            .select(
                F.col("p.event_type").alias("src_type"),
                F.col("c.f.event_type").alias("dst_type"),
                (F.col("c.f.us") - F.col("p.us")).alias("gap"),
            )
        )
        delta = (
            in_batch.unionByName(boundary)
            .filter(
                F.col("dst_type").isNotNull() & (F.col("gap") <= self.gap_us)
            )
            .groupBy("src_type", "dst_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        delta.write.mode("overwrite").parquet(
            os.path.join(self.counts_dir, f"bid={batch_id}")
        )
        merged = _latest_per_user(
            prev.unionByName(b.select(*prev.columns))
        )
        self._write_frontier(merged, batch_id + 1)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` committed frontier
        versions (one accrues per batch — unbounded runs need
        retention, same contract as ``cdc.CdcSnapshot.vacuum``). Keep
        at least 2 so an in-flight retry of the latest batch can still
        re-read its input version."""
        return self.store.vacuum(keep_last)

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- finalized result --------------------------------------------------

    def result(self) -> DataFrame:
        c = (
            self.spark.read.option("basePath", self.counts_dir)
            .parquet(self.counts_dir)
            .groupBy("src_type", "dst_type")
            .agg(F.sum("n").alias("n"))
        )
        norm = Window.partitionBy("src_type")
        return c.select(
            "src_type",
            "dst_type",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(norm).cast("double"))
            .alias("p"),
        )


def _project(events: DataFrame) -> DataFrame:
    from ..functions.scalar import epoch_us

    cols = set(events.columns)
    us = F.col("us") if "us" in cols else epoch_us("ts")
    # same measured-steps predicate as the batch twin
    # (analytics_ext._markov_pair_counts) and the shared oracle: rows
    # lacking identity/time/type form no transition step, and NULL time
    # order diverges across engines — one contract for batch and stream.
    return events.select(
        "user_id", us.alias("us"), "event_id", "event_type"
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("us").isNotNull()
        & F.col("event_type").isNotNull()
    )


def _latest_per_user(ev: DataFrame) -> DataFrame:
    picked = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("us", "event_id", "event_type"),
            F.struct("us", "event_id"),
        ).alias("l")
    )
    return picked.select(
        "user_id",
        F.col("l.us").alias("us"),
        F.col("l.event_id").alias("event_id"),
        F.col("l.event_type").alias("event_type"),
    )
