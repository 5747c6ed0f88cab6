"""Streaming SCD Type-2 apply: a change stream folded into a versioned
dimension of validity intervals.

The streaming half of ``plans.analytics_ext.events_scd2_intervals``
(batch SCD2 build): each micro-batch closes the open interval of every
touched key and appends the batch's changes as new versions. Uses the
same versioned-parquet snapshot storage as ``streaming.cdc.CdcSnapshot``
(new directory per applied batch, ``_COMMITTED`` marker, vacuum-able).

Scale design — the apply touches only:
- the batch rows (one per change),
- the snapshot rows of TOUCHED keys (semi/anti join on the batch's
  distinct keys; the touched-key set per micro-batch is small, so the
  split joins broadcast it),
- and re-intervalizes ONLY touched keys (one window over open rows +
  batch rows of those keys; closed history rows are carried over
  verbatim, never re-windowed).
Untouched keys stream through a left_anti join unchanged. At 100 TB
the snapshot lives in a table format partitioned/bucketed by key, so
the touched/untouched split is a co-located join.

Ordering contract: like any append-mode SCD2 apply, a batch must not
carry changes OLDER than a key's already-closed history (late data
would require rewriting closed intervals — that is a batch rebuild,
``events_scd2_intervals``, not a streaming apply). Within a batch any
order is fine; the re-intervalization window sorts by (ts, tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .cdc import CdcSnapshot


class Scd2Snapshot(CdcSnapshot):
    """Versioned parquet snapshot holding SCD2 intervals per key.

    Snapshot schema: (key, version INT, value, effective_from_us LONG,
    effective_to_us LONG, is_current BOOL, _tb) — ``_tb`` is the
    tiebreak column (e.g. event_id) kept so interval rebuilds order
    duplicate timestamps exactly like the batch build.
    """

    def __init__(
        self,
        spark,
        root: str,
        key: str,
        value_col: str = "value",
        tiebreak_col: str = "event_id",
    ):
        super().__init__(spark, root, keys=[key])
        self.key = key
        self.value_col = value_col
        self.tiebreak_col = tiebreak_col

    def init_empty(self, tb_type: T.DataType | None = None) -> None:
        schema = T.StructType(
            [
                T.StructField(self.key, T.LongType()),
                T.StructField("version", T.IntegerType()),
                T.StructField(self.value_col, T.DoubleType()),
                T.StructField("effective_from_us", T.LongType()),
                T.StructField("effective_to_us", T.LongType()),
                T.StructField("is_current", T.BooleanType()),
                T.StructField("_tb", tb_type or T.LongType()),
            ]
        )
        self.init(self.spark.createDataFrame([], schema))

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        k, v, tb = self.key, self.value_col, self.tiebreak_col
        batch = batch_df.select(
            k, F.col(v).alias(v), F.col("us").alias("us"), F.col(tb).alias("_tb")
        )
        # deterministic version = batch_id + 1 (CdcSnapshot retry
        # contract): the interval rebuild is NOT idempotent — a retry
        # reading the already-applied latest snapshot would union the
        # batch with open rows that ARE those rows, duplicating
        # versions and emitting zero-length intervals — so read the
        # untouched version <= batch_id and overwrite batch_id + 1
        snap = self.store.read_at_or_before(batch_id)
        touched = batch.select(k).distinct()
        untouched = snap.join(F.broadcast(touched), k, "left_anti")
        old_touched = snap.join(F.broadcast(touched), k, "inner")
        closed = old_touched.filter(~F.col("is_current"))
        open_rows = old_touched.filter(F.col("is_current"))
        # version offset per key = versions already CLOSED (open row's
        # ordinal - 1); keys first seen this batch get offset 0
        offsets = open_rows.select(
            k, (F.col("version") - 1).alias("_offset")
        )
        events = open_rows.select(
            k, v, F.col("effective_from_us").alias("us"), "_tb"
        ).unionByName(batch)
        w = Window.partitionBy(k).orderBy("us", "_tb")
        rebuilt = (
            events.join(F.broadcast(offsets), k, "left")
            .withColumn("_offset", F.coalesce("_offset", F.lit(0)))
            .select(
                k,
                (F.row_number().over(w) + F.col("_offset"))
                .cast("int")
                .alias("version"),
                F.col(v),
                F.col("us").alias("effective_from_us"),
                F.lead("us").over(w).alias("effective_to_us"),
                F.lead("us").over(w).isNull().alias("is_current"),
                "_tb",
            )
        )
        new_snap = untouched.unionByName(closed).unionByName(rebuilt)
        self._write(new_snap, batch_id + 1)

    def intervals(self) -> DataFrame:
        """Current dimension, in the batch build's column contract."""
        return self.read().select(
            self.key,
            "version",
            self.value_col,
            "effective_from_us",
            "effective_to_us",
            "is_current",
        )


def stamp_file_order(groups: list[list[str]]) -> None:
    """Force strictly increasing modification times across file groups.

    FileStreamSource orders unprocessed files by lastModified with
    millisecond granularity and no documented tiebreak; two parquet
    writes landing in the same millisecond (or on a coarse-mtime
    filesystem) can be picked up in either order. Order-SENSITIVE
    drains (SCD2's append-mode contract) must pin the intake order
    explicitly; commutative drains (CDC merge, agg-state) don't care.
    """
    import os
    import time

    t0 = time.time() - 60.0 * (len(groups) + 1)
    for i, files in enumerate(groups):
        for f in files:
            os.utime(f, (t0 + 60.0 * i, t0 + 60.0 * i))
