"""Catalog registration: Structured Streaming queries (rows-only).

No DuckDB oracle — a streaming drain is not SQL-expressible — so the
driver records the weaker rows-only check here. Full correctness is
covered by batch-equivalence tests (tests/test_streaming.py): each
query's result is asserted equal to its batch twin, which IS
oracle-checked (events_tumbling_agg / events_sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (
    read_events_stream,
    run_stream_to_table,
    stream_dedup,
    stream_session_agg,
    stream_tumbling_agg,
)
from .registry import register


@register(
    "stream_tumbling_agg",
    group="2.9 ext-stream",
    oracle=None,
    doc="Streaming 5-min tumbling agg with 10-min watermark, drained "
    "via availableNow; equals batch events_tumbling_agg (tested).",
)
def stream_tumbling_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_table(
        stream_tumbling_agg(read_events_stream(spark, sf_dir)), spark,
        state_partitions=8,  # |windows x types| keys: tiny state
    )


@register(
    "stream_session_agg",
    group="2.9 ext-stream",
    oracle=None,
    doc="Streaming per-user session windows (30-min gap, stateful); "
    "equals batch events_sessionize islands (tested).",
)
def stream_session_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_table(
        stream_session_agg(read_events_stream(spark, sf_dir)), spark,
        state_partitions=8,
    )


@register(
    "stream_dedup",
    group="2.9 ext-stream ext-dedup",
    oracle=None,
    doc="Streaming exact-dedup on event_id with watermark-bounded state.",
)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_table(
        stream_dedup(read_events_stream(spark, sf_dir)), spark,
        output_mode="append", state_partitions=8,
    )


@register(
    "stream_user_profile",
    group="2.9 ext-stream stateful",
    oracle=None,
    doc="Custom arbitrary-stateful operator (applyInPandasWithState): "
    "per-user count / exact-cents total / EWMA maintained in group "
    "state. Equals the ordered-aggregation batch twin (tested).",
)
def stream_user_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import stream_user_profile

    return run_stream_to_table(
        stream_user_profile(read_events_stream(spark, sf_dir)),
        spark,
        output_mode="update",
        state_partitions=8,
    )
