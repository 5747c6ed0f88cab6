"""Streaming correctness = batch equivalence over the same input.

Each streaming query drains the sf0.001 events parquet via an
availableNow trigger and must reproduce its batch twin exactly.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nba_spurs_etl_spark.plans.catalog import queries
from nba_spurs_etl_spark.sources.catalog import load_table
from nba_spurs_etl_spark.streaming import (
    read_events_stream,
    run_stream_to_table,
    stream_dedup,
    stream_session_agg,
    stream_sliding_agg,
    stream_tumbling_agg,
)

from .conftest import SF_SMOKE


def _ms(df):
    return Counter(tuple(r) for r in df.collect())


def test_stream_tumbling_matches_batch(spark):
    res = run_stream_to_table(
        stream_tumbling_agg(read_events_stream(spark, SF_SMOKE)), spark
    )
    batch = queries()["events_tumbling_agg"](spark, SF_SMOKE)
    assert _ms(res) == _ms(batch)


def test_stream_sliding_covers_tumbling(spark):
    res = run_stream_to_table(
        stream_sliding_agg(read_events_stream(spark, SF_SMOKE)), spark
    )
    # every event lands in exactly 2 sliding windows -> total event
    # count doubles vs the input
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert res.agg(F.sum("events")).collect()[0][0] == 2 * n_events


def test_stream_session_matches_batch_islands(spark):
    res = run_stream_to_table(
        stream_session_agg(read_events_stream(spark, SF_SMOKE)), spark
    )
    batch = (
        queries()["events_sessionize"](spark, SF_SMOKE)
        .select("user_id", "session_start_us", "n_events", "session_value")
    )
    assert _ms(res.select("user_id", "session_start_us", "n_events",
                          "session_value")) == _ms(batch)


def test_stream_dedup_keeps_distinct_ids(spark):
    res = run_stream_to_table(
        stream_dedup(read_events_stream(spark, SF_SMOKE)), spark,
        output_mode="append",
    )
    n_distinct = (
        load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    )
    assert res.count() == n_distinct


def test_stateful_user_profile_matches_batch(spark):
    from nba_spurs_etl_spark.streaming.stateful import (
        stream_user_profile,
        user_profile_batch,
    )

    res = run_stream_to_table(
        stream_user_profile(read_events_stream(spark, SF_SMOKE)), spark,
        output_mode="update",
    )
    batch = user_profile_batch(load_table(spark, SF_SMOKE, "events"))
    # update-mode sink may emit a row per micro-batch: keep the last
    # state per user (availableNow on one file -> usually one batch)
    final = {r.user_id: (r.n_events, r.total_cents, r.ewma_value)
             for r in res.collect()}
    expect = {r.user_id: (r.n_events, r.total_cents, r.ewma_value)
              for r in batch.collect()}
    assert final == expect
