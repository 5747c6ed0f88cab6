"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the arbitrary-stateful path Spark offers when built-in
windows can't express the semantics: a per-user running profile
(event count, exact-decimal value total, EWMA of value) maintained in
group state across micro-batches.

State design for scale:
- state per user is O(1) (three scalars) — the operator's memory is
  bounded by |active keys|, not |events|;
- an opt-in processing-time timeout expires idle users so the key
  space cannot grow without bound (continuous runs only — see
  ``stream_user_profile``);
- value totals accumulate in integer cents (exact, associative) —
  float accumulation across batch boundaries would drift.

Batch twin: ``user_profile_batch`` computes the same profile with
ordered window functions; ``tests/test_streaming.py`` asserts equality,
which exercises both the EWMA recursion and the state handoff ordering.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.scalar import epoch_us

ALPHA = 0.5  # EWMA smoothing
OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, ewma_value double"
)
STATE_SCHEMA = "n bigint, total_cents bigint, ewma double"


def _make_update_fn(idle_timeout_ms: int | None):
    def update_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, total_cents, ewma = state.get
        else:
            n, total_cents, ewma = 0, 0, None
        rows = pd.concat(list(batches))
        # deterministic in-batch order: event time, then event_id
        rows = rows.sort_values(["us", "event_id"])
        for v in rows["value"]:
            n += 1
            # floor(x+0.5): same rounding as the batch twin's F.floor
            # and the tws processor's math.floor (python round() is
            # banker's — diverges on halves; bare int() truncates
            # toward zero — diverges on NEGATIVE values)
            total_cents += int(math.floor(v * 100 + 0.5))
            ewma = v if ewma is None else ALPHA * v + (1 - ALPHA) * ewma
        state.update((n, total_cents, float(ewma)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_cents": pd.Series([total_cents], dtype="int64"),
                "ewma_value": pd.Series([ewma], dtype="float64"),
            }
        )

    return update_fn


def stream_user_profile(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user stateful profile over a stream of events.

    ``idle_timeout_ms`` enables processing-time expiry of idle users —
    mandatory for unbounded continuous runs (bounds the key space), but
    leave it None for drain-and-stop (availableNow) runs: processing-
    time timeouts keep scheduling timeout-handling micro-batches, so an
    availableNow trigger never terminates (observed empirically).
    """
    # same measured-events predicate as user_profile_batch and the
    # shared oracle: without it a NULL value raises in the cents fold
    # (int(floor(NaN)) -> ValueError) and NULL keys/timestamps emit
    # groups the batch twin excludes — one contract across all three.
    prepared = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select("user_id", "event_id", "value", epoch_us("ts").alias("us"))
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin: same profile via one pass of ordered aggregation.

    EWMA with constant alpha unrolls to a weighted sum:
    ewma_n = a*v_n + a(1-a)*v_{n-1} + ... + (1-a)^{n-1}*v_1,
    computed here with aggregate() over the time-ordered value list —
    same left-to-right recursion the stateful operator runs.

    A profile aggregates a user's MEASURED events: rows lacking an
    identity, a timestamp, or a value are excluded up front. Without
    the guard a NULL value poisons the cents fold permanently but lets
    the EWMA fold silently RESET (its acc-is-null seed branch
    re-fires), and NULL timestamps sort differently across engines —
    differential-fuzzer find; the oracle mirrors the predicate.
    """
    prepared = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select("user_id", "event_id", "value", epoch_us("ts").alias("us"))
    ordered = prepared.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("us", "event_id", "value"))
        ).alias("seq")
    )
    vals = F.col("seq").getField("value")
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v).otherwise(
            F.lit(ALPHA) * v + F.lit(1 - ALPHA) * acc
        ),
    )
    total_cents = F.aggregate(
        F.transform(vals, lambda v: F.floor(v * 100 + 0.5).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return ordered.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        total_cents.alias("total_cents"),
        ewma.alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the current-generation arbitrary-state API
# ---------------------------------------------------------------------------
#
# Same per-user profile as stream_user_profile, expressed with the
# StatefulProcessor lifecycle (init/handleInputRows/close) and a typed
# ValueState handle instead of applyInPandasWithState's single opaque
# tuple. What the new API buys at scale: composable named state
# variables (value/list/map) with per-variable TTL, event-time timers,
# and RocksDB-backed state with changelog checkpointing — the pieces an
# unbounded keyspace needs that the legacy API bolts on awkwardly.


def _tws_processor():
    import math

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total_cents, ewma = self._state.get()
            else:
                n, total_cents, ewma = 0, 0, None
            batch = pd.concat(list(rows)).sort_values(["us", "event_id"])
            for v in batch["value"]:
                n += 1
                total_cents += int(math.floor(v * 100 + 0.5))
                ewma = v if ewma is None else ALPHA * v + (1 - ALPHA) * ewma
            self._state.update((n, total_cents, float(ewma)))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "n_events": pd.Series([n], dtype="int64"),
                    "total_cents": pd.Series([total_cents], dtype="int64"),
                    "ewma_value": pd.Series([ewma], dtype="float64"),
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor()


def stream_user_profile_tws(events: DataFrame) -> DataFrame:
    """Per-user profile via transformWithStateInPandas (RocksDB state).

    Semantics identical to ``stream_user_profile`` /
    ``user_profile_batch`` — the batch-equivalence test covers all
    three, so the two stateful APIs gate each other.
    """
    # same measured-events predicate as the batch twin — see
    # stream_user_profile.
    prepared = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select("user_id", "event_id", "value", epoch_us("ts").alias("us"))
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_tws_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
