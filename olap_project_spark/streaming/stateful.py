"""Custom stateful streaming operators via ``applyInPandasWithState``
— the extension point for semantics Spark's built-in windows can't
express (SURVEY.md ST7 "our additions"; task brief: custom stateful
operators).

Example operator: a per-key running total with threshold alerts —
emits a row whenever a key's cumulative value crosses another multiple
of ``threshold`` (the "large cumulative spend" alert a fraud pipeline
wants *mid-stream*, not at window close). Not expressible with
tumbling/session windows: state is a monotone accumulator over the
whole stream, and emission is value-triggered, not time-triggered.

Scale notes:
- state is one (sum, alert_count) pair per key — O(keys) bytes, hash-
  partitioned across executors by groupBy; no global state.
- timeouts: GroupStateTimeout.NoTimeout keeps state forever (running
  totals); swap to EventTimeTimeout + state.setTimeoutTimestamp to
  evict idle keys when the key domain is unbounded.
- data flows through Arrow batches per key-group — vectorized, not
  row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cum_value", DoubleType()),
        StructField("alerts_so_far", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cum_value", DoubleType()),
        StructField("alerts", LongType()),
    ]
)


def cumulative_threshold_alerts(
    events: DataFrame,
    threshold: float = 1000.0,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key cumulative-sum alerts: emit one row each time a
    key's running total crosses another multiple of ``threshold``.

    Works on a streaming DataFrame grouped by ``key_col``; state is the
    running (sum, alert_count). Batch-deterministic for a replayed
    source: alerts depend only on the per-key prefix sums, and rows
    within a key arrive in micro-batch order.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cum, alerts = state.get
        else:
            cum, alerts = 0.0, 0
        # a key's rows are gathered from many input partitions with no
        # order guarantee — impose event-time order within the batch
        # (event_id as a total-order tiebreaker when present) so the
        # prefix sums (and therefore alerts) are deterministic
        batch = pd.concat(list(pdfs), ignore_index=True)
        order = [c for c in ("ts", "event_id") if c in batch.columns]
        if order:
            batch = batch.sort_values(order, kind="mergesort")
        out_rows = []
        for v in batch[value_col]:
            new_cum = cum + float(v)
            if int(new_cum // threshold) > int(cum // threshold):
                alerts += 1
                out_rows.append((key[0], round(new_cum, 2), alerts))
            cum = new_cum
        state.update((cum, alerts))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["user_id", "cum_value", "alerts_so_far"])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=ALERT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RECORD_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("record_cents", LongType()),
        StructField("records_so_far", LongType()),
    ]
)

RECORD_STATE_SCHEMA = StructType(
    [
        StructField("max_cents", LongType()),
        StructField("n_records", LongType()),
    ]
)


def running_record_highs(
    events: DataFrame,
    key_col: str = "user_id",
    cents_col: str = "cents",
) -> DataFrame:
    """Streaming per-key running-record detector: emit one row each
    time a key's value STRICTLY exceeds every value the key has
    produced before (its first event is, trivially, a record). The
    "new personal best / new high-water mark" alert — value-triggered
    emission against a whole-stream extremum, which no tumbling or
    session window can express (a window's max forgets at close; this
    state never does).

    A second, semantically distinct exercise of the same
    ``applyInPandasWithState`` surface as
    :func:`cumulative_threshold_alerts`: that one accumulates
    (additive state), this one dominates (idempotent max state) —
    together they pin both broad classes of custom stateful operators.

    Determinism contract: values arrive as exact integer CENTS; rows
    within a key are imposed (ts, event_id) order, a total order; the
    comparison is strict integer ``>`` — so the emitted set equals the
    SQL formulation ``cents > MAX(cents) OVER (... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` exactly, on any engine.

    Scale: state is one (max, count) pair per key, hash-partitioned by
    the groupBy; emission rate is the running-record rate, ~ln(n) rows
    per key for exchangeable inputs — the sink sees a vanishing
    fraction of the stream. NoTimeout keeps records forever; swap to
    EventTimeTimeout to retire idle keys in unbounded key domains."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            mx, n_rec = state.get
            has_prev = True
        else:
            mx, n_rec = 0, 0
            has_prev = False
        batch = pd.concat(list(pdfs), ignore_index=True)
        order = [c for c in ("ts", "event_id") if c in batch.columns]
        if order:
            batch = batch.sort_values(order, kind="mergesort")
        out_rows = []
        for c in batch[cents_col]:
            c = int(c)
            if not has_prev or c > mx:
                mx = c
                has_prev = True
                n_rec += 1
                out_rows.append((key[0], c, n_rec))
        state.update((mx, n_rec))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["user_id", "record_cents", "records_so_far"],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RECORD_SCHEMA,
        stateStructType=RECORD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# The same operator on Spark 4's transformWithStateInPandas — the
# successor API (typed state handles, timers, TTL) that replaces the
# (fn, state-schema) closure style above. Both implementations are kept
# and pinned to identical output by tests: the engine's custom-operator
# surface works on whichever API a deployment standardizes on.
# --------------------------------------------------------------------------
def cumulative_threshold_alerts_tws(
    events: DataFrame,
    threshold: float = 1000.0,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """``cumulative_threshold_alerts`` on the StatefulProcessor API:
    state is a typed ValueState handle the runtime manages (RocksDB-
    backed at scale, with changelog checkpointing), instead of an
    opaque tuple the closure re-packs every batch. Timers/TTL hooks
    (``handleExpiredTimer``) are where idle-key eviction goes when the
    key domain is unbounded.

    Runtime requirement: the TWS Python worker speaks protobuf to the
    JVM — environments without a working ``google.protobuf`` must use
    :func:`cumulative_threshold_alerts` (identical semantics, pinned by
    tests/test_stateful_streaming.py whenever protobuf is present)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            cum, alerts = (
                self.state.get() if self.state.exists() else (0.0, 0)
            )
            batch = pd.concat(list(rows), ignore_index=True)
            order = [c for c in ("ts", "event_id") if c in batch.columns]
            if order:
                batch = batch.sort_values(order, kind="mergesort")
            out = []
            for v in batch[value_col]:
                new_cum = cum + float(v)
                if int(new_cum // threshold) > int(cum // threshold):
                    alerts += 1
                    out.append((key[0], round(new_cum, 2), alerts))
                cum = new_cum
            self.state.update((cum, alerts))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "cum_value", "alerts_so_far"]
                )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        AlertProcessor(),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


CUSUM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("excess_cents", LongType()),
        StructField("alarms_so_far", LongType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("p", LongType()),
        StructField("minp", LongType()),
        StructField("prev_s", LongType()),
        StructField("alarms", LongType()),
    ]
)


def cusum_drift_alarms(
    events: DataFrame,
    reference_cents: int = 5500,
    threshold_cents: int = 50_000,
    key_col: str = "event_type",
    cents_col: str = "cents",
) -> DataFrame:
    """Streaming CUSUM drift detector: per key, the reflected walk
    ``S_t = P_t − min(P_0..P_t)`` over deviations ``cents −
    reference`` (the same prefix-sum identity the batch
    ``hourly_cusum_changepoints`` uses), emitting one alarm row each
    time S crosses the threshold UPWARD (S > h while the previous S
    was ≤ h). State per key is four int64s — (P, min P, previous S,
    alarm count) — so the whole monitor costs O(keys) bytes
    regardless of stream volume, and every quantity is integer-exact:
    a replayed stream hash-matches the SQL window oracle.

    The classic CUSUM recursion max(0, S+e) needs no extra state
    here: reflecting at the running minimum is the closed form, and
    it carries across micro-batches exactly (P and minP are
    prefix-decomposable)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            p, minp, prev_s, alarms = state.get
        else:
            p, minp, prev_s, alarms = 0, 0, 0, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        order = [c for c in ("ts", "event_id") if c in batch.columns]
        if order:
            batch = batch.sort_values(order, kind="mergesort")
        out_rows = []
        for c in batch[cents_col]:
            p += int(c) - reference_cents
            if p < minp:
                minp = p
            s = p - minp
            if s > threshold_cents and prev_s <= threshold_cents:
                alarms += 1
                out_rows.append((key[0], s, alarms))
            prev_s = s
        state.update((p, minp, prev_s, alarms))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["event_type", "excess_cents", "alarms_so_far"],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


IDLE_GAP_MS = 30 * 60 * 1000  # retire a key idle past this event-time gap

IDLE_SCHEMA = (
    "user_id bigint, first_ms bigint, last_ms bigint, n_events bigint"
)
IDLE_STATE_SCHEMA = "first_ms bigint, last_ms bigint, n bigint"


def idle_key_retirement(events: DataFrame) -> DataFrame:
    """The EventTimeTimeout arm of the stateful surface — the one
    mechanism NoTimeout operators never exercise: per-user running
    (first, last, count) state with a timeout timer re-armed to
    ``last_event + IDLE_GAP_MS`` on every update; when the event-time
    watermark passes the timer, Spark invokes the function with
    ``state.hasTimedOut`` and NO data, and the operator EMITS the
    retired key's lifetime summary and removes its state — the
    bounded-state discipline an unbounded key domain requires (without
    it, a 100-TB stream's state store grows with every user ever
    seen).

    Determinism contract (oracle-checkable): timers fire when
    ``timeout < watermark`` (strict, Spark's eviction rule); under the
    single-file availableNow replay the watermark takes exactly one
    step to ``max(ts) - delay``, so the emitted set is exactly the
    users with ``last_event + gap < max(ts) - delay`` — idle users —
    while still-active users stay in state unemitted. Timestamps
    travel as exact integer epoch-millis."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            first_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], first_ms, last_ms, n)],
                columns=["user_id", "first_ms", "last_ms", "n_events"],
            )
            return
        mn = mx = None
        n = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf["ts"].values.astype("datetime64[ms]").astype("int64")
            n += len(pdf)
            lo, hi = int(ts.min()), int(ts.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        if n:
            if state.exists:
                first_ms, last_ms, n0 = state.get
                state.update((min(first_ms, mn), max(last_ms, mx), n0 + n))
            else:
                state.update((mn, mx, n))
            state.setTimeoutTimestamp(state.get[1] + IDLE_GAP_MS)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=IDLE_SCHEMA,
        stateStructType=IDLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
