"""Custom stateful streaming operators.

Running per-user usage totals (event count, value sum, last-seen ts)
maintained as explicit group state across micro-batches — the streaming
twin of the reference's per-user lifetime indicator table, and the
pattern for any custom stateful operator Spark lacks natively.

Two implementations of the same semantics:

- ``running_user_totals``: ``applyInPandasWithState`` (the classic
  FlatMapGroupsWithState surface).
- ``running_user_totals_tws``: ``transformWithStateInPandas`` — the
  modern arbitrary-state operator. Preferred at scale: state lives in
  the engine's per-key state store (RocksDB-backed on a real cluster)
  with typed value handles, instead of a whole-group pickled tuple,
  and the operator supports timers/TTL for state eviction.
  NOTE: its Python runner protocol imports ``google.protobuf``; on
  containers without a protobuf install, ``compat.ensure_protobuf()``
  activates the vendored pure-python runtime (vendor/README.md), so
  the equivalence test runs everywhere.

State is per user_id: bounded by the user population, partitioned by
the grouping key, checkpointed with the stream — no driver state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last = batch_max if last is None else max(last, batch_max)
    state.update((n, total, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_ts": [last]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime totals, re-emitted for users seen each batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TWS_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


class UserTotalsProcessor(StatefulProcessor):
    """transformWithState processor: one typed value-state handle per
    user holding (n_events, total_value, last_ts)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total, last = self._totals.get()
        else:
            n, total, last = 0, 0.0, None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last = batch_max if last is None else max(last, batch_max)
        self._totals.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user lifetime totals via ``transformWithStateInPandas`` —
    same semantics as :func:`running_user_totals`, new-operator state
    management (asserted equivalent in tests)."""
    # transformWithState requires the RocksDB state store provider
    # (the default HDFS-backed provider crashes the TWS worker); set
    # idempotently so externally-built sessions work too
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)

SESSION_GAP_MS = 30 * 60 * 1000


class SessionFinalizeProcessor(StatefulProcessor):
    """Event-time-TIMER sessionization (the capability vendored
    protobuf unlocked): per user, ALL not-yet-watermark-proven sessions
    (the open one AND gap-closed ones) live in a typed LIST state; a
    session row is emitted ONLY from ``handleExpiredTimer`` when the
    watermark passes its end + gap — i.e. exactly when no
    watermark-accepted event can extend or re-open it (rows older than
    the watermark never reach the processor in eventTime mode, so an
    accepted event always has ts >= watermark > end + gap). Contrast
    ``session_windows`` (declarative session_window aggregation) —
    this is the imperative surface for session payloads the built-in
    aggregate can't express (custom structs, model state).

    Every batch MERGES the stored sessions with the new events as
    intervals (two pieces closer than the gap coalesce, summing
    n/total, min start / max end), so a late-but-within-watermark
    event lands in the session it belongs to — including one EARLIER
    than the open session's start (which correctly lowers
    session_start) or one bridging two pending sessions (which
    correctly coalesces them). This fixes the r8 ADVICE divergence
    where gap-closed sessions were emitted eagerly from
    handleInputRows and a late event silently started a fresh session.

    State: a list of (start, end, n, total) structs per user + one
    timer per pending session; emitted sessions leave the store.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", _SESSION_STATE_SCHEMA)

    def _emit(self, key, start_ms, end_ms, n, total) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def _pending(self) -> list[tuple]:
        if not self._sessions.exists():
            return []
        return [tuple(s) for s in self._sessions.get()]

    def _rearm_timers(self, sessions: list[tuple]) -> None:
        """One timer per pending session at its close-proof instant."""
        want = {end + SESSION_GAP_MS for _, end, _, _ in sessions}
        have = set(self._handle.listTimers())
        for t in have - want:
            self._handle.deleteTimer(t)
        for t in want - have:
            self._handle.registerTimer(t)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pieces = [
            (s, e, n, t) for s, e, n, t in self._pending()
        ]
        for pdf in rows:
            for ts, val in zip(pdf["ts"], pdf["value"]):
                ms = int(pd.Timestamp(ts).value // 1_000_000)
                pieces.append((ms, ms, 1, float(val)))
        if not pieces:
            return
            yield  # pragma: no cover - make this a generator
        # interval-merge: pieces within the gap coalesce (associative
        # aggregates, so stored sessions and raw events mix freely)
        pieces.sort(key=lambda p: (p[0], p[1]))
        merged: list[tuple] = []
        for s, e, n, t in pieces:
            if merged and s - merged[-1][1] <= SESSION_GAP_MS:
                ps, pe, pn, pt = merged[-1]
                merged[-1] = (ps, max(pe, e), pn + n, pt + t)
            else:
                merged.append((s, e, n, t))
        self._sessions.put(merged)
        self._rearm_timers(merged)
        return
        yield  # pragma: no cover - emission happens only on timers

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        keep: list[tuple] = []
        for s, e, n, t in self._pending():
            # the watermark passed end + gap: nothing accepted by the
            # watermark can extend this session — emit and drop
            if expiry >= e + SESSION_GAP_MS:
                yield self._emit(key, s, e, n, t)
            else:
                keep.append((s, e, n, t))
        if keep:
            self._sessions.put(keep)
        else:
            self._sessions.clear()

    def close(self) -> None:
        pass


def session_finalize_tws(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Timer-driven session stream: rows appear exactly once per
    CLOSED session (gap-based, 30 min), emitted when the event-time
    watermark proves the session can no longer grow."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionFinalizeProcessor(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
