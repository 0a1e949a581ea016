"""Streaming sessionization via ``transformWithStateInPandas`` (Spark 4's
arbitrary-stateful-processing API; SURVEY.md §2.11 — the reference is
batch-only, this is the engine's streaming counterpart to the batch
``w7_session_window`` query).

One ``StatefulProcessor`` keeps the OPEN session per user in a
``ValueState`` (start, last event ts, event count). An incoming event
whose gap from the last seen event exceeds ``gap`` CLOSES the open
session — closed sessions are emitted as final facts (append mode, never
retracted), the open session stays in state across micro-batches until a
later event closes it.

Scale notes: state is one fixed-size row per user, partitioned by key
across executors and persisted in the RocksDB state store
(``transformWithStateInPandas`` requires the RocksDB provider — see
``ROCKSDB_CONF``); quiet keys cost nothing per batch. The per-key Python
loop touches only the current micro-batch's rows for that key. On an
UNBOUNDED key universe pass ``idle_timeout_ms``: a processing-time
timer closes and CLEARS an idle key's session, bounding state to the
recently-active set (without it, state holds every ever-seen key
forever and a churned user's last session is never emitted).

Runtime requirement: the transformWithState state protocol is
protobuf-based — the ``protobuf`` Python package must be installed on
driver and executors (the operator builds and plans without it; the
stream fails at start otherwise). The engine-integration test skips
where protobuf is absent; the processor semantics are unit-tested
against a fake ValueState either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, session_start long, session_end long, n_events long"

#: session conf required by transformWithStateInPandas (state lives in
#: RocksDB, the only provider supporting the new state API)
ROCKSDB_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)


class SessionProcessor(StatefulProcessor):
    """Gap-based sessionizer: emits (user, start, end, n_events) for every
    session CLOSED by a later event arriving more than ``gap`` after the
    session's last event.

    ``idle_timeout_ms`` (processing-time) additionally closes-and-clears
    a session whose KEY goes quiet: without it, state holds one row per
    EVER-SEEN user forever (the key universe, not the active set) and a
    churned user's final session is never emitted by any amount of
    stream progress. Each batch for a key registers a timer at
    now + timeout; on expiry the handler re-checks genuine idleness
    against the key's last activity (stale timers from earlier batches
    fire and pass through), then emits the open session and CLEARS the
    state — bounding state to keys active within the timeout window."""

    def __init__(self, gap: int, idle_timeout_ms: int | None = None) -> None:
        self._gap = gap
        self._idle = idle_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState(
            "open_session", "start long, last long, n long"
        )
        if self._idle is not None:
            # processing-time of the key's last activity — the idleness
            # reference the expiry handler checks stale timers against
            self._seen = handle.getValueState("last_seen_pt", "pt long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._open.exists():
            start, last, n = self._open.get()
        else:
            start, last, n = None, None, 0
        closed: list[tuple[int, int, int, int]] = []
        ts_all: list[int] = []
        for pdf in rows:
            # skip null timestamps: through Arrow they surface as NaN
            # and int(NaN) raises — a single poison event would crash
            # the stream on every checkpointed replay
            ts_all.extend(int(t) for t in pdf["ts"].dropna())
        for ts in sorted(ts_all):
            if start is None:
                start, last, n = ts, ts, 1
            elif ts - last > self._gap:
                closed.append((key[0], start, last, n))
                start, last, n = ts, ts, 1
            elif ts < start - self._gap:
                # too-late cross-batch straggler: older than the open
                # session's reach — merging would corrupt session_start,
                # and emitting a singleton now could split a session a
                # later replay would have joined. Watermark semantics:
                # drop it.
                continue
            else:
                # in-order events extend the tail; a LATE event inside
                # the session's span must never move `last` BACKWARD
                # (that prematurely closed the session on the next
                # event and could even emit session_end < session_start)
                start = min(start, ts)
                last, n = max(last, ts), n + 1
        if start is not None:
            self._open.update((start, last, n))
        if self._idle is not None and timerValues is not None:
            now = timerValues.getCurrentProcessingTimeInMs()
            self._seen.update((now,))
            self._handle.registerTimer(now + self._idle)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    def handleExpiredTimer(
        self, key: Any, timerValues: Any, expiredTimerInfo: Any
    ) -> Iterator[pd.DataFrame]:
        if self._idle is None or not self._open.exists():
            return
        expiry = expiredTimerInfo.getExpiryTimeInMs()
        seen = self._seen.get()[0] if self._seen.exists() else None
        # stale timer: the key was active again after this timer was
        # registered — a NEWER timer covers it, ignore this one
        if seen is not None and expiry < seen + self._idle:
            return
        start, last, n = self._open.get()
        self._open.clear()
        if self._seen.exists():
            self._seen.clear()
        yield pd.DataFrame(
            [(key[0], start, last, n)],
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    def close(self) -> None:
        pass


def sessionize(
    events: DataFrame, gap: int = 30, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events (streaming): user_id long, ts long -> closed sessions.

    Append output mode: a closed session is immutable, so every sink type
    (parquet included) works downstream. Without ``idle_timeout_ms``,
    sessions still open when a key goes quiet are NOT emitted (and their
    state rows live forever — fine for bounded key universes, wrong for
    unbounded ingest); with it, an idle key's open session closes via a
    processing-time timer and its state clears, bounding state to the
    recently-active key set."""
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap, idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none" if idle_timeout_ms is None else "processingTime",
    )
