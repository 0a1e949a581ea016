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

Scale notes: state is one fixed-size row per active user, partitioned by
key across executors and persisted in the RocksDB state store
(``transformWithStateInPandas`` requires the RocksDB provider — see
``ROCKSDB_CONF``); quiet keys cost nothing per batch. The per-key Python
loop touches only the current micro-batch's rows for that key.

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
    session's last event."""

    def __init__(self, gap: int) -> None:
        self._gap = gap

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._open = handle.getValueState(
            "open_session", "start long, last long, n long"
        )

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
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    def close(self) -> None:
        pass


def sessionize(events: DataFrame, gap: int = 30) -> DataFrame:
    """events (streaming): user_id long, ts long -> closed sessions.

    Append output mode: a closed session is immutable, so every sink type
    (parquet included) works downstream. Sessions still open when the
    stream stops are intentionally NOT emitted — they are not facts yet;
    they surface once a later event (in any future run over the same
    checkpoint) closes them."""
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
