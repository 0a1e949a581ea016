"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 — the reference is batch-only; this is the engine's
Structured Streaming surface for operators Spark lacks built-in).

``running_totals`` keeps one state row per key (n events, value sum, max
event time seen) and emits the updated running totals every micro-batch —
the canonical "incremental per-entity accumulator" every monitoring
pipeline needs (per-plot measurement counters, per-user activity).

Scale notes: state is partitioned by the group key across executors and
checkpointed via the streaming checkpoint; a group's state must fit in
memory, which holds for fixed-size accumulators like these. The Arrow
boundary sees only (key) groups of the current micro-batch — state for
quiet keys stays untouched on disk.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double, last_ts long"
STATE_SCHEMA = "n long, total double, last_ts long"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        # drop null timestamps BEFORE max(): a nullable ts materializes
        # as NaN through Arrow, and int(NaN) is a stream-killing poison
        # pill (the checkpointed replay re-raises forever)
        ts_valid = pdf["ts"].dropna()
        if len(ts_valid):
            last_ts = max(last_ts, int(ts_valid.max()))
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_sum": [total],
            # -1 is the internal never-seen sentinel (state tuples must
            # stay non-null); it must NOT leak into output as a real
            # 1969-epoch timestamp for a key whose events were all
            # null-ts — emit SQL NULL instead
            "last_ts": pd.array(
                [None if last_ts == -1 else last_ts], dtype="Int64"
            ),
        }
    )


def running_totals(events: DataFrame) -> DataFrame:
    """events (streaming): user_id long, ts long, value double ->
    one updated running-total row per active user per micro-batch.

    Operator output mode is "append": each emitted row is a final fact
    ("totals as of this batch"), never retracted — which also keeps every
    sink type (parquet included) usable downstream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
