"""Custom stateful streaming operator: session counting per user via
`applyInPandasWithState`.

This is the template for stateful per-key corpus operators the built-in
windowing can't express (the reference's closest analogue is the mutable
per-corpus accumulator state in createCorpus, index.js:37-460 — here the
state is explicit, partitioned by key, and checkpointed by the engine).

Sessions: ordered events of one user belong to the same session while the
gap to the previous event is <= gap_seconds. State carries (last_ts,
n_events, n_sessions) so increments across micro-batches continue the
same session when the gap allows — semantics identical to the batch
`q_sessionize` window query when all data arrives in order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StructField, StructType)

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("n_sessions", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("n_sessions", LongType()),
])


def _update(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    gap = 1800
    last_ts, n_events, n_sessions = (
        state.get if state.exists else (None, 0, 0))
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ts = (pdf["ts"].astype("int64") // 1_000_000_000).to_numpy()
    for t in ts:  # per-batch rows for one key: small; state math is scalar
        if last_ts is None or t - last_ts > gap:
            n_sessions += 1
        n_events += 1
        last_ts = int(t)
    state.update((last_ts, n_events, n_sessions))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_events],
                       "n_sessions": [n_sessions]})


def sessionize_stateful(events_stream: DataFrame,
                        gap_seconds: int = 1800) -> DataFrame:
    """events stream -> running (user_id, n_events, n_sessions), updated
    each micro-batch. State per key is 3 longs — bounded regardless of
    stream length; keys partition across executors (shuffle on user_id
    only once, the state store is local thereafter)."""
    assert gap_seconds == 1800, "gap fixed at 1800s (matches q_sessionize)"
    return (events_stream
            .select("user_id", "ts", "event_id")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))
