"""Custom stateful streaming operator: sessionization with state.

The reference's streaming loop is stateless per record (SURVEY.md §2.4
— no windows, no state, at-most-once). This module adds the canonical
custom stateful operator on top of the same records stream:
gap-based sessionization via ``applyInPandasWithState`` — the Spark
primitive for user-defined streaming state (Arrow-batched per group,
no per-row Python, same rule as the parse stage).

Semantics (mirrors operators/sessionize.py so the two are
differentially testable):
- events for a key belong to one session while each successive event
  arrives strictly within ``gap`` of the previous one;
- a session CLOSES when the event-time watermark passes
  ``last_event_ts + gap`` (event-time timeout) — output rows are
  (key, session_start, session_end = last_ts + gap, n_events);
- state per key is O(1): (session_start, last_ts, n_events) — no
  event buffering, which is what lets 10^12 events stream through
  1000 executors with bounded state;
- late events inside the watermark extend/merge their session;
  events later than the watermark are dropped by the upstream
  ``withWatermark`` (defined late-data semantics the reference lacks).

At-scale notes: state is hash-partitioned by key (one shuffle), each
micro-batch touches only keys with new events plus keys whose timers
fired; the state store is RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_GAP_SECONDS = 30 * 60

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _session_fn_factory(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        # fold this batch's timestamps (already watermark-filtered) into
        # the running session; close any session a gap falls beyond
        ts_us = (
            pd.concat([p["ts"] for p in pdfs])
            .sort_values()
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        if len(ts_us) == 0:
            return
        closed_rows = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts_us[0]), int(ts_us[0]), 0
        for t in ts_us:
            t = int(t)
            if t - last_us >= gap_us and n > 0:
                closed_rows.append((start_us, last_us + gap_us, n))
                start_us, n = t, 0
            n += 1
            last_us = max(last_us, t)
            # a late-but-within-watermark event can land BEFORE the
            # stored session start (cross-batch out-of-order); the batch
            # twin reports min event time, so track the min here too
            start_us = min(start_us, t)
        state.update((start_us, last_us, n))
        # event-time timer: fire when the watermark passes last + gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if closed_rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed_rows),
                    "session_start": [pd.Timestamp(r[0], unit="us") for r in closed_rows],
                    "session_end": [pd.Timestamp(r[1], unit="us") for r in closed_rows],
                    "n_events": [r[2] for r in closed_rows],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionization over a streaming DataFrame.

    Returns the stream of CLOSED sessions (append mode): a session is
    emitted once the event-time watermark passes its last event + gap.
    Differential twin of the batch ``operators.sessionize.sessionize``
    (tested equal on the closed prefix).
    """
    keyed = (
        events.withWatermark(time_col, watermark)
        .select(F.col(key_col).alias("key"), F.col(time_col).alias("ts"))
        .groupBy("key")
    )
    return keyed.applyInPandasWithState(
        _session_fn_factory(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
