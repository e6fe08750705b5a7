"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the escape hatch for stateful semantics the
built-in operators don't cover (Structured Streaming paper, SIGMOD 2018,
calls this class of operator user-defined stateful processing).

Spark DOES have a built-in ``F.session_window`` (used by the batch
``events_sessionized`` query); this module exists to demonstrate and test
the arbitrary-state API shape the engine offers for operators that need
per-key mutable state across micro-batches: state is one open session per
key, closed sessions are emitted as soon as a later event arrives more
than ``gap`` after the session's end.

Scale notes: state is hash-partitioned by key across executors; one open
session (4 numbers) per key, so state size is bounded by key cardinality.
Emission is event-driven; a production variant would add a
ProcessingTimeTimeout to also flush sessions for keys that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# open-session state: (start_us, end_us, n_events, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_with_state(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, ts, value) stream -> closed-session rows.

    Each micro-batch: sort the key's new events by time, extend or close
    the open session carried in ``GroupState``. Closed sessions are
    emitted; the trailing open session stays in state for the next batch.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            start_us, end_us, n, sv = state.get
        else:
            start_us = end_us = n = 0
            sv = 0.0
        closed: list[tuple[int, int, int, float]] = []
        for ts, val in zip(rows["ts"], rows["value"]):
            t_us = ts.value // 1000  # pandas ns -> us
            if n == 0:
                start_us, end_us, n, sv = t_us, t_us, 1, float(val)
            elif t_us - end_us > gap_us:
                closed.append((start_us, end_us, n, sv))
                start_us, end_us, n, sv = t_us, t_us, 1, float(val)
            else:
                end_us, n, sv = t_us, n + 1, sv + float(val)
        state.update((start_us, end_us, n, sv))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
