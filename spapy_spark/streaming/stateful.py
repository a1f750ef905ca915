"""Custom stateful streaming operator: incremental per-user session
tracking with ``applyInPandasWithState``.

State per user: (last_ts_epoch, session_count, events_in_session).
Each micro-batch folds its (sorted) events into the state and emits
one row per user with the running totals — the canonical
arbitrary-stateful-operator shape (GroupState + timeout) the brief's
streaming checklist names.  Batch oracle: operators/sessionize.py on
the full event log gives the same final counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType(), True),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def track_sessions(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """events stream → running (user_id, n_sessions, n_events)."""

    gap_us = int(gap_seconds) * 1_000_000

    def fold(key, pdfs, state: GroupState):
        import numpy as np

        (user_id,) = key
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        # applyInPandasWithState guarantees no ordering across (or even
        # within) Arrow chunks of a group — concatenate ALL chunks and
        # sort once, then compare microsecond gaps strictly, exactly as
        # the batch oracle (operators/sessionize.py) does.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            ep = pdf["ts"].astype("int64").to_numpy() // 1_000  # ns → µs
            gaps = np.diff(ep)
            n_sessions += int((gaps > gap_us).sum())
            if last_ts is None or ep[0] - last_ts > gap_us:
                n_sessions += 1
            last_ts = int(ep[-1])
            n_events += len(ep)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
