"""Sessionization — gap-based event sessions.

Batch path: pure window functions (lag → gap flag → running sum), all
JVM-side, one shuffle on user_id.  The same definition is DuckDB-
expressible, so it ships as an oracle-checked contract query.

Streaming path (streaming/stateful.py): the same sessions maintained
incrementally with ``applyInPandasWithState`` — the custom-stateful-
operator surface of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    New session when the gap to the previous event exceeds
    ``gap_seconds`` (integer epoch-second comparison — deterministic
    across engines).
    """
    w = Window.partitionBy(user).orderBy(ts, event_id)
    prev = F.lag(F.col(ts)).over(w)
    # calendar-based diff (timestampdiff), NOT unix_timestamp: epoch
    # conversion is session-timezone dependent and would shift gaps
    # across DST transitions under a non-UTC driver session; DuckDB's
    # date_diff('second', …) is calendar-based too — bit-identical.
    events = events.withColumn("__prev", prev)
    gap = F.expr(f"timestampdiff(MICROSECOND, __prev, {ts})")
    new_s = F.when(
        F.col("__prev").isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(user).orderBy(ts, event_id).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new", new_s).withColumn(
        "session_seq", F.sum("__new").over(run).cast("long")
    ).drop("__new", "__prev")


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """Per-session aggregate: event count + start/end timestamps."""
    s = sessionize(events, gap_seconds, user, ts, event_id)
    return s.groupBy(user, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("start_ts"),
        F.max(ts).alias("end_ts"),
    )
