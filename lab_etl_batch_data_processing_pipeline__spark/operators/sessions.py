"""Sessionization + engagement operators over an event stream table.

The reference loads a ``user_viewing`` engagement table but never joins or
aggregates it (SURVEY.md §2.9 quirk 10 — cleaned then dropped). These
operators are the engagement surface that table invites, expressed on the
driver's ``events`` table.

Scale notes: both operators shuffle once on ``user_col`` (the natural
partitioning for per-user history); the gap-based session assignment is a
LAG + running-sum window pair over that single partitioning, so adding the
second window costs no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``.

    Classic two-window formulation over one hash partitioning:
    LAG(ts) -> new-session flag -> running SUM of flags = session index.
    Output adds ``session_seq`` (1-based per user).
    """
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    order = [ts.asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts).over(w)
    new_session = (
        prev_ts.isNull()
        | ((ts.cast("long") - prev_ts.cast("long")) > gap_s)
    ).cast("int")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("__new_session", new_session).withColumn(
        "session_seq", F.sum("__new_session").over(running)
    ).drop("__new_session")


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: event count and duration in seconds."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    sessions = sessionize(events, user_col, ts_col, gap_minutes, tiebreak_col)
    return (
        sessions.groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts).cast("long") - F.min(ts).cast("long")).alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


def user_engagement(
    events: DataFrame,
    user_col: str,
    ts_col: str | Column,
    type_col: str | None = None,
) -> DataFrame:
    """Per-user engagement profile: totals, breadth, activity span."""
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts).cast("long") - F.min(ts).cast("long")).alias("span_sec"),
    ]
    if type_col:
        aggs.append(F.countDistinct(type_col).alias("n_event_types"))
    return events.groupBy(F.col(user_col).alias("user_id")).agg(*aggs).orderBy("user_id")
