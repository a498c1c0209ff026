"""Shared windowed-aggregation builders for the events table.

The batch queries (``queries/events.py``) and their streaming twins
(``streaming/windows.py``) MUST produce identical output — they share one
DuckDB oracle. These builders make the twins identical by construction:
both sides apply the same function to a (batch or streaming) events frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_hourly_agg(ev: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + rounded value sum."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value").cast("double"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_1h_30m_agg(ev: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes: count + rounded value sum."""
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value").cast("double"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_30m_agg(ev: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user: events per session."""
    return ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("events_in_session")
    )


def sessions_per_user(per_session: DataFrame) -> DataFrame:
    """Collapse per-session rows to per-user session/event counts."""
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("events_in_session").cast("long").alias("n_events"),
    )
