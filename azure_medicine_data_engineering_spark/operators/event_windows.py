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
            # exact cents-grid sum (raw double value sums drift past the
            # 4-decimal round at replica scale)
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100,
                4,
            ).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_1h_30m_agg(ev: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes: count + rounded value sum."""
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            # exact cents-grid sum (raw double value sums drift past the
            # 4-decimal round at replica scale)
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100,
                4,
            ).alias("total_value"),
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


def bounce_rate_daily(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily bounce rate over gap-based sessions: sessions form when a
    user's inter-event gap exceeds ``gap_seconds`` (the classic
    islands-and-gaps assembly — lag + cumulative flag, both windows
    KEYED BY USER, never global); a session of exactly one event is a
    bounce; sessions date to their FIRST event's day. Returns one row
    per day ``(day, n_sessions, n_bounces, bounce_rate)`` with the rate
    on the integer micro grid.

    At 100 TB the event fact shuffles once on the user key; everything
    after is session/day-frame sized."""
    from pyspark.sql.window import Window

    w_u = Window.partitionBy("u").orderBy("t")
    tagged = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t")
    ).withColumn(
        "_new",
        F.when(
            F.col("t").cast("long") - F.lag(F.col("t").cast("long")).over(w_u)
            > gap_seconds,
            1,
        )
        .otherwise(
            F.when(F.lag("t").over(w_u).isNull(), 1).otherwise(0)
        ),
    )
    w_cum = (
        Window.partitionBy("u")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = tagged.withColumn("sid", F.sum("_new").over(w_cum))
    per_sess = sess.groupBy("u", "sid").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.min("t").alias("t0"),
    )
    return (
        per_sess.groupBy(
            F.date_format(F.col("t0").cast("date"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum((F.col("n_ev") == 1).cast("long")).cast("long").alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            (F.expr("n_bounces * 1000000 div n_sessions") / 1e6).alias("bounce_rate"),
        )
    )
