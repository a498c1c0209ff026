"""As-of / interval joins (custom-operator family the reference lacks;
expressed as compositions of existing DataFrame ops per the build brief —
no UDFs, no custom physical operators).

- ``interval_join``: equi-key + time-range predicate (t_right ∈ [t_left - w,
  t_left]). Plan: shuffle on the equi key, range predicate evaluated inside
  the join — Spark turns this into a sort-merge join with the band filter.
- ``asof_join``: latest right row at-or-before each left row (within an
  optional horizon) — interval join + per-left-row rank pick.

Scale notes: both shuffle once on the equi key. For banded-time workloads at
100 TB, pre-bucketing both sides by (key, time_bucket) turns the range probe
into bucket-local work; AQE handles moderate key skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 1800,
    suffix: str = "_r",
) -> DataFrame:
    """All right rows within ``window_seconds`` at-or-before each left row,
    matched on the equi-key ``on``."""
    r = right.select(
        F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c != on],
    )
    lts, rts = F.col(left_ts), F.col(f"{right_ts}{suffix}")
    return left.join(r, on=on, how="inner").where(
        (rts <= lts) & (rts >= lts - F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 1800,
    left_id: str | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Latest right row at-or-before each left row (within the horizon).
    ``left_id`` must uniquely identify left rows (rank partition key);
    ``tiebreak`` (a right-side column, pre-suffix name) makes equal-timestamp
    picks deterministic."""
    if left_id is None:
        raise ValueError("asof_join needs a unique left row id for the rank pick")
    joined = interval_join(left, right, on, left_ts, right_ts, window_seconds, suffix)
    order = [F.col(f"{right_ts}{suffix}").desc()]
    if tiebreak:
        order.append(F.col(f"{tiebreak}{suffix}").desc())
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
