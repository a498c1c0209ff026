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


def linear_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    on: str = "user_id",
    window_seconds: int = 1800,
    purchase_id: str = "event_id",
    amount_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits EQUALLY
    across every click in its attribution window — the multi-touch
    complement of the as-of (last-touch) join. Money is allocated in exact
    integer cents by the largest-remainder rule: every touch gets
    ``cents div n``, and the ``cents mod n`` leftover cents go one each to
    the most recent touches (recency, id tie-break) — allocations sum to
    the purchase amount TO THE CENT, the invariant finance reconciliation
    demands (a naive value/n double split loses cents).

    One row per (purchase, click): ``(purchase_id, click_id, n_touches,
    alloc)``. Scale: the pair generation is the interval join's keyed
    shuffle; the rank/count windows partition by purchase (pairs per
    purchase are horizon-bounded)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    p = purchases.select(
        F.col(purchase_id).alias("purchase_id"),
        F.col(on).alias("_k"),
        F.col("ts").alias("_pts"),
        F.round(F.col(amount_col) * 100).cast("long").alias("_cents"),
    )
    c = clicks.select(
        F.col(on).alias("_k"),
        F.col("ts").alias("_cts"),
        F.col("event_id").alias("click_id"),
    )
    pairs = p.join(
        c,
        (p["_k"] == c["_k"])
        & (c["_cts"] <= p["_pts"])
        & (c["_cts"] >= p["_pts"] - F.expr(f"INTERVAL {window_seconds} SECONDS")),
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("_cts").desc(), F.col("click_id").desc()
    )
    wn = Window.partitionBy("purchase_id")
    ranked = pairs.select(
        "purchase_id",
        "click_id",
        "_cents",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("n_touches"),
    )
    alloc_cents = F.expr("_cents div n_touches") + (
        F.col("_r") <= F.col("_cents") % F.col("n_touches")
    ).cast("long")
    return ranked.select(
        "purchase_id",
        "click_id",
        F.col("n_touches").cast("long").alias("n_touches"),
        (alloc_cents / 100.0).alias("alloc"),
    )
