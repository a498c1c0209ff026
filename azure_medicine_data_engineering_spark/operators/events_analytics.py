"""Ordered-event analytics: funnel conversion and retention cohorts.

Scale extension (no counterpart in the reference, whose event data is
static tables): the two product-analytics operators every event warehouse
ships. Both are built from one hash-partition on user plus window/agg
passes — no self-joins over the event fact, no driver-side iteration.

100 TB notes: the funnel repartitions the event fact ONCE on user_id and
cascades window minima inside that partitioning (Spark reuses the exchange
for consecutive windows over the same keys); retention aggregates
user-level firsts (output is users × weeks, orders of magnitude smaller
than the fact) before the final cohort rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches stage k when an event of
    ``stages[k]`` occurs AFTER their earliest qualifying stage k-1 event
    (min-timestamp semantics at each step). Returns one row per stage:
    (stage_idx, stage, n_users), monotonically non-increasing.

    Plan: every per-stage threshold is a window min over the same
    ``user_col`` partitioning, so the event fact shuffles once; the final
    rollup is a tiny conditional aggregate."""
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, type_col, ts_col)
    reach_cols = []
    prev = None
    for k, stage in enumerate(stages):
        gate = F.col(type_col) == stage
        if prev is not None:
            gate = gate & (F.col(ts_col) > F.col(prev))
        t_k = f"_t{k}"
        cur = cur.withColumn(t_k, F.min(F.when(gate, F.col(ts_col))).over(w))
        reach_cols.append(
            F.countDistinct(
                F.when(F.col(t_k).isNotNull(), F.col(user_col))
            ).alias(f"_n{k}")
        )
        prev = t_k
    totals = cur.agg(*reach_cols)
    # unpivot the single totals row via explode — a union of per-stage
    # selects would replay the whole window lineage once per stage
    stage_structs = [
        F.struct(
            F.lit(k).cast("int").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.col(f"_n{k}").cast("long").alias("n_users"),
        )
        for k, stage in enumerate(stages)
    ]
    return totals.select(
        F.explode(F.array(*stage_structs)).alias("_s")
    ).select("_s.*")


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 8,
) -> DataFrame:
    """Weekly retention triangle: users cohorted by the Monday-start week
    of their first event; a cohort member counts as retained in offset w
    if they have any event in [cohort_start + 7w days, +7(w+1) days).
    Returns (cohort_week DATE, week_offset, n_users).

    Week offsets are exact integer day arithmetic (datediff // 7) — no
    float time math to diverge across engines."""
    w = Window.partitionBy(user_col)
    marked = df.select(user_col, ts_col).withColumn(
        "cohort_week",
        F.to_date(F.date_trunc("week", F.min(ts_col).over(w))),
    )
    offsets = marked.select(
        user_col,
        "cohort_week",
        F.floor(
            F.datediff(F.to_date(ts_col), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
    ).where(F.col("week_offset") < max_weeks)
    return (
        offsets.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_path_ngrams(
    events: DataFrame,
    n: int = 3,
    top_k: int = 15,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Top-k behavioral paths: the most common length-``n`` event-type
    sequences across users (the product-analytics "common journeys" view;
    the n-gram generalization of the first-order Markov transitions).

    Per user, events order by (ts, id) and every window of ``n``
    consecutive types joins into a path string; corpus-wide counts then
    TakeOrderedAndProject the top-k (count desc, path asc).

    Scale: ONE shuffle keyed on user for the lead windows (the same
    user-partitioning funnel/retention/Markov reuse), a map-side-combined
    path count, and a k-row ordered take — no self-joins, no global
    sort."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    leads = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    paths = (
        events.select(F.concat_ws(">", *leads).alias("path"),
                      leads[-1].isNotNull().alias("_full"))
        .where(F.col("_full"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wr = Window.orderBy(F.desc("cnt"), "path")
    return (
        paths.orderBy(F.desc("cnt"), "path")
        .limit(top_k)
        .withColumn("rank", F.row_number().over(wr).cast("int"))
    )


def daily_revenue_anomalies(
    orders: DataFrame,
    k: int = 2,
    window_days: int = 7,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Rolling z-score anomaly flags on the daily revenue series, computed
    ENTIRELY in integer arithmetic so the flag set is bit-identical across
    engines: day ``x`` is anomalous vs its trailing window (the
    ``window_days`` days strictly BEFORE it — no self-contamination) when
    ``|x − mean| > k·σ``, evaluated as

        (n·x − s)² > k² · (n·q − s²)

    with s = Σxᵢ, q = Σxᵢ² over the window — the variance inequality
    cleared of divisions. x is on a $100 integer grid (cents div 10000):
    coarse enough that every term stays far inside int64 at 10⁶× this
    revenue volume, fine enough that a 2σ day is unambiguous.

    Scale shape: fact rows collapse to one row per day first; every window
    runs over the calendar-bounded day frame (same licensed class as
    rolling_7day_revenue). Days with fewer than 3 prior days in the window
    report flag = false (variance undefined/trivial)."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("_cents")
    ).select(
        "d",
        (F.col("_cents") / 100.0).alias("daily_rev"),
        F.expr("_cents div 10000").alias("_x"),
    )
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1990-01-01")))
        .rangeBetween(-window_days, -1)
    )
    n = F.count("_x").over(w)
    s = F.sum("_x").over(w)
    q = F.sum(F.col("_x") * F.col("_x")).over(w)
    lhs = (n * F.col("_x") - s) * (n * F.col("_x") - s)
    rhs = F.lit(k * k) * (n * q - s * s)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "daily_rev",
        n.cast("long").alias("n_window"),
        F.when(n >= 3, lhs > rhs).otherwise(F.lit(False)).alias("is_anomaly"),
    )


def cohort_ltv_matrix(
    events: DataFrame,
    max_weeks: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    revenue_type: str = "purchase",
) -> DataFrame:
    """Cohort lifetime-value triangle: users cohort by the Monday-start week
    of their FIRST event (the retention triangle's grouping), and each
    (cohort, age-in-weeks) cell reports active users plus cents-grid
    purchase revenue — the money companion of ``retention_cohorts``, the
    matrix whose row-sums are cohort LTV curves.

    Scale: the first-event week is a window MIN over the one user-keyed
    partitioning every ordered-event operator here shares; cells aggregate
    with partial+final combine. Integer day arithmetic; money on the cents
    grid."""
    w = Window.partitionBy(user_col)
    cohorted = events.select(
        user_col,
        F.col(type_col),
        F.col(value_col),
        F.col(ts_col).cast("date").alias("_d"),
        F.date_trunc("week", F.min(ts_col).over(w)).cast("date").alias("_cw"),
    ).withColumn(
        "age_weeks", F.expr("datediff(_d, _cw) div 7").cast("int")
    )
    return (
        cohorted.where(F.col("age_weeks") < max_weeks)
        .groupBy(
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"), "age_weeks"
        )
        .agg(
            F.count_distinct(user_col).cast("long").alias("n_active"),
            (
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(type_col) == revenue_type,
                            F.round(F.col(value_col) * 100).cast("long"),
                        )
                    ),
                    F.lit(0),
                )
                / 100.0
            ).alias("revenue"),
        )
    )


def theil_sen_trend(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    max_days: int = 100_000,
) -> DataFrame:
    """Theil–Sen robust trend of daily revenue: the MEDIAN of all pairwise
    slopes — up to 29% of outlier days cannot move it, where an OLS slope
    follows a single bad day (the robust-stats companion to the MAD
    outlier report).

    Slopes are exact integers in micro-dollars/day via FLOOR division
    implemented engine-portably — ``(a − posmod(a, b)) / b`` with
    ``posmod = ((a % b) + b) % b`` — because Spark's ``div`` truncates
    toward zero on negatives while DuckDB's ``//`` floors (dividend-signed
    ``%`` is identical in both, so the posmod identity closes the gap).
    The median of an even count of integers is x.0 or x.5 — exact in
    doubles on both engines.

    Scale: fact rows collapse to the calendar-bounded day frame first;
    the pair fan-out is days², still calendar-bounded (2.4k days → 2.9M
    pairs), never fact-sized. ``max_days`` is the runtime license guard
    (the :func:`~..functions.rankstats.kendall_tau_keyed` convention):
    the O(m²) pair join raises rather than silently running on a frame
    that is NOT day-grained (e.g. a mis-passed per-event frame)."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("cents")
    ).select(
        F.datediff(F.col("d"), F.lit("1990-01-01")).cast("long").alias("i"),
        F.expr("cents div 100").alias("y"),
    ).persist()
    m = daily.count()
    if m > max_days:
        daily.unpersist()
        raise ValueError(
            f"theil_sen_trend: day frame has {m} rows > max_days="
            f"{max_days}; the O(m²) pair join is licensed for "
            "calendar-bounded day frames only"
        )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.i") < F.col("b.i")).select(
        (F.col("b.y") - F.col("a.y")).alias("_dy"),
        (F.col("b.i") - F.col("a.i")).alias("_dx"),
    )
    # floor((dy * 1e6) / dx) portably (see docstring)
    num = F.col("_dy") * F.lit(1_000_000)
    posmod = ((num % F.col("_dx")) + F.col("_dx")) % F.col("_dx")
    slope_micro = ((num - posmod) / F.col("_dx")).cast("long")
    slopes = pairs.select(slope_micro.alias("s"))
    out = slopes.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.expr("percentile(s, 0.5)") / 1e6).alias("slope_dollars_per_day"),
        (F.min("s") / 1e6).alias("min_slope"),
        (F.max("s") / 1e6).alias("max_slope"),
    )
    out._stage_caches = [daily]
    return out


def ols_daily_trend(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Classical OLS slope/intercept of daily revenue — the least-squares
    companion to :func:`theil_sen_trend` (quote both; when they disagree
    materially, the series has influential outliers). Closed form from
    INTEGER sufficient statistics over the day frame:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with x = days since the series start (≤ calendar span) and y = whole
    dollars — every term fits int64 with orders-of-magnitude headroom, the
    final division is one IEEE op on identical integers, so both engines
    produce the same double bit-for-bit.

    Emits one row: ``(n_days, slope_dollars_per_day, intercept_dollars,
    mean_dollars_per_day)``."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.expr(
            f"sum(cast(round({amount_col} * 100) as bigint)) div 100"
        ).alias("y")
    )
    start = daily.agg(F.min("d").alias("_d0"))
    g = daily.crossJoin(F.broadcast(start)).select(
        F.datediff(F.col("d"), F.col("_d0")).cast("long").alias("x"), "y"
    )
    s = g.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = (s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(slope, 4).alias("slope_dollars_per_day"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 4
        ).alias("intercept_dollars"),
        (F.expr("sy div n")).cast("long").alias("mean_dollars_per_day"),
    )


def day_of_week_seasonality(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Day-of-week seasonality index: each weekday's mean daily revenue as
    an integer-micro ratio to the all-days mean — the profile a forecaster
    divides out before trend fitting. Integer division end-to-end
    (cents-grid dailies → whole-dollar day means → micro-unit index), so
    both engines agree exactly.

    Emits 7 rows: ``(dow, n_days, mean_dollars, seasonal_index)`` with dow
    1=Sunday..7=Saturday (both engines' DAYOFWEEK convention)."""
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.expr(
            f"sum(cast(round({amount_col} * 100) as bigint)) div 100"
        ).alias("y")
    )
    per_dow = daily.groupBy(F.dayofweek("d").cast("int").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("sum(y) div count(1)").cast("long").alias("mean_dollars"),
    )
    overall = daily.agg(F.expr("sum(y) div count(1)").cast("long").alias("_om"))
    return (
        per_dow.crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            "mean_dollars",
            (F.expr("mean_dollars * 1000000 div _om") / 1e6).alias("seasonal_index"),
        )
    )


#: Shared ACF finalization — identical text in the DuckDB oracle. All
#: operands are doubles cast from exact integer (DECIMAL/HUGEINT) sums.
ACF_R_EXPR = (
    "round((pk - s / n * (ak + bk) + npairs * (s / n) * (s / n)) / "
    "(q - s / n * s), 4)"
)

CUSUM_STAT_EXPR = "round(dmax / (n * 1e0 * s), 4)"


def acf_daily_revenue(
    orders: DataFrame,
    max_lag: int = 7,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    cache: bool = True,
    include_n: bool = False,
) -> DataFrame:
    """Autocorrelation function of the daily revenue series at calendar
    lags 1..``max_lag`` — the Box-Jenkins diagnostic behind every
    seasonality/trend decision. ``r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²``
    over observed days, expanded into five sufficient statistics that all
    accumulate exactly (cents grid, DECIMAL(38,0)); the only doubles are
    the shared ``ACF_R_EXPR`` on identical operands.

    Plan: fact rows collapse to the day frame once (persisted — lag fan-out
    and totals both read it), each lag pair comes from ONE keyed self-join
    on ``day_num + k`` after a 7× map-side explode. No windows at all.

    Returns ``(k, npairs, r)`` — one row per lag — plus the day count
    ``n`` when ``include_n`` (so downstream portmanteau tests reuse it
    instead of re-scanning the fact table).
    """
    dec = "decimal(38,0)"
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))).cast("long").alias("dn"),
            "x",
        )
    )
    if cache:  # day-frame, multi-consumer; caller-owned lifecycle
        daily = daily.persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s_d"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("q_d"),
    )
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, max_lag + 1)])).alias("k")
    left = daily.select(F.col("dn"), F.col("x").alias("xt"), lags)
    pairs = left.join(
        daily.select(F.col("dn").alias("_dn2"), F.col("x").alias("xk")),
        left["dn"] + F.col("k") == F.col("_dn2"),
    )
    per_lag = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("npairs"),
        F.sum(F.col("xt").cast(dec) * F.col("xk")).alias("pk_d"),
        F.sum(F.col("xt").cast(dec)).alias("ak_d"),
        F.sum(F.col("xk").cast(dec)).alias("bk_d"),
    )
    final = (
        per_lag.alias("l")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            F.col("l.k").cast("int").alias("k"),
            "l.npairs",
            F.col("l.pk_d").cast("double").alias("pk"),
            F.col("l.ak_d").cast("double").alias("ak"),
            F.col("l.bk_d").cast("double").alias("bk"),
            "t.n",
            F.col("t.s_d").cast("double").alias("s"),
            F.col("t.q_d").cast("double").alias("q"),
        )
    )
    cols = ["k", "npairs", F.expr(ACF_R_EXPR).alias("r")]
    if include_n:
        cols.append(F.col("n"))
    return final.select(*cols)


def cusum_changepoint(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    cache: bool = True,
) -> DataFrame:
    """CUSUM changepoint scan on the daily revenue series: the day
    maximizing ``|Σ_{i≤t}(x_i − x̄)|``, evaluated division-free as
    ``D_t = |n·cum_t − t·S|`` — exact integers end to end (cents grid,
    DECIMAL(38,0)), deterministic lowest-day tie-break. The cumulative
    window runs over the calendar-bounded day frame (licensed class).

    Returns one row ``(n_days, day_at_max, cusum_stat)`` with
    ``cusum_stat = max_t |S_t| · n / (n·S)`` via the shared expression.
    """
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
    )
    if cache:  # day-frame, multi-consumer; caller-owned lifecycle
        daily = daily.persist()
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "d",
        F.sum(F.col("x").cast(dec)).over(w).alias("cum_d"),
        F.count(F.lit(1)).over(w).cast("long").alias("t_idx"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s_d"),
    )
    scored = (
        cum.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            "c.d",
            "t.n",
            F.col("t.s_d").alias("s_d"),
            F.abs(
                F.col("c.cum_d") * F.col("t.n") - F.col("t.s_d") * F.col("c.t_idx")
            ).alias("dt_d"),
        )
    )
    if cache:
        scored = scored.persist()
    best = scored.agg(F.max("dt_d").alias("dmax_d"))
    return (
        scored.alias("s")
        .join(F.broadcast(best).alias("b"), F.col("s.dt_d") == F.col("b.dmax_d"))
        .groupBy()
        .agg(
            F.max("s.n").cast("long").alias("n"),
            F.date_format(F.min("s.d"), "yyyy-MM-dd").alias("day_at_max"),
            F.max("s.dt_d").cast("double").alias("dmax"),
            F.max(F.col("s.s_d").cast("double")).alias("s"),
        )
        .select(
            F.col("n").alias("n_days"),
            "day_at_max",
            F.expr(CUSUM_STAT_EXPR).alias("cusum_stat"),
        )
    )


def ewma_daily_revenue(
    orders: DataFrame,
    alpha_tenths: int = 2,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Exponentially weighted moving average of daily revenue with
    INTEGER state: ``e_t = round(α·x_t + (1−α)·e_{t−1})`` on the cents
    grid, seeded at ``e_0 = x_0``. Rounding the state to an integer at
    every step makes the recursion bit-identical on any engine (the same
    trick as the micro-unit log sums): both sides perform the identical
    double step on identical integer state, and the round() re-anchors it.

    ``α = alpha_tenths/10`` is embedded as the exact double literal
    ``0.<t>e0`` in both the fold and the oracle's recursive CTE.

    Scale shape: fact rows collapse to the day frame first; the fold runs
    inside ONE global aggregate over the calendar-bounded day array
    (structurally licensed — a ``Keys: []`` aggregate), then explodes
    back to rows. Returns ``(day, daily_cents, ewma_cents)``.
    """
    a = alpha_tenths
    assert 1 <= a <= 9
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x")
    )
    fold = (
        "aggregate("
        "  slice(arr, 2, size(arr) - 1),"
        "  array(named_struct('d', arr[0].d, 'x', arr[0].x,"
        "                     'e', cast(arr[0].x as bigint))),"
        "  (acc, s) -> concat(acc, array(named_struct("
        "    'd', s.d, 'x', s.x,"
        f"   'e', cast(round(0.{a}e0 * s.x + 0.{10 - a}e0 * element_at(acc, -1).e) as bigint)"
        "  )))"
        ")"
    )
    packed = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("arr")
    )
    return (
        packed.select(F.explode(F.expr(fold)).alias("s"))
        .select(
            F.date_format("s.d", "yyyy-MM-dd").alias("day"),
            F.col("s.x").cast("long").alias("daily_cents"),
            F.col("s.e").cast("long").alias("ewma_cents"),
        )
    )


def holt_linear_daily(
    orders: DataFrame,
    alpha_tenths: int = 2,
    beta_tenths: int = 1,
    horizon: int = 7,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of daily revenue
    with INTEGER cents state, plus the h-step-ahead linear forecast:

        l_t = round(α·x_t + (1−α)·(l_{t−1} + b_{t−1}))
        b_t = round(β·(l_t − l_{t−1}) + (1−β)·b_{t−1})

    seeded ``l_0 = x_0, b_0 = 0``. Per-step integer rounding re-anchors
    both states (the :func:`ewma_daily_revenue` trick), so the fold and
    the oracle's recursive CTE stay bit-identical. Emits the LAST state
    row plus the forecast: ``(n_days, last_day, level_cents, trend_cents,
    forecast_cents)`` with ``forecast = l_n + h·b_n``.
    """
    a, b = alpha_tenths, beta_tenths
    assert 1 <= a <= 9 and 1 <= b <= 9
    daily = orders.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x")
    )
    step_l = (
        f"cast(round(0.{a}e0 * s.x + 0.{10 - a}e0 * "
        "(element_at(acc, -1).l + element_at(acc, -1).b)) as bigint)"
    )
    fold = (
        "aggregate("
        "  slice(arr, 2, size(arr) - 1),"
        "  array(named_struct('d', arr[0].d, 'x', arr[0].x,"
        "                     'l', cast(arr[0].x as bigint),"
        "                     'b', cast(0 as bigint))),"
        "  (acc, s) -> concat(acc, array(named_struct("
        "    'd', s.d, 'x', s.x,"
        f"   'l', {step_l},"
        f"   'b', cast(round(0.{b}e0 * ({step_l} - element_at(acc, -1).l)"
        f"             + 0.{10 - b}e0 * element_at(acc, -1).b) as bigint)"
        "  )))"
        ")"
    )
    packed = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    last = packed.select(
        "n_days", F.element_at(F.expr(fold), -1).alias("s")
    )
    return last.select(
        "n_days",
        F.date_format("s.d", "yyyy-MM-dd").alias("last_day"),
        F.col("s.l").cast("long").alias("level_cents"),
        F.col("s.b").cast("long").alias("trend_cents"),
        (F.col("s.l") + F.lit(horizon) * F.col("s.b")).cast("long").alias(
            "forecast_cents"
        ),
    )


MASE_EXPR = (
    "case when sum_n > 0 and n_test > 0 then "
    "round((sum_f * 1e0 * n_pairs) / (n_test * 1e0 * sum_n), 4) end"
)


def seasonal_naive_mase(
    orders: DataFrame,
    season: int = 7,
    holdout: int = 7,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    cache: bool = True,
) -> DataFrame:
    """Forecast-quality evaluation by MASE (mean absolute scaled error,
    Hyndman & Koehler 2006) of the SEASONAL-NAIVE forecast — the
    benchmark every fancier model (EWMA/Holt) must beat before shipping:
    hold out the last ``holdout`` days, forecast each as the value
    ``season`` days earlier, and scale by the in-sample one-step naive
    MAE. MASE < 1 ⇔ better than the random-walk baseline.

    Integer-exact: daily revenue on the cents grid; both MAE numerators
    are integer |error| sums over keyed day self-joins (day-frame-sized,
    never fact-sized); the final ratio is one shared expression
    (``MASE_EXPR``). Returns one row
    ``(n_train, n_test, sum_f_cents, sum_n_cents, mase)``."""
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("dn"),
            "x",
        )
    )
    if cache:  # day-frame, four consumers
        daily = daily.persist()
    mx = daily.agg(F.max("dn").alias("dmax"))
    lab = daily.crossJoin(F.broadcast(mx)).select(
        "dn", "x", (F.col("dn") > F.col("dmax") - holdout).alias("is_test")
    )
    if cache:
        lab = lab.persist()
    test = lab.where("is_test").alias("t")
    fc = test.join(
        lab.alias("s"), F.col("t.dn") - season == F.col("s.dn")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.abs(F.col("t.x") - F.col("s.x"))).cast("long").alias("sum_f"),
    )
    train = lab.where(~F.col("is_test"))
    nv = train.alias("a").join(
        train.alias("b"), F.col("a.dn") - 1 == F.col("b.dn")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.abs(F.col("a.x") - F.col("b.x"))).cast("long").alias("sum_n"),
    )
    n_train = train.agg(F.count(F.lit(1)).cast("long").alias("n_train"))
    return (
        fc.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(n_train))
        .select(
            "n_train",
            "n_test",
            F.col("sum_f").alias("sum_f_cents"),
            F.col("sum_n").alias("sum_n_cents"),
            F.expr(MASE_EXPR).alias("mase"),
        )
    )


def _quintile_by_value(df: DataFrame, value_col: str, out_col: str) -> DataFrame:
    """Deterministic value-level quintile via the bucketed rank prefix
    sum: ``q(v) = (cnt_less · 5) div n + 1`` (min-rank rule — every row
    sharing a value gets the SAME quintile, so the label is joinable by
    value; documented divergence from NTILE, which splits ties). Returns
    ``(v, out_col)``."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ranked_value_counts,
    )

    ranked = ranked_value_counts(df.select(F.col(value_col)), value_col)
    tot = ranked.agg(F.sum("c_all").cast("long").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.col("v"),
            (F.expr("cnt_less * 5 div n") + 1).cast("int").alias(out_col),
        )
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    amount_col: str = "value",
    purchase_pred: Column | None = None,
) -> DataFrame:
    """RFM customer segmentation — the classic BI scoring (recency /
    frequency / monetary quintiles 1..5) — built WITHOUT any data-grain
    window: each axis collapses to its distinct-value frame, gets a
    deterministic min-rank quintile from the bucketed rank prefix sum
    (:func:`_quintile_by_value`), and joins back to the customer frame BY
    VALUE (ties share a label, so the join is well-defined). Output is
    the segment summary ``(r_q, f_q, m_q, n_customers, total_cents)`` —
    at most 125 rows.

    Scale: one keyed collapse of the fact table to customer grain, three
    distinct-value quintile frames (each with only the 1024-row bounded
    offset window), three value-keyed joins, one segment aggregation."""
    pred = purchase_pred if purchase_pred is not None else F.lit(True)
    per_user = (
        events.where(pred)
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.max(F.col(ts_col).cast("long")).cast("long").alias("rec"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col(amount_col) * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .persist()  # three quintile builds + the final join read it
    )
    rq = _quintile_by_value(per_user, "rec", "r_q")
    fq = _quintile_by_value(per_user, "freq", "f_q")
    mq = _quintile_by_value(per_user, "cents", "m_q")
    # value-KEYED joins (not broadcasts): the quintile frames scale with
    # the distinct recency/cents values — customer-sized at 100 TB
    labeled = (
        per_user.join(rq.withColumnRenamed("v", "rec"), "rec")
        .join(fq.withColumnRenamed("v", "freq"), "freq")
        .join(mq.withColumnRenamed("v", "cents"), "cents")
    )
    return labeled.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


def _cusum_segment(daily: DataFrame, label: str) -> DataFrame:
    """One CUSUM pass over a (d, x) day frame: 1-row
    ``(segment, n_days, day_at_max, cusum_stat)`` with the division-free
    integer maximization of :func:`cusum_changepoint`."""
    from pyspark.sql.window import Window as W

    dec = "decimal(38,0)"
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = daily.select(
        "d",
        F.sum(F.col("x").cast(dec)).over(w).alias("cum_d"),
        F.count(F.lit(1)).over(w).cast("long").alias("t_idx"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s_d"),
    )
    scored = (
        cum.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            "c.d",
            "t.n",
            F.col("t.s_d").alias("s_d"),
            F.abs(
                F.col("c.cum_d") * F.col("t.n") - F.col("t.s_d") * F.col("c.t_idx")
            ).alias("dt_d"),
        )
        .persist()
    )
    best = scored.agg(F.max("dt_d").alias("dmax_d"))
    return (
        scored.alias("s")
        .join(F.broadcast(best).alias("b"), F.col("s.dt_d") == F.col("b.dmax_d"))
        .groupBy()
        .agg(
            F.max("s.n").cast("long").alias("n"),
            F.date_format(F.min("s.d"), "yyyy-MM-dd").alias("day_at_max"),
            F.max("s.dt_d").cast("double").alias("dmax"),
            F.max(F.col("s.s_d").cast("double")).alias("s"),
        )
        .select(
            F.lit(label).alias("segment"),
            F.col("n").alias("n_days"),
            "day_at_max",
            F.expr(CUSUM_STAT_EXPR).alias("cusum_stat"),
        )
    )


def binary_segmentation_changepoints(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Two-level binary segmentation (the standard multiple-changepoint
    scheme): the CUSUM argmax splits the daily series, then each half is
    scanned again — three candidate changepoints ranked by their own
    segments' statistics, where the single-pass
    :func:`cusum_changepoint` reports only the strongest. Every pass
    runs on the calendar-bounded day frame; the level-0 split day is a
    1-row eagerly localCheckpoint-ed frame (it gates BOTH halves — the
    two-branch lineage cut, the BPE discipline). Returns three rows
    ``(segment ∈ full/left/right, n_days, day_at_max, cusum_stat)``."""
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .persist()
    )
    full = _cusum_segment(daily, "full").localCheckpoint(eager=True)
    cp = full.select(F.to_date("day_at_max").alias("cp_day"))
    left = daily.crossJoin(F.broadcast(cp)).where(
        F.col("d") <= F.col("cp_day")
    ).select("d", "x")
    right = daily.crossJoin(F.broadcast(cp)).where(
        F.col("d") > F.col("cp_day")
    ).select("d", "x")
    return full.unionByName(_cusum_segment(left, "left")).unionByName(
        _cusum_segment(right, "right")
    )


def split_conformal_daily(
    orders: DataFrame,
    alpha_pct: int = 10,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Split-conformal prediction interval for the daily-revenue OLS
    trend (Vovk et al.; the distribution-free uncertainty wrapper modern
    forecasting ships): fit the closed-form trend on the first 70% of
    days, take the ceil((1−α)(n_cal+1))-th smallest absolute residual on
    the next 15% as the conformal radius q, and report the EMPIRICAL
    coverage of ``prediction ± q`` on the final 15% — finite-sample
    ≥ 1−α coverage guaranteed if the split is exchangeable, and the
    report shows exactly what materialized.

    Engine-exact: the trend comes from DECIMAL(38,0) integer moments
    (shared expressions → identical b0/b1 doubles); per-day residuals
    round onto the cents grid BEFORE the rank selection and the coverage
    compare, so quantile and coverage are pure integer decisions. All
    frames are day-level (bounded windows). Returns one row
    ``(n_train, n_cal, n_test, q_cents, n_covered, coverage)``."""
    dec = "decimal(38,0)"
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"))
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("t"),
            "x",
        )
        .persist()
    )
    b = daily.agg(
        F.min("t").alias("tmin"), F.max("t").alias("tmax")
    )
    # value-based day cuts: train <= c1, cal in (c1, c2], test > c2
    lab = daily.crossJoin(F.broadcast(b)).select(
        "t",
        "x",
        F.expr("tmin + (tmax - tmin) * 70 div 100").alias("c1"),
        F.expr("tmin + (tmax - tmin) * 85 div 100").alias("c2"),
    )
    train = lab.where(F.col("t") <= F.col("c1"))
    mom = train.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("t").cast(dec)).alias("st_d"),
        F.sum(F.col("x").cast(dec)).alias("sx_d"),
        F.sum(F.col("t").cast(dec) * F.col("t")).alias("stt_d"),
        F.sum(F.col("t").cast(dec) * F.col("x")).alias("stx_d"),
    ).select(
        "n",
        *[
            F.col(f"{c}_d").cast("double").alias(c)
            for c in ("st", "sx", "stt", "stx")
        ],
    )
    b1 = "((n * 1e0 * stx - st * 1e0 * sx) / (n * 1e0 * stt - st * 1e0 * st))"
    b0 = f"((sx - {b1} * st) / n)"
    resid_u = f"cast(round(abs(x - ({b0} + {b1} * t))) as bigint)"
    scored = lab.crossJoin(F.broadcast(mom)).select(
        "t", "x", "c1", "c2", F.expr(resid_u).alias("r_u")
    ).persist()
    cal = scored.where((F.col("t") > F.col("c1")) & (F.col("t") <= F.col("c2")))
    # exact k-th smallest calibration residual, k = ceil((1-a)(n_cal+1))
    from pyspark.sql.window import Window as W

    w = W.orderBy("r_u").rowsBetween(W.unboundedPreceding, W.currentRow)
    cal_cum = cal.groupBy("r_u").agg(F.count(F.lit(1)).cast("long").alias("c")) \
        .select("r_u", F.sum("c").over(w).alias("cum"))
    n_cal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    q = (
        cal_cum.crossJoin(F.broadcast(n_cal))
        .where(
            F.col("cum")
            >= F.expr(f"cast(ceil((100 - {alpha_pct}) * 1e0 * (n_cal + 1) / 100) as bigint)")
        )
        .agg(F.min("r_u").cast("long").alias("q_cents"))
    )
    test = scored.where(F.col("t") > F.col("c2"))
    cov = (
        test.crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("r_u") <= F.col("q_cents")).cast("long"))
            .cast("long")
            .alias("n_covered"),
            F.max("q_cents").cast("long").alias("q_cents"),
        )
    )
    n_train = mom.select(F.col("n").alias("n_train"))
    return (
        n_train.crossJoin(F.broadcast(n_cal))
        .crossJoin(F.broadcast(cov))
        .select(
            "n_train",
            "n_cal",
            "n_test",
            "q_cents",
            "n_covered",
            (F.expr("n_covered * 1000000 div n_test") / 1e6).alias("coverage"),
        )
    )


CCF_R_EXPR = (
    "round((pk - sy / n * ak - sx / n * bk + npairs * (sx / n) * (sy / n)) / "
    "sqrt((qx - sx / n * sx) * (qy - sy / n * sy)), 4)"
)


def ccf_revenue_vs_orders(
    orders: DataFrame,
    max_lag: int = 3,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    cache: bool = True,
) -> DataFrame:
    """Cross-correlation function between daily revenue (cents) and
    daily order COUNT at lags −max_lag..+max_lag — the lead/lag
    diagnostic ACF can't give (does volume lead value, or the reverse?).
    Same day-frame shape as :func:`acf_daily_revenue`: exact
    DECIMAL(38,0) sufficient statistics per lag via ONE keyed self-join
    after a (2·max_lag+1)× map-side explode; the only doubles are the
    shared ``CCF_R_EXPR`` on identical operands. Returns one row per lag
    ``(k, npairs, r)`` (positive k: revenue at t vs count at t+k)."""
    dec = "decimal(38,0)"
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("x"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
        .select(
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("dn"),
            "x",
            "y",
        )
    )
    if cache:
        daily = daily.persist()
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx_d"),
        F.sum(F.col("y").cast(dec)).alias("sy_d"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("qx_d"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("qy_d"),
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(-max_lag, max_lag + 1)])
    ).alias("k")
    left = daily.select(F.col("dn"), F.col("x").alias("xt"), lags)
    pairs = left.join(
        daily.select(F.col("dn").alias("_dn2"), F.col("y").alias("yk")),
        left["dn"] + F.col("k") == F.col("_dn2"),
    )
    per_lag = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("npairs"),
        F.sum(F.col("xt").cast(dec) * F.col("yk")).alias("pk_d"),
        F.sum(F.col("xt").cast(dec)).alias("ak_d"),
        F.sum(F.col("yk").cast(dec)).alias("bk_d"),
    )
    final = (
        per_lag.alias("l")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            F.col("l.k").cast("int").alias("k"),
            "l.npairs",
            F.col("l.pk_d").cast("double").alias("pk"),
            F.col("l.ak_d").cast("double").alias("ak"),
            F.col("l.bk_d").cast("double").alias("bk"),
            "t.n",
            F.col("t.sx_d").cast("double").alias("sx"),
            F.col("t.sy_d").cast("double").alias("sy"),
            F.col("t.qx_d").cast("double").alias("qx"),
            F.col("t.qy_d").cast("double").alias("qy"),
        )
    )
    return final.select("k", "npairs", F.expr(CCF_R_EXPR).alias("r"))


def stl_lite_daily(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    period: int = 7,
) -> DataFrame:
    """STL-lite additive decomposition of the daily revenue series:
    ``y = trend + seasonal + remainder`` — the classical decomposition
    (Cleveland's STL with one pass and a moving-average trend): trend is
    the centered ``period``-day moving average (full windows only),
    seasonal is the day-of-week mean of the detrended series (normalized
    to sum to zero over the cycle the way STL does), remainder is the
    rest.

    Exactness: everything lives on the integer micro-cents grid.
    ``trend_u = (Σ_{±3} cents · 1e6) div period`` (positive operands →
    identical in both engines); the detrended values can be NEGATIVE, so
    the seasonal mean uses the engine-portable FLOOR division
    ``(a − posmod(a, b)) / b`` (the :func:`theil_sen_trend` identity —
    Spark's ``div`` truncates toward zero, DuckDB's ``//`` floors;
    dividend-signed ``%`` matches, so posmod closes the gap). The
    returned trend/seasonal/remainder are the micro values divided by
    1e6 — an identity round both engines.

    Plan: fact rows collapse once to the calendar-bounded day frame
    (persisted: the rolling window, seasonal join and final projection
    all read it); the rolling window and dow means are day-frame
    windows/aggregations (bounded — licensed class). Gaps in the
    calendar make the "centered 7 rows" window span >7 calendar days;
    the day frame here is dense (TPC-H order dates), and the operator
    documents row-centered (not calendar-centered) semantics.

    Returns one row per day with a full trend window:
    ``(d_iso, revenue, trend, seasonal, remainder)``.
    """
    joined, caches = _stl_micro_daily(orders, date_col, amount_col, period)
    out = joined.select(
        F.date_format("d", "yyyy-MM-dd").alias("d_iso"),
        (F.col("cents") / 100).cast("double").alias("revenue"),
        (F.col("trend_u") / 1e6 / 100).cast("double").alias("trend"),
        (F.col("seas_u") / 1e6 / 100).cast("double").alias("seasonal"),
        (
            (F.col("det_u") - F.col("seas_u")) / 1e6 / 100
        ).cast("double").alias("remainder"),
    )
    out._stage_caches = caches
    return out


def _stl_micro_daily(
    orders: DataFrame, date_col: str, amount_col: str, period: int
):
    """The STL-lite integer micro pipeline shared by the decomposition
    (:func:`stl_lite_daily`) and the strength indices
    (:func:`stl_strength_daily`): returns the per-day frame with exact
    micro-cents columns ``(d, cents, dow, trend_u, det_u, seas_u)`` plus
    the caller-owned persist list."""
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("cents"))
        .persist()
    )
    half = period // 2
    w = Window.orderBy("d").rowsBetween(-half, half)
    trended = daily.select(
        "d",
        "cents",
        F.sum("cents").over(w).alias("_s7"),
        F.count("cents").over(w).alias("_n7"),
        F.expr("pmod(datediff(d, date '1970-01-01'), 7)").cast("int").alias("dow"),
    ).where(F.col("_n7") == period)
    # trend on the micro grid; detrended may be negative
    trended = trended.select(
        "d",
        "cents",
        "dow",
        F.expr(f"(_s7 * 1000000) div {period}").alias("trend_u"),
    ).withColumn(
        "det_u", F.col("cents") * F.lit(1_000_000) - F.col("trend_u")
    ).persist()
    # per-dow mean of detrended (portable floor division), then zero-center
    # the cycle: seasonal components sum to 0 over the period (STL contract)
    dowsum = trended.groupBy("dow").agg(
        # accumulate in DECIMAL(38,0) (oracle HUGEINT): detrended
        # micro-cents can be ±1e15+ at replica scale and a BIGINT sum
        # could overflow mid-accumulation; the FINAL per-dow sum is a
        # near-zero-mean deviation total that fits BIGINT
        F.sum(F.col("det_u").cast("decimal(38,0)")).cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # integer `div` (never double `/` — at >2^53 an exact-multiple double
    # division can truncate to k−1 after cast)
    dowmean = dowsum.select(
        "dow",
        F.expr("(s - (((s % c) + c) % c)) div c").cast("long").alias("m_u"),
    )
    tot = dowmean.agg(
        F.sum("m_u").cast("long").alias("ms"),
        F.count(F.lit(1)).cast("long").alias("mc"),
    )
    seasonal = (
        dowmean.alias("a")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            "a.dow",
            F.expr(
                "a.m_u - ((t.ms - (((t.ms % t.mc) + t.mc) % t.mc)) div t.mc)"
            ).cast("long").alias("seas_u"),
        )
    )
    joined = trended.join(F.broadcast(seasonal), "dow")
    return joined, [daily, trended]


#: tsfeatures strength indices over exact integer quadratics: with
#: population-variance numerators n·Σx² − (Σx)² (the n and micro scales
#: cancel in the ratio), F_T = max(0, 1 − V(remainder)/V(deseasonalized))
#: and F_S = max(0, 1 − V(remainder)/V(detrended)). Degenerate zero
#: denominators → NULL on both engines.
STL_FT_EXPR = (
    "case when n * 1e0 * eq - es * es > 0e0 then "
    "round(greatest(0e0, 1e0 - (n * 1e0 * rq - rs * rs) "
    "/ (n * 1e0 * eq - es * es)), 4) end"
)
STL_FS_EXPR = (
    "case when n * 1e0 * dq - ds2 * ds2 > 0e0 then "
    "round(greatest(0e0, 1e0 - (n * 1e0 * rq - rs * rs) "
    "/ (n * 1e0 * dq - ds2 * ds2)), 4) end"
)


def stl_strength_daily(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    period: int = 7,
) -> DataFrame:
    """Trend and seasonal STRENGTH of the daily revenue series — the
    tsfeatures/forecasting-workbench one-number summaries of the STL
    decomposition (Hyndman): F_T = max(0, 1 − Var(R)/Var(T+R)) and
    F_S = max(0, 1 − Var(R)/Var(S+R)), both in [0, 1] — "how much of the
    deseasonalized movement the trend explains" and "how much of the
    detrended movement the weekly cycle explains". The alerting layer
    over :func:`stl_lite_daily`: a seasonal-strength collapse between
    snapshots means the weekly rhythm broke.

    Exactness: the three series (remainder, deseasonalized = cents·1e6 −
    seas_u, detrended = det_u) are exact micro-cents INTEGERS from the
    shared STL pipeline; their sums and squares accumulate in
    DECIMAL(38,0) (oracle HUGEINT), and the variance ratios are shared
    expressions where n and the micro scale cancel. One aggregation over
    the decomposition frame. Returns one row
    ``(n_days, trend_strength, seasonal_strength)``.
    """
    dec = "decimal(38,0)"
    joined, caches = _stl_micro_daily(orders, date_col, amount_col, period)
    series = joined.select(
        (F.col("det_u") - F.col("seas_u")).cast(dec).alias("r"),
        (F.col("cents").cast(dec) * 1_000_000 - F.col("seas_u")).alias("e"),
        F.col("det_u").cast(dec).alias("dd"),
    )
    scal = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").alias("rs_d"),
        F.sum(F.col("r") * F.col("r")).alias("rq_d"),
        F.sum("e").alias("es_d"),
        F.sum(F.col("e") * F.col("e")).alias("eq_d"),
        F.sum("dd").alias("ds_d"),
        F.sum(F.col("dd") * F.col("dd")).alias("dq_d"),
    )
    out = scal.select(
        "n",
        F.col("rs_d").cast("double").alias("rs"),
        F.col("rq_d").cast("double").alias("rq"),
        F.col("es_d").cast("double").alias("es"),
        F.col("eq_d").cast("double").alias("eq"),
        F.col("ds_d").cast("double").alias("ds2"),
        F.col("dq_d").cast("double").alias("dq"),
    ).select(
        F.col("n").alias("n_days"),
        F.expr(STL_FT_EXPR).alias("trend_strength"),
        F.expr(STL_FS_EXPR).alias("seasonal_strength"),
    )
    out._stage_caches = caches
    return out


#: Runs-test z over all-integer state: n1/n2 the sign counts, r the run
#: count; E[R] = 1 + 2n1n2/n, Var[R] = 2n1n2(2n1n2 − n)/(n²(n−1)).
RUNS_Z_EXPR = (
    "round((r - (1e0 + 2e0 * n1 * n2 / (n1 + n2)))"
    " / sqrt(2e0 * n1 * n2 * (2e0 * n1 * n2 - (n1 + n2))"
    " / ((n1 + n2) * 1e0 * (n1 + n2) * ((n1 + n2) - 1e0))), 4)"
)


def runs_test_daily(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series: are the
    above/below-median days RANDOMLY ordered, or do they clump (trend /
    regime persistence) or alternate (over-dispersion)? The
    order-sensitivity companion to :func:`..functions.rankstats.
    mann_kendall_keyed` — MK asks "monotone trend?", runs asks "any
    serial structure at all?".

    Exactness: the dichotomization cut is the day frame's lower-middle
    median cents value (exact order statistic via the in-frame rank —
    the day frame is calendar-bounded, so its windows are the licensed
    day-frame class); equal-to-median days count as BELOW (documented
    convention). The run count ``r = 1 + Σ 1[s_t ≠ s_{t−1}]`` comes from
    ONE day-ordered lag window; n1/n2/r are exact BIGINTs and z is the
    shared expression. Returns ``(n1, n2, r, z)``.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("cents"))
        .persist()
    )
    w_rank = Window.orderBy("cents", "d")
    n_tot = daily.count()
    med_rank = (n_tot + 1) // 2
    med = (
        daily.select(F.col("cents"), F.row_number().over(w_rank).alias("_rn"))
        .where(F.col("_rn") == med_rank)
        .select(F.col("cents").alias("med_c"))
    )
    w_day = Window.orderBy("d")
    signs = (
        daily.crossJoin(F.broadcast(med))
        .select("d", (F.col("cents") > F.col("med_c")).cast("int").alias("s"))
        .select(
            "s",
            (F.col("s") != F.lag("s").over(w_day)).cast("long").alias("chg"),
        )
    )
    out = signs.agg(
        F.sum(F.col("s").cast("long")).cast("long").alias("n1"),
        F.sum((1 - F.col("s")).cast("long")).cast("long").alias("n2"),
        (F.coalesce(F.sum("chg"), F.lit(0)) + 1).cast("long").alias("r"),
    ).select("n1", "n2", "r", F.expr(RUNS_Z_EXPR).alias("z"))
    out._stage_caches = [daily]
    return out


# ---------------------------------------------------------------------------
# Pettitt change-point test (rank-based single change point).
# ---------------------------------------------------------------------------

#: Approximate two-sided significance of K = max|U_t| (Pettitt 1979):
#: p ≈ 2·exp(−6K² / (n³ + n²)), capped at 1.
PETTITT_P_EXPR = (
    "round(least(1e0, 2e0 * exp(-6e0 * k_u * k_u"
    " / (n * 1e0 * n * n + n * 1e0 * n))), 4)"
)


def pettitt_change_point(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Pettitt's nonparametric change-point test on the daily revenue
    series: WHERE does the distribution shift, and is the shift
    significant? The localization companion to
    :func:`~..functions.rankstats.mann_kendall_keyed` (MK says "is there
    a trend"; Pettitt says "the regime changed after day τ").

    Exactness: with full-series doubled midranks ``r2 = 2·cnt_less +
    c_eq + 1`` (day-frame windows, the licensed calendar-bounded class),
    the Mann-Whitney-ish statistic telescopes to the integer prefix sum

        U_t = Σ_{i≤t} r2_i − t·(n+1)

    (verified: equals Σ_{i≤t}Σ_{j>t} sgn(x_i − x_j), ties contributing
    0). K = max|U_t| with the earliest day as tie-break; the only double
    is the shared ``PETTITT_P_EXPR`` significance. Returns one row
    ``(n, k_u, change_day, p_approx)`` — ``change_day`` is the LAST day
    of the pre-change regime.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("cents"))
        .persist()
    )
    w_rank = Window.orderBy("cents")
    w_eq = Window.partitionBy("cents")
    w_day = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_t = Window.orderBy("d")
    ranked = daily.select(
        "d",
        (
            2 * (F.rank().over(w_rank) - 1) + F.count(F.lit(1)).over(w_eq) + 1
        ).cast("long").alias("r2"),
    )
    n1 = daily.count() + 1
    u = ranked.select(
        "d",
        (
            F.sum("r2").over(w_day) - F.row_number().over(w_t).cast("long") * n1
        ).alias("u_t"),
    )
    best = (
        u.orderBy(F.abs(F.col("u_t")).desc(), F.col("d").asc())
        .limit(1)
        .select(
            F.lit(n1 - 1).cast("long").alias("n"),
            F.abs(F.col("u_t")).cast("long").alias("k_u"),
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
        )
    )
    out = best.select(
        "n", "k_u", "change_day", F.expr(PETTITT_P_EXPR).alias("p_approx")
    )
    out._stage_caches = [daily]
    return out


# ---------------------------------------------------------------------------
# Cox-Stuart trend test (sign test on half-offset pairs).
# ---------------------------------------------------------------------------

#: Sign-test normal approximation over effective (non-tied) pairs:
#: z = (2·s_plus − m) / sqrt(m).
COX_STUART_Z_EXPR = "round((2e0 * s_plus - m) / sqrt(m * 1e0), 4)"


def cox_stuart_trend(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Cox-Stuart trend test on daily revenue: pair day i with day
    i + ⌈n/2⌉ (odd-length series drop the middle day) and sign-test the
    differences — the assumption-free quick check beside the rank-based
    :func:`~..functions.rankstats.mann_kendall_keyed` (Cox-Stuart
    trades power for an exact binomial null and O(n) work: no pair
    join at all, one half-offset self-join on the day index).

    Ties (equal cents) drop from the effective count m. All counts are
    exact BIGINTs; z is the shared expression. Returns
    ``(n_days, m, s_plus, z)``.
    """
    daily = (
        orders.groupBy(F.col(date_col).cast("date").alias("d"))
        .agg(F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("cents"))
        .persist()
    )
    w_t = Window.orderBy("d")
    idx = daily.select(
        (F.row_number().over(w_t) - 1).cast("long").alias("i"), "cents"
    ).persist()
    n = idx.count()
    half = (n + 1) // 2  # offset; odd n leaves the middle unpaired
    pairs = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            F.col("b.i") == F.col("a.i") + half,
        )
        .select(
            (F.col("b.cents") > F.col("a.cents")).cast("long").alias("up"),
            (F.col("b.cents") != F.col("a.cents")).cast("long").alias("eff"),
        )
    )
    out = (
        pairs.agg(
            F.lit(n).cast("long").alias("n_days"),
            F.sum("eff").cast("long").alias("m"),
            F.sum("up").cast("long").alias("s_plus"),
        )
        .select("n_days", "m", "s_plus", F.expr(COX_STUART_Z_EXPR).alias("z"))
    )
    out._stage_caches = [daily, idx]
    return out


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau test over the ACF.
# ---------------------------------------------------------------------------

#: Q = n(n+2)·Σ r_k²/(n−k) from the 1e-12-grid per-lag term sum.
LJUNG_BOX_Q_EXPR = "round(n * 1e0 * (n + 2e0) * lb_u / 1e12, 4)"


def ljung_box_daily(
    orders: DataFrame,
    max_lag: int = 7,
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Ljung-Box portmanteau test of the daily revenue series: are the
    first ``max_lag`` autocorrelations JOINTLY zero? The one-number
    is-there-any-serial-structure readout that summarizes the
    :func:`acf_daily_revenue` panel (χ²_{max_lag} under H0 — white
    noise); quote it before trusting i.i.d.-assuming statistics on the
    series.

    Built ON the ACF: per-lag r_k are the shared ``ACF_R_EXPR`` doubles
    (already 4-decimal-rounded, bit-identical cross-engine); each term
    ``r_k²/(n−k)`` snaps to the 1e-12 grid (floor(x+0.5) — magnitudes
    ≤ 1) and the ≤ max_lag-row sum is BIGINT. Returns one row
    ``(n, m, q_stat)``.
    """
    # include_n rides the day count out of the ACF's own totals frame —
    # no second fact scan / groupBy just for n (ADVICE r8).
    acf = acf_daily_revenue(orders, max_lag, date_col, amount_col, include_n=True)
    term_u = F.floor(
        F.col("r") * F.col("r") / (F.col("n") - F.col("k")) * 1e12 + 0.5
    ).cast("long")
    scal = acf.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(term_u).cast("long").alias("lb_u"),
    )
    return scal.select("n", "m", F.expr(LJUNG_BOX_Q_EXPR).alias("q_stat"))


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration per segment.
# ---------------------------------------------------------------------------


def hhi_by_group(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    weight_cents: Column | None = None,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group: HHI =
    Σ_entities share² ∈ (0, 1] — the is-this-segment-dominated-by-few
    readout (the BI sibling of ``gini_customer_spend``'s inequality
    curve: HHI reads concentration straight off squared shares, no
    ordering at all — so unlike Gini it needs NO rank windows).

    Shares come from exact integer weights (``weight_cents`` BIGINT
    cents, or row counts); per-entity share² terms snap to the 1e-9
    grid (floor(x+0.5), identical both engines) and sum as BIGINTs.
    Two keyed aggregations, both map-side combinable; the entity frame
    is the only state. Returns ``(group, n_entities, hhi)``.
    """
    w = weight_cents if weight_cents is not None else F.lit(1).cast("long")
    per_entity = (
        df.select(
            F.col(group_col).alias("g"), F.col(entity_col).alias("e"), w.alias("_w")
        )
        .groupBy("g", "e")
        .agg(F.sum("_w").cast("long").alias("w"))
        .persist()  # two consumers (group totals + share terms)
    )
    totals = per_entity.groupBy("g").agg(F.sum("w").cast("long").alias("tw"))
    terms = per_entity.join(F.broadcast(totals), "g").select(
        "g",
        F.floor(
            (F.col("w") * 1.0 / F.col("tw")) * (F.col("w") * 1.0 / F.col("tw")) * 1e9
            + 0.5
        ).cast("long").alias("t_u"),
    )
    out = (
        terms.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_entities"),
            F.round(F.sum("t_u").cast("double") / 1e9, 4).alias("hhi"),
        )
    )
    out._stage_caches = [per_entity]
    return out

