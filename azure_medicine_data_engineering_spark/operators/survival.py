"""Distributed survival analysis: time-to-event extraction, the
Kaplan-Meier product-limit estimator, and the two-group log-rank test.

Scale extension of the reference's medical-statistics layer (the
hypothesis-testing battery in ``notebooks/PhdProject/main Statistical
Analysis/Hypothesis testing R.r`` runs driver-local R tests; survival
curves are the canonical next panel in that clinical workflow) —
re-expressed as Spark plans that stay aggregated: every window runs over
the day-level summary frame (bounded by the observation window, ~30 rows
here), never over subject-level data.

Engine-exactness: risk sets, event counts and censor counts are exact
BIGINTs from one keyed aggregation. The KM survival product is carried as
an integer micro-unit log sum (``round(ln((n_risk - d)/n_risk) * 1e6)``,
the repo's LM-scorer convention) so the cumulative product is order-free
and bit-identical cross-engine; log-rank expectation/variance terms round
into micro-units per time point before summing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

__all__ = ["time_to_event_days", "kaplan_meier", "logrank_2group"]

#: Shared finalization for the log-rank statistic — embedded verbatim in
#: the DuckDB oracle so both engines run the identical IEEE sequence.
LOGRANK_CHI2_EXPR = (
    "round((o1 - e1u / 1e6) * (o1 - e1u / 1e6) / (vu / 1e6), 4)"
)


def time_to_event_days(
    events: DataFrame,
    start_type: str = "signup",
    event_type: str = "purchase",
    group_type: str = "error",
    cache: bool = True,
) -> DataFrame:
    """Per-user time-to-event frame from an event log: duration in whole
    days from the user's first ``start_type`` event to their first
    ``event_type`` event at-or-after it (``ev = 1``), else censored at the
    user's last observed event (``ev = 0``). ``grp`` marks users who ever
    emitted a ``group_type`` event (the comparison stratum for
    :func:`logrank_2group`). Users with no ``start_type`` event are out of
    the study.

    Two user-keyed shuffles (profile aggregate + at-or-after event
    aggregate), no windows over raw rows. The user-profile frame feeds
    two consumers (the firing join and the final left join) and is
    persisted when ``cache=True`` — caller-owned lifecycle per repo
    convention.
    """
    et = F.col("event_type")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(et == start_type, F.col("ts"))).alias("start_ts"),
        F.max("ts").alias("last_ts"),
        F.max((et == group_type).cast("int")).cast("int").alias("grp"),
    )
    if cache:
        per_user = per_user.persist()
    firing = (
        events.filter(et == event_type)
        .join(per_user.select("user_id", "start_ts"), "user_id")
        .where(F.col("ts") >= F.col("start_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("event_ts"))
    )
    return (
        per_user.where(F.col("start_ts").isNotNull())
        .join(firing, "user_id", "left")
        .select(
            "user_id",
            "grp",
            F.when(
                F.col("event_ts").isNotNull(),
                F.datediff(F.col("event_ts").cast("date"), F.col("start_ts").cast("date")),
            )
            .otherwise(
                F.datediff(F.col("last_ts").cast("date"), F.col("start_ts").cast("date"))
            )
            .cast("int")
            .alias("t"),
            F.col("event_ts").isNotNull().cast("int").alias("ev"),
        )
    )


def kaplan_meier(tte: DataFrame, time_col: str = "t", event_col: str = "ev") -> DataFrame:
    """Kaplan-Meier product-limit table over a ``(time, event)`` frame:
    one row per distinct time with ``(t, n_risk, d, c, surv)``.

    ``n_risk`` is a suffix sum of removals (at-risk = everyone removed at
    or after ``t`` — no separate total pass); ``surv`` multiplies the
    ``(n_risk - d)/n_risk`` factors as integer micro-unit log sums. A time
    where the whole risk set fails pins ``surv`` (and all later rows) to
    exactly 0. Both windows run over the day-level summary frame
    (bounded by the observation span; audit-licensed).
    """
    at_t = tte.groupBy(F.col(time_col).alias("t")).agg(
        F.sum(F.col(event_col)).cast("long").alias("d"),
        F.sum(1 - F.col(event_col)).cast("long").alias("c"),
    )
    w_risk = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_risk = at_t.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(w_risk).alias("n_risk")
    )
    lnu = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(
            F.log((F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double")) * 1e6
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    dead = (F.col("d") >= F.col("n_risk")).cast("int")
    cum = with_risk.select(
        "t",
        "n_risk",
        "d",
        "c",
        F.sum(lnu).over(w_cum).alias("_lnu"),
        F.max(dead).over(w_cum).alias("_dead"),
    )
    surv = F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("_lnu") / 1e6), 4)
    )
    return cum.select("t", "n_risk", "d", "c", surv.alias("surv"))


def logrank_2group(
    tte: DataFrame,
    time_col: str = "t",
    event_col: str = "ev",
    group_col: str = "grp",
    cache: bool = True,
) -> DataFrame:
    """Two-group log-rank test over a ``(time, event, group)`` frame
    (group 1 vs group 0). Returns one row
    ``(n1, n0, o1, e1, chi2)`` — observed vs expected group-1 events and
    the chi-square statistic.

    Per-time expectation ``d_t * n1_t / n_t`` and hypergeometric variance
    round into integer micro-units before the global sum (order-free);
    group-level at-risk counts come from suffix sums over the per-group
    day frame (windows keyed by group, each side bounded by the
    observation span).

    ``tte`` (two consumers: the day/group aggregate and the group totals)
    and the day/group frame ``g`` (three consumers: both spine sides and
    the fill join) persist when ``cache=True`` — caller-owned lifecycle.
    """
    if cache:
        tte = tte.persist()
    g = tte.groupBy(
        F.col(time_col).alias("t"), F.col(group_col).alias("g")
    ).agg(
        F.sum(F.col(event_col)).cast("long").alias("d_g"),
        F.count(F.lit(1)).cast("long").alias("rm_g"),
    )
    if cache:
        g = g.persist()
    spine = (
        g.select("t").distinct().alias("ts")
        .crossJoin(F.broadcast(g.select("g").distinct()).alias("gs"))
        .select("ts.t", "gs.g")
    )
    full = spine.join(g, ["t", "g"], "left").select(
        "t",
        "g",
        F.coalesce("d_g", F.lit(0)).cast("long").alias("d_g"),
        F.coalesce("rm_g", F.lit(0)).cast("long").alias("rm_g"),
    )
    w_risk = (
        Window.partitionBy("g").orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = full.select(
        "t", "g", "d_g", F.sum("rm_g").over(w_risk).alias("n_g")
    )
    by_t = risk.groupBy("t").agg(
        F.max(F.when(F.col("g") == 1, F.col("d_g"))).cast("long").alias("d1"),
        F.max(F.when(F.col("g") == 0, F.col("d_g"))).cast("long").alias("d0"),
        F.max(F.when(F.col("g") == 1, F.col("n_g"))).cast("long").alias("n1t"),
        F.max(F.when(F.col("g") == 0, F.col("n_g"))).cast("long").alias("n0t"),
    )
    d_t = F.col("d1") + F.col("d0")
    n_t = F.col("n1t") + F.col("n0t")
    e1 = d_t * 1.0 * F.col("n1t") / n_t
    v = F.when(
        n_t > 1,
        (d_t * 1.0 * F.col("n1t") / n_t)
        * (F.col("n0t") * 1.0 / n_t)
        * (n_t - d_t)
        / (n_t - 1),
    ).otherwise(F.lit(0.0))
    scal = by_t.where(n_t > 0).agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum(F.round(e1 * 1e6).cast("long")).cast("long").alias("e1u"),
        F.sum(F.round(v * 1e6).cast("long")).cast("long").alias("vu"),
    )
    totals = tte.groupBy().agg(
        F.sum(F.when(F.col(group_col) == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col(group_col) == 0, 1).otherwise(0)).cast("long").alias("n0"),
    )
    return (
        scal.alias("s")
        .crossJoin(F.broadcast(totals).alias("n"))
        .select(
            "n.n1",
            "n.n0",
            "s.o1",
            F.round(F.col("s.e1u") / 1e6, 4).alias("e1"),
            F.expr(LOGRANK_CHI2_EXPR).alias("chi2"),
        )
    )


def nelson_aalen(
    tte: DataFrame, time_col: str = "t", event_col: str = "ev"
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard table over a ``(time, event)``
    frame — the estimator quoted next to Kaplan-Meier (KM multiplies
    survival factors, NA sums hazard increments ``d_t/n_t``; at low
    hazard ``S ≈ exp(−H)``, and NA is the building block of
    hazard-ratio diagnostics). One row per distinct time with
    ``(t, n_risk, d, cumhaz)``.

    Same shape as :func:`kaplan_meier`: risk sets are suffix sums over
    the day-level summary frame; per-time increments round into integer
    micro-units so the cumulative sum is order-free and engine-exact."""
    at_t = tte.groupBy(F.col(time_col).alias("t")).agg(
        F.sum(F.col(event_col)).cast("long").alias("d"),
        F.sum(1 - F.col(event_col)).cast("long").alias("c"),
    )
    w_risk = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_risk = at_t.select(
        "t", "d", F.sum(F.col("d") + F.col("c")).over(w_risk).alias("n_risk")
    )
    inc_u = F.when(
        F.col("d") > 0,
        F.round(F.col("d") / F.col("n_risk").cast("double") * 1e6).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return with_risk.select(
        "t",
        "n_risk",
        "d",
        (F.sum(inc_u).over(w_cum) / 1e6).alias("cumhaz"),
    )


def rmst(
    tte: DataFrame, tau: int, time_col: str = "t", event_col: str = "ev"
) -> DataFrame:
    """Restricted mean survival time — the area under the Kaplan-Meier
    curve up to horizon ``tau`` (Royston & Parmar's recommended effect
    scale when hazards aren't proportional): ``RMST = Σ S(t_i)·(min(t_{i+1},τ)
    − t_i)`` over the KM step function, plus the leading ``S=1`` segment
    before the first observed time. The display-rounded ``surv`` steps
    (identical doubles on both engines) multiply integer day widths into
    micro-unit terms, so the area sum is order-free. Day-frame bounded
    (one lead window over the KM summary). Returns one row
    ``(tau, n_steps, rmst_days)``."""
    km = kaplan_meier(tte, time_col, event_col)
    w = Window.orderBy("t")
    stepped = km.select(
        "t",
        "surv",
        F.coalesce(F.lead("t").over(w), F.lit(tau)).alias("t_next"),
    )
    first_t = km.agg(F.min("t").cast("long").alias("t0"))
    seg_u = F.when(
        F.col("t") < tau,
        (
            F.least(F.col("t_next"), F.lit(tau)) - F.col("t")
        ).cast("long")
        * F.round(F.col("surv") * 1e6).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    area = stepped.agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum(seg_u).cast("long").alias("a_u"),
    )
    return (
        area.crossJoin(F.broadcast(first_t))
        .select(
            F.lit(tau).cast("long").alias("tau"),
            "n_steps",
            (
                (F.expr(f"least(cast(t0 as bigint), cast({tau} as bigint))") * 1000000
                 + F.col("a_u"))
                / 1e6
            ).alias("rmst_days"),
        )
    )
