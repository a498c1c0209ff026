"""Funnel / retention-cohort / SCD2 operator units (hand-computable)."""

from datetime import datetime

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.events_analytics import (
    funnel_counts,
    retention_cohorts,
)
from azure_medicine_data_engineering_spark.operators.scd2 import scd2_merge


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 converts fully in order
        (1, "view", 1, 0), (1, "click", 1, 1), (1, "purchase", 1, 2),
        # u2 clicked BEFORE viewing → reaches only stage 0
        (2, "click", 2, 0), (2, "view", 2, 1),
        # u3 views and clicks, never purchases
        (3, "view", 3, 0), (3, "click", 3, 1),
        # u4 purchase only → reaches nothing (no view)
        (4, "purchase", 4, 0),
    ]
    out = {
        r.stage: r.n_users
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_uses_earliest_threshold(spark):
    # u1's SECOND view is followed by a click, but the funnel measures from
    # the EARLIEST view — the click at hour 3 still counts (3 > 1)
    rows = [(1, "view", 1, 1), (1, "view", 1, 5), (1, "click", 1, 3)]
    out = {
        r.stage: r.n_users
        for r in funnel_counts(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert out == {"view": 1, "click": 1}


def test_retention_cohorts_offsets(spark):
    rows = [
        # u1 first event Tue Jan 2 → cohort week Mon Jan 1;
        # returns Jan 10 (offset 1) and Jan 16 (offset 2)
        (1, "view", 2, 0), (1, "view", 10, 0), (1, "view", 16, 0),
        # u2 first event Jan 9 → cohort week Jan 8, never returns
        (2, "view", 9, 0),
    ]
    out = {
        (r.cohort_week.isoformat(), r.week_offset): r.n_users
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_scd2_merge_four_fates(spark):
    current = spark.createDataFrame(
        [
            (1, "A", "2024-01-01", None, True),       # will change → close+reopen
            (2, "B", "2024-01-01", None, True),       # unchanged → survives
            (3, "X", "2023-01-01", "2024-01-01", False),  # history → untouched
            (3, "Y", "2024-01-01", None, True),       # open version of 3, unchanged
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (9, "NEW")], "k long, attr string"
    )
    out = scd2_merge(current, updates, "k", ["attr"], "2024-06-01")
    rows = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert rows == {
        (1, "A", "2024-01-01", "2024-06-01", False),
        (1, "A2", "2024-06-01", None, True),
        (2, "B", "2024-01-01", None, True),
        (3, "X", "2023-01-01", "2024-01-01", False),
        (3, "Y", "2024-01-01", None, True),
        (9, "NEW", "2024-06-01", None, True),
    }


def test_scd2_null_attr_values_compare_null_safe(spark):
    current = spark.createDataFrame(
        [(1, None, "2024-01-01", None, True)],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    # update carries the same NULL attr → no new version
    updates = spark.createDataFrame([(1, None)], "k long, attr string")
    out = scd2_merge(current, updates, "k", ["attr"], "2024-06-01").collect()
    assert len(out) == 1 and out[0].is_current


def test_scd2_plan_is_single_join(spark):
    from tests.test_plans import plan_of

    current = spark.range(100).select(
        F.col("id").alias("k"), F.lit("A").alias("attr"),
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = spark.range(10).select(
        F.col("id").alias("k"), F.lit("Z").alias("attr")
    )
    plan = plan_of(scd2_merge(current, updates, "k", ["attr"], "2024-06-01"))
    # the explode-of-fates design runs ONE join total — a union-per-fate
    # implementation would replay it once per branch ("Join type:" appears
    # once per join node in formatted explain detail sections)
    assert plan.count("Join type:") == 1, plan


def test_event_path_ngrams_planted(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        event_path_ngrams,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1 & 2: view > click > purchase; user 3: view > view > click
    for u, path in [(1, ["view", "click", "purchase"]),
                    (2, ["view", "click", "purchase"]),
                    (3, ["view", "view", "click"])]:
        for i, t in enumerate(path):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = [(r.path, r.cnt, r.rank) for r in event_path_ngrams(ev, n=3, top_k=5).collect()]
    assert got == [("view>click>purchase", 2, 1), ("view>view>click", 1, 2)]


def test_daily_revenue_anomalies_planted_spike(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        daily_revenue_anomalies,
    )

    rows = []
    base = dt.date(2024, 1, 1)
    # 10 flat days at $50,000 then one 10x spike
    for i in range(10):
        rows.append((i, base + dt.timedelta(days=i), 50_000.0))
    rows.append((10, base + dt.timedelta(days=10), 500_000.0))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.day: r for r in daily_revenue_anomalies(orders).collect()}
    assert not any(out[d].is_anomaly for d in sorted(out) if d != "2024-01-11")
    assert out["2024-01-11"].is_anomaly          # the spike flags
    assert out["2024-01-01"].n_window == 0       # first day: empty window
    assert not out["2024-01-02"].is_anomaly      # n < 3 -> never flags


def test_cohort_ltv_matrix_planted(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        cohort_ltv_matrix,
    )

    mon = dt.datetime(2024, 1, 1, 9)  # a Monday
    rows = [
        # user 1: first event week 0, purchases in week 0 and week 1
        (0, mon, 1, "view", 0.0),
        (1, mon + dt.timedelta(days=1), 1, "purchase", 10.5),
        (2, mon + dt.timedelta(days=8), 1, "purchase", 5.25),
        # user 2: same cohort, view only in week 1
        (3, mon + dt.timedelta(hours=1), 2, "view", 0.0),
        (4, mon + dt.timedelta(days=9), 2, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r.cohort_week, r.age_weeks): (r.n_active, r.revenue)
           for r in cohort_ltv_matrix(ev).collect()}
    assert got == {
        ("2024-01-01", 0): (2, 10.5),
        ("2024-01-01", 1): (2, 5.25),
    }


def test_linear_attribution_reconciles_to_the_cent(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.asof import linear_attribution

    t0 = dt.datetime(2024, 1, 1, 12)
    purchases = spark.createDataFrame(
        [(100, 1, t0, 1.00), (200, 2, t0, 0.05)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    clicks = spark.createDataFrame(
        [
            (1, 1, t0 - dt.timedelta(minutes=5)),
            (2, 1, t0 - dt.timedelta(minutes=10)),
            (3, 1, t0 - dt.timedelta(minutes=15)),
            (4, 2, t0 - dt.timedelta(minutes=1)),
            (5, 2, t0 - dt.timedelta(minutes=2)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rows = linear_attribution(purchases, clicks).collect()
    by_p = {}
    for r in rows:
        by_p.setdefault(r.purchase_id, []).append(r)
    # $1.00 over 3 touches: 34, 33, 33 cents; extra cent to the most recent
    a = sorted(by_p[100], key=lambda r: -r.alloc)
    assert [round(r.alloc, 2) for r in a] == [0.34, 0.33, 0.33]
    assert a[0].click_id == 1  # most recent click gets the remainder cent
    assert round(sum(r.alloc for r in by_p[100]), 2) == 1.00
    # 5 cents over 2 touches: 3 + 2
    assert sorted(round(r.alloc, 2) for r in by_p[200]) == [0.02, 0.03]


def test_theil_sen_resists_outlier_day(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        theil_sen_trend,
    )

    base = dt.date(2024, 1, 1)
    rows = []
    # clean +$10/day trend over 21 days, one wrecked day
    for i in range(21):
        rev = 1000.0 + 10.0 * i if i != 10 else 50_000.0
        rows.append((i, base + dt.timedelta(days=i), rev))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = theil_sen_trend(orders).collect()[0]
    assert r.n_pairs == 21 * 20 // 2
    # the median slope stays on the true +10/day trend despite the spike
    assert abs(r.slope_dollars_per_day - 10.0) < 0.5


def test_ols_trend_recovers_planted_slope(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        ols_daily_trend,
    )

    base = dt.date(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i), 1000.0 + 25.0 * i) for i in range(30)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    r = ols_daily_trend(orders).collect()[0]
    assert r.n_days == 30
    assert abs(r.slope_dollars_per_day - 25.0) < 0.1
    assert abs(r.intercept_dollars - 1000.0) < 2.0


def test_dow_seasonality_flat_series_indexes_to_one(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        day_of_week_seasonality,
    )

    base = dt.date(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=i), 500.0) for i in range(28)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = day_of_week_seasonality(orders).collect()
    assert len(out) == 7
    assert all(r.n_days == 4 and abs(r.seasonal_index - 1.0) < 1e-6 for r in out)


def test_seasonal_naive_mase_planted(spark):
    """Perfectly weekly-periodic series: the t-7 forecast is exact on the
    holdout, so MASE == 0; a constant series makes the naive denominator
    0 and the forecast numerator 0 (0/0 -> NULL, surfaced honestly)."""
    import datetime

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        seasonal_naive_mase,
    )

    base = datetime.date(2023, 1, 1)
    rows = []
    for i in range(28):  # 4 exact weekly cycles
        amount = [100.0, 110.0, 120.0, 130.0, 140.0, 150.0, 160.0][i % 7]
        rows.append((datetime.datetime.combine(base + datetime.timedelta(days=i),
                                               datetime.time()), amount))
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    r = seasonal_naive_mase(df).collect()[0]
    assert (r["n_train"], r["n_test"]) == (21, 7)
    assert r["sum_f_cents"] == 0 and r["mase"] == 0.0
    assert r["sum_n_cents"] > 0

    flat = spark.createDataFrame(
        [(datetime.datetime.combine(base + datetime.timedelta(days=i),
                                    datetime.time()), 100.0) for i in range(28)],
        "o_orderdate timestamp, o_totalprice double",
    )
    r2 = seasonal_naive_mase(flat).collect()[0]
    assert r2["sum_f_cents"] == 0 and r2["sum_n_cents"] == 0
    assert r2["mase"] is None


def test_rfm_segments_planted(spark):
    """20 users with hand-designed R/F/M values: quintile rule is
    q = cnt_less*5 div n + 1 per DISTINCT value (ties share labels);
    segment counts must sum back to the user count and the top segment
    must hold the top user."""
    import datetime

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        rfm_segments,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(20):
        # user u purchases (u+1) times, amount 10*(u+1), last at day u
        for k in range(u + 1):
            rows.append(
                (u, base + datetime.timedelta(days=u, hours=k), "purchase",
                 10.0 * (u + 1))
            )
        rows.append((u, base, "view", 1.0))  # non-purchase noise
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    seg = rfm_segments(
        df.select("user_id", F.col("ts").cast("long").alias("ts"),
                  "value", "event_type"),
        purchase_pred=F.col("event_type") == "purchase",
    ).collect()
    assert sum(r["n_customers"] for r in seg) == 20
    # user 19: max recency, max freq, max spend -> (5,5,5)
    top = {(r["r_q"], r["f_q"], r["m_q"]): r["n_customers"] for r in seg}
    assert (5, 5, 5) in top
    # all monotone together here: r_q == f_q == m_q for every user
    assert all(r["r_q"] == r["f_q"] == r["m_q"] for r in seg)
    # quintile rule: 20 users -> 4 per quintile on each axis
    per_q = {}
    for r in seg:
        per_q[r["r_q"]] = per_q.get(r["r_q"], 0) + r["n_customers"]
    assert per_q == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}


def test_binary_segmentation_planted_two_shifts(spark):
    """Series with two level shifts: level 0 finds the bigger break, the
    child segments recover the second one."""
    import datetime

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        binary_segmentation_changepoints,
    )

    base = datetime.date(2023, 1, 1)
    rows = []
    for i in range(90):
        amt = 100.0 if i < 30 else (500.0 if i < 60 else 120.0)
        rows.append(
            (datetime.datetime.combine(base + datetime.timedelta(days=i),
                                       datetime.time()), amt)
        )
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = {r["segment"]: r for r in binary_segmentation_changepoints(df).collect()}
    assert set(got) == {"full", "left", "right"}
    assert got["full"]["n_days"] == 90
    d_full = got["full"]["day_at_max"]
    # the strongest break is one of the two planted boundaries
    assert d_full in {"2023-01-30", "2023-02-28", "2023-01-29", "2023-03-01"}
    assert got["left"]["n_days"] + got["right"]["n_days"] == 90
    # each child finds a break INSIDE its own segment
    assert got["left"]["day_at_max"] <= d_full < got["right"]["day_at_max"]


def test_snapshot_diff_classes(spark):
    from azure_medicine_data_engineering_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, None), (5, "e")], "k long, v string"
    )
    got = {r["change"]: (r["n_rows"], r["key_checksum"]) for r in
           snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got["unchanged"] == (2, 1 + 4)   # NULL == NULL is null-safe
    assert got["changed"] == (1, 2)
    assert got["removed"] == (1, 3)
    assert got["added"] == (1, 5)


def test_split_conformal_coverage_on_planted_noise(spark):
    """Linear series with bounded +/-3-dollar noise: the conformal radius
    must cover ~90% of test days (finite-sample guarantee holds
    empirically on exchangeable noise), and a PERFECT line yields
    q == 0 with 100% coverage."""
    import datetime
    import random

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        split_conformal_daily,
    )

    rng = random.Random(9)
    base = datetime.date(2023, 1, 1)
    rows = []
    for i in range(200):
        amt = 500.0 + 2.0 * i + rng.randint(-300, 300) / 100.0
        rows.append(
            (datetime.datetime.combine(base + datetime.timedelta(days=i),
                                       datetime.time()), amt)
        )
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    r = split_conformal_daily(df, alpha_pct=10).collect()[0]
    assert r["n_train"] + r["n_cal"] + r["n_test"] == 200
    assert r["q_cents"] <= 600  # radius bounded by the noise scale
    assert r["coverage"] >= 0.8  # near-nominal on exchangeable noise

    exact = spark.createDataFrame(
        [
            (datetime.datetime.combine(base + datetime.timedelta(days=i),
                                       datetime.time()), 100.0 + 3.0 * i)
            for i in range(100)
        ],
        "o_orderdate timestamp, o_totalprice double",
    )
    r2 = split_conformal_daily(exact, alpha_pct=10).collect()[0]
    assert r2["q_cents"] == 0 and r2["coverage"] == 1.0


def test_bounce_rate_sessions_planted(spark):
    import datetime

    from azure_medicine_data_engineering_spark.operators.event_windows import (
        bounce_rate_daily,
    )

    t0 = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def ts(mins):
        return t0 + datetime.timedelta(minutes=mins)

    rows = [
        # u1: two events 10 min apart -> ONE session (not a bounce)
        (1, ts(0)), (1, ts(10)),
        # u1: another event 2h later -> second session, bounce
        (1, ts(130)),
        # u2: single event -> bounce
        (2, ts(5)),
        # u3: events exactly 30min apart: gap == 1800 NOT > 1800 -> one session
        (3, ts(0)), (3, ts(30)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: r for r in bounce_rate_daily(df).collect()}
    r = got["2024-03-01"]
    assert r["n_sessions"] == 4
    assert r["n_bounces"] == 2
    assert r["bounce_rate"] == 0.5
