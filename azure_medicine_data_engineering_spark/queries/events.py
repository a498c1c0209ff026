"""Event-stream queries: tumbling/sliding/session windows, JSON extraction.

The reference has no streaming surface (SURVEY §2.9); these are the engine's
scale extensions over the driver's ``events`` table. Every query here is the
BATCH expression of a streaming computation — ``streaming/windows.py`` runs
the same logic incrementally via Structured Streaming (rows-only checked).

Scale notes: windowed groupBy shuffles on (window, key) — at 100 TB the
watermark + state-store path in the streaming twin bounds memory; the batch
path relies on partial aggregation and AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_medicine_data_engineering_spark.queries.registry import (
    events_table,
    register,
    table as _t,
)


@register(
    "events_tumbling_hourly",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.operators.event_windows import (
        tumbling_hourly_agg,
    )

    return tumbling_hourly_agg(events_table(spark, sf_dir))


@register(
    "events_sliding_1h_30m",
    """
    WITH starts AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100,
                 4) AS total_value
    FROM starts
    GROUP BY 1
    """,
)
def q_events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width, 30m slide): each event lands in 2 windows.
    The oracle expands membership explicitly; Spark's ``window`` does the
    same expansion inside the Expand operator."""
    from azure_medicine_data_engineering_spark.operators.event_windows import (
        sliding_1h_30m_agg,
    )

    return sliding_1h_30m_agg(events_table(spark, sf_dir))


@register(
    "events_sessionization",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user — Spark's ``session_window``
    native; oracle is the classic gaps-and-islands rewrite."""
    from azure_medicine_data_engineering_spark.operators.event_windows import (
        session_30m_agg,
        sessions_per_user,
    )

    return sessions_per_user(session_30m_agg(events_table(spark, sf_dir)))


@register(
    "events_json_props",
    """
    SELECT event_type,
           ROUND(CAST(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE), 4)
             AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT) AS max_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction (JVM-side
    ``get_json_object`` — no UDF)."""
    ev = events_table(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k).cast("double"), 4).alias("avg_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(k).cast("long").alias("n_with_k"),
    )


@register(
    "events_user_activity_profile",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value * 100) AS BIGINT) END) AS DOUBLE) / 100, 4)
             AS purchase_value,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS active_span_sec
    FROM events
    GROUP BY user_id
    """,
)
def q_events_user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                )
            ).cast("double")
            / 100,
            4,
        ).alias("purchase_value"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("active_span_sec"),
    )


@register(
    "asof_join_purchase_to_click",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS ts_r, event_id AS event_id_r FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, p.user_id, p.value, c.ts_r, c.event_id_r,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts_r DESC, c.event_id_r DESC) AS rn
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts_r <= p.ts
       AND c.ts_r >= p.ts - INTERVAL '30 minutes'
    )
    SELECT event_id AS purchase_id, user_id,
           ROUND(CAST(value AS DOUBLE), 4) AS purchase_value,
           event_id_r AS click_id,
           CAST(date_diff('second', ts_r, (SELECT ts FROM events e WHERE e.event_id = j.event_id)) AS BIGINT)
             AS seconds_since_click
    FROM j WHERE rn = 1
    """,
)
def q_asof_join_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator family — composition of existing ops):
    each purchase attributed to the user's latest click within 30 minutes."""
    from azure_medicine_data_engineering_spark.operators.asof import asof_join

    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        purchases, clicks, on="user_id", window_seconds=1800,
        left_id="event_id", tiebreak="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.round(F.col("value").cast("double"), 4).alias("purchase_value"),
        F.col("event_id_r").alias("click_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).cast("long").alias("seconds_since_click"),
    )


@register(
    "interval_join_click_purchase_counts",
    """
    SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_attributed_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.cts <= p.ts
     AND c.cts >= p.ts - INTERVAL '30 minutes'
    GROUP BY p.user_id
    """,
)
def q_interval_join_click_purchase_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: all click→purchase pairs within a 30-minute
    band, counted per user."""
    from azure_medicine_data_engineering_spark.operators.asof import interval_join

    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_join(purchases, clicks, on="user_id", window_seconds=1800)
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_attributed_pairs")
    )


@register(
    "funnel_view_click_purchase",
    """
    WITH t0 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    t1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > t0.t GROUP BY 1),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > t1.t GROUP BY 1)
    SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage,
           CAST((SELECT COUNT(*) FROM t0) AS BIGINT) AS n_users
    UNION ALL
    SELECT CAST(1 AS INT), 'click', CAST((SELECT COUNT(*) FROM t1) AS BIGINT)
    UNION ALL
    SELECT CAST(2 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
    """,
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase
    (operators/events_analytics.py): cascaded window minima over ONE
    user-partitioning of the event fact — no per-stage self-joins. The
    oracle rebuilds each stage with correlated min-after-threshold CTEs."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        funnel_counts,
    )

    return funnel_counts(
        events_table(spark, sf_dir), ["view", "click", "purchase"]
    )


@register(
    "retention_weekly_cohorts",
    """
    WITH fw AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
                FROM events GROUP BY 1),
    off AS (SELECT e.user_id, fw.cw,
                   CAST(date_diff('day', fw.cw, CAST(e.ts AS DATE)) // 7 AS INT)
                     AS week_offset
            FROM events e JOIN fw USING (user_id))
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM off WHERE week_offset < 8
    GROUP BY cw, week_offset ORDER BY cw, week_offset
    """,
)
def q_retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (operators/events_analytics.py): cohort =
    Monday-start week of each user's first event (window min, same single
    user-partitioning), retained-at-offset-w = any event in that calendar
    week window. Offsets are integer day arithmetic — no float time math."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        retention_cohorts,
    )

    out = retention_cohorts(events_table(spark, sf_dir), max_weeks=8)
    # ISO string for the cross-engine compare (DATE canonicalization differs
    # between pandas' datetime64 and python date objects in the gate)
    return out.withColumn(
        "cohort_week", F.date_format("cohort_week", "yyyy-MM-dd")
    ).select("cohort_week", "week_offset", "n_users")


@register(
    "markov_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS prev_type, next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS prob
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: per user,
    consecutive event pairs (deterministic order: ts then event_id), rolled
    up to P(next | prev). The lead window partitions by user — parallel,
    never a global sort; the probability is one exact-integer division
    (row count / partition-window total), no rounding needed."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("prev_type")
    seq = events_table(spark, sf_dir).select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.where(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "prob", F.col("n").cast("double") / F.sum("n").over(wp)
        )
    )


@register(
    "cdc_latest_event_per_user",
    """
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_cdc_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: latest record per key (row_number over
    ts DESC with event_id tie-break) — the upsert-view every change-log
    consumer materializes. One shuffle on the key; at 100 TB this is the
    standard pre-merge compaction before applying a changelog to a table."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events_table(spark, sf_dir)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id", "event_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )


@register(
    "rolling_7day_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(rev_c AS DOUBLE) / 100.0 AS daily_rev,
           ROUND(CAST(SUM(rev_c) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0, 2) AS rolling_7d_rev
    FROM daily
    """,
)
def q_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling revenue via a RANGE-framed window — the
    calendar-aware frame (``rangeBetween`` on day numbers, so GAPS in the
    date spine still mean 7 calendar days, unlike a rows-frame).

    Scale shape: the raw fact table collapses to ONE row per day first
    (partial+final agg), and the rolling window runs over that day-level
    frame — bounded by the calendar (~2.4k rows for 7 years), the same
    metadata-sized class as the funnel report, NOT a window over fact rows.
    Dailies AND the rolling frame both ride the integer cents grid
    (BIGINT end to end; engines may evaluate range frames via different
    strategies — segment tree vs incremental — so even a ≤7-element
    double frame sum is not order-guaranteed); the division to currency
    happens once per output cell. Dates emit as ISO strings (DATE-typed
    outputs hash differently across engines)."""
    from pyspark.sql.window import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
        )
    )
    w = (
        Window.orderBy(F.datediff(F.col("d"), F.lit("1990-01-01")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (F.col("rev_c").cast("double") / 100.0).alias("daily_rev"),
        F.round(F.sum("rev_c").over(w).cast("double") / 100.0, 2).alias(
            "rolling_7d_rev"
        ),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate state maintenance: merge(state(hist), state(batch))
# must equal state(full) — oracle recomputes from the full fact table.
# ---------------------------------------------------------------------------


def _incremental_state_oracle() -> str:
    from azure_medicine_data_engineering_spark.functions.sketches import hll_numerator

    b = 8
    m = 1 << b        # 256
    R1 = 60 - b + 1   # 53
    return f"""
    WITH ev AS (
      SELECT strftime(ts, '%Y-%m-%d') AS d, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c, user_id
      FROM events
    ),
    scal AS (
      SELECT d, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(c) AS BIGINT) / 100.0 AS sum_value,
             MIN(c) / 100.0 AS min_value,
             MAX(c) / 100.0 AS max_value
      FROM ev GROUP BY d, event_type
    ),
    h AS (
      SELECT d, event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM ev
    ),
    reg AS (
      SELECT d, event_type, h & {m - 1} AS bucket,
             MAX(CASE WHEN (h >> {b}) = 0 THEN {R1}
                 ELSE {R1} - length(bin(h >> {b})) END) AS reg
      FROM h GROUP BY d, event_type, bucket
    ),
    agg AS (
      SELECT d, event_type, COUNT(*) AS n_present,
             SUM(CAST(power(2.0, {R1} - reg) AS BIGINT)) AS s_present
      FROM reg GROUP BY d, event_type
    ),
    est AS (
      SELECT d, event_type,
             {hll_numerator(b)!r} / (s_present + ({m} - n_present) * {1 << R1}) AS raw,
             {m} - n_present AS zeros
      FROM agg
    ),
    users AS (
      SELECT d, event_type,
             ROUND(CAST(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                        THEN {float(m)} * ln({float(m)} / zeros)
                        ELSE raw END AS DOUBLE), 4) AS approx_users
      FROM est
    )
    SELECT scal.d, scal.event_type, n_events, sum_value, min_value, max_value,
           approx_users
    FROM scal JOIN users ON scal.d = users.d AND scal.event_type = users.event_type
    """


@register("incremental_day_state_merge", _incremental_state_oracle())
def q_incremental_day_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/incremental.py): history
    (event_id % 7 != 0) and a new batch (% 7 == 0) build partial-agg states
    SEPARATELY — counts, cents-grid sums, min/max, HLL user registers —
    then merge state-to-state. The oracle recomputes every aggregate from
    the FULL fact table, so a green row proves the merge is lossless: the
    history side would never need rescanning at 100 TB."""
    from azure_medicine_data_engineering_spark.operators.incremental import (
        day_type_state,
        day_type_user_registers,
        merge_day_type_state,
        state_report,
    )
    from azure_medicine_data_engineering_spark.functions.sketches import hll_merge

    ev = events_table(spark, sf_dir)
    hist = ev.where(F.col("event_id") % 7 != 0)
    batch = ev.where(F.col("event_id") % 7 == 0)
    state = merge_day_type_state(day_type_state(hist), day_type_state(batch))
    regs = hll_merge(
        day_type_user_registers(hist),
        day_type_user_registers(batch),
        ["d", "event_type"],
    )
    return state_report(state, regs)


@register(
    "event_path_ngrams_top15",
    """
    WITH seq AS (
      SELECT event_type AS t0,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
      FROM events
    ),
    counted AS (
      SELECT t0 || '>' || t1 || '>' || t2 AS path, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE t2 IS NOT NULL GROUP BY 1
    )
    SELECT path, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, path) AS INT) AS rank
    FROM counted ORDER BY cnt DESC, path LIMIT 15
    """,
)
def q_event_path_ngrams_top15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 behavioral 3-grams (operators/events_analytics.py:
    event_path_ngrams): the most common 3-step event-type journeys, the
    n-gram generalization of markov_event_transitions — one user-keyed
    shuffle + TakeOrderedAndProject."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        event_path_ngrams,
    )

    return event_path_ngrams(events_table(spark, sf_dir), n=3, top_k=15)


@register(
    "daily_revenue_anomalies",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    grid AS (
      SELECT d, cents / 100.0 AS daily_rev, cents // 10000 AS x FROM daily
    ),
    win AS (
      SELECT d, daily_rev, x,
             COUNT(x) OVER w AS n, SUM(x) OVER w AS s, SUM(x * x) OVER w AS q
      FROM grid
      WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                   AND INTERVAL 1 DAY PRECEDING)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, daily_rev,
           CAST(n AS BIGINT) AS n_window,
           CASE WHEN n >= 3
                THEN (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
                ELSE FALSE END AS is_anomaly
    FROM win
    """,
)
def q_daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact rolling anomaly flags (operators/events_analytics.py:
    daily_revenue_anomalies): trailing-7-day 2-sigma test on the $100-grid
    daily revenue, the division-free variance inequality evaluated
    identically by both engines."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        daily_revenue_anomalies,
    )

    return daily_revenue_anomalies(_t(spark, sf_dir, "orders"), k=2, window_days=7)


@register(
    "cohort_ltv_matrix",
    """
    WITH fw AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
                FROM events GROUP BY 1),
    cells AS (
      SELECT e.user_id, fw.cw, e.event_type, e.value,
             CAST(date_diff('day', fw.cw, CAST(e.ts AS DATE)) // 7 AS INT) AS age_weeks
      FROM events e JOIN fw USING (user_id)
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, age_weeks,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT)
             / 100.0 AS revenue
    FROM cells WHERE age_weeks < 8
    GROUP BY cw, age_weeks
    """,
)
def q_cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle (operators/events_analytics.py:cohort_ltv_matrix):
    per (first-event cohort week, age) — active users + cents-grid purchase
    revenue; row-sums are the cohort LTV curves."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        cohort_ltv_matrix,
    )

    return cohort_ltv_matrix(events_table(spark, sf_dir), max_weeks=8)


@register(
    "conversion_latency_histogram",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS ts_r, event_id AS event_id_r FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, p.ts, c.ts_r,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts_r DESC, c.event_id_r DESC) AS rn
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts_r <= p.ts
       AND c.ts_r >= p.ts - INTERVAL '30 minutes'
    ),
    lat AS (
      SELECT CAST(date_diff('second', ts_r, ts) AS BIGINT) AS s
      FROM j WHERE rn = 1
    ),
    b AS (
      SELECT CASE WHEN s < 60 THEN 0 WHEN s < 300 THEN 1
                  WHEN s < 900 THEN 2 ELSE 3 END AS bucket
      FROM lat
    ),
    tot AS (SELECT COUNT(*) AS t FROM b)
    SELECT CAST(bucket AS INT) AS bucket,
           CASE bucket WHEN 0 THEN '<1m' WHEN 1 THEN '1-5m'
                       WHEN 2 THEN '5-15m' ELSE '15-30m' END AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           (COUNT(*) * 1000000 // t) / 1e6 AS share
    FROM b, tot GROUP BY bucket, t
    """,
)
def q_conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency distribution: the as-of attribution
    (operators/asof.py) bucketed into product-facing latency bands with
    integer-micro shares — the funnel-latency report every growth team
    reads next to the funnel counts."""
    from azure_medicine_data_engineering_spark.operators.asof import asof_join

    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    attributed = asof_join(
        purchases, clicks, on="user_id", window_seconds=1800,
        left_id="event_id", tiebreak="event_id",
    )
    lat = attributed.select(
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_r")).alias("s")
    )
    b = lat.select(
        F.when(F.col("s") < 60, 0)
        .when(F.col("s") < 300, 1)
        .when(F.col("s") < 900, 2)
        .otherwise(3)
        .alias("bucket")
    )
    tot = b.agg(F.count(F.lit(1)).alias("t"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.element_at(
                F.array(F.lit("<1m"), F.lit("1-5m"), F.lit("5-15m"), F.lit("15-30m")),
                F.col("bucket") + 1,
            ).alias("label"),
            "n",
            (F.expr("n * 1000000 div t") / 1e6).alias("share"),
        )
    )


@register(
    "linear_attribution_cents",
    """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS cts, event_id AS click_id
          FROM events WHERE event_type = 'click'),
    pairs AS (
      SELECT p.purchase_id, c.click_id, p.cents,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.cts DESC, c.click_id DESC) AS r,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.cts <= p.ts AND c.cts >= p.ts - INTERVAL '30 minutes'
    )
    SELECT purchase_id, click_id,
           CAST(n AS BIGINT) AS n_touches,
           (cents // n + CAST(r <= cents % n AS BIGINT)) / 100.0 AS alloc
    FROM pairs
    """,
)
def q_linear_attribution_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/asof.py:linear_attribution):
    every purchase's cents split exactly across its 30-minute click window
    by the largest-remainder rule — per-purchase allocations reconcile to
    the cent."""
    from azure_medicine_data_engineering_spark.operators.asof import linear_attribution

    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return linear_attribution(purchases, clicks)


@register(
    "theil_sen_daily_trend",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    grid AS (
      SELECT CAST(date_diff('day', DATE '1990-01-01', d) AS BIGINT) AS i,
             cents // 100 AS y
      FROM daily
    ),
    slopes AS (
      SELECT ((b.y - a.y) * 1000000
              - ((((b.y - a.y) * 1000000) % (b.i - a.i)) + (b.i - a.i)) % (b.i - a.i))
             / (b.i - a.i) AS s
      FROM grid a JOIN grid b ON a.i < b.i
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(median(CAST(s AS BIGINT)) AS DOUBLE) / 1e6 AS slope_dollars_per_day,
           MIN(CAST(s AS BIGINT)) / 1e6 AS min_slope,
           MAX(CAST(s AS BIGINT)) / 1e6 AS max_slope
    FROM slopes
    """,
)
def q_theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily revenue trend (operators/events_analytics.py:
    theil_sen_trend): median of all pairwise micro-dollar slopes, computed
    with the portable floor-division identity."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        theil_sen_trend,
    )

    return theil_sen_trend(_t(spark, sf_dir, "orders"))


@register(
    "ols_daily_trend",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100 AS y
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT CAST(date_diff('day', (SELECT MIN(d) FROM daily), d) AS BIGINT) AS x,
             CAST(y AS BIGINT) AS y
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM g
    )
    SELECT n AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 4)
             AS slope_dollars_per_day,
           ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * sx)
                 / n, 4) AS intercept_dollars,
           CAST(sy // n AS BIGINT) AS mean_dollars_per_day
    FROM s
    """,
)
def q_ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical OLS daily-revenue trend (operators/events_analytics.py:
    ols_daily_trend): closed-form slope/intercept from exact integer
    sufficient statistics — the least-squares line to quote beside the
    Theil-Sen robust slope."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        ols_daily_trend,
    )

    return ols_daily_trend(_t(spark, sf_dir, "orders"))


@register(
    "dow_seasonality_index",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100 AS y
      FROM orders GROUP BY 1
    ),
    per_dow AS (
      SELECT CAST(dayofweek(d) + 1 AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(y) // COUNT(*) AS BIGINT) AS mean_dollars
      FROM daily GROUP BY 1
    ),
    overall AS (SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS om FROM daily)
    SELECT dow, n_days, mean_dollars,
           (mean_dollars * 1000000 // om) / 1e6 AS seasonal_index
    FROM per_dow, overall
    """,
)
def q_dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week revenue seasonality (operators/events_analytics.py:
    day_of_week_seasonality): per-weekday mean daily revenue indexed to
    the all-days mean, integer division end-to-end."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        day_of_week_seasonality,
    )

    return day_of_week_seasonality(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# RFM segmentation (round 5; operators/events_analytics.py:rfm_segments).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    rfm_segments,
)


@register(
    "rfm_segments_purchases",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS rec_key,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    pu AS (
      SELECT user_id,
             CAST(MAX(rec_key) AS BIGINT) AS rec,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM per_user GROUP BY user_id
    ),
    rq AS (
      SELECT v, CAST(cl * 5 // n + 1 AS INT) AS r_q FROM (
        SELECT v, COALESCE(SUM(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl,
          (SELECT COUNT(*) FROM pu) AS n
        FROM (SELECT rec AS v, COUNT(*) AS c FROM pu GROUP BY 1) t
      ) r
    ),
    fq AS (
      SELECT v, CAST(cl * 5 // n + 1 AS INT) AS f_q FROM (
        SELECT v, COALESCE(SUM(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl,
          (SELECT COUNT(*) FROM pu) AS n
        FROM (SELECT freq AS v, COUNT(*) AS c FROM pu GROUP BY 1) t
      ) r
    ),
    mq AS (
      SELECT v, CAST(cl * 5 // n + 1 AS INT) AS m_q FROM (
        SELECT v, COALESCE(SUM(c) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cl,
          (SELECT COUNT(*) FROM pu) AS n
        FROM (SELECT cents AS v, COUNT(*) AS c FROM pu GROUP BY 1) t
      ) r
    )
    SELECT rq.r_q, fq.f_q, mq.m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(pu.cents) AS BIGINT) AS total_cents
    FROM pu
    JOIN rq ON pu.rec = rq.v
    JOIN fq ON pu.freq = fq.v
    JOIN mq ON pu.cents = mq.v
    GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of purchasing users (recency = last purchase
    epoch-second, frequency = purchase count, monetary = cents spend) —
    the classic BI scoring built with NO data-grain window: each axis
    gets a deterministic min-rank quintile per DISTINCT VALUE
    (``q = cnt_less·5 div n + 1`` — ties share a label, joinable by
    value; documented divergence from tie-splitting NTILE) from the
    bucketed rank prefix sum, then three value-keyed joins and one
    segment aggregation (≤125 rows). The oracle replays each axis with a
    flat cumulative window."""
    ev = events_table(spark, sf_dir)
    return rfm_segments(
        ev.select(
            "user_id",
            F.col("ts").cast("long").alias("rec_key"),
            "value",
            "event_type",
        ).withColumnRenamed("rec_key", "ts"),
        user_col="user_id",
        ts_col="ts",
        amount_col="value",
        purchase_pred=F.col("event_type") == "purchase",
    )


@register(
    "variant_props_by_band",
    """
    SELECT CAST(CAST(props ->> 'k' AS BIGINT) // 10 AS BIGINT) AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS total_value
    FROM events GROUP BY 1
    """,
)
def q_variant_props_by_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics on Spark 4's VARIANT type: the JSON
    props column is parsed ONCE into a variant (``parse_json``) and the
    typed path extraction (``try_variant_get`` — the binary-encoded,
    shredding-ready representation that replaces per-access string
    re-parsing at 100 TB) drives a banded aggregation; the oracle
    extracts the same path with DuckDB's JSON operators. Counts, k-sums
    and cents-grid value totals must match exactly — parse, type cast
    and banding all verified."""
    ev = events_table(spark, sf_dir)
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy(F.expr("k div 10").cast("long").alias("k_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("k_sum"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
                / 100.0
            ).alias("total_value"),
        )
    )


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    PROP_Z_EXPR,
)


@register(
    "funnel_stepdown_significance",
    f"""
    WITH t0 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    t1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > t0.t GROUP BY 1),
    t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t1 USING (user_id)
           WHERE e.event_type = 'signup' AND e.ts > t1.t GROUP BY 1),
    t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN t2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY 1),
    n AS (
      SELECT 0 AS k, CAST((SELECT COUNT(*) FROM t0) AS BIGINT) AS n_users
      UNION ALL SELECT 1, CAST((SELECT COUNT(*) FROM t1) AS BIGINT)
      UNION ALL SELECT 2, CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
      UNION ALL SELECT 3, CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
    ),
    steps AS (
      SELECT c.k AS step_idx,
             c.n_users AS x1, p.n_users AS n1,
             p.n_users AS x2, pp.n_users AS n2
      FROM n c JOIN n p ON c.k = p.k + 1 JOIN n pp ON c.k = pp.k + 2
    )
    SELECT CAST(step_idx AS INT) AS step_idx,
           n1 AS n_prev, x1 AS n_reached,
           (x1 * 1000000 // n1) / 1e6 AS conv_rate,
           (x2 * 1000000 // n2) / 1e6 AS prev_conv_rate,
           {PROP_Z_EXPR} AS z
    FROM steps
    """,
)
def q_funnel_stepdown_significance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel drop-off SIGNIFICANCE: for each step k >= 2 of the 4-stage
    view → click → signup → purchase funnel, the pooled two-proportion z
    comparing this step's conversion (n_k of n_{k-1}) against the
    previous step's (n_{k-1} of n_{k-2}) — 'did conversion get
    significantly worse at THIS step?', the question the raw funnel
    counts don't answer. Composes funnel_counts (one user-partitioned
    window pass) with the shared PROP_Z_EXPR over the 4-row stage frame;
    micro-grid rates."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        funnel_counts,
    )

    totals = funnel_counts(
        events_table(spark, sf_dir), ["view", "click", "signup", "purchase"]
    ).persist()  # 4-row frame, three self-join consumers
    c = totals.alias("c")
    p = totals.alias("p")
    pp = totals.alias("pp")
    steps = (
        c.join(p, F.col("c.stage_idx") == F.col("p.stage_idx") + 1)
        .join(pp, F.col("c.stage_idx") == F.col("pp.stage_idx") + 2)
        .select(
            F.col("c.stage_idx").cast("int").alias("step_idx"),
            F.col("c.n_users").alias("x1"),
            F.col("p.n_users").alias("n1"),
            F.col("p.n_users").alias("x2"),
            F.col("pp.n_users").alias("n2"),
        )
    )
    _out = steps.select(
        "step_idx",
        F.col("n1").alias("n_prev"),
        F.col("x1").alias("n_reached"),
        (F.expr("x1 * 1000000 div n1") / 1e6).alias("conv_rate"),
        (F.expr("x2 * 1000000 div n2") / 1e6).alias("prev_conv_rate"),
        F.expr(PROP_Z_EXPR).alias("z"),
    )
    _out._stage_caches = [totals]  # r15 leak fix
    return _out


from azure_medicine_data_engineering_spark.operators.scd2 import (  # noqa: E402
    snapshot_diff,
)


@register(
    "snapshot_diff_orders",
    """
    WITH cls AS (
      SELECT o_orderkey,
             CASE
               WHEN o_orderkey % 97 = 0 THEN 'removed'
               WHEN o_orderkey % 101 = 0 THEN 'changed'
               ELSE 'unchanged'
             END AS change
      FROM orders
    ),
    base AS (
      SELECT change, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      FROM cls GROUP BY change
    ),
    added AS (
      SELECT 'added' AS change, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(o_orderkey + 1000000000) AS BIGINT) AS key_checksum
      FROM orders WHERE o_orderkey % 103 = 0
    )
    SELECT * FROM base UNION ALL SELECT * FROM added
    """,
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (``operators/scd2.py:snapshot_diff``): yesterday's
    orders vs a new version with DETERMINISTICALLY PLANTED edits (keys
    %97 dropped, %101 repriced, %103 re-added under offset ids) —
    classified added/removed/changed/unchanged by one NULL-safe
    full-outer key join, summarized with key checksums. The oracle
    recomputes the report from the planting rules alone, so any
    misclassified row breaks the hash. The promote-gate every rebuilt
    table should pass before going live."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    new = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 101 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(o, new, ["o_orderkey"], ["o_totalprice"])


from azure_medicine_data_engineering_spark.operators.event_windows import (  # noqa: E402
    bounce_rate_daily,
)


@register(
    "bounce_rate_daily",
    """
    WITH tagged AS (
      SELECT user_id AS u, ts AS t,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1
                  WHEN epoch_us(ts) // 1000000
                       - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) // 1000000
                       > 1800 THEN 1
                  ELSE 0 END AS newf
      FROM events
    ),
    sess AS (
      SELECT u, t, SUM(newf) OVER (PARTITION BY u ORDER BY t
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM tagged
    ),
    per_sess AS (
      SELECT u, sid, CAST(COUNT(*) AS BIGINT) AS n_ev, MIN(t) AS t0
      FROM sess GROUP BY u, sid
    )
    SELECT strftime(CAST(t0 AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           (CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // COUNT(*)) / 1e6 AS bounce_rate
    FROM per_sess GROUP BY 1
    """,
)
def q_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate over gap-based 30-minute sessions
    (``operators/event_windows.py:bounce_rate_daily``): the classic
    islands-and-gaps assembly with USER-KEYED lag + cumulative windows
    (never global), single-event sessions flagged as bounces, sessions
    dated to their first event. ISO day strings (driver-canon DATE
    hazard); rates on the micro grid. The oracle replays the assembly
    with the same keyed windows."""
    ev = events_table(spark, sf_dir)
    # second-granularity gap on both engines: cast to epoch seconds
    return bounce_rate_daily(
        ev.select("user_id", F.col("ts")), gap_seconds=1800
    )


@register(
    "daily_new_vs_returning",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0 FROM events GROUP BY user_id
    ),
    daily_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN d = f.d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN d > f.d0 THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
           (CAST(SUM(CASE WHEN d = f.d0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // COUNT(*)) / 1e6 AS new_share
    FROM daily_users du JOIN first_seen f USING (user_id)
    GROUP BY d
    """,
)
def q_daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active users — the growth-accounting
    staple (is activity growth acquisition or retention?): first-seen
    day per user from one keyed min, daily distinct actives, the split
    by comparing each active day to the user's first day. Two keyed
    aggregations + one user-keyed join; ISO day strings; micro-grid
    share."""
    ev = events_table(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    daily_users = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    return (
        daily_users.join(first_seen, "user_id")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum((F.col("d") == F.col("d0")).cast("long")).cast("long").alias("n_new"),
            F.sum((F.col("d") > F.col("d0")).cast("long")).cast("long").alias("n_returning"),
        )
        .select(
            "day",
            "n_active",
            "n_new",
            "n_returning",
            (F.expr("n_new * 1000000 div n_active") / 1e6).alias("new_share"),
        )
    )


@register(
    "dau_mau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      FROM events
    ),
    span AS (SELECT CAST(MIN(d) AS BIGINT) AS dmin, CAST(MAX(d) AS BIGINT) AS dmax FROM ud),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    fan AS (
      SELECT ud.user_id, ud.d + o.k AS d
      FROM ud, (SELECT unnest(range(28)) AS k) o(k)
    ),
    mau AS (
      SELECT f.d, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS mau
      FROM fan f, span s
      WHERE f.d BETWEEN s.dmin + 27 AND s.dmax
      GROUP BY f.d
    )
    SELECT strftime(DATE '1970-01-01' + CAST(m.d AS INT), '%Y-%m-%d') AS day,
           COALESCE(a.dau, 0) AS dau, m.mau,
           (COALESCE(a.dau, 0) * 1000000 // m.mau) / 1e6 AS stickiness
    FROM mau m LEFT JOIN dau a USING (d)
    """,
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — the engagement ratio every growth report
    leads with, computed EXACTLY without any sliding-distinct state:
    each (user, active-day) row fans out map-side to the 28 trailing
    day-buckets it supports, and trailing-28-day MAU is one
    count-distinct per day bucket (keyed aggregation; the fan-out is
    28× the user-day frame, never the event fact). Days before a full
    window drop; ISO day strings; micro-grid ratio."""
    ev = events_table(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01")))
        .cast("long")
        .alias("d"),
    ).distinct().persist()
    span = ud.agg(
        F.min("d").cast("long").alias("dmin"), F.max("d").cast("long").alias("dmax")
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    fan = ud.select(
        "user_id",
        F.explode(F.array(*[F.lit(k) for k in range(28)])).alias("_k"),
        F.col("d").alias("_d0"),
    ).select("user_id", (F.col("_d0") + F.col("_k")).alias("d"))
    mau = (
        fan.crossJoin(F.broadcast(span))
        .where((F.col("d") >= F.col("dmin") + 27) & (F.col("d") <= F.col("dmax")))
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("mau"))
    )
    out = (
        mau.join(dau, "d", "left")
        .select(
            F.date_format(
                F.expr("date_add(to_date('1970-01-01'), cast(d as int))"),
                "yyyy-MM-dd",
            ).alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            "mau",
            (F.expr("coalesce(dau, 0) * 1000000 div mau") / 1e6).alias("stickiness"),
        )
    )
    out._stage_caches = [ud]
    return out


# ---------------------------------------------------------------------------
# Round 8: change-point and sign-trend tests on the daily revenue series.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    COX_STUART_Z_EXPR,
    PETTITT_P_EXPR,
    cox_stuart_trend,
    pettitt_change_point,
)


@register(
    "pettitt_change_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    rk AS (
      SELECT d,
             CAST(2 * (RANK() OVER (ORDER BY cents) - 1)
                  + COUNT(*) OVER (PARTITION BY cents) + 1 AS BIGINT) AS r2
      FROM daily
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    u AS (
      SELECT d,
             CAST(SUM(r2) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (ROW_NUMBER() OVER (ORDER BY d)) * (n_.n + 1) AS BIGINT) AS u_t
      FROM rk, n_
    ),
    best AS (SELECT u_t, d FROM u ORDER BY abs(u_t) DESC, d ASC LIMIT 1)
    SELECT n_.n AS n, CAST(abs(best.u_t) AS BIGINT) AS k_u,
           strftime(best.d, '%Y-%m-%d') AS change_day,
           {PETTITT_P_EXPR} AS p_approx
    FROM best, n_
    """,
)
def q_pettitt_change_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test on daily revenue
    (``events_analytics.pettitt_change_point``): the rank-based single
    change-point localizer — WHERE does the revenue regime shift, and
    how significant is the shift? U_t telescopes to an integer prefix
    sum of doubled midranks over the calendar-bounded day frame; only
    the approximate significance is a (shared) double."""
    return pettitt_change_point(_t(spark, sf_dir, "orders"))


@register(
    "cox_stuart_daily_revenue",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) - 1 AS BIGINT) AS i, cents
      FROM daily
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    p AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
             CAST(SUM(CASE WHEN b.cents <> a.cents THEN 1 ELSE 0 END) AS BIGINT) AS m
      FROM idx a JOIN idx b ON b.i = a.i + (SELECT (n + 1) // 2 FROM n_)
    )
    SELECT n_.n AS n_days, p.m, p.s_plus, {COX_STUART_Z_EXPR} AS z
    FROM p, n_
    """,
)
def q_cox_stuart_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart sign-trend test on daily revenue
    (``events_analytics.cox_stuart_trend``): pair each day with its
    half-series offset and sign-test the differences — the O(n)
    assumption-free trend check beside ``mann_kendall_daily_revenue``'s
    rank statistic. Integer counts; z is the shared expression."""
    return cox_stuart_trend(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Round 8: revenue concentration per segment (HHI).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.events_analytics import (  # noqa: E402
    hhi_by_group,
)


@register(
    "hhi_revenue_by_segment",
    """
    WITH per_e AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS e,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS w
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tw AS (SELECT seg, CAST(SUM(w) AS BIGINT) AS tw FROM per_e GROUP BY seg),
    terms AS (
      SELECT p.seg,
             CAST(FLOOR((p.w * 1e0 / t.tw) * (p.w * 1e0 / t.tw) * 1e9 + 0.5e0)
               AS BIGINT) AS t_u
      FROM per_e p JOIN tw t USING (seg)
    )
    SELECT seg AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           ROUND(CAST(SUM(t_u) AS DOUBLE) / 1e9, 4) AS hhi
    FROM terms GROUP BY seg
    """,
)
def q_hhi_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per market segment
    (``events_analytics.hhi_by_group``): is a segment's revenue spread
    across its customers or dominated by a few? Exact cents weights,
    1e-9-grid share² terms, no rank windows at all — the
    ordering-free concentration companion to ``gini_customer_spend``."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment"),
        F.col("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return hhi_by_group(j, "c_mktsegment", "o_custkey", F.col("cents"))
