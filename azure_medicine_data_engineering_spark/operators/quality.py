"""Data-quality / constraint checking (SURVEY §2.4 A8-A10, §5).

Parity: the reference's quality stage produces a persisted report of
``(description, columnName, number)`` triples (``stydyGrB.scala:77-79``) from:

- ``countHowManyNulls`` (``utils.scala:133-135``) — one ``count()`` JOB PER
  COLUMN (O(columns) full scans; 100+ scans per clinical table);
- ``countOutsideTheRange`` (``utils.scala:121-122``) — same per-column pattern;
- ``countOutliersOfZscore`` (``utils.scala:143-152``) — mean/stddev over an
  EMPTY WINDOW (single-partition exchange) then a per-column count.

Scale rewrite (SURVEY §4 — "the biggest algorithmic win"): ALL null + range
checks and all z-score moment computations fuse into ONE conditional
aggregation (one scan, partial+final agg, no single-partition exchange);
z-outlier counts need one more scan using the collected scalar moments.
Total: 2 scans regardless of column count, vs ~3·k scans in the reference.

Report descriptions reuse the reference's literal strings — including the
"oultlier number" typo (``stydyGrB.scala:36``-ish usage) — so report tables
are drop-in comparable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DESC_NULLS = "number of null values"
DESC_RANGE = "outside of the range"
DESC_OUTLIER = "oultlier number"  # sic — reference spelling

REPORT_SCHEMA = StructType(
    [
        StructField("description", StringType()),
        StructField("columnName", StringType()),
        StructField("number", LongType()),
    ]
)


@dataclass
class RangeSpec:
    column: str
    lo: float
    hi: float


def quality_report(
    df: DataFrame,
    null_cols: list[str] | None = None,
    ranges: list[RangeSpec] | None = None,
    zscore_cols: list[str] | None = None,
    z_threshold: float = 3.0,
    keep_zero_rows: bool = False,
    cache: bool = True,
) -> DataFrame:
    """Fused quality report: ``(description, columnName, number)``.

    ``keep_zero_rows=False`` reproduces the reference's filter keeping only
    violations (``stydyGrB.scala:65`` keeps rows with number > 0).

    FULLY LAZY: scan 1 is one conditional aggregation (nulls + ranges +
    z-score moments); scan 2 counts z violations with the 1-row moments
    frame broadcast back over the table — no driver collect anywhere, so
    the caller owns execution time and plan audits see the real plan
    (the previous eager build ran both scans at construction, which also
    made its bench timing hostage to whatever cached frames the preceding
    queries left behind). The persisted 1-row moments frame (2 consumers:
    z-pass broadcast + report emit) is stashed as ``_stage_caches`` —
    caller-owned lifecycle, repo convention; pass ``cache=False`` to skip
    the persist entirely (repeated calls in long sessions)."""
    null_cols = null_cols or []
    ranges = ranges or []
    zscore_cols = zscore_cols or []
    spark = df.sparkSession

    aggs = []
    for c in null_cols:
        aggs.append(F.count(F.when(F.isnull(F.col(f"`{c}`")), 1)).alias(f"__null__{c}"))
    for r in ranges:
        col = F.col(f"`{r.column}`")
        aggs.append(
            F.count(F.when((col < F.lit(r.lo)) | (col > F.lit(r.hi)), 1)).alias(
                f"__range__{r.column}"
            )
        )
    for c in zscore_cols:
        col = F.col(f"`{c}`")
        aggs.append(F.avg(col).alias(f"__mean__{c}"))
        aggs.append(F.stddev_pop(col).alias(f"__std__{c}"))
    if not aggs:
        return spark.createDataFrame([], REPORT_SCHEMA)

    moments = df.agg(*aggs)
    if cache:
        moments = moments.persist()

    # Second scan: z violation counts with the moments broadcast back over
    # the table. A null mean (all-null column), null std (empty table) or
    # zero std (constant column) yields a null/false condition -> count 0,
    # matching the collected-literal semantics exactly; the std > 0 guard
    # keeps a 0-std division from producing |inf| > t.
    if zscore_cols:
        z_aggs = []
        for c in zscore_cols:
            col = F.col(f"`{c}`")
            z = (col - F.col(f"__mean__{c}")) / F.col(f"__std__{c}")
            z_aggs.append(
                F.count(
                    F.when(
                        (F.col(f"__std__{c}") > 0)
                        & (F.abs(z) > F.lit(z_threshold)),
                        1,
                    )
                ).alias(f"__z__{c}")
            )
        zcounts = df.crossJoin(F.broadcast(moments)).agg(*z_aggs)
        row = moments.crossJoin(zcounts)
    else:
        row = moments

    triples = []
    for c in null_cols:
        triples.append((DESC_NULLS, c, f"__null__{c}"))
    for r in ranges:
        triples.append((DESC_RANGE, r.column, f"__range__{r.column}"))
    for c in zscore_cols:
        triples.append((DESC_OUTLIER, c, f"__z__{c}"))
    rep = row.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("description"),
                        F.lit(c).alias("columnName"),
                        F.col(src).cast("long").alias("number"),
                    )
                    for d, c, src in triples
                ]
            )
        )
    )
    if not keep_zero_rows:
        rep = rep.where(F.col("number") > 0)
    rep._stage_caches = [moments] if cache else []
    return rep


@dataclass
class TemporalRule:
    """Derived month-interval constraint: ``months_between(later, earlier)``
    must lie in [lo, hi] (parity: surgery-after-birth / study-after-surgery
    checks, ``stydyGrB.scala:44-47``, ``contrGrB.scala:26-29``; intervals
    constrained to [0, 2000] months)."""

    name: str
    later: str
    earlier: str
    lo: float = 0.0
    hi: float = 2000.0


def temporal_sanity_report(df: DataFrame, rules: list[TemporalRule]) -> DataFrame:
    """One-pass temporal-sanity violations as report triples: for each rule,
    count rows whose derived month interval falls outside [lo, hi].
    Lazy — one conditional aggregation, report rows inlined in-plan."""
    aggs = []
    for r in rules:
        months = F.months_between(F.col(f"`{r.later}`"), F.col(f"`{r.earlier}`"))
        aggs.append(
            F.count(F.when((months < r.lo) | (months > r.hi), 1)).alias(r.name)
        )
    return df.agg(*aggs).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(DESC_RANGE).alias("description"),
                        F.lit(r.name).alias("columnName"),
                        F.col(r.name).cast("long").alias("number"),
                    )
                    for r in rules
                ]
            )
        )
    )


def null_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Single-pass per-column null counts as a LONG report (A8), fully
    distributed (no collect): one agg row unpivoted via stack."""
    cols = cols or df.columns
    agged = df.agg(
        *[
            F.count(F.when(F.isnull(F.col(f"`{c}`")), 1)).cast("long").alias(c)
            for c in cols
        ]
    )
    stack_args = ", ".join(f"'{c}', `{c}`" for c in cols)
    return agged.select(
        F.expr(f"stack({len(cols)}, {stack_args}) as (columnName, number)")
    ).select(F.lit(DESC_NULLS).alias("description"), "columnName", "number")


@dataclass
class ForeignKey:
    """Referential-integrity rule: every ``child.fk`` must exist in
    ``parent.pk`` (orphan rows violate)."""

    name: str
    child_fk: str
    parent_pk: str


def referential_integrity_report(
    child: DataFrame, parent: DataFrame, rules: list[ForeignKey]
) -> DataFrame:
    """Orphan counts per FK rule as report triples. Plan: left-anti join per
    rule (parent side reduced to distinct keys — broadcastable for dimension
    parents); no payload materialization."""
    spark = child.sparkSession
    records = []
    for r in rules:
        keys = parent.select(F.col(f"`{r.parent_pk}`").alias("__pk")).distinct()
        orphans = child.join(
            keys, child[r.child_fk] == keys["__pk"], "left_anti"
        ).count()
        records.append(("orphaned foreign keys", r.name, int(orphans)))
    return spark.createDataFrame(records, REPORT_SCHEMA)


def mad_outlier_report(
    df: DataFrame,
    cols: list[str],
    k: float = 3.0,
    round_digits: int = 4,
    cache: bool = True,
) -> DataFrame:
    """Robust outlier report via Median Absolute Deviation — the
    breakdown-resistant twin of the z-score counts (``stydyGrB.scala``'s
    outlier pass; z-scores move with the outliers they hunt, MAD does not).
    Per column: median, MAD (σ-consistent, ×1.4826) and the count of rows
    with ``|x − median| > k · 1.4826 · MAD``.

    Exactly THREE scans for any number of columns (medians → MADs →
    counts), each a partial+final aggregate with the 1-row previous stage
    broadcast — never a per-column job. Median/MAD are rounded to the
    convention grid BEFORE the comparison so the verdict is
    engine-reproducible; MAD 0 (constant column) yields 0 outliers rather
    than dividing anywhere.

    Cache lifecycle is CALLER-owned (repo convention): the two persisted
    1-row stage frames are stashed on the result as ``_stage_caches`` —
    unpersist them after the report is materialized in long-lived
    sessions (per call they pin only two 1-row frames), or pass
    ``cache=False`` to skip the persists (costs extra table scans)."""
    if not cols:
        raise ValueError("mad_outlier_report: cols must be non-empty")
    # both 1-row stages are persisted: each feeds TWO downstream consumers
    # (the next stage and the final report row), and without the persist
    # every consumer replays a full table scan — 7 scans instead of 3
    meds = df.agg(
        *[
            F.round(F.expr(f"percentile(`{c}`, 0.5)"), round_digits).alias(f"_med_{c}")
            for c in cols
        ]
    )
    if cache:
        meds = meds.persist()
    with_med = df.crossJoin(F.broadcast(meds))
    mads = with_med.agg(
        *[
            F.round(
                F.expr(f"percentile(abs(`{c}` - `_med_{c}`), 0.5)"), round_digits
            ).alias(f"_mad_{c}")
            for c in cols
        ]
    )
    if cache:
        mads = mads.persist()
    both = df.crossJoin(F.broadcast(meds)).crossJoin(F.broadcast(mads))
    counts = both.agg(
        *[
            F.sum(
                (
                    F.abs(F.col(c) - F.col(f"_med_{c}"))
                    > F.lit(float(k)) * F.lit(1.4826) * F.col(f"_mad_{c}")
                ).cast("int")
            )
            .cast("long")
            .alias(f"_n_{c}")
            for c in cols
        ]
    )
    row = counts.crossJoin(F.broadcast(meds)).crossJoin(F.broadcast(mads))
    parts = []
    for c in cols:
        parts.extend(
            [
                F.lit(c),
                F.struct(
                    F.col(f"_med_{c}").alias("med"),
                    F.col(f"_mad_{c}").alias("mad"),
                    F.col(f"_n_{c}").alias("n"),
                ),
            ]
        )
    exploded = row.select(
        F.explode(F.create_map(*parts)).alias("columnName", "_s")
    )
    out = exploded.select(
        "columnName",
        F.col("_s.med").alias("median"),
        F.col("_s.mad").alias("mad"),
        F.col("_s.n").alias("n_outliers"),
    )
    out._stage_caches = [meds, mads] if cache else []
    return out


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 5, cache: bool = True
) -> DataFrame:
    """Join/aggregation-key skew diagnosis: the measurement that decides
    between a plain shuffle, AQE skew splitting, and an explicit salted
    join (operators/joins.py:salted_join) BEFORE a 100 TB job discovers its
    hot key at hour three.

    Emits the ``top_k`` heaviest keys, each row carrying the global
    distribution: total rows, key count, max/p50/p99 per-key counts,
    the hot key's row share, the skew factor (max / integer-mean), and the
    salt factor that would level the hottest key (= ceil of skew). All
    ratios are integer micro-unit divisions (CLAUDE.md grid rule).

    Scale: one keyed count of the fact table; every later step runs on the
    COUNT-OF-COUNTS frame — bounded by the number of DISTINCT per-key
    counts (thousands at any corpus size), so the ordered window over it is
    a licensed bounded single-partition exchange, never keys- or rows-sized.
    The per-key counts frame is persisted once for its three consumers
    (caller releases via ``out._stage_caches``)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if cache:
        counts = counts.persist()
    summary = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    # count-of-counts: distinct per-key count values + how many keys hit each
    cc = counts.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("k"))
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cc.select("cnt", F.sum("k").over(w).alias("cum"))
    quantile = lambda q, name: (  # noqa: E731
        cum.crossJoin(F.broadcast(summary.select("n_keys")))
        .where(F.col("cum") * 1_000_000 >= F.lit(int(q * 1_000_000)) * F.col("n_keys"))
        .agg(F.min("cnt").cast("long").alias(name))
    )
    p50 = quantile(0.5, "p50_cnt")
    p99 = quantile(0.99, "p99_cnt")
    # TakeOrderedAndProject (orderBy+limit), NOT a keys-sized unpartitioned
    # window; the rank window then runs over the top_k-row result only
    wtop = Window.orderBy(F.desc("cnt"), "key")
    top = (
        counts.orderBy(F.desc("cnt"), "key")
        .limit(top_k)
        .withColumn("rank", F.row_number().over(wtop).cast("int"))
    )
    out = (
        top.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p99))
        .select(
            F.col("key").cast("string").alias("key"),
            "rank",
            "cnt",
            "n_keys",
            "total_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            (F.expr("cnt * 1000000 div total_rows") / 1e6).alias("row_share"),
            (
                F.expr("max_cnt * 1000000 div greatest(total_rows div n_keys, 1)")
                / 1e6
            ).alias("skew_factor"),
            F.expr(
                "(max_cnt + greatest(total_rows div n_keys, 1) - 1) "
                "div greatest(total_rows div n_keys, 1)"
            ).cast("long").alias("suggested_salt"),
        )
    )
    out._stage_caches = [counts] if cache else []
    return out


def exact_kth_cents(
    df: DataFrame, cents_col: str, k_expr, bucket_width: int = 65536
):
    """Exact k-th smallest of an integer column, DISTRIBUTED: a global sort
    or one ORDER BY window would single-reduce the table; instead (1)
    values bucket by ``value div bucket_width`` and a keyed count collapses
    the table to the bucket summary, (2) a bounded window over that summary
    locates the bucket holding rank k, (3) only THAT bucket's values are
    revisited (pushed filter), and its value-level count-of-counts — at
    most ``bucket_width`` distinct values — yields the exact order
    statistic. Returns a 1-row frame ``(kth_value)``.

    ``k_expr`` is a Column evaluated against the 1-row total-count frame
    (so callers can write ceil-of-fraction ranks)."""
    from pyspark.sql.window import Window

    tot = df.agg(F.count(F.lit(1)).cast("long").alias("_n")).select(
        "_n", k_expr.cast("long").alias("_k")
    )
    bc = df.groupBy(F.expr(f"{cents_col} div {bucket_width}").alias("_bkt")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = bc.select("_bkt", (F.sum("_c").over(w)).alias("_cum"), "_c")
    tgt = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("_cum") >= F.col("_k"))
        .agg(
            F.min("_bkt").alias("_tbkt"),
            F.min_by(F.col("_cum") - F.col("_c"), "_bkt").alias("_prev"),
        )
    )
    inb = (
        df.crossJoin(F.broadcast(tgt))
        .where(F.expr(f"{cents_col} div {bucket_width}") == F.col("_tbkt"))
        .groupBy(F.col(cents_col).alias("_v"), F.col("_prev"))
        .agg(F.count(F.lit(1)).cast("long").alias("_vc"))
    )
    wv = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        inb.select("_v", (F.col("_prev") + F.sum("_vc").over(wv)).alias("_vcum"))
        .crossJoin(F.broadcast(tot.select("_k")))
        .where(F.col("_vcum") >= F.col("_k"))
        .agg(F.min("_v").cast("long").alias("kth_value"))
    )


def winsorized_mean_report(
    df: DataFrame,
    amount_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    bucket_width: int = 65536,
    cache: bool = True,
) -> DataFrame:
    """Winsorized mean on the cents grid — the robust-location companion to
    the MAD report: tail values clamp to the exact p_lo/p_hi order
    statistics (found by :func:`exact_kth_cents`'s distributed bucket
    pruning, never a global sort) and the mean recomputes on integers.
    One row: raw vs winsorized mean (micro-exact), the two cutoffs, and
    the clamp counts — a big raw-vs-winsorized gap is the outlier alarm.
    """
    cents = df.select(
        F.round(F.col(amount_col) * 100).cast("long").alias("_cents")
    )
    if cache:
        cents = cents.persist()
    lo = exact_kth_cents(
        cents, "_cents", F.ceil(F.lit(p_lo) * F.col("_n")), bucket_width
    ).select(F.col("kth_value").alias("_lo"))
    hi = exact_kth_cents(
        cents, "_cents", F.ceil(F.lit(p_hi) * F.col("_n")), bucket_width
    ).select(F.col("kth_value").alias("_hi"))
    clamped = (
        cents.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "_cents", "_lo", "_hi",
            F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("_cents"))).alias("_w"),
        )
    )
    out = clamped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # cents sums reach ~2.4e14 at the 10x replica, so the 1e6 micro
        # multiplier overflows BIGINT (ANSI ARITHMETIC_OVERFLOW — caught
        # by the replica sweep): accumulate in DECIMAL(38,0); the div
        # quotient is mean-sized, well inside BIGINT
        (
            F.expr(
                "sum(cast(_cents as decimal(38,0))) * 1000000 div count(1)"
            )
            / 1e6
        ).alias("raw_mean_cents"),
        (
            F.expr("sum(cast(_w as decimal(38,0))) * 1000000 div count(1)")
            / 1e6
        ).alias("winsorized_mean_cents"),
        F.first("_lo").cast("long").alias("lo_cut_cents"),
        F.first("_hi").cast("long").alias("hi_cut_cents"),
        F.sum((F.col("_cents") < F.col("_lo")).cast("long")).cast("long").alias("n_clamped_lo"),
        F.sum((F.col("_cents") > F.col("_hi")).cast("long")).cast("long").alias("n_clamped_hi"),
    )
    out._stage_caches = [cents] if cache else []
    return out


def grouped_exact_kth_cents(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    q: float = 0.5,
) -> DataFrame:
    """Exact per-group order statistic (default: the lower median) of an
    integer column, fully DISTRIBUTED: the classic exact-median problem
    that defeats percentile-state scaling is solved with a per-group
    count-of-counts — one keyed aggregation collapses the fact table to
    DISTINCT (group, value) rows, a window PARTITIONED BY GROUP (keyed
    shuffle, never single-partition) accumulates counts in value order,
    and the answer is the least value whose cumulative count reaches
    ``ceil(q · n_group)``.

    State per group is its distinct-value count — for cents-grid money
    and similar discrete domains that is orders of magnitude below the
    row count, and the work parallelizes across groups (compare the
    whole-table exact percentile, which is why the flagship ships the
    sketch variant). Returns ``(group, n, kth_value)``."""
    from pyspark.sql.window import Window

    cc = df.groupBy(F.col(group_col), F.col(cents_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(group_col)
    cum = cc.select(
        group_col,
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wg).alias("_n"),
    )
    return (
        cum.where(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")))
        .groupBy(group_col)
        .agg(
            F.first("_n").cast("long").alias("n"),
            F.min("_v").cast("long").alias("kth_value"),
        )
    )


def grouped_percentile_bands(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    qs: tuple[float, float, float] = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Exact P10/P50/P90 bands per group from ONE count-of-counts pass —
    the SLA/spread report (latency bands, price bands) that
    :func:`grouped_exact_kth_cents` computes for a single quantile:
    the same group-keyed cumulative window serves all three ranks
    simultaneously, so the cost does not triple. Returns
    ``(group, n, p_lo, p_mid, p_hi)`` (lower-quantile convention,
    ``ceil(q·n)`` ranks). Keyed shuffles only — never single-partition."""
    from pyspark.sql.window import Window

    lo, mid, hi = qs
    cc = df.groupBy(F.col(group_col), F.col(cents_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(group_col)
    cum = cc.select(
        group_col,
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(wg).alias("_n"),
    )
    picks = [
        F.min(
            F.when(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")), F.col("_v"))
        ).cast("long").alias(name)
        for q, name in ((lo, "p_lo"), (mid, "p_mid"), (hi, "p_hi"))
    ]
    return cum.groupBy(group_col).agg(
        F.max("_n").cast("long").alias("n"), *picks
    )


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    q: float = 0.5,
) -> DataFrame:
    """Exact per-group WEIGHTED quantile (default: weighted lower
    median): the least value whose cumulative WEIGHT reaches
    ``ceil(q · W_group)`` — the revenue-weighted median price, the
    token-weighted median doc length: quantiles where rows don't count
    equally. Same group-keyed count-of-counts decomposition as
    :func:`grouped_exact_kth_cents`, with integer weights summed instead
    of rows counted. Returns ``(group, total_weight, qth_value)``."""
    from pyspark.sql.window import Window

    cc = df.groupBy(F.col(group_col), F.col(value_col).alias("_v")).agg(
        F.sum(F.col(weight_col)).cast("long").alias("_w")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(group_col)
    cum = cc.select(
        group_col,
        "_v",
        F.sum("_w").over(w).alias("_cum"),
        F.sum("_w").over(wg).alias("_tw"),
    )
    return (
        cum.where(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_tw")))
        .groupBy(group_col)
        .agg(
            F.first("_tw").cast("long").alias("total_weight"),
            F.min("_v").cast("long").alias("qth_value"),
        )
    )
