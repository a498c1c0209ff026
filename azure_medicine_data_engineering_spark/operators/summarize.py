"""Categorized summary — the reference's signature aggregation (SURVEY §2.4 A1).

Parity: ``createTableCategorized`` + ``setModificationToCol``
(``notebooks/PhdProject/utils.scala:183-220``): for each category column plus an
"All" pseudo-category, for each aggregation function, aggregate N metric columns
and stack everything into one long summary table of shape (FIXTURES.md T7)::

    Division:         string   -- category column label, or "All"
    DivisionCategory: string   -- category value, or "All"
    aggregation:      string   -- "sum" | "median" | "min" | "max" | ...
    <metric1..N>:     double

The reference computes this as k×m separate window-over-partition frames each
followed by ``.distinct()``, unioned — k categories × m agg-fns full scans, and
a grand-total branch over an **empty window** (single-partition exchange).

Scale rewrite (one scan, one shuffle): a single ``GROUPING SETS
((cat1),(cat2),…,())`` aggregation computing every (agg-fn × metric) column at
once, then ``stack`` to unpivot the agg-fn dimension into rows. Partial
aggregation (map-side combine) applies; no single-partition exchange exists in
the plan. Row multiplicity note: the reference's window+distinct accidentally
collapses identical metric rows; grouped aggregation reproduces the *intent*
(one row per (Division, DivisionCategory, aggregation)) — correctness tests
compare as sets (SURVEY §7 hard-part 1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Built-in aggregation vocabulary: name -> Column-level aggregator.
#: ``countTrue`` reproduces ``myCountTrues`` (``utils.scala:243``): the
#: reference casts boolean→string→"1"/"0"→sum, which ignores NULLs; the sane
#: equivalent is sum(cast int) which has identical NULL semantics.
AGG_FUNCTIONS: dict[str, Callable[[str], Column]] = {
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "count": lambda c: F.count(c),
    "avg": lambda c: F.avg(c),
    "mean": lambda c: F.avg(c),
    # summation-order-stable mean for decimal(≤2) data: the inner round
    # recovers the exact decimal sum, so the result is bit-identical across
    # engines and partitionings (used by oracle-compared queries).
    "avg_stable": lambda c: F.round(F.sum(c), 2) / F.count(c),
    # EXACT sum/mean for 2-decimal data at ANY row count: sum on the
    # integer cents grid (BIGINT, order-free), divide once. The raw
    # double "sum" drifts past ROUND(...,4) once a group accumulates
    # millions of rows (observed at the 10×-sf0.1 replica: 'All' price
    # sum off by 0.0089), and "avg_stable"'s ROUND(SUM,2) only survives
    # while that error stays < 0.005 — these are the scale-proof forms.
    "sum_2dec": lambda c: F.sum(F.round(F.col(c) * 100).cast("long")).cast("double")
    / 100,
    "avg_2dec": lambda c: F.sum(F.round(F.col(c) * 100).cast("long")).cast("double")
    / 100
    / F.count(c),
    # exact interpolated median (matches ANSI percentile_cont semantics);
    # replaces the reference's internal ApproximatePercentile construction
    # (``utils.scala:226-240``) — see also approx_median below for scale.
    "median": lambda c: F.expr(f"percentile(`{c}`, 0.5)"),
    # accuracy 2000 (rank error ≤ n/2000) instead of the 10000 default:
    # measured ~20-25% cheaper per row at 12M+ rows with no visible medians
    # drift on 2-decimal data; the gate query's rank-guarantee check reads
    # the same constant (queries/relational.py:_APPROX_PERCENTILE_ACCURACY)
    "approx_median": lambda c: F.percentile_approx(c, 0.5, 2000),
    "stddev": lambda c: F.stddev_samp(c),
    "stddev_pop": lambda c: F.stddev_pop(c),
    "countTrue": lambda c: F.sum(F.col(c).cast("int")),
}

ALL_LABEL = "All"

#: Auto-routing threshold for the counted-median hybrid: metrics whose
#: observed distinct-value count (approx_count_distinct probe, rsd 0.05)
#: is at or below this ride the EXACT count-by-value median branch; above
#: it the KLL-style sketch wins (counting state would exceed sketch state).
#: ~10k rows of (group, value, count) state per fine group is comfortably
#: executor-local at any scale; the crossover measured at sf0.1 is far
#: above the value grids this targets (quantities: 50, discounts: 11).
COUNTED_MEDIAN_MAX_DISTINCT = 10_000

#: Process-level routing cache: (input files, metric sources) -> routed
#: aliases. Repeated calls over the same file-backed input (bench
#: repeats, notebook re-runs) skip the probe job entirely; frames whose
#: input files are unknowable (pure in-memory lineage) are never cached.
#:
#: Invalidation contract: the key is the sorted ``inputFiles()`` list —
#: any NEW write produces new part-file names (parquet writers always
#: fresh-name), so re-reading a re-written table re-probes naturally.
#: The one stale case is an in-place byte-overwrite of the SAME file
#: names outside Spark; callers doing that must clear the cache. Bounded
#: FIFO (``_PROBE_CACHE_MAX``) so a long-lived session enumerating many
#: tables cannot grow it without limit.
_PROBE_CACHE: dict[tuple, list[str]] = {}
_PROBE_CACHE_MAX = 256


def _auto_counted_metrics(
    df: DataFrame, metrics: list[tuple[str, str]], probe_rows: int = 100_000
) -> list[str]:
    """Probe distinct-value cardinality of each metric source column with
    ONE column-pruned ``approx_count_distinct`` aggregation (HLL++ —
    near-exact at the grid sizes that matter) over a ``limit(probe_rows)``
    PREFIX — not the full input: the limit stops the scan after the first
    splits, so the probe costs milliseconds instead of a full pass
    (measured: the full-scan probe added ~0.8 s to the sf0.1 flagship,
    erasing the hybrid's 20% win). Returns the aliases at or below
    :data:`COUNTED_MEDIAN_MAX_DISTINCT`.

    Routing safety: a metric with ≤ threshold distinct values OVERALL can
    never exceed it in a prefix, so the counted route is never missed; a
    high-cardinality metric whose FIRST ``probe_rows`` rows happen to be
    value-clustered can false-positive into the counting branch — that
    costs shuffle state, never correctness (the counted median is exact).
    On a real cluster, catalog column statistics (ANALYZE TABLE ... FOR
    COLUMNS) answer this with no scan at all; the probe is the
    engine-agnostic fallback, and repeat calls over the same file-backed
    input hit :data:`_PROBE_CACHE` (no job at all)."""
    key = None
    try:
        files = tuple(sorted(df.inputFiles()))
        if files:
            key = (files, tuple(src for src, _ in metrics))
    except Exception:
        key = None
    if key is not None and key in _PROBE_CACHE:
        routed_srcs = _PROBE_CACHE[key]
        return [alias for src, alias in metrics if src in routed_srcs]
    row = (
        df.limit(probe_rows)
        .agg(
            *[
                F.approx_count_distinct(src).alias(alias)
                for src, alias in metrics
            ]
        )
        .first()
    )
    routed = [
        alias
        for _, alias in metrics
        if (row[alias] or 0) <= COUNTED_MEDIAN_MAX_DISTINCT
    ]
    if key is not None:
        while len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:  # FIFO eviction
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))
        _PROBE_CACHE[key] = [
            src for src, alias in metrics if alias in routed
        ]
    return routed


def categorized_summary(
    df: DataFrame,
    metrics: list[tuple[str, str]],
    aggs: list[str],
    categories: list[str],
    include_all: bool = True,
    round_digits: int | None = 4,
    counted_median_metrics: list[str] | str | None = "auto",
    base_cache: bool | None = None,
) -> DataFrame:
    """Grouping-sets summary over ``categories`` (+ optional grand total).

    Parameters mirror the reference's ``createTableCategorized``:
    ``metrics`` = [(source column, output alias)], ``aggs`` = names from
    :data:`AGG_FUNCTIONS`, ``categories`` = category column names.

    Single-pass plan: GROUPING SETS computes all agg×metric cells in one
    shuffle; ``stack`` unpivots agg-fns into rows (no extra shuffle).

    ``counted_median_metrics`` (aliases) routes those metrics'
    ``approx_median`` cells through an EXACT count-by-value median
    instead of the KLL-style sketch — the right plan for low-cardinality
    metrics (quantities, discount grids: tens of distinct values), where
    per-row sketch updates cost ~4× a hash-count and the counting state
    (one row per distinct value per fine group) is smaller than the
    sketch. Exact values trivially satisfy the sketch's published rank
    guarantee, so gate semantics are unchanged; high-cardinality metrics
    keep the sketch. See :func:`_counted_medians` for the plan.

    Routing (round 7): the default ``"auto"`` derives the list from an
    ``approx_count_distinct`` probe (:func:`_auto_counted_metrics`,
    threshold :data:`COUNTED_MEDIAN_MAX_DISTINCT`) so every caller gets
    the hybrid without hand-tuning; pass an explicit alias list to
    override, or ``None`` / ``[]`` to force the pure sketch plan.

    Scan sharing (round 10): both branches (grouping-sets agg +
    count-by-value medians) consume the input, so the operator now feeds
    them from ONE narrow projection (categories + metric sources + cents
    columns — the only columns either branch touches). Measured at
    sf0.1/local[32]: the projection alone cut the flagship operator from
    ~3.3 s to ~2.3 s best-of-4. PERSISTING that projection was ALSO
    measured — and rejected as the default: cache fill + in-memory
    rescan cost ~3.3 s vs ~2.3 s for two pruned parquet scans (columnar
    scan + codegen beats MEMORY_AND_DISK serialization), and at 100 TB a
    fact-sized cache is cluster memory pressure while a second
    column-pruned scan is cheap and elastic. ``base_cache`` therefore
    defaults to no caching; pass ``True`` only when the input's lineage
    is EXPENSIVE (not a bare table scan — e.g. a join or UDF stage whose
    recompute dwarfs a cache round-trip). A ``True`` cache is stashed on
    the result's ``_stage_caches`` (caller-owned lifecycle, repo
    convention).
    """
    if not metrics or not aggs:
        raise ValueError("metrics and aggs must be non-empty")
    unknown = [a for a in aggs if a not in AGG_FUNCTIONS]
    if unknown:
        raise ValueError(f"unknown aggregations: {unknown}")
    if counted_median_metrics == "auto":
        counted_median_metrics = (
            _auto_counted_metrics(df, metrics)
            if "approx_median" in aggs
            else []
        )
    counted = [
        alias
        for _, alias in metrics
        if counted_median_metrics
        and alias in counted_median_metrics
        and "approx_median" in aggs
    ]

    cats = list(categories)
    # 2dec aggs: materialize each metric's cents column ONCE in a
    # pre-projection — BEFORE the grouping-sets Expand multiplies rows by
    # |sets| and before codegen evaluates each agg's expression
    # separately (sum_2dec + avg_2dec on the same metric would otherwise
    # round×100 twice per expanded row; measured ~0.6 s of the sf0.1
    # flagship)
    cents_needed = {
        alias: src
        for src, alias in metrics
        if any(a in ("sum_2dec", "avg_2dec") for a in aggs)
    }
    cents_col = {alias: f"__c2_{alias}" for alias in cents_needed}
    # narrow projection: the only columns either branch reads (column
    # pruning for both the scan and — when persisted — the cache)
    need_cols = list(dict.fromkeys(cats + [src for src, _ in metrics]))
    df = df.select(
        *need_cols,
        *[
            F.round(F.col(src) * 100).cast("long").alias(cents_col[alias])
            for alias, src in cents_needed.items()
        ],
    )
    stage_caches: list[DataFrame] = []
    if base_cache is None:
        base_cache = False  # measured: pruned re-scan beats cache (docstring)
    if base_cache:
        df = df.persist()
        stage_caches.append(df)
    sets = [(c,) for c in cats] + ([()] if include_all else [])
    grouped = df.groupingSets(sets, *[F.col(c) for c in cats]) if cats else df.groupBy()

    # Division / DivisionCategory labels from grouping() indicators — these
    # must be computed inside the same aggregate projection as the metrics.
    division = F.lit(ALL_LABEL)
    div_cat = F.lit(ALL_LABEL)
    for c in reversed(cats):
        is_active = F.grouping(c) == 0
        division = F.when(is_active, F.lit(c)).otherwise(division)
        div_cat = F.when(is_active, F.col(c).cast("string")).otherwise(div_cat)

    agg_cols: list[Column] = [
        division.alias("Division"),
        div_cat.alias("DivisionCategory"),
    ]
    for a in aggs:
        fn = AGG_FUNCTIONS[a]
        for src, alias in metrics:
            if a == "approx_median" and alias in counted:
                # cell filled post-stack from the exact counting branch
                agg_cols.append(
                    F.lit(None).cast("double").alias(f"__{a}__{alias}")
                )
                continue
            if a == "sum_2dec":
                expr = (
                    F.sum(F.col(cents_col[alias])).cast("double") / 100
                ).cast("double")
            elif a == "avg_2dec":
                expr = (
                    F.sum(F.col(cents_col[alias])).cast("double")
                    / 100
                    / F.count(F.col(cents_col[alias]))
                ).cast("double")
            else:
                expr = fn(src).cast("double")
            if round_digits is not None:
                expr = F.round(expr, round_digits)
            agg_cols.append(expr.alias(f"__{a}__{alias}"))
    out = grouped.agg(*agg_cols)

    # Unpivot the agg-fn dimension: stack(n, label_1, v_11..v_1N, ...).
    n_metrics = len(metrics)
    stack_args: list[str] = []
    for a in aggs:
        stack_args.append(f"'{a}'")
        stack_args.extend(f"`__{a}__{alias}`" for _, alias in metrics)
    out_names = ", ".join(["aggregation"] + [f"`{alias}`" for _, alias in metrics])
    stacked = out.select(
        "Division",
        "DivisionCategory",
        F.expr(
            f"stack({len(aggs)}, {', '.join(stack_args)}) as ({out_names})"
        ),
    )
    stacked = stacked.select(
        "Division", "DivisionCategory", "aggregation", *[alias for _, alias in metrics]
    )
    if not counted:
        stacked._stage_caches = stage_caches
        return stacked
    meds = _counted_medians(
        df,
        [(src, alias) for src, alias in metrics if alias in counted],
        cats,
        include_all,
        round_digits,
    )
    aliases = [alias for _, alias in metrics]
    # NULL category values are a supported contract (a NULL cat1 group
    # stacks as DivisionCategory=NULL): the join-back must be null-safe or
    # those groups' medians silently vanish. Both frames share df's
    # lineage, so alias+qualify every reference (analysis-time ambiguity).
    stk, md = stacked.alias("__stk"), F.broadcast(meds).alias("__meds")
    out = stk.join(
        md,
        F.col("__stk.Division").eqNullSafe(F.col("__meds.Division"))
        & F.col("__stk.DivisionCategory").eqNullSafe(
            F.col("__meds.DivisionCategory")
        ),
        "left",
    ).select(
        F.col("__stk.Division").alias("Division"),
        F.col("__stk.DivisionCategory").alias("DivisionCategory"),
        F.col("__stk.aggregation").alias("aggregation"),
        *[
            (
                F.when(
                    F.col("__stk.aggregation") == "approx_median",
                    F.col(f"__meds.__med_{alias}"),
                ).otherwise(F.col(f"__stk.{alias}")).alias(alias)
                if alias in counted
                else F.col(f"__stk.{alias}").alias(alias)
            )
            for alias in aliases
        ],
    )
    out._stage_caches = stage_caches
    return out


def _counted_medians(
    df: DataFrame,
    metrics: list[tuple[str, str]],
    cats: list[str],
    include_all: bool,
    round_digits: int | None,
) -> DataFrame:
    """Exact per-grouping-set medians by value counting, for
    low-cardinality metrics: one map-side-combined shuffle collapses the
    fact to ``(fine cats, metric, value, count)`` (state = one row per
    distinct value per fine group — BOUNDED by the value grid, smaller
    than a quantile sketch for grids of tens of values and exactly
    mergeable, the 100 TB property the sketch only approximates); each
    fine row then explodes into its grouping-set fates (one row per set —
    the union-free fate pattern), a second tiny keyed shuffle re-counts
    per (Division, DivisionCategory, metric, value), and the
    percentile_cont(0.5) median interpolates the two middle ranks from a
    keyed cumulative window over the value-count frame (group-keyed,
    value-grid-bounded — never data-grain). Returns one row per
    (Division, DivisionCategory) with ``__med_<alias>`` columns."""
    from pyspark.sql.window import Window

    pairs = df.select(
        *[F.col(c) for c in cats],
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(alias).alias("m"),
                        F.col(src).cast("double").alias("v"),
                    )
                    for src, alias in metrics
                ]
            )
        ).alias("_p"),
    ).select(*cats, F.col("_p.m").alias("m"), F.col("_p.v").alias("v"))
    fine = (
        pairs.where(F.col("v").isNotNull())
        .groupBy(*cats, "m", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    fates = [
        F.struct(
            F.lit(c).alias("Division"),
            F.col(c).cast("string").alias("DivisionCategory"),
        )
        for c in cats
    ] + (
        [
            F.struct(
                F.lit(ALL_LABEL).alias("Division"),
                F.lit(ALL_LABEL).alias("DivisionCategory"),
            )
        ]
        if include_all
        else []
    )
    per_set = (
        fine.select(F.explode(F.array(*fates)).alias("_f"), "m", "v", "c")
        .select("_f.Division", "_f.DivisionCategory", "m", "v", "c")
        .groupBy("Division", "DivisionCategory", "m", "v")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    w_cum = (
        Window.partitionBy("Division", "DivisionCategory", "m")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("Division", "DivisionCategory", "m")
    ranked = per_set.select(
        "Division",
        "DivisionCategory",
        "m",
        "v",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_n).alias("n"),
    )
    # 1-based middle ranks r1 = (n+1) div 2, r2 = n div 2 + 1; the value
    # holding rank r is the unique row with cum - c < r <= cum.
    r1 = F.expr("(n + 1) div 2")
    r2 = F.expr("n div 2 + 1")
    med = (
        ranked.groupBy("Division", "DivisionCategory", "m")
        .agg(
            F.min(
                F.when((F.col("cum") - F.col("c") < r1) & (r1 <= F.col("cum")), F.col("v"))
            ).alias("v1"),
            F.min(
                F.when((F.col("cum") - F.col("c") < r2) & (r2 <= F.col("cum")), F.col("v"))
            ).alias("v2"),
        )
        .withColumn("med", (F.col("v1") + F.col("v2")) / 2e0)
    )
    if round_digits is not None:
        med = med.withColumn("med", F.round("med", round_digits))
    return med.groupBy("Division", "DivisionCategory").agg(
        *[
            F.max(F.when(F.col("m") == alias, F.col("med"))).alias(f"__med_{alias}")
            for _, alias in metrics
        ]
    )


def categorized_summary_oracle_sql(
    table: str,
    metrics: list[tuple[str, str]],
    aggs: list[str],
    categories: list[str],
    include_all: bool = True,
    round_digits: int | None = 4,
) -> str:
    """ANSI-SQL equivalent (DuckDB-runnable) of :func:`categorized_summary`:
    UNION ALL of per-(category, agg) GROUP BYs plus grand-total branches."""
    sql_agg = {
        "sum": "SUM({c})",
        "min": "MIN({c})",
        "max": "MAX({c})",
        "count": "COUNT({c})",
        "avg": "AVG({c})",
        "mean": "AVG({c})",
        "avg_stable": "ROUND(SUM({c}), 2) / COUNT({c})",
        "sum_2dec": "CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS DOUBLE) / 100",
        "avg_2dec": (
            "CAST(SUM(CAST(ROUND({c} * 100) AS BIGINT)) AS DOUBLE) / 100"
            " / COUNT({c})"
        ),
        "median": "quantile_cont({c}, 0.5)",
        "stddev": "stddev_samp({c})",
        "stddev_pop": "stddev_pop({c})",
        "countTrue": "SUM(CAST({c} AS INTEGER))",
    }
    pieces: list[str] = []
    group_keys: list[str | None] = list(categories) + ([None] if include_all else [])
    for cat in group_keys:
        for a in aggs:
            cells = []
            for src, alias in metrics:
                cell = sql_agg[a].format(c=f'"{src}"')
                cell = f"CAST({cell} AS DOUBLE)"
                if round_digits is not None:
                    cell = f"ROUND({cell}, {round_digits})"
                cells.append(f'{cell} AS "{alias}"')
            if cat is None:
                head = "SELECT 'All' AS Division, 'All' AS DivisionCategory"
                tail = ""
            else:
                head = (
                    f"SELECT '{cat}' AS Division, "
                    f'CAST("{cat}" AS VARCHAR) AS DivisionCategory'
                )
                tail = f' GROUP BY "{cat}"'
            pieces.append(
                f"{head}, '{a}' AS aggregation, {', '.join(cells)} FROM {table}{tail}"
            )
    return "\nUNION ALL\n".join(pieces)
