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


def categorized_summary(
    df: DataFrame,
    metrics: list[tuple[str, str]],
    aggs: list[str],
    categories: list[str],
    include_all: bool = True,
    round_digits: int | None = 4,
) -> DataFrame:
    """Grouping-sets summary over ``categories`` (+ optional grand total).

    Parameters mirror the reference's ``createTableCategorized``:
    ``metrics`` = [(source column, output alias)], ``aggs`` = names from
    :data:`AGG_FUNCTIONS`, ``categories`` = category column names.

    Single-pass plan: GROUPING SETS computes all agg×metric cells in one
    shuffle; ``stack`` unpivots agg-fns into rows (no extra shuffle).
    """
    if not metrics or not aggs:
        raise ValueError("metrics and aggs must be non-empty")
    unknown = [a for a in aggs if a not in AGG_FUNCTIONS]
    if unknown:
        raise ValueError(f"unknown aggregations: {unknown}")

    cats = list(categories)
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
    return stacked.select(
        "Division", "DivisionCategory", "aggregation", *[alias for _, alias in metrics]
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
