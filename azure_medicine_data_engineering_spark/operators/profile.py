"""One-pass table profiling — the `describe`-style inspection the reference
does interactively (``printSchema`` / ``describe`` / ``display`` — SURVEY §5
"visual inspection") turned into a single conditional-aggregation operator.

For every column: nulls, distinct count, min/max (as strings for a uniform
schema). One scan regardless of column count — same fusion strategy as
``operators/quality.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None, approx_distinct: bool = False) -> DataFrame:
    """Per-column profile: (columnName, dataType, n_rows, n_null, n_distinct,
    min_value, max_value). ``approx_distinct`` switches to HLL for scale
    (exact by default so results are oracle-comparable)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    distinct_fn = F.approx_count_distinct if approx_distinct else F.countDistinct

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        qc = F.col(f"`{c}`")
        aggs.append(F.count(F.when(qc.isNull(), 1)).alias(f"__null__{c}"))
        aggs.append(distinct_fn(qc).alias(f"__dist__{c}"))
        aggs.append(F.min(qc).cast("string").alias(f"__min__{c}"))
        aggs.append(F.max(qc).cast("string").alias(f"__max__{c}"))
    agged = df.agg(*aggs)

    # unpivot the single wide row into per-column records via stack (stays
    # distributed; no collect)
    stack_args = []
    for c in cols:
        stack_args.extend(
            [
                f"'{c}'",
                f"'{dtypes[c]}'",
                "`__n`",
                f"`__null__{c}`",
                f"`__dist__{c}`",
                f"`__min__{c}`",
                f"`__max__{c}`",
            ]
        )
    out_cols = "columnName, dataType, n_rows, n_null, n_distinct, min_value, max_value"
    return agged.select(
        F.expr(f"stack({len(cols)}, {', '.join(stack_args)}) as ({out_cols})")
    ).select(
        "columnName",
        "dataType",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


ENTROPY_EXPR = "round(h_u / 1e6, 4)"


def categorical_entropy(
    df: DataFrame, group_col: str, cat_col: str
) -> DataFrame:
    """Shannon entropy (nats) of a categorical column within each group —
    the information-theoretic column profile (near-zero entropy flags a
    constant/degenerate segment, high entropy a high-cardinality one;
    the datasheet companion to plain distinct counts). Per-(group, cat)
    counts collapse the table; per-category ``-(c/n)·ln(c/n)`` terms
    round into integer micro-units before the order-free sum (the PSI
    device). Returns ``(g, n, n_cats, entropy)``.

    Two keyed aggregations; state bounded by distinct (group, category)
    pairs."""
    cells = (
        df.select(F.col(group_col).alias("g"), F.col(cat_col).alias("c"))
        .groupBy("g", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    tot = cells.groupBy("g").agg(F.sum("k").cast("long").alias("n"))
    term_u = (
        "cast(round(-(k * 1e0 / n) * ln(k * 1e0 / n) * 1e6) as bigint)"
    )
    per = (
        cells.join(tot, "g")
        .groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cats"),
            F.sum(F.expr(term_u)).cast("long").alias("h_u"),
        )
    )
    return per.select("g", "n", "n_cats", F.expr(ENTROPY_EXPR).alias("entropy"))


MI_EXPR = "round(mi_u / 1e6, 4)"


def mutual_information(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Mutual information (nats) between two categorical columns — the
    dependence measure that catches what correlation can't (nonlinear,
    categorical): ``I = Σ (c/n)·ln(c·n / (r·s))`` over the contingency
    cells with row/column margins. Per-cell terms round into integer
    micro-units before the order-free sum (zero cells contribute 0 by
    absence). The feature-selection companion to
    :func:`categorical_entropy` and Cramér's V. Returns one row
    ``(n, n_a, n_b, mi)``. Cell-frame state only."""
    cells = (
        df.select(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()  # margins + total + terms all read it
    )
    rows = cells.groupBy("a").agg(F.sum("c").cast("long").alias("r"))
    cols = cells.groupBy("b").agg(F.sum("c").cast("long").alias("s"))
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    term_u = (
        "cast(round((c * 1e0 / n) * ln((c * 1e0 * n) / (r * 1e0 * s)) * 1e6)"
        " as bigint)"
    )
    joined = (
        cells.join(rows, "a")
        .join(cols, "b")
        .crossJoin(F.broadcast(tot))
    )
    scal = joined.agg(
        F.max("n").cast("long").alias("n"),
        F.count_distinct("a").cast("long").alias("n_a"),
        F.count_distinct("b").cast("long").alias("n_b"),
        F.sum(F.expr(term_u)).cast("long").alias("mi_u"),
    )
    return scal.select("n", "n_a", "n_b", F.expr(MI_EXPR).alias("mi"))
