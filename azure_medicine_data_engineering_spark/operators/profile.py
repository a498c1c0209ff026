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
