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
) -> DataFrame:
    """Fused quality report: ``(description, columnName, number)``.

    ``keep_zero_rows=False`` reproduces the reference's filter keeping only
    violations (``stydyGrB.scala:65`` keeps rows with number > 0).
    """
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

    row = df.agg(*aggs).collect()[0].asDict()

    # Second scan: z-score violation counts using the scalar moments.
    if zscore_cols:
        z_aggs = []
        for c in zscore_cols:
            mean, std = row[f"__mean__{c}"], row[f"__std__{c}"]
            if mean is None or std is None or std == 0:
                z_aggs.append(F.lit(0).cast("long").alias(f"__z__{c}"))
            else:
                col = F.col(f"`{c}`")
                z = (col - F.lit(mean)) / F.lit(std)
                z_aggs.append(
                    F.count(F.when(F.abs(z) > F.lit(z_threshold), 1)).alias(f"__z__{c}")
                )
        zrow = df.agg(*z_aggs).collect()[0].asDict()
    else:
        zrow = {}

    records: list[tuple[str, str, int]] = []
    for c in null_cols:
        records.append((DESC_NULLS, c, int(row[f"__null__{c}"])))
    for r in ranges:
        records.append((DESC_RANGE, r.column, int(row[f"__range__{r.column}"])))
    for c in zscore_cols:
        records.append((DESC_OUTLIER, c, int(zrow[f"__z__{c}"])))

    if not keep_zero_rows:
        records = [r for r in records if r[2] > 0]
    return spark.createDataFrame(records, REPORT_SCHEMA)


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
    count rows whose derived month interval falls outside [lo, hi]."""
    spark = df.sparkSession
    aggs = []
    for r in rules:
        months = F.months_between(F.col(f"`{r.later}`"), F.col(f"`{r.earlier}`"))
        aggs.append(
            F.count(F.when((months < r.lo) | (months > r.hi), 1)).alias(r.name)
        )
    row = df.agg(*aggs).collect()[0].asDict()
    records = [(DESC_RANGE, r.name, int(row[r.name])) for r in rules]
    return spark.createDataFrame(records, REPORT_SCHEMA)


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
    sessions (per call they pin only two 1-row frames)."""
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
    ).persist()
    with_med = df.crossJoin(F.broadcast(meds))
    mads = with_med.agg(
        *[
            F.round(
                F.expr(f"percentile(abs(`{c}` - `_med_{c}`), 0.5)"), round_digits
            ).alias(f"_mad_{c}")
            for c in cols
        ]
    ).persist()
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
    out._stage_caches = [meds, mads]
    return out
