"""Slowly-changing-dimension type 2 merge (versioned dimension history).

Scale extension: the reference publishes dimension snapshots as overwrite
tables (``utils.scala:164-170``); a warehouse that must answer "what was
this customer's segment in March" needs SCD2 — close the open version of a
changed row, append the new version, keep history immutable.

Spark-first shape: ONE equi-join between the open slice of the dimension
and the update snapshot (broadcast when updates are snapshot-sized),
classification by null-safe attribute comparison, and a unionByName of the
four row fates (untouched history, survivors, closed-out versions, new
versions/inserts). No MERGE statement needed, no per-row logic — the whole
operator is codegen-able expressions, and at 100 TB the single shuffle (or
broadcast) on the business key is the only data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply an update snapshot to an SCD2 dimension.

    ``current`` carries (key, *attrs, valid_from, valid_to, is_current);
    ``updates`` carries (key, *attrs). Rows whose attrs differ from their
    open version are closed at ``effective_date`` and re-opened with the
    new values; keys absent from ``current`` insert as new open rows;
    closed history and unchanged rows pass through untouched."""
    open_rows = current.where(F.col(is_current))
    closed_rows = current.where(~F.col(is_current))

    # explicit presence markers (attr nulls are legal values, so presence
    # must not be inferred from them)
    upd = updates.select(
        F.col(key),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.lit(True).alias("_u_present"),
    )
    joined = open_rows.withColumn("_c_present", F.lit(True)).join(
        upd, key, "full_outer"
    )

    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"_u_{a}"))
        same = eq if same is None else (same & eq)
    has_cur = F.col("_c_present").isNotNull()
    upd_present = F.col("_u_present").isNotNull()

    # Single pass over the join output: each row explodes into its fate
    # rows (1 for survivors/inserts, 2 for changed keys: the closed-out old
    # version + the reopened new one). Union-per-fate would replay the join
    # once per branch — this keeps it at exactly one shuffle
    # (tests/test_events_scd2.py::test_scd2_plan_is_single_join guards it).
    def fate(attr_cols, vf, vt, cur):
        return F.struct(
            *[c.alias(a) for a, c in zip(attrs, attr_cols)],
            vf.alias(valid_from),
            vt.alias(valid_to),
            cur.alias(is_current),
        )

    survivor = fate(
        [F.col(a) for a in attrs],
        F.col(valid_from), F.col(valid_to), F.col(is_current),
    )
    closed_v = fate(
        [F.col(a) for a in attrs],
        F.col(valid_from), F.lit(effective_date), F.lit(False),
    )
    reopened = fate(
        [F.col(f"_u_{a}") for a in attrs],
        F.lit(effective_date), F.lit(None).cast("string"), F.lit(True),
    )
    inserted = fate(
        [F.col(f"_u_{a}") for a in attrs],
        F.lit(effective_date), F.lit(None).cast("string"), F.lit(True),
    )
    fates = (
        F.when(has_cur & upd_present & ~same, F.array(closed_v, reopened))
        .when(has_cur, F.array(survivor))
        .otherwise(F.array(inserted))
    )
    merged = joined.select(key, F.explode(fates).alias("_f")).select(
        key, "_f.*"
    )
    return closed_rows.select(
        key, *attrs, valid_from, valid_to, is_current
    ).unionByName(merged)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff between two table versions — the ops tool behind
    every "what changed since yesterday" question (and the validation
    step before promoting a rebuilt table): full outer join on the
    business key, rows classified ``added`` (key only in new),
    ``removed`` (key only in old), ``changed`` (key in both, any compared
    column differs — NULL-safe comparison) or ``unchanged``. Returns the
    per-class summary ``(change, n_rows)`` plus key checksums so a
    misclassified row breaks downstream equality.

    One keyed full-outer join; at 100 TB both sides shuffle once on the
    key (or zero times if bucketed alike)."""
    o = old.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keysum = F.sum(F.col(key_cols[0]).cast("long")).cast("long")
    return (
        joined.select(change.alias("change"), *[F.col(k) for k in key_cols])
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            keysum.alias("key_checksum"),
        )
    )
