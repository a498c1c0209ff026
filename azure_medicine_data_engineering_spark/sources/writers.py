"""Sink operators (SURVEY §2.1 S5, S6).

Parity notes:
- S5 managed-table sink — ``utils.scala:170``:
  ``mode("overwrite").format("delta").option("mergeSchema","true").saveAsTable``.
  Delta is optional here (import-gated); parquet saveAsTable is the fallback and
  behaviorally equivalent for the engine's tests.
- S6 single-file CSV sink — ``studyGrScalaA.scala:125``: ``coalesce(1)`` + tab
  CSV. Kept for tiny exports only; it serializes the write and must never be
  used on large frames (scale anti-pattern, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _delta_available(df: DataFrame) -> bool:
    # Class.forName, not attribute probing: py4j returns a lazy JavaPackage
    # for any dotted path, so `_jvm.io.delta...` never raises on its own.
    try:
        df.sparkSession._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "io.delta.tables.DeltaTable"
        )
        return True
    except Exception:
        return False


def save_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    fmt: str | None = None,
    merge_schema: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    """Managed analytical table sink (S5). Uses Delta when the runtime has it,
    else parquet. ``partition_by`` enables partition pruning for downstream
    scans — at 100 TB every published table should declare it."""
    fmt = fmt or ("delta" if _delta_available(df) else "parquet")
    writer = df.write.mode(mode).format(fmt)
    if merge_schema and fmt == "delta":
        writer = writer.option("mergeSchema", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Path-addressed parquet sink; multi-file, parallel."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_single_csv(
    df: DataFrame,
    path: str,
    delimiter: str = "\t",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    """Single-file CSV export (S6) — tiny result tables only."""
    (
        df.coalesce(1)
        .write.mode(mode)
        .option("delimiter", delimiter)
        .option("header", str(header).lower())
        .csv(path)
    )
