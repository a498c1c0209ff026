"""Join strategy helpers for scale (SURVEY §2.3 — the rebuild ships the full
keyed-join vocabulary even though the reference itself only cross-joins).

- ``broadcast_join``: explicit broadcast of a dimension side.
- ``salted_join``: skew mitigation for heavy-hitter keys — the skewed (large)
  side gets a random-ish salt derived deterministically from a row id, the
  small side is exploded ×salt_factor, and the join runs on (key, salt).
  AQE's skew-join handles moderate skew automatically; salting is the
  explicit tool for pathological keys.
- ``bucketed_table``: co-located join via bucketed managed tables — two
  tables bucketed by the same key join without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    large: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    return large.join(F.broadcast(small), on, how)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_factor: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to skewed key distribution.

    The skewed side computes ``salt = hash(salt_source) % salt_factor``
    (deterministic; ``salt_source`` defaults to the key column itself plus a
    monotonic row component is NOT used — callers pass a unique column for a
    uniform spread). The small side is replicated once per salt value via
    explode, then both join on (key, salt) — a hot key's rows spread over
    ``salt_factor`` reducers instead of one."""
    src = F.col(salt_source) if salt_source else F.monotonically_increasing_id()
    left = skewed.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt_factor)))
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, name: str, key: str, buckets: int = 32, sort_by: str | None = None
) -> None:
    """Persist as a bucketed managed table: joins/aggregations on ``key``
    between tables with matching bucketing skip the shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)
