"""Z-order (Morton) multi-column clustering for data skipping.

No counterpart in the reference (its tables are ~10² rows); this is the
standard lakehouse layout optimization for 100 TB scans filtered on more
than one column: interleave the bits of the filter columns into one Morton
key, range-partition + sort files by that key, and every file's min/max
stats become tight on ALL interleaved columns at once — a scan with a
predicate on any subset of them prunes most files without reading them.

The key is built from pure JVM-side integer expressions (shift/and/multiply
— whole-stage-codegen friendly, no UDF), so computing it over 100 TB is a
map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each (non-negative
    integral) column: output bit ``i*len(cols)+j`` is bit ``i`` of column
    ``j``. With k columns and b bits the key fits in k*b bits — keep
    ``k*bits <= 62`` for a long. Columns should be pre-scaled to dense
    non-negative ints (ranks or truncated values); values >= 2**bits wrap
    (only their low bits participate), so pick ``bits`` to cover the
    domain."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n * bits > 62:
        raise ValueError("k*bits must fit in a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * n + j)).cast("long")
    return z


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 16,
    key_col: str = "z_key",
) -> DataFrame:
    """Cluster a frame for multi-column data skipping: compute the Morton
    key, range-repartition into ``n_partitions`` write tasks and sort within
    each. Writing the result (one file per partition) yields files whose
    min/max row-group stats are tight on every interleaved column — the
    write-side half of predicate pushdown. One shuffle (the range exchange);
    everything else is map-local."""
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    return keyed.repartitionByRange(n_partitions, key_col).sortWithinPartitions(
        key_col
    )
