"""Mergeable distinct-count sketches (deterministic HyperLogLog).

Scale extension of the reference's distinct counting (countDistinct in
``UTILS/utils.scala:78-96`` summaries; SURVEY §2 A11/A12): at 100 TB an
exact COUNT(DISTINCT) over a high-cardinality key is a full shuffle of the
key universe, while an HLL register table is a fixed ``m``-row state per
group that merges with MAX — the partial-aggregate shape Spark pushes
map-side automatically.

Unlike ``approx_count_distinct`` (whose HLL++ register layout is a Spark
implementation detail), this sketch is DETERMINISTIC AND ENGINE-PORTABLE:

- register index  = low ``b`` bits of a 60-bit md5-derived hash;
- rho             = leading-zero count of the remaining ``R = 60 - b`` bits
                    plus one, computed as ``R + 1 - bit_length(w)`` where
                    ``bit_length(w) = length(bin(w))`` — Spark's ``bin`` and
                    DuckDB's ``bin`` both print without leading zeros, so the
                    value is identical in both engines;
- the harmonic sum ``Σ 2^-M[j]`` is accumulated as the INTEGER
  ``S = Σ 2^(R + 1 - M[j])`` (exponent = bit_length, ≤ 2^(R+1) per term, ≤
  m·2^(R+1) ≤ 2^61 total — exact in int64, so summation order cannot change
  the result the way a floating-point fold could);
- estimate        = alpha_m·m²·2^(R+1) / S, with the standard linear-counting
  branch ``m·ln(m/zeros)`` when the raw estimate ≤ 2.5·m and empty registers
  remain.

Every step is exactly reproducible in ANSI SQL, so the sketch estimate
passes the bit-exact oracle gate instead of a weaker rows-only contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_numerator(b: int) -> float:
    """alpha_m · m² · 2^(R+1) as one double constant — embedding the same
    literal in the Spark plan and the oracle SQL keeps the division
    bit-identical (no associativity drift between engines)."""
    m = 1 << b
    return _alpha(m) * m * m * float(1 << (61 - b))


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, b: int = 8
) -> DataFrame:
    """Per-(group, register) MAX-rho state — the mergeable sketch.

    One shuffle on (group, bucket); map-side partial MAX makes the reduce
    input at most ``m`` rows per group per task regardless of data volume.
    Two register frames over disjoint data merge by unioning and re-MAXing
    (see ``hll_merge``) — the property that makes sketches cheap to
    combine across partitions, days, or tables.
    """
    m = 1 << b
    R = 60 - b
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = F.shiftrightunsigned(h, b)
    bit_length = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            (F.lit(R + 1) - bit_length).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge two register tables (union + MAX): sketch(A ∪ B)."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], b: int = 8) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    The harmonic sum is integer-exact (see module docstring); only the final
    one-per-group division/log touches floating point, and both are written
    identically in the oracle SQL."""
    m = 1 << b
    R = 60 - b
    term = F.pow(F.lit(2.0), F.lit(R + 1) - F.col("reg")).cast("long")
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(term).alias("s_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    s_total = F.col("s_present") + zeros * F.lit(1 << (R + 1))
    raw = F.lit(hll_numerator(b)) / s_total
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per_group.select(
        *group_cols, F.round(est.cast("double"), 4).alias("hll_estimate")
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, b: int = 8
) -> DataFrame:
    """End-to-end: group → HLL distinct estimate of ``value_col``."""
    return hll_estimate(hll_registers(df, group_cols, value_col, b), group_cols, b)


#: universal-hash rows for the count-min sketch — (a·h + b) mod p mod w with
#: the same Mersenne prime as the MinHash permutations; a < 2^31 and h < 2^32
#: keep a·h < 2^63 (no overflow, identical in any int64 engine).
_CMS_AB = [(1000000007, 12345), (998244353, 67891), (774712353, 24680), (452930477, 13579)]
_CMS_P = 2147483647


def cms_table(df: DataFrame, value_col: str, w: int = 1024) -> DataFrame:
    """Count-min sketch as a (row, bucket, cnt) table — d=4 rows × ``w``
    buckets of INTEGER counts (order-independent sums: bit-exact anywhere).

    The sketch is a fixed d·w-row frame no matter the input volume — the
    100 TB shape: one shuffle on (row, bucket) with map-side partial sums,
    then point estimates are broadcast-join lookups. Scale counterpart of
    the reference's exact value_counts-style frequency tables
    (fl_aud.R:29-33)."""
    h32 = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("cms_row"),
                (((F.lit(a) * h32 + F.lit(b)) % F.lit(_CMS_P)) % F.lit(w)).alias(
                    "cms_bucket"
                ),
            )
            for j, (a, b) in enumerate(_CMS_AB)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.cms_row").alias("cms_row"), F.col("rb.cms_bucket").alias("cms_bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, items: DataFrame, value_col: str, w: int = 1024) -> DataFrame:
    """Point estimates for ``items[value_col]``: min over the d row counters.
    Estimates are exact integers ≥ the true count (classic CMS guarantee)."""
    h32 = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    probes = items.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("cms_row"),
                        (((F.lit(a) * h32 + F.lit(b)) % F.lit(_CMS_P)) % F.lit(w)).alias(
                            "cms_bucket"
                        ),
                    )
                    for j, (a, b) in enumerate(_CMS_AB)
                ]
            )
        ).alias("rb"),
    ).select(value_col, "rb.cms_row", "rb.cms_bucket")
    return (
        probes.join(F.broadcast(sketch), ["cms_row", "cms_bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_estimate"))
    )


def cms_hash_sql(h32: str, j: int, w: int) -> str:
    a, b = _CMS_AB[j]
    return f"(({a} * {h32} + {b}) % {_CMS_P}) % {w}"


# ---------------------------------------------------------------------------
# Bloom filter: sparse (word, bits) bitmap for semi-join pruning.
# ---------------------------------------------------------------------------

#: 3 universal-hash functions; bit position = (a·h + b) mod p mod m_bits.
#: Words are 32-bit (bit index ≤ 31) so the per-bit term 2^bit stays well
#: inside int64 via an exact pow(2.0, bit) — no shift-by-column needed in
#: either engine.
_BLOOM_K = 3


def _h32(value_col: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def _bloom_probe_cols(value_col: str, m_bits: int) -> Column:
    h = _h32(value_col)
    entries = []
    for j in range(_BLOOM_K):
        a, b = _CMS_AB[j]
        pos = ((F.lit(a) * h + F.lit(b)) % F.lit(_CMS_P)) % F.lit(m_bits)
        entries.append(
            F.struct(
                F.shiftrightunsigned(pos, 5).alias("word"),
                F.pow(F.lit(2.0), pos.bitwiseAND(F.lit(31))).cast("long").alias("bit"),
            )
        )
    return F.array(*entries)


def bloom_build(df: DataFrame, value_col: str, m_bits: int = 65536) -> DataFrame:
    """Build a Bloom filter over ``df[value_col]`` as a SPARSE (word, bits)
    table — at most ``m_bits/32`` rows regardless of input size, aggregated
    with ``bit_or`` (order-independent: bit-exact in any engine).

    The 100 TB use: build on the small/filtered side of a join, broadcast
    the word table, and pre-filter the probe side BEFORE its shuffle —
    the manual twin of Spark's runtime row-level filtering, but portable
    and explicitly testable."""
    return (
        df.select(F.explode(_bloom_probe_cols(value_col, m_bits)).alias("e"))
        .select(F.col("e.word").alias("word"), F.col("e.bit").alias("bit"))
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame, df: DataFrame, value_col: str, m_bits: int = 65536
) -> DataFrame:
    """Per-distinct-value membership verdict: true iff ALL k probe bits are
    set. Returns (value_col, bloom_pass) — join it (broadcast) back to the
    probe relation to prune rows. No false negatives, bounded false
    positives (classic Bloom guarantee)."""
    probes = (
        df.select(value_col)
        .distinct()
        .select(value_col, F.explode(_bloom_probe_cols(value_col, m_bits)).alias("e"))
        .select(value_col, F.col("e.word").alias("word"), F.col("e.bit").alias("bit"))
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit")) != 0, 1
            ).otherwise(0),
        )
        .groupBy(value_col)
        .agg((F.sum("hit") == F.lit(_BLOOM_K)).alias("bloom_pass"))
    )


def bloom_hash_sql(h32: str, j: int, m_bits: int) -> tuple[str, str]:
    """(word_expr, bit_term_expr) for the oracle replica."""
    a, b = _CMS_AB[j]
    pos = f"((({a} * {h32} + {b}) % {_CMS_P}) % {m_bits})"
    return f"({pos} >> 5)", f"CAST(power(2.0, {pos} & 31) AS BIGINT)"


# ---------------------------------------------------------------------------
# Mergeable histogram quantiles: fixed-bin counts per group.
# ---------------------------------------------------------------------------


def hist_counts(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 512,
) -> DataFrame:
    """Equi-width histogram as a (group, bin, cnt) table — at most ``bins``
    rows per group forever (merge = add counts), the bounded-state quantile
    path next to the exact-percentile flagship (operators/summarize.py).

    Determinism across engines: the bin index is ONE multiply of the same
    double literal (``bins/(hi-lo)``) on the same input, and IEEE ops are
    deterministic — identical expression → identical floor on both sides."""
    mult = bins / (hi - lo)
    raw = F.floor((F.col(value_col) - F.lit(lo)) * F.lit(mult)).cast("int")
    bin_idx = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 512,
) -> DataFrame:
    """Quantile estimates from the histogram: the LOWER EDGE of the bin
    holding the ceil(q·n)-th value (integer cumulative counts → the chosen
    bin is exact; the edge value is one multiply+add of literals)."""
    from pyspark.sql.window import Window

    width = (hi - lo) / bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*group_cols)).alias("total"),
    )
    picks = []
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("total"))
        picks.append(
            cum.where(F.col("cum") >= target)
            .groupBy(*group_cols)
            .agg(F.min("bin").alias("bin"))
            .select(
                *group_cols,
                F.lit(q).alias("q"),
                F.round(
                    (F.lit(lo) + F.col("bin") * F.lit(width)).cast("double"), 4
                ).alias("est_value"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def hist_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 512,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> str:
    """DuckDB replica (same literals, same expression shapes)."""
    mult = repr(bins / (hi - lo))
    width = repr((hi - lo) / bins)
    q_rows = ", ".join(f"({repr(q)})" for q in qs)
    return f"""
    WITH hist AS (
      SELECT {group_col},
             least(greatest(CAST(floor(({value_col} - {repr(lo)}) * {mult}) AS INT), 0), {bins - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} WHERE {value_col} IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT {group_col}, bin,
             SUM(cnt) OVER (PARTITION BY {group_col} ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER (PARTITION BY {group_col}) AS total
      FROM hist
    )
    SELECT {group_col}, q,
           ROUND(CAST({repr(lo)} + MIN(bin) * {width} AS DOUBLE), 4) AS est_value
    FROM cum CROSS JOIN (VALUES {q_rows}) qv(q)
    WHERE cum >= ceil(q * total)
    GROUP BY {group_col}, q
    """


def hll_oracle_sql(
    table: str, group_col: str, value_col: str, b: int = 8
) -> str:
    """DuckDB replica of the sketch pipeline (shared constants, so the Spark
    and oracle sides cannot drift)."""
    m = 1 << b
    R = 60 - b
    numerator = repr(hll_numerator(b))
    return f"""
    WITH h AS (
      SELECT {group_col} AS grp,
             CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM {table}
    ),
    reg AS (
      SELECT grp, h & {m - 1} AS bucket,
             MAX(CASE WHEN (h >> {b}) = 0 THEN {R + 1}
                 ELSE {R + 1} - length(bin(h >> {b})) END) AS reg
      FROM h GROUP BY grp, bucket
    ),
    agg AS (
      SELECT grp, COUNT(*) AS n_present,
             SUM(CAST(power(2.0, {R + 1} - reg) AS BIGINT)) AS s_present
      FROM reg GROUP BY grp
    ),
    est AS (
      SELECT grp,
             {numerator} / (s_present + ({m} - n_present) * {1 << (R + 1)}) AS raw,
             {m} - n_present AS zeros
      FROM agg
    )
    SELECT grp AS {group_col},
           ROUND(CAST(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                      THEN {float(m)} * ln({float(m)} / zeros)
                      ELSE raw END AS DOUBLE), 4) AS hll_estimate
    FROM est
    """
