"""Sketch queries: deterministic HLL distinct-count estimates next to their
exact counterparts, oracle-checked bit-exactly (see functions/sketches.py for
why the estimate is engine-portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import sketches
from azure_medicine_data_engineering_spark.queries.registry import register, table as _t


def _hll_with_exact_sql(table: str, group_col: str, value_col: str) -> str:
    hll = sketches.hll_oracle_sql(table, group_col, value_col, b=8)
    return f"""
    WITH hll AS ({hll}),
    exact AS (
      SELECT {group_col}, CAST(COUNT(DISTINCT {value_col}) AS BIGINT) AS n_exact
      FROM {table} GROUP BY {group_col}
    )
    SELECT hll.{group_col}, exact.n_exact, hll.hll_estimate
    FROM hll JOIN exact USING ({group_col})
    """


def _hll_with_exact(
    spark: SparkSession, sf_dir: str, table: str, group_col: str, value_col: str
) -> DataFrame:
    df = _t(spark, sf_dir, table)
    est = sketches.hll_distinct(df, [group_col], value_col, b=8)
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).cast("long").alias("n_exact")
    )
    return est.join(exact, group_col).select(group_col, "n_exact", "hll_estimate")


@register(
    "hll_distinct_parts_by_flag",
    _hll_with_exact_sql("lineitem", "l_returnflag", "l_partkey"),
)
def q_hll_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~2000 distinct parts per returnflag with m=256 registers → exercises
    the raw harmonic-mean branch (integer-exact sum; the only FP op is the
    final per-group division by the shared literal numerator)."""
    return _hll_with_exact(spark, sf_dir, "lineitem", "l_returnflag", "l_partkey")


def _cms_sql(w: int = 1024, k: int = 25) -> str:
    from azure_medicine_data_engineering_spark.queries.text_dedup import (
        _NORM_TEXT,
        _TOKS,
    )

    sk_rows = "\n      UNION ALL\n      ".join(
        f"SELECT {j} AS cms_row, {sketches.cms_hash_sql('h32', j, w)} AS cms_bucket, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM h GROUP BY 2"
        for j in range(len(sketches._CMS_AB))
    )
    probe_rows = "\n      UNION ALL\n      ".join(
        f"SELECT token, n_exact, {j} AS cms_row, "
        f"{sketches.cms_hash_sql('h32', j, w)} AS cms_bucket FROM th"
        for j in range(len(sketches._CMS_AB))
    )
    return f"""
    WITH tok AS (
      SELECT unnest({_TOKS.format(t=_NORM_TEXT)}) AS token FROM documents
    ),
    cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tok GROUP BY token),
    top AS (SELECT token, n_exact FROM cnt
            QUALIFY row_number() OVER (ORDER BY n_exact DESC, token) <= {k}),
    h AS (SELECT token, CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h32 FROM tok),
    sk AS (
      {sk_rows}
    ),
    th AS (SELECT token, n_exact,
                  CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h32 FROM top),
    probe AS (
      {probe_rows}
    )
    SELECT p.token, p.n_exact, CAST(MIN(sk.cnt) AS BIGINT) AS cms_estimate
    FROM probe p JOIN sk USING (cms_row, cms_bucket)
    GROUP BY p.token, p.n_exact
    """


@register("cms_token_frequencies", _cms_sql())
def q_cms_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream vs the exact top-25
    token counts (deterministic tie-break: count DESC, token ASC). All
    counters are integers, so the sketch estimate is bit-exact across
    engines; the CMS overestimate property (estimate >= exact) is visible in
    the output columns."""
    from azure_medicine_data_engineering_spark.operators.text import (
        normalized_text,
        tokens,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    tok = docs.select(F.explode(tokens(normalized_text(F.col("text")))).alias("token"))
    tok = tok.persist()  # counted twice: exact top-k + sketch build
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    # TakeOrderedAndProject (distributed top-k), not an unpartitioned window
    top = exact.orderBy(F.col("n_exact").desc(), F.col("token")).limit(25)
    sketch = sketches.cms_table(tok, "token")
    est = sketches.cms_estimate(sketch, top.select("token"), "token")
    _out = top.join(est, "token").select("token", "n_exact", "cms_estimate")
    _out._stage_caches = [tok]  # r15 leak fix
    return _out


@register(
    "histogram_quantiles_price",
    sketches.hist_quantiles_sql(
        "lineitem", "l_returnflag", "l_extendedprice", lo=900.0, hi=105000.0
    ),
)
def q_histogram_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 of l_extendedprice per returnflag from a 512-bin mergeable
    histogram — the bounded-state quantile path next to the exact-percentile
    flagship (`categorized_summary`) and `approx_median` knob. Bin choice is
    one shared-literal multiply (IEEE-deterministic), cumulative counts are
    integers, so the estimate is bit-exact across engines."""
    li = _t(spark, sf_dir, "lineitem")
    hist = sketches.hist_counts(
        li, ["l_returnflag"], "l_extendedprice", lo=900.0, hi=105000.0
    )
    return sketches.hist_quantiles(
        hist, ["l_returnflag"], [0.5, 0.95], lo=900.0, hi=105000.0
    )


def _bloom_sql(m_bits: int = 65536) -> str:
    h_expr = "CAST(('0x' || substr(md5(CAST({v} AS VARCHAR)), 1, 8)) AS BIGINT)"
    build_rows = "\n        UNION ALL\n        ".join(
        "SELECT {w} AS word, {b} AS bit FROM pk".format(
            w=sketches.bloom_hash_sql("h32", j, m_bits)[0],
            b=sketches.bloom_hash_sql("h32", j, m_bits)[1],
        )
        for j in range(sketches._BLOOM_K)
    )
    probe_rows = "\n        UNION ALL\n        ".join(
        "SELECT l_partkey, {w} AS word, {b} AS bit FROM ph".format(
            w=sketches.bloom_hash_sql("h32", j, m_bits)[0],
            b=sketches.bloom_hash_sql("h32", j, m_bits)[1],
        )
        for j in range(sketches._BLOOM_K)
    )
    return f"""
    WITH pk AS (
      SELECT p_partkey, {h_expr.format(v='p_partkey')} AS h32
      FROM part WHERE p_type = 'PROMO'
    ),
    bloom AS (
      SELECT word, bit_or(bit) AS bits FROM (
        {build_rows}
      ) GROUP BY word
    ),
    ph AS (
      SELECT l_partkey, {h_expr.format(v='l_partkey')} AS h32
      FROM (SELECT DISTINCT l_partkey FROM lineitem)
    ),
    pp AS (
      {probe_rows}
    ),
    verdict AS (
      SELECT l_partkey,
             SUM(CASE WHEN (COALESCE(b.bits, 0) & pp.bit) <> 0 THEN 1 ELSE 0 END)
               = {sketches._BLOOM_K} AS bloom_pass
      FROM pp LEFT JOIN bloom b USING (word) GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_rows,
           CAST(SUM(CASE WHEN v.bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN l.l_partkey IN (SELECT p_partkey FROM pk)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN v.bloom_pass THEN 1 ELSE 0 END)
                - SUM(CASE WHEN l.l_partkey IN (SELECT p_partkey FROM pk)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive
    FROM lineitem l JOIN verdict v USING (l_partkey)
    """


@register("bloom_prune_promo_lineitems", _bloom_sql())
def q_bloom_prune_promo_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: build on the filtered part side
    (PROMO keys), broadcast the sparse word table, and count how many
    lineitem rows the filter passes vs the exact semi-join truth. The
    false-positive column makes the Bloom trade-off visible and oracle-
    checkable (no false negatives is implied by n_bloom_pass >= n_true)."""
    li = _t(spark, sf_dir, "lineitem")
    pk = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    bloom = sketches.bloom_build(pk, "p_partkey")
    verdicts = sketches.bloom_might_contain(bloom, li, "l_partkey")
    labeled = li.join(F.broadcast(verdicts), "l_partkey").join(
        F.broadcast(pk.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left",
    )
    return labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("long").alias("n_bloom_pass"),
        F.sum(F.when(F.col("p_partkey").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_true_match"),
        (
            F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
            - F.sum(F.when(F.col("p_partkey").isNotNull(), 1).otherwise(0))
        )
        .cast("long")
        .alias("n_false_positive"),
    )


@register(
    "hll_distinct_users_by_type",
    _hll_with_exact_sql("events", "event_type", "user_id"),
)
def q_hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~150 distinct users per event type with m=256 registers → exercises
    the linear-counting branch (m·ln(m/zeros) over integer-exact zeros)."""
    return _hll_with_exact(spark, sf_dir, "events", "event_type", "user_id")


def _hll_union_sql(b: int = 8) -> str:
    m = 1 << b
    R = 60 - b
    numerator = repr(sketches.hll_numerator(b))
    return f"""
    WITH h AS (
      SELECT o_orderstatus AS grp,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    r0 AS (
      SELECT grp, h & {m - 1} AS bucket,
             MAX(CASE WHEN (h >> {b}) = 0 THEN {R + 1}
                 ELSE {R + 1} - length(bin(h >> {b})) END) AS reg
      FROM h GROUP BY grp, bucket
    ),
    r AS (
      SELECT grp, bucket, reg FROM r0
      UNION ALL
      SELECT 'F|O' AS grp, bucket, reg FROM r0
    ),
    reg2 AS (SELECT grp, bucket, MAX(reg) AS reg FROM r GROUP BY grp, bucket),
    agg AS (
      SELECT grp, COUNT(*) AS n_present,
             SUM(CAST(power(2.0, {R + 1} - reg) AS BIGINT)) AS s_present
      FROM reg2 GROUP BY grp
    ),
    est AS (
      SELECT grp,
             {numerator} / (s_present + ({m} - n_present) * {1 << (R + 1)}) AS raw,
             {m} - n_present AS zeros
      FROM agg
    ),
    hll AS (
      SELECT grp,
             ROUND(CAST(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                        THEN {float(m)} * ln({float(m)} / zeros)
                        ELSE raw END AS DOUBLE), 4) AS hll_estimate
      FROM est
    ),
    exact AS (
      SELECT o_orderstatus AS grp, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
      UNION ALL
      SELECT 'F|O', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    )
    SELECT hll.grp AS subset, exact.n_exact, hll.hll_estimate
    FROM hll JOIN exact ON hll.grp = exact.grp
    """


@register("hll_union_customer_sets", _hll_union_sql())
def q_hll_union_customer_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA under the oracle gate: per-status HLL registers are
    built ONCE, then the 'F|O' union estimate comes from merging the two
    register sets with MAX — no second pass over the data. Distinct-union
    estimation without re-scanning is the whole point of mergeable sketches
    at 100 TB (e.g. daily sketches → monthly distinct)."""
    o2 = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus").isin("F", "O"))
    r0 = sketches.hll_registers(o2, ["o_orderstatus"], "o_custkey", b=8).persist()
    merged = r0.unionByName(r0.withColumn("o_orderstatus", F.lit("F|O")))
    reg2 = merged.groupBy("o_orderstatus", "bucket").agg(F.max("reg").alias("reg"))
    est = sketches.hll_estimate(reg2, ["o_orderstatus"], b=8)
    exact = o2.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").cast("long").alias("n_exact")
    )
    exact_union = o2.agg(
        F.count_distinct("o_custkey").cast("long").alias("n_exact")
    ).select(F.lit("F|O").alias("o_orderstatus"), "n_exact")
    _out = (
        est.join(exact.unionByName(exact_union), "o_orderstatus")
        .select(
            F.col("o_orderstatus").alias("subset"), "n_exact", "hll_estimate"
        )
    )
    _out._stage_caches = [r0]  # r15 leak fix
    return _out


@register(
    "streaming_hll_distinct_users",
    _hll_with_exact_sql("events", "event_type", "user_id"),
)
def q_streaming_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL registers maintained as bounded streaming state (MAX per bucket);
    estimate equals the batch twin bit-for-bit — same oracle."""
    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_hll_distinct_users,
    )

    return streaming_hll_distinct_users(spark, sf_dir)


def _hll_intersect_sql(b: int = 8) -> str:
    m = 1 << b
    R = 60 - b
    numerator = repr(sketches.hll_numerator(b))
    return f"""
    WITH h AS (
      SELECT o_orderstatus AS grp,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM orders WHERE o_orderstatus IN ('F', 'O')
    ),
    r0 AS (
      SELECT grp, h & {m - 1} AS bucket,
             MAX(CASE WHEN (h >> {b}) = 0 THEN {R + 1}
                 ELSE {R + 1} - length(bin(h >> {b})) END) AS reg
      FROM h GROUP BY grp, bucket
    ),
    r AS (
      SELECT grp, bucket, reg FROM r0
      UNION ALL
      SELECT 'F|O' AS grp, bucket, reg FROM r0
    ),
    reg2 AS (SELECT grp, bucket, MAX(reg) AS reg FROM r GROUP BY grp, bucket),
    agg AS (
      SELECT grp, COUNT(*) AS n_present,
             SUM(CAST(power(2.0, {R + 1} - reg) AS BIGINT)) AS s_present
      FROM reg2 GROUP BY grp
    ),
    est AS (
      SELECT grp,
             {numerator} / (s_present + ({m} - n_present) * {1 << (R + 1)}) AS raw,
             {m} - n_present AS zeros
      FROM agg
    ),
    hll AS (
      SELECT grp,
             ROUND(CAST(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                        THEN {float(m)} * ln({float(m)} / zeros)
                        ELSE raw END AS DOUBLE), 4) AS e
      FROM est
    ),
    piv AS (
      SELECT SUM(CASE WHEN grp = 'F' THEN e END) AS est_f,
             SUM(CASE WHEN grp = 'O' THEN e END) AS est_o,
             SUM(CASE WHEN grp = 'F|O' THEN e END) AS est_union
      FROM hll
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_custkey HAVING COUNT(DISTINCT o_orderstatus) = 2
      ) t
    )
    SELECT est_f, est_o, est_union,
           (est_f + est_o) - est_union AS est_intersection,
           n_exact
    FROM piv CROSS JOIN exact
    """


@register("hll_intersect_customer_sets", _hll_intersect_sql())
def q_hll_intersect_customer_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra, part 2: intersection cardinality by
    inclusion-exclusion over MERGEABLE register sets — est(F) + est(O) −
    est(F∪O), where the union estimate merges the two register tables with
    MAX instead of re-scanning. The per-subset estimates are rounded before
    the pivot (same as the union query), so the final arithmetic is three
    deterministic double ops mirrored in the oracle. Exact truth
    (customers with BOTH order statuses) rides along for visible error."""
    o2 = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus").isin("F", "O"))
    r0 = sketches.hll_registers(o2, ["o_orderstatus"], "o_custkey", b=8).persist()
    merged = r0.unionByName(r0.withColumn("o_orderstatus", F.lit("F|O")))
    reg2 = merged.groupBy("o_orderstatus", "bucket").agg(F.max("reg").alias("reg"))
    est = sketches.hll_estimate(reg2, ["o_orderstatus"], b=8)
    piv = est.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", F.col("hll_estimate"))).alias("est_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", F.col("hll_estimate"))).alias("est_o"),
        F.sum(F.when(F.col("o_orderstatus") == "F|O", F.col("hll_estimate"))).alias("est_union"),
    )
    exact = (
        o2.groupBy("o_custkey")
        .agg(F.count_distinct("o_orderstatus").alias("k"))
        .where(F.col("k") == 2)
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    _out = (
        piv.crossJoin(F.broadcast(exact))
        .select(
            "est_f", "est_o", "est_union",
            ((F.col("est_f") + F.col("est_o")) - F.col("est_union")).alias("est_intersection"),
            "n_exact",
        )
    )
    _out._stage_caches = [r0]  # r15 leak fix
    return _out
