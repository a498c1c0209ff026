"""Deterministic-HLL properties: mergeability (the reason sketches exist at
scale) and accuracy within the theoretical error bound."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import sketches

B = 8
M = 1 << B


@pytest.fixture(scope="module")
def people(spark):
    # 3000 distinct ids across 2 groups, duplicated 3x — duplicates must not
    # move the estimate
    base = spark.range(3000).select(
        (F.col("id") % 2).cast("string").alias("grp"), F.col("id").alias("v")
    )
    return base.unionAll(base).unionAll(base)


def test_estimate_within_hll_error_bound(spark, people):
    est = {
        r.grp: r.hll_estimate
        for r in sketches.hll_distinct(people, ["grp"], "v", b=B).collect()
    }
    for grp, n_true in [("0", 1500), ("1", 1500)]:
        rel_err = abs(est[grp] - n_true) / n_true
        assert rel_err < 3 * 1.04 / (M**0.5), (grp, est[grp], rel_err)


def test_duplicates_do_not_change_sketch(spark, people):
    once = people.distinct()
    a = sketches.hll_distinct(once, ["grp"], "v", b=B).collect()
    b = sketches.hll_distinct(people, ["grp"], "v", b=B).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_merge_equals_sketch_of_union(spark, people):
    lo = people.where(F.col("v") < 1000)
    hi = people.where(F.col("v") >= 1000)
    merged = sketches.hll_merge(
        sketches.hll_registers(lo, ["grp"], "v", b=B),
        sketches.hll_registers(hi, ["grp"], "v", b=B),
        ["grp"],
    )
    direct = sketches.hll_registers(people, ["grp"], "v", b=B)
    est_merged = sorted(
        map(tuple, sketches.hll_estimate(merged, ["grp"], b=B).collect())
    )
    est_direct = sorted(
        map(tuple, sketches.hll_estimate(direct, ["grp"], b=B).collect())
    )
    assert est_merged == est_direct


def test_cms_never_underestimates(spark):
    # zipf-ish frequencies: token i appears (50 - i) times
    rows = [(f"t{i}",) for i in range(50) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, "v string")
    sketch = sketches.cms_table(df, "v", w=64)  # small w forces collisions
    items = df.distinct()
    est = {
        r.v: r.cms_estimate
        for r in sketches.cms_estimate(sketch, items, "v", w=64).collect()
    }
    true = {f"t{i}": 50 - i for i in range(50)}
    assert all(est[t] >= n for t, n in true.items())
    # with d=4 rows, at least the heaviest item should be estimated exactly
    assert est["t0"] == 50


def test_cms_exact_when_no_collisions(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(10) for _ in range(3)], "v string")
    sketch = sketches.cms_table(df, "v", w=4096)  # 10 items in 4096 buckets
    est = sketches.cms_estimate(sketch, df.distinct(), "v", w=4096).collect()
    assert all(r.cms_estimate == 3 for r in est)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(0, 400).select(F.col("id").alias("v"))
    bloom = sketches.bloom_build(members, "v", m_bits=8192)
    probes = spark.range(0, 4000).select(F.col("id").alias("v"))
    verdict = {
        r.v: r.bloom_pass
        for r in sketches.bloom_might_contain(bloom, probes, "v", m_bits=8192).collect()
    }
    assert all(verdict[i] for i in range(400))  # every member passes
    fp = sum(verdict[i] for i in range(400, 4000))
    # m=8192, k=3, n=400 → theoretical fp ≈ 1.5%; allow generous slack
    assert fp / 3600 < 0.08


def test_bloom_word_table_is_sparse_and_bounded(spark):
    members = spark.range(0, 100).select(F.col("id").alias("v"))
    bloom = sketches.bloom_build(members, "v", m_bits=65536).collect()
    assert len(bloom) <= min(65536 // 32, 300)  # ≤ k·n words, ≤ m/32


def test_histogram_quantile_within_one_bin_of_truth(spark):
    import random

    rng = random.Random(99)
    vals = [rng.uniform(0.0, 1000.0) for _ in range(20000)]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    hist = sketches.hist_counts(df, ["grp"], "v", lo=0.0, hi=1000.0, bins=500)
    est = {
        r.q: r.est_value
        for r in sketches.hist_quantiles(
            hist, ["grp"], [0.5, 0.95], lo=0.0, hi=1000.0, bins=500
        ).collect()
    }
    svals = sorted(vals)
    width = 1000.0 / 500
    for q in (0.5, 0.95):
        truth = svals[int(q * len(svals)) - 1]
        assert abs(est[q] - truth) <= 2 * width, (q, est[q], truth)


def test_histogram_merge_is_count_addition(spark):
    df = spark.createDataFrame(
        [("g", float(i % 100)) for i in range(1000)], "grp string, v double"
    )
    lo_half = df.limit(500)
    full_hist = sketches.hist_counts(df, ["grp"], "v", 0.0, 100.0, bins=100)
    # histogram of a subset never exceeds the full histogram's bin counts
    sub_hist = sketches.hist_counts(lo_half, ["grp"], "v", 0.0, 100.0, bins=100)
    full = {r.bin: r.cnt for r in full_hist.collect()}
    sub = {r.bin: r.cnt for r in sub_hist.collect()}
    assert all(sub[b] <= full[b] for b in sub)
    assert sum(full.values()) == 1000


def test_register_state_is_bounded(spark, people):
    regs = sketches.hll_registers(people, ["grp"], "v", b=B)
    per_group = regs.groupBy("grp").count().collect()
    assert all(r["count"] <= M for r in per_group)


def test_incremental_state_merge_equals_full_recompute(spark):
    import datetime as dt

    from azure_medicine_data_engineering_spark.functions.sketches import hll_merge
    from azure_medicine_data_engineering_spark.operators.incremental import (
        day_type_state,
        day_type_user_registers,
        merge_day_type_state,
        state_report,
    )

    rows = [
        (i, dt.datetime(2024, 3, 1 + i % 3, 10 + i % 5), i % 11,
         "click" if i % 2 else "view", float(i) + 0.25)
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    # three-way split: merge must be associative over any batching
    parts = [ev.where(F.col("event_id") % 3 == k) for k in range(3)]
    state = merge_day_type_state(
        merge_day_type_state(day_type_state(parts[0]), day_type_state(parts[1])),
        day_type_state(parts[2]),
    )
    regs = hll_merge(
        hll_merge(
            day_type_user_registers(parts[0]),
            day_type_user_registers(parts[1]),
            ["d", "event_type"],
        ),
        day_type_user_registers(parts[2]),
        ["d", "event_type"],
    )
    merged = state_report(state, regs)
    full = state_report(
        day_type_state(ev), day_type_user_registers(ev)
    )
    key = lambda r: (r.d, r.event_type)  # noqa: E731
    assert sorted(map(tuple, merged.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, full.collect()), key=lambda t: t[:2]
    )
    assert merged.count() == 6  # 3 days x 2 types
