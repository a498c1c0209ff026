"""Quality-report tests with planted defects and exact expected counts
(FIXTURES.md 'planted defects'; reference utils.scala:121-152)."""

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.quality import (
    DESC_NULLS,
    DESC_OUTLIER,
    DESC_RANGE,
    RangeSpec,
    null_counts,
    quality_report,
)


def _fixture(spark):
    # 60 inliers ~ N(10, ~1), 2 planted far outliers, 3 NULLs, 2 out-of-range.
    rows = [(float(10 + (i % 7) * 0.5), "k") for i in range(60)]
    rows += [(500.0, "outlier"), (-400.0, "outlier")]   # |z| >> 3, also out of range
    rows += [(None, "null")] * 3
    rows += [(80.0, "range"), (-5.0, "range")]          # outside [0, 70], z modest
    return spark.createDataFrame(rows, "suv double, tag string")


def test_planted_defect_counts(spark):
    df = _fixture(spark)
    rep = quality_report(
        df,
        null_cols=["suv"],
        ranges=[RangeSpec("suv", 0, 70)],
        zscore_cols=["suv"],
        keep_zero_rows=True,
    )
    got = {(r.description, r.columnName): r.number for r in rep.collect()}
    assert got[(DESC_NULLS, "suv")] == 3
    assert got[(DESC_RANGE, "suv")] == 4  # 500, -400, 80, -5
    assert got[(DESC_OUTLIER, "suv")] == 2  # only the two planted extremes


def test_zero_rows_filtered_by_default(spark):
    df = _fixture(spark).where(F.col("suv").isNotNull())
    rep = quality_report(df, null_cols=["suv"])
    assert rep.count() == 0  # number=0 rows dropped (stydyGrB.scala:65)


def test_null_counts_distributed(spark):
    df = _fixture(spark)
    out = {r.columnName: r.number for r in null_counts(df, ["suv", "tag"]).collect()}
    assert out == {"suv": 3, "tag": 0}


def test_degenerate_stddev_no_crash(spark):
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "x double")
    rep = quality_report(df, zscore_cols=["x"], keep_zero_rows=True)
    assert [(r.description, r.number) for r in rep.collect()] == [(DESC_OUTLIER, 0)]


def test_quality_report_empty_frame(spark):
    df = spark.createDataFrame([], "x double")
    rep = quality_report(
        df, null_cols=["x"], ranges=[RangeSpec("x", 0, 1)], zscore_cols=["x"],
        keep_zero_rows=True,
    )
    got = {(r.description, r.columnName): r.number for r in rep.collect()}
    assert got == {
        (DESC_NULLS, "x"): 0,
        (DESC_RANGE, "x"): 0,
        (DESC_OUTLIER, "x"): 0,
    }


def test_mad_outliers_resist_contamination(spark):
    """Planted gross outliers must be counted, and the MAD scale must NOT
    move with them (the property z-scores lack)."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.quality import (
        mad_outlier_report,
    )

    clean = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    dirty = clean.union(
        spark.range(5).select((F.lit(1_000_000.0) + F.col("id")).alias("x"))
    )
    rep = {r.columnName: r for r in mad_outlier_report(dirty, ["x"]).collect()}["x"]
    assert rep.n_outliers == 5            # exactly the planted points
    assert rep.mad < 100                  # scale unmoved by the contamination

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        mad_outlier_report(dirty, [])


def test_key_skew_report_planted_hot_key(spark):
    from azure_medicine_data_engineering_spark.operators.quality import key_skew_report

    # 900 rows on key 1 (hot), 10 keys x 10 rows (cold)
    hot = [(1,) for _ in range(900)]
    cold = [(k,) for k in range(2, 12) for _ in range(10)]
    df = spark.createDataFrame(hot + cold, "k long")
    rep = key_skew_report(df, "k", top_k=3)
    rows = rep.collect()
    by_rank = {r.rank: r for r in rows}
    assert by_rank[1].key == "1" and by_rank[1].cnt == 900
    assert by_rank[1].n_keys == 11 and by_rank[1].total_rows == 1000
    assert by_rank[1].p50_cnt == 10 and by_rank[1].max_cnt == 900
    # integer mean = 1000 div 11 = 90 -> skew 10x, salt ceil(900/90) = 10
    assert by_rank[1].suggested_salt == 10
    assert abs(by_rank[1].skew_factor - 10.0) < 1e-6
    for c in rep._stage_caches:
        c.unpersist()


def test_winsorized_mean_clamps_planted_outliers(spark):
    from azure_medicine_data_engineering_spark.operators.quality import (
        exact_kth_cents,
        winsorized_mean_report,
    )

    # 100 well-behaved values around $10 plus two absurd outliers
    rows = [(10.0 + (i % 10) * 0.01,) for i in range(100)] + [(99999.0,), (0.01,)]
    df = spark.createDataFrame(rows, "l_extendedprice double")
    rep = winsorized_mean_report(df, "l_extendedprice", p_lo=0.05, p_hi=0.95)
    r = rep.collect()[0]
    assert r.n == 102
    assert r.n_clamped_hi >= 1 and r.n_clamped_lo >= 1
    # the winsorized mean stays near $10 while the raw mean is dragged up
    assert abs(r.winsorized_mean_cents - 1005) < 20
    assert r.raw_mean_cents > 90000
    for c in rep._stage_caches:
        c.unpersist()
    # exact_kth agrees with a sorted-list oracle on a small frame
    cents = spark.createDataFrame([(v,) for v in [5, 1, 9, 3, 3, 7]], "c long")
    got = exact_kth_cents(cents, "c", F.lit(4), bucket_width=4).collect()[0]
    assert got.kth_value == sorted([5, 1, 9, 3, 3, 7])[3]


def test_grouped_exact_median_matches_sorted_oracle(spark):
    import random

    from azure_medicine_data_engineering_spark.operators.quality import (
        grouped_exact_kth_cents,
    )

    rng = random.Random(7)
    rows = [(g, rng.randint(0, 50)) for g in ("a", "b", "c") for _ in range(101)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: (r.n, r.kth_value)
           for r in grouped_exact_kth_cents(df, "g", "v", q=0.5).collect()}
    import math
    for g in ("a", "b", "c"):
        vals = sorted(v for gg, v in rows if gg == g)
        k = math.ceil(0.5 * len(vals))
        assert got[g] == (len(vals), vals[k - 1])


def test_k_anonymity_planted(spark):
    from azure_medicine_data_engineering_spark.operators.privacy import (
        k_anonymity_report,
    )

    rows = (
        [("a", 1)] * 6        # safe group (6 >= 5)
        + [("a", 2)] * 2      # unsafe (2 < 5)
        + [("b", 1)] * 1      # unsafe singleton
    )
    df = spark.createDataFrame(rows, "q1 string, q2 long")
    r = k_anonymity_report(df, ["q1", "q2"], k=5).collect()[0]
    assert (r["n_rows"], r["n_groups"], r["min_group_size"]) == (9, 3, 1)
    assert (r["n_unsafe_groups"], r["n_rows_at_risk"]) == (2, 3)
    assert r["k_anonymous"] is False
    safe = k_anonymity_report(df.where("q2 = 1 and q1 = 'a'"), ["q1"], k=5)
    assert safe.collect()[0]["k_anonymous"] is True


def test_l_diversity_planted(spark):
    from azure_medicine_data_engineering_spark.operators.privacy import (
        l_diversity_report,
    )

    rows = (
        [("g1", "flu")] * 5 + [("g1", "ok")] * 3   # diverse (2 values)
        + [("g2", "cancer")] * 50                  # big but UNdiverse
    )
    df = spark.createDataFrame(rows, "q string, diag string")
    r = l_diversity_report(df, ["q"], "diag", l=2).collect()[0]
    assert r["n_groups"] == 2
    assert r["min_distinct_sensitive"] == 1
    assert (r["n_undiverse_groups"], r["n_rows_exposed"]) == (1, 50)
    assert r["l_diverse"] is False


def test_dp_noisy_counts_statistics(spark):
    """Seeded Laplace release: deterministic across runs, noise centered
    (many groups -> mean |noise| ~ 1/eps), and never equal to the true
    count grid except by measure-zero luck."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.range(10_000).select((F.col("id") % 200).alias("g"))
    a = dp_noisy_counts(df, "g", epsilon=1.0, seed="s1")
    b = dp_noisy_counts(df, "g", epsilon=1.0, seed="s1")
    ra = {r["g"]: r["noisy_count"] for r in a.collect()}
    rb = {r["g"]: r["noisy_count"] for r in b.collect()}
    assert ra == rb  # seeded determinism
    noises = [ra[g] - 50.0 for g in ra]  # every group has exactly 50 rows
    assert len(noises) == 200
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    # Laplace(1): E|X| = 1; allow wide sampling slack
    assert 0.5 < mean_abs < 2.0
    assert min(noises) < 0 < max(noises)
    # different seed -> different release
    rc = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, "g", epsilon=1.0, seed="s2").collect()
    }
    assert rc != ra
    # tighter epsilon -> larger noise scale
    rd = {
        r["g"]: r["noisy_count"]
        for r in dp_noisy_counts(df, "g", epsilon=0.1, seed="s1").collect()
    }
    mean_abs_01 = sum(abs(rd[g] - 50.0) for g in rd) / len(rd)
    assert mean_abs_01 > 4 * mean_abs


def test_categorical_entropy_bounds(spark):
    import math

    from azure_medicine_data_engineering_spark.operators.profile import (
        categorical_entropy,
    )

    rows = (
        [("uni", c) for c in "abcd" * 25]        # uniform over 4 -> ln(4)
        + [("const", "z")] * 40                  # constant -> 0
        + [("skew", "a")] * 30 + [("skew", "b")] * 10
    )
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r["g"]: r for r in categorical_entropy(df, "g", "c").collect()}
    assert got["const"]["entropy"] == 0.0 and got["const"]["n_cats"] == 1
    assert abs(got["uni"]["entropy"] - math.log(4)) < 1e-3
    p = 0.75
    expected = -(p * math.log(p) + 0.25 * math.log(0.25))
    assert abs(got["skew"]["entropy"] - expected) < 1e-3
    assert 0 < got["skew"]["entropy"] < got["uni"]["entropy"]


def test_mutual_information_poles(spark):
    """MI = 0 at independence; MI = H(A) when B determines A (here both
    uniform over 2 -> ln 2); symmetric in its arguments."""
    import math

    from azure_medicine_data_engineering_spark.operators.profile import (
        mutual_information,
    )

    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(25)],
        "a string, b string",
    )
    assert mutual_information(indep, "a", "b").collect()[0]["mi"] == 0.0

    det = spark.createDataFrame(
        [("x", "p")] * 30 + [("y", "q")] * 30, "a string, b string"
    )
    r = mutual_information(det, "a", "b").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-3

    ab = mutual_information(det, "a", "b").collect()[0]["mi"]
    ba = mutual_information(det, "b", "a").collect()[0]["mi"]
    assert ab == ba


def test_grouped_percentile_bands_naive(spark):
    from azure_medicine_data_engineering_spark.operators.quality import (
        grouped_percentile_bands,
    )

    import math

    data = {"a": list(range(1, 101)), "b": [5] * 10 + [50] * 10}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in grouped_percentile_bands(df, "g", "v").collect()}
    for g, vs in data.items():
        s = sorted(vs)
        n = len(s)
        exp = tuple(s[math.ceil(q * n) - 1] for q in (0.1, 0.5, 0.9))
        r = got[g]
        assert (r["n"], r["p_lo"], r["p_mid"], r["p_hi"]) == (n, *exp), g


def test_grouped_weighted_median_naive(spark):
    from azure_medicine_data_engineering_spark.operators.quality import (
        grouped_weighted_median,
    )

    import math

    # group g: values with weights; weighted median = least v with
    # cumweight >= ceil(0.5 * W)
    data = {"g1": [(1, 1), (2, 1), (100, 10)], "g2": [(5, 3), (6, 3)]}
    rows = [(g, v, w) for g, vw in data.items() for v, w in vw]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {r["g"]: (r["total_weight"], r["qth_value"]) for r in
           grouped_weighted_median(df, "g", "v", "w").collect()}
    for g, vw in data.items():
        tw = sum(w for _, w in vw)
        target = math.ceil(0.5 * tw)
        cum = 0
        for v, w in sorted(vw):
            cum += w
            if cum >= target:
                exp = v
                break
        assert got[g] == (tw, exp), g
    # the heavy tail dominates: g1's weighted median is 100, row median is 2
    assert got["g1"][1] == 100
