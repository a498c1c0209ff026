"""Round-9 statistics panel: every test pins its statistic through an
INDEPENDENT route (published worked example, algebraically different
summation, exact enumeration, numpy root-finder, or hand arithmetic) per
the mirror-independence rule hardened in rounds 7–9."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.rankstats import (
    ad_two_sample,
    ad_two_sample_right,
    breslow_day_test,
    brunner_munzel_test,
    cohens_kappa,
)
from azure_medicine_data_engineering_spark.operators.events_analytics import (
    runs_test_daily,
)
from azure_medicine_data_engineering_spark.operators.similarity import (
    label_centroid_cohesion,
)


# ---------------------------------------------------------------------------
# Brunner-Munzel: the published example from Brunner & Munzel (2000) /
# the R lawstat docs — W = 3.1375, df = 17.68, p̂ = 0.789.
# ---------------------------------------------------------------------------

BM_X1 = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
BM_X2 = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]


def test_brunner_munzel_published_example(spark):
    rows = [("g1", float(v)) for v in BM_X1] + [("g2", float(v)) for v in BM_X2]
    df = spark.createDataFrame(rows, "g string, v double")
    got = brunner_munzel_test(df, "v", "g", "g1").collect()[0]
    assert (got["n1"], got["n2"]) == (14, 11)
    assert got["p_hat"] == pytest.approx(0.789, abs=1e-9)
    assert got["w"] == pytest.approx(3.1375, abs=1e-9)
    assert got["df_sw"] == pytest.approx(17.6828, abs=1e-3)


def test_brunner_munzel_swap_identity(spark):
    """Swapping the two groups negates W and complements p̂ — a structural
    identity that pairs with the published pin above."""
    rows = [("g1", float(v)) for v in BM_X1] + [("g2", float(v)) for v in BM_X2]
    df = spark.createDataFrame(rows, "g string, v double")
    a = brunner_munzel_test(df, "v", "g", "g1").collect()[0]
    b = brunner_munzel_test(df, "v", "g", "g2").collect()[0]
    assert a["w"] == pytest.approx(-b["w"], abs=2e-4)
    assert a["p_hat"] + b["p_hat"] == pytest.approx(1.0, abs=2e-4)
    assert a["df_sw"] == pytest.approx(b["df_sw"], abs=2e-4)


# ---------------------------------------------------------------------------
# Anderson-Darling, RIGHT-CONTINUOUS variant (ad_two_sample_right):
# independent POSITION-indexed summation (over pooled order statistics
# j = 1..N−1) vs the production distinct-value route — two algebraically
# different folds that must coincide; on tie-free data the midrank
# variant (ad_two_sample) must coincide with BOTH.
# ---------------------------------------------------------------------------


def _ad_position_route(a, b):
    pool = sorted(a + b)
    n_tot = len(pool)
    n1, n2 = len(a), len(b)
    s = 0.0
    for j in range(1, n_tot):
        zj = pool[j - 1]
        m1 = sum(1 for v in a if v <= zj)
        m2 = sum(1 for v in b if v <= zj)
        s += (1 / n1) * (n_tot * m1 - j * n1) ** 2 / (j * (n_tot - j))
        s += (1 / n2) * (n_tot * m2 - j * n2) ** 2 / (j * (n_tot - j))
    return (n_tot - 1) / n_tot * s / n_tot


def test_anderson_darling_vs_position_route_no_ties(spark):
    a = [38.7, 41.5, 43.8, 44.5, 45.5, 46.0, 47.7, 58.0]
    b = [39.2, 39.3, 39.7, 41.4, 41.8, 42.9, 43.3, 45.8]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    ref = _ad_position_route(a, b)
    got = ad_two_sample_right(df, "v", "g", "a").collect()[0]
    assert (got["n1"], got["n2"]) == (8, 8)
    assert got["a2"] == pytest.approx(ref, abs=1e-3)
    # the midrank variant is a DIFFERENT discretization (half-steps at
    # each observation) — close but not equal even without ties
    mid = ad_two_sample(df, "v", "g", "a").collect()[0]
    assert mid["a2"] != got["a2"]
    assert mid["a2"] == pytest.approx(ref, rel=0.15)


def test_anderson_darling_separated_samples(spark):
    """Fully separated samples — the tail terms reach ~l·n1·n2·1e6, the
    magnitude class where Spark's floor(double)→BIGINT saturates (the
    snap_half_up_dec regression caught at the 100× replica)."""
    a = [float(i) for i in range(100)]
    b = [float(i + 1000) for i in range(100)]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ad_two_sample_right(df, "v", "g", "a").collect()[0]
    ref = _ad_position_route(a, b)
    assert got["a2"] == pytest.approx(ref, abs=1e-3)
    assert got["a2"] > 30  # decisively non-null


def test_anderson_darling_with_ties(spark):
    a = [1.0, 1.0, 2.0, 3.0, 3.0]
    b = [2.0, 2.0, 3.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ad_two_sample_right(df, "v", "g", "a").collect()[0]
    # discrete (distinct-value) route computed by hand in plain python,
    # structured differently from the Spark prefix-sum plan
    pool = sorted(set(a + b))
    n1, n2 = len(a), len(b)
    n_tot = n1 + n2
    s = cum1 = cum2 = 0
    sval = 0.0
    for v in pool:
        c1 = a.count(v)
        c2 = b.count(v)
        cum1 += c1
        cum2 += c2
        bb = cum1 + cum2
        if bb < n_tot:
            d = n2 * cum1 - n1 * cum2
            sval += (c1 + c2) * d * d / (bb * (n_tot - bb))
    ref = (n_tot - 1) * sval / (n_tot * n1 * n2)
    assert got["a2"] == pytest.approx(ref, abs=1e-3)


# ---------------------------------------------------------------------------
# Cohen's kappa (the round-5 operator): hand 2x2 pin — po = 0.7, pe = 0.5,
# κ = 0.4 by calculator arithmetic, independent of KAPPA_EXPR's cleared
# integer form.
# ---------------------------------------------------------------------------


def test_cohens_kappa_hand_pin(spark):
    rows = (
        [(True, True)] * 20 + [(True, False)] * 5
        + [(False, True)] * 10 + [(False, False)] * 15
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
    # po = 35/50 = 0.7; pe = (25·30 + 25·20)/2500 = 0.5; κ = 0.2/0.5 = 0.4
    assert (got["n"], got["a"], got["b"], got["c"], got["d"]) == (50, 20, 5, 10, 15)
    assert got["kappa"] == pytest.approx(0.4, abs=1e-9)


def test_cohens_kappa_identical_raters(spark):
    ident = [(True, True)] * 3 + [(False, False)] * 7
    got = cohens_kappa(
        spark.createDataFrame(ident, "a boolean, b boolean"),
        F.col("a"), F.col("b"),
    ).collect()[0]
    assert got["kappa"] == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Breslow-Day: homogeneous-OR zero pin (needs no BD formula at all) +
# heterogeneous case with expected cells from numpy's root finder.
# ---------------------------------------------------------------------------


def _bd_rows(strata):
    rows = []
    for st, (a, b, c, d) in strata.items():
        rows += [(st, True, True)] * a + [(st, True, False)] * b
        rows += [(st, False, True)] * c + [(st, False, False)] * d
    return rows


def test_breslow_day_zero_under_homogeneity(spark):
    strata = {1: (4, 1, 2, 2), 2: (8, 2, 4, 4), 3: (12, 6, 2, 4)}
    for a, b, c, d in strata.values():
        assert a * d == 4 * b * c  # every stratum OR exactly 4
    df = spark.createDataFrame(_bd_rows(strata), ["st", "e", "o"])
    got = breslow_day_test(df, F.col("e"), F.col("o"), F.col("st")).collect()[0]
    assert got["n_strata"] == 3
    assert got["or_mh"] == pytest.approx(4.0, abs=1e-3)
    assert got["chi2_bd"] == pytest.approx(0.0, abs=1e-3)


def test_breslow_day_vs_numpy_roots(spark):
    strata = {1: (10, 5, 4, 12), 2: (6, 14, 11, 5)}
    df = spark.createDataFrame(_bd_rows(strata), ["st", "e", "o"])
    got = breslow_day_test(df, F.col("e"), F.col("o"), F.col("st")).collect()[0]
    adu = sum(
        round(a * d / (a + b + c + d) * 1e6) for a, b, c, d in strata.values()
    )
    bcu = sum(
        round(b * c / (a + b + c + d) * 1e6) for a, b, c, d in strata.values()
    )
    t = adu / bcu
    chi2 = 0.0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        r1, c1 = a + b, a + c
        roots = np.roots([t - 1, -(t * (r1 + c1) + (n - r1 - c1)), t * r1 * c1])
        ea = [
            r.real for r in roots
            if max(0, r1 + c1 - n) - 1e-9 <= r.real <= min(r1, c1) + 1e-9
        ][0]
        var = 1 / (1 / ea + 1 / (r1 - ea) + 1 / (c1 - ea) + 1 / (n - r1 - c1 + ea))
        chi2 += (a - ea) ** 2 / var
    assert got["or_mh"] == pytest.approx(t, abs=1e-3)
    assert got["chi2_bd"] == pytest.approx(chi2, abs=1e-3)


# ---------------------------------------------------------------------------
# Runs test (round-7 implementation): exact moments by FULL enumeration of
# all binomial(n, n1) above/below arrangements — the variance constant in
# RUNS_Z_EXPR cannot hide behind a mirrored formula.
# ---------------------------------------------------------------------------


def _count_runs(seq):
    return 1 + sum(1 for i in range(1, len(seq)) if seq[i] != seq[i - 1])


def test_runs_test_vs_enumerated_moments(spark):
    import datetime
    import itertools

    # 8 days; the r7 convention cuts at the LOWER-MIDDLE order statistic
    # (here 90) with equal-to-median counting BELOW -> 4 above, 4 below
    vals = [90, 110, 80, 70, 120, 130, 140, 60]
    pattern = [v > 90 for v in vals]
    base = datetime.date(2002, 5, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = runs_test_daily(df).collect()[0]
    n1 = sum(pattern)
    n2 = len(pattern) - n1
    r_obs = _count_runs(pattern)
    assert (got["n1"], got["n2"], got["r"]) == (n1, n2, r_obs)
    # exact conditional moments by enumerating all C(8,4) arrangements
    runs_dist = [
        _count_runs(arr)
        for arr in set(itertools.permutations(pattern))
    ]
    e_r = sum(runs_dist) / len(runs_dist)
    var_r = sum((r - e_r) ** 2 for r in runs_dist) / len(runs_dist)
    z_ref = (r_obs - e_r) / math.sqrt(var_r)
    assert got["z"] == pytest.approx(z_ref, abs=1e-4)


def test_runs_test_equal_to_median_counts_below(spark):
    import datetime

    vals = [100, 100, 50, 150, 50, 150]  # lower-middle median = 100
    base = datetime.date(2002, 6, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = runs_test_daily(df).collect()[0]
    # signs by day: 0 0 0 1 0 1 -> n1=2 above, n2=4 (median days below), r=4
    assert (got["n1"], got["n2"], got["r"]) == (2, 4, 4)


# ---------------------------------------------------------------------------
# Centroid cohesion: hand-computable two-label pin.
# ---------------------------------------------------------------------------


def test_label_centroid_cohesion_hand_pin(spark):
    rows = [
        (1, 0, [1.0, 0.0]),   # label 0: centroid (1e6, 1e6) after micro grid
        (2, 0, [0.0, 1.0]),   # cos(v, c) = 1/√2 for both vectors
        (3, 1, [3.0, 4.0]),   # label 1: identical vectors -> cos = 1
        (4, 1, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {
        r["label"]: r.asDict()
        for r in label_centroid_cohesion(df, "label", "embedding").collect()
    }
    # floor(1/√2·1e6 + 0.5) = 707107
    assert got[0]["n_vecs"] == 2
    assert got[0]["avg_cos"] == pytest.approx(0.707107, abs=1e-9)
    assert got[0]["min_cos"] == pytest.approx(0.707107, abs=1e-9)
    assert got[1]["n_vecs"] == 2
    assert got[1]["avg_cos"] == 1.0 and got[1]["min_cos"] == 1.0


def test_label_centroid_cohesion_outlier_min(spark):
    rows = [(i, 0, [1.0, 0.0]) for i in range(9)] + [(9, 0, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = label_centroid_cohesion(df, "label", "embedding").collect()[0]
    # centroid (8e6, 0): inliers cos=1, the flipped vector cos=-1
    assert got["min_cos"] == -1.0
    assert got["avg_cos"] == pytest.approx((9 * 1.0 - 1.0) / 10, abs=1e-9)


# ---------------------------------------------------------------------------
# Fligner-Killeen: independent route — normal scores from a BISECTION
# inverse on math.erf (stdlib), nothing shared with the Acklam rationals.
# ---------------------------------------------------------------------------


def _inv_norm_bisect(p):
    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_fligner_killeen_vs_erf_bisection(spark):
    import random

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        fligner_killeen_test,
    )

    rnd = random.Random(5)
    groups = {
        "a": [round(rnd.gauss(0, 10)) for _ in range(40)],
        "b": [round(rnd.gauss(5, 30)) for _ in range(35)],
        "c": [round(rnd.gauss(-3, 10)) for _ in range(30)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x long")
    got = fligner_killeen_test(df, "x", "g").collect()[0]

    def med_lower_pair(vals):  # production doubled median = two middle stats
        s = sorted(vals)
        n = len(s)
        return (s[(n + 1) // 2 - 1] + s[n // 2]) / 2

    devs = []
    for g, vs in groups.items():
        m = med_lower_pair(vs)
        devs += [(g, abs(v - m)) for v in vs]
    n_tot = len(devs)
    sd = sorted(d for _, d in devs)

    def midrank(d):
        lo = sum(1 for u in sd if u < d)
        c = sum(1 for u in sd if u == d)
        return lo + (c + 1) / 2

    scores = [
        (g, _inv_norm_bisect(0.5 + midrank(d) / (2 * (n_tot + 1)))) for g, d in devs
    ]
    abar = sum(a for _, a in scores) / n_tot
    v2 = sum((a - abar) ** 2 for _, a in scores) / (n_tot - 1)
    num = 0.0
    for g in groups:
        ag = [a for gg, a in scores if gg == g]
        num += len(ag) * (sum(ag) / len(ag) - abar) ** 2
    assert (got["k"], got["n"]) == (3, n_tot)
    assert got["chi2"] == pytest.approx(num / v2, abs=1e-3)
    assert got["chi2"] > 9.21  # chi2_0.99(2): the 3x-spread group is decisive


def test_fligner_killeen_equal_dispersion_small(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        fligner_killeen_test,
    )

    # identical shapes shifted by location only -> FK sees nothing
    rows = [("a", v) for v in (10, 20, 30, 40, 50)] + [
        ("b", v + 1000) for v in (10, 20, 30, 40, 50)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    got = fligner_killeen_test(df, "x", "g").collect()[0]
    assert got["chi2"] == pytest.approx(0.0, abs=1e-3)


# ---------------------------------------------------------------------------
# STL strength indices: planted pure-pattern poles + a numpy-variance
# reference over the decomposition's own (independently tested) output.
# ---------------------------------------------------------------------------


def _orders_series(spark, vals, start="2003-01-06"):
    import datetime

    d0 = datetime.date.fromisoformat(start)
    rows = [
        (datetime.datetime.combine(d0 + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")


def test_stl_strength_poles(spark):
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        stl_strength_daily,
    )

    weekly = [100 + 50 * (i % 7 in (5, 6)) for i in range(70)]  # pure cycle
    got = stl_strength_daily(_orders_series(spark, weekly)).collect()[0]
    # exact cycle: remainder is identically 0 -> F_S = 1; deseasonalized
    # (trend + remainder) is CONSTANT -> zero denominator -> NULL F_T
    assert got["seasonal_strength"] == 1.0
    assert got["trend_strength"] is None

    trend = [100 + 10 * i for i in range(70)]  # pure ramp, no weekly shape
    got2 = stl_strength_daily(_orders_series(spark, trend)).collect()[0]
    assert got2["trend_strength"] > 0.95


def test_stl_strength_vs_numpy_variances(spark):
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        stl_lite_daily,
        stl_strength_daily,
    )

    import random

    rnd = random.Random(11)
    vals = [100 + 3 * i + 20 * (i % 7 in (5, 6)) + rnd.randint(-8, 8) for i in range(84)]
    df = _orders_series(spark, vals)
    got = stl_strength_daily(df).collect()[0]
    dec = stl_lite_daily(df).collect()
    r = np.array([row["remainder"] for row in dec])
    t = np.array([row["trend"] for row in dec])
    s = np.array([row["seasonal"] for row in dec])
    ft = max(0.0, 1 - np.var(r) / np.var(t + r))
    fs = max(0.0, 1 - np.var(r) / np.var(s + r))
    assert got["n_days"] == len(dec)
    assert got["trend_strength"] == pytest.approx(ft, abs=1e-3)
    assert got["seasonal_strength"] == pytest.approx(fs, abs=1e-3)


# ---------------------------------------------------------------------------
# Mood's scale test: (a) no-tie case pinned to the CLASSICAL constants
# E = n1(N²−1)/12, Var = n1n2(N+1)(N²−4)/180 (a route the production
# conditional-moments code never touches); (b) tie case pinned by FULL
# permutation enumeration of the tie-averaged score sum.
# ---------------------------------------------------------------------------


def test_mood_scale_classical_constants_no_ties(spark):
    import random

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mood_scale_test,
    )

    rnd = random.Random(3)
    a = rnd.sample(range(1000), 12)
    b = rnd.sample(range(2000, 3000), 9)  # disjoint ranges: zero ties
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = mood_scale_test(df, "v", "g", "g1").collect()[0]
    pool = sorted(a + b)
    n_tot, n1, n2 = len(pool), len(a), len(b)
    ranks = {v: i + 1 for i, v in enumerate(pool)}
    t_stat = sum((ranks[v] - (n_tot + 1) / 2) ** 2 for v in a)
    e_t = n1 * (n_tot * n_tot - 1) / 12
    var_t = n1 * n2 * (n_tot + 1) * (n_tot * n_tot - 4) / 180
    assert got["w"] == pytest.approx(4 * t_stat, abs=1e-3)  # quadrupled scores
    assert got["z"] == pytest.approx((t_stat - e_t) / math.sqrt(var_t), abs=1e-3)


def test_mood_scale_vs_permutation_enumeration(spark):
    import itertools

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mood_scale_test,
    )

    a = [1, 1, 2, 5, 9]
    b = [2, 2, 5, 7]
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = mood_scale_test(df, "v", "g", "g1").collect()[0]
    pool = sorted(a + b)
    n_tot, n1 = len(pool), len(a)
    from collections import defaultdict

    posv = defaultdict(list)
    for i, v in enumerate(pool):
        posv[v].append(i + 1)
    avg4 = {
        v: sum((2 * i - (n_tot + 1)) ** 2 for i in ps) / len(ps)
        for v, ps in posv.items()
    }
    t_obs = sum(avg4[v] for v in a)
    # exact permutation distribution of the group-1 tie-averaged score sum
    scores = [avg4[v] for v in pool]
    ts = [
        sum(scores[i] for i in idx)
        for idx in itertools.combinations(range(n_tot), n1)
    ]
    e_t = sum(ts) / len(ts)
    var_t = sum((t - e_t) ** 2 for t in ts) / len(ts)
    # sampling n1 scores WITHOUT replacement: the enumerated variance IS
    # the Hollander-Wolfe n1·n2·(N·Σa²−(Σa)²)/(N²(N−1)) production form,
    # so formula and enumeration must agree exactly
    z_ref = (t_obs - e_t) / math.sqrt(var_t)
    assert got["w"] == pytest.approx(t_obs, abs=1e-3)
    assert got["z"] == pytest.approx(z_ref, abs=1e-3)


def test_kuiper_vs_brute_and_ks_bound(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ks_two_sample,
        kuiper_two_sample,
    )

    a = [1.0, 2.0, 3.0, 10.0]
    b = [4.0, 5.0, 6.0]
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = kuiper_two_sample(df, "v", "g", "g1").collect()[0]
    n1, n2 = len(a), len(b)
    vals = sorted(set(a + b))
    dplus = max(
        max(0, sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in vals
    )
    dminus = max(
        max(0, sum(1 for x in b if x <= v) * n1 - sum(1 for x in a if x <= v) * n2)
        for v in vals
    )
    assert got["v_num"] == dplus + dminus
    assert got["v"] == pytest.approx((dplus + dminus) / (n1 * n2), abs=1e-9)
    # structural identity: KS's D is max(D+, D-), so D <= V <= 2D
    ks = ks_two_sample(df, "v", "g", "g1").collect()[0]
    assert ks["d_num"] <= got["v_num"] <= 2 * ks["d_num"]


# ---------------------------------------------------------------------------
# Quantile shift function: hand order statistics on a tiny frame + a
# planted location shift where Δ(q) is constant by construction.
# ---------------------------------------------------------------------------


def test_quantile_shift_hand_order_statistics(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        quantile_shift_two_sample,
    )

    a = list(range(1, 11))            # deciles of 1..10: ceil(k)th values
    b = [v + 7 for v in range(1, 11)]  # exact +7 location shift
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["q_pct"]: r.asDict()
           for r in quantile_shift_two_sample(df, "v", "g", "g1").collect()}
    assert set(got) == {10, 20, 30, 40, 50, 60, 70, 80, 90}
    for k in range(1, 10):
        # lower order statistic: min v with cum >= ceil(k*10/10) = k
        assert got[k * 10]["q1_v"] == a[k - 1]
        assert got[k * 10]["q2_v"] == a[k - 1] + 7
        assert got[k * 10]["shift"] == 7


def test_quantile_shift_tail_only(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        quantile_shift_two_sample,
    )

    a = list(range(100))
    # shift the top 15 values so the 90th order statistic (rank 90) lands
    # inside the shifted block while ranks <= 80 stay untouched
    b = list(range(85)) + [v + 500 for v in range(85, 100)]
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["q_pct"]: r["shift"]
           for r in quantile_shift_two_sample(df, "v", "g", "g1").collect()}
    assert all(got[q] == 0 for q in range(10, 90, 10))
    assert got[90] == 500  # the shift localizes to the tail decile


# ---------------------------------------------------------------------------
# Lepage: component identity (L must equal the two independently computed
# z's squared and summed) + directional power poles.
# ---------------------------------------------------------------------------


def test_lepage_component_identity_and_poles(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ansari_bradley_test,
        lepage_test,
        mann_whitney_u,
    )

    import random

    rnd = random.Random(9)
    a = [round(rnd.gauss(100, 10)) for _ in range(40)]   # location+scale base
    b = [round(rnd.gauss(130, 35)) for _ in range(35)]   # shifted AND wider
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = lepage_test(df, "v", "g", "g1").collect()[0]
    zw = mann_whitney_u(df, "v", "g", "g1").collect()[0]["z"]
    za = ansari_bradley_test(df, "v", "g", "g1").collect()[0]["z"]
    assert got["zw"] == zw and got["za"] == za
    assert got["l_stat"] == pytest.approx(
        math.floor((zw * zw + za * za) * 1e4 + 0.5) / 1e4, abs=1e-9
    )
    # both components contribute: the planted shift+spread is decisive on
    # the chi2_2 scale
    assert got["l_stat"] > 13.8  # chi2_0.999(2)
    assert abs(zw) > 2 and abs(za) > 2


def test_lepage_null_small(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        lepage_test,
    )

    # identical distributions (interleaved) -> small L
    a = list(range(0, 60, 2))
    b = list(range(1, 60, 2))
    rows = [("g1", v) for v in a] + [("g2", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = lepage_test(df, "v", "g", "g1").collect()[0]
    assert got["l_stat"] < 2.0


def test_snap_half_up_dec_negative_inputs(spark):
    """Round-10 ADVICE fix: snap_half_up_dec must be the bit-exact FLOOR
    twin for SIGNED inputs too — Spark's % keeps the dividend's sign, so
    the naive y − y%1.0 truncated toward zero (snap(−2.3) gave −1 where
    FLOOR(−2.3 + 0.5) = −2). Pins the posmod form against Python's
    math.floor(x + 0.5) (true half-away-from-zero-ish floor semantics)
    across both signs and magnitudes past 2^53."""
    import math

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        snap_half_up_dec,
    )

    vals = [
        -2.8, -2.5, -2.3, -2.0, -0.5, -0.2, 0.0, 0.2, 0.5, 2.3, 2.5,
        -1e18, 1e18, -2.5e19, 2.5e19,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["x"]: int(r["s"])
        for r in df.select("x", snap_half_up_dec(F.col("x")).alias("s")).collect()
    }
    for v in vals:
        assert got[v] == math.floor(v + 0.5), (v, got[v], math.floor(v + 0.5))


def test_distribution_drift_panel_matches_standalone_kernels(spark):
    """Round 10: the panel's nine member statistics over the SHARED CDF
    frame must equal each standalone kernel's value on the same data —
    the shared-frame derivation (c_all = c1+c2, cnt_less = cum1+cum2−
    c1−c2) is the only new code path, so any off-by-one there shows as a
    member mismatch."""
    import numpy as np

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ad_two_sample_right,
        ansari_bradley_test,
        brunner_munzel_test,
        cvm_two_sample,
        distribution_drift_panel,
        ks_two_sample,
        kuiper_two_sample,
        mann_whitney_u,
        mood_scale_test,
        quantile_shift_two_sample,
    )

    rng = np.random.RandomState(17)
    rows = [("a", int(v)) for v in rng.randint(0, 40, 120)]
    rows += [("b", int(v)) for v in rng.randint(5, 60, 90)]
    df = spark.createDataFrame(rows, "g string, x long")
    panel = {
        r["test"]: (r["stat"], r["n1"], r["n2"])
        for r in distribution_drift_panel(df, "x", "g", "a").collect()
    }
    assert set(panel) == {
        "mann_whitney_z", "brunner_munzel_w", "ansari_bradley_z",
        "mood_scale_z", "lepage_l", "ks_d", "cvm_t", "kuiper_v",
        "anderson_darling_a2", "max_decile_shift",
    }
    bm = brunner_munzel_test(df, "x", "g", "a").collect()[0]
    assert panel["brunner_munzel_w"][0] == bm["w"]
    mw = mann_whitney_u(df, "x", "g", "a").collect()[0]
    ab = ansari_bradley_test(df, "x", "g", "a").collect()[0]
    mood = mood_scale_test(df, "x", "g", "a").collect()[0]
    ks = ks_two_sample(df, "x", "g", "a").collect()[0]
    cvm = cvm_two_sample(df, "x", "g", "a").collect()[0]
    kp = kuiper_two_sample(df, "x", "g", "a").collect()[0]
    ad = ad_two_sample_right(df, "x", "g", "a").collect()[0]
    qs = quantile_shift_two_sample(df, "x", "g", "a").collect()
    assert panel["mann_whitney_z"] == (mw["z"], 120, 90)
    assert panel["ansari_bradley_z"][0] == ab["z"]
    assert panel["mood_scale_z"][0] == mood["z"]
    assert panel["lepage_l"][0] == round(mw["z"] ** 2 + ab["z"] ** 2, 4)
    assert panel["ks_d"][0] == ks["d"]
    assert panel["cvm_t"][0] == cvm["t"]
    assert panel["kuiper_v"][0] == kp["v"]
    assert panel["anderson_darling_a2"][0] == ad["a2"]
    assert panel["max_decile_shift"][0] == float(
        max(abs(r["shift"]) for r in qs)
    )


def test_ks_vs_rest_by_group_hand_pinned(spark):
    """Naive pin incl. the sup-off-grid case: group 'a' never takes value
    2, where the rest's CDF jumps — the grid replication must still see
    that point. Hand CDFs: a=[1,1,3], b=[2,2,2,4]: D = 2/3 at v=1."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ks_vs_rest_by_group,
    )

    rows = [("a", 1), ("a", 1), ("a", 3), ("b", 2), ("b", 2), ("b", 2), ("b", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in ks_vs_rest_by_group(df, "v", "g").collect()}
    assert (got["a"]["n_g"], got["a"]["n_rest"]) == (3, 4)
    assert got["a"]["d_num"] == 8  # |cum_a*4 - cum_b*3| max, at v=1
    assert got["a"]["d"] == round(8 / 12, 4)
    assert (got["b"]["n_g"], got["b"]["n_rest"], got["b"]["d_num"]) == (4, 3, 8)
    # identical distributions -> D = 0
    same = [("x", v) for v in (1, 2, 3)] + [("y", v) for v in (1, 2, 3)]
    df2 = spark.createDataFrame(same, "g string, v long")
    for r in ks_vs_rest_by_group(df2, "v", "g").collect():
        assert r["d_num"] == 0 and r["d"] == 0.0


def test_drift_panel_by_group_matches_per_slice_kernels(spark):
    """Round 11: the FUSED per-slice panel (one groupBy computing seven
    members' state at once over the shared group-vs-rest grid) must
    equal the standalone scalar kernels run per slice on a relabeled
    copy (slice g -> group1, everything else -> 'rest') — the fusion
    and the grid's pooled-rank derivation are the only new code paths,
    and a shared-formula bug cannot fake this green."""
    import numpy as np

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ad_two_sample_right,
        ansari_bradley_test,
        brunner_munzel_test,
        cvm_two_sample,
        drift_panel_by_group,
        ks_two_sample,
        kuiper_two_sample,
        mann_whitney_u,
        mood_scale_test,
        quantile_shift_two_sample,
    )

    rng = np.random.RandomState(23)
    rows = [("a", int(v)) for v in rng.randint(0, 40, 100)]
    rows += [("b", int(v)) for v in rng.randint(5, 60, 80)]
    rows += [("c", int(v)) for v in rng.randint(10, 30, 60)]
    df = spark.createDataFrame(rows, "g string, x long")
    panel = {
        (r["g"], r["test"]): (r["stat"], r["n1"], r["n2"])
        for r in drift_panel_by_group(df, "x", "g").collect()
    }
    for g in ("a", "b", "c"):
        two = df.select(
            "x", F.when(F.col("g") == g, g).otherwise("rest").alias("gg")
        )
        mw = mann_whitney_u(two, "x", "gg", g).collect()[0]
        ab = ansari_bradley_test(two, "x", "gg", g).collect()[0]
        mood = mood_scale_test(two, "x", "gg", g).collect()[0]
        ks = ks_two_sample(two, "x", "gg", g).collect()[0]
        cvm = cvm_two_sample(two, "x", "gg", g).collect()[0]
        kp = kuiper_two_sample(two, "x", "gg", g).collect()[0]
        ad = ad_two_sample_right(two, "x", "gg", g).collect()[0]
        bm = brunner_munzel_test(two, "x", "gg", g).collect()[0]
        qs = quantile_shift_two_sample(two, "x", "gg", g).collect()
        assert panel[(g, "mann_whitney_z")][0] == mw["z"], g
        assert panel[(g, "ansari_bradley_z")][0] == ab["z"], g
        assert panel[(g, "mood_scale_z")][0] == mood["z"], g
        assert panel[(g, "lepage_l")][0] == round(
            mw["z"] ** 2 + ab["z"] ** 2, 4
        ), g
        assert panel[(g, "ks_d")][0] == ks["d"], g
        assert panel[(g, "cvm_t")][0] == cvm["t"], g
        assert panel[(g, "kuiper_v")][0] == kp["v"], g
        assert panel[(g, "anderson_darling_a2")][0] == ad["a2"], g
        assert panel[(g, "brunner_munzel_w")][0] == bm["w"], g
        assert panel[(g, "max_decile_shift")][0] == float(
            max(abs(r["shift"]) for r in qs)
        ), g
        assert panel[(g, "ks_d")][1:] == (mw["n1"], mw["n2"])
