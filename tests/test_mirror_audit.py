"""Mirror-independence audit of the round-2–6 statistics tests.

The Page's L lesson (round 7/8): a pytest that re-derives the statistic via
the SAME formula as production passes even when the formula itself is wrong
(Page's L carried an extra (k+1) in the variance through a 306/306 gate).
Every test here validates a round-2–6 statistic through an INDEPENDENT
route — exact combinatorial enumeration, a cross-statistic identity, a
conjugate-prior hand pin, or planted ground truth — so a shared-formula
defect cannot hide. Companion audit table: SCALE.md round-9 section.
"""

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _r4(x: float) -> float:
    return math.floor(x * 1e4 + 0.5) / 1e4 if x >= 0 else -math.floor(-x * 1e4 + 0.5) / 1e4


# ---------------------------------------------------------------------------
# CMH: chi2 variance constant pinned by EXACT hypergeometric enumeration —
# no closed-form moment formula appears anywhere in this test.
# ---------------------------------------------------------------------------


def _hypergeom_moments(r1: int, r2: int, c1: int) -> tuple[float, float]:
    """E and Var of the (1,1) cell of a 2x2 with fixed margins, by
    enumerating the full conditional distribution: P(a=j) proportional to
    C(r1, j)·C(r2, c1−j)."""
    n = r1 + r2
    lo, hi = max(0, c1 - r2), min(r1, c1)
    weights = {j: math.comb(r1, j) * math.comb(r2, c1 - j) for j in range(lo, hi + 1)}
    tot = sum(weights.values())
    e = sum(j * w for j, w in weights.items()) / tot
    var = sum((j - e) ** 2 * w for j, w in weights.items()) / tot
    assert tot == math.comb(n, c1)  # sanity: Vandermonde
    return e, var


def test_cmh_chi2_vs_enumerated_hypergeometric(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cmh_stratified,
    )

    strata = {1: (12, 18, 7, 23), 2: (30, 10, 20, 40)}
    rows = []
    for st, (a, b, c, d) in strata.items():
        rows += [(st, True, True)] * a + [(st, True, False)] * b
        rows += [(st, False, True)] * c + [(st, False, False)] * d
    df = spark.createDataFrame(rows, ["st", "e", "o"])
    got = cmh_stratified(df, F.col("e"), F.col("o"), F.col("st")).collect()[0]

    sa = se = sv = 0.0
    for a, b, c, d in strata.values():
        e_k, v_k = _hypergeom_moments(a + b, c + d, a + c)
        sa += a
        se += e_k
        sv += v_k
    chi2_ref = (sa - se) ** 2 / sv
    assert got["chi2"] == pytest.approx(chi2_ref, abs=1e-3)


def test_cmh_or_consistency_under_common_odds_ratio(spark):
    """When every stratum's sample OR is the same value, OR_MH must equal
    it exactly (ad = OR·bc per stratum ⇒ Σad/n = OR·Σbc/n) — a property
    pin that needs no MH formula."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cmh_stratified,
    )

    strata = {1: (4, 1, 2, 2), 2: (8, 2, 4, 4), 3: (12, 6, 2, 4)}
    for a, b, c, d in strata.values():
        assert a * d == 4 * b * c  # every stratum OR is exactly 4
    rows = []
    for st, (a, b, c, d) in strata.items():
        rows += [(st, True, True)] * a + [(st, True, False)] * b
        rows += [(st, False, True)] * c + [(st, False, False)] * d
    df = spark.createDataFrame(rows, ["st", "e", "o"])
    got = cmh_stratified(df, F.col("e"), F.col("o"), F.col("st")).collect()[0]
    assert got["or_mh"] == pytest.approx(4.0, abs=1e-3)


# ---------------------------------------------------------------------------
# Cochran-Armitage: variance constant pinned by EXACT permutation
# enumeration of all C(n, r) success placements.
# ---------------------------------------------------------------------------


def test_cochran_armitage_vs_permutation_enumeration(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cochran_armitage_trend,
    )

    # subjects: level scores (1,1,1, 2,2,2, 3,3); observed successes at
    # indices 3 (score 2), 6 and 7 (score 3)
    scores = [1, 1, 1, 2, 2, 2, 3, 3]
    obs = [0, 0, 0, 1, 0, 0, 1, 1]
    n, r = len(scores), sum(obs)
    rows = [(s, bool(x)) for s, x in zip(scores, obs)]
    df = spark.createDataFrame(rows, ["s", "x"])
    got = cochran_armitage_trend(df, F.col("s"), F.col("x")).collect()[0]

    sn = sum(scores)
    t_obs = sum(s for s, x in zip(scores, obs) if x) - r * sn / n
    # exact permutation distribution of T over all C(8,3)=56 placements
    ts = [
        sum(scores[i] for i in idx) - r * sn / n
        for idx in itertools.combinations(range(n), r)
    ]
    assert sum(ts) == pytest.approx(0.0, abs=1e-9)  # E_perm[T] = 0
    var_perm = sum(t * t for t in ts) / len(ts)
    # production uses the unconditional binomial variance p(1−p)·Sxx,
    # which relates to the enumerated one by exactly (n−1)/n
    z_ref = t_obs / math.sqrt(var_perm * (n - 1) / n)
    assert (got["n"], got["r"], got["levels"]) == (n, r, 3)
    assert got["z"] == pytest.approx(z_ref, abs=1e-4)


# ---------------------------------------------------------------------------
# Tukey-Kramer HSD: at k=2 the studentized-range q collapses to the pooled
# two-sample t times sqrt(2) — an identity across two different statistics.
# ---------------------------------------------------------------------------


def test_tukey_q_equals_pooled_t_times_sqrt2_at_k2(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import tukey_hsd

    ga = [120, 180, 240, 230]
    gb = [300, 420, 330]
    rows = [("a", v) for v in ga] + [("b", v) for v in gb]
    df = spark.createDataFrame(rows, "g string, c long")
    got = tukey_hsd(df, "c", "g", q_crit=3.0).collect()
    assert len(got) == 1
    q_stat = got[0]["q_stat"]

    # textbook pooled two-sample t from raw values only
    n1, n2 = len(ga), len(gb)
    m1, m2 = sum(ga) / n1, sum(gb) / n2
    ss1 = sum((v - m1) ** 2 for v in ga)
    ss2 = sum((v - m2) ** 2 for v in gb)
    sp2 = (ss1 + ss2) / (n1 + n2 - 2)
    t = abs(m1 - m2) / math.sqrt(sp2 * (1 / n1 + 1 / n2))
    assert q_stat == pytest.approx(t * math.sqrt(2), abs=1e-4)


# ---------------------------------------------------------------------------
# Cochran's Q: at k=2 treatments Q is exactly McNemar's chi-square
# (b−c)²/(b+c) over the discordant pairs.
# ---------------------------------------------------------------------------


def test_cochran_q_equals_mcnemar_at_k2(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import cochran_q

    # 4 blocks (1,0), 1 block (0,1), 2 blocks (1,1), 1 block (0,0)
    pairs = [(1, 0)] * 4 + [(0, 1)] * 1 + [(1, 1)] * 2 + [(0, 0)] * 1
    rows = []
    for i, (x1, x2) in enumerate(pairs):
        rows += [(i, "t1", bool(x1)), (i, "t2", bool(x2))]
    df = spark.createDataFrame(rows, "b long, t string, x boolean")
    got = cochran_q(df, "b", "t", "x").collect()[0]
    b_disc, c_disc = 4, 1
    assert got["n_blocks"] == 8 and got["k"] == 2
    assert got["q"] == pytest.approx((b_disc - c_disc) ** 2 / (b_disc + c_disc), abs=1e-9)


# ---------------------------------------------------------------------------
# CUPED: theta against numpy's least-squares line, reduction against
# numpy's corrcoef, var_adj against the residual-series variance — three
# independent numerical routes (numpy lstsq internals share nothing with
# the five-sufficient-statistics expressions).
# ---------------------------------------------------------------------------


def test_cuped_vs_numpy_regression_routes(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cuped_adjustment,
    )

    rng_x = [100, 220, 310, 150, 480, 260, 390, 175, 205, 345]
    rng_y = [x * 2 + off for x, off in zip(rng_x, [30, -40, 55, 10, -25, 70, -15, 5, 45, -60])]
    rows = list(zip(rng_x, rng_y))
    df = spark.createDataFrame(rows, "x long, y long")
    got = cuped_adjustment(df, F.col("x"), F.col("y")).collect()[0]

    x = np.array(rng_x, dtype=float)
    y = np.array(rng_y, dtype=float)
    theta_ref = np.polyfit(x, y, 1)[0]  # OLS slope == cov/var
    rho2_ref = float(np.corrcoef(x, y)[0, 1]) ** 2
    resid = y - theta_ref * x
    var_adj_ref = float(np.var(resid))  # population variance of the residuals
    var_raw_ref = float(np.var(y))
    assert got["theta"] == pytest.approx(theta_ref, abs=1e-3)
    assert got["reduction"] == pytest.approx(rho2_ref, abs=1e-3)
    assert got["var_raw"] == pytest.approx(var_raw_ref, abs=1e-2)
    assert got["var_adj"] == pytest.approx(var_adj_ref, abs=1e-2)


# ---------------------------------------------------------------------------
# EB shrinkage: conjugate-prior hand pin — group rates engineered so the
# MoM prior is exactly Beta(2,3); the posterior means are then 0.3 and 0.5
# by Bayes' rule alone, no MoM algebra in the test.
# ---------------------------------------------------------------------------


def test_eb_shrinkage_conjugate_prior_hand_pin(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        eb_shrink_rates,
    )

    # rates 1/5 and 3/5: mean 0.4, population var 0.04 → prior strength
    # α+β = 0.4·0.6/0.04 − 1 = 5, i.e. Beta(α=2, β=3). Posterior means:
    # (x+α)/(n+α+β) = (1+2)/(5+5) = 0.3 and (3+2)/(5+5) = 0.5.
    spec = {"a": (1, 5), "b": (3, 5)}
    rows = []
    for g, (x, n) in spec.items():
        rows += [(g, True)] * x + [(g, False)] * (n - x)
    df = spark.createDataFrame(rows, "g string, s boolean")
    got = {r["g"]: r.asDict() for r in eb_shrink_rates(df, "g", F.col("s")).collect()}
    assert got["a"]["shrunk_rate"] == pytest.approx(0.3, abs=1e-9)
    assert got["b"]["shrunk_rate"] == pytest.approx(0.5, abs=1e-9)


# ---------------------------------------------------------------------------
# Jackknife group influence: with exactly two groups, the leave-one-out
# mean of g IS the other group's plain mean — hand numbers, no LOO algebra.
# ---------------------------------------------------------------------------


def test_jackknife_two_group_hand_pin(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        jackknife_group_influence,
    )

    rows = [("a", 10), ("a", 20), ("b", 30), ("b", 60), ("b", 90)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r.asDict() for r in jackknife_group_influence(df, "g", "v").collect()}
    # mean_all = 210/5 = 42; loo(a) = mean(b) = 60; loo(b) = mean(a) = 15
    assert got["a"]["mean_all"] == 42.0
    assert got["a"]["loo_mean"] == 60.0 and got["a"]["influence"] == 18.0
    assert got["b"]["loo_mean"] == 15.0 and got["b"]["influence"] == -27.0


# ---------------------------------------------------------------------------
# DiD: planted baseline difference + common time trend + effect τ=25 —
# ground truth the estimator must recover exactly while a naive post-only
# comparison would report baseline+τ = 55.
# ---------------------------------------------------------------------------


def test_did_recovers_planted_effect_under_confounds(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import diff_in_diff

    cells = {
        (0, 0): [90, 110],                    # control pre: mean 100
        (0, 1): [140, 150, 160],              # control post: mean 150 (trend +50)
        (1, 0): [120, 130, 130, 140],         # treated pre: mean 130 (baseline +30)
        (1, 1): [195, 205, 205, 205, 215],    # treated post: 100+30+50+τ, τ=25
    }
    rows = [
        (bool(t), bool(p), v) for (t, p), vs in cells.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "t boolean, p boolean, y long")
    r = diff_in_diff(df, F.col("t"), F.col("p"), F.col("y")).collect()[0]
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (2, 3, 4, 5)
    assert r["did_cents"] == 25.0
    # the naive post-only difference is confounded: 205 − 150 = 55 ≠ τ
    assert 205.0 - 150.0 != 25.0
