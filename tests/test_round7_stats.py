"""Naive-reference tests for the round-7 statistics (mirror-oracle blind
spot rule: every statistic needs hand/naive-Python expected values, with
half-away rounding — math.floor(x*1e4+0.5)/1e4, never Python round())."""

import math

import pytest

from azure_medicine_data_engineering_spark.functions.rankstats import (
    hotelling_t2_two_sample,
    kendall_tau_keyed,
    wasserstein_two_sample,
)


def _r4(x):
    return math.floor(x * 1e4 + 0.5) / 1e4 if x >= 0 else -math.floor(-x * 1e4 + 0.5) / 1e4


def _naive_w1(xs, ys):
    """Integrate |F1 - F2| over the value axis (both samples on the same
    grid; empirical CDFs step at each distinct value)."""
    vals = sorted(set(xs) | set(ys))
    n1, n2 = len(xs), len(ys)
    w = 0.0
    for v, nxt in zip(vals, vals[1:]):
        f1 = sum(1 for a in xs if a <= v) / n1
        f2 = sum(1 for b in ys if b <= v) / n2
        w += abs(f1 - f2) * (nxt - v)
    return w


def test_wasserstein_naive(spark):
    # cents-grid samples with ties and unequal sizes
    xs = [100, 100, 250, 250, 400, 700]          # group1 ("click")
    ys = [100, 250, 250, 300, 300, 550, 550, 900]  # group2
    rows = [(v, "click") for v in xs] + [(v, "view") for v in ys]
    df = spark.createDataFrame(rows, "v long, g string")
    got = wasserstein_two_sample(df, "v", "g", "click", scale="1e2").collect()[0]
    assert got["n1"] == len(xs) and got["n2"] == len(ys)
    expected = _r4(_naive_w1(xs, ys) / 100.0)  # scale=1e2: cents -> units
    assert got["w1"] == expected


def test_wasserstein_identical_samples_zero(spark):
    xs = [10, 20, 20, 30]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in xs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = wasserstein_two_sample(df, "v", "g", "a", scale="1e0").collect()[0]
    assert got["w1"] == 0.0


def test_wasserstein_point_masses_exact_shift(spark):
    # all mass at 0 vs all mass at 500 cents -> W1 = 5.00 units exactly
    rows = [(0, "a")] * 4 + [(500, "b")] * 4
    df = spark.createDataFrame(rows, "v long, g string")
    got = wasserstein_two_sample(df, "v", "g", "a", scale="1e2").collect()[0]
    assert got["w1"] == 5.0


def _naive_hotelling(x1, x2):
    """Closed-form p=2 two-sample Hotelling T² (pooled covariance),
    sequential-accumulation naive arithmetic."""
    n1, n2 = len(x1), len(x2)
    mx1 = sum(a for a, _ in x1) / n1
    my1 = sum(b for _, b in x1) / n1
    mx2 = sum(a for a, _ in x2) / n2
    my2 = sum(b for _, b in x2) / n2
    sxx = syy = sxy = 0.0
    for pts, mx, my in ((x1, mx1, my1), (x2, mx2, my2)):
        for a, b in pts:
            sxx += (a - mx) ** 2
            syy += (b - my) ** 2
            sxy += (a - mx) * (b - my)
    dof = n1 + n2 - 2
    sxx, syy, sxy = sxx / dof, syy / dof, sxy / dof
    dx, dy = mx1 - mx2, my1 - my2
    det = sxx * syy - sxy * sxy
    t2 = (n1 * n2 / (n1 + n2)) * (dx * dx * syy - 2 * dx * dy * sxy + dy * dy * sxx) / det
    f = (n1 + n2 - 3) / (2 * (n1 + n2 - 2)) * t2
    return t2, f


def test_hotelling_t2_naive(spark):
    # planted bivariate shift with nonzero covariance in both groups
    g1 = [(10, 2), (12, 3), (11, 2), (13, 4), (12, 3), (14, 5)]
    g2 = [(8, 1), (9, 2), (7, 1), (10, 3), (9, 2)]
    rows = [(x, y, "t") for x, y in g1] + [(x, y, "c") for x, y in g2]
    df = spark.createDataFrame(rows, "x long, y long, g string")
    got = hotelling_t2_two_sample(df, "x", "y", "g", "t").collect()[0]
    t2, f = _naive_hotelling(g1, g2)
    assert got["n1"] == len(g1) and got["n2"] == len(g2)
    assert abs(got["t2"] - _r4(t2)) <= 1e-4
    assert abs(got["f_stat"] - _r4(f)) <= 1e-4


def test_hotelling_t2_no_shift_near_zero(spark):
    # same cloud in both groups -> mean vectors equal -> T² == 0
    pts = [(1, 1), (2, 3), (3, 2), (4, 4)]
    rows = [(x, y, "a") for x, y in pts] + [(x, y, "b") for x, y in pts]
    df = spark.createDataFrame(rows, "x long, y long, g string")
    got = hotelling_t2_two_sample(df, "x", "y", "g", "a").collect()[0]
    assert got["t2"] == 0.0 and got["f_stat"] == 0.0


def test_kendall_guard_rejects_data_grain(spark):
    """Round-7 ADVICE: the O(m²) pair join refuses frames above the
    documented summary-frame bound instead of silently exploding."""
    df = spark.range(50).selectExpr("id AS k", "id AS x", "id AS y")
    with pytest.raises(ValueError, match="licensed for summary frames"):
        kendall_tau_keyed(df, "k", "x", "y", max_rows=10)
    # under the bound it still works
    out = kendall_tau_keyed(df.limit(5), "k", "x", "y", max_rows=10).collect()[0]
    assert out["tau_b"] == 1.0
