"""Naive-reference tests for the round-6 statistics (mirror-oracle blind
spot rule: every statistic needs hand/naive-Python expected values, with
half-away rounding — math.floor(x*1e4+0.5)/1e4, never Python round())."""

import math
from collections import Counter

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.rankstats import (
    eb_shrink_rates,
    hbos_topk,
    jackknife_group_influence,
    wilson_ci_by_group,
)
from azure_medicine_data_engineering_spark.operators.text import (
    good_turing_ngram_mass,
)


def _r4(x):
    return math.floor(x * 1e4 + 0.5) / 1e4


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


def test_wilson_ci_naive(spark):
    # group A: 3/10 successes; group B: 0/5
    rows = [("A", True)] * 3 + [("A", False)] * 7 + [("B", False)] * 5
    df = spark.createDataFrame(rows, "g string, s boolean")
    got = {
        r["g"]: r.asDict()
        for r in wilson_ci_by_group(df, "g", F.col("s")).collect()
    }

    def wilson(x, n):
        z = 1.96
        ph = x / n
        den = 1 + z * z / n
        center = ph + z * z / (2 * n)
        half = z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n))
        return _r4((center - half) / den), _r4((center + half) / den)

    lo, hi = wilson(3, 10)
    assert got["A"]["x"] == 3 and got["A"]["n"] == 10
    assert abs(got["A"]["p_lo"] - lo) < 1e-12 and abs(got["A"]["p_hi"] - hi) < 1e-12
    lo_b, hi_b = wilson(0, 5)
    assert got["B"]["p_lo"] == lo_b  # 0.0: Wilson lower bound at x=0 is 0
    assert abs(got["B"]["p_hi"] - hi_b) < 1e-12
    # p_hat on the integer micro grid
    assert got["A"]["p_hat"] == 0.3 and got["B"]["p_hat"] == 0.0


def test_eb_shrinkage_naive(spark):
    # 4 groups with different rates/sizes; naive MoM beta-binomial
    spec = {"a": (8, 10), "b": (1, 10), "c": (5, 10), "d": (2, 4)}
    rows = []
    for g, (x, n) in spec.items():
        rows += [(g, True)] * x + [(g, False)] * (n - x)
    df = spark.createDataFrame(rows, "g string, s boolean")
    got = {r["g"]: r.asDict() for r in eb_shrink_rates(df, "g", F.col("s")).collect()}
    p_u = {g: (x * 10**6) // n for g, (x, n) in spec.items()}
    m = len(spec)
    sp = sum(p_u.values())
    sp2 = sum(v * v for v in p_u.values())
    mean = sp / (m * 1e6)
    var = (m * sp2 - sp * sp) / (m * m * 1e12)
    ab = max(mean * (1 - mean) / var - 1, 0.0)
    for g, (x, n) in spec.items():
        want = _r4((x + ab * mean) / (n + ab))
        assert abs(got[g]["shrunk_rate"] - want) < 1e-12, (g, got[g], want)
        assert got[g]["raw_rate"] == p_u[g] / 1e6
        # shrinkage pulls toward the grand mean, never past it
        raw = x / n
        assert (raw - mean) * (got[g]["shrunk_rate"] - mean) >= 0
        assert abs(got[g]["shrunk_rate"] - mean) <= abs(raw - mean) + 1e-12


def test_eb_shrinkage_zero_variance(spark):
    # identical rates in every group -> var 0 -> raw rates unchanged
    rows = [("a", True), ("a", False), ("b", True), ("b", False)]
    df = spark.createDataFrame(rows, "g string, s boolean")
    got = {r["g"]: r.asDict() for r in eb_shrink_rates(df, "g", F.col("s")).collect()}
    assert got["a"]["shrunk_rate"] == 0.5 and got["b"]["shrunk_rate"] == 0.5


def test_jackknife_influence_naive(spark):
    spec = {"a": [10, 20], "b": [100], "c": [30, 40, 50]}
    rows = [(g, v) for g, vs in spec.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r.asDict()
        for r in jackknife_group_influence(df, "g", "v").collect()
    }
    n_all = sum(len(v) for v in spec.values())
    t_all = sum(sum(v) for v in spec.values())
    all_u = (t_all * 10**6) // n_all
    for g, vs in spec.items():
        loo_u = ((t_all - sum(vs)) * 10**6) // (n_all - len(vs))
        want = _r6(loo_u / 1e6 - all_u / 1e6)
        assert abs(got[g]["influence"] - want) < 1e-12, (g, got[g], want)
        assert got[g]["mean_all"] == all_u / 1e6
    # removing the big group lowers the mean -> negative influence
    assert got["b"]["influence"] < 0 < got["c"]["influence"]


def test_hbos_naive(spark):
    # 20 normal rows in one price cluster/priority + 2 planted outliers
    rows = [(i, 1000 + i, "NORM") for i in range(20)]
    rows.append((100, 99999, "NORM"))   # price outlier
    rows.append((101, 1010, "RARE"))    # category outlier
    df = spark.createDataFrame(rows, "rid long, cents long, cat string")
    out = hbos_topk(df, "rid", "cents", "cat", n_bins=10, k=5)
    got = [r.asDict() for r in out.collect()]
    for c in out._stage_caches:
        c.unpersist()

    cmin, cmax = 1000, 99999
    n = 22
    bins = {}
    cats = Counter()
    rows_b = []
    for rid, c, cat in rows:
        b = min(9, (c - cmin) * 10 // (cmax - cmin + 1))
        rows_b.append((rid, b, cat))
        bins[b] = bins.get(b, 0) + 1
        cats[cat] += 1
    want = sorted(
        (
            (_r4(-math.log(bins[b] / n) - math.log(cats[cat] / n)), rid, b, cat)
            for rid, b, cat in rows_b
        ),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r["hbos"], r["rid"], r["bin"], r["cat"]) for r in got] == [
        (s, rid, b, cat) for s, rid, b, cat in want
    ]
    # the two planted outliers lead
    assert {got[0]["rid"], got[1]["rid"]} == {100, 101}


def test_good_turing_naive(spark):
    texts = ["a b c d e", "a b c d x", "a b c d e"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = good_turing_ngram_mass(df, n=4).collect()[0].asDict()
    grams = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - 3):
            grams[" ".join(toks[i : i + 4])] += 1
    n_tok = sum(grams.values())
    f1 = sum(1 for c in grams.values() if c == 1)
    f2 = sum(1 for c in grams.values() if c == 2)
    assert got["n_grams"] == n_tok and got["vocab"] == len(grams)
    assert got["f1"] == f1 and got["f2"] == f2
    assert got["p0_unseen"] == (f1 * 10**6 // n_tok) / 1e6
    assert got["chao1"] == _r4(len(grams) + f1 * f1 / (2 * f2))


def test_good_turing_no_doubletons(spark):
    df = spark.createDataFrame([("a b c d e",)], "text string")
    got = good_turing_ngram_mass(df, n=4).collect()[0].asDict()
    # two 4-grams, both singletons, f2=0 -> chao1 falls back to vocab
    assert got["f1"] == 2 and got["f2"] == 0
    assert got["chao1"] == 2.0
    assert got["p0_unseen"] == 1.0
