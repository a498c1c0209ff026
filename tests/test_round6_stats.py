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


# ---------------------------------------------------------------------------
# Round-6 wave 2: Kendall tau-b, Tukey HSD, t-closeness, TextRank.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    kendall_tau_keyed,
    tukey_hsd,
)
from azure_medicine_data_engineering_spark.operators.privacy import (  # noqa: E402
    t_closeness_report,
)
from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    textrank_keywords,
)


def test_kendall_tau_naive(spark):
    # day frame with ties in both x and y
    data = [(1, 3, 10), (2, 5, 20), (3, 5, 15), (4, 2, 15), (5, 7, 30)]
    df = spark.createDataFrame(data, "k long, x long, y long")
    got = kendall_tau_keyed(df, "k", "x", "y").collect()[0].asDict()

    nc = nd = 0
    n = len(data)
    for i in range(n):
        for j in range(i + 1, n):
            dx = data[i][1] - data[j][1]
            dy = data[i][2] - data[j][2]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    n0 = n * (n - 1) // 2
    cx = Counter(d[1] for d in data)
    cy = Counter(d[2] for d in data)
    tn1 = sum(t * (t - 1) // 2 for t in cx.values())
    tn2 = sum(t * (t - 1) // 2 for t in cy.values())
    tau = _r4((nc - nd) / math.sqrt((n0 - tn1) * (n0 - tn2)))
    assert got["n"] == n and got["nc"] == nc and got["nd"] == nd
    assert got["tn1"] == tn1 and got["tn2"] == tn2
    assert abs(got["tau_b"] - tau) < 1e-12


def test_kendall_tau_perfect_orders(spark):
    asc = [(i, i, 10 * i) for i in range(1, 7)]
    df = spark.createDataFrame(asc, "k long, x long, y long")
    assert kendall_tau_keyed(df, "k", "x", "y").collect()[0]["tau_b"] == 1.0
    desc = [(i, i, -10 * i) for i in range(1, 7)]
    df = spark.createDataFrame(desc, "k long, x long, y long")
    assert kendall_tau_keyed(df, "k", "x", "y").collect()[0]["tau_b"] == -1.0


def test_tukey_hsd_naive(spark):
    # three groups on the cents grid
    spec = {"a": [100, 200, 300, 400], "b": [500, 600, 700], "c": [150, 250]}
    rows = [(g, v) for g, vs in spec.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, c long")
    got = {
        (r["g1"], r["g2"]): r.asDict()
        for r in tukey_hsd(df, "c", "g", q_crit=3.0).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    n = sum(len(v) for v in spec.values())
    k = len(spec)
    q_tot = sum(v * v for vs in spec.values() for v in vs)
    ssg = 0.0
    for g in sorted(spec):  # the deterministic sorted fold
        ssg += sum(spec[g]) ** 2 / len(spec[g])
    msw = (q_tot - ssg) / (n - k)
    for g1, g2 in got:
        n1, n2 = len(spec[g1]), len(spec[g2])
        m1, m2 = sum(spec[g1]) / n1, sum(spec[g2]) / n2
        qs = _r4(abs(m1 - m2) / math.sqrt(msw / 2 * (1 / n1 + 1 / n2)))
        assert got[(g1, g2)]["n1"] == n1 and got[(g1, g2)]["n2"] == n2
        assert abs(got[(g1, g2)]["q_stat"] - qs) < 1e-12
        assert abs(got[(g1, g2)]["mean_diff"] - _r4((m1 - m2) / 100)) < 1e-12
        assert got[(g1, g2)]["significant"] == (qs > 3.0)


def test_t_closeness_naive(spark):
    # group g1: 4 rows all sensitive 'x' (skewed); g2: 2 x + 2 y (matches
    # the table mix less tightly). Table: 6 x, 2 y → p = (0.75, 0.25).
    rows = [("g1", "x")] * 4 + [("g2", "x")] * 2 + [("g2", "y")] * 2
    df = spark.createDataFrame(rows, "q string, s string")
    got = t_closeness_report(df, ["q"], "s", t_num=1, t_den=5).collect()[0]

    # TV(g1, table) = 0.5*(|1-0.75| + |0-0.25|) = 0.25 > 0.2 → violating
    # TV(g2, table) = 0.5*(|0.5-0.75| + |0.5-0.25|) = 0.25 > 0.2 → violating
    assert got["n_groups"] == 2
    assert got["max_t"] == 0.25
    assert got["n_violating_groups"] == 2
    assert got["n_rows_exposed"] == 8
    assert not got["t_close"]


def test_t_closeness_uniform_is_close(spark):
    # every group mirrors the table distribution exactly → max_t = 0
    rows = [("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")]
    df = spark.createDataFrame(rows, "q string, s string")
    got = t_closeness_report(df, ["q"], "s", t_num=1, t_den=5).collect()[0]
    assert got["max_t"] == 0.0 and got["t_close"]


def test_textrank_naive(spark):
    docs = [("a b c",), ("b c b",)]
    df = spark.createDataFrame(docs, "text string")
    got = {r["node"]: r["pr"] for r in textrank_keywords(df, "text").collect()}

    # undirected co-occurrence edges: (a,b)x1, (b,c)x3 (b-c, c-b, b-c... from
    # streams [a b c] → ab, bc; [b c b] → bc, cb) — each counted both ways
    edges = Counter()
    for (t,) in docs:
        ws = t.split()
        for i in range(len(ws) - 1):
            if ws[i] != ws[i + 1]:
                edges[(ws[i], ws[i + 1])] += 1
                edges[(ws[i + 1], ws[i])] += 1
    nodes = sorted({x for e in edges for x in e})
    outw = Counter()
    for (s, d), w in edges.items():
        outw[s] += w
    pr = {v: 1 / len(nodes) for v in nodes}
    for _ in range(3):
        mass = {v: 0.0 for v in nodes}
        for (s, d), w in edges.items():
            mass[d] += pr[s] * (w / outw[s])
        pr = {v: 0.15 / len(nodes) + 0.85 * mass[v] for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - pr[v]) < 1e-9
    # b sits between everything → highest rank
    assert max(pr, key=pr.get) == "b"
