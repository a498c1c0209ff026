"""Round-8 statistics: naive-reference tests (CLAUDE.md mirror-oracle
blind-spot rule — every statistic gets a hand/naive-Python expected value
computed by an INDEPENDENT route, never the production expression)."""

from __future__ import annotations

import math

import pytest

from azure_medicine_data_engineering_spark.functions.rankstats import (
    cliff_delta,
    hellinger_distance,
    kendall_w,
    theils_u,
    welch_t_test,
)
from azure_medicine_data_engineering_spark.operators.events_analytics import (
    cox_stuart_trend,
    pettitt_change_point,
)


def _r4(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)


def test_welch_t_naive(spark):
    a = [12, 15, 11, 19, 14, 13]
    b = [22, 25, 21, 30, 28, 24, 27, 26]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "x long, g string")
    got = welch_t_test(df, "x", "g", "a").collect()[0]
    # independent route: plain float means/variances
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
    vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    df_w = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert got["n1"] == 6 and got["n2"] == 8
    assert abs(got["t"] - _r4(t)) <= 1e-9
    assert abs(got["df_w"] - _r4(df_w)) <= 1e-9
    assert got["t"] < 0  # a is clearly below b


def test_cliff_delta_bruteforce(spark):
    a = [1, 2, 2, 5, 7]
    b = [2, 3, 3, 4]
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "x long, g string")
    got = cliff_delta(df, "x", "g", "a").collect()[0]
    num = sum(
        (1 if x > y else (-1 if x < y else 0)) for x in a for y in b
    )
    assert got["n1"] == 5 and got["n2"] == 4
    assert got["num_d"] == num
    assert abs(got["delta"] - _r4(num / (5 * 4))) <= 1e-9
    # dominance sanity: all of a above all of b -> delta = 1
    rows2 = [(v + 100, "a") for v in a] + [(v, "b") for v in b]
    got2 = cliff_delta(
        spark.createDataFrame(rows2, "x long, g string"), "x", "g", "a"
    ).collect()[0]
    assert got2["delta"] == 1.0


def test_theils_u_naive(spark):
    # y perfectly determined by x -> U = 1; independent layout -> U = 0
    rows = [("s1", "click")] * 4 + [("s2", "view")] * 6
    df = spark.createDataFrame(rows, "x string, y string")
    got = theils_u(df, "y", "x").collect()[0]
    assert got["u"] == 1.0

    rows_ind = [
        (x, y) for x in ("s1", "s2") for y in ("click", "view") for _ in range(3)
    ]
    got_ind = theils_u(
        spark.createDataFrame(rows_ind, "x string, y string"), "y", "x"
    ).collect()[0]
    assert got_ind["u"] == 0.0

    # general case vs brute entropy
    from collections import Counter

    rows_g = (
        [("s1", "click")] * 5 + [("s1", "view")] * 2
        + [("s2", "click")] * 1 + [("s2", "view")] * 7
        + [("s3", "click")] * 3 + [("s3", "view")] * 3
    )
    got_g = theils_u(
        spark.createDataFrame(rows_g, "x string, y string"), "y", "x"
    ).collect()[0]
    n = len(rows_g)
    cy = Counter(y for _, y in rows_g)
    cx = Counter(x for x, _ in rows_g)
    cxy = Counter(rows_g)
    hy = -sum(c / n * math.log(c / n) for c in cy.values())
    hyx = -sum(
        c / n * math.log(c / cx[x]) for (x, _), c in cxy.items()
    )
    u_ref = (hy - hyx) / hy
    assert abs(got_g["u"] - u_ref) <= 2e-4  # micro-grid term rounding


def test_kendall_w_naive(spark):
    # 4 blocks ranking 3 treatments, no ties: classical 12S formula
    blocks = {
        "b1": {"t1": 1, "t2": 5, "t3": 9},
        "b2": {"t1": 2, "t2": 6, "t3": 8},
        "b3": {"t1": 3, "t2": 4, "t3": 7},
        "b4": {"t1": 1, "t2": 3, "t3": 5},
    }
    rows = [(b, t, v) for b, ts in blocks.items() for t, v in ts.items()]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    got = kendall_w(df, "b", "trt", "v").collect()[0]
    n, k = 4, 3
    # independent: within-block ranks, W = 12S / (n^2 k (k^2-1))
    rank_sums = {"t1": 0.0, "t2": 0.0, "t3": 0.0}
    for ts in blocks.values():
        order = sorted(ts, key=ts.get)
        for r, t in enumerate(order, start=1):
            rank_sums[t] += r
    mean_r = n * (k + 1) / 2
    s = sum((v - mean_r) ** 2 for v in rank_sums.values())
    w_ref = 12.0 * s / (n * n * k * (k * k - 1))
    assert got["n_blocks"] == n and got["k"] == k
    assert abs(got["w"] - _r4(w_ref)) <= 2e-4
    assert got["w"] == 1.0  # all four blocks agree perfectly


def test_pettitt_bruteforce(spark):
    import datetime

    # clear level shift after day 9
    vals = [10, 11, 10, 12, 11, 10, 11, 12, 10, 11, 30, 31, 32, 30, 31, 33, 32, 30]
    base = datetime.date(2000, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = pettitt_change_point(df).collect()[0]
    n = len(vals)
    # brute force U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
    k_best, t_best = -1, None
    for t in range(1, n):
        u = sum(
            (1 if vals[i] > vals[j] else (-1 if vals[i] < vals[j] else 0))
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > k_best:
            k_best, t_best = abs(u), t
    assert got["n"] == n
    assert got["k_u"] == k_best
    assert got["change_day"] == (base + datetime.timedelta(days=t_best - 1)).isoformat()
    p_ref = min(1.0, 2.0 * math.exp(-6.0 * k_best**2 / (n**3 + n**2)))
    assert abs(got["p_approx"] - _r4(p_ref)) <= 1e-9
    assert got["p_approx"] < 0.01  # the planted shift is decisive


def test_cox_stuart_naive(spark):
    import datetime

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9]  # strictly increasing, odd length
    base = datetime.date(2000, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = cox_stuart_trend(df).collect()[0]
    # offset ceil(9/2)=5 -> pairs (0,5)..(3,8): all increasing
    assert got["n_days"] == 9 and got["m"] == 4 and got["s_plus"] == 4
    assert abs(got["z"] - _r4((2 * 4 - 4) / math.sqrt(4))) <= 1e-9
    assert got["z"] == 2.0


def test_hellinger_naive(spark):
    rows = (
        [("w1", True)] * 4 + [("w2", True)] * 6
        + [("w1", False)] * 8 + [("w3", False)] * 2
    )
    df = spark.createDataFrame(rows, "c string, r boolean")
    got = hellinger_distance(df, "c", "r").collect()[0]
    pa = {"w1": 0.4, "w2": 0.6, "w3": 0.0}
    pb = {"w1": 0.8, "w2": 0.0, "w3": 0.2}
    bc = sum(math.sqrt(pa[w] * pb[w]) for w in pa)
    h_ref = math.sqrt(1 - bc)
    assert got["n_cats"] == 3 and got["n_ref"] == 10 and got["n_cur"] == 10
    assert abs(got["hellinger"] - h_ref) <= 2e-4
    # identical distributions -> 0 (clamped against grid overshoot)
    same = [("w1", True)] * 3 + [("w2", True)] * 2 + [("w1", False)] * 3 + [("w2", False)] * 2
    got0 = hellinger_distance(
        spark.createDataFrame(same, "c string, r boolean"), "c", "r"
    ).collect()[0]
    assert got0["hellinger"] == 0.0


def test_oov_rate_planted(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        oov_rate_by_source,
    )

    rows = [
        (1, "src0", "a b c a b a"),       # ref vocab (k=2): a(3), b(2) -> top2
        (2, "srcX", "a b zz qq"),          # 2 in-vocab, 2 OOV
        (3, "srcY", "zz zz zz zz"),        # all OOV
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in oov_rate_by_source(df, "src0", vocab_k=2).collect()
    }
    # src0 itself: 6 tokens, 'c' (count 1) is outside the top-2 vocab
    assert out["src0"]["n_tokens"] == 6 and out["src0"]["n_oov"] == 1
    assert out["srcX"]["n_oov"] == 2 and out["srcX"]["oov_rate"] == 0.5
    assert out["srcY"]["n_oov"] == 4 and out["srcY"]["oov_rate"] == 1.0


def test_lexical_diversity_planted(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        lexical_diversity_by_source,
    )

    rows = [
        (1, "tmpl", "x x x x"),            # 4 tokens, 1 type, 0 hapax
        (2, "rich", "a b c d"),            # 4 tokens, 4 types, 4 hapax
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r for r in lexical_diversity_by_source(df).collect()
    }
    assert out["tmpl"]["n_types"] == 1 and out["tmpl"]["n_hapax"] == 0
    assert out["tmpl"]["ttr"] == 0.25 and out["tmpl"]["hapax_share"] == 0.0
    assert out["rich"]["ttr"] == 1.0 and out["rich"]["hapax_share"] == 1.0


def test_ansari_bradley_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ansari_bradley_test,
    )

    a = [10, 12, 14, 16]          # wide spread around 13
    b = [12, 13, 13, 14, 13]      # crowded at the center
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "x long, g string")
    got = ansari_bradley_test(df, "x", "g", "a").collect()[0]

    # independent route: explicit positional scores with tie averaging
    pooled = sorted(a + b)
    n = len(pooled)
    score = [min(i + 1, n - i) for i in range(n)]  # position scores
    from collections import defaultdict

    pos_by_val = defaultdict(list)
    for i, v in enumerate(pooled):
        pos_by_val[v].append(score[i])
    avg_score = {v: sum(s) / len(s) for v, s in pos_by_val.items()}
    w_ref = sum(avg_score[v] for v in a)
    sa = sum(score)
    sa2 = sum(len(s) * (sum(s) / len(s)) ** 2 for s in pos_by_val.values())
    n1, n2 = len(a), len(b)
    e_w = n1 * sa / n
    var_w = n1 * n2 * (n * sa2 - sa * sa) / (n * n * (n - 1))
    z_ref = (w_ref - e_w) / math.sqrt(var_w)
    assert got["n1"] == n1 and got["n2"] == n2
    # W rounds per-block to the unit grid; this layout's averages are
    # integer/half so the rounded sum matches within 1 unit
    assert abs(got["w"] - w_ref) <= 1.0
    assert abs(got["z"] - z_ref) <= 2e-3
    assert got["z"] < 0  # wide group collects a LOW center-peaked score sum


def test_ljung_box_naive(spark):
    import datetime

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        acf_daily_revenue,
        ljung_box_daily,
    )

    # 40 days with a strong weekly sawtooth -> serial structure
    vals = [100 + 30 * (i % 7) for i in range(40)]
    base = datetime.date(2001, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = ljung_box_daily(df, max_lag=5).collect()[0]
    rks = {r["k"]: r["r"] for r in acf_daily_revenue(df, 5).collect()}
    n = len(vals)
    q_ref = n * (n + 2) * sum(rks[k] ** 2 / (n - k) for k in range(1, 6))
    assert got["n"] == n and got["m"] == 5
    assert abs(got["q_stat"] - q_ref) <= 1e-3
    assert got["q_stat"] > 15.09  # chi2_0.99(5): the sawtooth is decisive


def test_ljung_box_hand_pinned(spark):
    """Hand-computed 8-day ACF + Q pin, independent of acf_daily_revenue
    (the sawtooth test above derives Q from the implementation's own r_k,
    so it alone could not catch a defect SHARED by ACF and Q).

    Series x = [2,4,6,8,6,4,2,4]; n=8; x̄ = 36/8 = 4.5.
    Deviations d = [-2.5,-0.5,1.5,3.5,1.5,-0.5,-2.5,-0.5];
    den = Σd² = 6.25+0.25+2.25+12.25+2.25+0.25+6.25+0.25 = 30.
    lag-1 num = 1.25−0.75+5.25+5.25−0.75+1.25+1.25 = 12.75 → r1 = 0.425.
    lag-2 num = −3.75−1.75+2.25−1.75−3.75+0.25 = −8.5
      → r2 = −17/60 = −0.28333… → 4-dec −0.2833.
    Q on the production 1e-12 grid over the ROUNDED r_k:
      t1 = floor(0.425²/7·1e12 + .5)  = floor(25803571428.571+.5) = 25803571429
      t2 = floor(0.2833²/6·1e12 + .5) = floor(13376481666.667+.5) = 13376481667
      Q = round(8·10·(t1+t2)/1e12, 4) = round(3.13440424768, 4) = 3.1344.
    """
    import datetime

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        acf_daily_revenue,
        ljung_box_daily,
    )

    vals = [2.0, 4.0, 6.0, 8.0, 6.0, 4.0, 2.0, 4.0]
    base = datetime.date(2001, 3, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    rks = {r["k"]: r["r"] for r in acf_daily_revenue(df, max_lag=2).collect()}
    assert rks[1] == pytest.approx(0.425, abs=1e-9)
    assert rks[2] == pytest.approx(-0.2833, abs=1e-9)
    got = ljung_box_daily(df, max_lag=2).collect()[0]
    assert got["n"] == 8 and got["m"] == 2
    assert got["q_stat"] == pytest.approx(3.1344, abs=1e-9)


def test_hhi_poles(spark):
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        hhi_by_group,
    )
    from pyspark.sql import functions as F

    rows = (
        [("mono", "e1", 100.0)] * 4                      # one entity -> HHI 1
        + [("even", f"e{i}", 25.0) for i in range(4)]     # 4 equal -> 0.25
        + [("skew", "big", 90.0), ("skew", "small", 10.0)]
    )
    df = spark.createDataFrame(rows, "g string, e string, v double")
    out = {
        r["g"]: r
        for r in hhi_by_group(
            df, "g", "e", F.round(F.col("v") * 100).cast("long")
        ).collect()
    }
    assert out["mono"]["hhi"] == 1.0 and out["mono"]["n_entities"] == 1
    assert out["even"]["hhi"] == 0.25 and out["even"]["n_entities"] == 4
    assert abs(out["skew"]["hhi"] - (0.81 + 0.01)) <= 1e-9


def test_bigram_cond_entropy_naive(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        bigram_conditional_entropy_by_source,
    )

    rows = [
        (1, "det", "a b a b a b"),   # next fully determined -> 0
        (2, "mix", "a b a c"),        # H = 2*ln2/3
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in bigram_conditional_entropy_by_source(df).collect()
    }
    assert out["det"]["h_cond"] == 0.0 and out["det"]["n_bigrams"] == 5
    # pairs: (a,b),(b,a),(a,c); cur=a margin 2 -> terms ln2 + 0 + ln2
    ref = 2 * math.log(2) / 3
    assert out["mix"]["n_bigrams"] == 3
    assert abs(out["mix"]["h_cond"] - ref) <= 2e-6  # micro grid + floor div


def test_quade_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        quade_test,
    )

    # Conover's structure: 5 blocks x 3 treatments with varied block ranges
    blocks = {
        "b1": {"t1": 1, "t2": 5, "t3": 9},    # wide block, clear order
        "b2": {"t1": 2, "t2": 3, "t3": 4},    # narrow
        "b3": {"t1": 10, "t2": 30, "t3": 50}, # widest, same order
        "b4": {"t1": 3, "t2": 2, "t3": 6},    # mild disagreement
        "b5": {"t1": 1, "t2": 2, "t3": 2},    # tie inside a block
    }
    rows = [(b, t, v) for b, ts in blocks.items() for t, v in ts.items()]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    got = quade_test(df, "b", "trt", "v").collect()[0]

    # independent reference: classical fractional ranks
    def mid_ranks(vals):
        out = []
        for v in vals:
            less = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            out.append(less + (eq + 1) / 2)
        return out

    k = 3
    names = sorted({t for ts in blocks.values() for t in ts})
    ranges = {b: max(ts.values()) - min(ts.values()) for b, ts in blocks.items()}
    q_ranks = dict(zip(sorted(ranges), mid_ranks([ranges[b] for b in sorted(ranges)])))
    s = {}
    a_stat = 0.0
    for b, ts in blocks.items():
        r = dict(zip(sorted(ts), mid_ranks([ts[t] for t in sorted(ts)])))
        for t in names:
            sij = q_ranks[b] * (r[t] - (k + 1) / 2)
            s[t] = s.get(t, 0.0) + sij
            a_stat += sij * sij
    n = len(blocks)
    b_stat = sum(v * v for v in s.values()) / n
    f_ref = (n - 1) * b_stat / (a_stat - b_stat)
    assert got["n_blocks"] == n and got["k"] == k
    assert abs(got["f_stat"] - _r4(f_ref)) <= 1e-9

    # degenerate: identical order AND equal ranges in every block ->
    # equal weights, identical S rows -> A == B -> F undefined -> NULL
    # (guarded identically on both engines)
    rows_p = [
        (f"b{i}", t, (j + 1) + i)
        for i in range(4)
        for j, t in enumerate(["t1", "t2", "t3"])
    ]
    got_p = quade_test(
        spark.createDataFrame(rows_p, "b string, trt string, v long"),
        "b", "trt", "v",
    ).collect()[0]
    assert got_p["f_stat"] is None


def test_dunning_keyness_planted(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        dunning_keyness_top_terms,
    )

    rows = [
        (1, "src0", "special special special common common"),
        (2, "rest", "common common common other other other"),
        (3, "rest", "common other filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = dunning_keyness_top_terms(df, "src0", k=3).collect()
    # 'special' occurs ONLY in src0 -> top keyness, enriched
    assert out[0]["token"] == "special" and out[0]["enriched"]
    assert out[0]["a"] == 3 and out[0]["b"] == 0
    # independent G2 for 'special': a=3,b=0,na=5,nb=10
    a, b_, na, nb = 3, 0, 5, 10
    g2_ref = 2 * (a * math.log(a * (na + nb) / ((a + b_) * na)))
    assert abs(out[0]["g2"] - _r4(g2_ref)) <= 2e-6  # g2 displays 4-dec
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_risk_difference_newcombe_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        risk_difference_newcombe,
    )
    from pyspark.sql import functions as F

    # group1: 30/100 success; group2: 10/100
    rows = (
        [(True, True)] * 30 + [(True, False)] * 70
        + [(False, True)] * 10 + [(False, False)] * 90
    )
    df = spark.createDataFrame(rows, "g boolean, s boolean")
    got = risk_difference_newcombe(df, F.col("g"), F.col("s")).collect()[0]
    assert (got["n1"], got["x1"], got["n2"], got["x2"]) == (100, 30, 100, 10)
    assert got["rd"] == 0.2 and got["nnt"] == 5.0

    # independent Newcombe route: Wilson bounds from the closed form
    def wilson(x, n, z=1.96):
        p = x / n
        lo = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
        hi = (p + z * z / (2 * n) + z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
        return lo, hi

    l1, u1 = wilson(30, 100)
    l2, u2 = wilson(10, 100)
    d = 0.3 - 0.1
    lo_ref = d - math.sqrt((0.3 - l1) ** 2 + (u2 - 0.1) ** 2)
    hi_ref = d + math.sqrt((u1 - 0.3) ** 2 + (0.1 - l2) ** 2)
    # production assembles from 4-dec-rounded Wilson bounds: ~2e-4 slack
    assert abs(got["rd_lo"] - lo_ref) <= 3e-4
    assert abs(got["rd_hi"] - hi_ref) <= 3e-4
    assert got["rd_lo"] > 0  # clearly separated rates exclude 0

    # RD = 0 -> NNT undefined -> NULL
    rows0 = [(True, True)] * 5 + [(True, False)] * 5 + [(False, True)] * 5 + [(False, False)] * 5
    got0 = risk_difference_newcombe(
        spark.createDataFrame(rows0, "g boolean, s boolean"), F.col("g"), F.col("s")
    ).collect()[0]
    assert got0["rd"] == 0.0 and got0["nnt"] is None
