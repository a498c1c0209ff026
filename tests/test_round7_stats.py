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


def test_mann_kendall_guard_rejects_data_grain(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mann_kendall_keyed,
    )

    df = spark.range(50).selectExpr("id AS t", "id AS y")
    with pytest.raises(ValueError, match="licensed for summary"):
        mann_kendall_keyed(df, "t", "y", max_rows=10)
    out = mann_kendall_keyed(df.limit(5), "t", "y", max_rows=10).collect()[0]
    assert out["s"] == 10  # strictly increasing: all C(5,2) pairs concordant


def test_gk_gamma_guard_rejects_data_grain(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        gk_gamma_keyed,
    )

    df = spark.range(50).selectExpr("id AS k", "id AS x", "id AS y")
    with pytest.raises(ValueError, match="licensed for summary"):
        gk_gamma_keyed(df, "k", "x", "y", max_rows=10)
    out = gk_gamma_keyed(df.limit(5), "k", "x", "y", max_rows=10).collect()[0]
    assert out["gamma"] == 1.0


def test_theil_sen_guard_rejects_non_day_grain(spark):
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        theil_sen_trend,
    )

    orders = spark.range(40).selectExpr(
        "CAST(timestamp '1995-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS timestamp) AS o_orderdate",
        "CAST(100 + id * 2 AS DOUBLE) AS o_totalprice",
    )
    with pytest.raises(ValueError, match="licensed for calendar-bounded"):
        theil_sen_trend(orders, max_days=10)
    got = theil_sen_trend(orders, max_days=100).collect()[0]
    assert got["slope_dollars_per_day"] == 2.0  # exact linear series


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ad_two_sample,
    jonckheere_trend,
    mood_median_test,
)


def test_mood_median_naive(spark):
    vals = {"a": [1, 2, 3, 9], "b": [5, 6, 7], "c": [2, 8, 8, 8, 1]}
    rows = [(v, g) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = mood_median_test(df, "v", "g").collect()[0]
    pooled = sorted(v for vs in vals.values() for v in vs)
    n = len(pooled)
    m = pooled[(n + 1) // 2 - 1]  # lower-middle order statistic
    assert got["med_v"] == m and got["n"] == n and got["k"] == 3
    above = {g: sum(1 for v in vs if v > m) for g, vs in vals.items()}
    below = {g: sum(1 for v in vs if v <= m) for g, vs in vals.items()}
    ca, cb = sum(above.values()), sum(below.values())
    chi2 = 0.0
    for g in vals:
        r = above[g] + below[g]
        for o, c in ((above[g], ca), (below[g], cb)):
            num = o * n - r * c
            chi2 += math.floor(num * num / (n * r * c) * 1e6 + 0.5) / 1e6
    assert abs(got["chi2"] - _r4(chi2)) <= 1e-9


def test_mood_median_degenerate_one_sided(spark):
    """median == max (heavy upper tie) → c_above = 0: the 'above' column
    margin is empty, its cells are forced 0, and the chi-square must
    treat those 0²/0 terms as 0 — not NULL-drop them (non-ANSI 0/0)."""
    vals = {"a": [1, 5, 5, 5], "b": [5, 5, 5], "c": [2, 5, 5]}
    rows = [(v, g) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = mood_median_test(df, "v", "g").collect()[0]
    assert got["med_v"] == 5 and got["k"] == 3 and got["n"] == 10
    # every 'above' cell is 0 and every row margin equals its 'below'
    # count, so o·n − r·c_below = 0 for all below cells too → chi2 = 0
    assert got["chi2"] == 0.0


def _naive_jt(groups):
    """groups: ordered list of value lists. Returns (jt2, e2, z)."""
    k = len(groups)
    jt2 = 0
    for i in range(k):
        for j in range(i + 1, k):
            for a in groups[i]:
                for b in groups[j]:
                    jt2 += 2 if a < b else (1 if a == b else 0)
    ns = [len(g) for g in groups]
    n = sum(ns)
    e2 = (n * n - sum(x * x for x in ns)) // 2
    from collections import Counter
    ties = Counter(v for g in groups for v in g)
    t_a = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    t_b = sum(t * (t - 1) * (t - 2) for t in ties.values())
    t_c = sum(t * (t - 1) for t in ties.values())
    g_a = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    g_b = sum(x * (x - 1) * (x - 2) for x in ns)
    g_c = sum(x * (x - 1) for x in ns)
    var = (
        (n * (n - 1) * (2 * n + 5) - g_a - t_a) / 72.0
        + g_b * t_b / (36.0 * n * (n - 1) * (n - 2))
        + g_c * t_c / (8.0 * n * (n - 1))
    )
    z = (jt2 - e2) / (2.0 * math.sqrt(var))
    return jt2, e2, z


def test_jonckheere_naive(spark):
    groups = {
        "lo": [1, 3, 3, 5],
        "mid": [2, 4, 6, 6, 8],
        "hi": [5, 7, 9, 11],
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = jonckheere_trend(df, "v", "g", ["lo", "mid", "hi"]).collect()[0]
    jt2, e2, z = _naive_jt([groups["lo"], groups["mid"], groups["hi"]])
    assert got["jt2"] == jt2 and got["e2"] == e2
    assert abs(got["z"] - _r4(z)) <= 1e-4
    # the planted upward trend must push JT above its H0 expectation
    assert got["jt2"] > got["e2"] and got["z"] > 0


def test_jonckheere_reverse_order_flips_sign(spark):
    rows = [(v, g) for g, vs in
            {"lo": [1, 2, 3], "hi": [7, 8, 9]}.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    up = jonckheere_trend(df, "v", "g", ["lo", "hi"]).collect()[0]
    dn = jonckheere_trend(df, "v", "g", ["hi", "lo"]).collect()[0]
    assert up["z"] > 0 and dn["z"] < 0
    assert up["jt2"] + dn["jt2"] == 2 * 3 * 3  # U_ij + U_ji = n_i*n_j (doubled)


def _naive_ad(xs, ys):
    """Scholz-Stephens midrank A2akN (k=2) with the 1e12-grid per-term
    rounding the distributed plan uses."""
    from collections import Counter
    c1s, c2s = Counter(xs), Counter(ys)
    n1, n2 = len(xs), len(ys)
    n = n1 + n2
    s = 0
    cum1 = cum2 = 0
    for v in sorted(set(xs) | set(ys)):
        c1, c2 = c1s.get(v, 0), c2s.get(v, 0)
        cum1 += c1
        cum2 += c2
        l = c1 + c2
        cum = cum1 + cum2
        b2 = 2 * cum - l
        den2 = b2 * (2 * n - b2) - n * l
        if den2 <= 0:
            return None
        for ci, cumi, ni in ((c1, cum1, n1), (c2, cum2, n2)):
            m2 = 2 * cumi - ci
            dn = n * m2 - ni * b2
            s += math.floor(l * float(dn) * dn / (n * float(ni) * den2) * 1e12 + 0.5)
    return _r4((n - 1) / n * (s / 1e12))


def test_ad_two_sample_naive(spark):
    xs = [1, 2, 2, 3, 5, 8]
    ys = [2, 4, 4, 6, 7, 9, 9]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in ys]
    df = spark.createDataFrame(rows, "v long, g string")
    got = ad_two_sample(df, "v", "g", "a").collect()[0]
    assert got["n1"] == len(xs) and got["n2"] == len(ys)
    assert abs(got["a2"] - _naive_ad(xs, ys)) <= 1e-9


def test_ad_group_swap_invariant(spark):
    xs = [1, 4, 4, 7]
    ys = [2, 3, 8, 9, 10]
    rows = [(v, "a") for v in xs] + [(v, "b") for v in ys]
    df = spark.createDataFrame(rows, "v long, g string")
    a = ad_two_sample(df, "v", "g", "a").collect()[0]["a2"]
    b = ad_two_sample(df, "v", "g", "b").collect()[0]["a2"]
    assert a == b


def test_ad_separation_dominates_identical(spark):
    near = [(v, "a") for v in [1, 2, 3, 4]] + [(v, "b") for v in [1, 2, 3, 4]]
    far = [(v, "a") for v in [1, 2, 3, 4]] + [(v, "b") for v in [11, 12, 13, 14]]
    d_near = spark.createDataFrame(near, "v long, g string")
    d_far = spark.createDataFrame(far, "v long, g string")
    a_near = ad_two_sample(d_near, "v", "g", "a").collect()[0]["a2"]
    a_far = ad_two_sample(d_far, "v", "g", "a").collect()[0]["a2"]
    assert a_far > a_near


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    bartlett_test,
)


def _naive_bartlett_grid(groups):
    """The engine's shared definition: pooled SS folded over the
    group-sorted per-group doubles (callers pass groups pre-sorted),
    micro-grid ln terms, pico-grid inverse terms."""
    ns = [len(g) for g in groups]
    n, k = sum(ns), len(groups)
    sp_sum = 0.0
    ln_u = 0
    inv_p = 0
    for g in groups:
        ng = len(g)
        s = sum(g)
        q = sum(v * v for v in g)
        num = ng * q - s * s
        sp_sum = sp_sum + float(num) / ng
        s2 = float(num) / (float(ng) * float(ng - 1))
        ln_u += math.floor((ng - 1) * math.log(s2) * 1e6 + 0.5)
        inv_p += math.floor(1e12 / float(ng - 1) + 0.5)
    t = ((n - k) * math.log(sp_sum / (n - k * 1.0)) - ln_u / 1e6) / (
        1.0 + (inv_p / 1e12 - 1.0 / (n - k)) / (3.0 * (k - 1.0))
    )
    return _r4(t)


def _naive_bartlett_textbook(groups):
    ns = [len(g) for g in groups]
    n, k = sum(ns), len(groups)
    ss = []
    for g in groups:
        mu = sum(g) / len(g)
        ss.append(sum((v - mu) ** 2 for v in g))
    sp2 = sum(ss) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(g) - 1) * math.log(ssg / (len(g) - 1)) for g, ssg in zip(groups, ss)
    )
    den = 1 + (sum(1 / (len(g) - 1) for g in groups) - 1 / (n - k)) / (3 * (k - 1))
    return num / den


def test_bartlett_naive(spark):
    # cents-scale magnitudes: the floor-div grid loses <=1 cent² per
    # group, negligible at realistic scales (it is NOT at toy scales)
    groups = {
        "a": [1000, 1200, 1100, 1400, 900, 1300],
        "b": [2000, 3000, 1000, 4000, 2500],
        "c": [500, 500, 600, 600, 500, 600, 500],
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = bartlett_test(df, "v", "g").collect()[0]
    gl = [groups["a"], groups["b"], groups["c"]]
    assert got["n"] == 18 and got["k"] == 3
    assert got["t_stat"] == _naive_bartlett_grid(gl)
    # the grid definition tracks the textbook statistic
    assert abs(got["t_stat"] - _naive_bartlett_textbook(gl)) < 1e-3
    # unequal variances must reject harder than equal ones
    eq = [[1, 2, 3, 4], [2, 3, 4, 5], [0, 1, 2, 3]]
    rows_eq = [(v, str(i)) for i, g in enumerate(eq) for v in g]
    t_eq = bartlett_test(
        spark.createDataFrame(rows_eq, "v long, g string"), "v", "g"
    ).collect()[0]["t_stat"]
    assert got["t_stat"] > t_eq


# ---------------------------------------------------------------------------
# Gopher quality rules (planted one-failure-per-rule corpus).
# ---------------------------------------------------------------------------


def test_gopher_rules_planted(spark):
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        gopher_quality_report,
    )

    good = "the cat sat with all of " + " ".join(f"word{i:02d}" for i in range(60))
    short = "the cat sat with of"                       # < 50 words
    longwords = "the of " + " ".join(["extraordinarily"] * 60)  # mean wlen > 10
    symbols = "the of " + " ".join(["#"] * 60)          # symbol ratio + alpha
    nostops = " ".join(f"tok{i:02d}" for i in range(60))  # no stop words
    rows = [
        (good, "s1"),
        (short, "s1"),
        (longwords, "s2"),
        (symbols, "s2"),
        (nostops, "s2"),
    ]
    df = spark.createDataFrame(rows, "text string, source string")
    got = {r["source"]: r.asDict() for r in gopher_quality_report(df).collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["n_pass"] == 1
    assert got["s1"]["fail_word_count"] == 1
    assert got["s2"]["n_pass"] == 0
    assert got["s2"]["fail_word_len"] == 2      # longwords + the 1-char '#' doc
    assert got["s2"]["fail_symbol"] == 1        # symbols doc
    assert got["s2"]["fail_alpha"] == 1         # same symbols doc
    assert got["s2"]["fail_stop"] == 1          # nostops
    # ellipsis symbols count as symbol hits too
    ell = "the of " + " ".join(["..."] * 60)
    d2 = spark.createDataFrame([(ell, "x")], "text string, source string")
    r2 = gopher_quality_report(d2).collect()[0]
    assert r2["fail_symbol"] == 1


# ---------------------------------------------------------------------------
# STL-lite decomposition (planted weekly pattern).
# ---------------------------------------------------------------------------


def test_stl_lite_planted_weekly(spark):
    """A series = linear trend + exact weekly pattern must decompose so
    that (a) rows reconstruct exactly on the micro grid, (b) the
    seasonal component is a function of day-of-week alone and
    zero-centered, (c) the remainder is ~0 for a noiseless series."""
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        stl_lite_daily,
    )
    import datetime

    base = datetime.date(1995, 1, 2)
    pattern = [500, -300, 200, 0, -400, 100, -100]  # sums to 0, in cents
    rows = []
    for i in range(70):
        d = base + datetime.timedelta(days=i)
        dow = (d - datetime.date(1970, 1, 1)).days % 7
        cents = 100_000 + 10 * i + pattern[dow]
        rows.append((datetime.datetime.combine(d, datetime.time()), cents / 100.0))
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    out = stl_lite_daily(df).collect()
    assert len(out) == 70 - 6  # full 7-day windows only
    seas_by_dow = {}
    for r in out:
        # exact reconstruction on the grid
        assert abs(r["trend"] + r["seasonal"] + r["remainder"] - r["revenue"]) < 1e-9
        dow = (datetime.date.fromisoformat(r["d_iso"]) - datetime.date(1970, 1, 1)).days % 7
        seas_by_dow.setdefault(dow, set()).add(r["seasonal"])
        # noiseless series: remainder vanishes (up to the micro grid)
        assert abs(r["remainder"]) < 0.01, r
    # seasonal is a pure function of dow and zero-centered
    assert all(len(v) == 1 for v in seas_by_dow.values())
    assert abs(sum(next(iter(v)) for v in seas_by_dow.values())) < 0.01
    # the planted pattern is recovered (up to the shared mean shift)
    got = {d: next(iter(v)) for d, v in seas_by_dow.items()}
    spread = {d: round(got[d] - min(got.values()), 2) for d in got}
    want = {d: (pattern[d] - min(pattern)) / 100 for d in range(7)}
    assert spread == {d: round(want[d], 2) for d in want}


def test_mann_kendall_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mann_kendall_keyed,
    )

    ys = [10, 12, 11, 15, 15, 18, 17, 20]  # upward with one tie pair
    rows = [(i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "t long, y long")
    got = mann_kendall_keyed(df, "t", "y").collect()[0]
    s = sum(
        (1 if ys[j] > ys[i] else (-1 if ys[j] < ys[i] else 0))
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    from collections import Counter
    n = len(ys)
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    z = (s - 1) / math.sqrt(var18 / 18.0) if s > 0 else (
        (s + 1) / math.sqrt(var18 / 18.0) if s < 0 else 0.0
    )
    assert got["n"] == n and got["s"] == s and got["var_s18"] == var18
    assert abs(got["z"] - _r4(z)) <= 1e-9
    assert got["z"] > 1.96  # the planted trend is significant


def test_mann_kendall_no_trend_and_reversal(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mann_kendall_keyed,
    )

    flat = [(i, 5) for i in range(10)]
    df = spark.createDataFrame(flat, "t long, y long")
    got = mann_kendall_keyed(df, "t", "y").collect()[0]
    assert got["s"] == 0 and got["z"] == 0.0
    up = [(i, i) for i in range(10)]
    dn = [(i, 10 - i) for i in range(10)]
    zu = mann_kendall_keyed(
        spark.createDataFrame(up, "t long, y long"), "t", "y"
    ).collect()[0]
    zd = mann_kendall_keyed(
        spark.createDataFrame(dn, "t long, y long"), "t", "y"
    ).collect()[0]
    assert zu["s"] == 45 and zd["s"] == -45 and zu["z"] == -zd["z"]


def _naive_page(blocks, k):
    """blocks: list of per-block value lists in hypothesized treatment
    order. INDEPENDENT reference route (not the production expression):
    single midranks L = Σ j·R_j, then the textbook standardization
    z = (12L − 3nk(k+1)²) / (k(k+1)·sqrt(n(k−1)))
    (Page 1963; Hollander & Wolfe eq. 7.36)."""
    L = 0.0
    for vals in blocks:
        for j, v in enumerate(vals):
            cnt_less = sum(1 for x in vals if x < v)
            c_eq = sum(1 for x in vals if x == v)
            L += (j + 1) * (cnt_less + (c_eq + 1) / 2.0)
    n = len(blocks)
    z = (12.0 * L - 3.0 * n * k * (k + 1) ** 2) / (
        k * (k + 1) * math.sqrt(n * (k - 1))
    )
    return int(round(2 * L)), z


def test_page_moments_enumerated():
    """Exact permutation moments of 2L by FULL enumeration for k=3,4:
    the gate's mirror-oracle blind spot (CLAUDE.md) requires at least
    one non-mirrored check of the E[2L]/Var[2L] constants themselves."""
    import itertools

    for k in (3, 4):
        vals2 = []  # 2L over all within-block rank permutations, n=1
        for perm in itertools.permutations(range(1, k + 1)):
            vals2.append(sum((j + 1) * 2 * r for j, r in enumerate(perm)))
        mean2 = sum(vals2) / len(vals2)
        var2 = sum((v - mean2) ** 2 for v in vals2) / len(vals2)
        assert mean2 == k * (k + 1) ** 2 / 2  # E[2L], n=1
        assert abs(var2 - k * k * (k + 1) ** 2 * (k - 1) / 36.0) < 1e-9


def test_page_trend_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        page_trend_test,
    )

    # 6 blocks, 4 ordered treatments, mostly increasing with one tie
    blocks = [
        [1, 2, 3, 4],
        [2, 2, 5, 6],
        [1, 3, 4, 8],
        [4, 3, 6, 7],
        [1, 2, 4, 3],
        [2, 4, 6, 9],
    ]
    rows = [
        (f"b{i}", f"t{j}", v)
        for i, vals in enumerate(blocks)
        for j, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "b string, trt string, v long")
    got = page_trend_test(df, "b", "trt", "v", ["t0", "t1", "t2", "t3"]).collect()[0]
    l2, z = _naive_page(blocks, 4)
    assert got["n_blocks" if "n_blocks" in got.asDict() else "n"] == 6
    assert got["l2"] == l2
    assert abs(got["z"] - _r4(z)) <= 1e-9
    assert got["z"] > 0
    # incomplete block drops
    rows_inc = rows + [("b9", "t0", 1)]
    got2 = page_trend_test(
        spark.createDataFrame(rows_inc, "b string, trt string, v long"),
        "b", "trt", "v", ["t0", "t1", "t2", "t3"],
    ).collect()[0]
    assert got2["l2"] == l2


def test_runs_test_naive(spark):
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        runs_test_daily,
    )
    import datetime

    # 12 days, cents pattern with known runs around the median
    cents = [100, 200, 300, 150, 900, 800, 700, 120, 110, 950, 970, 130]
    base = datetime.date(1995, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = runs_test_daily(df).collect()[0]
    n = len(cents)
    med = sorted(cents)[(n + 1) // 2 - 1]
    s = [1 if c > med else 0 for c in cents]
    n1, n2 = sum(s), n - sum(s)
    r = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
    e = 1 + 2 * n1 * n2 / n
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    z = (r - e) / math.sqrt(var)
    assert (got["n1"], got["n2"], got["r"]) == (n1, n2, r)
    assert abs(got["z"] - _r4(z)) <= 1e-9
    # perfectly alternating -> far MORE runs than expected (z > 0)
    alt = [100 if i % 2 else 900 for i in range(20)]
    rows2 = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         c / 100.0)
        for i, c in enumerate(alt)
    ]
    z_alt = runs_test_daily(
        spark.createDataFrame(rows2, "o_orderdate timestamp, o_totalprice double")
    ).collect()[0]["z"]
    # perfectly clumped -> far FEWER runs (z < 0)
    clump = [100] * 10 + [900] * 10
    rows3 = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         c / 100.0)
        for i, c in enumerate(clump)
    ]
    z_cl = runs_test_daily(
        spark.createDataFrame(rows3, "o_orderdate timestamp, o_totalprice double")
    ).collect()[0]["z"]
    assert z_alt > 2 and z_cl < -2


def test_brown_forsythe_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        brown_forsythe_test,
    )

    groups = {
        "a": [1000, 1200, 1100, 1400, 900, 1300],
        "b": [2000, 3000, 1000, 4000, 2500],
        "c": [500, 500, 600, 600, 500, 600, 500],
    }
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = brown_forsythe_test(df, "v", "g").collect()[0]

    # naive: doubled medians, ANOVA F over |2x - med2|
    def med2(vs):
        s = sorted(vs)
        n = len(s)
        return s[(n + 1) // 2 - 1] + s[n // 2]

    devs = {g: [abs(2 * v - med2(vs)) for v in vs] for g, vs in groups.items()}
    k = len(devs)
    n = sum(len(d) for d in devs.values())
    grand = sum(sum(d) for d in devs.values())
    ssb = sum(len(d) * (sum(d) / len(d) - grand / n) ** 2 for d in devs.values())
    ssw = sum(
        sum((x - sum(d) / len(d)) ** 2 for x in d) for d in devs.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k"] == k and got["n"] == n
    assert abs(got["f"] - _r4(f)) <= 1e-4
    # equal-spread groups score lower than the heterogeneous panel
    eq = {"a": [10, 20, 30], "b": [110, 120, 130], "c": [210, 220, 230]}
    rows2 = [(v, g) for g, vs in eq.items() for v in vs]
    f_eq = brown_forsythe_test(
        spark.createDataFrame(rows2, "v long, g string"), "v", "g"
    ).collect()[0]["f"]
    assert got["f"] > f_eq


def test_generalized_esd_planted_outliers(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: F401
        mood_median_test,  # keep import block stable
    )
    from azure_medicine_data_engineering_spark.functions.regress import (
        generalized_esd_daily,
    )
    import datetime

    base = datetime.date(1995, 1, 1)
    cents = [10_000 + (i % 3) for i in range(30)]
    cents[5] = 90_000   # gross high
    cents[17] = 1_000   # gross low
    cents[23] = 60_000  # moderate high
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=i), datetime.time()),
         c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    out = generalized_esd_daily(df, k=3).collect()
    assert [r["i"] for r in out] == [1, 2, 3]
    days = [r["d_iso"] for r in out]
    # the three planted days surface in deviation order
    assert days[0] == "1995-01-06" and set(days) == {
        "1995-01-06", "1995-01-18", "1995-01-24"
    }
    # R statistics decrease... not guaranteed in general, but here the
    # planted magnitudes do dominate successively
    assert out[0]["r_i"] > 0 and all(r["r_i"] > 0 for r in out)

    # naive round-1 check: R_1 equals Grubbs on the full series
    n = len(cents)
    mean = sum(cents) / n
    sd = math.sqrt(sum((c - mean) ** 2 for c in cents) / (n - 1))
    r1 = max(abs(c - mean) for c in cents) / sd
    assert abs(out[0]["r_i"] - _r4(r1)) <= 1e-4

    # λ_i against an INDEPENDENT inverse-t (incomplete-beta bisection,
    # not the production Acklam+Cornish-Fisher pipeline) per Rosner:
    # λ_i = (m−1)·t_{p,m−2} / sqrt((m−2+t²)·m), m the round's frame size,
    # p = 1 − α/(2m), α = 0.05
    for r in out:
        m = n - (r["i"] - 1)
        lam = _rosner_lambda_ref(m, alpha=0.05)
        assert abs(r["lambda_i"] - lam) <= 2e-4, (r["i"], r["lambda_i"], lam)
    # planted grosses exceed their critical values -> all three flagged
    assert all(r["outlier"] for r in out)


def _betacf(a, b, x):
    """Continued fraction for the incomplete beta (Lentz; Numerical
    Recipes 6.4 structure — standard public algorithm)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h


def _betai(a, b, x):
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _t_cdf(t, nu):
    x = nu / (nu + t * t)
    p = 0.5 * _betai(nu / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def _t_quantile(p, nu):
    lo, hi = 0.0, 100.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _t_cdf(mid, nu) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _rosner_lambda_ref(m, alpha=0.05):
    p = 1.0 - alpha / (2.0 * m)
    t = _t_quantile(p, m - 2)
    return (m - 1) * t / math.sqrt((m - 2 + t * t) * m)


def test_rosner_lambda_matches_published_table():
    """Pin the independent reference itself against the published Rosner
    λ values (NIST/SEMATECH 1.3.5.17.3 example, n = 54, α = 0.05:
    λ1 = 3.1588, λ2 = 3.1514, λ3 = 3.1439)."""
    for i, expect in ((1, 3.1588), (2, 3.1514), (3, 3.1439)):
        got = _rosner_lambda_ref(54 - (i - 1))
        assert abs(got - expect) <= 1e-4, (i, got)


def test_dunn_posthoc_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        dunn_test,
    )

    groups = {"a": [1, 2, 2, 4], "b": [3, 5, 5, 7, 9], "c": [8, 10, 11]}
    rows = [(v, g) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "v long, g string")
    got = {(r["g1"], r["g2"]): r for r in dunn_test(df, "v", "g").collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    # naive: pooled midranks, Dunn z with tie correction
    pooled = sorted(v for vs in groups.values() for v in vs)
    n = len(pooled)

    def midrank(v):
        less = sum(1 for x in pooled if x < v)
        eq = sum(1 for x in pooled if x == v)
        return less + (eq + 1) / 2

    from collections import Counter
    tiesum = sum(t**3 - t for t in Counter(pooled).values())
    means = {g: sum(midrank(v) for v in vs) / len(vs) for g, vs in groups.items()}
    for (g1, g2), r in got.items():
        n1, n2 = len(groups[g1]), len(groups[g2])
        z = (means[g1] - means[g2]) / math.sqrt(
            (n * (n + 1) / 12 - tiesum / (12 * (n - 1))) * (1 / n1 + 1 / n2)
        )
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert abs(r["z"] - _r4(z)) <= 1e-9, (g1, g2)
    # location ordering a < b < c shows in the signs
    assert got[("a", "b")]["z"] < 0 and got[("a", "c")]["z"] < 0 and got[("b", "c")]["z"] < 0


def test_gk_gamma_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        gk_gamma_keyed,
    )

    pts = [(0, 1, 10), (1, 2, 30), (2, 2, 20), (3, 3, 25), (4, 5, 50)]
    df = spark.createDataFrame(pts, "k long, x long, y long")
    got = gk_gamma_keyed(df, "k", "x", "y").collect()[0]
    nc = nd = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][1] - pts[i][1]
            dy = pts[j][2] - pts[i][2]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
    assert (got["nc"], got["nd"]) == (nc, nd)
    assert got["gamma"] == _r4((nc - nd) / (nc + nd))
    # perfect monotone -> gamma == 1 even with x ties (tau-b < 1)
    mono = [(i, v, v * 2) for i, v in enumerate([1, 2, 2, 3, 4])]
    g = gk_gamma_keyed(
        spark.createDataFrame(mono, "k long, x long, y long"), "k", "x", "y"
    ).collect()[0]
    assert g["gamma"] == 1.0
