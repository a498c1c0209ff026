"""Unit tests for the medical-statistics family (rank tests, chi-square,
odds ratio, survival) against naive in-test reference implementations,
plus the text-cleaning operators' semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.rankstats import (
    chi_square_independence,
    kruskal_wallis,
    mann_whitney_u,
    odds_ratio_2x2,
)
from azure_medicine_data_engineering_spark.operators.survival import (
    kaplan_meier,
    logrank_2group,
    time_to_event_days,
)
from azure_medicine_data_engineering_spark.operators.text_clean import (
    c4_line_filter,
    paragraph_dedup,
)


def _avg_ranks(values):
    """Average ranks (1-based, ties averaged) of a list."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j + 2) / 2.0  # 1-based average of positions i..j
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


class TestMannWhitney:
    # two groups with ties across and within groups
    A = [1.0, 2.0, 2.0, 3.5, 7.0, 9.0]
    B = [2.0, 4.0, 4.0, 5.0, 6.0]

    def test_u_and_z_match_naive(self, spark):
        rows = [("a", v) for v in self.A] + [("b", v) for v in self.B]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = mann_whitney_u(df, "v", "g", "a").collect()[0]

        allv = self.A + self.B
        ranks = _avg_ranks(allv)
        r1 = sum(ranks[: len(self.A)])
        n1, n2 = len(self.A), len(self.B)
        u1 = r1 - n1 * (n1 + 1) / 2.0
        assert out["n1"] == n1 and out["n2"] == n2
        assert out["u1"] == pytest.approx(u1, abs=1e-9)

        # tie-corrected z
        nn = n1 + n2
        from collections import Counter

        ties = sum(t**3 - t for t in Counter(allv).values())
        var = (n1 * n2 / 12.0) * ((nn + 1) - ties / (nn * (nn - 1)))
        z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
        assert out["z"] == pytest.approx(z, abs=1e-3)

    def test_no_ties_simple(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)], ["g", "v"]
        )
        out = mann_whitney_u(df, "v", "g", "a").collect()[0]
        assert out["u1"] == 0.0  # all of a below all of b


class TestKruskalWallis:
    def test_h_matches_naive(self, spark):
        groups = {
            "x": [2.9, 3.0, 2.5, 2.6, 3.2],
            "y": [3.8, 2.7, 4.0, 2.4],
            "z": [2.8, 3.4, 3.7, 2.2, 2.0],
        }
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, ["g", "v"])
        out = kruskal_wallis(df, "v", "g").collect()[0]

        allv = [v for vs in groups.values() for v in vs]
        ranks = _avg_ranks(allv)
        i = 0
        rsums = {}
        for g, vs in groups.items():
            rsums[g] = sum(ranks[i : i + len(vs)])
            i += len(vs)
        n = len(allv)
        h = 12.0 / (n * (n + 1)) * sum(
            rsums[g] ** 2 / len(vs) for g, vs in groups.items()
        ) - 3 * (n + 1)
        assert out["k"] == 3 and out["n"] == n and out["tiesum"] == 0
        assert out["h"] == pytest.approx(h, abs=1e-3)

    def test_tie_correction_applied(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0), ("c", 2.0), ("c", 3.0)],
            ["g", "v"],
        )
        out = kruskal_wallis(df, "v", "g").collect()[0]
        # ties: value 1.0 x3, 2.0 x2 -> (27-3) + (8-2) = 30
        assert out["tiesum"] == 30


class TestChiSquare:
    def test_matches_naive_with_zero_cell(self, spark):
        # 2x3 with one structurally absent cell
        rows = (
            [("m", "l")] * 10 + [("m", "c")] * 20 + [("m", "r")] * 5
            + [("f", "l")] * 8 + [("f", "c")] * 12
        )
        df = spark.createDataFrame(rows, ["sex", "side"])
        out = chi_square_independence(df, "sex", "side").collect()[0]
        n = len(rows)
        from collections import Counter

        obs = Counter(rows)
        rt = Counter(r for r, _ in rows)
        ct = Counter(c for _, c in rows)
        chi2 = sum(
            (obs.get((a, b), 0) - rt[a] * ct[b] / n) ** 2 / (rt[a] * ct[b] / n)
            for a in rt
            for b in ct
        )
        assert out["n"] == n and out["dof"] == 2
        assert out["chi2"] == pytest.approx(chi2, abs=1e-3)


class TestOddsRatio:
    def test_matches_naive(self, spark):
        rows = (
            [(True, True)] * 30 + [(True, False)] * 70
            + [(False, True)] * 10 + [(False, False)] * 90
        )
        df = spark.createDataFrame(rows, ["e", "o"])
        out = odds_ratio_2x2(df, F.col("e"), F.col("o")).collect()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (30, 70, 10, 90)
        orr = 30 * 90 / (70 * 10)
        assert out["odds_ratio"] == pytest.approx(orr, abs=1e-3)
        assert out["rel_risk"] == pytest.approx((30 / 100) / (10 / 100), abs=1e-3)
        se = math.sqrt(1 / 30 + 1 / 70 + 1 / 10 + 1 / 90)
        assert out["ci_lo"] == pytest.approx(math.exp(math.log(orr) - 1.96 * se), abs=1e-3)
        assert out["ci_hi"] == pytest.approx(math.exp(math.log(orr) + 1.96 * se), abs=1e-3)


def _km_naive(durations):
    """(t, n_risk, d, c, surv) rows from (t, ev) pairs."""
    times = sorted({t for t, _ in durations})
    n = len(durations)
    out = []
    surv = 1.0
    removed = 0
    for t in times:
        d = sum(1 for tt, ev in durations if tt == t and ev == 1)
        c = sum(1 for tt, ev in durations if tt == t and ev == 0)
        n_risk = n - removed
        if d > 0:
            surv *= (n_risk - d) / n_risk
        out.append((t, n_risk, d, c, surv))
        removed += d + c
    return out


class TestSurvival:
    DUR = [
        (1, 1), (1, 1), (2, 0), (3, 1), (3, 1), (3, 0), (5, 1), (8, 0), (8, 1),
        (10, 0),
    ]

    def test_km_matches_naive(self, spark):
        df = spark.createDataFrame(self.DUR, ["t", "ev"])
        got = {r["t"]: r for r in kaplan_meier(df).collect()}
        for t, n_risk, d, c, surv in _km_naive(self.DUR):
            row = got[t]
            assert (row["n_risk"], row["d"], row["c"]) == (n_risk, d, c)
            assert row["surv"] == pytest.approx(surv, abs=1e-3)

    def test_km_hits_zero_when_all_fail(self, spark):
        df = spark.createDataFrame([(1, 1), (2, 1), (3, 1)], ["t", "ev"])
        rows = {r["t"]: r["surv"] for r in kaplan_meier(df).collect()}
        assert rows[3] == 0.0

    def test_logrank_identical_groups_near_zero(self, spark):
        # same durations in both groups -> no separation, chi2 ~ 0
        rows = [(t, ev, g) for g in (0, 1) for t, ev in self.DUR]
        df = spark.createDataFrame(rows, ["t", "ev", "grp"])
        out = logrank_2group(df).collect()[0]
        assert out["n1"] == 10 and out["n0"] == 10
        assert out["chi2"] == pytest.approx(0.0, abs=1e-6)
        assert out["e1"] == pytest.approx(out["o1"], abs=1e-3)

    def test_logrank_separated_groups(self, spark):
        # group 1 fails much earlier -> large chi2
        rows = [(t, 1, 1) for t in (1, 1, 2, 2, 3)] + [
            (t, 1, 0) for t in (8, 9, 10, 11, 12)
        ]
        df = spark.createDataFrame(rows, ["t", "ev", "grp"])
        out = logrank_2group(df).collect()[0]
        assert out["chi2"] > 5.0

    def test_time_to_event_extraction(self, spark):
        import datetime as dt

        def ts(day, h=0):
            return dt.datetime(2024, 1, day, h)

        rows = [
            # user 1: signup d1, purchase d4 -> t=3 ev=1
            (1, ts(1), "signup"), (1, ts(4), "purchase"),
            # user 2: purchase BEFORE signup doesn't count; censored at last
            (2, ts(2), "purchase"), (2, ts(3), "signup"), (2, ts(9), "view"),
            # user 3: no signup -> excluded
            (3, ts(1), "view"), (3, ts(2), "purchase"),
            # user 4: error then purchase -> grp 1
            (4, ts(1), "signup"), (4, ts(2), "error"), (4, ts(6), "purchase"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {r["user_id"]: r for r in time_to_event_days(df).collect()}
        assert set(got) == {1, 2, 4}
        assert (got[1]["t"], got[1]["ev"], got[1]["grp"]) == (3, 1, 0)
        assert (got[2]["t"], got[2]["ev"]) == (6, 0)  # censored at d9
        assert (got[4]["t"], got[4]["ev"], got[4]["grp"]) == (5, 1, 1)


class TestTextClean:
    def test_line_filter_rules_and_order(self, spark):
        text = "\n".join(
            [
                "alpha beta gamma delta epsilon",       # keep
                "too short line",                        # drop: < 5 words
                "please enable JavaScript to continue",  # drop: banned (ci)
                "second good line with many words here", # keep
                "lorem ipsum dolor sit amet",            # drop: banned
                "menu { nav }",                          # drop: banned + short
            ]
        )
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = c4_line_filter(df).collect()[0]
        assert out["n_lines"] == 6 and out["n_kept"] == 2
        assert out["clean_text"] == (
            "alpha beta gamma delta epsilon\n"
            "second good line with many words here"
        )

    def test_paragraph_dedup_first_occurrence(self, spark):
        df = spark.createDataFrame(
            [
                (1, "unique one\nshared para\nunique two"),
                (2, "shared para\nunique three"),
                (3, "unique four\nshared para"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
        assert out[1]["n_kept"] == 3  # first occurrence keeps it
        assert out[2]["n_kept"] == 1
        assert out[2]["clean_text"] == "unique three"
        assert out[3]["clean_text"] == "unique four"

    def test_paragraph_dedup_within_doc(self, spark):
        df = spark.createDataFrame([(1, "a b c\na b c\nd e f")], ["doc_id", "text"])
        out = paragraph_dedup(df).collect()[0]
        assert out["n_paras"] == 3 and out["n_kept"] == 2
        assert out["clean_text"] == "a b c\nd e f"


class TestCMH:
    def test_matches_naive(self, spark):
        # two strata with different exposure-outcome structure
        strata = {
            1: (12, 18, 7, 23),  # (a, b, c, d)
            2: (30, 10, 20, 40),
        }
        rows = []
        for st, (a, b, c, d) in strata.items():
            rows += [(st, True, True)] * a + [(st, True, False)] * b
            rows += [(st, False, True)] * c + [(st, False, False)] * d
        df = spark.createDataFrame(rows, ["st", "e", "o"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            cmh_stratified,
        )

        out = cmh_stratified(df, F.col("e"), F.col("o"), F.col("st")).collect()[0]
        num = sum(a * d / (a + b + c + d) for a, b, c, d in strata.values())
        den = sum(b * c / (a + b + c + d) for a, b, c, d in strata.values())
        assert out["n_strata"] == 2
        assert out["or_mh"] == pytest.approx(num / den, abs=1e-3)
        sa = sum(a for a, *_ in strata.values())
        se_ = sum(
            (a + b) * (a + c) / (a + b + c + d) for a, b, c, d in strata.values()
        )
        sv = sum(
            (a + b) * (c + d) * (a + c) * (b + d)
            / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
            for a, b, c, d in strata.values()
        )
        assert out["chi2"] == pytest.approx((sa - se_) ** 2 / sv, abs=1e-3)


class TestCochranArmitage:
    def test_matches_naive(self, spark):
        # monotone trend: positives rise with score
        levels = {1: (100, 10), 2: (100, 20), 3: (100, 35)}  # s: (n_i, r_i)
        rows = []
        for s, (n_i, r_i) in levels.items():
            rows += [(s, True)] * r_i + [(s, False)] * (n_i - r_i)
        df = spark.createDataFrame(rows, ["s", "x"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            cochran_armitage_trend,
        )

        out = cochran_armitage_trend(df, F.col("s"), F.col("x")).collect()[0]
        n = sum(ni for ni, _ in levels.values())
        r = sum(ri for _, ri in levels.values())
        sr = sum(s * ri for s, (_, ri) in levels.items())
        sn = sum(s * ni for s, (ni, _) in levels.items())
        snn = sum(s * s * ni for s, (ni, _) in levels.items())
        t = sr - r * sn / n
        var = (r / n) * (1 - r / n) * (snn - sn * sn / n)
        assert (out["n"], out["r"], out["levels"]) == (n, r, 3)
        assert out["z"] == pytest.approx(t / math.sqrt(var), abs=1e-3)
        assert out["z"] > 2  # the planted trend is strongly positive


class TestSpearman:
    def test_perfect_monotone(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(1, 20)], ["x", "y"]
        )
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            spearman_corr,
        )

        out = spearman_corr(df, "x", "y").collect()[0]
        assert out["rho"] == pytest.approx(1.0, abs=1e-9)

    def test_matches_naive_with_ties(self, spark):
        xs = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 5.0, 6.0]
        ys = [2.0, 1.0, 3.0, 5.0, 4.0, 7.0, 6.0, 6.0]
        df = spark.createDataFrame(list(zip(xs, ys)), ["x", "y"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            spearman_corr,
        )

        out = spearman_corr(df, "x", "y").collect()[0]
        rx, ry = _avg_ranks(xs), _avg_ranks(ys)
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        assert out["rho"] == pytest.approx(num / den, abs=1e-3)


class TestAnova:
    def test_matches_naive(self, spark):
        groups = {"a": [10, 12, 9, 11], "b": [20, 22, 19], "c": [15, 14, 16, 15, 15]}
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, ["g", "c"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            anova_oneway,
        )

        out = anova_oneway(df, "c", "g").collect()[0]
        allv = [v for vs in groups.values() for v in vs]
        n, k = len(allv), len(groups)
        gm = sum(allv) / n
        ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
        ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert (out["k"], out["n"]) == (k, n)
        assert out["f"] == pytest.approx(f, abs=1e-3)


class TestKS:
    def test_matches_naive(self, spark):
        a = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        b = [3.5, 4.5, 5.5, 6.5, 7.5]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, ["g", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            ks_two_sample,
        )

        out = ks_two_sample(df, "v", "g", "a").collect()[0]
        allv = sorted(set(a + b))
        d = max(
            abs(
                sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b)
            )
            for v in allv
        )
        assert (out["n1"], out["n2"]) == (6, 5)
        assert out["d"] == pytest.approx(d, abs=1e-3)
        assert out["d_num"] == round(d * 6 * 5)

    def test_identical_distributions_zero(self, spark):
        rows = [("a", float(i)) for i in range(10)] + [
            ("b", float(i)) for i in range(10)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            ks_two_sample,
        )

        assert ks_two_sample(df, "v", "g", "a").collect()[0]["d_num"] == 0


class TestGini:
    def test_equal_values_zero(self, spark):
        df = spark.createDataFrame([(100,)] * 8, ["v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            gini_coefficient,
        )

        assert gini_coefficient(df, "v").collect()[0]["gini"] == pytest.approx(
            0.0, abs=1e-9
        )

    def test_matches_naive(self, spark):
        vals = [1, 2, 3, 10, 50, 100, 200, 500]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            gini_coefficient,
        )

        out = gini_coefficient(df, "v").collect()[0]
        n = len(vals)
        sv = sorted(vals)
        g = 2 * sum((i + 1) * x for i, x in enumerate(sv)) / (n * sum(sv)) - (
            n + 1
        ) / n
        assert out["gini"] == pytest.approx(g, abs=1e-3)


class TestPsiBenford:
    def test_psi_zero_for_same_distribution(self, spark):
        rows = [(float(i % 20), True) for i in range(200)] + [
            (float(i % 20), False) for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["v", "r"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            psi_drift,
        )

        out = psi_drift(df, "v", "r").collect()[0]
        assert out["psi"] == pytest.approx(0.0, abs=1e-6)
        assert out["n_ref"] == 200 and out["n_cur"] == 200

    def test_psi_positive_on_shift(self, spark):
        rows = [(float(i % 20), True) for i in range(200)] + [
            (float(i % 20) + 10.0, False) for i in range(200)
        ]
        df = spark.createDataFrame(rows, ["v", "r"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            psi_drift,
        )

        assert psi_drift(df, "v", "r").collect()[0]["psi"] > 0.5

    def test_benford_conforming_sample(self, spark):
        # exact Benford-proportioned counts -> tiny chi2
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            BENFORD_PU,
            benford_chi2,
        )

        rows = []
        for d, pu in BENFORD_PU.items():
            rows += [(float(d * 1000),)] * round(pu / 1000)
        df = spark.createDataFrame(rows, ["v"])
        out = benford_chi2(df, "v").collect()[0]
        assert out["chi2"] < 1.0

    def test_benford_uniform_sample_large_chi2(self, spark):
        rows = [(float(d * 1000),) for d in range(1, 10) for _ in range(100)]
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            benford_chi2,
        )

        df = spark.createDataFrame(rows, ["v"])
        assert benford_chi2(df, "v").collect()[0]["chi2"] > 50.0


class TestAcfCusum:
    def _orders(self, spark, series, start="2024-01-01"):
        import datetime as dt

        d0 = dt.date.fromisoformat(start)
        rows = [
            (d0 + dt.timedelta(days=i), float(x)) for i, x in enumerate(series)
        ]
        return spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])

    def test_acf_matches_naive(self, spark):
        series = [10, 12, 9, 14, 11, 13, 10, 15, 12, 16, 11, 14]
        df = self._orders(spark, series)
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            acf_daily_revenue,
        )

        out = {r["k"]: r for r in acf_daily_revenue(df, max_lag=3).collect()}
        n = len(series)
        m = sum(series) / n
        den = sum((x - m) ** 2 for x in series)
        for k in (1, 2, 3):
            num = sum(
                (series[t] - m) * (series[t + k] - m) for t in range(n - k)
            )
            assert out[k]["npairs"] == n - k
            assert out[k]["r"] == pytest.approx(num / den, abs=1e-3)

    def test_acf_weekly_cycle_peaks_at_7(self, spark):
        series = [100 if i % 7 == 0 else 10 for i in range(56)]
        df = self._orders(spark, series)
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            acf_daily_revenue,
        )

        out = {r["k"]: r["r"] for r in acf_daily_revenue(df).collect()}
        assert out[7] > 0.8 and out[7] > out[1]

    def test_cusum_finds_level_shift(self, spark):
        series = [10.0] * 15 + [50.0] * 15
        df = self._orders(spark, series)
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            cusum_changepoint,
        )

        out = cusum_changepoint(df).collect()[0]
        # |S_t| peaks exactly at the last pre-shift day (index 14)
        assert out["day_at_max"] == "2024-01-15"
        assert out["n_days"] == 30
        assert out["cusum_stat"] > 0.1


class TestRegress:
    def test_correlation_matrix_matches_numpy(self, spark):
        import numpy as np

        rng = [(i, (i * 7) % 13, (i * i) % 17) for i in range(1, 40)]
        df = spark.createDataFrame(rng, ["a", "b", "c"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            correlation_matrix,
        )

        out = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in correlation_matrix(df, ["a", "b", "c"]).collect()
        }
        arr = np.array(rng, dtype=float)
        for i, a in enumerate(["a", "b", "c"]):
            for j, b in enumerate(["a", "b", "c"]):
                if i < j:
                    expect = np.corrcoef(arr[:, i], arr[:, j])[0, 1]
                    assert out[(a, b)] == pytest.approx(expect, abs=1e-3)

    def test_ols_two_factor_matches_numpy(self, spark):
        import numpy as np

        rows = []
        for i in range(60):
            x1 = i % 10
            x2 = (i * 3) % 7
            noise = ((i * 37) % 11) - 5  # deterministic pseudo-noise
            y = 100 + 5 * x1 - 3 * x2 + noise
            rows.append((y, x1, x2))
        df = spark.createDataFrame(rows, ["y", "x1", "x2"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            ols_two_factor,
        )

        out = ols_two_factor(df, "y", "x1", "x2").collect()[0]
        arr = np.array(rows, dtype=float)
        X = np.column_stack([np.ones(len(rows)), arr[:, 1], arr[:, 2]])
        beta, *_ = np.linalg.lstsq(X, arr[:, 0], rcond=None)
        assert out["b0"] == pytest.approx(beta[0], abs=1e-3)
        assert out["b1"] == pytest.approx(beta[1], abs=1e-3)
        assert out["b2"] == pytest.approx(beta[2], abs=1e-3)
        pred = X @ beta
        sse = float(((arr[:, 0] - pred) ** 2).sum())
        sst = float(((arr[:, 0] - arr[:, 0].mean()) ** 2).sum())
        assert out["r2"] == pytest.approx(1 - sse / sst, abs=1e-3)


class TestEwma:
    def test_matches_naive_recursion(self, spark):
        import datetime as dt

        series = [100.0, 200.0, 50.0, 300.0, 120.0, 80.0, 250.0]
        d0 = dt.date(2024, 3, 1)
        rows = [
            (d0 + dt.timedelta(days=i), x) for i, x in enumerate(series)
        ]
        df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            ewma_daily_revenue,
        )

        out = {r["day"]: r for r in ewma_daily_revenue(df, alpha_tenths=2).collect()}

        def rr(x):  # half-away-from-zero, matching SQL round (not Python's)
            return math.floor(x + 0.5)

        e = rr(series[0] * 100)
        for i, x in enumerate(series):
            cents = rr(x * 100)
            if i > 0:
                e = rr(0.2 * cents + 0.8 * e)
            day = (d0 + dt.timedelta(days=i)).isoformat()
            assert out[day]["daily_cents"] == cents
            assert out[day]["ewma_cents"] == e

    def test_single_day(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.date(2024, 3, 1), 55.0)], ["o_orderdate", "o_totalprice"]
        )
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            ewma_daily_revenue,
        )

        out = ewma_daily_revenue(df).collect()
        assert len(out) == 1 and out[0]["ewma_cents"] == 5500


class TestBootstrap:
    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        rows = [(i, 10.0 + (i % 7)) for i in range(300)]
        df = spark.createDataFrame(rows, ["id", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            poisson_bootstrap_ci,
        )

        out1 = poisson_bootstrap_ci(df, "v", "id", n_boot=40).collect()[0]
        out2 = poisson_bootstrap_ci(df, "v", "id", n_boot=40).collect()[0]
        assert out1 == out2  # fully deterministic
        true_mean_u = round(sum(v for _, v in rows) / len(rows) * 1e6)
        assert abs(out1["mean_u"] - true_mean_u) <= 1
        assert out1["ci_lo_u"] <= out1["mean_u"] <= out1["ci_hi_u"]
        # CI is tight around the mean for this low-variance sample
        assert (out1["ci_hi_u"] - out1["ci_lo_u"]) / 1e6 < 1.0

    def test_seed_changes_draws(self, spark):
        rows = [(i, float(i % 50)) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            poisson_bootstrap_ci,
        )

        a = poisson_bootstrap_ci(df, "v", "id", n_boot=30, seed="s1").collect()[0]
        b = poisson_bootstrap_ci(df, "v", "id", n_boot=30, seed="s2").collect()[0]
        assert (a["ci_lo_u"], a["ci_hi_u"]) != (b["ci_lo_u"], b["ci_hi_u"])


class TestHolt:
    def test_matches_naive_recursion(self, spark):
        import datetime as dt

        series = [100.0, 110.0, 125.0, 135.0, 150.0, 160.0]
        d0 = dt.date(2024, 5, 1)
        rows = [(d0 + dt.timedelta(days=i), x) for i, x in enumerate(series)]
        df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
        from azure_medicine_data_engineering_spark.operators.events_analytics import (
            holt_linear_daily,
        )

        out = holt_linear_daily(df, horizon=7).collect()[0]

        def r(x):  # half-away-from-zero, matching SQL round (not Python's)
            return math.floor(x + 0.5)

        l = r(series[0] * 100)
        b = 0
        for x in series[1:]:
            cents = r(x * 100)
            l_new = r(0.2 * cents + 0.8 * (l + b))
            b = r(0.1 * (l_new - l) + 0.9 * b)
            l = l_new
        assert out["n_days"] == 6
        assert out["last_day"] == "2024-05-06"
        assert out["level_cents"] == l
        assert out["trend_cents"] == b
        assert out["forecast_cents"] == l + 7 * b
        # planted uptrend -> positive trend, forecast above level
        assert b > 0 and out["forecast_cents"] > out["level_cents"]


class TestPairedProportions:
    def test_mcnemar_matches_naive(self, spark):
        rows = (
            [(True, True)] * 20 + [(True, False)] * 12
            + [(False, True)] * 5 + [(False, False)] * 30
        )
        df = spark.createDataFrame(rows, ["x", "y"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            mcnemar_test,
        )

        out = mcnemar_test(df, F.col("x"), F.col("y")).collect()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (20, 12, 5, 30)
        assert out["chi2"] == pytest.approx((12 - 5) ** 2 / 17, abs=1e-3)

    def test_mcnemar_degenerate_is_null(self, spark):
        df = spark.createDataFrame([(True, True)] * 5, ["x", "y"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            mcnemar_test,
        )

        assert mcnemar_test(df, F.col("x"), F.col("y")).collect()[0]["chi2"] is None

    def test_kappa_matches_naive(self, spark):
        rows = (
            [(True, True)] * 40 + [(True, False)] * 10
            + [(False, True)] * 5 + [(False, False)] * 45
        )
        df = spark.createDataFrame(rows, ["x", "y"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            cohens_kappa,
        )

        out = cohens_kappa(df, F.col("x"), F.col("y")).collect()[0]
        n = 100
        po = (40 + 45) / n
        pe = (50 / n) * (45 / n) + (50 / n) * (55 / n)
        assert out["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-3)

    def test_two_proportion_matches_naive(self, spark):
        rows = (
            [(True, True)] * 30 + [(True, False)] * 70
            + [(False, True)] * 45 + [(False, False)] * 55
        )
        df = spark.createDataFrame(rows, ["g", "s"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            two_proportion_test,
        )

        out = two_proportion_test(df, F.col("g"), F.col("s")).collect()[0]
        assert (out["n1"], out["x1"], out["n2"], out["x2"]) == (100, 30, 100, 45)
        p1, p2, pp = 0.30, 0.45, 0.375
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
        assert out["z"] == pytest.approx(z, abs=1e-3)
        # Wilson bounds bracket the point estimates and are ordered
        assert out["p1_lo"] < p1 < out["p1_hi"]
        assert out["p2_lo"] < p2 < out["p2_hi"]
        zc = 1.96
        lo = (p1 + zc * zc / 200 - zc * math.sqrt(p1 * (1 - p1) / 100 + zc * zc / 40000)) / (1 + zc * zc / 100)
        assert out["p1_lo"] == pytest.approx(lo, abs=1e-3)


class TestDiagnostics:
    def test_grubbs_flags_planted_outlier(self, spark):
        vals = [100, 102, 98, 101, 99, 103, 97, 100, 500]  # 500 planted
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            grubbs_test,
        )

        out = grubbs_test(df, "v").collect()[0]
        assert out["x_at_max"] == 500
        n = len(vals)
        mean = sum(vals) / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
        assert out["g"] == pytest.approx((500 - mean) / sd, abs=1e-3)

    def test_jarque_bera_matches_naive(self, spark):
        vals = [1, 2, 2, 3, 3, 3, 4, 4, 5, 9]  # right-skewed
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            jarque_bera,
        )

        out = jarque_bera(df, "v").collect()[0]
        n = len(vals)
        mean = sum(vals) / n
        m2 = sum((v - mean) ** 2 for v in vals) / n
        m3 = sum((v - mean) ** 3 for v in vals) / n
        m4 = sum((v - mean) ** 4 for v in vals) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        assert out["skew"] == pytest.approx(skew, abs=1e-3)
        assert out["kurt_excess"] == pytest.approx(kurt, abs=1e-3)
        assert out["jb"] == pytest.approx(n / 6 * (skew**2 + kurt**2 / 4), abs=1e-2)
        assert out["skew"] > 0  # planted right skew

    def test_durbin_watson_positive_autocorr_low(self, spark):
        import datetime as dt

        # slow sine wave around a trend -> strongly autocorrelated
        # residuals -> DW well below 2
        d0 = dt.date(2024, 1, 1)
        rows = [
            (d0 + dt.timedelta(days=i), 1000.0 + 300 * math.sin(i / 8.0))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            durbin_watson_daily,
        )

        out = durbin_watson_daily(df).collect()[0]
        assert out["n_days"] == 60
        assert out["dw"] < 1.0

    def test_durbin_watson_alternating_high(self, spark):
        import datetime as dt

        d0 = dt.date(2024, 1, 1)
        rows = [
            (d0 + dt.timedelta(days=i), 1000.0 + (100 if i % 2 == 0 else -100))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            durbin_watson_daily,
        )

        out = durbin_watson_daily(df).collect()[0]
        assert out["dw"] > 3.0  # alternating residuals -> DW near 4


class TestMannKendallPartial:
    def test_mk_matches_naive(self, spark):
        import datetime as dt

        series = [10.0, 14.0, 12.0, 18.0, 16.0, 22.0, 20.0, 25.0]
        d0 = dt.date(2024, 2, 1)
        rows = [(d0 + dt.timedelta(days=i), x) for i, x in enumerate(series)]
        df = spark.createDataFrame(rows, ["o_orderdate", "o_totalprice"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            mann_kendall_daily,
        )

        out = mann_kendall_daily(df).collect()[0]
        cents = [round(x * 100) for x in series]
        n = len(cents)
        s = sum(
            (cents[j] > cents[i]) - (cents[j] < cents[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        var = n * (n - 1) * (2 * n + 5) / 18
        z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0
        assert out["n_days"] == n and out["s"] == s
        assert out["z"] == pytest.approx(z, abs=1e-3)
        assert out["z"] > 1.5  # planted uptrend

    def test_partial_corr_removes_common_driver(self, spark):
        import numpy as np

        # x and y both driven by z plus independent deterministic parts
        rows = []
        for i in range(286):  # 2 x 143: full joint period of the residuals
            z = i % 20
            x = 3 * z + (i * 37) % 11  # residual period 11
            y = 2 * z + (i * 53) % 13  # residual period 13 (coprime)
            rows.append((x, y, z))
        df = spark.createDataFrame(rows, ["x", "y", "z"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            PARTIAL_CORR_EXPR,
            correlation_matrix,
        )

        cm = correlation_matrix(df, ["x", "y", "z"])
        got = {(r["col_a"], r["col_b"]): r["corr"] for r in cm.collect()}
        rxy, rxz, ryz = got[("x", "y")], got[("x", "z")], got[("y", "z")]
        partial = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
        arr = np.array(rows, dtype=float)
        raw = np.corrcoef(arr[:, 0], arr[:, 1])[0, 1]
        # marginal correlation is strong; the z-adjusted one collapses
        assert raw > 0.9
        assert abs(partial) < 0.3


class TestCronbach:
    def test_matches_naive(self, spark):
        import numpy as np

        rng = []
        for i in range(100):
            base = i % 10
            rng.append((base + (i * 3) % 4, base + (i * 7) % 4, base + (i * 11) % 4))
        df = spark.createDataFrame(rng, ["i1", "i2", "i3"])
        from azure_medicine_data_engineering_spark.functions.regress import (
            cronbach_alpha,
        )

        out = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
        arr = np.array(rng, dtype=float)
        k = 3
        item_vars = arr.var(axis=0)  # population variances
        total_var = arr.sum(axis=1).var()
        alpha = k / (k - 1) * (1 - item_vars.sum() / total_var)
        assert out["k"] == 3 and out["n"] == 100
        assert out["alpha"] == pytest.approx(alpha, abs=1e-3)
        assert out["alpha"] > 0.5  # shared base -> consistent battery


class TestLevene:
    def test_matches_naive(self, spark):
        groups = {
            "a": [10, 12, 9, 11, 10, 12],        # tight
            "b": [20, 30, 10, 40, 5, 35],        # wide
            "c": [15, 16, 14, 15, 16, 14],       # tight
        }
        rows = [(g, v) for g, vs in groups.items() for v in vs]
        df = spark.createDataFrame(rows, ["g", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            levene_test,
        )

        out = levene_test(df, "v", "g").collect()[0]
        # naive Levene (mean-centred): one-way ANOVA F over z = |x - mean_g|
        z = {
            g: [abs(v - sum(vs) / len(vs)) for v in vs]
            for g, vs in groups.items()
        }
        allz = [x for vs in z.values() for x in vs]
        n, k = len(allz), len(groups)
        gm = sum(allz) / n
        ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in z.values())
        ssw = sum((x - sum(vs) / len(vs)) ** 2 for vs in z.values() for x in vs)
        w = (ssb / (k - 1)) / (ssw / (n - k))
        assert (out["k"], out["n"]) == (k, n)
        assert out["f"] == pytest.approx(w, rel=2e-3)
        assert out["f"] > 3  # planted variance heterogeneity


class TestWilcoxonSignedRank:
    def test_matches_naive(self, spark):
        diffs = [5, -3, 8, -2, 7, 10, -1, 4, 0, 6]  # one zero drops
        df = spark.createDataFrame([(d,) for d in diffs], ["d"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            wilcoxon_signed_rank,
        )

        out = wilcoxon_signed_rank(df, "d").collect()[0]
        nz = [d for d in diffs if d != 0]
        ranks = _avg_ranks([abs(d) for d in nz])
        w_plus = sum(r for d, r in zip(nz, ranks) if d > 0)
        n = len(nz)
        from collections import Counter

        ties = sum(t**3 - t for t in Counter(abs(d) for d in nz).values())
        var = n * (n + 1) * (2 * n + 1) / 24 - ties / 48
        z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
        assert out["n"] == n
        assert out["w_plus"] == pytest.approx(w_plus, abs=1e-9)
        assert out["z"] == pytest.approx(z, abs=1e-3)
        assert out["z"] > 1  # mostly positive differences

    def test_symmetric_differences_near_zero(self, spark):
        diffs = [3, -3, 5, -5, 7, -7, 9, -9]
        df = spark.createDataFrame([(d,) for d in diffs], ["d"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            wilcoxon_signed_rank,
        )

        out = wilcoxon_signed_rank(df, "d").collect()[0]
        assert out["w_plus"] == pytest.approx(
            len(diffs) * (len(diffs) + 1) / 4, abs=1e-9
        )
        assert abs(out["z"]) < 0.1


class TestFriedman:
    def test_matches_naive(self, spark):
        # 6 blocks x 3 treatments with a planted treatment effect
        data = {
            1: {"a": 10, "b": 20, "c": 30},
            2: {"a": 12, "b": 25, "c": 28},
            3: {"a": 9, "b": 18, "c": 27},
            4: {"a": 15, "b": 14, "c": 35},
            5: {"a": 8, "b": 22, "c": 24},
            6: {"a": 11, "b": 19, "c": 33},
        }
        rows = [(b, t, v) for b, tv in data.items() for t, v in tv.items()]
        df = spark.createDataFrame(rows, ["b", "t", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            friedman_test,
        )

        out = friedman_test(df, "b", "t", "v").collect()[0]
        n, k = 6, 3
        ranks = {
            b: {
                t: sorted(tv.values()).index(v) + 1
                for t, v in tv.items()
            }
            for b, tv in data.items()
        }
        rj = {t: sum(ranks[b][t] for b in data) for t in ("a", "b", "c")}
        a4 = sum(r**2 for b in data for r in ranks[b].values())
        chi2 = (
            (k - 1)
            * sum((rj[t] - n * (k + 1) / 2) ** 2 for t in rj)
            / (a4 - n * k * (k + 1) ** 2 / 4)
        )
        assert (out["n_blocks"], out["k"]) == (n, k)
        assert out["chi2"] == pytest.approx(chi2, abs=1e-3)
        assert out["chi2"] > 6  # planted effect

    def test_incomplete_blocks_dropped(self, spark):
        rows = [
            (1, "a", 1), (1, "b", 2), (2, "a", 3), (2, "b", 1),
            (3, "a", 5),  # block 3 missing treatment b -> dropped
        ]
        df = spark.createDataFrame(rows, ["b", "t", "v"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            friedman_test,
        )

        out = friedman_test(df, "b", "t", "v").collect()[0]
        assert out["n_blocks"] == 2 and out["k"] == 2


class TestCochranQ:
    def test_matches_naive(self, spark):
        # 8 blocks x 3 treatments, planted treatment effect
        outcomes = {
            1: (1, 1, 0), 2: (1, 0, 0), 3: (1, 1, 1), 4: (1, 0, 0),
            5: (1, 1, 0), 6: (0, 1, 0), 7: (1, 0, 0), 8: (1, 1, 0),
        }
        rows = [
            (b, t, bool(x))
            for b, xs in outcomes.items()
            for t, x in zip(("t1", "t2", "t3"), xs)
        ]
        df = spark.createDataFrame(rows, ["b", "t", "x"])
        from azure_medicine_data_engineering_spark.functions.rankstats import (
            cochran_q,
        )

        out = cochran_q(df, "b", "t", "x").collect()[0]
        k, n = 3, 8
        cj = [sum(xs[j] for xs in outcomes.values()) for j in range(k)]
        ri = [sum(xs) for xs in outcomes.values()]
        tot = sum(cj)
        q = (k - 1) * (k * sum(c * c for c in cj) - tot * tot) / (
            k * tot - sum(r * r for r in ri)
        )
        assert (out["n_blocks"], out["k"]) == (n, k)
        assert out["q"] == pytest.approx(q, abs=1e-3)
        assert out["q"] > 5  # planted effect (t1 almost always succeeds)


# ---------------------------------------------------------------------------
# Cramér–von Mises two-sample (round 5).
# ---------------------------------------------------------------------------


def _naive_cvm(xs, ys):
    import math

    n1, n2 = len(xs), len(ys)
    pooled = sorted(xs + ys)
    u = 0
    for v in pooled:  # per pooled point, inclusive ECDF counts
        c1 = sum(1 for x in xs if x <= v)
        c2 = sum(1 for y in ys if y <= v)
        u += (c1 * n2 - c2 * n1) ** 2
    t = u / ((n1 * n2) * (n1 + n2) ** 2)
    return math.floor(t * 1e4 + 0.5) / 1e4  # half-away display round


def test_cvm_two_sample_matches_naive(spark):
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cvm_two_sample,
    )

    xs = [1.0, 2.0, 2.0, 3.5, 7.0, 9.0, 4.5]
    ys = [2.0, 4.0, 4.0, 5.5, 6.0, 8.0, 8.0, 10.0]
    rows = [(float(v), "a") for v in xs] + [(float(v), "b") for v in ys]
    df = spark.createDataFrame(rows, "value double, grp string")
    got = cvm_two_sample(df, "value", "grp", "a").collect()[0]
    assert (got["n1"], got["n2"]) == (len(xs), len(ys))
    assert got["t"] == _naive_cvm(xs, ys)


def test_cvm_identical_samples_small_t(spark):
    """Identical samples: every cum1*n2 == cum2*n1 -> T == 0 exactly."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cvm_two_sample,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [(v, "a") for v in vals] + [(v, "b") for v in vals]
    df = spark.createDataFrame(rows, "value double, grp string")
    assert cvm_two_sample(df, "value", "grp", "a").collect()[0]["t"] == 0.0


def test_cvm_disjoint_samples_large_t(spark):
    """Fully separated samples maximize the integrated CDF gap; T must
    exceed the 1% critical value (~0.743) and dominate the identical
    case."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cvm_two_sample,
    )

    rows = [(float(v), "a") for v in range(10)] + [
        (float(v), "b") for v in range(100, 110)
    ]
    df = spark.createDataFrame(rows, "value double, grp string")
    assert cvm_two_sample(df, "value", "grp", "a").collect()[0]["t"] > 0.743


def test_exact_auc_matches_naive_pairs(spark):
    """AUC must equal the naive pair statistic
    (wins + 0.5*ties) / (n1*n2), including tied scores."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        exact_auc,
    )

    pos = [3.0, 5.0, 5.0, 9.0]
    neg = [1.0, 5.0, 4.0, 8.0, 2.0]
    import math

    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    naive = math.floor((wins + 0.5 * ties) / (len(pos) * len(neg)) * 1e4 + 0.5) / 1e4
    rows = [(v, True) for v in pos] + [(v, False) for v in neg]
    df = spark.createDataFrame(rows, "score double, y boolean")
    got = exact_auc(df, "score", F.col("y")).collect()[0]
    assert (got["n1"], got["n2"]) == (len(pos), len(neg))
    assert got["auc"] == naive


def test_exact_auc_perfect_and_random(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        exact_auc,
    )

    rows = [(float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    assert exact_auc(df, "score", F.col("y")).collect()[0]["auc"] == 1.0
    # constant score: every pair ties -> AUC exactly 0.5
    rows2 = [(1.0, i % 2 == 0) for i in range(50)]
    df2 = spark.createDataFrame(rows2, "score double, y boolean")
    assert exact_auc(df2, "score", F.col("y")).collect()[0]["auc"] == 0.5


def test_js_divergence_naive_and_bounds(spark):
    import math

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        js_divergence,
    )

    # planted categorical mixes incl. a zero cell on each side
    ref = {"a": 30, "b": 10, "c": 0, "d": 5}
    cur = {"a": 10, "b": 30, "c": 5, "d": 0}
    rows = [(k, True) for k, n in ref.items() for _ in range(n)] + [
        (k, False) for k, n in cur.items() for _ in range(n)
    ]
    df = spark.createDataFrame(rows, "cat string, r boolean")
    got = js_divergence(df, "cat", "r").collect()[0]
    na, nb = sum(ref.values()), sum(cur.values())

    def term(a, b):
        p, q = a / na, b / nb
        m = 0.5 * p + 0.5 * q
        u = (0.5 * p * math.log(p / m) if a > 0 else 0.0) + (
            0.5 * q * math.log(q / m) if b > 0 else 0.0
        )
        return int(math.floor(u * 1e6 + 0.5))

    naive_u = sum(term(ref[k], cur[k]) for k in ref)
    assert got["n_cats"] == 4 and (got["n_ref"], got["n_cur"]) == (na, nb)
    assert got["js"] == round(naive_u / 1e6, 4)
    assert 0.0 <= got["js"] <= math.log(2) + 1e-9

    # identical mixes -> exactly 0
    rows2 = [(k, True) for k in "aabb"] + [(k, False) for k in "aabb"]
    df2 = spark.createDataFrame(rows2, "cat string, r boolean")
    assert js_divergence(df2, "cat", "r").collect()[0]["js"] == 0.0


def test_mann_whitney_by_group_matches_global_per_stratum(spark):
    """Each stratum's (n1, n2, u1, z) must equal the GLOBAL test run on
    that stratum's rows alone — the defining property of stratification."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mann_whitney_by_group,
        mann_whitney_u,
    )

    rows = []
    import random

    rng = random.Random(7)
    for g in ["x", "y", "z"]:
        shift = {"x": 0.0, "y": 5.0, "z": -2.0}[g]
        for i in range(40):
            cls = "a" if i % 2 == 0 else "b"
            v = float(rng.randint(0, 20)) + (shift if cls == "a" else 0.0)
            rows.append((g, v, cls))
    df = spark.createDataFrame(rows, "g string, value double, cls string")
    grouped = {
        r["g"]: (r["n1"], r["n2"], r["u1"], r["z"])
        for r in mann_whitney_by_group(df, "g", "value", "cls", "a").collect()
    }
    assert set(grouped) == {"x", "y", "z"}
    for g in ["x", "y", "z"]:
        solo = mann_whitney_u(
            df.where(F.col("g") == g), "value", "cls", "a"
        ).collect()[0]
        assert grouped[g] == (solo["n1"], solo["n2"], solo["u1"], solo["z"])


def test_ks_by_group_matches_global_per_stratum(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ks_by_group,
        ks_two_sample,
    )

    import random

    rng = random.Random(11)
    rows = []
    for g in ["p", "q"]:
        for i in range(60):
            grp1 = i % 2 == 0
            v = float(rng.randint(0, 15)) + (3.0 if (grp1 and g == "q") else 0.0)
            rows.append((g, v, grp1))
    df = spark.createDataFrame(rows, "g string, value double, f boolean")
    per = {
        r["g"]: (r["n1"], r["n2"], r["d_num"], r["v_at_d"], r["d"])
        for r in ks_by_group(df, "g", "value", "f").collect()
    }
    for g in ["p", "q"]:
        sub = df.where(F.col("g") == g).select(
            "value", F.when(F.col("f"), "a").otherwise("b").alias("cls")
        )
        solo = ks_two_sample(sub, "value", "cls", "a").collect()[0]
        assert per[g] == (
            solo["n1"], solo["n2"], solo["d_num"], solo["v_at_d"], solo["d"]
        )
    # the shifted stratum must show the larger D
    assert per["q"][4] > per["p"][4]


def test_ols_by_group_matches_numpy(spark):
    import numpy as np

    from azure_medicine_data_engineering_spark.functions.regress import (
        ols_by_group,
    )

    import math
    import random

    rng = random.Random(3)
    rows = []
    truth = {}
    for g, (m, b) in {"a": (3, 100), "b": (-2, 50)}.items():
        xs, ys = [], []
        for _ in range(200):
            x = rng.randint(0, 100)
            y = m * x + b + rng.randint(-5, 5)
            rows.append((g, x, y))
            xs.append(x)
            ys.append(y)
        truth[g] = (np.array(xs, dtype=float), np.array(ys, dtype=float))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in ols_by_group(df, "g", "x", "y").collect()}
    for g, (xs, ys) in truth.items():
        slope, intercept = np.polyfit(xs, ys, 1)
        r = got[g]
        assert abs(r["slope"] - slope) < 1e-3
        assert abs(r["intercept"] - intercept) < 1e-3
        ss_res = ((ys - (slope * xs + intercept)) ** 2).sum()
        ss_tot = ((ys - ys.mean()) ** 2).sum()
        assert abs(r["r2"] - (1 - ss_res / ss_tot)) < 1e-3
        assert math.isfinite(r["r2"]) and 0.9 < r["r2"] <= 1.0


def test_effect_sizes_naive(spark):
    """Naive references for the round-5 effect-size panel."""
    import math

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cohens_d,
        cramers_v,
        rank_biserial,
        exact_auc,
    )

    # Cohen's d on planted integer samples
    g1 = [10, 12, 14, 16, 18, 20]
    g2 = [8, 9, 10, 11, 12, 13]
    rows = [("a", v) for v in g1] + [("b", v) for v in g2]
    df = spark.createDataFrame(rows, "g string, x long")
    m1, m2 = sum(g1) / len(g1), sum(g2) / len(g2)
    ss1 = sum((v - m1) ** 2 for v in g1)
    ss2 = sum((v - m2) ** 2 for v in g2)
    sd = math.sqrt((ss1 + ss2) / (len(g1) + len(g2) - 2))
    naive_d = math.floor((m1 - m2) / sd * 1e4 + 0.5) / 1e4
    got = cohens_d(df, "x", "g", "a").collect()[0]
    assert (got["n1"], got["n2"], got["d"]) == (6, 6, naive_d)

    # rank-biserial == 2*AUC - 1 on the same data
    rb = rank_biserial(df, "x", "g", "a").collect()[0]["r_rb"]
    auc = exact_auc(df, "x", F.col("g") == "a").collect()[0]["auc"]
    assert abs(rb - (2 * auc - 1)) < 2e-4  # both display-rounded

    # Cramér's V: perfect association -> 1, independence -> ~0
    perf = spark.createDataFrame(
        [("x", "p")] * 20 + [("y", "q")] * 20, "a string, b string"
    )
    assert cramers_v(perf, "a", "b").collect()[0]["v"] == 1.0
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(25)],
        "a string, b string",
    )
    assert cramers_v(indep, "a", "b").collect()[0]["v"] == 0.0


def test_nelson_aalen_naive(spark):
    """Hand-computed NA on a small censored cohort; H is the running sum
    of micro-rounded d/n increments and n_risk the suffix removals."""
    import math

    from azure_medicine_data_engineering_spark.operators.survival import (
        nelson_aalen,
    )

    # (t, ev): events at t=2 (2 of them), censor at 3, event at 5
    rows = [(2, 1), (2, 1), (3, 0), (5, 1), (5, 0), (7, 0)]
    df = spark.createDataFrame(rows, "t long, ev long")
    got = {r["t"]: (r["n_risk"], r["d"], r["cumhaz"]) for r in
           nelson_aalen(df).collect()}
    assert got[2][0] == 6 and got[2][1] == 2
    assert got[3] == (4, 0, got[2][2])  # censoring adds no hazard
    h2 = math.floor(2 / 6 * 1e6 + 0.5) / 1e6
    h5 = h2 + math.floor(1 / 3 * 1e6 + 0.5) / 1e6
    assert got[2][2] == h2
    assert got[5] == (3, 1, h5)
    assert got[7] == (1, 0, h5)


def test_spearman_by_group_matches_global_per_stratum(spark):
    import random

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        spearman_by_group,
        spearman_corr,
    )

    rng = random.Random(5)
    rows = []
    for g, slope in [("up", 1), ("down", -1), ("noise", 0)]:
        for i in range(50):
            x = i + rng.randint(0, 3)
            y = slope * i + rng.randint(0, 3) if slope else rng.randint(0, 100)
            rows.append((g, x, y))
    df = spark.createDataFrame(rows, "g string, x long, y long")
    per = {r["g"]: (r["n"], r["rho"]) for r in
           spearman_by_group(df, "g", "x", "y").collect()}
    for g in ["up", "down", "noise"]:
        solo = spearman_corr(df.where(F.col("g") == g), "x", "y").collect()[0]
        assert per[g] == (solo["n"], solo["rho"]), g
    assert per["up"][1] > 0.9 and per["down"][1] < -0.9
    assert abs(per["noise"][1]) < 0.4


def test_diff_in_diff_planted_effect(spark):
    """Planted parallel trends + a 500-cent treatment effect: DiD must
    recover exactly 500 (common shocks cancel), and a no-effect world
    returns 0."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        diff_in_diff,
    )

    rows = []
    for i in range(40):
        base = 1000 + (i % 7) * 10        # unit heterogeneity
        for t in (0, 1):
            for p in (0, 1):
                y = base + 200 * p + 300 * t          # trends + group gap
                if t == 1 and p == 1:
                    y += 500                           # the causal effect
                rows.append((t == 1, p == 1, y))
    df = spark.createDataFrame(rows, "t boolean, p boolean, y long")
    r = diff_in_diff(df, F.col("t"), F.col("p"), F.col("y")).collect()[0]
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (40, 40, 40, 40)
    assert r["did_cents"] == 500.0

    null_rows = [(t == 1, p == 1, 1000 + 200 * p + 300 * t)
                 for i in range(20) for t in (0, 1) for p in (0, 1)]
    df0 = spark.createDataFrame(null_rows, "t boolean, p boolean, y long")
    assert diff_in_diff(df0, F.col("t"), F.col("p"),
                        F.col("y")).collect()[0]["did_cents"] == 0.0


def test_cuped_planted_correlation(spark):
    """y = 2x + bounded noise: theta ~ 2 and the variance reduction is
    rho^2 (near 1); independent x gives reduction ~ 0."""
    import random

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        cuped_adjustment,
    )

    rng = random.Random(13)
    rows = [(x := rng.randint(100, 1000), 2 * x + rng.randint(-20, 20))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = cuped_adjustment(df, F.col("x"), F.col("y")).collect()[0]
    assert abs(r["theta"] - 2.0) < 0.05
    assert r["reduction"] > 0.95
    assert r["var_adj"] < 0.05 * r["var_raw"]

    indep = [(rng.randint(100, 1000), rng.randint(100, 1000)) for _ in range(400)]
    df2 = spark.createDataFrame(indep, "x long, y long")
    r2 = cuped_adjustment(df2, F.col("x"), F.col("y")).collect()[0]
    assert r2["reduction"] < 0.05


def test_srm_and_power_naive(spark):
    import math

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        power_sample_size,
        srm_check,
    )

    even = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    r = srm_check(even, F.col("id") % 2 == 0).collect()[0]
    assert (r["n1"], r["n2"], r["chi2"], r["srm_flag"]) == (500, 500, 0.0, False)

    # 550/450 split: chi2 = 100^2/1000 = 10 -> flagged
    skew = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    r2 = srm_check(skew, F.col("id") < 550).collect()[0]
    assert r2["chi2"] == 10.0 and r2["srm_flag"] is True

    # power: p1 = 0.2, MDE 10% -> p2 = 0.22; closed form check
    pop = spark.createDataFrame([(i, i < 200) for i in range(1000)],
                                "id long, s boolean")
    pr = power_sample_size(pop, F.col("s"), rel_mde_pct=10).collect()[0]
    p1, p2 = 0.2, 0.22
    exp_n = math.ceil((1.96 + 0.8416) ** 2 * (p1 * (1 - p1) + p2 * (1 - p2))
                      / (p2 - p1) ** 2)
    assert (pr["p1"], pr["p2"], pr["n_per_arm"]) == (0.2, 0.22, exp_n)


def test_rmst_hand_computed(spark):
    """Small cohort, hand-integrated KM area at tau=10: S=1 until t=2,
    then steps; censoring keeps S flat."""
    from azure_medicine_data_engineering_spark.operators.survival import rmst

    rows = [(2, 1), (2, 1), (4, 0), (6, 1), (8, 0)]  # 5 subjects
    df = spark.createDataFrame(rows, "t long, ev long")
    r = rmst(df, tau=10).collect()[0]
    # KM: S(2)=3/5=0.6; censor at 4 (S flat 0.6); at 6 risk=2, d=1 ->
    # S=0.6*0.5=0.3; censor at 8.
    # area = 1*2 (t<2) + 0.6*(4-2) + 0.6*(6-4) + 0.3*(8-6) + 0.3*(10-8)
    expected = 2 + 0.6 * 2 + 0.6 * 2 + 0.3 * 2 + 0.3 * 2
    assert r["tau"] == 10
    assert abs(r["rmst_days"] - expected) < 1e-6

    # tau before the first event: RMST == tau (S == 1 throughout)
    r2 = rmst(df, tau=2).collect()[0]
    assert r2["rmst_days"] == 2.0


def test_ccf_planted_lead(spark):
    """Count leads revenue by exactly 2 days (x_t = 100*y_{t-2} + noise):
    the CCF must peak at k = -2 (revenue at t correlates with count at
    t-2)."""
    import datetime
    import random

    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        ccf_revenue_vs_orders,
    )

    rng = random.Random(21)
    base = datetime.date(2023, 1, 1)
    counts = [rng.randint(1, 12) for _ in range(64)]
    rows = []
    for i in range(64):
        n_orders = counts[i]
        lead = counts[i - 2] if i >= 2 else 1
        for j in range(n_orders):
            # total day revenue ~ 100 * count-two-days-ago (split per order)
            rows.append(
                (datetime.datetime.combine(base + datetime.timedelta(days=i),
                                           datetime.time()),
                 100.0 * lead / n_orders + rng.randint(0, 2) / 100.0)
            )
    df = spark.createDataFrame(rows, "o_orderdate timestamp, o_totalprice double")
    got = {r["k"]: r["r"] for r in ccf_revenue_vs_orders(df, max_lag=3).collect()}
    assert set(got) == set(range(-3, 4))
    peak = max(got, key=lambda k: got[k])
    assert peak == -2 and got[-2] > 0.9


def test_covariate_balance_planted(spark):
    import math

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        covariate_balance,
    )

    rows = []
    for i in range(200):
        t = i % 2 == 0
        bal = 50 + ((i // 2) % 10)               # same dist both arms
        imb = 100 + (40 if t else 0) + (i % 5)    # shifted in treatment
        const = 7                                 # zero variance
        rows.append((t, bal, imb, const))
    df = spark.createDataFrame(rows, "t boolean, bal long, imb long, const long")
    got = {r["covariate"]: r for r in
           covariate_balance(df, F.col("t"), ["bal", "imb", "const"]).collect()}
    assert got["bal"]["balanced"] is True and abs(got["bal"]["smd"]) < 0.1
    assert got["imb"]["balanced"] is False and got["imb"]["smd"] > 2
    assert got["const"]["smd"] is None and got["const"]["balanced"] is True
    # naive check for imb
    a = [100 + 40 + (i % 5) for i in range(0, 200, 2)]
    b = [100 + (i % 5) for i in range(1, 200, 2)]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((v - ma) ** 2 for v in a) / len(a)
    vb = sum((v - mb) ** 2 for v in b) / len(b)
    naive = (ma - mb) / math.sqrt((va + vb) / 2)
    assert abs(got["imb"]["smd"] - naive) < 1e-3
