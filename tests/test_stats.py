"""Statistics layer tests (SURVEY §2.11 R1-R6 parity behaviors)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import stats


def test_permutation_test_detects_difference(spark):
    rows = [("h1", float(v), True) for v in range(20)]          # mean 9.5
    rows += [("h1", float(v + 100), False) for v in range(20)]  # mean 109.5
    rows += [("h2", float(v % 5), v % 2 == 0) for v in range(40)]  # no signal
    df = spark.createDataFrame(rows, "hyp string, metric double, grp boolean")
    res = {
        r.hypothesis: r
        for r in stats.permutation_test_grouped(
            df, "hyp", "metric", "grp", n_permutations=500, seed=1
        ).collect()
    }
    assert res["h1"].p_value < 0.01            # huge separation
    assert res["h2"].p_value > 0.05            # null is true
    assert res["h1"].observed_diff == -100.0


def test_permutation_test_degenerate_sentinel(spark):
    df = spark.createDataFrame(
        [("h", 1.0, True), ("h", 2.0, True)], "hyp string, metric double, grp boolean"
    )
    row = stats.permutation_test_grouped(df, "hyp", "metric", "grp").collect()[0]
    assert row.p_value == stats.DEGENERATE_P  # sentinel 2.0 (R.r:400-401)


def test_permutation_test_deterministic(spark):
    df = spark.createDataFrame(
        [("h", float(i), i % 2 == 0) for i in range(30)],
        "hyp string, metric double, grp boolean",
    )
    p1 = stats.permutation_test_grouped(df, "hyp", "metric", "grp", 300, 7).collect()[0].p_value
    p2 = stats.permutation_test_grouped(df.repartition(7), "hyp", "metric", "grp", 300, 7).collect()[0].p_value
    assert p1 == p2  # stable across partitionings (seeded per key)


def test_bh_adjust_textbook():
    # classic example: sorted p-values vs alpha*i/n
    p = np.array([0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205])
    # thresholds alpha*i/n = .00625,.0125,.01875,... → largest k with
    # p_(k) <= thresh_k is k=2
    mask = stats.bh_adjust(p, alpha=0.05)
    assert mask.tolist() == [True, True, False, False, False, False, False, False]
    # step-up property: a late small threshold pass rescues earlier ones
    p2 = np.array([0.01, 0.02, 0.03, 0.04])
    assert stats.bh_adjust(p2, alpha=0.05).all()


def test_sabha_blockwise():
    # block 0 is signal-rich (small p), block 1 is null-like (uniform)
    p = np.array([0.001, 0.002, 0.003, 0.004, 0.6, 0.7, 0.8, 0.9])
    blocks = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    q = stats.sabha_qhat_block(p, blocks, tau=0.5, eps=0.1)
    assert np.all(q[:4] == 0.1)   # no censored p-values in block 0 → eps floor
    assert np.all(q[4:] == 1.0)   # all censored in block 1 → capped at 1
    sel = stats.sabha_select(p, q, alpha=0.05)
    assert sel[:4].all() and not sel[4:].any()


def test_fisher_exact_textbook():
    # Agresti tea-tasting: [[3,1],[1,3]] → two-sided p ≈ 0.4857
    p = stats.fisher_exact_2x2(3, 1, 1, 3)
    assert math.isclose(p, 0.485714, abs_tol=1e-4)
    # independence-ish table → p near 1
    assert stats.fisher_exact_2x2(10, 10, 10, 10) == 1.0


def test_roc_threshold_separable():
    scores = np.array([0.1, 0.2, 0.3, 0.8, 0.9, 0.95])
    labels = np.array([0, 0, 0, 1, 1, 1])
    t, cost = stats.roc_optimal_threshold(scores, labels)
    assert 0.3 < t <= 0.8 and cost == 0.0


def test_fpgrowth_rules(spark):
    from azure_medicine_data_engineering_spark.functions.mining import (
        association_rules,
        frequent_itemsets,
    )

    txns = spark.createDataFrame(
        [(i, ["a", "b", "c"] if i % 2 == 0 else ["a", "b"]) for i in range(10)],
        "id int, items array<string>",
    )
    items = {r["items"]: r.freq for r in frequent_itemsets(txns, min_support=0.4).collect()}
    assert items["a,b"] == 10 and items["a,b,c"] == 5
    rules = {
        (r.antecedent, r.consequent): r
        for r in association_rules(txns, min_support=0.4, min_confidence=0.9, min_lift=None).collect()
    }
    assert rules[("a", "b")].confidence == 1.0
    assert rules[("c", "a")].lift == 1.0  # a is universal


def test_permanova_separated_groups():
    # two tight, well-separated boolean clusters → significant
    X = np.array([[1, 1, 1, 0, 0, 0]] * 6 + [[0, 0, 0, 1, 1, 1]] * 6)
    # tiny perturbations so distances aren't all identical
    X[1, 0] = 0
    X[7, 3] = 0
    groups = np.array([0] * 6 + [1] * 6)
    d = stats.jaccard_distance_matrix(X)
    f, p = stats.permanova(d, groups, n_permutations=499, seed=9)
    assert f > 3 and p < 0.01
    # random labels → not significant
    rng = np.random.default_rng(0)
    f2, p2 = stats.permanova(d, rng.permutation(groups), n_permutations=499, seed=9)
    assert p2 > 0.05


def test_permanova_degenerate():
    d = np.zeros((3, 3))
    f, p = stats.permanova(d, np.array([0, 0, 0]))
    assert p == stats.DEGENERATE_P


def test_paired_permutation_signflip(spark):
    # strong paired effect: exam2 consistently ~2 lower than exam1
    rows = [("suv", 10.0 + i * 0.1, 8.0 + i * 0.1) for i in range(25)]
    # null pairing: differences symmetric around 0
    rows += [("noise", float(i % 5), float((i + 2) % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "hyp string, e1 double, e2 double")
    res = {
        r.hypothesis: r
        for r in stats.paired_permutation_test_grouped(
            df, "hyp", "e1", "e2", n_permutations=500, seed=11
        ).collect()
    }
    assert res["suv"].p_value < 0.01 and abs(res["suv"].mean_diff - 2.0) < 1e-9
    assert res["noise"].p_value > 0.05
    # degenerate: no complete pairs
    df2 = spark.createDataFrame([("h", None, 1.0)], "hyp string, e1 double, e2 double")
    row = stats.paired_permutation_test_grouped(df2, "hyp", "e1", "e2").collect()[0]
    assert row.p_value == stats.DEGENERATE_P


def test_sabha_select_df_matches_numpy_twin(spark):
    """The distributed SABHA must agree with the numpy reference port on
    the same (p, block) vector — same q̂, same selection set."""
    import numpy as np

    from azure_medicine_data_engineering_spark.functions.stats import (
        sabha_qhat_block,
        sabha_select,
        sabha_select_df,
    )

    rng = np.random.default_rng(7)
    n = 400
    p = rng.uniform(size=n)
    p[:40] *= 0.001  # planted signal
    blocks = np.array([f"b{i % 4}" for i in range(n)])
    qhat = sabha_qhat_block(p, blocks, tau=0.5, eps=0.1)
    mask = sabha_select(p, qhat, alpha=0.05, tau=0.5)

    df = spark.createDataFrame(
        [(int(i), float(p[i]), str(blocks[i])) for i in range(n)],
        "hyp int, p double, block string",
    )
    out = sabha_select_df(df, "hyp", "p", "block", alpha=0.05, tau=0.5, eps=0.1)
    rows = {r.hyp: r for r in out.collect()}
    assert len(rows) == n
    for i in range(n):
        assert abs(rows[i].qhat - qhat[i]) < 1e-12
        assert rows[i].selected == bool(mask[i]), i


def test_roc_optimal_cutoff_df_matches_numpy_twin(spark):
    import numpy as np

    from azure_medicine_data_engineering_spark.functions.stats import (
        roc_optimal_cutoff_df,
        roc_optimal_threshold,
    )

    rng = np.random.default_rng(11)
    scores = np.round(rng.normal(size=300), 3)
    labels = (scores + rng.normal(scale=0.8, size=300)) > 0
    t, cost = roc_optimal_threshold(scores, labels)

    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in zip(scores, labels)],
        "score double, label boolean",
    )
    row = roc_optimal_cutoff_df(df, "score", "label").first()
    assert row.threshold == t
    assert row.cost == cost
    assert row.fp + row.fn == cost  # unit costs


def test_permanova_grouped_planted_separation(spark):
    # Distributed PERMANOVA twin (functions/stats.py:permanova_grouped).
    # h1: disjoint hour sets per cohort -> near-maximal F, minimal p.
    # h2: same base set + parity-correlated jitter -> mild but real effect.
    # Values pinned: integer-grid sums are exact, p is md5-seeded.
    from azure_medicine_data_engineering_spark.functions.stats import (
        permanova_grouped,
    )

    rows = []
    for u in range(12):
        hrs = (
            [0, 1, 2, 3, 4, 5, 6 + u % 3]
            if u % 2 == 0
            else [18, 19, 20, 21, 22, 23, 12 + u % 3]
        )
        rows.append(("h1", u, hrs, u % 2 == 0))
    for u in range(12):
        rows.append(("h2", u, [1, 2, 3, 4, 5 + u % 4], u % 2 == 0))
    df = spark.createDataFrame(
        rows, "hyp string, uid long, hrs array<int>, grp boolean"
    )
    out = {
        r.hypothesis: r
        for r in permanova_grouped(
            df, "hyp", "uid", "hrs", "grp", n_permutations=199, seed=42
        ).collect()
    }
    h1, h2 = out["h1"], out["h2"]
    assert (h1.n, h1.n_a, h1.n_b) == (12, 6, 6)
    assert (h1.t_u, h1.w_a_u, h1.w_b_u) == (3750000000, 75000000, 75000000)
    assert h1.pseudo_f == 115.0
    assert h1.p_value == 0.005  # 1/(199+1): observed F never beaten
    assert h2.t_u == 599999994
    assert round(h2.pseudo_f, 4) == 5.0
    assert h2.p_value == 0.01


def test_permanova_grouped_degenerate_single_group(spark):
    from azure_medicine_data_engineering_spark.functions.stats import (
        DEGENERATE_P,
        permanova_grouped,
    )

    df = spark.createDataFrame(
        [("h", u, [1, 2, u], True) for u in range(6)],
        "hyp string, uid long, hrs array<int>, grp boolean",
    )
    row = permanova_grouped(df, "hyp", "uid", "hrs", "grp").collect()[0]
    assert row.p_value == DEGENERATE_P
    import math
    # NaN surfaces as None through the Arrow boundary
    assert row.pseudo_f is None or math.isnan(row.pseudo_f)


def test_sequential_patterns_planted(spark):
    """Hand-checkable journeys incl. a same-ts concurrent itemset and an
    a>a repeat; minSupport 0.5 of 4 users = 2 sequences."""
    import datetime

    from azure_medicine_data_engineering_spark.functions.mining import (
        sequential_patterns,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # u1: view -> click -> purchase
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: view -> click
        (2, ts(0), "view"), (2, ts(5), "click"),
        # u3: click & view CONCURRENT (same ts), then view again
        (3, ts(0), "view"), (3, ts(0), "click"), (3, ts(9), "view"),
        # u4: purchase only
        (4, ts(0), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["pattern"]: r["freq"] for r in
           sequential_patterns(df, min_support=0.5, max_pattern_length=2).collect()}
    assert got["view"] == 3 and got["click"] == 3 and got["purchase"] == 2
    # strict precedence: u3's same-ts view/click supports NEITHER
    # view>click NOR click>view sequentially...
    assert got["view>click"] == 2
    # ...but u3's later view gives click>view support 1 (< minSupport)
    assert "click>view" not in got
    # concurrent itemset click+view: only u3 -> below support
    assert "click+view" not in got
    lowered = {r["pattern"]: r["freq"] for r in
               sequential_patterns(df, min_support=0.25,
                                   max_pattern_length=2).collect()}
    assert lowered["click+view"] == 1
    assert lowered["click>view"] == 1
    # a>a repeat: u3 has two views at distinct ts
    assert lowered["view>view"] == 1


# ---------------------------------------------------------------------------
# Round 10: Storey FDR + the step / ordered (PAVA) SABHA q-hat solvers —
# the reference's last defined-but-uncalled corrections (R.r:20-84,293-298).
# Hand-enumerated pins (naive references, mirror-blind-spot convention).
# ---------------------------------------------------------------------------


def test_storey_select_hand_pinned():
    p = np.array([0.001, 0.005, 0.04, 0.2, 0.6, 0.7, 0.9, 0.3])
    # mean(p > 0.5) = 3/8 -> pi0 = 0.75; level = 0.05/0.75 = 1/15
    # sorted censored: .001 .005 .04 .2 .3 inf inf inf vs level*i/8:
    # .00833 .01667 ... -> khat = 2 -> select censored <= level*2/8
    mask = stats.storey_select(p, alpha=0.05, thr=0.5)
    assert mask.tolist() == [True, True, False, False, False, False, False, False]


def test_storey_superset_of_bh():
    """With signal present pi0 < 1, so Storey's level alpha/pi0 > alpha
    and its rejection set contains BH's."""
    rng = np.random.RandomState(5)
    p = np.concatenate([rng.uniform(0, 0.002, 20), rng.uniform(0, 1, 80)])
    bh = stats.bh_adjust(p, alpha=0.05)
    st = stats.storey_select(p, alpha=0.05, thr=0.5)
    assert st[bh].all()
    assert st.sum() >= bh.sum()


def test_storey_r_quirk_no_censored():
    """R parity: no p-value above thr -> pi0 = 0 -> alpha/0 = Inf selects
    everything (Inf <= Inf is TRUE in R)."""
    p = np.array([0.1, 0.2, 0.3])
    assert stats.storey_select(p, thr=0.5).all()


def test_sabha_qhat_step_hand_pinned():
    q = stats.sabha_qhat_step(
        np.array([0.1, 0.6, 0.2, 0.7, 0.8, 0.3]), tau=0.5, eps=0.1
    )
    # budget = (6*0.5 - 3)/(1/0.1 - 1) = 0; cumsum(over) = 0,1,1,2,3,3
    # -> K = 1 (the leading position with cumsum 0)
    assert q.tolist() == [0.1, 1.0, 1.0, 1.0, 1.0, 1.0]
    # all p below tau -> budget positive, every prefix fits -> all eps
    q2 = stats.sabha_qhat_step(np.array([0.1] * 6), tau=0.5, eps=0.1)
    assert q2.tolist() == [0.1] * 6


def test_pava_isotonic_hand_pinned():
    got = stats.pava_isotonic(np.array([3.0, 1.0, 2.0, 5.0, 4.0]))
    assert got.tolist() == [2.0, 2.0, 2.0, 4.5, 4.5]
    # already monotone -> identity
    y = np.array([1.0, 2.0, 2.0, 7.0])
    assert stats.pava_isotonic(y).tolist() == y.tolist()
    # strictly decreasing -> global mean
    assert stats.pava_isotonic(np.array([3.0, 2.0, 1.0])).tolist() == [2.0] * 3


def test_pava_matches_reference_rescan_algorithm():
    """Pin the stack-based merge against a direct transcription of the
    reference's repeated mean-rescan PAVA (R.r:39-81) on random vectors —
    two structurally different routes to the same fixed point."""

    def pava_rescan(y):
        y = list(map(float, y))
        n = len(y)
        groups = list(range(1, n + 1))
        block = 1
        thresh = 1e-8

        def mean_of(b):
            vals = [y[i] for i in range(n) if groups[i] == b]
            return sum(vals) / len(vals)

        while True:
            if (block + 1) in groups:
                if mean_of(block) <= mean_of(block + 1) + thresh:
                    block += 1
                else:
                    groups = [g - 1 if g > block else g for g in groups]
                    while True:
                        if (block - 1) in groups:
                            if mean_of(block - 1) > mean_of(block) + thresh:
                                groups = [
                                    g - 1 if g >= block else g for g in groups
                                ]
                                block -= 1
                            else:
                                break
                        else:
                            break
            else:
                break
        out = list(y)
        for b in set(groups):
            m = mean_of(b)
            for i in range(n):
                if groups[i] == b:
                    out[i] = m
        return out

    rng = np.random.RandomState(11)
    for _ in range(20):
        y = rng.uniform(0, 3, size=rng.randint(1, 30))
        got = stats.pava_isotonic(y)
        ref = pava_rescan(y)
        assert np.allclose(got, ref, atol=1e-9)


def test_sabha_qhat_ordered_hand_pinned():
    q = stats.sabha_qhat_ordered(
        np.array([0.6, 0.2, 0.7, 0.1]), tau=0.5, eps=0.1
    )
    # raw censoring estimate [2,0,2,0] -> isotonic [1,1,1,1] -> clip
    assert q.tolist() == [1.0, 1.0, 1.0, 1.0]
    # sorted p-values with late censoring -> monotone step up to 1
    q2 = stats.sabha_qhat_ordered(
        np.array([0.1, 0.2, 0.3, 0.6, 0.9]), tau=0.5, eps=0.1
    )
    assert (np.diff(q2) >= -1e-12).all()
    assert q2[0] == 0.1 and q2[-1] <= 1.0


def test_storey_df_matches_numpy(spark):
    rng = np.random.RandomState(23)
    p = np.round(
        np.concatenate([rng.uniform(0, 0.003, 8), rng.uniform(0, 1, 40)]), 6
    )
    rows = [(int(i), float(v)) for i, v in enumerate(p)]
    df = spark.createDataFrame(rows, "key long, p double")
    got = {
        r["key"]: (r["selected"], r["pi0"])
        for r in stats.storey_select_df(df, "key", "p").collect()
    }
    mask = stats.storey_select(p, alpha=0.05, thr=0.5)
    est = min(1.0, float((p > 0.5).mean()) / 0.5)
    for i in range(len(p)):
        assert got[i][0] == bool(mask[i]), i
        assert got[i][1] == pytest.approx(est, abs=1e-12)
