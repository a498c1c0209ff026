"""Statistics layer (SURVEY §2.11) — the reference's R hypothesis-testing
notebook re-expressed for Spark: permutation tests fan out per-hypothesis via
``applyInPandas`` (the reference collects everything into a single R process,
``Hypothesis testing R.r:354-359``); the p-value-vector corrections (BH,
SABHA) and the ROC sweep exist twice: numpy ports for tiny driver-side
vectors, and DataFrame twins (:func:`sabha_select_df`,
:func:`roc_optimal_cutoff_df`) for hypothesis sets that never fit a driver.

No scipy in the runtime — hypergeometric/Fisher are computed from log-factorials.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

DEGENERATE_P = 2.0  # sentinel for untestable splits (myPermTest, R.r:400-401)


def permutation_test_grouped(
    df: DataFrame,
    hypothesis_col: str,
    metric_col: str,
    group_col: str,
    n_permutations: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Two-sample permutation test per hypothesis key, distributed.

    Parity: ``myPermTest`` (``Hypothesis testing R.r:393-403``) — two-sided
    p-value for the difference of means of ``metric_col`` split by boolean
    ``group_col``, NA-filtered, sentinel 2.0 when a side is empty. The
    reference runs each test single-node in R; here every hypothesis is an
    ``applyInPandas`` group, so the fan-out parallelizes across executors.
    The RNG is seeded per hypothesis key → deterministic at any parallelism.
    """
    out_schema = StructType(
        [
            StructField("hypothesis", StringType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
            StructField("observed_diff", DoubleType()),
            StructField("p_value", DoubleType()),
        ]
    )

    def run(pdf):
        import pandas as pd

        key = str(pdf[hypothesis_col].iloc[0])
        # sort: group row order depends on partitioning; the resampling
        # sequence must not
        sub = pdf[[metric_col, group_col]].dropna().sort_values(
            [group_col, metric_col], kind="stable"
        )
        a = sub.loc[sub[group_col] == True, metric_col].to_numpy(float)  # noqa: E712
        b = sub.loc[sub[group_col] == False, metric_col].to_numpy(float)  # noqa: E712
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                [[key, len(a), len(b), float("nan"), DEGENERATE_P]],
                columns=[f.name for f in out_schema.fields],
            )
        observed = a.mean() - b.mean()
        pooled = np.concatenate([a, b])
        # stable per-key seed (builtin hash() is salted per process)
        import hashlib

        key_hash = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed + key_hash)
        count = 0
        for _ in range(n_permutations):
            rng.shuffle(pooled)
            diff = pooled[: len(a)].mean() - pooled[len(a):].mean()
            if abs(diff) >= abs(observed):
                count += 1
        p = (count + 1) / (n_permutations + 1)
        return pd.DataFrame(
            [[key, len(a), len(b), float(observed), float(p)]],
            columns=[f.name for f in out_schema.fields],
        )

    return (
        df.select(
            F.col(hypothesis_col), F.col(metric_col), F.col(group_col)
        )
        .groupBy(hypothesis_col)
        .applyInPandas(run, out_schema)
    )


def bh_adjust(pvals: np.ndarray, alpha: float = 0.05) -> np.ndarray:
    """Benjamini–Hochberg rejection mask (``BH_method``, R.r:288-291)."""
    p = np.asarray(pvals, dtype=float)
    n = len(p)
    order = np.argsort(p, kind="stable")
    ranked = p[order]
    thresh = alpha * (np.arange(1, n + 1) / n)
    below = ranked <= thresh
    k = np.max(np.nonzero(below)[0]) + 1 if below.any() else 0
    mask = np.zeros(n, dtype=bool)
    mask[order[:k]] = True
    return mask


def sabha_qhat_block(
    pvals: np.ndarray, blocks: np.ndarray, tau: float = 0.5, eps: float = 0.1
) -> np.ndarray:
    """Blockwise structure-adaptive null-proportion estimate q̂.

    Simplified port of ``Solve_q_block`` (``Hypothesis testing R.r:166-213``,
    Li & Barber 2019): per block, q̂ = censored fraction of p-values above τ,
    clipped to [ε, 1]. The reference's ADMM refinement (its fallback solves
    exactly this blockwise estimate) is intentionally omitted — p-value
    vectors here are tiny and driver-side."""
    p = np.asarray(pvals, float)
    q = np.ones(len(p))
    for b in np.unique(blocks):
        m = blocks == b
        frac = (p[m] > tau).mean() / (1 - tau)
        q[m] = min(1.0, max(eps, frac))
    return q


def sabha_select(
    pvals: np.ndarray,
    qhat: np.ndarray,
    alpha: float = 0.05,
    tau: float = 0.5,
) -> np.ndarray:
    """SABHA selection (``SABHA_method``, R.r:300-305): BH on q̂-weighted
    p-values, censored at τ."""
    p = np.asarray(pvals, float)
    n = len(p)
    weighted = np.where(p > tau, np.inf, qhat * p)
    order = np.argsort(weighted, kind="stable")
    ranked = weighted[order]
    thresh = alpha * (np.arange(1, n + 1) / n)
    below = ranked <= thresh
    k = np.max(np.nonzero(below)[0]) + 1 if below.any() else 0
    mask = np.zeros(n, dtype=bool)
    mask[order[:k]] = True
    return mask


def storey_select(
    pvals: np.ndarray, alpha: float = 0.05, thr: float = 0.5
) -> np.ndarray:
    """Storey adaptive-FDR rejection mask (``Storey_method``, ``Hypothesis
    testing R.r:293-298``): estimate the null proportion
    π̂₀ = min(1, mean(p > thr)/(1 − thr)), censor p-values above ``thr``
    to ∞, then run BH at the inflated level α/π̂₀ — strictly more
    rejections than plain BH whenever signal exists (π̂₀ < 1). Round 10:
    closes one of the reference's defined-but-uncalled corrections.

    R-quirk parity note: when NO p-value exceeds ``thr``, R computes
    α/0 = Inf and `Inf <= Inf` is TRUE, so EVERYTHING (censored included)
    selects; this port reproduces that literally so the hand-enumerated
    pins transfer."""
    p = np.asarray(pvals, dtype=float)
    n = len(p)
    est = min(1.0, float((p > thr).mean()) / (1.0 - thr))
    censored = np.where(p > thr, np.inf, p)
    level = np.inf if est == 0.0 else alpha / est
    order = np.argsort(censored, kind="stable")
    ranked = censored[order]
    thresh = level * (np.arange(1, n + 1) / n)
    below = ranked <= thresh
    k = np.max(np.nonzero(below)[0]) + 1 if below.any() else 0
    return censored <= level * k / n


def sabha_qhat_step(
    pvals: np.ndarray, tau: float = 0.5, eps: float = 0.1
) -> np.ndarray:
    """Step-function q̂ (``Solve_q_step``, ``Hypothesis testing
    R.r:20-27``): q = (ε,…,ε,1,…,1) with as many leading ε's as the
    budget Σᵢ 1{pᵢ>τ}/qᵢ ≤ n(1−τ) allows — K = the largest prefix whose
    count of censored p-values stays within
    (n(1−τ) − Σ1{p>τ}) / (1/ε − 1). Exactly the reference's closed form
    (no ADMM needed for this constraint set)."""
    p = np.asarray(pvals, dtype=float)
    n = len(p)
    over = p > tau
    total_over = int(over.sum())
    budget = (n * (1.0 - tau) - total_over) / (1.0 / eps - 1.0)
    cum = np.cumsum(over)
    ok = np.nonzero(cum <= budget)[0]
    k = int(ok.max()) + 1 if len(ok) else 0
    q = np.ones(n)
    q[:k] = eps
    return q


def pava_isotonic(y: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators isotonic fit: argmin ½‖x − y‖² subject to
    x₁ ≤ … ≤ xₙ (Barlow et al. 1972 — the projection the reference's
    ``create_PAVA_alg_function`` (R.r:39-81) builds for the ordered-q̂
    ADMM). Stack-based O(n) merge instead of the reference's repeated
    mean-rescan loop; identical fixed point."""
    y = np.asarray(y, dtype=float)
    # blocks as (sum, count) with running means; merge while decreasing
    sums: list[float] = []
    cnts: list[int] = []
    for v in y:
        sums.append(float(v))
        cnts.append(1)
        while len(sums) > 1 and sums[-2] / cnts[-2] > sums[-1] / cnts[-1]:
            s, c = sums.pop(), cnts.pop()
            sums[-1] += s
            cnts[-1] += c
    out = np.empty(len(y))
    i = 0
    for s, c in zip(sums, cnts):
        out[i : i + c] = s / c
        i += c
    return out


def sabha_qhat_ordered(
    pvals: np.ndarray, tau: float = 0.5, eps: float = 0.1
) -> np.ndarray:
    """Monotone q̂ with ε ≤ q₁ ≤ … ≤ qₙ ≤ 1 (``Solve_q_ordered``,
    R.r:33-38): the isotonic projection of the raw censoring estimate
    1{p>τ}/(1−τ) via :func:`pava_isotonic`, clipped to [ε, 1] — the same
    projection-of-the-plugin-estimate simplification the repo's block
    solver makes (the reference's ADMM refines exactly this projection;
    p-value vectors here are tiny and driver-side)."""
    p = np.asarray(pvals, dtype=float)
    raw = (p > tau).astype(float) / (1.0 - tau)
    return np.clip(pava_isotonic(raw), eps, 1.0)


def storey_select_df(
    df: DataFrame,
    key_col: str,
    p_col: str,
    alpha: float = 0.05,
    thr: float = 0.5,
) -> DataFrame:
    """Distributed Storey adaptive FDR — the DataFrame twin of
    :func:`storey_select` for hypothesis sets too large to collect
    (mirrors :func:`sabha_select_df`'s shape): π̂₀ is one 1-row global
    aggregate broadcast back; the BH step at level α/π̂₀ is a single
    global ranking over the HYPOTHESIS-level frame (one row per test —
    bounded by the number of hypotheses, never data rows). Censored
    p-values (> thr) rank NULLS LAST and are never selected (the sane
    reading of the reference's Inf handling; the R est=0 quirk cannot
    arise once any p-value exceeds thr).

    Returns ``(key, p, pi0, rk, selected)``."""
    from pyspark.sql.window import Window

    pi0 = df.agg(
        F.least(
            F.lit(1.0),
            F.avg((F.col(p_col) > thr).cast("double")) / (1.0 - thr),
        ).alias("pi0"),
        F.count(F.lit(1)).alias("_n"),
    )
    censored = df.crossJoin(F.broadcast(pi0)).withColumn(
        "wp", F.when(F.col(p_col) <= thr, F.col(p_col))
    )
    w = Window.orderBy(F.col("wp").asc_nulls_last(), F.col(key_col))
    # hypothesis-grain frame (one row per test) consumed by BOTH the kmax
    # aggregate and the output join — persist or its ranking replays
    ranked = censored.select(
        key_col,
        p_col,
        "pi0",
        "_n",
        "wp",
        F.row_number().over(w).alias("rk"),
    ).persist()
    kmax = ranked.where(
        F.col("wp") * F.col("pi0") <= F.lit(float(alpha)) * F.col("rk") / F.col("_n")
    ).agg(F.max("rk").alias("_kmax"))
    out = (
        ranked.crossJoin(F.broadcast(kmax))
        .withColumn(
            "selected",
            F.coalesce(
                F.col("wp").isNotNull() & (F.col("rk") <= F.col("_kmax")),
                F.lit(False),
            ),
        )
        .drop("_n", "_kmax", "wp")
    )
    out._stage_caches = [ranked]
    return out


def _log_comb(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def fisher_exact_2x2(a: int, b: int, c: int, d: int) -> float:
    """Two-sided Fisher exact p-value (sum of hypergeometric tables with
    probability ≤ observed). Parity: ``fisher.test`` usage at R.r:551-554.
    Pure math.lgamma — no scipy."""
    n = a + b + c + d
    row1, col1 = a + b, a + c
    lo, hi = max(0, row1 + col1 - n), min(row1, col1)

    def log_pmf(k: int) -> float:
        return (
            _log_comb(col1, k)
            + _log_comb(n - col1, row1 - k)
            - _log_comb(n, row1)
        )

    obs = log_pmf(a)
    total = 0.0
    for k in range(lo, hi + 1):
        lp = log_pmf(k)
        if lp <= obs + 1e-7:
            total += math.exp(lp)
    return min(1.0, total)


def permanova(
    dist: np.ndarray, groups: np.ndarray, n_permutations: int = 999, seed: int = 42
) -> tuple[float, float]:
    """PERMANOVA pseudo-F + permutation p-value on a distance matrix
    (parity: ``myPermanova`` / vegan ``adonis`` with perm=999,
    ``Hypothesis testing R.r:375-388``; the reference notes the analysis was
    attempted but excluded from results, ``README.md:438``).

    Anderson (2001): F = (SS_between/(g-1)) / (SS_within/(n-g)), with sums of
    squares derived from pairwise distances; group labels are permuted."""
    d2 = np.asarray(dist, float) ** 2
    g_labels = np.asarray(groups)
    n = len(g_labels)
    uniq = np.unique(g_labels)
    g = len(uniq)
    if g < 2 or n <= g:
        return float("nan"), DEGENERATE_P

    ss_total = d2[np.triu_indices(n, 1)].sum() / n

    def ss_within(labels) -> float:
        total = 0.0
        for u in uniq:
            idx = np.nonzero(labels == u)[0]
            if len(idx) > 1:
                sub = d2[np.ix_(idx, idx)]
                total += sub[np.triu_indices(len(idx), 1)].sum() / len(idx)
        return total

    def pseudo_f(labels) -> float:
        w = ss_within(labels)
        a = ss_total - w
        return (a / (g - 1)) / (w / (n - g))

    observed = pseudo_f(g_labels)
    rng = np.random.default_rng(seed)
    perm = g_labels.copy()
    count = 0
    for _ in range(n_permutations):
        rng.shuffle(perm)
        if pseudo_f(perm) >= observed:
            count += 1
    return float(observed), (count + 1) / (n_permutations + 1)


def jaccard_distance_matrix(X: np.ndarray) -> np.ndarray:
    """Pairwise Jaccard distances over a boolean matrix (rows = samples) —
    the reference's ``vegdist(method="jaccard")`` input to PERMANOVA."""
    B = np.asarray(X, bool)
    inter = B @ B.T
    row = B.sum(axis=1)
    union = row[:, None] + row[None, :] - inter
    with np.errstate(invalid="ignore"):
        sim = np.where(union > 0, inter / union, 1.0)
    return 1.0 - sim


def permanova_grouped(
    df: DataFrame,
    hypothesis_col: str,
    sample_id_col: str,
    items_col: str,
    group_col: str,
    n_permutations: int = 199,
    seed: int = 42,
) -> DataFrame:
    """Distributed PERMANOVA (R3): one Anderson-2001 test per hypothesis
    key, fanned out via ``applyInPandas`` — the driver-checkable twin of
    :func:`permanova` (parity: ``myPermanova`` / vegan ``adonis``,
    ``Hypothesis testing R.r:375-388``). Each group's samples carry an item
    SET (``items_col``); the distance is Jaccard (the reference's
    ``vegdist(method="jaccard")``), the factor is boolean ``group_col``.

    Engine-exactness contract (same scheme as the permutation tests +
    PQ/LM integer-grid sums): each pairwise SQUARED distance is rounded
    half-away onto the 1e-8 integer grid, so the three sums the pseudo-F
    needs — total and the two within-group sums — are exact, order-free
    BIGINTs exposed as ``t_u``/``w_a_u``/``w_b_u``. The observed
    ``pseudo_f`` is then a fixed sequence of IEEE double ops over those
    integers (identical in Spark and DuckDB), rounded to 4. The seeded
    permutation p-value is not SQL-expressible; it exports as ``p_valid``
    (p ∈ [1/(n_perm+1), 1] and p·(n_perm+1) integral — the invariants of
    the (count+1)/(n_perm+1) estimator); exact p-values are pinned in
    tests/test_stats.py. RNG seeds are per-key md5-derived, samples sorted
    by id, so the null is deterministic at any partitioning.

    Scale: PERMANOVA is O(n² ) in samples — the caller bounds the panel
    per hypothesis (a fixed sample panel is the statistical design, not a
    shortcut); hypotheses parallelize across executors."""
    out_schema = StructType(
        [
            StructField("hypothesis", StringType()),
            StructField("n", LongType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
            StructField("t_u", LongType()),
            StructField("w_a_u", LongType()),
            StructField("w_b_u", LongType()),
            StructField("pseudo_f", DoubleType()),
            StructField("p_value", DoubleType()),
        ]
    )

    def run(pdf):
        import hashlib

        import pandas as pd

        key = str(pdf[hypothesis_col].iloc[0])
        sub = pdf.sort_values(sample_id_col, kind="stable")
        sets = [set(x) for x in sub[items_col]]
        labels = sub[group_col].to_numpy(bool)
        n = len(sets)
        n_a, n_b = int(labels.sum()), int(n - labels.sum())
        if n_a == 0 or n_b == 0 or n <= 2:
            return pd.DataFrame(
                [[key, n, n_a, n_b, 0, 0, 0, float("nan"), DEGENERATE_P]],
                columns=[f.name for f in out_schema.fields],
            )
        du = np.zeros((n, n), dtype=np.int64)
        for i in range(n):
            for j in range(i + 1, n):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                d = 1.0 - inter / union if union else 0.0
                # half-away onto the 1e-8 grid (CLAUDE.md convention;
                # d*d is the squared distance the SS decomposition sums)
                u = int(d * d * 1e8 + 0.5)
                du[i, j] = du[j, i] = u
        t_u = int(np.triu(du).sum())

        def f_of(lab) -> float:
            # integer matmul is exact; diag is 0 so the quadratic form
            # double-counts each within pair — halve it
            wa = int(lab @ du @ lab) // 2
            wb = int((~lab) @ du @ (~lab)) // 2
            na, nb = int(lab.sum()), int(len(lab) - lab.sum())
            # FIXED op sequence — mirrored literally in the oracle SQL
            w = (wa / 1e8) / na + (wb / 1e8) / nb
            if w == 0.0:
                return float("inf")
            ss_t = (t_u / 1e8) / n
            return (ss_t - w) / (w / (n - 2))

        observed = f_of(labels)
        w_a_u = int(labels @ du @ labels) // 2
        w_b_u = int((~labels) @ du @ (~labels)) // 2
        key_hash = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed + key_hash)
        perm = labels.copy()
        count = 0
        for _ in range(n_permutations):
            rng.shuffle(perm)
            if f_of(perm) >= observed:
                count += 1
        p = (count + 1) / (n_permutations + 1)
        return pd.DataFrame(
            [[key, n, n_a, n_b, t_u, w_a_u, w_b_u, float(observed), float(p)]],
            columns=[f.name for f in out_schema.fields],
        )

    return (
        df.select(hypothesis_col, sample_id_col, items_col, group_col)
        .groupBy(hypothesis_col)
        .applyInPandas(run, out_schema)
    )


def roc_optimal_threshold(
    scores: np.ndarray, labels: np.ndarray, fp_cost: float = 1.0, fn_cost: float = 1.0
) -> tuple[float, float]:
    """Equal-cost-optimal cutoff (``thres2``, R.r:566-574; README.md:464):
    returns (threshold, total_cost_at_threshold) minimizing
    fp_cost·FP + fn_cost·FN over candidate thresholds."""
    s = np.asarray(scores, float)
    y = np.asarray(labels).astype(bool)
    candidates = np.unique(s)
    best_t, best_cost = float(candidates[0]), float("inf")
    for t in candidates:
        pred = s >= t
        fp = float(np.sum(pred & ~y))
        fn = float(np.sum(~pred & y))
        cost = fp_cost * fp + fn_cost * fn
        if cost < best_cost:
            best_cost, best_t = cost, float(t)
    return best_t, best_cost


def paired_permutation_test_grouped(
    df: DataFrame,
    hypothesis_col: str,
    value_a_col: str,
    value_b_col: str,
    n_permutations: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Paired two-sample permutation test (sign-flip test) per hypothesis.

    The reference's two-time-point study measures the SAME patients at two
    exam dates (paired columns ``…44`` vs ``…71``,
    ``twoPointsStudyScalaA.scala:29``); the correct resampling scheme is
    sign-flipping the per-subject differences, not pooling. Two-sided
    p-value on the mean difference; sentinel 2.0 when no complete pairs.
    Distributed via applyInPandas, deterministic at any parallelism."""
    out_schema = StructType(
        [
            StructField("hypothesis", StringType()),
            StructField("n_pairs", LongType()),
            StructField("mean_diff", DoubleType()),
            StructField("p_value", DoubleType()),
        ]
    )

    def run(pdf):
        import hashlib

        import pandas as pd

        key = str(pdf[hypothesis_col].iloc[0])
        sub = pdf[[value_a_col, value_b_col]].dropna().sort_values(
            [value_a_col, value_b_col], kind="stable"
        )
        d = (sub[value_a_col] - sub[value_b_col]).to_numpy(float)
        if len(d) == 0:
            return pd.DataFrame(
                [[key, 0, float("nan"), DEGENERATE_P]],
                columns=[f.name for f in out_schema.fields],
            )
        observed = d.mean()
        key_hash = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        rng = np.random.default_rng(seed + key_hash)
        count = 0
        for _ in range(n_permutations):
            signs = rng.integers(0, 2, size=len(d)) * 2 - 1
            if abs((d * signs).mean()) >= abs(observed):
                count += 1
        p = (count + 1) / (n_permutations + 1)
        return pd.DataFrame(
            [[key, len(d), float(observed), float(p)]],
            columns=[f.name for f in out_schema.fields],
        )

    return (
        df.select(F.col(hypothesis_col), F.col(value_a_col), F.col(value_b_col))
        .groupBy(hypothesis_col)
        .applyInPandas(run, out_schema)
    )


def sabha_select_df(
    df: DataFrame,
    key_col: str,
    p_col: str,
    block_col: str,
    alpha: float = 0.05,
    tau: float = 0.5,
    eps: float = 0.1,
) -> DataFrame:
    """Distributed SABHA (``SABHA_method`` + ``Solve_q_block``,
    ``Hypothesis testing R.r:166-213,300-305``; Li & Barber 2019): the
    DataFrame twin of :func:`sabha_qhat_block` + :func:`sabha_select`,
    for hypothesis sets too large to collect.

    Blockwise q̂ is one tiny groupBy (censored fraction above τ, clipped to
    [ε, 1], broadcast back); the BH step on q̂-weighted censored p-values
    is a single global ranking. The global window runs over the
    HYPOTHESIS-level frame (one row per test, post-aggregation) — bounded
    by the number of hypotheses, not data rows; BH's ``k_max`` is
    inherently a global order statistic.

    Returns ``(key, block, p, qhat, wp, rk, selected)`` — ``selected`` is
    BH's reject mask: ranks ≤ the largest k with ``wp_(k) ≤ αk/n``.
    """
    from pyspark.sql.window import Window

    qhat = (
        df.groupBy(block_col)
        .agg(
            F.least(
                F.lit(1.0),
                F.greatest(
                    F.lit(float(eps)),
                    F.avg((F.col(p_col) > tau).cast("double")) / (1.0 - tau),
                ),
            ).alias("qhat")
        )
    )
    weighted = df.join(F.broadcast(qhat), block_col).withColumn(
        "wp", F.when(F.col(p_col) <= tau, F.col("qhat") * F.col(p_col))
    )
    w = Window.orderBy(F.col("wp").asc_nulls_last(), F.col(key_col))
    # hypothesis-grain frame (one row per test) consumed by BOTH the kmax
    # aggregate and the output join — persist or its ranking replays
    ranked = weighted.select(
        key_col,
        block_col,
        p_col,
        "qhat",
        "wp",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    ).persist()
    kmax = ranked.where(
        F.col("wp") <= F.lit(float(alpha)) * F.col("rk") / F.col("_n")
    ).agg(F.max("rk").alias("_kmax"))
    out = (
        ranked.crossJoin(F.broadcast(kmax))
        .withColumn(
            "selected",
            F.coalesce(F.col("rk") <= F.col("_kmax"), F.lit(False)),
        )
        .drop("_n", "_kmax")
    )
    out._stage_caches = [ranked]
    return out


def roc_optimal_cutoff_df(
    df: DataFrame,
    score_col: str,
    label_col: str,
    fp_cost: float = 1.0,
    fn_cost: float = 1.0,
) -> DataFrame:
    """Distributed equal-cost ROC cutoff (``thres2``, R.r:566-574) — the
    DataFrame twin of :func:`roc_optimal_threshold` for score columns too
    large to collect.

    One groupBy collapses the data to per-candidate (score, pos, neg)
    counts; cumulative sums over the candidate frame (bounded by distinct
    scores, not rows) give FP/FN at every threshold in one pass — the
    standard ROC-sweep rewrite of the O(n²) per-threshold rescan. Returns
    ONE row ``(threshold, fp, fn, cost)``: the minimum-cost cutoff,
    ties broken toward the lowest threshold (numpy-twin semantics).
    """
    from pyspark.sql.window import Window

    y = F.col(label_col).cast("int")
    per_score = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(y).cast("long").alias("pos"),
        F.sum(1 - y).cast("long").alias("neg"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    swept = per_score.select(
        "threshold",
        F.sum("neg").over(w).alias("fp"),
        (F.sum("pos").over(wall) - F.sum("pos").over(w)).alias("fn"),
    ).select(
        "threshold",
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(
            F.lit(float(fp_cost)) * F.col("fp")
            + F.lit(float(fn_cost)) * F.col("fn"),
            4,
        ).alias("cost"),
    )
    return swept.orderBy("cost", "threshold").limit(1)
