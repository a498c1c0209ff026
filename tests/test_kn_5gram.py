"""Kneser-Ney 5-GRAM pins: naive-Python reference from first principles
(suffix-table recursion, half-away micro rounding — the mirror-oracle
blind-spot rule) plus order-sensitivity where the trigram is weaker."""

import math

from azure_medicine_data_engineering_spark.operators.text_rank import (
    kn_5gram_logprob_by_group,
    kn_trigram_logprob_by_group,
)

D = 0.75


def _half_away_micro(x: float) -> int:
    scaled = x * 1e6
    return math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)


def _naive_kn5_by_group(rows: list[tuple[str, str]]):
    """rows = (group, text). Interpolated KN 5-gram, corpus-self, interior
    positions, dicts/sets only — the suffix-table recursion written
    independently of the Spark/SQL implementations."""
    pens = []
    for g, text in rows:
        w = text.split()
        for i in range(len(w) - 4):
            pens.append((g, tuple(w[i : i + 5])))
    c5: dict = {}
    for _, p in pens:
        c5[p] = c5.get(p, 0) + 1
    # level-5 context
    cabcd: dict = {}
    nabcd: dict = {}
    for (a, b, c, d, e), n in c5.items():
        cabcd[(a, b, c, d)] = cabcd.get((a, b, c, d), 0) + n
        nabcd[(a, b, c, d)] = nabcd.get((a, b, c, d), 0) + 1
    # suffix tables
    d4 = {(b, c, d, e) for (a, b, c, d, e) in c5}
    d3 = {(c, d, e) for (b, c, d, e) in d4}
    d2 = {(d, e) for (c, d, e) in d3}
    m4: dict = {}
    w4: dict = {}
    l4: dict = {}
    for (a, b, c, d, e) in c5:
        m4[(b, c, d, e)] = m4.get((b, c, d, e), 0) + 1
        w4[(b, c, d)] = w4.get((b, c, d), 0) + 1
        l4.setdefault((b, c, d), set()).add(e)
    m3: dict = {}
    w3: dict = {}
    l3: dict = {}
    for (b, c, d, e) in d4:
        m3[(c, d, e)] = m3.get((c, d, e), 0) + 1
        w3[(c, d)] = w3.get((c, d), 0) + 1
        l3.setdefault((c, d), set()).add(e)
    m2: dict = {}
    w2: dict = {}
    l2: dict = {}
    for (c, d, e) in d3:
        m2[(d, e)] = m2.get((d, e), 0) + 1
        w2[d] = w2.get(d, 0) + 1
        l2.setdefault(d, set()).add(e)
    n1e: dict = {}
    for (d, e) in d2:
        n1e[e] = n1e.get(e, 0) + 1
    nal = len(d2)
    out: dict = {}
    for g, (a, b, c, d, e) in pens:
        p1 = n1e[e] * 1.0 / nal
        p2 = (max(m2[(d, e)] - D, 0.0) + D * len(l2[d]) * p1) / w2[d]
        p3 = (max(m3[(c, d, e)] - D, 0.0) + D * len(l3[(c, d)]) * p2) / w3[(c, d)]
        p4 = (
            max(m4[(b, c, d, e)] - D, 0.0) + D * len(l4[(b, c, d)]) * p3
        ) / w4[(b, c, d)]
        p5 = (
            max(c5[(a, b, c, d, e)] - D, 0.0) + D * nabcd[(a, b, c, d)] * p4
        ) / cabcd[(a, b, c, d)]
        lpu = _half_away_micro(math.log(p5))
        s = out.setdefault(g, [0, 0])
        s[0] += lpu
        s[1] += 1
    docs: dict = {}
    for gi, (g, text) in enumerate(rows):
        if len(text.split()) >= 5:
            docs.setdefault(g, set()).add(gi)
    return {g: (len(docs[g]), n, (-slpu) // n) for g, (slpu, n) in out.items()}


def test_matches_naive_reference(spark):
    rows = [
        ("a", "the cat sat on the mat by the door"),
        ("a", "the cat ate the food on the mat"),
        ("a", "a dog sat on the mat by the door"),
        ("b", "door the by mat the on sat cat the"),
        ("b", "mat the on food the ate cat the"),
        ("b", "too few"),  # < 5 tokens: contributes nothing
    ]
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = kn_5gram_logprob_by_group(df)
    got = {
        r.g: (r.n_docs, r.n_5grams, r.nll_micro) for r in out.collect()
    }
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got == _naive_kn5_by_group(rows)


def test_5gram_flags_trigram_consistent_chimera(spark):
    """A chimera document stitched from two frequent sentences at their
    shared middle trigram contains ZERO novel trigrams (every window
    appears verbatim in the corpus) but novel 5-grams straddle the seam —
    the order-5 model separates the chimera slice where the trigram's
    penalty stays marginal (the reason CCNet ships 5-grams)."""
    A = "p q r s t u v w"
    B = "x y r s t m n o"
    C = "p q r s t m n o"  # trigram-consistent chimera of A and B
    a_tris = {tuple(A.split()[i : i + 3]) for i in range(len(A.split()) - 2)}
    b_tris = {tuple(B.split()[i : i + 3]) for i in range(len(B.split()) - 2)}
    c_tris = {tuple(C.split()[i : i + 3]) for i in range(len(C.split()) - 2)}
    assert c_tris <= (a_tris | b_tris)  # fixture invariant: no novel trigram
    rows = (
        [(i, "nat", A) for i in range(10)]
        + [(20 + i, "nat", B) for i in range(10)]
        + [(100 + i, "mix", A) for i in range(5)]
        + [(120 + i, "mix", B) for i in range(5)]
        + [(140 + i, "mix", C) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    g5 = {r.g: r.nll_micro for r in kn_5gram_logprob_by_group(df).collect()}
    g3 = {r.g: r.nll_micro for r in kn_trigram_logprob_by_group(df).collect()}
    assert g5["mix"] > g5["nat"]
    # cross-ratio: the 5-gram's relative penalty strictly exceeds the
    # trigram's (novel 5-grams at the seam vs zero novel trigrams)
    assert g5["mix"] * g3["nat"] > g3["mix"] * g5["nat"]


# ---------------------------------------------------------------------------
# Modified KN (KenLM's estimator): naive reference + per-level fallback.
# ---------------------------------------------------------------------------


def _mkn_discounts(counts):
    """(D1, D2, D3+) from a count multiset per Chen & Goodman eq. 26,
    with the deterministic 0.75 fallback on degenerate buckets."""
    n = {k: sum(1 for c in counts if c == k) for k in (1, 2, 3, 4)}
    if not all(n[k] > 0 for k in (1, 2, 3, 4)):
        return 0.75, 0.75, 0.75
    y = n[1] / (n[1] + 2.0 * n[2])
    return (
        1.0 - 2.0 * y * n[2] / n[1],
        2.0 - 3.0 * y * n[3] / n[2],
        3.0 - 4.0 * y * n[4] / n[3],
    )


def _naive_mkn5_by_group(rows):
    pens = []
    for g, text in rows:
        w = text.split()
        for i in range(len(w) - 4):
            pens.append((g, tuple(w[i : i + 5])))
    c5: dict = {}
    for _, p in pens:
        c5[p] = c5.get(p, 0) + 1
    m4: dict = {}
    for (a, b, c, d, e) in c5:
        m4[(b, c, d, e)] = m4.get((b, c, d, e), 0) + 1
    m3: dict = {}
    for (b, c, d, e) in m4:
        m3[(c, d, e)] = m3.get((c, d, e), 0) + 1
    m2: dict = {}
    for (c, d, e) in m3:
        m2[(d, e)] = m2.get((d, e), 0) + 1
    n1e: dict = {}
    for (d, e) in m2:
        n1e[e] = n1e.get(e, 0) + 1
    nal = len(m2)
    D5 = _mkn_discounts(c5.values())
    D4 = _mkn_discounts(m4.values())
    D3v = _mkn_discounts(m3.values())
    D2v = _mkn_discounts(m2.values())

    def ctx_stats(table, keyfn):
        tot: dict = {}
        buck: dict = {}
        for k, cnt in table.items():
            ctx = keyfn(k)
            tot[ctx] = tot.get(ctx, 0) + cnt
            b = buck.setdefault(ctx, [0, 0, 0])
            b[0 if cnt == 1 else 1 if cnt == 2 else 2] += 1
        return tot, buck

    cab, ka = ctx_stats(c5, lambda k: k[:4])
    w4d, kb = ctx_stats(m4, lambda k: k[:3])
    w3d, kc = ctx_stats(m3, lambda k: k[:2])
    w2d, kd = ctx_stats(m2, lambda k: k[:1])

    def level(cnt, den, bucket, D, lower):
        d1, d2, d3 = D
        dd = d1 if cnt == 1 else d2 if cnt == 2 else d3
        gamma = d1 * bucket[0] + d2 * bucket[1] + d3 * bucket[2]
        return (max(cnt - dd, 0.0) + gamma * lower) / den

    out: dict = {}
    for g, p in pens:
        (a, b, c, d, e) = p
        p1 = n1e[e] * 1.0 / nal
        p2 = level(m2[(d, e)], w2d[(d,)], kd[(d,)], D2v, p1)
        p3 = level(m3[(c, d, e)], w3d[(c, d)], kc[(c, d)], D3v, p2)
        p4 = level(m4[(b, c, d, e)], w4d[(b, c, d)], kb[(b, c, d)], D4, p3)
        p5 = level(c5[p], cab[p[:4]], ka[p[:4]], D5, p4)
        lpu = _half_away_micro(math.log(p5))
        s = out.setdefault(g, [0, 0])
        s[0] += lpu
        s[1] += 1
    docs: dict = {}
    for gi, (g, text) in enumerate(rows):
        if len(text.split()) >= 5:
            docs.setdefault(g, set()).add(gi)
    return {g: (len(docs[g]), n, (-slpu) // n) for g, (slpu, n) in out.items()}


def test_mkn_matches_naive_reference(spark):
    """Corpus engineered so EVERY order has populated 1..4 count buckets
    (real estimated discounts at all levels) — the naive first-principles
    reference must agree exactly."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        mkn_5gram_logprob_by_group,
    )

    base = [
        "u v w x y z p q",
        "a b c d e f g h",
        "a b c d e q r s",
        "m b c d e f t u",
        "m n c d e f g v",
        "k n c d e h g w",
    ]
    rows = []
    did = 0
    for rep, s in zip([1, 2, 3, 4, 1, 2], base):
        for _ in range(rep):
            rows.append(("x" if did % 2 else "y", s))
            did += 1
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = mkn_5gram_logprob_by_group(df)
    got = {r.g: (r.n_docs, r.n_5grams, r.nll_micro) for r in out.collect()}
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got == _naive_mkn5_by_group(rows)


def test_mkn_degenerate_buckets_fall_back(spark):
    """An exact-replica corpus multiplies every raw 5-gram count by the
    clone factor, emptying the top order's 1..4 buckets — that level must
    take the deterministic 0.75 fallback while the continuation-count
    levels (unchanged by cloning) keep their estimated discounts; the
    naive reference implements the same rule, so equality pins it."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        mkn_5gram_logprob_by_group,
    )

    base = [
        "a b c d e f g h",
        "a b c d e q r s",
        "m b c d e f t u",
        "m n c d e f g v",
    ]
    rows = [("s", t) for t in base for _ in range(10)]  # every count x10
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = mkn_5gram_logprob_by_group(df)
    got = {r.g: (r.n_docs, r.n_5grams, r.nll_micro) for r in out.collect()}
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got == _naive_mkn5_by_group(rows)


def test_order_delta_flags_chimera_as_5g_stricter(spark):
    """The trigram-consistent chimera keeps its trigram bucket (zero novel
    trigrams) but the 5-gram routes it to a worse tercile — it shows up
    in n_5g_stricter."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        ccnet_router_order_delta,
    )

    A = "p q r s t u v w"
    B = "x y r s t m n o"
    C = "p q r s t m n o"
    rows = (
        [(i, "s", A) for i in range(8)]
        + [(20 + i, "s", B) for i in range(8)]
        + [(100, "s", C)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = ccnet_router_order_delta(df)
    [r] = out.collect()
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert r.n_docs == 17
    assert r.n_5g_stricter >= 1
    assert r.n_same + r.n_5g_stricter + r.n_5g_looser == r.n_docs


# ---------------------------------------------------------------------------
# Round 14: pruned + quantized serving — naive reference from first
# principles, on a corpus where pruning PROVABLY moves backoff mass
# (singleton 5-grams vanish, one sentence's vocabulary disappears from the
# pruned model entirely, so the unseen-token floor is exercised too).
# ---------------------------------------------------------------------------


def _naive_kn5_pruned(rows, min_count=2, bins=255):
    pens = []
    for g, text in rows:
        w = text.split()
        for i in range(len(w) - 4):
            pens.append((g, tuple(w[i : i + 5])))
    c5: dict = {}
    for _, p in pens:
        c5[p] = c5.get(p, 0) + 1

    def chain(counts):
        # same grains as the model tables: w4/l4 count DISTINCT 5-GRAMS
        # per (b,c,d); m3/w3/l3 are over the distinct-suffix-4-gram table;
        # m2/w2/l2 over distinct suffix 3-grams; n1e/nal over distinct
        # suffix bigrams (Chen & Goodman suffix-table recursion)
        cab, nab, m4, w4, l4 = {}, {}, {}, {}, {}
        for (a, b, c, d, e), n in counts.items():
            cab[(a, b, c, d)] = cab.get((a, b, c, d), 0) + n
            nab[(a, b, c, d)] = nab.get((a, b, c, d), 0) + 1
            m4[(b, c, d, e)] = m4.get((b, c, d, e), 0) + 1
            w4[(b, c, d)] = w4.get((b, c, d), 0) + 1
            l4.setdefault((b, c, d), set()).add(e)
        m3, w3, l3 = {}, {}, {}
        for (b, c, d, e) in set(m4):
            m3[(c, d, e)] = m3.get((c, d, e), 0) + 1
            w3[(c, d)] = w3.get((c, d), 0) + 1
            l3.setdefault((c, d), set()).add(e)
        m2, w2, l2 = {}, {}, {}
        for (c, d, e) in set(m3):
            m2[(d, e)] = m2.get((d, e), 0) + 1
            w2[d] = w2.get(d, 0) + 1
            l2.setdefault(d, set()).add(e)
        n1e = {}
        for (d, e) in set(m2):
            n1e[e] = n1e.get(e, 0) + 1
        return cab, nab, m4, w4, l4, m3, w3, l3, m2, w2, l2, n1e, len(m2)

    cab, nab, m4, w4, l4, m3, w3, l3, m2, w2, l2, n1e, nal = chain(c5)
    c5p = {p: n for p, n in c5.items() if n >= min_count}
    (cabp, nabp, m4p, w4p, l4p, m3p, w3p, l3p, m2p, w2p, l2p, n1ep,
     nalp) = chain(c5p)

    def full_lp(p):
        a, b, c, d, e = p
        p1 = n1e[e] * 1.0 / nal
        p2 = (max(m2[(d, e)] - D, 0.0) + D * len(l2[d]) * p1) / w2[d]
        p3 = (max(m3[(c, d, e)] - D, 0.0) + D * len(l3[(c, d)]) * p2) / w3[
            (c, d)
        ]
        p4 = (
            max(m4[(b, c, d, e)] - D, 0.0) + D * len(l4[(b, c, d)]) * p3
        ) / w4[(b, c, d)]
        return math.log(
            (max(c5[p] - D, 0.0) + D * nab[(a, b, c, d)] * p4)
            / cab[(a, b, c, d)]
        )

    def pruned_lp(p):
        a, b, c, d, e = p
        p1 = (
            n1ep[e] * 1.0 / nalp if n1ep.get(e, 0) > 0 else 0.5 / nalp
        )
        p2 = (
            (max(m2p.get((d, e), 0) - D, 0.0) + D * len(l2p[d]) * p1)
            / w2p[d]
            if w2p.get(d, 0) > 0
            else p1
        )
        p3 = (
            (
                max(m3p.get((c, d, e), 0) - D, 0.0)
                + D * len(l3p[(c, d)]) * p2
            )
            / w3p[(c, d)]
            if w3p.get((c, d), 0) > 0
            else p2
        )
        p4 = (
            (
                max(m4p.get((b, c, d, e), 0) - D, 0.0)
                + D * len(l4p[(b, c, d)]) * p3
            )
            / w4p[(b, c, d)]
            if w4p.get((b, c, d), 0) > 0
            else p3
        )
        if cabp.get((a, b, c, d), 0) > 0:
            return math.log(
                (max(c5p.get(p, 0) - D, 0.0) + D * nabp[(a, b, c, d)] * p4)
                / cabp[(a, b, c, d)]
            )
        return math.log(p4)

    lpu_f = {p: _half_away_micro(full_lp(p)) for p in c5}
    lpu_p = {p: _half_away_micro(pruned_lp(p)) for p in c5}
    minu, maxu = min(lpu_p.values()), max(lpu_p.values())
    span = maxu - minu

    def quant(v):
        if span == 0:
            return minu
        b = (2 * (v - minu) * 255 + span) // (2 * span)
        return minu + (2 * b * span + 255) // (2 * 255)

    lpu_q = {p: quant(v) for p, v in lpu_p.items()}
    out: dict = {}
    for g, p in pens:
        s = out.setdefault(g, [0, 0, 0, 0, set()])
        s[0] += lpu_f[p]
        s[1] += lpu_p[p]
        s[2] += lpu_q[p]
        s[3] += 1
    docs: dict = {}
    for gi, (g, text) in enumerate(rows):
        if len(text.split()) >= 5:
            docs.setdefault(g, set()).add(gi)
    return {
        g: (
            len(docs[g]),
            n,
            (-sf) // n,
            (-sp) // n,
            (-sq) // n,
            len(c5),
            len(c5p),
        )
        for g, (sf, sp, sq, n, _) in out.items()
    }


def test_pruned_delta_matches_naive_reference(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        kn_5gram_pruned_delta_by_group,
    )

    base = "the cat sat on the mat by the door"
    rows = [
        ("a", base),
        ("a", base),  # repeats: these 5-grams survive min_count=2
        ("a", "the cat ate the food on the mat"),
        ("a", "the cat ate the food on the mat"),
        ("b", base),
        ("b", "zulu yankee xray whiskey victor uniform tango"),  # all
        # singleton grams AND unique vocabulary: pruned away entirely,
        # so scoring hits the unseen-token floor at the unigram level
        ("b", "a dog sat on the mat by the door"),  # singleton grams over
        # SHARED vocabulary: mid-level backoff fallbacks
    ]
    naive = _naive_kn5_pruned(rows)
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    out = kn_5gram_pruned_delta_by_group(df, min_count=2)
    got = {
        r.g: (
            r.n_docs, r.n_5grams, r.nll_full, r.nll_pruned,
            r.nll_pruned_q8, r.n_model_full, r.n_model_pruned,
        )
        for r in out.collect()
    }
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got == naive
    # pruning provably moved backoff mass: model shrank and the pruned
    # perplexity differs from full on both slices
    for g in got:
        assert got[g][6] < got[g][5]
        assert got[g][3] != got[g][2]


def test_mkn_quantized_error_bounded_by_bin_width(spark):
    """The 255-bin integer cache can move a score by at most half a bin
    (encode) plus half a bin (decode rounding) — pin |q - p| <= span/255
    + 1 micro per distinct gram, and that the per-slice quantized NLL
    stays within one bin width of full precision."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        _mkn5_score_parts,
        mkn_5gram_quantized_delta_by_group,
    )
    from pyspark.sql import functions as F

    rows = [
        ("a", "the cat sat on the mat by the door"),
        ("a", "the cat ate the food on the mat"),
        ("b", "a dog sat on the mat by the door"),
        ("b", "the cat sat on the mat by the door"),
    ]
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    gpg, ndocs, g5, lpu = _mkn5_score_parts(df)
    scores = [r.lpu for r in lpu.collect()]
    gpg.unpersist()
    g5.unpersist()
    span = max(scores) - min(scores)
    bin_w = span / 255 if span else 0.0

    out = mkn_5gram_quantized_delta_by_group(df)
    got = {r.g: (r.nll_mkn, r.nll_mkn_q8, r.n_model) for r in out.collect()}
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got["a"][2] == got["b"][2] == len(scores)
    for g in got:
        assert abs(got[g][0] - got[g][1]) <= bin_w + 1, (g, got[g], bin_w)
