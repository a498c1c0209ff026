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
