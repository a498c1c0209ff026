"""Kneser-Ney trigram pins: naive-Python reference (half-away micro
rounding, per CLAUDE.md mirror-oracle blind-spot rule) and the
shuffled-order detection that unigram scoring provably cannot see."""

import math

from azure_medicine_data_engineering_spark.operators.text_rank import (
    kn_trigram_logprob_by_group,
    unigram_logprob_scores,
)


def _half_away_micro(x: float) -> int:
    scaled = x * 1e6
    return math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)


def _naive_kn_by_group(rows: list[tuple[str, str]], d: float = 0.75):
    """rows = (group, text). Interpolated KN trigram, corpus-self,
    interior trigrams, from first principles (dicts and sets only)."""
    tris = []  # (g, (a, b, c))
    for g, text in rows:
        w = text.split()
        for i in range(len(w) - 2):
            tris.append((g, (w[i], w[i + 1], w[i + 2])))
    c3: dict = {}
    for _, t in tris:
        c3[t] = c3.get(t, 0) + 1
    cab: dict = {}
    nab: dict = {}
    bc_set = set()
    for (a, b, c), n in c3.items():
        cab[(a, b)] = cab.get((a, b), 0) + n
        nab[(a, b)] = nab.get((a, b), 0) + 1
        bc_set.add((b, c))
    nbc: dict = {}
    nbb: dict = {}
    nbl_set: dict = {}
    for (a, b, c) in c3:
        nbc[(b, c)] = nbc.get((b, c), 0) + 1
        nbb[b] = nbb.get(b, 0) + 1
        nbl_set.setdefault(b, set()).add(c)
    n1c: dict = {}
    for b, c in bc_set:
        n1c[c] = n1c.get(c, 0) + 1
    nal = len(bc_set)
    out: dict = {}
    for g, (a, b, c) in tris:
        p3 = n1c[c] * 1.0 / nal
        p2 = (max(nbc[(b, c)] - d, 0.0) + d * len(nbl_set[b]) * p3) / nbb[b]
        p = (max(c3[(a, b, c)] - d, 0.0) + d * nab[(a, b)] * p2) / cab[(a, b)]
        lpu = _half_away_micro(math.log(p))
        s = out.setdefault(g, [0, 0, set()])
        s[0] += lpu
        s[1] += 1
    docs: dict = {}
    for gi, (g, text) in enumerate(rows):
        if len(text.split()) >= 3:
            docs.setdefault(g, set()).add(gi)
    return {
        g: (len(docs[g]), n, (-slpu) // n) for g, (slpu, n, _) in out.items()
    }


def test_matches_naive_reference(spark):
    rows = [
        ("a", "the cat sat on the mat"),
        ("a", "the cat ate the food"),
        ("a", "a dog sat on the mat"),
        ("b", "mat the on sat cat the"),
        ("b", "food the ate cat the"),
        ("b", "short"),  # < 3 tokens: contributes nothing
    ]
    df = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    got = {
        r.g: (r.n_docs, r.n_trigrams, r.nll_micro)
        for r in kn_trigram_logprob_by_group(df).collect()
    }
    want = _naive_kn_by_group(rows)
    assert got == want


def test_router_delta_flags_shuffled_doc_as_kn_stricter(spark):
    """The planted shuffled-order doc keeps its unigram bucket (same token
    multiset as the dominant phrasing) but the KN trigram routes it to a
    worse tercile — it shows up in n_kn_stricter, nowhere else."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        ccnet_router_model_delta,
    )

    nat = "the quick brown fox jumps over the lazy dog near the old barn"
    toks = nat.split()
    shuf = " ".join(toks[::-1][3:] + toks[::-1][:3])
    alt = "a calm red hen walks under a tall tree by a deep well today"
    rows = (
        [(i, "s", nat) for i in range(10)]
        + [(50 + i, "s", alt) for i in range(10)]
        + [(100, "s", shuf)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.g: r for r in ccnet_router_model_delta(df).collect()}
    r = out["s"]
    assert r.n_docs == 21
    assert r.n_kn_stricter >= 1  # the scrambled doc moved down
    assert r.n_same + r.n_kn_stricter + r.n_kn_looser == r.n_docs


def test_shuffled_order_detected_where_unigram_is_blind(spark):
    """Source 'shuf' holds the SAME token multiset as 'nat' but with word
    order scrambled: unigram NLL is identical by construction, the KN
    trigram NLL strictly separates them."""
    nat = "the quick brown fox jumps over the lazy dog near the old barn"
    toks = nat.split()
    # deterministic derangement-ish shuffle (reverse + rotate)
    shuf = " ".join(toks[::-1][3:] + toks[::-1][:3])
    assert sorted(shuf.split()) == sorted(toks)
    # the natural phrasing dominates the corpus (as in a real crawl);
    # the scrambled doc is the rare outlier the router must flag
    rows = [(i, "nat", nat) for i in range(20)] + [(100, "shuf", shuf)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kn = {r.g: r.nll_micro for r in kn_trigram_logprob_by_group(df).collect()}
    assert kn["shuf"] > kn["nat"]
    uni = unigram_logprob_scores(df, cache=False)
    per_doc = {r.doc_id: r.mean_neg_logprob for r in uni.collect()}
    assert per_doc[0] == per_doc[100]  # unigram cannot tell them apart
