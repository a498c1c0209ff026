"""Fuzzy-dedup recall validation: planted near-duplicates at graded
similarity levels must be recalled by MinHash-LSH (k=8, bands=4 → rows=2) at
the rate the banding S-curve predicts: P(candidate | jaccard=s) = 1-(1-s²)⁴.

The probability is over document content (the hash family is fixed and
deterministic), so we plant many independent pairs per mutation level and
compare the empirical candidate rate against the mean theoretical hit
probability computed from each pair's *measured* shingle Jaccard.
"""

import random

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators import dedup

K, BANDS = 8, 4
ROWS = K // BANDS
N_PAIRS = 120
MUTATION_LEVELS = [0.02, 0.1, 0.2, 0.35, 0.6]
TOLERANCE = 0.18  # ~4σ at 120 pairs/level


def _theory(s: float) -> float:
    return 1.0 - (1.0 - s**ROWS) ** BANDS


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(20260813)
    vocab = [f"tok{i}" for i in range(4000)]
    rows, pairs = [], []
    pid = 0
    for mut_frac in MUTATION_LEVELS:
        for _ in range(N_PAIRS):
            base = [rng.choice(vocab) for _ in range(60)]
            dup = list(base)
            for p in rng.sample(range(60), int(60 * mut_frac)):
                dup[p] = rng.choice(vocab)
            rows.append((pid, " ".join(base)))
            rows.append((pid + 1, " ".join(dup)))
            pairs.append((pid, pid + 1, mut_frac))
            pid += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pair_df = spark.createDataFrame(
        [(a, b) for a, b, _ in pairs], "id_a long, id_b long"
    )
    candidates = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(docs, k=K, bands=BANDS).collect()
    }
    jaccard = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, pair_df).collect()
    }
    return pairs, candidates, jaccard


def test_recall_matches_banding_s_curve(planted):
    pairs, candidates, jaccard = planted
    for mut_frac in MUTATION_LEVELS:
        level = [(a, b) for a, b, m in pairs if m == mut_frac]
        empirical = sum((a, b) in candidates for a, b in level) / len(level)
        expected = sum(_theory(jaccard[(a, b)]) for a, b in level) / len(level)
        assert abs(empirical - expected) <= TOLERANCE, (
            f"mut={mut_frac}: empirical recall {empirical:.3f} vs "
            f"S-curve {expected:.3f}"
        )


def test_recall_is_monotone_in_similarity(planted):
    pairs, candidates, _ = planted
    rates = []
    for mut_frac in MUTATION_LEVELS:  # increasing mutation → decreasing sim
        level = [(a, b) for a, b, m in pairs if m == mut_frac]
        rates.append(sum((a, b) in candidates for a, b in level) / len(level))
    assert rates[0] > 0.95  # near-identical docs must be caught
    assert all(a >= b - 0.05 for a, b in zip(rates, rates[1:]))  # monotone-ish


def test_high_similarity_pairs_survive_verification(planted):
    pairs, candidates, jaccard = planted
    # every candidate pair with verified jaccard >= 0.8 would be kept by the
    # end-to-end dedup at threshold 0.8 — and none are false positives
    strong = [(a, b) for a, b, m in pairs if m == MUTATION_LEVELS[0]]
    caught = [p for p in strong if p in candidates]
    assert all(jaccard[p] >= 0.8 for p in caught)


def test_simhash_near_pairs_equals_brute_force(spark):
    # banding (4 chunks of 15 bits) must have EXACT recall at hamming <= 3:
    # the banded operator's output equals the brute-force all-pairs answer.
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(40):
        base = [rng.choice(vocab) for _ in range(50)]
        rows.append((2 * i, " ".join(base)))
        dup = list(base)
        for p in rng.sample(range(50), rng.choice([0, 0, 1, 2])):
            dup[p] = rng.choice(vocab)
        rows.append((2 * i + 1, " ".join(dup)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    sk = {r.doc_id: r.simhash for r in docs.select(
        "doc_id", dedup.simhash60(F.col("text")).alias("simhash")).collect()}
    ids = sorted(sk)
    want = {
        (a, b, bin(sk[a] ^ sk[b]).count("1"))
        for ai, a in enumerate(ids)
        for b in ids[ai + 1:]
        if bin(sk[a] ^ sk[b]).count("1") <= 3
    }
    assert got == want
    assert want, "fixture must plant at least one near pair"


def test_typo_pairs_exact_recall_at_distance_one(spark):
    # substitutions, insertions, deletions at every position must be found;
    # distance-2 variants must not
    base = ["spark", "engine", "lineitem", "q"]
    variants = []
    for w in base:
        for i in range(len(w)):
            variants.append(w[:i] + "@" + w[i + 1:])  # substitution
            variants.append(w[:i] + w[i + 1:])        # deletion
        for i in range(len(w) + 1):
            variants.append(w[:i] + "z" + w[i:])      # insertion
    far = ["spXXk", "enginZZ", "totally_different"]
    vocab = sorted(set(base + variants + far) - {""})
    df = spark.createDataFrame([(t,) for t in vocab], "token string")
    got = {(r.tok_a, r.tok_b) for r in dedup.typo_pairs(df, "token").collect()}

    def lev(a, b):
        import itertools
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        (a, b)
        for ai, a in enumerate(vocab)
        for b in vocab[ai + 1:]
        if lev(a, b) <= 1
    }
    assert got == want  # exact recall AND no false pairs


def test_simhash_near_pairs_rejects_bad_params():
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(None, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(None, bands=7)


def test_semantic_dedup_drops_planted_near_duplicates(spark):
    # two tight bundles of near-identical vectors + isolated randoms:
    # every bundle keeps exactly its lowest id, isolated vectors all keep
    from azure_medicine_data_engineering_spark.operators.dedup import (
        semantic_dedup_flags,
    )

    rows = []
    for i in range(4):  # bundle A: ids 0..3, nearly parallel
        rows.append((i, [10.0 + 0.001 * i] + [1.0] * 7))
    for i in range(4):  # bundle B: ids 10..13
        rows.append((10 + i, [1.0] * 7 + [10.0 + 0.001 * i]))
    # isolated: orthogonal-ish one-hot directions
    for j in range(4):
        v = [0.0] * 8
        v[j + 2] = 5.0
        v[(j + 5) % 8] = -3.0
        rows.append((20 + j, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup_flags(df, k=2, iterations=2, threshold=0.95).collect()
    }
    assert out[0].keep and not any(out[i].keep for i in (1, 2, 3))
    assert out[10].keep and not any(out[i].keep for i in (11, 12, 13))
    for j in range(4):
        assert out[20 + j].n_near_lower == 0 and out[20 + j].keep


def test_source_overlap_matrix_planted(spark):
    from azure_medicine_data_engineering_spark.operators.dedup import (
        source_overlap_matrix,
    )

    rows = [
        (1, "shared text one", "A"),
        (2, "shared text one", "B"),     # A-B overlap
        (3, "shared text two", "A"),
        (4, "shared text two", "C"),     # A-C overlap
        (5, "only in b", "B"),
        (6, "only in c", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_overlap_matrix(df, cache=False)
    got = {(r.source_a, r.source_b): (r.n_shared, r.n_a, r.n_b, r.jaccard)
           for r in out.collect()}
    # A holds 2 distinct contents, B 2, C 2; A∩B = A∩C = 1, B∩C = 0 (absent)
    assert got == {
        ("A", "B"): (1, 2, 2, 0.333333),
        ("A", "C"): (1, 2, 2, 0.333333),
    }


def test_edit_distance_near_pairs_planted(spark):
    from azure_medicine_data_engineering_spark.operators.dedup import (
        edit_distance_near_pairs,
    )

    words = [f"word{i}" for i in range(30)]
    base = " ".join(words)
    rows = [
        (1, base, ),
        (2, base.replace("word15", "word1x"), ),        # 1 keystroke in 30 words
        (3, " ".join(f"other{i}" for i in range(30)), ),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r for r in
           edit_distance_near_pairs(df, max_ratio_micro=300_000).collect()}
    assert (1, 2) in got
    assert got[(1, 2)].edit_distance == 1
    assert all(k == (1, 2) for k in got)   # doc 3 never survives the verify


def test_containment_quote_vs_jaccard(spark):
    """A short doc quoted inside a long one: containment of the short
    side is 1.0 while symmetric Jaccard would be tiny — the signal this
    operator exists for."""
    from azure_medicine_data_engineering_spark.operators.dedup import (
        containment_top_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler[::1])],
        "doc_id long, text string",
    )
    r = containment_top_pairs(df, top_k=5).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    assert row["containment_a"] == 1.0       # every shingle of the quote is in 2
    assert row["containment_b"] < 0.1        # Jaccard-style signal would vanish


# ---------------------------------------------------------------------------
# Round 13: per-bucket pair-emission cap + representatives-only mode.
# ---------------------------------------------------------------------------


def test_capped_pairs_mega_bucket_star(spark):
    """A planted 12-clone family (one LSH mega-bucket per band, C(12,2)=66
    pairs uncapped) must, under cap=5, emit EXACTLY the five lexicographic
    lowest-id-star pairs — bounded volume, deterministic selection, and the
    family stays connected through the representative."""
    words = " ".join(f"w{i}" for i in range(30))
    rows = [(i, words) for i in range(12)]
    # an unrelated singleton that must be unaffected by the cap
    rows.append((99, " ".join(f"z{i}" for i in range(30))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.minhash_dedup_pairs(
        docs, k=K, bands=BANDS, max_pairs_per_bucket=5
    )
    got = sorted((r.id_a, r.id_b) for r in capped.collect())
    assert got == [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]
    uncapped = dedup.minhash_dedup_pairs(docs, k=K, bands=BANDS)
    assert uncapped.count() == 66


def test_capped_pairs_small_buckets_noop(spark):
    """Buckets with C(n,2) <= cap emit in full — the cap only truncates
    pathological buckets."""
    words = " ".join(f"w{i}" for i in range(30))
    rows = [(i, words) for i in range(3)]  # C(3,2) = 3 pairs
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.minhash_dedup_pairs(
        docs, k=K, bands=BANDS, max_pairs_per_bucket=3
    )
    assert sorted((r.id_a, r.id_b) for r in capped.collect()) == [
        (0, 1), (0, 2), (1, 2),
    ]


def test_lsh_bucket_representatives_one_hop(spark):
    """Representatives mode: every member of a clone family maps to the
    family's min id with zero pair emission; singletons represent
    themselves."""
    words = " ".join(f"w{i}" for i in range(30))
    rows = [(i, words) for i in range(5, 12)]
    rows.append((99, " ".join(f"z{i}" for i in range(30))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.lsh_bucket_representatives(docs, k=K, bands=BANDS)
    got = {r.doc_id: (r.rep_id, r.is_representative) for r in out.collect()}
    for c in getattr(out, "_stage_caches", []):
        c.unpersist()
    assert got[99] == (99, True)
    assert got[5] == (5, True)
    for i in range(6, 12):
        assert got[i] == (5, False)
