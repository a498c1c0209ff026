"""TF-IDF / BM25 (operators/text_rank.py) and PII redaction units."""

import math

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.text import redact_pii
from azure_medicine_data_engineering_spark.operators.text_rank import (
    bm25_scores,
    tfidf,
    tfidf_top_terms,
)

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple cherry cherry date"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tfidf_matches_hand_computation(spark):
    rows = {
        (r.doc_id, r.term): (r.tf, r.tfidf)
        for r in tfidf(_docs(spark)).collect()
    }
    # 'apple' appears in 2 of 3 docs; doc 1 has tf=2
    idf_apple = math.log(4.0 / 3.0) + 1.0
    tf_, w = rows[(1, "apple")]
    assert tf_ == 2
    assert abs(w - 2 * idf_apple) < 1e-12
    # 'date' appears once in one doc: highest idf
    idf_date = math.log(4.0 / 2.0) + 1.0
    assert abs(rows[(3, "date")][1] - idf_date) < 1e-12


def test_tfidf_top_terms_rank_and_tiebreak(spark):
    out = tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 2: banana and cherry tie on tf=1, df=2 → term asc breaks the tie
    assert sorted(by_doc[2]) == [(1, "banana"), (2, "cherry")]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_bm25_prefers_matching_docs(spark):
    scored = {
        r.doc_id: r.bm25
        for r in bm25_scores(_docs(spark), ["cherry"]).collect()
    }
    assert set(scored) == {2, 3}  # doc 1 has no 'cherry' → absent
    # doc 3 has tf=2 but is twice as long; doc 2 (tf=1, short) still loses
    # to the double occurrence under k1=1.2, b=0.75
    assert scored[3] > scored[2] > 0


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [("reach me at bob.smith+x@corp.io or 555-123-4567, "
          "card 4111111111111111 thanks",)],
        "t string",
    )
    red = df.select(redact_pii(F.col("t")).alias("r")).head().r
    assert "[EMAIL]" in red and "[PHONE]" in red and "[CARD]" in red
    assert "bob" not in red and "4111" not in red and "555-123" not in red


def test_redact_pii_leaves_clean_text_alone(spark):
    df = spark.createDataFrame(
        [("v2.0 shipped on 2024-01-01 with 16 fixes",)], "t string"
    )
    assert df.select(redact_pii(F.col("t")).alias("r")).head().r == (
        "v2.0 shipped on 2024-01-01 with 16 fixes"
    )


def test_bigram_logprob_flags_shuffled_order(spark):
    """A document with plausible unigrams but shuffled word order must
    score more surprising under the bigram model than fluent text —
    the exact failure mode unigram scoring cannot see."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.text_rank import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    shuffled = "mat the on dog sat the the rug and cat on the sat"  # same bag
    background = [
        (i, fluent) for i in range(10, 30)
    ]  # corpus dominated by the fluent pattern
    df = spark.createDataFrame(
        [(1, fluent), (2, shuffled)] + background, "doc_id long, text string"
    )
    bg = {r.doc_id: r.mean_neg_logprob for r in bigram_logprob_scores(df).collect()}
    ug = {r.doc_id: r.mean_neg_logprob for r in unigram_logprob_scores(df).collect()}
    assert bg[2] > bg[1]                      # bigram model catches it
    assert abs(ug[2] - ug[1]) < 1e-6          # unigram model cannot


def test_dsir_weights_rank_target_like_docs_first(spark):
    # target slice speaks "alpha"; raw background speaks "omega". A held-out
    # alpha-speaking doc must outweigh an omega doc under the target model.
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        dsir_importance_weights,
    )
    from pyspark.sql import functions as F

    rows = []
    for i in range(20):
        rows.append((i, "alpha beta alpha gamma", True))
    for i in range(20, 60):
        rows.append((i, "omega psi omega chi", False))
    rows.append((100, "alpha beta gamma alpha", False))  # target-like, not in slice
    rows.append((101, "omega chi psi omega", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    w = {
        r.doc_id: r.logw_u
        for r in dsir_importance_weights(df, F.col("tgt"), n_buckets=64).collect()
    }
    assert w[100] > w[101]
    # weights are exact integers; same text => same weight
    assert w[0] == w[1]


def test_quality_quantile_gate_keeps_top_slice(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        quality_quantile_gate,
    )

    # 40 docs per lang with increasing length -> monotone quality
    rows = [
        (lang_i * 100 + i, " ".join(["the word"] * (i + 1)), lang)
        for lang_i, lang in enumerate(["aa", "bb"])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_quantile_gate(df, q=0.75, cache=False)
    got = {r.lang: r for r in out.collect()}
    for lang in ("aa", "bb"):
        r = got[lang]
        assert r.n_docs == 40
        # ~top quarter survives (bin-edge rounding gives a small band)
        assert 8 <= r.n_kept <= 14
        assert abs(r.kept_frac - r.n_kept * 1_000_000 // 40 / 1e6) < 1e-9


def test_calibration_bins_planted(spark):
    """Perfectly calibrated planted scores: bin b gets docs with
    prob (b+0.5)/8 and a positive fraction equal to that prob -> every
    bin's mean_prob equals its pos_rate on the shared grids."""
    from pyspark.sql import functions as F  # noqa: F401

    from azure_medicine_data_engineering_spark.operators.text_rank import (
        calibration_bins,
    )

    rows = []
    for b in range(8):
        p = (b + 0.5) / 8  # 0.0625, 0.1875, ... exactly on the 1e-4 grid
        n = 16
        pos = round(p * n)
        for i in range(n):
            rows.append((p, i < pos))
    df = spark.createDataFrame(rows, "prob double, y boolean")
    got = {r["bin"]: r for r in calibration_bins(df, "prob", "y", 8).collect()}
    assert set(got) == set(range(8))
    for b, r in got.items():
        assert r["n_docs"] == 16
        assert r["mean_prob"] == (b + 0.5) / 8
        assert r["n_pos"] == round((b + 0.5) / 8 * 16)
        assert abs(r["pos_rate"] - r["n_pos"] / 16) < 1e-6
    # prob == 1.0 clamps into the top bin
    df2 = spark.createDataFrame([(1.0, True)], "prob double, y boolean")
    assert calibration_bins(df2, "prob", "y", 8).collect()[0]["bin"] == 7


def test_zipf_fit_planted_power_law(spark):
    """Planted exact power law freq = round(1000 / rank): the fitted
    slope must land near -1; a flat (uniform-frequency) corpus fits
    slope 0."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        zipf_fit,
    )

    words = []
    for r in range(1, 51):
        words.extend([f"w{r:03d}"] * max(1, round(1000 / r)))
    df = spark.createDataFrame(
        [(" ".join(words),)], "text string"
    )
    got = zipf_fit(df, top_k=50).collect()[0]
    assert got["n_top"] == 50
    assert -1.1 < got["slope"] < -0.9

    flat = spark.createDataFrame(
        [((" ".join(f"t{i}" for i in range(40)) + " ") * 3,)], "text string"
    )
    g2 = zipf_fit(flat, top_k=40).collect()[0]
    assert abs(g2["slope"]) < 0.05


def test_heaps_fit_sublinear_vs_linear(spark):
    """Repeating a fixed vocabulary saturates (beta ~ 0); all-unique
    serial tokens grow linearly (beta ~ 1)."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        heaps_law_fit,
    )

    vocab = [f"w{i}" for i in range(30)]
    sat = spark.createDataFrame(
        [(d, " ".join(vocab)) for d in range(40)], "doc_id long, text string"
    )
    b_sat = heaps_law_fit(sat).collect()[0]["beta"]
    assert b_sat < 0.15

    lin = spark.createDataFrame(
        [(d, " ".join(f"u{d}x{i}" for i in range(20))) for d in range(40)],
        "doc_id long, text string",
    )
    b_lin = heaps_law_fit(lin).collect()[0]["beta"]
    assert b_lin > 0.9


def test_gains_table_decile_partition(spark):
    """The composite-key deciles must partition rows near-evenly and the
    cumulative capture must be monotone to 1.0 (gate-level invariants;
    the value-exactness is the oracle's job)."""
    import __spark_entry__ as m

    df = m.queries()["gains_table_quality_scores"](spark, "/root/testdata/sf0.001")
    rows = sorted((r["decile"], r) for r in df.collect())
    assert [d for d, _ in rows] == list(range(1, 11))
    n_total = sum(r["n_docs"] for _, r in rows)
    assert all(abs(r["n_docs"] - n_total / 10) <= 1 for _, r in rows)
    caps = [r["cum_capture"] for _, r in rows]
    assert all(a <= b for a, b in zip(caps, caps[1:]))
    assert caps[-1] == 1.0
