"""Corpus-pipeline operators: chunking, repetition signals, decontamination."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.chunking import chunk_documents
from azure_medicine_data_engineering_spark.operators.contamination import (
    ngram_contamination,
)
from azure_medicine_data_engineering_spark.operators.repetition import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_exact_windows(spark):
    # 10 tokens, size 4, overlap 1 -> stride 3 -> chunks at 0,3,6 cover
    # through token 9 (last chunk exactly fills), n_chunks = (10-4+2)//3+1 = 3
    text = " ".join(f"t{i}" for i in range(10))
    rows = chunk_documents(
        _docs(spark, [(1, text)]), chunk_size=4, overlap=1
    ).orderBy("chunk_id").collect()
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[1]["chunk_text"] == "t3 t4 t5 t6"
    assert rows[2]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["n_chunk_tokens"] == 4 for r in rows)


def test_chunking_short_doc_single_chunk(spark):
    rows = chunk_documents(
        _docs(spark, [(1, "a b"), (2, "x")]), chunk_size=4, overlap=1
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 2
    assert by_id[1]["chunk_text"] == "a b" and by_id[1]["n_chunk_tokens"] == 2
    assert by_id[2]["chunk_text"] == "x"


def test_chunking_ragged_tail(spark):
    # 11 tokens, size 4, stride 3 -> starts 0,3,6,9; last chunk has 2 tokens
    text = " ".join(f"t{i}" for i in range(11))
    rows = chunk_documents(
        _docs(spark, [(1, text)]), chunk_size=4, overlap=1
    ).orderBy("chunk_id").collect()
    assert len(rows) == 4
    assert rows[-1]["chunk_text"] == "t9 t10" and rows[-1]["n_chunk_tokens"] == 2


def test_chunking_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_size=4, overlap=4)


def test_repetition_signals_extremes(spark):
    rows = repetition_stats(
        _docs(
            spark,
            [
                (1, "spam spam spam spam spam spam"),  # total repetition
                (2, "one two three four five six"),  # no repetition
                (3, "ab ab cd"),  # top 2-gram 'ab ab' ties handled
            ],
        )
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["top2_frac"] == 1.0
    assert by_id[1]["dup5_frac"] == 1.0
    assert by_id[1]["dup_tok_frac"] == 1.0
    assert by_id[2]["dup_tok_frac"] == 0.0
    assert by_id[2]["dup5_frac"] == 0.0
    # doc 2: each 2-gram unique -> top mass = its own chars / total
    assert 0 < by_id[2]["top2_frac"] < 1
    # doc 3: 2-grams are 'ab ab', 'ab cd' (each once): tie -> argmax picks
    # the lexicographically greatest gram; doc too short for any 5-gram
    assert by_id[3]["dup5_frac"] is None
    assert by_id[3]["dup_tok_frac"] == 0.6667  # round(2/3, 4), half-away


def test_contamination_counts_and_verdicts(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # shares 'alpha beta gamma' + 'beta gamma delta'
            (2, "eps zeta eta theta"),  # clean
        ],
    )
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    rows = ngram_contamination(train, bench, n=3).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["shared_ngrams"] == 2 and by_id[1]["contaminated"]
    assert by_id[2]["shared_ngrams"] == 0 and not by_id[2]["contaminated"]


def test_contamination_big_side_never_shuffles_for_join(spark):
    train = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)])
    bench = _docs(spark, [(999, "w1 w2 w3 w4")])
    plan = (
        ngram_contamination(train, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the benchmark gram set is broadcast: the join on `gram` (the one that
    # touches the full training corpus) must never sort-merge. The final
    # doc_id left join attaching zero-counts to clean docs may shuffle —
    # it carries (id, count) pairs, not text.
    assert "BroadcastHashJoin [gram" in plan
    assert "SortMergeJoin [gram" not in plan


def test_quota_sample_mixture_and_determinism(spark):
    from azure_medicine_data_engineering_spark.operators.sampling import quota_sample

    rows = [(i, "a" if i < 800 else ("b" if i < 900 else "c")) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, dom string")
    targets = {"a": 0.5, "b": 0.5}  # c is dropped entirely
    kept = quota_sample(df, key="id", strata_col="dom", targets=targets)
    counts = {
        r["dom"]: r["n"]
        for r in kept.groupBy("dom").agg(F.count("id").alias("n")).collect()
    }
    assert "c" not in counts
    # feasible total = min(800/.5, 100/.5) = 200 -> ~100 of each stratum
    # (hash-bucket sampling error is O(total/buckets))
    assert abs(counts["a"] - 100) <= 15 and abs(counts["b"] - 100) <= 15
    # deterministic: same rows on re-evaluation
    ids1 = sorted(r["id"] for r in kept.collect())
    ids2 = sorted(r["id"] for r in quota_sample(df, "id", "dom", targets).collect())
    assert ids1 == ids2


def test_quota_sample_infeasible_mixture(spark):
    """A target stratum with zero rows: strict (default) fails loudly;
    strict=False returns the only mixture-preserving corpus — the empty
    one (the e2e funnel's report-the-empty-stage contract, forced by the
    10x replica where contamination emptied the final stage)."""
    import pytest as _pytest

    from azure_medicine_data_engineering_spark.operators.sampling import quota_sample

    rows = [(i, "a") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, dom string")
    targets = {"a": 0.5, "missing": 0.5}
    with _pytest.raises(ValueError, match="absent from input"):
        quota_sample(df, "id", "dom", targets)
    out = quota_sample(df, "id", "dom", targets, strict=False)
    assert out.count() == 0


def _vec_rows(base, n, dim=16, off=0.0):
    return [(base + i, [float(((base + i) * 7 + j) % 5) + off for j in range(dim)]) for i in range(n)]


def test_pq_codebook_and_codes_shape(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import pq_train_codes

    df = spark.createDataFrame(_vec_rows(0, 24), "vec_id long, embedding array<double>")
    codebook, codes, sub = pq_train_codes(df, m=4, dsub=4, ksub=4)
    cb = codebook.collect()
    assert len(cb) == 4 * 4  # every (subspace, cid) has id-seeded members
    assert all(len(r["centroid"]) == 4 for r in cb)
    cd = codes.collect()
    assert len(cd) == 24 * 4  # one code per (vector, subspace)
    assert all(0 <= r["code"] < 4 for r in cd)
    sub.unpersist()


def test_pq_adc_exact_duplicate_ranks_first(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import pq_adc_topk

    # ids 0..15: one tight cluster around the query; id 20 is an exact
    # duplicate of query 0; ids 30..45 are a far-away cluster
    near = [(i, [float((i * 3 + j) % 4) for j in range(16)]) for i in range(16)]
    dup = [(20, near[0][1])]
    far = [(30 + i, [50.0 + ((i + j) % 3) for j in range(16)]) for i in range(16)]
    df = spark.createDataFrame(near + dup + far, "vec_id long, embedding array<double>")
    rows = (
        pq_adc_topk(df, query_ids=[0], k=40, m=4, dsub=4, ksub=4)
        .orderBy("rnk")
        .collect()
    )
    by_id = {r["neighbor_id"]: r for r in rows}
    # the exact duplicate shares every code with the query, and the query's
    # chosen code minimizes each subspace table entry — so the duplicate
    # attains the global ADC minimum (same-code near vectors tie with it;
    # quantized distances cannot separate same-code vectors)
    assert by_id[20]["approx_dist"] == rows[0]["approx_dist"]
    # the far cluster never outranks the near one
    near_ranks = [r["rnk"] for r in rows if r["neighbor_id"] < 30]
    far_ranks = [r["rnk"] for r in rows if r["neighbor_id"] >= 30]
    assert max(near_ranks) < min(far_ranks)


def test_pq_distance_table_is_broadcast(spark):
    from azure_medicine_data_engineering_spark.operators.similarity import pq_adc_topk

    df = spark.createDataFrame(_vec_rows(0, 32), "vec_id long, embedding array<double>")
    plan = (
        pq_adc_topk(df, query_ids=[0, 1], k=3, m=4, dsub=4, ksub=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the per-query distance table joins the code stream broadcast-side
    assert "BroadcastHashJoin" in plan


def test_duplicate_window_spans_planted(spark):
    from azure_medicine_data_engineering_spark.operators.dedup import (
        duplicate_window_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            (1, shared + " unique one tail here now extra pad"),
            (2, "prefix words here " + shared),
            (3, "totally different content with no repeats at all whatsoever"),
            (4, "short"),  # < w tokens -> zero windows
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_window_spans(df, w=8).collect()}
    assert out[1].n_dup_windows >= 1 and out[2].n_dup_windows >= 1
    assert out[3].n_dup_windows == 0 and out[3].n_windows > 0
    assert out[4].n_windows == 0 and out[4].dup_frac is None
    # doc 1 and 2 share exactly the one 8-token window
    assert out[1].n_dup_windows == 1 and out[2].n_dup_windows == 1


def test_incremental_dedup_flags_planted(spark):
    from azure_medicine_data_engineering_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the patient brown "
        "fox waits beside the quiet river bank watching silver fish swim past "
        "the mossy stones under the old wooden bridge near town"
    )
    corpus = spark.createDataFrame(
        [(10, base), (11, "entirely unrelated corpus document about spark plans")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),                       # exact (and near) duplicate
            (101, base + " with a tiny suffix change"),  # near duplicate
            (102, "fresh novel content that matches nothing in the corpus"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup_flags(new, corpus, threshold=0.5).collect()}
    assert out[100].exact_dup and out[100].near_dup
    assert not out[101].exact_dup and out[101].near_dup
    assert not out[102].exact_dup and not out[102].near_dup
    assert len(out) == 3


def test_unigram_logprob_orders_rare_docs_higher(spark):
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        unigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "common common rareword common"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    # the doc containing the rare token must score more surprising
    assert out[2].mean_neg_logprob > out[1].mean_neg_logprob
    assert out[1].n_tokens == 4 and out[2].n_tokens == 4


def test_pack_token_sequences_invariant_to_bucketing(spark):
    """The two-phase prefix sum must produce the SAME packing for any
    bucket width (the decomposition is an implementation detail), and
    offsets must tile the token stream contiguously."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.chunking import (
        pack_token_sequences,
    )

    df = spark.range(537).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("chunk_id"),
        (F.col("id") % 37 + 1).cast("int").alias("n_chunk_tokens"),
    )
    a = pack_token_sequences(df, budget=128, bucket_width=100)
    b = pack_token_sequences(df, budget=128, bucket_width=7)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    # offsets in range; global stream tiles: excl positions are the running sum
    total = df.agg(F.sum("n_chunk_tokens")).first()[0]
    assert all(0 <= r[4] < 128 for r in rows_a)
    last = rows_a[-1]
    assert last[3] == (total - last[2]) // 128  # final chunk's seq matches total


def test_pack_token_sequences_property_fuzz(spark):
    """Hypothesis fuzz over random token-length profiles: the two-phase
    prefix sum must equal the flat cumulative sum for every profile and
    bucket width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.chunking import (
        pack_token_sequences,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
        width=st.integers(min_value=1, max_value=25),
        budget=st.integers(min_value=16, max_value=1024),
    )
    def check(toks, width, budget):
        df = spark.createDataFrame(
            [(i, 0, t) for i, t in enumerate(toks)],
            "doc_id long, chunk_id int, n_chunk_tokens int",
        )
        got = {
            r.doc_id: (r.seq_id, r.seq_offset)
            for r in pack_token_sequences(
                df, budget=budget, bucket_width=width
            ).collect()
        }
        run = 0
        for i, t in enumerate(toks):
            assert got[i] == (run // budget, run % budget), (i, toks, width, budget)
            run += t

    check()


def test_semantic_contamination_planted_leak(spark):
    from azure_medicine_data_engineering_spark.operators.contamination import (
        semantic_contamination,
    )

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "bench_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0]),    # parallel to bench 100: cos = 1.0
            (2, [1.0, 1.0, 0.0]),    # cos ~0.707 to both: argmax tie -> bench 100
            (3, [0.0, 0.0, 5.0]),    # orthogonal: clean
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r.vec_id: (r.bench_id, r.cos_sim)
        for r in semantic_contamination(corpus, bench, threshold=0.5).collect()
    }
    assert rows == {1: (100, 1.0), 2: (100, 0.7071)}


def test_length_bucketed_batches_properties(spark):
    from azure_medicine_data_engineering_spark.operators.chunking import (
        length_bucketed_batches,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 70 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    out = length_bucketed_batches(
        docs, boundaries=(16, 32, 64), batch_size=8, bucket_width=13
    ).cache()
    rows = out.collect()
    # every doc present once; bucket boundaries honored
    assert len(rows) == 200 and len({r.doc_id for r in rows}) == 200
    for r in rows:
        expected = (r.n_tokens >= 16) + (r.n_tokens >= 32) + (r.n_tokens >= 64)
        assert r.bucket == expected
        assert r.batch_id == r.pos // 8
    # dense positions per bucket
    from collections import defaultdict
    per_bucket = defaultdict(list)
    for r in rows:
        per_bucket[r.bucket].append(r.pos)
    for b, ps in per_bucket.items():
        assert sorted(ps) == list(range(len(ps)))
    # bucket_width must not change the result
    again = length_bucketed_batches(
        docs, boundaries=(16, 32, 64), batch_size=8, bucket_width=200
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    out.unpersist()


def test_subword_vocab_candidates_planted(spark):
    from azure_medicine_data_engineering_spark.operators.text import (
        subword_vocab_candidates,
    )

    docs = spark.createDataFrame([(1, "ab ab b")], "doc_id long, text string")
    rows = {r.piece: r.cnt for r in subword_vocab_candidates(docs, top_k=10).collect()}
    # "ab" x2 -> pieces a, ab, ##b each twice; "b" x1 -> piece b
    assert rows == {"a": 2, "ab": 2, "##b": 2, "b": 1}


def test_span_corruption_masks_invariants(spark):
    from azure_medicine_data_engineering_spark.operators.chunking import (
        span_corruption_masks,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 7, 20, 100, 240])],
        "doc_id long, text string",
    )
    rows = span_corruption_masks(docs, mask_pct=15, mean_span=3, seed=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc  # 3 tokens -> mask budget 0 -> no rows
    lengths = {0: 3, 1: 7, 2: 20, 3: 100, 4: 240}
    for d, spans in by_doc.items():
        n = lengths[d]
        m = n * 15 // 100
        assert sum(s.span_len for s in spans) == m       # exact noise budget
        spans = sorted(spans, key=lambda s: s.span_start)
        for a, b in zip(spans, spans[1:]):               # non-overlapping
            assert a.span_start + a.span_len <= b.span_start
        assert all(0 <= s.span_start and s.span_start + s.span_len <= n for s in spans)
    # seed changes placement, not the budget
    other = span_corruption_masks(docs, mask_pct=15, mean_span=3, seed=2).collect()
    assert {(r.doc_id, r.span_idx, r.span_len) for r in other} == {
        (r.doc_id, r.span_idx, r.span_len) for r in rows
    }
    assert {(r.doc_id, r.span_idx, r.span_start) for r in other} != {
        (r.doc_id, r.span_idx, r.span_start) for r in rows
    }


def test_corpus_datasheet_planted(spark):
    """Planted corpus: exact duplicates (same text modulo case/punct)
    must fold into one fingerprint; top language is the majority with
    an ascending tie-break."""
    import __spark_entry__ as m

    rows = [
        (1, "Hello World!", "en", "sA", 12),
        (2, "hello   world", "en", "sA", 13),   # dup of 1 after normalize
        (3, "otro texto aqui", "es", "sA", 15),
        (4, "ganz anders", "de", "sB", 11),
        (5, "noch ein text", "de", "sB", 13),
        (6, "texto distinto", "es", "sB", 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.createOrReplaceTempView("_ds_docs")
    from azure_medicine_data_engineering_spark.operators.text import (
        fingerprint,
        token_count,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # run the same construction as the registered query, over the planted df
    base = df.select(
        "source", "lang",
        token_count(F.col("text")).cast("long").alias("n_toks"),
        F.length("text").cast("long").alias("n_chars"),
        fingerprint(F.col("text")).alias("fp"),
    )
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_uniq"),
        F.count_distinct("lang").alias("n_langs"),
    )
    got = {r["source"]: (r["n_docs"], r["n_uniq"], r["n_langs"]) for r in per.collect()}
    assert got == {"sA": (3, 2, 2), "sB": (3, 3, 2)}  # only sA has the dup pair
    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    top = {
        r["source"]: r["lang"]
        for r in lc.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    }
    assert top == {"sA": "en", "sB": "de"}


def test_blocklist_gate_planted(spark):
    """Planted hits: token-boundary matching (no substring flags), per-
    source counts and micro rates."""
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        blocklist_gate_report,
    )

    rows = [
        ("sA", "clean text here"),
        ("sA", "this has a badword inside"),
        ("sA", "badwordish is NOT a hit"),        # substring must not flag
        ("sB", "slur badword slur"),              # 3 hits, 1 doc
        ("sB", "totally fine"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in blocklist_gate_report(df).collect()}
    a, b = got["sA"], got["sB"]
    assert (a["n_docs"], a["n_flagged"], a["total_hits"]) == (3, 1, 1)
    assert (b["n_docs"], b["n_flagged"], b["total_hits"]) == (2, 1, 3)
    assert b["flagged_rate"] == 0.5


def test_duplicate_span_ranges_merges_overlapping_windows(spark):
    from azure_medicine_data_engineering_spark.operators.dedup import (
        duplicate_span_ranges,
    )

    # 9 shared tokens -> windows at ordinals 2 and 3 (w=8) overlap and
    # must merge into ONE maximal span [2, 11); the second doc's copy
    # starts at ordinal 0 -> span [0, 9). A separate 8-token repeat at
    # the tail of doc 1 / head of doc 3 yields its own island.
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    tail8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = [
        (1, f"a b {shared} x y {tail8}"),
        (2, f"{shared} p q r"),
        (3, f"{tail8} z z2 z3 z4 z5 z6 z7 z8"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = duplicate_span_ranges(df, w=8)
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"]): (
            r["span_tokens"],
            r["n_windows"],
        )
        for r in out.collect()
    }
    for c in out._stage_caches:
        c.unpersist()
    # doc 1: tokens = a b s1..s9 x y t1..t8  (21 tokens)
    #   shared windows at ord 2,3 -> span [2, 11); tail window at ord 13
    assert rows[(1, 2, 11)] == (9, 2)
    assert rows[(1, 13, 21)] == (8, 1)
    # doc 2: shared at ord 0,1 -> [0, 9)
    assert rows[(2, 0, 9)] == (9, 2)
    # doc 3: tail8 at ord 0 -> [0, 8)
    assert rows[(3, 0, 8)] == (8, 1)
    assert len(rows) == 4


def test_doremi_domain_weights_naive(spark):
    import math
    from collections import Counter

    from azure_medicine_data_engineering_spark.operators.sampling import (
        doremi_domain_weights,
    )

    docs = [
        ("common", "the the the cat sat on the mat"),
        ("common", "the cat and the dog sat"),
        ("rare", "quantum chromodynamics entangles hadrons"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r["g"]: r for r in doremi_domain_weights(df).collect()}

    # naive third implementation (half-away rounding; engine-independent)
    toks = [(s, w) for s, t in docs for w in t.split() if w]
    vocab = Counter(w for _s, w in toks)
    total = sum(vocab.values())

    def snap_round(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    lpu = {w: snap_round(math.log(c / total) * 1e6) for w, c in vocab.items()}
    doms = sorted({s for s, _w in toks})
    slpu = {g: sum(lpu[w] for s, w in toks if s == g) for g in doms}
    ntok = {g: sum(1 for s, w in toks if s == g) for g in doms}
    base = (-sum(slpu.values())) // sum(ntok.values())
    nll = {g: (-slpu[g]) // ntok[g] for g in doms}
    exc = {g: min(max(nll[g] - base, 0), 5_000_000) for g in doms}
    alpha = {
        g: math.floor(ntok[g] * math.exp(exc[g] / 1e6) * 1e2 + 0.5)
        for g in doms
    }
    asum = sum(alpha.values())
    for g in doms:
        w_naive = round((1 - 1e-2) * (alpha[g] / asum) + 1e-2 / len(doms), 6)
        r = got[g]
        assert r["nll_micro"] == nll[g]
        assert r["excess_micro"] == exc[g]
        assert abs(r["weight"] - w_naive) < 1.5e-6
    # the rare domain carries the excess and the upweight
    assert exc["rare"] > 0 and exc["common"] == 0
    assert got["rare"]["weight"] * ntok["common"] > got["common"]["weight"] * ntok["rare"]
    assert abs(sum(r["weight"] for r in got.values()) - 1.0) < 1e-5
