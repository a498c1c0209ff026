"""Batched BPE training (``bpe_merge_train(batch_k=...)`` — round-5
verdict ask #4): batch_k=1 equality with the sequential exact path, the
planted legal-divergence case, progress/termination guarantees, and the
non-interference guard (symbol-disjoint greedy selection)."""

from azure_medicine_data_engineering_spark.operators.text import (
    _bpe_merge_train_batched,
    bpe_merge_train,
)


def _rows(df):
    return [
        (r.merge_idx, r.left_sym, r.right_sym, r.pair_count)
        for r in df.orderBy("merge_idx").collect()
    ]


def _release(df):
    for c in getattr(df, "_stage_caches", []):
        c.unpersist()


def test_batched_k1_equals_sequential(spark):
    """The batched machinery with batch_k=1 must reproduce the sequential
    argmax loop EXACTLY — same merges, same order, same counts — on a
    corpus with ties, overlaps, and multi-round interactions."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "newer": 4}
    bag = [w for w, f in sorted(freqs.items()) for _ in range(f)]
    texts = [" ".join(bag[i : i + 3]) for i in range(0, len(bag), 3)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    seq = bpe_merge_train(df, n_merges=8)
    bat = _bpe_merge_train_batched(df, 8, "text", 1)
    assert _rows(bat) == _rows(seq)
    _release(seq)
    _release(bat)


def test_batched_k1_overlap_semantics(spark):
    """Overlapping self-pairs ('aaaa' counts (a,a) three times, rewrite
    is leftmost-non-overlapping) must survive the batched rewrite path."""
    df = spark.createDataFrame([("aaaa aaaa aaaa",), ("baa baa",)], "text string")
    seq = bpe_merge_train(df, n_merges=3)
    bat = _bpe_merge_train_batched(df, 3, "text", 1)
    assert _rows(bat) == _rows(seq)
    _release(seq)
    _release(bat)


def test_batched_planted_divergence(spark):
    """The documented LEGAL divergence: round-start counts are
    (a,b)=18, (b,c)=8, (d,e)=7. Sequential BPE merges (a,b), re-counts,
    and finds the brand-new pair (ab,c)=8 outranking (d,e)=7. Batched
    batch_k=2 selects from the STALE round-start counts: (a,b) first,
    (b,c) skipped (shares b), (d,e) picked. Both are valid BPE
    schedules; the batched one trades exact sequential order for
    ~k fewer Spark rounds per k merges."""
    texts = ["ab"] * 10 + ["abc"] * 8 + ["de"] * 7
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    seq = bpe_merge_train(df, n_merges=2)
    assert _rows(seq) == [(1, "a", "b", 18), (2, "ab", "c", 8)]
    bat = _bpe_merge_train_batched(df, 2, "text", 2)
    assert _rows(bat) == [(1, "a", "b", 18), (2, "d", "e", 7)]
    _release(seq)
    _release(bat)


def test_batched_round_count_and_progress(spark):
    """batch_k=4 over a corpus with >=8 mergeable disjoint pairs must
    finish 8 merges in at most ceil(8/4)+slack rounds (the greedy
    selector can pick fewer than k when candidates collide, but every
    round picks at least one), and _round_secs records one entry per
    round actually run."""
    texts = (
        ["ab"] * 9 + ["cd"] * 8 + ["ef"] * 7 + ["gh"] * 6
        + ["ij"] * 5 + ["kl"] * 4 + ["mn"] * 3 + ["op"] * 2
    )
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    bat = _bpe_merge_train_batched(df, 8, "text", 4)
    got = _rows(bat)
    assert [g[:3] for g in got[:4]] == [
        (1, "a", "b"),
        (2, "c", "d"),
        (3, "e", "f"),
        (4, "g", "h"),
    ]
    assert len(got) == 8
    assert len(bat._round_secs) == 2  # 8 merges / batch_k=4, fully disjoint
    _release(bat)


def test_batched_concat_collision_guard(spark):
    """A candidate whose symbols are disjoint from an earlier pick but
    whose pattern involves the earlier pick's CONCAT must be deferred:
    with words 'ab'(x10) and 'abx'(x9... via distinct words), after
    picking (a,b) the candidate (ab?, ...) cannot exist yet in round-1
    counts, but a candidate equal to the concat CAN: plant words so that
    symbol pair ('a','b') and pair ('ab'-colliding) interact.

    Concretely: corpus {'ab': 10, 'cab': 6, 'cd': 7}. Round-start pairs:
    (a,b)=16, (c,a)=6, (c,d)=7. batch_k=3 picks (a,b); (c,d) is
    disjoint -> picked; (c,a) shares both c (used) and a -> deferred.
    No selected rewrite can create/destroy another's occurrences."""
    texts = ["ab"] * 10 + ["cab"] * 6 + ["cd"] * 7
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    bat = _bpe_merge_train_batched(df, 3, "text", 3)
    got = _rows(bat)
    assert got[0] == (1, "a", "b", 16)
    assert got[1] == (2, "c", "d", 7)
    # round 2: 'cab' is now c|ab, so (c,ab)=6 is the top remaining pair
    assert got[2] == (3, "c", "ab", 6)
    assert len(bat._round_secs) == 2
    _release(bat)


def test_batched_terminates_when_corpus_exhausted(spark):
    """Asking for more merges than the corpus supports returns what
    exists and stops (no infinite loop when no pairs remain)."""
    df = spark.createDataFrame([("ab ab",)], "text string")
    bat = _bpe_merge_train_batched(df, 10, "text", 4)
    got = _rows(bat)
    assert got == [(1, "a", "b", 2)]
    _release(bat)
