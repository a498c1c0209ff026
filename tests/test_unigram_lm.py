"""Unigram-LM trainer pins (`operators/unigram_lm.py`).

The naive reference below re-implements the whole Viterbi-EM from scratch
in plain Python (dicts + loops, half-away rounding via math.floor(x+0.5))
— a THIRD implementation independent of both the Spark kernel and the
DuckDB oracle, per the repo's mirror-oracle-blind-spot rule (a formula
bug shared by the Spark/SQL twins would pass the driver gate; it cannot
pass this)."""

from __future__ import annotations

import math
import re
from collections import Counter

from azure_medicine_data_engineering_spark.operators.unigram_lm import (
    MAX_WORD_LEN,
    unigram_lm_train,
)


def _naive_unigram(
    texts: list[str],
    keep_multi: int,
    prune_per_round: int,
    rounds: int,
    max_piece: int,
) -> set[tuple[str, int, int]]:
    words: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch(r"[a-z]{1,%d}" % MAX_WORD_LEN, w):
                words[w] += 1

    def cost_table(vocab: dict[str, int]) -> dict[str, int]:
        total = sum(vocab.values())
        nv = len(vocab)
        return {
            p: int(math.floor(-math.log((c + 1.0) / (total + nv)) * 1e6 + 0.5))
            for p, c in vocab.items()
        }

    seed: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:keep_multi]
    vocab.update(dict(multis))

    for _ in range(rounds):
        costs = cost_table(vocab)
        counts = {p: 0 for p in vocab}
        for w, f in words.items():
            n = len(w)
            best: list = [None] * (n + 1)
            best[0] = 0
            back: list = [None] * (n + 1)
            for j in range(1, n + 1):
                for i in range(max(0, j - max_piece), j):
                    if best[i] is None or w[i:j] not in costs:
                        continue
                    t = best[i] + costs[w[i:j]]
                    if best[j] is None or t < best[j]:
                        best[j], back[j] = t, i
            pos = n
            while pos:
                i = back[pos]
                counts[w[i:pos]] += f
                pos = i
        pruned = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]),
        )[:prune_per_round]
        for p, _c in pruned:
            del counts[p]
        vocab = counts

    costs = cost_table(vocab)
    return {(p, c, costs[p]) for p, c in vocab.items()}


TEXTS = [
    "low low low low low lower lower newest newest newest newest",
    "newest newest widest widest widest new wider lowest lowest",
    "low lower lowest newest widest wide wider new news",
]


def test_spark_matches_naive_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = unigram_lm_train(
        df, keep_multi=6, prune_per_round=2, rounds=2, max_piece=3
    )
    got_set = {
        (r["piece"], r["cnt"], r["cost_micro"]) for r in got.collect()
    }
    want = _naive_unigram(
        TEXTS, keep_multi=6, prune_per_round=2, rounds=2, max_piece=3
    )
    assert got_set == want


def test_single_chars_survive_and_segmentability(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    out = unigram_lm_train(
        df, keep_multi=6, prune_per_round=1, rounds=2, max_piece=3
    ).collect()
    pieces = {r["piece"] for r in out}
    chars = {c for t in TEXTS for c in t.replace(" ", "")}
    # every character of the corpus stays in the vocab (segmentability)
    assert chars <= pieces
    # multi-char pieces were actually learned
    assert any(len(p) > 1 for p in pieces)
    # costs are positive micro-grid negative log-probs
    assert all(r["cost_micro"] > 0 for r in out)


def test_long_words_excluded(spark):
    df = spark.createDataFrame(
        [("short " + "a" * (MAX_WORD_LEN + 1) + " ok",)], "text string"
    )
    out = unigram_lm_train(
        df, keep_multi=2, prune_per_round=0, rounds=1, max_piece=2
    ).collect()
    # the >16-char word contributes nothing: 'a' appears only if some
    # retained word contains it — here it must be absent entirely
    assert all(r["piece"] != "a" * 2 for r in out)
    joined = "".join(sorted(r["piece"] for r in out))
    assert "a" not in joined


def _naive_costs(vocab_set):
    """cost table from a {(piece, cnt, cost)} naive-vocab set."""
    return {p: cost for p, _c, cost in vocab_set}


def _naive_viterbi_npieces(w, costs, max_piece):
    n = len(w)
    best = [None] * (n + 1)
    best[0] = 0
    back = [None] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece), j):
            if best[i] is None or w[i:j] not in costs:
                continue
            t = best[i] + costs[w[i:j]]
            if best[j] is None or t < best[j]:
                best[j], back[j] = t, i
    pos, cnt = n, 0
    while pos:
        cnt += 1
        pos = back[pos]
    return cnt


def test_fertility_matches_naive_reference(spark):
    from azure_medicine_data_engineering_spark.operators.unigram_lm import (
        unigram_fertility_by_group,
    )

    docs = [
        ("a", TEXTS[0]),
        ("a", TEXTS[1]),
        ("b", TEXTS[2]),
        ("b", "low lowest widest new"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r["g"], r["n_words"], r["n_pieces"], r["fertility"])
        for r in unigram_fertility_by_group(
            df, keep_multi=6, prune_per_round=2, rounds=2, max_piece=3
        ).collect()
    }
    texts = [t for _s, t in docs]
    vocab = _naive_unigram(
        texts, keep_multi=6, prune_per_round=2, rounds=2, max_piece=3
    )
    costs = _naive_costs(vocab)
    import re as _re
    from collections import Counter as _C

    want = set()
    for g in ("a", "b"):
        words = _C()
        for s, t in docs:
            if s != g:
                continue
            for w in t.lower().split():
                if _re.fullmatch(r"[a-z]{1,16}", w):
                    words[w] += 1
        n_words = sum(words.values())
        n_pieces = sum(
            c * _naive_viterbi_npieces(w, costs, 3) for w, c in words.items()
        )
        want.add((g, n_words, n_pieces, (n_pieces * 1000000 // n_words) / 1e6))
    assert got == want
