"""GPT-2 tokenizer artifact round trip — landed-file format, published id
numbering (hand-pinned), parse validation, and a NAIVE-PYTHON reference
encode (the mirror-oracle blind-spot rule: the registered oracle replays
the same algebra, so the id/piece semantics need an independent pin)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from azure_medicine_data_engineering_spark.operators.byte_bpe import (
    gpt2_bytes_to_unicode,
)
from azure_medicine_data_engineering_spark.operators.tokenizer_io import (
    GPT2_MERGES_FILE,
    GPT2_VOCAB_FILE,
    MERGES_HEADER,
    export_gpt2_tokenizer,
    gpt2_base_vocab_order,
    gpt2_encode_ids_stats,
    gpt2_vocab_from_merges,
    parse_gpt2_tokenizer,
)

B2U = gpt2_bytes_to_unicode()


def _sym(word: str) -> list[str]:
    return [B2U[b] for b in word.encode("utf-8")]


def _naive_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: apply each merge in order as one
    left-to-right non-overlapping pass over the symbol list."""
    syms = _sym(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# hand-pinned published ids: "!" (byte 33) is id 0, '"' id 1, printable
# latin-1 covers ids 0..187 (94 + 12 + 82 symbols), and the FIRST remapped
# byte symbol 'Ā' (byte 0 -> U+0100) lands at id 188
def test_published_base_id_numbering():
    order = gpt2_base_vocab_order()
    assert order[0] == "!" and order[1] == '"'
    assert order[188] == chr(0x100)  # byte 0x00's symbol
    assert order[187] == chr(0xFF)  # 'ÿ', last unmapped latin-1 byte
    assert len(order) == 256 and len(set(order)) == 256
    vocab = gpt2_vocab_from_merges([("a", "b"), ("ab", "c")])
    assert vocab["!"] == 0
    assert vocab[chr(0x100)] == 188
    assert vocab["ab"] == 256 and vocab["abc"] == 257


def test_duplicate_merged_token_raises():
    # (a,bc) then (ab,c) would both mint "abc"
    with pytest.raises(ValueError, match="duplicate"):
        gpt2_vocab_from_merges([("b", "c"), ("a", "bc"), ("a", "b"),
                                ("ab", "c")])


@pytest.fixture()
def landed(tmp_path):
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("Ġ", "hell")]
    root = str(tmp_path / "tok")
    vocab = export_gpt2_tokenizer(merges, root)
    return root, merges, vocab


def test_export_lands_clean_files(landed):
    root, merges, vocab = landed
    assert not glob.glob(f"{root}/*.tmp")
    lines = open(
        os.path.join(root, GPT2_MERGES_FILE), encoding="utf-8"
    ).read().splitlines()
    assert lines[0] == MERGES_HEADER
    assert lines[1:] == [f"{a} {b}" for a, b in merges]
    jv = json.load(open(os.path.join(root, GPT2_VOCAB_FILE),
                        encoding="utf-8"))
    assert jv == vocab and len(jv) == 256 + len(merges)
    assert jv["Ġhell"] == 259  # space-prefixed piece through byte 0x20


def test_parse_roundtrip_and_validation(landed, tmp_path):
    root, merges, vocab = landed
    m2, v2 = parse_gpt2_tokenizer(root)
    assert m2 == merges and v2 == vocab
    # tampered vocab: drop one entry -> size check fires
    broken = dict(vocab)
    del broken["Ġhell"]
    with open(os.path.join(root, GPT2_VOCAB_FILE), "w",
              encoding="utf-8") as fh:
        json.dump(broken, fh, ensure_ascii=False)
    with pytest.raises(ValueError, match="vocab size"):
        parse_gpt2_tokenizer(root)
    # malformed merge line
    root2 = str(tmp_path / "tok2")
    export_gpt2_tokenizer(merges, root2)
    with open(os.path.join(root2, GPT2_MERGES_FILE), "a",
              encoding="utf-8") as fh:
        fh.write("three part line\n")
    with pytest.raises(ValueError, match="malformed"):
        parse_gpt2_tokenizer(root2)


def test_encode_ids_match_naive_reference(spark, tmp_path):
    # merges exercise: chained merges, the Ġ space symbol, a multi-byte
    # UTF-8 word (日 = 3 bytes), and an untouched word
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("Ġ", "hell")]
    root = str(tmp_path / "tok3")
    export_gpt2_tokenizer(merges, root)
    m2, v2 = parse_gpt2_tokenizer(root)

    words = ["hello", " hello", "日x", "zzz", " hellish"]
    docs = [
        (1, "a", words[0]), (1, "a", words[1]), (2, "a", words[2]),
        (2, "a", words[0]), (3, "b", words[3]), (3, "b", words[4]),
        (4, "b", words[1]),
    ]
    units = spark.createDataFrame(docs, ["doc_id", "g", "w"])
    got = {
        r["g"]: r
        for r in gpt2_encode_ids_stats(units, m2, v2, spark).collect()
    }

    exp: dict[str, dict[str, int]] = {}
    for doc_id, g, w in docs:
        pieces = _naive_encode(w, merges)
        e = exp.setdefault(
            g, {"n_docs": set(), "n_pretokens": 0, "n_pieces": 0,
                "sum_ids": 0}
        )
        e["n_docs"].add(doc_id)
        e["n_pretokens"] += 1
        e["n_pieces"] += len(pieces)
        e["sum_ids"] += sum(v2[p] for p in pieces)
    for g, e in exp.items():
        assert got[g]["n_docs"] == len(e["n_docs"])
        assert got[g]["n_pretokens"] == e["n_pretokens"]
        assert got[g]["n_pieces"] == e["n_pieces"]
        assert got[g]["sum_ids"] == e["sum_ids"]
        assert got[g]["n_oov"] == 0
    # spot-pin one naive encode by hand: " hello" -> Ġhell + o
    assert _naive_encode(" hello", merges) == ["Ġhell", "o"]
    assert _naive_encode("日x", merges) == _sym("日x")  # untouched, 4 syms


def test_oov_column_is_load_bearing(spark, tmp_path):
    merges = [("h", "e")]
    root = str(tmp_path / "tok4")
    export_gpt2_tokenizer(merges, root)
    m2, v2 = parse_gpt2_tokenizer(root)
    v_broken = {t: i for t, i in v2.items() if t != "he"}
    units = spark.createDataFrame([(1, "a", "hex")], ["doc_id", "g", "w"])
    row = gpt2_encode_ids_stats(units, m2, v_broken, spark).collect()[0]
    assert row["n_oov"] == 1  # the dropped "he" piece misses the id join
