"""GPT-2 regex pretokenization (round 13) — the split every byte-level BPE
pipeline runs BEFORE merging:

    's|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+

The published pattern needs a NEGATIVE LOOKAHEAD (`\\s+(?!\\S)`: a
whitespace run donates its last space to the following word), which RE2 —
DuckDB's engine — does not support (CLAUDE.md convention). This module
implements the EXACTLY-EQUAL lookahead-free two-pass form, pure column
algebra on both engines:

Pass 1 merges the two whitespace branches into one greedy ``\\s+`` (the
other five branches are lookahead-free and keep their order — both Java
regex and RE2 use leftmost-FIRST alternation, so the ordered alternation
behaves identically).

Pass 2 (an index transform over the match array) restores the lookahead
semantics locally: a whitespace run FOLLOWED BY another token splits into
``run[:-1]`` plus its last character, which re-attaches to the next token
iff it is exactly a space U+0020 (the `` ?`` in the letter/number/punct
branches matches only a literal space — a trailing tab stays its own
token); a trailing whitespace run stays whole.

CONTRACTION RECEIVER (round-14 ADVICE fix): the contraction branch of the
published pattern has NO optional leading space, so a donated space can
never attach to it. Where pass 1 matched a contraction (a token that is
exactly one of ``'s 't 're 've 'm 'll 'd`` — no other branch can produce
those strings) right after a donating run, the true pattern instead takes
the punct branch ``" '"`` and then a GREEDY letter run: the contraction's
letters re-split off, and they merge with an immediately following bare
letter token (``"a  'rex"`` → ``["a", " ", " '", "rex"]``, where pass 1
had ``["a", "  ", "'re", "x"]``). Equality with the true pattern is
pinned against a character-exact reference (the ``regex`` module with
real lookahead) in `tests/test_pretokenize.py`.

Note ``\\s`` here is the ASCII class ``[ \\t\\n\\x0B\\f\\r]`` on BOTH
engines (Java default and RE2 agree); ``\\p{L}``/``\\p{N}`` are full
Unicode categories on both.

No counterpart in the reference (training-data scale extension; the
tokenizer-family sibling of `operators/byte_bpe.py`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pass-1 pattern: contractions, space?-letters, space?-numbers,
#: space?-punct, one greedy whitespace branch (lookahead-free)
GPT2_MERGED_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)

_WS_RUN = r"^\s+$"

#: tokens only the contraction branch can emit (letters can't contain an
#: apostrophe; punct can't contain letters) — exact provenance markers
CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

#: a pass-1 token starting with a letter was matched by the letter branch
#: WITHOUT its optional leading space (contractions start with ', ws runs
#: with whitespace, numbers with digits, punct with punct)
_BARE_LETTERS = r"^\p{L}"


def gpt2_pretokens(text: Column) -> Column:
    """GPT-2 pretokens of ``text`` as ``array<string>`` — JVM-side column
    algebra only (regexp_extract_all + one zipped transform), no UDF.

    The neighbour context (prev/next match) is materialized as ROW-level
    shifted arrays zipped with the matches — an index transform with
    ``F.get(tk, i±1)`` captures the whole regexp_extract_all expression
    in the lambda and re-runs the regex PER ELEMENT REFERENCE (CLAUDE.md
    nested-array rule; measured 18 s for 5k docs at sf0.1, ~0.9 s after
    the zip rewrite)."""
    tk = F.regexp_extract_all(text, F.lit(GPT2_MERGED_PATTERN), 0)
    n = F.size(tk)
    null_s = F.array(F.lit(None).cast("string"))
    null2_s = F.array(
        F.lit(None).cast("string"), F.lit(None).cast("string")
    )
    nxt_arr = F.concat(F.slice(tk, 2, F.greatest(n - 1, F.lit(0))), null_s)
    prev_arr = F.concat(null_s, F.slice(tk, 1, F.greatest(n - 1, F.lit(0))))
    # first n elements of [null, null] ++ tk — building it as a slice of
    # the padded array keeps the length exactly n even when n < 2
    # (arrays_zip pads SHORTER arrays with null, so a too-long sibling
    # would grow the zip and emit phantom elements)
    prev2_arr = F.slice(F.concat(null2_s, tk), 1, n)
    zipped = F.arrays_zip(
        tk.alias("cur"),
        nxt_arr.alias("nxt"),
        prev_arr.alias("prev"),
        prev2_arr.alias("prev2"),
    )

    def donates(p: Column) -> Column:
        return p.isNotNull() & p.rlike(_WS_RUN) & p.endswith(" ")

    def piece(z: Column) -> Column:
        cur, nxt, prev, prev2 = z["cur"], z["nxt"], z["prev"], z["prev2"]
        cur_ws = cur.rlike(_WS_RUN)
        head = cur.substr(F.lit(1), F.length(cur) - 1)
        last = cur.substr(F.length(cur), F.lit(1))
        prev_donates = donates(prev)
        rest = cur.substr(F.lit(2), F.length(cur) - 1)
        prev_rest = prev.substr(F.lit(2), F.length(prev) - 1)
        return (
            F.when(
                cur_ws & nxt.isNotNull(),
                # split the run: everything but the last char, plus the
                # last char as its own token unless it is the space that
                # re-attaches
                F.filter(
                    F.array(
                        head,
                        F.when(last != " ", last).otherwise(F.lit(None)),
                    ),
                    lambda x: x.isNotNull() & (x != ""),
                ),
            )
            .when(
                # donated space before a contraction: the true pattern has
                # no " ?" on the contraction branch — it takes punct " '"
                # then a GREEDY letter run, so the contraction's letters
                # merge with an immediately following bare letter token
                prev_donates & cur.isin(*CONTRACTIONS),
                F.when(
                    nxt.isNotNull() & nxt.rlike(_BARE_LETTERS),
                    F.array(F.lit(" '")),
                ).otherwise(F.array(F.lit(" '"), rest)),
            )
            .when(prev_donates, F.array(F.concat(F.lit(" "), cur)))
            .when(
                # the bare letter run that absorbs the re-split
                # contraction letters from the previous element
                prev.isNotNull()
                & prev.isin(*CONTRACTIONS)
                & donates(prev2)
                & cur.rlike(_BARE_LETTERS),
                F.array(F.concat(prev_rest, cur)),
            )
            .otherwise(F.array(cur))
        )

    out = F.flatten(F.transform(zipped, piece))
    return F.when(n > 0, out).otherwise(F.array().cast("array<string>"))


def gpt2_matches_sql(expr: str) -> str:
    """DuckDB pass 1 over the SQL expression ``expr`` (stage the result in
    a CTE column — the fix-up references it many times)."""
    pat = GPT2_MERGED_PATTERN.replace("'", "''")
    return f"regexp_extract_all({expr}, '{pat}')"


def gpt2_fixup_sql(tk: str) -> str:
    """DuckDB pass 2 (the lookahead restoration) over a COLUMN NAME ``tk``
    holding the pass-1 match list — mirror of the index transform in
    :func:`gpt2_pretokens`, including the contraction-receiver re-split."""
    contr = ", ".join("'" + c.replace("'", "''") + "'" for c in CONTRACTIONS)
    don_prev = (
        f"(i > 1 AND regexp_matches({tk}[i-1], '^\\s+$') "
        f"AND substr({tk}[i-1], length({tk}[i-1]), 1) = ' ')"
    )
    don_prev2 = (
        f"(i > 2 AND regexp_matches({tk}[i-2], '^\\s+$') "
        f"AND substr({tk}[i-2], length({tk}[i-2]), 1) = ' ')"
    )
    return (
        f"list_filter(flatten(list_transform(range(1, len({tk}) + 1), i -> "
        f"CASE WHEN regexp_matches({tk}[i], '^\\s+$') AND i < len({tk}) "
        f"THEN list_filter("
        f"[substr({tk}[i], 1, length({tk}[i]) - 1), "
        f"CASE WHEN substr({tk}[i], length({tk}[i]), 1) <> ' ' "
        f"THEN substr({tk}[i], length({tk}[i]), 1) END], "
        f"x -> x IS NOT NULL AND x <> '') "
        # donated space before a contraction: emit " '" (true pattern's
        # punct branch); the letters re-split, merging into a following
        # bare letter token when one is adjacent
        f"WHEN {don_prev} AND {tk}[i] IN ({contr}) "
        f"THEN CASE WHEN i < len({tk}) "
        f"AND regexp_matches({tk}[i+1], '^\\p{{L}}') "
        f"THEN [' '''] "
        f"ELSE [' ''', substr({tk}[i], 2, length({tk}[i]) - 1)] END "
        f"WHEN {don_prev} THEN [' ' || {tk}[i]] "
        # the bare letter run absorbing the previous element's re-split
        # contraction letters
        f"WHEN i > 1 AND {tk}[i-1] IN ({contr}) AND {don_prev2} "
        f"AND regexp_matches({tk}[i], '^\\p{{L}}') "
        f"THEN [substr({tk}[i-1], 2, length({tk}[i-1]) - 1) || {tk}[i]] "
        f"ELSE [{tk}[i]] END)), x -> x <> '')"
    )
