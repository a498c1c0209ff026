"""Line- and paragraph-level corpus cleaning: the C4 line-filter rules
(Raffel et al. 2020, §2.2) and global first-occurrence paragraph
deduplication (the "three-sentence span" dedup of C4, at paragraph
granularity) — scale extensions with no counterpart in the reference,
whose text handling stops at label normalization.

Both operators are map-side explodes plus one keyed shuffle: line
filtering never shuffles at all (per-document explode → filter →
re-aggregate under the same key), paragraph dedup shuffles once on the
paragraph fingerprint. Reassembly orders by the original line/paragraph
ordinal inside a per-document ``collect_list`` (bounded by document
length), so cleaned text is byte-deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["c4_line_filter", "paragraph_dedup"]


def _word_count(line: Column) -> Column:
    return F.size(F.filter(F.split(line, " "), lambda x: x != ""))


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    banned: tuple[str, ...] = ("javascript", "lorem ipsum", "{"),
) -> DataFrame:
    """C4-style line-level cleaning: split ``text_col`` on newlines, keep
    lines with at least ``min_words`` whitespace words and none of the
    ``banned`` substrings (case-insensitive), and reassemble the survivors
    in original order.

    Returns ``(id, n_lines, n_kept, clean_text)``. Documents whose every
    line is dropped survive with an empty ``clean_text`` (the caller's
    quality gate decides their fate — this operator only cleans).

    Plan: posexplode → column-expression predicate → groupBy(id) with an
    ordinal-sorted ``collect_list`` (bounded by lines-per-document). No
    shuffle beyond the one re-aggregation on the document key; the
    predicate is pure JVM column algebra, no UDFs.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("i", "line"),
    )
    low = F.lower(F.col("line"))
    keep = _word_count(F.col("line")) >= min_words
    for b in banned:
        keep = keep & ~low.contains(b.lower())
    tagged = lines.select(id_col, "i", "line", keep.alias("_keep"))
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("i"), F.col("line")))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Global first-occurrence paragraph deduplication: split documents on
    ``sep``, keep each distinct paragraph only at its first corpus
    position (lowest ``(id, ordinal)``), drop every later copy, and
    reassemble the survivors per document in original order.

    Returns ``(id, n_paras, n_kept, clean_text)``.

    Plan: one shuffle on the md5 paragraph fingerprint (the window is
    keyed by fingerprint — duplicate-group-sized partitions, never
    corpus-sized), then one re-aggregation on the document key. The
    first-occurrence rule is the deterministic tie-breaker, so results
    are identical under any partitioning.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("i", "para"),
    ).where(F.col("para") != "")
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(id_col, "i")
    flagged = paras.select(
        id_col, "i", "para", (F.row_number().over(w) == 1).alias("_first")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.col("_first").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_first"), F.struct(F.col("i"), F.col("para")))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
    )


#: Demonstration blocklist — the MECHANISM (token-boundary-safe counting,
#: per-source gate report) is the operator; production swaps in a real
#: content-safety list exactly like LANG_MARKERS / QUALITY_STOPWORDS.
BLOCKLIST_DEMO: list[str] = ["badword", "slur", "spamlink", "xxx"]


def blocklist_gate_report(
    df: DataFrame,
    blocklist: list[str] | None = None,
    text_col: str = "text",
    group_col: str = "source",
    max_hits: int = 0,
) -> DataFrame:
    """Content-safety blocklist gate per source — the screening sibling
    of the PII scrub (``text.redact_pii``: that one rewrites, this one
    GATES): count token-boundary blocklist hits per document (lowercased
    whitespace tokens — substring matches inside clean words do NOT
    flag), flag docs with more than ``max_hits``, and report per source
    ``(source, n_docs, n_flagged, total_hits, flagged_rate)`` with the
    rate on the integer micro grid. Map-only hit counting + one keyed
    aggregation."""
    from azure_medicine_data_engineering_spark.operators.text import tokens

    bl = blocklist if blocklist is not None else BLOCKLIST_DEMO
    arr = F.array(*[F.lit(w) for w in bl])
    hits = F.size(
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: F.array_contains(arr, t))
    ).cast("long")
    per_doc = df.select(F.col(group_col).alias("g"), hits.alias("_h"))
    return (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("_h") > max_hits).cast("long")).cast("long").alias("n_flagged"),
            F.sum("_h").cast("long").alias("total_hits"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "n_flagged",
            "total_hits",
            (F.expr("n_flagged * 1000000 div n_docs") / 1e6).alias("flagged_rate"),
        )
    )


GOPHER_STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_ok_all(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: int = 3,
    max_word_len: int = 10,
    min_stop_hits: int = 2,
) -> Column:
    """Per-document Gopher all-rules pass flag as ONE column expression —
    the composable (filter-stage) form of :func:`gopher_quality_report`'s
    rule battery, same integer-only thresholds (round 12, for the crawl
    funnel). Words are the single-space split, matching the report."""
    words = F.filter(F.split(text, " "), lambda x: x != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    n_ell = n_ell.cast("long")
    stop_hits = sum(
        F.array_contains(words, sw).cast("int") for sw in GOPHER_STOP_WORDS
    )
    return (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (total_chars >= min_word_len * n_words)
        & (total_chars <= max_word_len * n_words)
        & (10 * (n_hash + n_ell) <= n_words)
        & (10 * n_alpha >= 8 * n_words)
        & (stop_hits >= min_stop_hits)
    )


def gopher_quality_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: int = 3,
    max_word_len: int = 10,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, §A1.1 — the
    MassiveText repetition-free subset that is well-defined on
    newline-less documents), the pre-training curation battery next to
    the C4 line rules (:func:`c4_line_filter`): per document,

    - word count within ``[min_words, max_words]``;
    - mean word length within ``[min_word_len, max_word_len]`` —
      tested as the INTEGER comparison ``min·n ≤ Σlen ≤ max·n``
      (no division, no float);
    - symbol-to-word ratio ≤ 0.1 for ``#`` and ``...`` (integer
      comparison ``10·(hashes + ellipses) ≤ n_words``);
    - ≥ 80% of words contain an alphabetic character (integer
      comparison ``10·n_alpha ≥ 8·n_words``);
    - at least ``min_stop_hits`` DISTINCT stop words present
      (:data:`GOPHER_STOP_WORDS`).

    Returns one row per ``group_col``: document counts passing/failing
    each rule plus the all-rules pass count — the per-source curation
    datasheet. Every rule is a JVM-side expression over the split word
    array (map-only; the single shuffle is the per-group count
    aggregation), and every threshold is pure integer arithmetic so the
    oracle hashes exactly at any scale. Scale extension with no
    reference counterpart (its text handling stops at label
    normalization, ``HypothesisTestingPrediction.scala:107-115``)."""
    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_words = F.size(words)
    total_chars = F.aggregate(
        # long seed: an INT fold wraps for a single document over ~2^31
        # chars — these filters are meant for 100 TB funnels
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    n_hash = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    n_ell = F.expr(
        f"(length({text_col}) - length(replace({text_col}, '...', ''))) div 3"
    )
    stop_hits = sum(
        F.array_contains(words, sw).cast("int") for sw in GOPHER_STOP_WORDS
    )
    flags = df.select(
        F.col(group_col).alias("g"),
        n_words.alias("nw"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("ok_count"),
        (
            (total_chars >= min_word_len * n_words)
            & (total_chars <= max_word_len * n_words)
        ).alias("ok_wlen"),
        ((10 * (n_hash + n_ell) <= n_words)).alias("ok_symbol"),
        ((10 * n_alpha >= 8 * n_words)).alias("ok_alpha"),
        (stop_hits >= min_stop_hits).alias("ok_stop"),
    ).withColumn(
        "ok_all",
        F.col("ok_count")
        & F.col("ok_wlen")
        & F.col("ok_symbol")
        & F.col("ok_alpha")
        & F.col("ok_stop"),
    )
    return flags.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("ok_all").cast("long")).cast("long").alias("n_pass"),
        F.sum((~F.col("ok_count")).cast("long")).cast("long").alias("fail_word_count"),
        F.sum((~F.col("ok_wlen")).cast("long")).cast("long").alias("fail_word_len"),
        F.sum((~F.col("ok_symbol")).cast("long")).cast("long").alias("fail_symbol"),
        F.sum((~F.col("ok_alpha")).cast("long")).cast("long").alias("fail_alpha"),
        F.sum((~F.col("ok_stop")).cast("long")).cast("long").alias("fail_stop"),
    ).withColumnRenamed("g", group_col)


# ---------------------------------------------------------------------------
# Readability scoring (round 10) — Flesch-Kincaid grade level per corpus
# slice, the curation signal complexity-based filters (textbook-vs-forum
# routing, age-band selection) key on. Pure JVM higher-order expressions
# (split + filter + aggregate lambdas — no UDF), exactly mirrored in SQL.
# ---------------------------------------------------------------------------

#: FK grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59 over
#: the slice's EXACT integer totals — one shared expression, scientific
#: literals (decimal literals leak DECIMAL types, CLAUDE.md).
FK_GRADE_EXPR = (
    "case when w > 0 and s > 0 then "
    "round(3.9e-1 * w / s + 1.18e1 * y / w - 1.559e1, 4) end"
)


def _fk_doc_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_words, n_syllables, n_sentences) for one document — the
    deterministic heuristic contract shared with the DuckDB mirror:
    words = maximal [a-z]+ runs of the lowercased text; syllables per
    word = max(1, number of [aeiouy]+ vowel groups); sentences =
    max(1, number of [.!?]+ terminator runs)."""
    words = F.filter(F.split(F.lower(text), "[^a-z]+"), lambda w: w != "")
    n_words = F.size(words).cast("long")
    n_syll = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.filter(F.split(w, "[^aeiouy]+"), lambda p: p != "")),
        ).cast("long"),
    )
    n_sent = F.greatest(
        F.lit(1), F.size(F.split(text, "[.!?]+")) - 1
    ).cast("long")
    return n_words, n_syll, n_sent


def flesch_kincaid_by_group(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Flesch-Kincaid grade level per group: per-document integer counts
    (words, vowel-group syllables, sentence terminators) roll up through
    one keyed aggregation — exact BIGINT totals, the grade is one shared
    double expression at the end. Map-side combinable; no shuffle beyond
    the one keyed agg; no data-grain windows. Returns
    ``(g, n_docs, n_words, n_syllables, n_sentences, fk_grade)``."""
    nw, ny, ns = _fk_doc_counts(F.col(text_col))
    per_doc = df.select(
        F.col(group_col).alias("g"),
        nw.alias("_w"),
        ny.alias("_y"),
        ns.alias("_s"),
    )
    return (
        per_doc.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_w").cast("long").alias("w"),
            F.sum("_y").cast("long").alias("y"),
            F.sum("_s").cast("long").alias("s"),
        )
        .select(
            "g",
            "n_docs",
            F.col("w").alias("n_words"),
            F.col("y").alias("n_syllables"),
            F.col("s").alias("n_sentences"),
            F.expr(FK_GRADE_EXPR).alias("fk_grade"),
        )
    )


# ---------------------------------------------------------------------------
# CJK / whitespace-free-script routing (round 12). Every word metric above
# tokenizes on whitespace; on CJK text that silently collapses word counts
# to sentence-chunk counts. These helpers make the failure mode EXPLICIT
# (a detector + a unit counter that routes by script) so quality gates can
# count the right unit instead of silently passing garbage counts.
# ---------------------------------------------------------------------------

#: CJK Unified Ideographs block as a literal char-class — the same UTF-8
#: pattern text works in Java regex (Spark) and RE2 (DuckDB).
CJK_RANGE_PATTERN = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"

#: lowercase a-z -> the first 26 CJK Unified Ideographs: the deterministic
#: transliteration the CJK fixture slice uses (shared with the SQL oracle).
CJK_TRANSLATE_TO = "".join(chr(0x4E00 + i) for i in range(26))

#: High-frequency Chinese function words (the head of the standard zh
#: stop list) — the CJK-route counterpart of :data:`GOPHER_STOP_WORDS`
#: (round 13). Matched by SUBSTRING containment, not whitespace tokens:
#: CJK has no word boundaries, so the particle either appears in the
#: character stream or it doesn't. Note that 一/不/与/且 fall inside the
#: first-26-ideograph transliteration range, so the synthetic fixture
#: slice genuinely exercises the rule (they are the images of a/n/o/u).
CJK_STOP_CHARS = ["的", "了", "是", "在", "一", "不", "与", "且", "有", "人"]


def cjk_stop_hits(text: Column) -> Column:
    """Number of DISTINCT CJK stop particles present in ``text``
    (substring containment per particle, integer sum — mirrors the
    latin route's distinct-stop-word count)."""
    return sum(text.contains(p).cast("int") for p in CJK_STOP_CHARS)


def cjk_char_count(text: Column) -> Column:
    """Number of CJK-Unified-Ideograph characters in ``text``."""
    return F.regexp_count(text, F.lit(CJK_RANGE_PATTERN)).cast("long")


def script_route(text: Column, threshold_pct: int = 30) -> Column:
    """'cjk' when at least ``threshold_pct`` percent of characters are CJK
    ideographs, else 'latin' — integer comparison, no floats."""
    return F.when(
        100 * cjk_char_count(text) >= threshold_pct * F.length(text),
        F.lit("cjk"),
    ).otherwise(F.lit("latin"))


def text_units(text: Column) -> Column:
    """The quality-gate counting unit, routed by script: whitespace words
    for latin text, CJK CHARACTERS for whitespace-free CJK text (the
    standard char-grain proxy; whitespace tokenization would return ~1
    'word' per unbroken CJK run)."""
    ws_words = F.size(F.filter(F.split(text, r"\s+"), lambda x: x != ""))
    return F.when(
        script_route(text) == "cjk", cjk_char_count(text)
    ).otherwise(ws_words.cast("long"))
