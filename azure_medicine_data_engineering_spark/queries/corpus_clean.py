"""Line/paragraph corpus-cleaning queries (C4 line rules, global
paragraph dedup). The synthetic documents are single-line word soup, so
each query first builds a deterministic line-structured fixture from the
corpus itself — 12/16-token lines plus boilerplate injections keyed on
``doc_id`` residues (the ``pii_redaction_report`` fixture convention) —
then runs the generic operator from ``operators/text_clean.py``. The
oracle rebuilds the identical fixture and replays the filter/dedup in
SQL, so both the fixture construction AND the cleaning semantics are
hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.text_clean import (
    c4_line_filter,
    paragraph_dedup,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)

_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

_BOILER = {
    3: "please enable javascript to continue",
    4: "click here now {menu}",
    5: "lorem ipsum dolor sit amet consectetur",
    7: "ok go now",
}

_PARA_BOILER = {
    4: "shared boilerplate navigation menu home about contact privacy terms",
    6: "subscribe to our newsletter for updates and exclusive offers weekly",
}


def _lines_fixture(df: DataFrame, width: int, boiler: dict[int, str]) -> DataFrame:
    """Deterministic line-structured fixture: the document's tokens cut
    into ``width``-token lines, plus boilerplate lines appended for
    ``doc_id`` residue classes, newline-joined."""
    extras = F.filter(
        F.array(
            *[
                F.when(F.col("doc_id") % k == 0, F.lit(s))
                for k, s in sorted(boiler.items())
            ]
        ),
        lambda x: x.isNotNull(),
    )
    # sequence(0, -1) DESCENDS in Spark (vs DuckDB's empty range(0)):
    # empty documents need the explicit empty-array branch.
    base = F.expr(
        "case when size(toks) = 0 then cast(array() as array<string>) else "
        "transform(sequence(0, int(ceil(size(toks) / {w}.0)) - 1), "
        "i -> array_join(slice(toks, i * {w} + 1, {w}), ' ')) end".format(w=width)
    )
    return (
        df.select(
            "doc_id",
            F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "").alias("toks"),
        )
        .select("doc_id", F.array_join(F.concat(base, extras), "\n").alias("text"))
    )


def _lines_fixture_sql(width: int, boiler: dict[int, str]) -> str:
    cases = ", ".join(
        f"CASE WHEN doc_id % {k} = 0 THEN '{s}' END" for k, s in sorted(boiler.items())
    )
    return f"""
    base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    fixture AS (
      SELECT doc_id, array_to_string(list_concat(
        list_transform(
          range(CAST(ceil(len(toks) / {width}.0) AS BIGINT)),
          i -> array_to_string(toks[i * {width} + 1 : i * {width} + {width}], ' ')
        ),
        list_filter([{cases}], x -> x IS NOT NULL)
      ), chr(10)) AS t
      FROM base
    )"""


@register(
    "c4_line_filter_report",
    f"""
    WITH {_lines_fixture_sql(12, _BOILER)},
    l AS (
      SELECT doc_id, unnest(range(len(lines))) AS i, lines
      FROM (SELECT doc_id, string_split(t, chr(10)) AS lines FROM fixture)
    ),
    flagged AS (
      SELECT doc_id, i, lines[i + 1] AS line,
             len(list_filter(string_split(lines[i + 1], ' '), x -> x <> '')) >= 5
             AND NOT contains(lower(lines[i + 1]), 'javascript')
             AND NOT contains(lower(lines[i + 1]), 'lorem ipsum')
             AND NOT contains(lower(lines[i + 1]), '{{')
             AS keep
      FROM l
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY i), '') AS clean
      FROM flagged GROUP BY doc_id
    )
    SELECT doc_id, n_lines, n_kept,
           CAST(length(clean) AS INT) AS kept_len, md5(clean) AS kept_md5
    FROM agg
    """,
)
def q_c4_line_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-filter (Raffel et al. 2020 §2.2) over a line-structured
    fixture: 12-token lines plus four boilerplate injections (javascript
    notice, brace menu, lorem ipsum, a 3-word stub). The filter must drop
    exactly the injected classes plus natural short tail lines and
    reassemble survivors in order — the md5 of the cleaned text is the
    gate."""
    docs = _t(spark, sf_dir, "documents")
    out = c4_line_filter(_lines_fixture(docs, 12, _BOILER))
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.length("clean_text").cast("int").alias("kept_len"),
        F.md5("clean_text").alias("kept_md5"),
    )


@register(
    "paragraph_dedup_docs",
    f"""
    WITH {_lines_fixture_sql(16, _PARA_BOILER)},
    p AS (
      SELECT doc_id, unnest(range(len(paras))) AS i, paras
      FROM (SELECT doc_id, string_split(t, chr(10)) AS paras FROM fixture)
    ),
    flagged AS (
      SELECT doc_id, i, paras[i + 1] AS para,
             ROW_NUMBER() OVER (
               PARTITION BY md5(paras[i + 1]) ORDER BY doc_id, i
             ) = 1 AS first_seen
      FROM p WHERE paras[i + 1] <> ''
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_paras,
             CAST(SUM(CASE WHEN first_seen THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             COALESCE(string_agg(CASE WHEN first_seen THEN para END, chr(10) ORDER BY i), '') AS clean
      FROM flagged GROUP BY doc_id
    )
    SELECT doc_id, n_paras, n_kept,
           CAST(length(clean) AS INT) AS kept_len, md5(clean) AS kept_md5
    FROM agg
    """,
)
def q_paragraph_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global first-occurrence paragraph dedup (C4's span-dedup at
    paragraph granularity): 16-token paragraphs plus two shared
    boilerplate paragraphs injected across residue classes — every copy
    after the lowest ``(doc_id, position)`` must drop, and surviving
    paragraphs must reassemble in order on the keeper."""
    docs = _t(spark, sf_dir, "documents")
    out = paragraph_dedup(_lines_fixture(docs, 16, _PARA_BOILER))
    return out.select(
        "doc_id",
        "n_paras",
        "n_kept",
        F.length("clean_text").cast("int").alias("kept_len"),
        F.md5("clean_text").alias("kept_md5"),
    )


from azure_medicine_data_engineering_spark.operators.text_clean import (  # noqa: E402
    BLOCKLIST_DEMO,
    blocklist_gate_report,
)

_BL_ARR = ", ".join(f"'{w}'" for w in BLOCKLIST_DEMO)


@register(
    "blocklist_gate_by_source",
    f"""
    WITH per_doc AS (
      SELECT source AS g,
             CAST(len(list_filter(
               list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''),
               x -> list_contains([{_BL_ARR}], x))) AS BIGINT) AS h
      FROM documents
    )
    SELECT g AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(h) AS BIGINT) AS total_hits,
           (CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // COUNT(*)) / 1e6 AS flagged_rate
    FROM per_doc GROUP BY g
    """,
)
def q_blocklist_gate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-safety blocklist gate per source (``operators/
    text_clean.py:blocklist_gate_report``) — the screening sibling of the
    PII scrub: token-boundary hit counts (substrings inside clean words
    never flag), per-source flag counts and micro-grid rates. The demo
    list exercises the mechanism (the synthetic corpus is clean, so
    zero flags is the honest expected report); production swaps in a
    real list like LANG_MARKERS."""
    return blocklist_gate_report(_t(spark, sf_dir, "documents"))


from azure_medicine_data_engineering_spark.operators.text import (  # noqa: E402
    PII_PATTERNS,
    pii_counts,
)

_PII_ORACLE_COLS = ",\n           ".join(
    f"CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS n_{name}"
    for name, pat, _ in PII_PATTERNS
)


@register(
    "pii_density_by_source",
    f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {_PII_ORACLE_COLS},
           CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
    """,
)
def q_pii_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density per source (``operators/text.py:pii_counts`` — the
    measurement half of the scrub: redact_pii rewrites, this reports
    WHERE the exposure concentrates before/after): per-source match
    counts for every PII category plus token volume. The shared RE2-safe
    patterns count identically on both engines (the clean synthetic
    corpus honestly reports zeros — the mechanism is the deliverable,
    like the blocklist gate)."""
    from azure_medicine_data_engineering_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    cnts = pii_counts(F.col("text"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *[
            F.sum(c).cast("long").alias(f"n_{name}")
            for name, c in cnts.items()
        ],
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Gopher quality rules per source.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text_clean import (  # noqa: E402
    GOPHER_STOP_WORDS,
    gopher_quality_report,
)

_GOPHER_STOPS_SQL = " + ".join(
    f"CAST(list_contains(ws, '{sw}') AS INT)" for sw in GOPHER_STOP_WORDS
)


@register(
    "gopher_quality_by_source",
    f"""
    WITH w AS (
      SELECT source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) // 3 AS n_ell
      FROM documents
    ),
    f AS (
      SELECT source,
             len(ws) AS nw,
             COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,
             len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS na,
             n_hash, n_ell,
             ({_GOPHER_STOPS_SQL}) AS stop_hits
      FROM w
    ),
    fl AS (
      SELECT source,
             (nw >= 50 AND nw <= 100000) AS ok_count,
             (tc >= 3 * nw AND tc <= 10 * nw) AS ok_wlen,
             (10 * (n_hash + n_ell) <= nw) AS ok_symbol,
             (10 * na >= 8 * nw) AS ok_alpha,
             (stop_hits >= 2) AS ok_stop
      FROM f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ok_count AND ok_wlen AND ok_symbol
                          AND ok_alpha AND ok_stop
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN ok_count THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_count,
           CAST(SUM(CASE WHEN ok_wlen THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_len,
           CAST(SUM(CASE WHEN ok_symbol THEN 0 ELSE 1 END) AS BIGINT) AS fail_symbol,
           CAST(SUM(CASE WHEN ok_alpha THEN 0 ELSE 1 END) AS BIGINT) AS fail_alpha,
           CAST(SUM(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop
    FROM fl GROUP BY source
    """,
)
def q_gopher_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021) per source
    (``text_clean.gopher_quality_report``): word-count bounds, mean
    word length, symbol-to-word ratio, alphabetic-word ratio, and
    stop-word presence — the MassiveText curation battery next to the
    C4 line rules. Every threshold is pure integer arithmetic over the
    split word array (no floats anywhere), so the per-source counts
    hash exactly."""
    return gopher_quality_report(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Unigram-distribution drift between corpus slices.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    js_divergence,
)


@register(
    "unigram_js_source_drift",
    """
    WITH src AS (
      SELECT w AS c, source = 'src0' AS r
      FROM (SELECT unnest(string_split(text, ' ')) AS w, source FROM documents)
      WHERE w <> ''
    ),
    counts AS (
      SELECT c, CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM src GROUP BY c
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM counts),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cats,
             CAST(MAX(t.na) AS BIGINT) AS n_ref,
             CAST(MAX(t.nb) AS BIGINT) AS n_cur,
             CAST(SUM(cast(round((
               case when a > 0 then 0.5e0 * (a * 1e0 / na) * ln((a * 1e0 / na) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) else 0e0 end +
               case when b > 0 then 0.5e0 * (b * 1e0 / nb) * ln((b * 1e0 / nb) / (0.5e0 * (a * 1e0 / na) + 0.5e0 * (b * 1e0 / nb))) else 0e0 end
             ) * 1e6) as bigint)) AS BIGINT) AS js_u
      FROM counts c, tot t
    )
    SELECT n_cats, n_ref, n_cur, round(js_u / 1e6, 4) AS js FROM s
    """,
)
def q_unigram_js_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between source src0's UNIGRAM
    distribution and the rest of the corpus — "does this source speak a
    different language than the pool", the corpus-mixing drift score a
    pre-training data audit runs per source (pairs with
    ``source_centroid_similarity`` on the embedding side and
    ``corpus_datasheet_by_source``). One token explode + one word-keyed
    count; JS terms ride the micro-unit ln grid (``rankstats.
    js_divergence``), vocabulary-bounded state."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("w"),
        (F.col("source") == "src0").alias("_r"),
    ).where(F.col("w") != "")
    return js_divergence(toks.select(F.col("w").alias("c"), "_r"), "c", "_r")


# ---------------------------------------------------------------------------
# Round 8: Hellinger unigram drift (the metric companion to the JS score).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    HELLINGER_EXPR,
    hellinger_distance,
)


@register(
    "hellinger_unigram_source_drift",
    f"""
    WITH src AS (
      SELECT w AS c, source = 'src0' AS r
      FROM (SELECT unnest(string_split(text, ' ')) AS w, source FROM documents)
      WHERE w <> ''
    ),
    counts AS (
      SELECT c, CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM src GROUP BY c
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM counts),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cats,
             CAST(MAX(t.na) AS BIGINT) AS n_ref,
             CAST(MAX(t.nb) AS BIGINT) AS n_cur,
             CAST(SUM(CAST(ROUND(sqrt((a * 1e0 / na) * (b * 1e0 / nb)) * 1e6)
                  AS BIGINT)) AS BIGINT) AS bc_u
      FROM counts c, tot t
    )
    SELECT n_cats, n_ref, n_cur, {HELLINGER_EXPR} AS hellinger FROM s
    """,
)
def q_hellinger_unigram_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance between source src0's unigram distribution and
    the rest of the corpus (``rankstats.hellinger_distance``) — the
    bounded-metric companion to ``unigram_js_source_drift``: JS weights
    drift by probability mass, Hellinger by amplitude, so rare-token
    drift registers here first. Same one-explode vocabulary-bounded
    shape; Bhattacharyya terms ride the 1e-6 grid."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("w"),
        (F.col("source") == "src0").alias("_r"),
    ).where(F.col("w") != "")
    return hellinger_distance(toks.select(F.col("w").alias("c"), "_r"), "c", "_r")


# ---------------------------------------------------------------------------
# Round 8: vocabulary-coverage and lexical-diversity corpus audits.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    lexical_diversity_by_source,
    oov_rate_by_source,
)


@register(
    "oov_rate_by_source",
    """
    WITH toks AS (
      SELECT source, w
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rn
        FROM toks WHERE source = 'src0' GROUP BY w
      ) WHERE rn <= 1000
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           (SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
             // COUNT(*)) / 1e6 AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.source
    """,
)
def q_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against src0's top-1000 token
    vocabulary (``text_rank.oov_rate_by_source``) — the tokenizer-
    coverage audit of the corpus-mixing battery (high OOV → byte
    fallback → wasted sequence budget). Deterministic top-k vocab
    (count DESC, token ASC), one broadcast membership join,
    floor-division micro-ratios."""
    return oov_rate_by_source(_t(spark, sf_dir, "documents"), "src0", 1000)


@register(
    "lexical_diversity_by_source",
    """
    WITH wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           (COUNT(*) * 1000000 // SUM(c)) / 1e6 AS ttr,
           (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
             // COUNT(*)) / 1e6 AS hapax_share
    FROM wc GROUP BY source
    """,
)
def q_lexical_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type-token ratio and hapax share
    (``text_rank.lexical_diversity_by_source``) — the richness /
    templatedness signals beside the Zipf and Heaps fits in the corpus
    datasheet: boilerplate sources read LOW TTR, OCR-noise sources read
    HIGH hapax share. Vocabulary-bounded state, integer micro-ratios."""
    return lexical_diversity_by_source(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Round 8: bigram conditional entropy (corpus predictability) per source.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    bigram_conditional_entropy_by_source,
)


@register(
    "bigram_cond_entropy_by_source",
    """
    WITH tl AS (
      SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    fan AS (
      SELECT source, t, unnest(range(1, len(t))) AS i
      FROM tl WHERE len(t) >= 2
    ),
    bg AS (
      SELECT source, t[CAST(i AS BIGINT)] AS cur, t[CAST(i AS BIGINT) + 1] AS nxt,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM fan GROUP BY 1, 2, 3
    ),
    marg AS (SELECT source, cur, CAST(SUM(c) AS BIGINT) AS cx
             FROM bg GROUP BY source, cur),
    scal AS (
      SELECT b.source,
             CAST(SUM(c) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(ROUND(c * (ln(cx * 1e0) - ln(c * 1e0)) * 1e6)
               AS BIGINT)) AS BIGINT) AS h_u
      FROM bg b JOIN marg m ON b.source = m.source AND b.cur = m.cur
      GROUP BY b.source
    )
    SELECT source, n_bigrams, (h_u // n_bigrams) / 1e6 AS h_cond FROM scal
    """,
)
def q_bigram_cond_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram conditional entropy H(next | current)
    (``text_rank.bigram_conditional_entropy_by_source``) — the
    predictability of each source's token stream: templated sources
    read near 0 (next token determined), rich sources read high. The
    third corpus-statistics lens beside ``lexical_diversity_by_source``
    and the Zipf/Heaps fits; bigram-vocabulary-bounded state,
    micro-grid ln terms, integer-division finalization."""
    return bigram_conditional_entropy_by_source(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Round 8: Dunning log-likelihood keyness (distinctive vocabulary).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    dunning_keyness_top_terms,
)


@register(
    "dunning_keyness_src0",
    """
    WITH toks AS (
      SELECT source = 'src0' AS r, w
      FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ),
    counts AS (
      SELECT w, CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN r THEN 0 ELSE 1 END) AS BIGINT) AS b
      FROM toks GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM counts),
    scored AS (
      SELECT w, a, b,
             CAST(ROUND(2e0 * (
               CASE WHEN a > 0 THEN a * ln(a * 1e0 * (na + nb) / ((a + b) * 1e0 * na)) ELSE 0e0 END
               + CASE WHEN b > 0 THEN b * ln(b * 1e0 * (na + nb) / ((a + b) * 1e0 * nb)) ELSE 0e0 END
             ) * 1e6) AS BIGINT) AS g2_u,
             (a * 1e0 / na > b * 1e0 / nb) AS enriched
      FROM counts, tot
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY g2_u DESC, w ASC) AS INT) AS rank,
           w AS token, a, b,
           ROUND(CAST(g2_u AS DOUBLE) / 1e6, 4) AS g2, enriched
    FROM scored
    ORDER BY g2_u DESC, w ASC LIMIT 10
    """,
)
def q_dunning_keyness_src0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 Dunning G² keywords of source src0 vs the rest
    (``text_rank.dunning_keyness_top_terms``) — which tokens make the
    slice DISTINCTIVE (the corpus-linguistics keyness statistic, better
    calibrated than χ²/ratio on rare tokens). Completes the
    source-audit battery beside the JS/Hellinger drift scores (those
    say HOW different; keyness says WITH WHICH WORDS). Deterministic
    (g2, token) top-k; vocabulary-bounded state."""
    return dunning_keyness_top_terms(_t(spark, sf_dir, "documents"), "src0", 10)


# ---------------------------------------------------------------------------
# Readability (round 10)
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text_clean import (  # noqa: E402
    FK_GRADE_EXPR,
    flesch_kincaid_by_group,
)


@register(
    "readability_by_source",
    f"""
    WITH per AS (
      SELECT source,
             len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                 w -> w <> '')) AS w_,
             COALESCE(list_sum(list_transform(
                 list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             w -> w <> ''),
                 w -> GREATEST(1, len(list_filter(
                        string_split_regex(w, '[^aeiouy]+'),
                        p -> p <> ''))))), 0) AS y_,
             GREATEST(1, len(string_split_regex(text, '[.!?]+')) - 1) AS s_
      FROM documents
    ),
    agg AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(w_) AS BIGINT) AS w,
             CAST(SUM(y_) AS BIGINT) AS y,
             CAST(SUM(s_) AS BIGINT) AS s
      FROM per GROUP BY source
    )
    SELECT g, n_docs, w AS n_words, y AS n_syllables, s AS n_sentences,
           {FK_GRADE_EXPR} AS fk_grade
    FROM agg
    """,
)
def q_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per source
    (``text_clean.flesch_kincaid_by_group``) — the complexity signal a
    curation pipeline keys age-band/textbook-vs-forum routing on, joining
    the quality battery beside the Gopher rules and LM-quality scores.
    Pure JVM higher-order expressions (split/filter/aggregate lambdas —
    no UDF); per-document word / vowel-group-syllable / sentence-run
    counts are exact integers rolled up in ONE keyed aggregation, and the
    grade is the shared ``FK_GRADE_EXPR`` over BIGINT totals — the
    oracle recomputes the identical heuristic with DuckDB list lambdas."""
    docs = _t(spark, sf_dir, "documents")
    return flesch_kincaid_by_group(docs, "text", "source")


from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    ks_vs_rest_by_group,
)


@register(
    "ks_drift_by_source",
    """
    WITH src AS (SELECT source AS g, n_chars AS v FROM documents),
    byval AS MATERIALIZED (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY 1, 2
    ),
    pooled AS (
      SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM byval GROUP BY v
    ),
    pcum AS MATERIALIZED (
      SELECT v, CAST(SUM(cv) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cumpool
      FROM pooled
    ),
    groups AS MATERIALIZED (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM byval GROUP BY g
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM byval),
    grid AS (
      SELECT gr.g, p.v, gr.n_g, p.cumpool, COALESCE(b.c, 0) AS c
      FROM pcum p CROSS JOIN groups gr
      LEFT JOIN byval b ON b.g = gr.g AND b.v = p.v
    ),
    cumg AS (
      SELECT g, n_g, cumpool,
             CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_g
      FROM grid
    ),
    scal AS (
      SELECT g, CAST(MAX(n_g) AS BIGINT) AS n_g,
             CAST(MAX(t.nn - n_g) AS BIGINT) AS n_rest,
             CAST(MAX(ABS(CAST(cum_g AS HUGEINT) * (t.nn - n_g)
                          - CAST(cumpool - cum_g AS HUGEINT) * n_g))
                  AS BIGINT) AS d_num
      FROM cumg, tot t GROUP BY g
    )
    SELECT g, n_g, n_rest, d_num,
           round(d_num * 1e0 / (n_g * 1e0 * n_rest), 4) AS d
    FROM scal
    """,
)
def q_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice KS drift audit (``rankstats.ks_vs_rest_by_group``): for each
    source, the exact two-sample KS distance between its document-length
    distribution and the REST of the corpus — the scheduled which-slice-
    drifted monitor beside the pairwise ``distribution_drift_panel``.
    The group CDF is evaluated on the POOLED distinct-value grid (the
    sup can fall at a value the slice never takes), per-group cumulatives
    ride group-KEYED windows, and the pooled cumulative reuses the
    bucketed rank machinery — the grid is |sources| x |distinct lengths|,
    bounded by the value grid, never data rows."""
    docs = _t(spark, sf_dir, "documents")
    return ks_vs_rest_by_group(docs, "n_chars", "source")


# ---------------------------------------------------------------------------
# Per-slice drift panel (round 11): the full two-sample battery per source.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.functions.rankstats import (  # noqa: E402
    AB_Z_EXPR as _GP_AB_Z,
    AD_RIGHT_A2_EXPR as _GP_AD_A2,
    BM_W_EXPR as _GP_BM_W,
    CVM_T_EXPR as _GP_CVM_T,
    LEPAGE_EXPR as _GP_LEPAGE,
    MW_Z_EXPR as _GP_MW_Z,
    drift_panel_by_group,
)
from azure_medicine_data_engineering_spark.queries.medstats import (  # noqa: E402
    _ab_t_sql,
    _mood_q4_sql,
)

#: the shared per-(group, pooled-value) grid all member statistics read —
#: one byval collapse, pooled cumulative from the SAME collapse, group-
#: keyed cumulative windows, n_rest = 0 slices excluded (mirror of
#: rankstats._group_vs_rest_grid).
_GP_GRID = """
    byval AS MATERIALIZED (
      SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY 1, 2
    ),
    pv AS MATERIALIZED (
      SELECT v, CAST(SUM(c) AS BIGINT) AS cv FROM byval GROUP BY v
    ),
    pooled AS MATERIALIZED (
      SELECT v, cv, CAST(SUM(cv) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS cumpool
      FROM pv
    ),
    groups_ AS MATERIALIZED (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM byval GROUP BY g
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM byval),
    grid0 AS MATERIALIZED (
      SELECT gr.g, p.v,
             COALESCE(b.c, 0) AS c1,
             p.cv - COALESCE(b.c, 0) AS c2,
             p.cv AS c_all,
             p.cumpool - p.cv AS cnt_less,
             p.cumpool AS cumpool,
             gr.n_g AS n1, t.nn - gr.n_g AS n2, t.nn AS nn,
             CAST(SUM(COALESCE(b.c, 0)) OVER (PARTITION BY gr.g ORDER BY p.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum1
      FROM pooled p CROSS JOIN groups_ gr
      LEFT JOIN byval b ON b.g = gr.g AND b.v = p.v
      CROSS JOIN tot t
      WHERE t.nn > gr.n_g
    ),
    grid AS MATERIALIZED (
      SELECT *, cumpool - cum1 AS cum2,
             (nn + 1) // 2 AS m0,
             ((nn + 1) // 2) * ((nn + 1) // 2 + 1) // 2 AS tm0
      FROM grid0
    )"""


@register(
    "drift_panel_by_source",
    f"""
    WITH src AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
                 FROM documents),
    {_GP_GRID},
    mws AS (
      SELECT g, CAST(SUM(c1 * (2 * cnt_less + c_all + 1)) AS BIGINT) AS r1x2,
             CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c_all AS HUGEINT) * c_all * c_all - c_all)
                  AS DOUBLE) AS tiesum
      FROM grid GROUP BY g
    ),
    mwz AS MATERIALIZED (SELECT g, n1, n2, {_GP_MW_Z} AS zw FROM mws),
    abterms AS (
      SELECT g, c_all, c1, nn, n1, n2,
             {_ab_t_sql('(cnt_less + c_all)')} - {_ab_t_sql('cnt_less')} AS b_s
      FROM grid
    ),
    abscal AS (
      SELECT g, CAST(MAX(nn) AS BIGINT) AS nn, CAST(MAX(n1) AS BIGINT) AS n1,
             CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(SUM(b_s) AS BIGINT) AS sa_i,
             SUM(CAST(FLOOR(c1 * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b_s * 1e0 * b_s / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS sa2_h
      FROM abterms GROUP BY g
    ),
    abdbl AS (
      SELECT g, n1, n2, nn, CAST(w_h AS DOUBLE) / 1e4 AS w,
             CAST(sa_i AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) / 1e4 AS sa2
      FROM abscal
    ),
    abz AS MATERIALIZED (SELECT g, n1, n2, {_GP_AB_Z} AS za FROM abdbl),
    mterms AS (
      SELECT g, c_all, c1, nn, n1, n2,
             CAST({_mood_q4_sql('(cnt_less + c_all)')}
                  - {_mood_q4_sql('cnt_less')} AS DOUBLE) AS b4,
             {_mood_q4_sql('(cnt_less + c_all)')}
                  - {_mood_q4_sql('cnt_less')} AS b4_h
      FROM grid
    ),
    mscal AS (
      SELECT g, CAST(MAX(nn) AS BIGINT) AS nn, CAST(MAX(n1) AS BIGINT) AS n1,
             CAST(MAX(n2) AS BIGINT) AS n2,
             SUM(b4_h) AS sa_h,
             SUM(CAST(FLOOR(c1 * 1e0 * b4 / c_all * 1e4 + 0.5e0) AS HUGEINT))
               AS w_h,
             SUM(CAST(FLOOR(b4 * b4 / c_all + 0.5e0) AS HUGEINT)) AS sa2_h
      FROM mterms GROUP BY g
    ),
    mdbl AS (
      SELECT g, n1, n2, nn, CAST(w_h AS DOUBLE) / 1e4 AS w,
             CAST(sa_h AS DOUBLE) AS sa, CAST(sa2_h AS DOUBLE) AS sa2
      FROM mscal
    ),
    mz AS (SELECT g, n1, n2, {_GP_AB_Z} AS z_mood FROM mdbl),
    ksd AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(MAX(ABS(CAST(cum1 AS HUGEINT) * n2
                          - CAST(cum2 AS HUGEINT) * n1)) AS BIGINT) AS d_num
      FROM grid GROUP BY g
    ),
    cvs AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             SUM(CAST(c_all AS HUGEINT)
                 * (CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1)
                 * (CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1))
               AS u_d
      FROM grid GROUP BY g
    ),
    kpr AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             GREATEST(MAX(CAST(cum1 AS HUGEINT) * n2
                          - CAST(cum2 AS HUGEINT) * n1), 0) AS dplus_h,
             GREATEST(MAX(CAST(cum2 AS HUGEINT) * n1
                          - CAST(cum1 AS HUGEINT) * n2), 0) AS dminus_h
      FROM grid GROUP BY g
    ),
    adr AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(MAX(nn) AS BIGINT) AS nn,
             SUM(CASE WHEN cumpool < nn THEN
                 CAST(FLOOR(c_all
                      * CAST(CAST(cum1 AS HUGEINT) * n2
                             - CAST(cum2 AS HUGEINT) * n1 AS DOUBLE)
                      * CAST(CAST(cum1 AS HUGEINT) * n2
                             - CAST(cum2 AS HUGEINT) * n1 AS DOUBLE)
                      / (CAST(cumpool AS DOUBLE) * (nn - cumpool))
                      * 1e6 + 0.5e0) AS HUGEINT)
                 ELSE 0 END) AS s_h
      FROM grid GROUP BY g
    ),
    bmtot AS MATERIALIZED (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             SUM(CAST(c1 AS HUGEINT) * (2 * cumpool - c_all + 1)) AS r1s2_h,
             SUM(CAST(c2 AS HUGEINT) * (2 * cumpool - c_all + 1)) AS r2s2_h
      FROM grid GROUP BY g
    ),
    bmterms AS (
      SELECT c.g, c.c1, c.c2, t.n1, t.n2, t.r1s2_h, t.r2s2_h,
             2 * c.cumpool - c.c_all + 1 AS m2,
             2 * c.cum1 - c.c1 + 1 AS w1_2,
             2 * c.cum2 - c.c2 + 1 AS w2_2
      FROM grid c JOIN bmtot t USING (g)
    ),
    bmscal AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h)
                         * (CAST(n1 AS HUGEINT) * (m2 - w1_2 + n1 + 1) - r1s2_h))
                  AS DOUBLE) AS s1,
             CAST(SUM(c2 * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h)
                         * (CAST(n2 AS HUGEINT) * (m2 - w2_2 + n2 + 1) - r2s2_h))
                  AS DOUBLE) AS s2,
             CAST(MAX(r1s2_h) AS DOUBLE) AS r1s2,
             CAST(MAX(r2s2_h) AS DOUBLE) AS r2s2
      FROM bmterms GROUP BY g
    ),
    bmw AS (SELECT g, n1, n2, {_GP_BM_W} AS w_bm FROM bmscal),
    qsagg AS (
      SELECT c.g, ks_.k,
             CAST(MAX(c.n1) AS BIGINT) AS n1, CAST(MAX(c.n2) AS BIGINT) AS n2,
             MIN(CASE WHEN c.cum1 >= (ks_.k * c.n1 + 9) // 10 THEN c.v END)
               AS q1_v,
             MIN(CASE WHEN c.cum2 >= (ks_.k * c.n2 + 9) // 10 THEN c.v END)
               AS q2_v
      FROM grid c, range(1, 10) ks_(k)
      GROUP BY c.g, ks_.k
    ),
    qsm AS (
      SELECT g, CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
             CAST(MAX(ABS(q2_v - q1_v)) AS DOUBLE) AS ms
      FROM qsagg GROUP BY g
    )
    SELECT g, 'mann_whitney_z' AS test, 'location' AS family,
           zw AS stat, n1, n2 FROM mwz
    UNION ALL
    SELECT g, 'brunner_munzel_w', 'location', w_bm, n1, n2 FROM bmw
    UNION ALL
    SELECT g, 'ansari_bradley_z', 'scale', za, n1, n2 FROM abz
    UNION ALL
    SELECT g, 'mood_scale_z', 'scale', z_mood, n1, n2 FROM mz
    UNION ALL
    SELECT m.g, 'lepage_l', 'location+scale',
           ROUND(m.zw * m.zw + a.za * a.za, 4), m.n1, m.n2
    FROM mwz m JOIN abz a USING (g)
    UNION ALL
    SELECT g, 'ks_d', 'shape',
           ROUND(CAST(d_num AS DOUBLE) / (n1 * 1e0 * n2), 4), n1, n2
    FROM ksd
    UNION ALL
    SELECT g, 'cvm_t', 'shape', stat, n1, n2 FROM (
      SELECT g, n1, n2, {_GP_CVM_T} AS stat FROM cvs
    )
    UNION ALL
    SELECT g, 'kuiper_v', 'shape',
           ROUND((dplus_h + dminus_h) * 1e0 / (n1 * 1e0 * n2), 4), n1, n2
    FROM kpr
    UNION ALL
    SELECT g, 'anderson_darling_a2', 'shape', stat, n1, n2 FROM (
      SELECT g, n1, n2, nn, CAST(s_h AS DOUBLE) AS s_u, {_GP_AD_A2} AS stat
      FROM adr
    )
    UNION ALL
    SELECT g, 'max_decile_shift', 'localization', ms, n1, n2 FROM qsm
    """,
)
def q_drift_panel_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-slice drift panel (round 11, ``rankstats.drift_panel_by_group``):
    the full two-sample battery — location (Mann-Whitney,
    Brunner-Munzel), scale (Ansari-Bradley, Mood), joint (Lepage), shape
    (KS, CvM, Kuiper, right-continuous Anderson-Darling) and
    localization (max decile shift) — for EVERY source against the rest
    of the corpus, off ONE shared per-(group, pooled-value) grid (one
    fact collapse; pooled rank quantities shared across slices,
    group-keyed windows only). The monitoring table a curation team keys
    alerts on; every statistic reuses the pairwise panel's exact integer
    state and shared finalization expressions, per slice."""
    docs = _t(spark, sf_dir, "documents")
    return drift_panel_by_group(docs, "n_chars", "source")


# ---------------------------------------------------------------------------
# Corpus data card (round 11): the per-source datasheet a team publishes.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.queries.registry import (  # noqa: E402
    ORACLES as _CARD_O,
)

_CARD_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


@register(
    "corpus_data_card",
    f"""
    WITH base AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(len({_CARD_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    fp AS (SELECT doc_id, source AS g, md5(text) AS h FROM documents),
    dup_h AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) >= 2),
    dup AS (
      SELECT f.g, CAST(COUNT(*) AS BIGINT) AS n_dup
      FROM fp f JOIN dup_h USING (h) GROUP BY f.g
    ),
    tokv AS (
      SELECT source AS g, unnest({_CARD_TOKS}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tokv GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lpu AS (
      SELECT tok, CAST(ROUND(ln(cnt / (total * 1e0)) * 1e6) AS BIGINT) AS lpu
      FROM vocab, tot
    ),
    nll AS (
      SELECT t.g, CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll_micro
      FROM tokv t JOIN lpu l USING (tok) GROUP BY t.g
    )
    SELECT b.g,
           b.n_docs,
           b.n_tokens,
           (b.sum_chars * 1000000 // b.n_docs) / 1e6 AS mean_chars,
           (COALESCE(d.n_dup, 0) * 1000000 // b.n_docs) / 1e6 AS exact_dup_frac,
           (gp.n_pass * 1000000 // gp.n_docs) / 1e6 AS gopher_pass_frac,
           k.d AS ks_vs_rest_d,
           nll.nll_micro
    FROM base b
    LEFT JOIN dup d USING (g)
    JOIN (SELECT source AS g, n_docs, n_pass
          FROM ({_CARD_O["gopher_quality_by_source"]})) gp USING (g)
    JOIN (SELECT g, d FROM ({_CARD_O["ks_drift_by_source"]})) k USING (g)
    JOIN nll USING (g)
    """,
)
def q_corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source CORPUS DATA CARD (round 11) — the datasheet a team
    publishes with a dataset, one row per source: volume (docs, tokens,
    mean chars), exact-duplicate exposure (corpus-wide md5 fingerprints
    appearing ≥2×), Gopher all-rules pass fraction, KS drift of the
    length distribution vs the rest, and the mean unigram NLL on the
    1e-6 grid. Every cell reuses an already-oracled component (the
    oracle EMBEDS the registered gopher and KS oracles as subquery
    scopes, so the card can never drift from its parts); fractions are
    exact micro-grid integer divisions. One scan per component family,
    all aggregations source-keyed."""
    from pyspark.sql import functions as FF

    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ks_vs_rest_by_group,
    )
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        gopher_quality_report,
    )

    docs = _t(spark, sf_dir, "documents")
    toks_col = FF.filter(
        FF.split(FF.col("text"), r"\s+"), lambda x: x != ""
    )
    base = docs.groupBy(FF.col("source").alias("g")).agg(
        FF.count(FF.lit(1)).cast("long").alias("n_docs"),
        FF.sum("n_chars").cast("long").alias("sum_chars"),
        FF.sum(FF.size(toks_col)).cast("long").alias("n_tokens"),
    )
    fp = docs.select(
        FF.col("source").alias("g"), FF.md5("text").alias("h")
    )
    dup_h = fp.groupBy("h").agg(
        FF.count(FF.lit(1)).alias("cnt")
    ).where("cnt >= 2").select("h")
    dup = fp.join(dup_h, "h").groupBy("g").agg(
        FF.count(FF.lit(1)).cast("long").alias("n_dup")
    )
    gp = gopher_quality_report(docs).select(
        FF.col("source").alias("g"),
        FF.col("n_docs").alias("gp_docs"),
        FF.col("n_pass"),
    )
    ks = ks_vs_rest_by_group(docs, "n_chars", "source")
    tokv = docs.select(
        FF.col("source").alias("g"), FF.explode(toks_col).alias("tok")
    )
    vocab = tokv.groupBy("tok").agg(FF.count(FF.lit(1)).cast("long").alias("cnt"))
    tot = vocab.agg(FF.sum("cnt").cast("long").alias("total"))
    lpu = vocab.crossJoin(FF.broadcast(tot)).selectExpr(
        "tok", "CAST(ROUND(ln(cnt / (total * 1e0)) * 1e6) AS BIGINT) AS lpu"
    )
    nll = (
        tokv.join(lpu, "tok")
        .groupBy("g")
        .agg(
            # DECIMAL(38,0): per-source token sums wrap BIGINT at ~1e12
            # tokens/source (micro-grid sum convention; HUGEINT in oracle)
            FF.sum(FF.col("lpu").cast("decimal(38,0)")).alias("slpu"),
            FF.count(FF.lit(1)).alias("ntok"),
        )
        .selectExpr("g", "(-slpu) div ntok AS nll_micro")
    )
    out = (
        base.join(dup, "g", "left")
        .join(gp, "g")
        .join(ks.select("g", FF.col("d").alias("ks_vs_rest_d")), "g")
        .join(nll, "g")
        .selectExpr(
            "g",
            "n_docs",
            "n_tokens",
            "(sum_chars * 1000000 div n_docs) / 1e6 AS mean_chars",
            "(coalesce(n_dup, 0) * 1000000 div n_docs) / 1e6 AS exact_dup_frac",
            "(n_pass * 1000000 div gp_docs) / 1e6 AS gopher_pass_frac",
            "ks_vs_rest_d",
            "nll_micro",
        )
    )
    out._stage_caches = list(getattr(ks, "_stage_caches", []))
    return out


# ---------------------------------------------------------------------------
# CJK / whitespace-free-script routing (round 12).
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.text_clean import (  # noqa: E402
    CJK_RANGE_PATTERN,
    CJK_STOP_CHARS,
    CJK_TRANSLATE_TO,
    cjk_char_count,
    cjk_stop_hits,
    script_route,
    text_units,
)

_ASCII_LC = "abcdefghijklmnopqrstuvwxyz"
_CJK_STOPS_SQL = " + ".join(
    f"CAST(list_contains(ws, '{sw}') AS INT)" for sw in GOPHER_STOP_WORDS
)
# routed CJK particle rule (round 13): distinct-particle containment over
# the character stream — mirrors text_clean.cjk_stop_hits
_CJK_PARTICLES_SQL = " + ".join(
    f"CAST(position('{p}' IN t2) > 0 AS INT)"
    for p in CJK_STOP_CHARS
)


@register(
    "gopher_quality_cjk_routed",
    f"""
    WITH t AS MATERIALIZED (
      SELECT source,
             CASE WHEN doc_id % 5 = 0
                  THEN replace(translate(lower(text),
                         '{_ASCII_LC}', '{CJK_TRANSLATE_TO}'), ' ', '')
                  ELSE text END AS t2
      FROM documents
    ),
    r AS (
      SELECT source, t2,
             len(regexp_extract_all(t2, '{CJK_RANGE_PATTERN}')) AS n_cjk,
             CAST(len(list_filter(regexp_split_to_array(t2, '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_ws,
             list_filter(string_split(t2, ' '), x -> x <> '') AS ws
      FROM t
    ),
    u AS (
      SELECT source,
             CASE WHEN 100 * n_cjk >= 30 * length(t2)
                  THEN 'cjk' ELSE 'latin' END AS script,
             n_ws,
             CASE WHEN 100 * n_cjk >= 30 * length(t2)
                  THEN CAST(n_cjk AS BIGINT) ELSE n_ws END AS units,
             CASE WHEN 100 * n_cjk >= 30 * length(t2)
                  THEN CASE WHEN ({_CJK_PARTICLES_SQL}) >= 1 THEN 1 ELSE 0 END
                  ELSE CASE WHEN ({_CJK_STOPS_SQL}) >= 1 THEN 1 ELSE 0 END
             END AS stop_ok
      FROM r
    )
    SELECT source, script,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(units) AS BIGINT) AS n_units,
           CAST(SUM(CASE WHEN units BETWEEN 30 AND 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_len_ok,
           CAST(SUM(stop_ok) AS BIGINT) AS n_stop_ok
    FROM u GROUP BY source, script
    """,
)
def q_gopher_quality_cjk_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-routed quality counting over a corpus with a CJK slice
    (round 12 — the whitespace-free robustness gap): docs with
    ``doc_id % 5 = 0`` are deterministically transliterated to
    space-free CJK (a-z -> the first 26 Unified Ideographs, spaces
    removed — the fixture slice), then every doc routes by script
    (``>= 30%`` CJK chars) and counts the RIGHT unit — whitespace words
    for latin, CJK CHARACTERS for CJK (`operators/text_clean.py:
    text_units`). The report keeps ``n_ws_tokens`` alongside
    ``n_units`` to make the documented failure mode visible: whitespace
    tokenization collapses an unbroken CJK doc to ~1 'word'.
    ROUTED STOP RULE (round 13 closes the documented r12 gap): the
    stop-word gate is script-ROUTED — latin docs count distinct Gopher
    stop WORDS (whitespace tokens), CJK docs count distinct standard
    Chinese particles (`text_clean.CJK_STOP_CHARS`) by SUBSTRING
    containment (no word boundaries in CJK); ``n_stop_ok`` counts docs
    passing their own route's rule, so the gate is meaningful on both
    routes. Length bounds apply to the routed unit. Pure column
    algebra, one keyed aggregation."""
    d = _t(spark, sf_dir, "documents")
    cjk_txt = F.replace(
        F.translate(F.lower(F.col("text")), _ASCII_LC, CJK_TRANSLATE_TO),
        F.lit(" "),
        F.lit(""),
    )
    t2 = F.when(F.col("doc_id") % 5 == 0, cjk_txt).otherwise(F.col("text"))
    base = d.select("source", t2.alias("t2"))
    ws_words = F.size(
        F.filter(F.split(F.col("t2"), r"\s+"), lambda x: x != "")
    ).cast("long")
    words_sp = F.filter(F.split(F.col("t2"), " "), lambda x: x != "")
    stop_hits = sum(
        F.array_contains(words_sp, sw).cast("int") for sw in GOPHER_STOP_WORDS
    )
    staged = base.select(
        "source",
        script_route(F.col("t2")).alias("script"),
        ws_words.alias("n_ws"),
        text_units(F.col("t2")).alias("units"),
        F.when(
            script_route(F.col("t2")) == "cjk",
            (cjk_stop_hits(F.col("t2")) >= 1),
        )
        .otherwise(stop_hits >= 1)
        .cast("int")
        .alias("stop_ok"),
    )
    return staged.groupBy("source", "script").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_ws").cast("long").alias("n_ws_tokens"),
        F.sum("units").cast("long").alias("n_units"),
        F.sum(
            ((F.col("units") >= 30) & (F.col("units") <= 100000)).cast("long")
        ).cast("long").alias("n_len_ok"),
        F.sum("stop_ok").cast("long").alias("n_stop_ok"),
    )
