"""End-to-end crawl funnel (round 12): sitemap frontier -> robots gate ->
WARC fetch -> content-type-routed extraction (HTML and PDF) -> C4 line
cleanup -> Gopher quality gate -> exact dedup, with per-stage survivor /
drop counts and sum-of-ids membership checksums — the
``corpus_e2e_filter`` funnel discipline applied to the crawl chain whose
stages rounds 10-11 verified individually.

Every stage runs the REAL kernel (XML parse, REP evaluator, WARC demux,
HTML/PDF extraction) while the oracle replays the fixture closed forms
CTE-for-CTE, so the whole chain must be bit-exact end to end for the
funnel counts and checksums to hash-match.

Scale: URL stages are fan-out map passes; fetch is one semi-join on
doc_id; extraction is map-only Arrow; C4/Gopher are column algebra; the
dedup window is keyed by content fingerprint (duplicate-group-sized).
Every intermediate frame is persisted because each feeds BOTH the next
stage and its own funnel row (CLAUDE.md union-per-fate rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)

_BANNED_SQL = (
    "NOT contains(lower(l), 'javascript') "
    "AND NOT contains(lower(l), 'lorem ipsum') "
    "AND NOT contains(lower(l), '{')"
)

_STAGE_ROW = (
    "SELECT {sid} AS stage_id, '{name}' AS stage, "
    "CAST(COUNT(*) AS BIGINT) AS n_out, "
    "CAST(COALESCE(SUM({idc}), 0) AS BIGINT) AS sum_ids FROM {src}"
)


def _gopher_stops_sql() -> str:
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        GOPHER_STOP_WORDS,
    )

    return " + ".join(
        f"CAST(list_contains(ws, '{sw}') AS INT)" for sw in GOPHER_STOP_WORDS
    )


def _funnel_oracle() -> str:
    rows = "\n      UNION ALL ".join(
        _STAGE_ROW.format(sid=sid, name=name, idc=idc, src=src)
        for sid, name, idc, src in [
            (0, "frontier_urls", "doc_id", "urls"),
            (1, "robots_allowed", "doc_id", "ok_urls"),
            (2, "fetched_docs", "doc_id", "fetched"),
            (3, "extracted_docs", "doc_id", "ext"),
            (4, "c4_line_clean", "doc_id", "s4"),
            (5, "gopher_pass", "doc_id", "s5"),
            (6, "exact_dedup", "doc_id", "s6"),
        ]
    )
    return f"""
    WITH m AS MATERIALIZED (
      SELECT doc_id, text, md5(text) AS hex,
             substr(md5(text), 1, 8) AS hex8,
             1 + CAST(('0x' || substr(md5(text), 5, 1)) AS INT) % 4 AS n_urls,
             trim(regexp_replace(text, '[ \\t\\n\\f\\r]+', ' ', 'g')) AS collapsed
      FROM documents
    ),
    urls AS MATERIALIZED (
      SELECT doc_id, CAST(k AS INT) AS pos,
             CASE WHEN CAST(('0x' || substr(hex, k + 2, 1)) AS INT) % 3 <> 2
                  THEN '/p' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
                  ELSE '/q' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
             END
             || CASE CAST(('0x' || substr(hex, k + 3, 1)) AS INT) % 3
                  WHEN 0 THEN '' WHEN 1 THEN '/open' ELSE '/deep' END
             || '/page' || substr(hex, k + 4, 1) AS path
      FROM m, range(0, 4) t(k) WHERE k < n_urls
    ),
    gated AS MATERIALIZED (
      SELECT doc_id, pos, path,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR))
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR)) ELSE -1 END AS s1,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open')
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open') ELSE -1 END AS s2,
             CASE WHEN starts_with(path, '/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep')
                  THEN length('/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep') ELSE -1 END AS s3
      FROM urls
    ),
    ok_urls AS MATERIALIZED (
      SELECT doc_id, pos FROM gated
      WHERE GREATEST(s1, s2, s3) = -1 OR s2 = GREATEST(s1, s2, s3)
    ),
    fetched AS MATERIALIZED (SELECT DISTINCT doc_id FROM ok_urls),
    ext0 AS MATERIALIZED (
      SELECT m.doc_id,
             CASE WHEN m.doc_id % 3 <> 0 THEN
               'T' || hex8 || chr(10) || 'Doc ' || CAST(m.doc_id AS VARCHAR)
               || CASE WHEN collapsed <> '' THEN chr(10) || collapsed ELSE '' END
             ELSE
               'Doc ' || CAST(m.doc_id AS VARCHAR)
               || CASE WHEN length(text) > 0
                       THEN chr(10) || array_to_string(
                         list_transform(range(1, CAST((length(text) + 79) // 80 AS INTEGER) + 1),
                           i -> substr(text, (i - 1) * 80 + 1, 80)),
                         chr(10))
                       ELSE '' END
             END AS extracted
      FROM m JOIN fetched USING (doc_id)
    ),
    -- mirrors the Spark side's non-empty gate (dead on current fixtures,
    -- but an unmirrored predicate is a latent parity break)
    ext AS MATERIALIZED (
      SELECT doc_id, extracted FROM ext0 WHERE length(extracted) > 0
    ),
    s4 AS MATERIALIZED (
      SELECT doc_id,
             array_to_string(
               list_filter(string_split(extracted, chr(10)),
                 l -> len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
                      AND {_BANNED_SQL}),
               chr(10)) AS clean
      FROM ext
      WHERE len(list_filter(string_split(extracted, chr(10)),
              l -> len(list_filter(string_split(l, ' '), x -> x <> '')) >= 5
                   AND {_BANNED_SQL})) >= 1
    ),
    gf AS MATERIALIZED (
      SELECT doc_id, clean,
             list_filter(string_split(clean, ' '), x -> x <> '') AS ws,
             length(clean) - length(replace(clean, '#', '')) AS n_hash,
             (length(clean) - length(replace(clean, '...', ''))) // 3 AS n_ell
      FROM s4
    ),
    s5 AS MATERIALIZED (
      SELECT doc_id, clean FROM (
        SELECT doc_id, clean, len(ws) AS nw,
               COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,
               len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS na,
               n_hash, n_ell, ({_gopher_stops_sql()}) AS stop_hits
        FROM gf
      )
      WHERE nw >= 30 AND nw <= 100000
        AND tc >= 3 * nw AND tc <= 10 * nw
        AND 10 * (n_hash + n_ell) <= nw
        AND 10 * na >= 8 * nw
        AND stop_hits >= 1
    ),
    s6 AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(clean)
                                          ORDER BY doc_id) AS rn
        FROM s5
      ) WHERE rn = 1
    ),
    funnel AS (
      {rows}
    )
    SELECT CAST(stage_id AS INT) AS stage_id, stage, n_out,
           CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage_id) - n_out, 0) AS BIGINT)
             AS n_dropped,
           sum_ids
    FROM funnel
    """


@register("crawl_e2e_frontier_docs", _funnel_oracle())
def q_crawl_e2e_frontier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete crawl chain as ONE funnel (see module docstring):
    sitemap URL discovery (``sources/sitemap.py``, robots-rule-space
    frontier paths) -> REP gate on every frontier URL
    (``operators/robots.py:robots_gate_urls``) -> fetch = docs with >= 1
    allowed URL -> WARC->HTML extraction for 2/3 of docs and PDF
    extraction for the rest (content-type routing; real kernels, text
    emitted) -> C4 line cleanup -> Gopher all-rules gate -> exact dedup.
    Output: the per-stage funnel report."""
    from azure_medicine_data_engineering_spark.operators.html_text import (
        warc_html_extract,
    )
    from azure_medicine_data_engineering_spark.operators.pdf_text import (
        attach_pdf_payload,
        pdf_extract_e2e,
    )
    from azure_medicine_data_engineering_spark.operators.robots import (
        robots_gate_urls,
    )
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        c4_line_filter,
        gopher_ok_all,
    )
    from azure_medicine_data_engineering_spark.sources.sitemap import (
        attach_frontier_sitemap_payload,
        sitemap_ingest_urls,
    )
    from azure_medicine_data_engineering_spark.sources.warc import (
        attach_warc_payload,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    media = attach_frontier_sitemap_payload(docs, "doc_id", "text")
    frontier = sitemap_ingest_urls(media).select(
        "media_id",
        "pos",
        F.regexp_extract("loc", r"^https://h(\d+)\.example\.com", 1)
        .cast("int")
        .alias("host_idx"),
        F.regexp_extract("loc", r"example\.com(/.*)$", 1).alias("path"),
    )
    # optimization round 15: ONE persisted url-grain frame (two consumers:
    # the stage-0..2 fate aggregate and the fetched-docs join) instead of
    # three chained persists; stages 0-2 collapse to one aggregate below.
    gated = robots_gate_urls(frontier).persist()
    fetched = gated.where("allowed").select("media_id").distinct()
    fdocs = docs.join(
        fetched, docs.doc_id == fetched.media_id
    ).select("doc_id", "text")
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    page = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>T"),
        F.substring(F.md5(F.col("text")), 1, 8),
        F.lit(
            '</title><script type="text/javascript">var p = "<p>NOISE</p>";'
            "</script><style>p { color: red }</style></head><body><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        esc,
        F.lit("</p><!-- crawler comment --></body></html>"),
    )
    html_docs = fdocs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id", page.alias("page")
    )
    html_ext = warc_html_extract(
        attach_warc_payload(html_docs, "doc_id", "page"), with_text=True
    ).select("media_id", "extracted")
    pdf_docs = fdocs.where(F.col("doc_id") % 3 == 0)
    pdf_ext = pdf_extract_e2e(
        attach_pdf_payload(pdf_docs, "doc_id", "text", 80, 4), with_text=True
    ).select("media_id", "extracted")
    ext = html_ext.unionByName(pdf_ext).where(F.length("extracted") > 0)
    # optimization round 15 (the AV funnel's explode-one-row-into-fates
    # pattern): stages 3-6 derive as FLAGS on ONE doc-grain frame (c4
    # keeps every input doc with n_kept + clean_text), so the extraction
    # kernels run once into a single aggregate instead of filling three
    # persisted stage caches read by four 1-row agg branches. The dedup
    # stage's row_number()==1 becomes the conditional cumulative count
    # (first p5 row per md5(clean_text) has cum==1 — non-p5 rows add 0).
    # thresholds tuned to the synthetic corpus profile (~54-word docs, a
    # vocabulary that carries 'the' but few other Gopher stop words) so the
    # stage separates instead of annihilating; the OPERATOR defaults stay
    # the Gopher-paper values
    c4 = c4_line_filter(ext, text_col="extracted", id_col="media_id")
    w_dup = (
        Window.partitionBy(F.md5("clean_text"))
        .orderBy("media_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flags = (
        c4.select(
            "media_id",
            "clean_text",
            (F.col("n_kept") >= 1).alias("p4"),
        )
        .withColumn(
            "p5",
            F.col("p4")
            & gopher_ok_all(
                F.col("clean_text"), min_words=30, min_stop_hits=1
            ),
        )
        .withColumn(
            "p6",
            F.col("p5")
            & (F.sum(F.col("p5").cast("int")).over(w_dup) == 1),
        )
    )

    def cnt(flag: str):
        return F.coalesce(
            F.sum(F.col(flag).cast("long")), F.lit(0)
        ).cast("long")

    def ids(flag: str):
        return F.coalesce(
            F.sum(F.when(F.col(flag), F.col("media_id"))), F.lit(0)
        ).cast("long")

    # stages 0-2 in ONE url-grain aggregate: allowed rows are stage 1;
    # stage 2 is the DISTINCT allowed doc set (count/sum over distinct
    # media_id — exactly the old fetched frame's count and id sum)
    u = gated.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.coalesce(F.sum("media_id"), F.lit(0)).cast("long").alias("i0"),
        cnt("allowed").alias("n1"),
        ids("allowed").alias("i1"),
        F.count_distinct(F.when(F.col("allowed"), F.col("media_id")))
        .cast("long")
        .alias("n2"),
        F.coalesce(
            F.sum_distinct(F.when(F.col("allowed"), F.col("media_id"))),
            F.lit(0),
        )
        .cast("long")
        .alias("i2"),
    )
    d = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n3"),
        F.coalesce(F.sum("media_id"), F.lit(0)).cast("long").alias("i3"),
        cnt("p4").alias("n4"),
        ids("p4").alias("i4"),
        cnt("p5").alias("n5"),
        ids("p5").alias("i5"),
        cnt("p6").alias("n6"),
        ids("p6").alias("i6"),
    )
    names = [
        "frontier_urls", "robots_allowed", "fetched_docs", "extracted_docs",
        "c4_line_clean", "gopher_pass", "exact_dedup",
    ]
    stack_args = ", ".join(
        f"{k}, '{names[k]}', n{k}, i{k}" for k in range(7)
    )
    funnel = u.crossJoin(d).select(
        F.expr(
            f"stack(7, {stack_args}) AS (stage_id, stage, n_out, sum_ids)"
        )
    ).select(
        F.col("stage_id").cast("int").alias("stage_id"),
        "stage",
        F.col("n_out").cast("long").alias("n_out"),
        F.col("sum_ids").cast("long").alias("sum_ids"),
    )
    w = Window.orderBy("stage_id")
    out = funnel.select(
        "stage_id",
        "stage",
        "n_out",
        F.coalesce(F.lag("n_out").over(w) - F.col("n_out"), F.lit(0))
        .cast("long")
        .alias("n_dropped"),
        "sum_ids",
    )
    out._stage_caches = [gated]
    return out


# ---------------------------------------------------------------------------
# Round 14: politeness budget allocation over the allowed frontier — the
# max-min fair per-host fetch scheduler every crawler runs between robots
# and fetch (waterfill reused verbatim from sampling.token_budget_waterfill,
# whose closed form is already oracle-proven on token mixtures).
# ---------------------------------------------------------------------------


@register(
    "frontier_host_budget",
    """
    WITH m AS MATERIALIZED (
      SELECT doc_id, md5(text) AS hex,
             1 + CAST(('0x' || substr(md5(text), 5, 1)) AS INT) % 4 AS n_urls
      FROM documents
    ),
    urls AS MATERIALIZED (
      SELECT doc_id, CAST(k AS INT) AS pos,
             CASE WHEN CAST(('0x' || substr(hex, k + 2, 1)) AS INT) % 3 <> 2
                  THEN '/p' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
                  ELSE '/q' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
             END
             || CASE CAST(('0x' || substr(hex, k + 3, 1)) AS INT) % 3
                  WHEN 0 THEN '' WHEN 1 THEN '/open' ELSE '/deep' END
             || '/page' || substr(hex, k + 4, 1) AS path
      FROM m, range(0, 4) t(k) WHERE k < n_urls
    ),
    gated AS MATERIALIZED (
      SELECT doc_id, pos,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR))
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR)) ELSE -1 END AS s1,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open')
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open') ELSE -1 END AS s2,
             CASE WHEN starts_with(path, '/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep')
                  THEN length('/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep') ELSE -1 END AS s3
      FROM urls
    ),
    per_host AS MATERIALIZED (
      SELECT CAST(doc_id % 7 AS VARCHAR) AS src,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM gated
      WHERE GREATEST(s1, s2, s3) = -1 OR s2 = GREATEST(s1, s2, s3)
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n_tokens) * 3 // 5 AS b, COUNT(*) AS S FROM per_host),
    ranked AS (
      SELECT src, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, src) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, src
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prefix
      FROM per_host
    ),
    star AS (
      SELECT MIN(i) AS istar, MIN_BY(prefix, i) AS pstar
      FROM ranked, tot WHERE prefix + n_tokens * (S - i + 1) >= b
    )
    SELECT CAST(src AS INT) AS host_idx,
           n_tokens AS n_allowed,
           CAST(CASE WHEN istar IS NULL OR i < istar THEN n_tokens
                ELSE (b - pstar) // (S - istar + 1)
                     + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                END AS BIGINT) AS fetch_budget,
           CASE WHEN istar IS NULL OR i < istar THEN FALSE
                ELSE (b - pstar) // (S - istar + 1)
                     + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                     < n_tokens END AS capped
    FROM ranked, tot, star
    """,
)
def q_frontier_host_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch-budget allocation over the ALLOWED frontier (round
    14): sitemap frontier -> REP gate (the funnel's front half, same real
    kernels) -> per-host allowed-URL counts -> max-min fair waterfill at
    60% of the total (`operators/sampling.py:token_budget_waterfill`
    applied with one whitespace-free URL path = one unit) — the
    politeness scheduler between robots and fetch: small hosts keep their
    whole frontier, big hosts cap at the unique level that exhausts the
    budget exactly. One corpus fan-out collapses to a 7-row host frame;
    everything after is hosts-sized (the licensed sources-grain window)."""
    from azure_medicine_data_engineering_spark.operators.robots import (
        robots_gate_urls,
    )
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.sitemap import (
        attach_frontier_sitemap_payload,
        sitemap_ingest_urls,
    )

    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    media = attach_frontier_sitemap_payload(docs, "doc_id", "text")
    frontier = sitemap_ingest_urls(media).select(
        "media_id",
        "pos",
        F.regexp_extract("loc", r"^https://h(\d+)\.example\.com", 1)
        .cast("int")
        .alias("host_idx"),
        F.regexp_extract("loc", r"example\.com(/.*)$", 1).alias("path"),
    )
    allowed = (
        robots_gate_urls(frontier)
        .where("allowed")
        .select(F.col("host_idx").cast("string").alias("host"), "path")
        .persist()
    )
    # budget = 60% of the allowed total, computed IN-PLAN from the solve's
    # own total window (optimization round 15, guide §5) — the count()
    # driver round trip is gone; exact because one whitespace-free path =
    # one token, so sum(n_tokens) == the old row count (and the oracle's b
    # is SUM(n_tokens) * 3 // 5 verbatim).
    wf = token_budget_waterfill(
        allowed, group_col="host", text_col="path", budget_total_frac=(3, 5)
    )
    out = wf.select(
        F.col("host").cast("int").alias("host_idx"),
        F.col("n_tokens").alias("n_allowed"),
        F.col("alloc_tokens").alias("fetch_budget"),
        "capped",
    )
    out._stage_caches = [allowed]
    return out


@register(
    "crawl_budgeted_funnel",
    """
    WITH m AS MATERIALIZED (
      SELECT doc_id, md5(text) AS hex,
             1 + CAST(('0x' || substr(md5(text), 5, 1)) AS INT) % 4 AS n_urls
      FROM documents
    ),
    urls AS MATERIALIZED (
      SELECT doc_id, CAST(k AS INT) AS pos,
             CASE WHEN CAST(('0x' || substr(hex, k + 2, 1)) AS INT) % 3 <> 2
                  THEN '/p' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
                  ELSE '/q' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
             END
             || CASE CAST(('0x' || substr(hex, k + 3, 1)) AS INT) % 3
                  WHEN 0 THEN '' WHEN 1 THEN '/open' ELSE '/deep' END
             || '/page' || substr(hex, k + 4, 1) AS path
      FROM m, range(0, 4) t(k) WHERE k < n_urls
    ),
    gated AS MATERIALIZED (
      SELECT doc_id, pos,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR))
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR)) ELSE -1 END AS s1,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open')
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open') ELSE -1 END AS s2,
             CASE WHEN starts_with(path, '/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep')
                  THEN length('/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep') ELSE -1 END AS s3
      FROM urls
    ),
    ok_urls AS MATERIALIZED (
      SELECT doc_id, pos, doc_id % 7 AS host FROM gated
      WHERE GREATEST(s1, s2, s3) = -1 OR s2 = GREATEST(s1, s2, s3)
    ),
    per_host AS MATERIALIZED (
      SELECT host, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM ok_urls GROUP BY 1
    ),
    tot AS (SELECT SUM(n_tokens) * 3 // 5 AS b, COUNT(*) AS S FROM per_host),
    ranked AS (
      SELECT host, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, host) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, host
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prefix
      FROM per_host
    ),
    star AS (
      SELECT MIN(i) AS istar, MIN_BY(prefix, i) AS pstar
      FROM ranked, tot WHERE prefix + n_tokens * (S - i + 1) >= b
    ),
    alloc AS MATERIALIZED (
      SELECT host,
             CAST(CASE WHEN istar IS NULL OR i < istar THEN n_tokens
                  ELSE (b - pstar) // (S - istar + 1)
                       + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                  END AS BIGINT) AS fetch_budget
      FROM ranked, tot, star
    ),
    kept AS MATERIALIZED (
      SELECT doc_id, pos FROM (
        SELECT o.doc_id, o.pos, a.fetch_budget,
               ROW_NUMBER() OVER (PARTITION BY o.host
                                  ORDER BY o.doc_id, o.pos) AS rn
        FROM ok_urls o JOIN alloc a USING (host)
      ) WHERE rn <= fetch_budget
    ),
    fetched AS MATERIALIZED (SELECT DISTINCT doc_id FROM kept),
    funnel AS (
      SELECT 0 AS stage_id, 'frontier_urls' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_out,
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS sum_ids FROM urls
      UNION ALL
      SELECT 1, 'robots_allowed', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM ok_urls
      UNION ALL
      SELECT 2, 'budget_kept', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM kept
      UNION ALL
      SELECT 3, 'fetched_docs', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM fetched
    )
    SELECT CAST(stage_id AS INT) AS stage_id, stage, n_out,
           CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage_id) - n_out, 0) AS BIGINT)
             AS n_dropped,
           sum_ids
    FROM funnel
    """,
)
def q_crawl_budgeted_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The politeness budget ENFORCED as a funnel stage (round 14):
    frontier -> robots gate -> per-host waterfill cap APPLIED (allowed
    URLs ranked deterministically within each host by (doc_id, pos);
    only the host's fetch_budget survive) -> fetch set, with per-stage
    counts / drops / id checksums. The enforcement join is a broadcast
    of the 7-row budget frame + one host-KEYED rank window (no global
    ordering anywhere); at 100 TB this is exactly the scheduler shape —
    the per-host crawl queue is the keyed partition."""
    from azure_medicine_data_engineering_spark.operators.robots import (
        robots_gate_urls,
    )
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.sitemap import (
        attach_frontier_sitemap_payload,
        sitemap_ingest_urls,
    )

    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    media = attach_frontier_sitemap_payload(docs, "doc_id", "text")
    frontier = sitemap_ingest_urls(media).select(
        "media_id",
        "pos",
        F.regexp_extract("loc", r"^https://h(\d+)\.example\.com", 1)
        .cast("int")
        .alias("host_idx"),
        F.regexp_extract("loc", r"example\.com(/.*)$", 1).alias("path"),
    ).persist()
    allowed = (
        robots_gate_urls(frontier)
        .where("allowed")
        .select(
            "media_id", "pos",
            F.col("host_idx").cast("string").alias("host"),
            "path",
        )
        .persist()
    )
    # in-plan 60% budget (see q_frontier_host_budget) — no count() job
    alloc = token_budget_waterfill(
        allowed, group_col="host", text_col="path", budget_total_frac=(3, 5)
    ).select("host", F.col("alloc_tokens").alias("fetch_budget"))
    w_host = Window.partitionBy("host").orderBy("media_id", "pos")
    kept = (
        allowed.withColumn("rn", F.row_number().over(w_host))
        .join(F.broadcast(alloc), "host")
        .where(F.col("rn") <= F.col("fetch_budget"))
        .select("media_id", "pos")
        .persist()
    )
    fetched = kept.select("media_id").distinct()

    def row(df: DataFrame, sid: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.coalesce(F.sum("media_id"), F.lit(0)).cast("long").alias("sum_ids"),
        ).select(
            F.lit(sid).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            "n_out",
            "sum_ids",
        )

    funnel = (
        row(frontier, 0, "frontier_urls")
        .unionByName(row(allowed, 1, "robots_allowed"))
        .unionByName(row(kept, 2, "budget_kept"))
        .unionByName(row(fetched, 3, "fetched_docs"))
    )
    w = Window.orderBy("stage_id")
    out = funnel.select(
        "stage_id",
        "stage",
        "n_out",
        F.coalesce(F.lag("n_out").over(w) - F.col("n_out"), F.lit(0))
        .cast("long")
        .alias("n_dropped"),
        "sum_ids",
    )
    out._stage_caches = [frontier, allowed, kept]
    return out


# ---------------------------------------------------------------------------
# Round 15: streaming twin of the frontier politeness budget — oracle
# shared VERBATIM with the batch query (the accumulated host frame at the
# final trigger IS the full frontier, so the latest allocation slot must
# equal the one-shot solve).
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.queries.registry import (  # noqa: E402
    ORACLES as _OR15,
)


@register("streaming_frontier_budget", _OR15["frontier_host_budget"])
def q_streaming_frontier_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming frontier budget (`streaming/windows.py:
    frontier_budget_process_batch`): documents staged as a 4-file dir,
    streamed one file per trigger; each trigger lands per-host count
    partials + the waterfill over everything accumulated, batch-id
    versioned. Report = the latest allocation slot; kill/replay pinned
    in tests/test_streaming_sinks.py."""
    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_frontier_budget_report,
    )

    return streaming_frontier_budget_report(spark, sf_dir)


# ---------------------------------------------------------------------------
# Round 15: frontier RECRAWL scheduling — the budget allocates a single
# snapshot; a real crawler schedules REVISITS from last-crawl timestamps
# and observed change rates. The events table is the crawl log (each
# event = one fetch of a URL in the sitemap grammar, md5(event_id)-keyed;
# ~1/3 of fetches observe changed content); the schedule is computed
# AS-OF the log's high-water mark via `operators/asof.py:asof_join`.
# ---------------------------------------------------------------------------

_RECRAWL_HORIZON_S = 7 * 24 * 3600  # fetches older than this = cold URL

#: the crawl-log URL grammar — the SAME closed form as the sitemap
#: fixture's paths (k = 0 slice of the md5 hex), so log entries land on
#: real frontier URLs. Engine-agnostic template: ``{dN}`` = int value of
#: hex digit N, ``{p4}`` = hex digit 4 as text, ``{s}`` = string type
#: name (hex-digit access differs: DuckDB casts '0x…', Spark uses conv).
_LOG_PATH_TPL = (
    "CASE WHEN {d2} % 3 <> 2"
    " THEN '/p' || CAST({d1} % 4 AS {s})"
    " ELSE '/q' || CAST({d1} % 4 AS {s})"
    " END"
    " || CASE {d3} % 3"
    " WHEN 0 THEN '' WHEN 1 THEN '/open' ELSE '/deep' END"
    " || '/page' || {p4}"
)


def _log_path_sql(hx: str, duck: bool) -> str:
    if duck:
        dig = lambda n: f"CAST(('0x' || substr({hx}, {n}, 1)) AS INT)"  # noqa: E731
        p4, s = f"substr({hx}, 4, 1)", "VARCHAR"
    else:
        dig = lambda n: f"CAST(conv(substring({hx}, {n}, 1), 16, 10) AS INT)"  # noqa: E731
        p4, s = f"substring({hx}, 4, 1)", "STRING"
    return _LOG_PATH_TPL.format(d1=dig(1), d2=dig(2), d3=dig(3), p4=p4, s=s)


@register(
    "frontier_recrawl_schedule",
    f"""
    WITH m AS MATERIALIZED (
      SELECT doc_id, md5(text) AS hex,
             1 + CAST(('0x' || substr(md5(text), 5, 1)) AS INT) % 4 AS n_urls
      FROM documents
    ),
    urls AS MATERIALIZED (
      SELECT doc_id, CAST(k AS INT) AS pos,
             CASE WHEN CAST(('0x' || substr(hex, k + 2, 1)) AS INT) % 3 <> 2
                  THEN '/p' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
                  ELSE '/q' || CAST(CAST(('0x' || substr(hex, k + 1, 1)) AS INT) % 4 AS VARCHAR)
             END
             || CASE CAST(('0x' || substr(hex, k + 3, 1)) AS INT) % 3
                  WHEN 0 THEN '' WHEN 1 THEN '/open' ELSE '/deep' END
             || '/page' || substr(hex, k + 4, 1) AS path
      FROM m, range(0, 4) t(k) WHERE k < n_urls
    ),
    gatedp AS MATERIALIZED (
      SELECT doc_id, pos, path,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR))
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR)) ELSE -1 END AS s1,
             CASE WHEN starts_with(path, '/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open')
                  THEN length('/p' || CAST((doc_id % 7) % 4 AS VARCHAR) || '/open') ELSE -1 END AS s2,
             CASE WHEN starts_with(path, '/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep')
                  THEN length('/q' || CAST((doc_id % 7 + 1) % 4 AS VARCHAR) || '/deep') ELSE -1 END AS s3
      FROM urls
    ),
    ok AS MATERIALIZED (
      SELECT CAST(doc_id % 7 AS VARCHAR) AS src, path
      FROM gatedp
      WHERE GREATEST(s1, s2, s3) = -1 OR s2 = GREATEST(s1, s2, s3)
    ),
    per_host AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM ok GROUP BY 1
    ),
    tot AS (SELECT SUM(n_tokens) * 3 // 5 AS b, COUNT(*) AS S FROM per_host),
    ranked AS (
      SELECT src, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, src) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, src
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prefix
      FROM per_host
    ),
    star AS (
      SELECT MIN(i) AS istar, MIN_BY(prefix, i) AS pstar
      FROM ranked, tot WHERE prefix + n_tokens * (S - i + 1) >= b
    ),
    budget AS (
      SELECT CAST(src AS INT) AS host_idx,
             CAST(CASE WHEN istar IS NULL OR i < istar THEN n_tokens
                  ELSE (b - pstar) // (S - istar + 1)
                       + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                  END AS BIGINT) AS fetch_budget
      FROM ranked, tot, star
    ),
    uurl AS MATERIALIZED (
      SELECT DISTINCT CAST(src AS INT) AS host_idx,
             'h' || src || path AS url
      FROM ok
    ),
    clog AS MATERIALIZED (
      SELECT 'h' || CAST(user_id % 7 AS VARCHAR)
             || {_log_path_sql("md5(CAST(event_id AS VARCHAR))", duck=True)} AS url,
             ts, event_id,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 6, 1)) AS INT) % 3 = 0
               AS changed
      FROM events
    ),
    t0 AS (SELECT MAX(ts) AS t0 FROM events),
    inwin AS MATERIALIZED (
      SELECT l.url, l.ts, l.event_id, l.changed
      FROM clog l, t0
      WHERE l.ts <= t0.t0
        AND l.ts >= t0.t0 - INTERVAL {_RECRAWL_HORIZON_S} SECONDS
    ),
    hist AS MATERIALIZED (
      SELECT url, CAST(COUNT(*) AS BIGINT) AS n_fetches,
             CAST(SUM(CAST(changed AS INT)) AS BIGINT) AS n_changed
      FROM inwin GROUP BY url
    ),
    lastf AS MATERIALIZED (
      SELECT url, ts FROM (
        SELECT url, ts,
               ROW_NUMBER() OVER (PARTITION BY url
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM inwin
      ) WHERE rn = 1
    ),
    scored AS MATERIALIZED (
      SELECT u.host_idx, u.url,
             COALESCE(h.n_fetches, 0) AS n_fetches,
             COALESCE(h.n_changed, 0) AS n_changed,
             CAST(CASE WHEN l.ts IS NULL THEN {_RECRAWL_HORIZON_S}
                  ELSE (epoch_us(t0.t0) - epoch_us(l.ts)) // 1000000
                  END AS BIGINT) AS stale_sec
      FROM uurl u
      LEFT JOIN hist h ON u.url = h.url
      LEFT JOIN lastf l ON u.url = l.url
      CROSS JOIN t0
    ),
    rk AS (
      SELECT *, stale_sec * (2 * n_changed + 1) AS score,
             ROW_NUMBER() OVER (PARTITION BY host_idx
               ORDER BY stale_sec * (2 * n_changed + 1) DESC, url) AS rk
      FROM scored
    )
    SELECT r.host_idx, r.url, r.n_fetches, r.n_changed, r.stale_sec,
           CAST(r.score AS BIGINT) AS score, CAST(r.rk AS BIGINT) AS rk
    FROM rk r JOIN budget b ON r.host_idx = b.host_idx
    WHERE r.rk <= b.fetch_budget
    """,
)
def q_frontier_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl priority queue (round 15): allowed frontier URLs x the
    events crawl log -> last fetch AS-OF the log high-water mark
    (`asof_join`, url-keyed rank, event-id tiebreak), per-URL change
    rate over the 7-day horizon, integer priority
    ``stale_sec * (2 * n_changed + 1)`` (change-prone URLs outrank cold
    ones; never-crawled URLs enter at horizon staleness), then the
    per-host TOP-K under the politeness waterfill budget (deterministic
    score-desc/url tiebreak). Shapes: keyed joins at url grain, the
    host-partitioned rank window, and three licensed scalars (total,
    t0, budget rows)."""
    from azure_medicine_data_engineering_spark.operators.asof import asof_join
    from azure_medicine_data_engineering_spark.operators.robots import (
        robots_gate_urls,
    )
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )
    from azure_medicine_data_engineering_spark.queries.registry import (
        events_table,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.sitemap import (
        attach_frontier_sitemap_payload,
        sitemap_ingest_urls,
    )

    docs = ensure_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    media = attach_frontier_sitemap_payload(docs, "doc_id", "text")
    frontier = sitemap_ingest_urls(media).select(
        "media_id",
        "pos",
        F.regexp_extract("loc", r"^https://h(\d+)\.example\.com", 1)
        .cast("int")
        .alias("host_idx"),
        F.regexp_extract("loc", r"example\.com(/.*)$", 1).alias("path"),
    )
    allowed = (
        robots_gate_urls(frontier)
        .where("allowed")
        .select(F.col("host_idx").cast("string").alias("host"), "path")
        .persist()
    )
    # in-plan 60% budget (see q_frontier_host_budget) — no count() job
    budget = token_budget_waterfill(
        allowed, group_col="host", text_col="path", budget_total_frac=(3, 5)
    ).select(
        F.col("host").cast("int").alias("b_host"),
        F.col("alloc_tokens").alias("fetch_budget"),
    )
    urls = allowed.select(
        F.col("host").cast("int").alias("host_idx"),
        F.concat(F.lit("h"), F.col("host"), F.col("path")).alias("url"),
    ).distinct()

    ev = events_table(spark, sf_dir)
    hx = F.md5(F.col("event_id").cast("string"))
    log = ev.select(
        F.concat(
            F.lit("h"),
            (F.col("user_id") % 7).cast("string"),
            F.expr(
                _log_path_sql("md5(CAST(event_id AS STRING))", duck=False)
            ),
        ).alias("url"),
        "ts",
        "event_id",
        (
            F.conv(F.substring(hx, 6, 1), 16, 10).cast("int") % 3 == 0
        ).alias("changed"),
    )
    t0 = ev.agg(F.max("ts").alias("t0")).collect()[0]["t0"]
    t0_lit = F.lit(t0).cast("timestamp")
    inwin = log.where(
        (F.col("ts") <= t0_lit)
        & (
            F.col("ts")
            >= t0_lit - F.expr(f"INTERVAL {_RECRAWL_HORIZON_S} SECONDS")
        )
    ).persist()
    hist = inwin.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum(F.col("changed").cast("long")).cast("long").alias("n_changed"),
    )
    last = asof_join(
        urls.withColumn("ts0", t0_lit),
        inwin.select("url", "ts", "event_id"),
        on="url",
        left_ts="ts0",
        right_ts="ts",
        window_seconds=_RECRAWL_HORIZON_S,
        left_id="url",
        tiebreak="event_id",
    ).select("url", F.col("ts_r").alias("last_ts"))

    scored = (
        urls.join(hist, "url", "left")
        .join(last, "url", "left")
        .select(
            "host_idx",
            "url",
            F.coalesce("n_fetches", F.lit(0)).cast("long").alias("n_fetches"),
            F.coalesce("n_changed", F.lit(0)).cast("long").alias("n_changed"),
            F.when(
                F.col("last_ts").isNull(),
                F.lit(_RECRAWL_HORIZON_S),
            )
            .otherwise(
                F.expr(
                    f"(unix_micros(TIMESTAMP '{t0}') - unix_micros(last_ts))"
                    " div 1000000"
                )
            )
            .cast("long")
            .alias("stale_sec"),
        )
        .withColumn(
            "score",
            (F.col("stale_sec") * (2 * F.col("n_changed") + 1)).cast("long"),
        )
    )
    w = Window.partitionBy("host_idx").orderBy(
        F.col("score").desc(), F.col("url")
    )
    out = (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .join(F.broadcast(budget), F.col("host_idx") == F.col("b_host"))
        .where(F.col("rk") <= F.col("fetch_budget"))
        .select(
            "host_idx", "url", "n_fetches", "n_changed", "stale_sec",
            "score", "rk",
        )
    )
    out._stage_caches = [allowed, inwin]
    return out
