"""Corpus-preparation queries: chunking, repetition filters, benchmark
decontamination — the LLM-training-data steps downstream of dedup (scale
extensions; no counterpart in the reference, whose text handling stops at
label normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.queries.registry import register, table as _t

_TOKS = "list_filter(regexp_split_to_array({t}, '\\s+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# Token-window chunking (size 32, overlap 8 → stride 24).
# ---------------------------------------------------------------------------


@register(
    "chunk_documents_windows",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents
    ), counts AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
      FROM base
    ), fanout AS (
      SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM counts
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(len(toks[i*24+1 : i*24+32]) AS INT) AS n_chunk_tokens,
           array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text
    FROM fanout
    """,
)
def q_chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows with overlap (map-only explode; see
    operators/chunking.py for the scale notes)."""
    from azure_medicine_data_engineering_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (top-2-gram mass, duplicate-5-gram mass,
# duplicate-token fraction).
# ---------------------------------------------------------------------------


def _ngrams_sql(n: int) -> str:
    toks = _TOKS.format(t="text")
    if n == 1:
        return toks
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(({toks})[i : i + {n - 1}], ' ')) "
        f"ELSE [] END"
    )


@register(
    "repetition_quality_signals",
    f"""
    WITH fan AS (
      SELECT doc_id, 'g2' AS kind, unnest({_ngrams_sql(2)}) AS gram FROM documents
      UNION ALL
      SELECT doc_id, 'g5', unnest({_ngrams_sql(5)}) FROM documents
      UNION ALL
      SELECT doc_id, 'tok', unnest({_ngrams_sql(1)}) FROM documents
    ), counts AS (
      SELECT doc_id, kind, gram, COUNT(*) AS cnt FROM fan GROUP BY ALL
    ), per_kind AS (
      SELECT doc_id, kind,
             SUM(cnt * length(gram)) AS char_mass,
             COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) END), 0) AS dup_char_mass,
             SUM(cnt) AS total_occ,
             COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt END), 0) AS dup_occ,
             MAX(lpad(CAST(cnt AS VARCHAR), 10, '0') || ' ' || gram) AS top_key
      FROM counts GROUP BY ALL
    ), enriched AS (
      SELECT *, CAST(substr(top_key, 1, 10) AS BIGINT) * length(substr(top_key, 12)) AS top_mass
      FROM per_kind
    )
    SELECT doc_id,
           ROUND(MAX(CASE WHEN kind = 'g2' THEN CAST(top_mass AS DOUBLE) / char_mass END), 4) AS top2_frac,
           ROUND(MAX(CASE WHEN kind = 'g5' THEN CAST(dup_char_mass AS DOUBLE) / char_mass END), 4) AS dup5_frac,
           ROUND(MAX(CASE WHEN kind = 'tok' THEN CAST(dup_occ AS DOUBLE) / total_occ END), 4) AS dup_tok_frac
    FROM enriched GROUP BY doc_id
    """,
)
def q_repetition_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters (see operators/repetition.py)."""
    from azure_medicine_data_engineering_spark.operators.repetition import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Benchmark decontamination: shared word-3-gram counts vs a held-out
# "benchmark" slice (doc_id % 101 == 0 stands in for the eval set).
# ---------------------------------------------------------------------------


@register(
    "benchmark_contamination",
    f"""
    WITH grams AS (
      SELECT doc_id, unnest(list_distinct({_ngrams_sql(3)})) AS gram FROM documents
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 101 = 0
    ), hits AS (
      SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS shared_ngrams
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 101 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.shared_ngrams, 0) AS shared_ngrams,
           COALESCE(h.shared_ngrams, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 101 <> 0
    """,
)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style n-gram decontamination (see operators/contamination.py;
    n=3 here so the synthetic corpus exercises both verdicts)."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 101 == 0)
    train = docs.where(F.col("doc_id") % 101 != 0)
    return ngram_contamination(train, bench, n=3)


# ---------------------------------------------------------------------------
# Domain-mixture quota sampling: rebalance the corpus to target language
# proportions (40% en, 15% each of de/es/fr/zh).
# ---------------------------------------------------------------------------


@register(
    "quota_sampled_documents",
    """
    WITH tgt(lang, target) AS (
      VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)
    ), counts AS (
      SELECT d.lang, COUNT(*) AS cnt, ANY_VALUE(target) AS target
      FROM documents d JOIN tgt USING (lang) GROUP BY d.lang
    ), feasible AS (
      SELECT MIN(cnt / target) AS T FROM counts
    ), thr AS (
      SELECT lang,
             FLOOR(LEAST(1.0, (target * T) / cnt) * 10000 + 0.5) AS thr
      FROM counts, feasible
    ), kept AS (
      SELECT d.lang, d.doc_id
      FROM documents d JOIN thr USING (lang)
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < thr
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM kept), 4) AS achieved_frac
    FROM kept GROUP BY lang
    """,
)
def q_quota_sampled_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing via deterministic quota sampling (see
    operators/sampling.py:quota_sample); the report shows the achieved
    mixture alongside per-language kept counts."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.sampling import quota_sample

    docs = _t(spark, sf_dir, "documents")
    kept = quota_sample(
        docs,
        key="doc_id",
        strata_col="lang",
        targets={"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
    ).persist()  # counted twice: per-lang and total
    total = kept.agg(F.count(F.lit(1)).alias("_total"))
    _out = (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.col("n_kept").cast("bigint").alias("n_kept"),
            F.round(F.col("n_kept").cast("double") / F.col("_total"), 4).alias(
                "achieved_frac"
            ),
        )
    )
    _out._stage_caches = [kept]  # r15 leak fix
    return _out


# ---------------------------------------------------------------------------
# Product quantization ANN: per-subspace codebooks + asymmetric-distance
# top-k over codes (the corpus is never decoded).
# ---------------------------------------------------------------------------


def _l2sq_sql(a: str, b: str, n: int = 8) -> str:
    d = f"list_transform(range({n}), i -> {a}[i+1] - {b}[i+1])"
    return f"list_dot_product({d}, {d})"


@register(
    "embedding_pq_adc_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sub AS (
      SELECT vec_id, t.s, v[t.s*8+1 : t.s*8+8] AS sv
      FROM e, (SELECT unnest(range(8)) AS s) t(s)
    ),
    cdim AS (
      SELECT s, vec_id % 16 AS cid, d.i AS dim, ROUND(AVG(sv[d.i + 1]), 6) AS c
      FROM sub, (SELECT unnest(range(8)) AS i) d(i)
      GROUP BY 1, 2, 3
    ),
    cb AS (SELECT s, cid, list(c ORDER BY dim) AS centroid FROM cdim GROUP BY s, cid),
    scored AS (
      SELECT sub.vec_id, sub.s, cb.cid,
             ROUND({_l2sq_sql('sub.sv', 'cb.centroid')}, 6) AS d2
      FROM sub JOIN cb USING (s)
    ),
    codes AS (
      SELECT vec_id, s, cid AS code FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) = 1
    ),
    qtab AS (
      SELECT q.vec_id AS query_id, q.s, cb.cid,
             CAST(ROUND(ROUND({_l2sq_sql('q.sv', 'cb.centroid')}, 6) * 1e6) AS BIGINT) AS d2u
      FROM sub q JOIN cb USING (s) WHERE q.vec_id < 5
    ),
    pairs AS (
      SELECT t.query_id, c.vec_id AS neighbor_id, SUM(t.d2u) AS du
      FROM codes c JOIN qtab t ON c.s = t.s AND c.code = t.cid AND c.vec_id <> t.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           ROUND(CAST(du AS DOUBLE) / 1e6, 4) AS approx_dist,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY du, neighbor_id) AS INT) AS rnk
    FROM pairs QUALIFY rnk <= 10
    """,
)
def q_embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate nearest neighbors (see
    operators/similarity.py:pq_adc_topk): 64 floats -> 8 byte-codes per
    vector, per-query distance tables broadcast, integer-exact table sums."""
    from azure_medicine_data_engineering_spark.operators.similarity import pq_adc_topk

    return pq_adc_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


# ---------------------------------------------------------------------------
# End-to-end corpus preparation: quality filter → exact dedup → MinHash
# near-dup clusters → n-gram decontamination → domain quota sample, as ONE
# funnel with per-stage survivor counts + membership checksums.
# ---------------------------------------------------------------------------


def _e2e_oracle() -> str:
    """The whole funnel recomputed in SQL: each stage's CTE feeds the next,
    and the output pins (count, sum-of-ids) per stage, so any membership
    difference at any stage breaks the hash."""
    from azure_medicine_data_engineering_spark.queries.text_dedup import (
        _LSH_CTES,
        _NORM,
    )

    toks = _TOKS.format(t="text")
    toks_lower = _TOKS.format(t="lower(text)")
    g3 = _ngrams_sql(3)
    lsh = _LSH_CTES.replace("FROM documents", "FROM s2")
    stage_row = (
        "SELECT {sid}, '{name}', CAST(COUNT(*) AS BIGINT), "
        "CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM {src}"
    )
    return f"""
    WITH RECURSIVE q0 AS (SELECT doc_id, lang, text FROM documents),
    qb AS (
      SELECT doc_id, lang, text,
             len({toks}) AS n_tokens,
             len(list_filter({toks_lower},
                 x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
               AS sw_hits,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct_chars
      FROM q0
    ),
    s1 AS (
      SELECT doc_id, lang, text FROM qb
      WHERE ROUND(CAST(0.5 * least(n_tokens / 100.0, 1.0)
            + 0.4 * least(sw_hits / nullif(n_tokens, 0) * 5.0, 1.0)
            - 0.1 * least(punct_chars / nullif(n_chars, 0) * 10.0, 1.0) AS DOUBLE), 4) >= 0.35
    ),
    s2 AS (
      SELECT doc_id, lang, text FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5({_NORM.format(t='text')})
                                     ORDER BY doc_id) AS rn FROM s1
      ) WHERE rn = 1
    ),
    {lsh},
    verified AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION ALL SELECT id_b, id_a FROM verified
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    mins AS (SELECT src AS id, MIN(dst) AS mr FROM reach GROUP BY src),
    s3 AS (
      SELECT s2.doc_id, s2.lang, s2.text FROM s2 LEFT JOIN mins m ON s2.doc_id = m.id
      WHERE s2.doc_id = LEAST(s2.doc_id, COALESCE(m.mr, s2.doc_id))
    ),
    bgrams AS (
      SELECT DISTINCT gram FROM (
        SELECT unnest(list_distinct({g3})) AS gram FROM documents WHERE doc_id % 101 = 0
      )
    ),
    tgrams AS (
      SELECT doc_id, unnest(list_distinct({g3})) AS gram FROM s3 WHERE doc_id % 101 <> 0
    ),
    dirty AS (SELECT DISTINCT t.doc_id FROM tgrams t JOIN bgrams b USING (gram)),
    s4 AS (
      SELECT doc_id, lang FROM s3
      WHERE doc_id % 101 <> 0 AND doc_id NOT IN (SELECT doc_id FROM dirty)
    ),
    tgt(lang, target) AS (VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15), ('fr', 0.15), ('zh', 0.15)),
    counts AS (SELECT s4.lang, COUNT(*) AS cnt, ANY_VALUE(target) AS target
               FROM s4 JOIN tgt USING (lang) GROUP BY s4.lang),
    feasible AS (
      SELECT CASE WHEN (SELECT COUNT(*) FROM counts) < (SELECT COUNT(*) FROM tgt)
                  THEN 0.0 ELSE MIN(cnt / target) END AS T
      FROM counts
    ),
    thr AS (SELECT lang, FLOOR(LEAST(1.0, (target * T) / cnt) * 10000 + 0.5) AS thr
            FROM counts, feasible),
    s5 AS (
      SELECT s4.doc_id, s4.lang FROM s4 JOIN thr USING (lang)
      WHERE CAST(('0x' || substr(md5(CAST(s4.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < thr
    ),
    funnel(stage_id, stage, n_out, sum_ids) AS (
      {stage_row.format(sid=0, name='input', src='q0')}
      UNION ALL {stage_row.format(sid=1, name='quality_filter', src='s1')}
      UNION ALL {stage_row.format(sid=2, name='exact_dedup', src='s2')}
      UNION ALL {stage_row.format(sid=3, name='near_dedup', src='s3')}
      UNION ALL {stage_row.format(sid=4, name='decontaminate', src='s4')}
      UNION ALL {stage_row.format(sid=5, name='quota_sample', src='s5')}
    )
    SELECT CAST(stage_id AS INT) AS stage_id, stage, n_out,
           CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage_id) - n_out, 0) AS BIGINT)
             AS n_dropped,
           sum_ids
    FROM funnel
    """


@register("corpus_e2e_filter", _e2e_oracle())
def q_corpus_e2e_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus preparation pipeline as one composed query —
    each stage is the already-verified operator, chained:

    quality_filter (operators/text.py:quality_score ≥ 0.35) → exact_dedup
    (operators/dedup.py:dedup_exact, min-id per content fingerprint) →
    near_dedup (minhash_dedup_pairs ≥ 0.5 Jaccard → clusters.dedup_clusters
    representatives) → decontaminate (operators/contamination.py, word-3-grams
    vs the doc_id%101 benchmark slice, bench docs excluded) → quota_sample
    (operators/sampling.py:quota_sample to a 40/15/15/15/15 language mix).

    Output: the funnel report — per-stage survivor count, drop count, and
    sum-of-ids membership checksum. Every intermediate frame is persisted:
    each is consumed by BOTH the next stage and its own funnel row, and
    without the persist Catalyst replays the whole upstream funnel per
    consumer (CLAUDE.md union-per-fate rule). At 100 TB each stage is one
    bounded-shuffle pass (the per-stage designs are unchanged from their
    standalone queries), and the funnel rows are metadata-sized."""
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators import (
        clusters,
        contamination,
        dedup,
        sampling,
        text,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    s1 = docs.where(
        F.round(text.quality_score(F.col("text")).cast("double"), 4) >= 0.35
    ).persist()
    s2 = dedup.dedup_exact(s1).persist()
    pairs = dedup.minhash_dedup_pairs(s2, k=8, bands=4)
    cl = clusters.dedup_clusters(s2.select("doc_id"), pairs, threshold=0.5)
    s3 = s2.join(
        cl.where(F.col("is_representative")).select("doc_id"), "doc_id"
    ).persist()
    bench = docs.where(F.col("doc_id") % 101 == 0)
    train3 = s3.where(F.col("doc_id") % 101 != 0)
    cont = contamination.ngram_contamination(train3, bench, n=3)
    s4 = train3.join(
        cont.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    ).persist()
    s5 = sampling.quota_sample(
        s4,
        key="doc_id",
        strata_col="lang",
        targets={"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
        # the REPORT must survive an infeasible final mix (replicated
        # corpora can contaminate every training doc — the 10× replica
        # sweep did exactly that): strict=False reports the empty stage
        strict=False,
    )

    def row(df: DataFrame, sid: int, name: str) -> DataFrame:
        _out = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("sum_ids"),
        ).select(
            F.lit(sid).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            "n_out",
            "sum_ids",
        )
        return _out

    funnel = (
        row(docs, 0, "input")
        .unionByName(row(s1, 1, "quality_filter"))
        .unionByName(row(s2, 2, "exact_dedup"))
        .unionByName(row(s3, 3, "near_dedup"))
        .unionByName(row(s4, 4, "decontaminate"))
        .unionByName(row(s5, 5, "quota_sample"))
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
    out._stage_caches = [s1, s2, s3, s4]  # r15 leak fix
    return out


# ---------------------------------------------------------------------------
# Cross-document duplicated token windows (bounded-window exact-substring
# dedup signal), corpus-self unigram LM quality, incremental batch dedup.
# ---------------------------------------------------------------------------


def _windows_sql(w: int) -> str:
    toks = _TOKS.format(t="text")
    return (
        f"CASE WHEN len({toks}) >= {w} THEN "
        f"list_transform(range(1, len({toks}) - {w - 2}), "
        f"i -> array_to_string(({toks})[i : i + {w - 1}], ' ')) ELSE [] END"
    )


@register(
    "duplicate_window_spans",
    f"""
    WITH wins AS (SELECT doc_id, md5(unnest({_windows_sql(8)})) AS h FROM documents),
    dup_h AS (SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
                FROM wins GROUP BY doc_id),
    dupd AS (SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
             FROM wins w JOIN dup_h USING (h) GROUP BY w.doc_id)
    SELECT d.doc_id,
           COALESCE(p.n_windows, 0) AS n_windows,
           COALESCE(dd.n_dup, 0) AS n_dup_windows,
           ROUND(CAST(COALESCE(dd.n_dup, 0)
                 / nullif(COALESCE(p.n_windows, 0), 0) AS DOUBLE), 4) AS dup_frac
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN dupd dd ON d.doc_id = dd.doc_id
    """,
)
def q_duplicate_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (operators/dedup.py:
    duplicate_window_spans — Lee et al. 2022 bounded-window form): per
    document, how many of its 8-token sliding windows also occur in another
    document. The oracle recomputes every window hash and the cross-doc
    distinct counts."""
    from azure_medicine_data_engineering_spark.operators.dedup import (
        duplicate_window_spans,
    )

    return duplicate_window_spans(_t(spark, sf_dir, "documents"), w=8)


@register(
    "unigram_logprob_quality",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS.format(t='text')}) AS tok FROM documents),
    vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    lpu AS (SELECT tok, CAST(ROUND(ln(cnt / total) * 1e6) AS BIGINT) AS lpu
            FROM vocab, tot)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(((-SUM(l.lpu)) // COUNT(*)) AS DOUBLE) / 1e6, 6) AS mean_neg_logprob
    FROM tok t JOIN lpu l USING (tok)
    GROUP BY t.doc_id
    """,
)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cheap LM quality proxy (operators/text_rank.py:
    unigram_logprob_scores): per-doc mean negative log-prob under the
    corpus's own unigram distribution, micro-unit integer sums for
    engine-exact means."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        unigram_logprob_scores,
    )

    return unigram_logprob_scores(_t(spark, sf_dir, "documents"))


def _incremental_oracle() -> str:
    from azure_medicine_data_engineering_spark.queries.text_dedup import (
        _LSH_CTES,
        _NORM,
    )

    fp = f"md5({_NORM.format(t='text')})"
    return f"""
    WITH {_LSH_CTES},
    cand2 AS (
      SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
      FROM banded n JOIN banded c
        ON n.band = c.band AND n.bucket = c.bucket
      WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    ),
    ver AS (
      SELECT p.new_id,
             ROUND(CAST(len(list_intersect(a.dsh, b.dsh)) /
                   nullif(len(a.dsh) + len(b.dsh) - len(list_intersect(a.dsh, b.dsh)), 0)
                   AS DOUBLE), 4) AS jaccard
      FROM cand2 p
      JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) a ON p.new_id = a.doc_id
      JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) b ON p.corpus_id = b.doc_id
    ),
    near AS (SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_near
             FROM ver WHERE jaccard >= 0.5 GROUP BY new_id),
    cfp AS (SELECT DISTINCT {fp} AS fp FROM documents WHERE doc_id % 10 <> 0)
    SELECT d.doc_id,
           (cfp.fp IS NOT NULL) AS exact_dup,
           COALESCE(near.n_near, 0) > 0 AS near_dup,
           COALESCE(near.n_near, 0) AS n_near
    FROM documents d
    LEFT JOIN cfp ON {fp} = cfp.fp
    LEFT JOIN near ON d.doc_id = near.new_id
    WHERE d.doc_id % 10 = 0
    """


@register("incremental_dedup_new_batch", _incremental_oracle())
def q_incremental_dedup_new_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time dedup of a new batch (doc_id%10==0 stands in for the
    arriving slice) against the existing corpus (operators/dedup.py:
    incremental_dedup_flags): exact content-fingerprint hits plus LSH
    bucket-matched, Jaccard-verified near-dups — the corpus side is never
    self-joined. Oracle: the shared LSH CTE block bands ALL documents once,
    then restricts the join sides to new x corpus."""
    from pyspark.sql import functions as F  # noqa: F811

    from azure_medicine_data_engineering_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    docs = _t(spark, sf_dir, "documents")
    return incremental_dedup_flags(
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 != 0),
        threshold=0.5,
    )


@register(
    "packed_token_sequences",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents
    ), counts AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS n_chunks
      FROM base
    ), chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             CAST(len(toks[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens
      FROM (SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM counts)
    ), packed AS (
      SELECT doc_id, chunk_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS excl
      FROM chunks
    )
    SELECT doc_id, chunk_id, n_tokens,
           CAST(excl // 256 AS BIGINT) AS seq_id,
           CAST(excl % 256 AS BIGINT) AS seq_offset
    FROM packed
    """,
)
def q_packed_token_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the chunked corpus (operators/chunking.py:
    pack_token_sequences, budget 256): the Spark side computes the token
    prefix sum with the DISTRIBUTED two-phase scheme (deterministic doc-id
    buckets, bounded offset window); the oracle computes the same prefix
    sum as one flat window — identical output proves the two-phase
    decomposition is exact."""
    from azure_medicine_data_engineering_spark.operators.chunking import (
        chunk_documents,
        pack_token_sequences,
    )

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )
    return pack_token_sequences(chunks, budget=256, bucket_width=100)


@register(
    "temperature_upsampled_mixture",
    """
    WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
    tot AS (SELECT SUM(n) AS n_total, SUM(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM counts),
    rates AS (
      SELECT lang, n,
             ROUND(pow(CAST(n AS DOUBLE), 0.5) / z * n_total / n, 6) AS r
      FROM counts, tot
    ),
    fanned AS (
      SELECT d.lang,
             CAST(FLOOR(r) AS INT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 10000
                    < FLOOR((r - FLOOR(r)) * 10000 + 0.5)
                    THEN 1 ELSE 0 END AS k
      FROM documents d JOIN rates USING (lang)
    ),
    out AS (SELECT lang, CAST(SUM(k) AS BIGINT) AS n_out FROM fanned GROUP BY lang)
    SELECT o.lang, r.n AS n_in, o.n_out,
           ROUND(CAST(o.n_out AS DOUBLE) / (SELECT SUM(n_out) FROM out), 4) AS achieved_frac,
           r.r AS rate
    FROM out o JOIN rates r USING (lang)
    """,
)
def q_temperature_upsampled_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture rebalancing (operators/sampling.py:
    temperature_upsample, alpha=0.5 — the XLM-R/mT5 convention): per
    language, input size, materialized output size (copies included),
    achieved share and the applied rate. The oracle recomputes the
    pow-ratio rates and the per-row copy counts; alpha<1 visibly flattens
    the language distribution."""
    from azure_medicine_data_engineering_spark.operators.sampling import (
        temperature_upsample,
    )

    docs = _t(spark, sf_dir, "documents")
    up = temperature_upsample(docs, key="doc_id", strata_col="lang", alpha=0.5)
    counts_in = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_in"))
    out = up.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_out")).persist()
    total_out = out.agg(F.sum("n_out").alias("_T"))
    tot_in = counts_in.agg(
        F.sum("n_in").alias("_N"),
        F.sum(F.pow(F.col("n_in").cast("double"), F.lit(0.5))).alias("_Z"),
    )
    rates = counts_in.crossJoin(F.broadcast(tot_in)).select(
        "lang",
        "n_in",
        F.round(
            F.pow(F.col("n_in").cast("double"), F.lit(0.5))
            / F.col("_Z")
            * F.col("_N")
            / F.col("n_in"),
            6,
        ).alias("rate"),
    )
    _out = (
        out.join(rates, "lang")
        .crossJoin(F.broadcast(total_out))
        .select(
            "lang",
            "n_in",
            "n_out",
            F.round(F.col("n_out").cast("double") / F.col("_T"), 4).alias(
                "achieved_frac"
            ),
            "rate",
        )
    )
    _out._stage_caches = [out]  # r15 leak fix
    return _out


@register(
    "bigram_logprob_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS.format(t='text')} AS toks FROM documents),
    big AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END) AS bg
      FROM t
    ),
    bgc AS (SELECT bg, COUNT(*) AS c_bg FROM big GROUP BY bg),
    pre AS (SELECT split_part(bg, ' ', 1) AS p, COUNT(*) AS c_pre
            FROM big GROUP BY 1),
    vs AS (SELECT COUNT(DISTINCT tk) AS v
           FROM (SELECT split_part(bg, ' ', 1) AS tk FROM big
                 UNION ALL
                 SELECT split_part(bg, ' ', 2) FROM big)),
    model AS (
      SELECT bgc.bg,
             CAST(ROUND(ln((c_bg + 0.5) / (c_pre + 0.5 * v)) * 1e6) AS BIGINT) AS lpu
      FROM bgc JOIN pre ON split_part(bgc.bg, ' ', 1) = pre.p, vs
    )
    SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(((-SUM(m.lpu)) // COUNT(*)) AS DOUBLE) / 1e6, 6) AS mean_neg_logprob
    FROM big b JOIN model m USING (bg)
    GROUP BY b.doc_id
    """,
)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional LM quality (operators/text_rank.py:
    bigram_logprob_scores, add-0.5 smoothing) — catches shuffled-order junk
    that unigram scoring cannot. Micro-unit integer log-prob sums keep the
    per-doc mean order-free; the oracle rebuilds the same smoothed model.
    V is the scored corpus's vocabulary (distinct tokens over both bigram
    positions — derived from the bigram frame on both sides, so the
    operator never pays a second raw-table scan)."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        bigram_logprob_scores,
    )

    return bigram_logprob_scores(_t(spark, sf_dir, "documents"))


@register(
    "dsir_target_selection",
    f"""
    WITH tok AS (
      SELECT doc_id, (lang = 'en') AS is_tgt,
             CAST(('0x' || substr(md5(t.tk), 1, 8)) AS BIGINT) % 1024 AS b
      FROM documents, unnest({_TOKS.format(t='text')}) AS t(tk)
    ),
    counts AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c_r,
             CAST(SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      FROM tok GROUP BY b
    ),
    tot AS (SELECT CAST(SUM(c_r) AS BIGINT) AS t_r, CAST(SUM(c_t) AS BIGINT) AS t_t
            FROM counts),
    lr AS (
      SELECT b,
             CAST(ROUND(ln(((c_t + 1.0) / (t_t + 1024.0))
                          / ((c_r + 1.0) / (t_r + 1024.0))) * 1000000) AS BIGINT) AS lru
      FROM counts, tot
    ),
    scored AS (
      SELECT tok.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(lru) AS BIGINT) AS logw_u
      FROM tok JOIN lr USING (b)
      GROUP BY tok.doc_id
    )
    SELECT doc_id, n_tokens, logw_u,
           CAST(ROW_NUMBER() OVER (ORDER BY logw_u DESC, doc_id) AS INT) AS rnk
    FROM scored
    QUALIFY rnk <= 50
    """,
)
def q_dsir_target_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/text_rank.py:dsir_importance_weights;
    Xie et al. 2023): hashed-unigram importance weights of every document
    against the English slice as the target distribution, then the
    deterministic top-50 most-target-like documents (weight desc, id
    tie-break). Integer micro-unit log-ratio sums keep per-doc weights
    exact and order-free on both engines; the 1024-bucket tables are
    fixed-size regardless of corpus scale."""
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators.text_rank import (
        dsir_importance_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    w = dsir_importance_weights(docs, F.col("lang") == "en", n_buckets=1024)
    win = Window.orderBy(F.col("logw_u").desc(), F.col("doc_id"))
    return (
        w.withColumn("rnk", F.row_number().over(win).cast("int"))
        .where(F.col("rnk") <= 50)
        .select("doc_id", "n_tokens", "logw_u", "rnk")
    )


@register(
    "hashed_linear_quality_scores",
    f"""
    WITH w AS (
      SELECT t.b,
             CAST(('0x' || substr(md5('w|' || CAST(t.b AS VARCHAR)), 1, 8)) AS BIGINT)
               % 2001 - 1000 AS w_u
      FROM (SELECT unnest(range(256)) AS b) t
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t.tk), 1, 8)) AS BIGINT) % 256 AS b
      FROM documents, unnest({_TOKS.format(t='text')}) AS t(tk)
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w_u) AS BIGINT) AS logit_u
      FROM tok JOIN w USING (b)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logit_u,
           ROUND(1.0 / (1.0 + exp(-(logit_u / (n_tokens * 1000.0)))), 4) AS prob,
           (logit_u >= 0) AS label
    FROM scored
    """,
)
def q_hashed_linear_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering served at corpus scale
    (operators/text_rank.py:hashed_linear_scores): the fastText-style
    hashed linear classifier every CCNet/GPT-3-shaped pipeline runs over
    its raw corpus — broadcast 256-bucket weight table, one token
    explode, integer milli-unit logits (order-free exact sums), sigmoid
    probability display-rounded. Weights are md5-derived here (the
    documented trained-model seam); the oracle rebuilds the table and
    every logit."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        hashed_linear_scores,
    )

    return hashed_linear_scores(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle: seeded global permutation + shard assignment.
# ---------------------------------------------------------------------------


@register(
    "epoch_shuffle_documents",
    """
    WITH keyed AS (
      SELECT doc_id, lang,
             md5('7' || ':' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS BIGINT) AS pos,
           CAST((ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1) // 64 AS BIGINT)
             AS shard_id
    FROM keyed
    """,
)
def q_epoch_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch corpus reshuffle (operators/sampling.py:epoch_shuffle, seed
    7, shard 64): the Spark side assigns positions with the distributed
    two-phase prefix sum over md5-range buckets; the oracle ranks the same
    md5 sort key in one flat window — identical output proves the bucketed
    decomposition computes the exact global permutation."""
    from azure_medicine_data_engineering_spark.operators.sampling import epoch_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return epoch_shuffle(docs, key="doc_id", seed=7, shard_size=64)


# ---------------------------------------------------------------------------
# Semantic (embedding-space) benchmark decontamination.
# ---------------------------------------------------------------------------

_COS_AB = (
    "list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "semantic_contamination_flags",
    f"""
    WITH b AS (
      SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id % 101 = 0
    ), c AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 101 <> 0
    ), sims AS (
      SELECT c.vec_id, b.bench_id,
             ROUND(CAST({_COS_AB} AS DOUBLE), 4) AS cos_sim
      FROM c CROSS JOIN b
    )
    SELECT vec_id, bench_id, cos_sim
    FROM (
      SELECT vec_id, bench_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, bench_id) AS rn
      FROM sims WHERE cos_sim >= 0.30
    ) WHERE rn = 1
    """,
)
def q_semantic_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (operators/contamination.py:
    semantic_contamination): the vec_id % 101 slice stands in for the eval
    set (same convention as benchmark_contamination's n-gram variant);
    corpus vectors within cosine 0.30 of any benchmark vector are flagged
    with their single best match."""
    from azure_medicine_data_engineering_spark.operators.contamination import (
        semantic_contamination,
    )

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") % 101 != 0)
    return semantic_contamination(corpus, bench, threshold=0.30)


# ---------------------------------------------------------------------------
# Group-by-length batch assembly (padding-efficiency batching).
# ---------------------------------------------------------------------------


@register(
    "length_bucketed_batches",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_TOKS.format(t='text')}) AS INT) AS n_tokens
      FROM documents
    ),
    bkt AS (
      SELECT doc_id, n_tokens,
             CAST(n_tokens >= 16 AS INT) + CAST(n_tokens >= 32 AS INT)
               + CAST(n_tokens >= 64 AS INT) AS bucket
      FROM base
    )
    SELECT doc_id, n_tokens, bucket,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1
                AS BIGINT) AS pos,
           CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 8
                AS BIGINT) AS batch_id
    FROM bkt
    """,
)
def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by-length batching (operators/chunking.py:
    length_bucketed_batches, boundaries 16/32/64, batch 8): the Spark side
    enumerates each bucket with the two-phase prefix sum; the oracle ranks
    each bucket in one flat window — equality proves the sub-grouped
    decomposition exact."""
    from azure_medicine_data_engineering_spark.operators.chunking import (
        length_bucketed_batches,
    )

    return length_bucketed_batches(
        _t(spark, sf_dir, "documents"), boundaries=(16, 32, 64), batch_size=8,
        bucket_width=100,
    )


# ---------------------------------------------------------------------------
# Deterministic T5 span-corruption masks.
# ---------------------------------------------------------------------------


@register(
    "span_corruption_masks",
    f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len({_TOKS.format(t='text')}) AS BIGINT) AS n
      FROM documents
    ),
    sized AS (
      SELECT doc_id, n, (n * 15) // 100 AS m FROM base
    ),
    spans AS (
      SELECT doc_id, n, m,
             greatest(1, m // 3) AS s,
             n // greatest(1, m // 3) AS seg
      FROM sized WHERE m > 0
    ),
    fan AS (
      SELECT doc_id, n, m, s, seg, unnest(range(s)) AS i FROM spans
    ),
    laid AS (
      SELECT doc_id, CAST(i AS INT) AS span_idx,
             m // s + CAST(i < m % s AS BIGINT) AS span_len,
             seg,
             CAST(('0x' || substr(md5('0' || ':' || CAST(doc_id AS VARCHAR)
                                   || ':' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
             i
      FROM fan
    )
    SELECT doc_id, span_idx,
           CAST(i * seg + h % greatest(1, seg - span_len + 1) AS BIGINT) AS span_start,
           CAST(span_len AS BIGINT) AS span_len
    FROM laid
    """,
)
def q_span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5 span-corruption layout (operators/chunking.py:
    span_corruption_masks, 15% / mean span 3 / seed 0): integer noise
    budget + md5-offset span placement, recomputed formula-for-formula by
    the oracle."""
    from azure_medicine_data_engineering_spark.operators.chunking import (
        span_corruption_masks,
    )

    return span_corruption_masks(
        _t(spark, sf_dir, "documents"), mask_pct=15, mean_span=3, seed=0
    )


# ---------------------------------------------------------------------------
# Sketch-driven per-language quality gate (keep the top quartile).
# ---------------------------------------------------------------------------


def _quality_gate_oracle() -> str:
    from azure_medicine_data_engineering_spark.functions.sketches import (
        hist_quantiles_sql,
    )

    toks = _TOKS.format(t="text")
    toks_l = _TOKS.format(t="lower(text)")
    score = (
        f"CAST(0.5 * least(len({toks}) / 100.0, 1.0) "
        f"+ 0.4 * least(len(list_filter({toks_l}, "
        f"x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))"
        f" / nullif(len({toks}), 0) * 5.0, 1.0) "
        f"- 0.1 * least((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
        f" / nullif(length(text), 0) * 10.0, 1.0) AS DOUBLE)"
    )
    inner = hist_quantiles_sql(
        "scored", "lang", "score", 0.0, 1.0, 512, qs=(0.75,)
    )
    return f"""
    WITH scored AS (
      SELECT lang, {score} AS score FROM documents
    ),
    thr AS (
      SELECT lang, est_value AS threshold FROM ({inner}) t
    )
    SELECT s.lang, threshold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           (SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END) * 1000000
              // COUNT(*)) / 1e6 AS kept_frac
    FROM scored s JOIN thr ON s.lang = thr.lang
    GROUP BY s.lang, threshold
    """


@register("quality_quantile_gate_by_lang", _quality_gate_oracle())
def q_quality_quantile_gate_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-quartile quality gate served from the mergeable
    histogram sketch (operators/text_rank.py:quality_quantile_gate) — the
    CCNet-style quality-band split with bounded per-group state. The
    oracle rebuilds the histogram, threshold, and gate CTE-for-CTE."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        quality_quantile_gate,
    )

    return quality_quantile_gate(_t(spark, sf_dir, "documents"), q=0.75)


# ---------------------------------------------------------------------------
# Round-4 end-to-end training-prep funnel:
# quality gate (sketch threshold) -> exact dedup -> epoch shuffle -> shards.
# ---------------------------------------------------------------------------


def _training_prep_oracle() -> str:
    toks = _TOKS.format(t="text")
    toks_l = _TOKS.format(t="lower(text)")
    score = (
        f"CAST(0.5 * least(len({toks}) / 100.0, 1.0) "
        f"+ 0.4 * least(len(list_filter({toks_l}, "
        f"x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))"
        f" / nullif(len({toks}), 0) * 5.0, 1.0) "
        f"- 0.1 * least((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))"
        f" / nullif(length(text), 0) * 10.0, 1.0) AS DOUBLE)"
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, text, len({toks}) AS n_tokens, {score} AS score
      FROM documents
    ),
    hist AS (
      SELECT least(greatest(CAST(floor(score * 512.0) AS INT), 0), 511) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM scored GROUP BY 1
    ),
    cum AS (
      SELECT bin,
             SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS total
      FROM hist
    ),
    thr AS (
      SELECT ROUND(CAST(MIN(bin) * {1.0 / 512!r} AS DOUBLE), 4) AS threshold
      FROM cum WHERE cum >= ceil(0.5 * total)
    ),
    kept AS (
      SELECT doc_id, text, n_tokens FROM scored, thr WHERE score >= threshold
    ),
    deduped AS (
      SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                 ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    ),
    shuffled AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (
               ORDER BY md5('11' || ':' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
      FROM deduped
    )
    SELECT CAST(pos // 32 AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM shuffled GROUP BY 1
    """


@register("corpus_e2e_training_prep", _training_prep_oracle())
def q_corpus_e2e_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 funnel composed end-to-end: sketch-thresholded quality gate
    (corpus-median cut from the 512-bin histogram), exact dedup (min-id
    keep), seeded epoch shuffle (distributed prefix sum), and 32-doc
    training shards with membership checksums. Every stage reuses the
    already-oracled operator; the oracle replays the whole chain
    CTE-for-CTE, so a drift ANYWHERE in the pipeline breaks the hash."""
    from azure_medicine_data_engineering_spark.functions.sketches import (
        hist_counts,
        hist_quantiles,
    )
    from azure_medicine_data_engineering_spark.operators.dedup import dedup_exact
    from azure_medicine_data_engineering_spark.operators.sampling import epoch_shuffle
    from azure_medicine_data_engineering_spark.operators.text import (
        quality_score,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("score"),
        F.lit(1).alias("_g"),
    ).persist()
    hist = hist_counts(scored, ["_g"], "score", 0.0, 1.0, 512)
    thr = hist_quantiles(hist, ["_g"], [0.5], 0.0, 1.0, 512).select(
        "_g", F.col("est_value").alias("threshold")
    )
    kept = scored.join(F.broadcast(thr), "_g").where(
        F.col("score") >= F.col("threshold")
    ).select("doc_id", "text", "n_tokens")
    deduped = dedup_exact(kept).select("doc_id", "n_tokens")
    shuffled = epoch_shuffle(deduped, key="doc_id", seed=11, shard_size=32)
    out = shuffled.groupBy(F.col("shard_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )
    out._stage_caches = [scored]
    return out


# ---------------------------------------------------------------------------
# Token-budget waterfill across sources (max-min fair mixture cap).
# ---------------------------------------------------------------------------


@register(
    "token_budget_waterfill",
    f"""
    WITH per_src AS (
      SELECT source AS src,
             CAST(SUM(len({_TOKS.format(t='text')})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(n_tokens) * 3 // 5 AS b, COUNT(*) AS S FROM per_src),
    ranked AS (
      SELECT src, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens, src) AS i,
             SUM(n_tokens) OVER (ORDER BY n_tokens, src
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS prefix
      FROM per_src
    ),
    star AS (
      SELECT MIN(i) AS istar, MIN_BY(prefix, i) AS pstar
      FROM ranked, tot WHERE prefix + n_tokens * (S - i + 1) >= b
    )
    SELECT src AS source, n_tokens,
           CAST(CASE WHEN istar IS NULL OR i < istar THEN n_tokens
                ELSE (b - pstar) // (S - istar + 1)
                     + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                END AS BIGINT) AS alloc_tokens,
           CASE WHEN istar IS NULL OR i < istar THEN FALSE
                ELSE (b - pstar) // (S - istar + 1)
                     + CAST((i - istar) < (b - pstar) % (S - istar + 1) AS BIGINT)
                     < n_tokens END AS capped
    FROM ranked, tot, star
    """,
)
def q_token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair token-budget split (operators/sampling.py:
    token_budget_waterfill) at 60% of the corpus's total tokens: small
    sources keep everything, the rest cap at the waterfill level; the
    closed-form integer solve is replayed by the oracle, and allocations
    sum exactly to the budget."""
    from azure_medicine_data_engineering_spark.operators.sampling import (
        token_budget_waterfill,
    )

    # 60% budget computed IN-PLAN from the solve's own total window
    # (optimization round 15, guide §5): the old driver collect() cost a
    # SECOND full-corpus tokenize pass before the solve's own; _total ==
    # the old sum(token_count) exactly, so (b) is the same floor division.
    docs = _t(spark, sf_dir, "documents")
    return token_budget_waterfill(docs, budget_total_frac=(3, 5))


# ---------------------------------------------------------------------------
# IVF-PQ + exact refine: the full production ANN serving stack.
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "embedding_ivf_pq_refine",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    cscored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_SQL.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM cscored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM assigned WHERE vec_id < 5),
    cand AS (
      SELECT q.query_id, b.vec_id AS neighbor_id
      FROM assigned b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
    ),
    sub AS (
      SELECT vec_id, t.s, v[t.s*8+1 : t.s*8+8] AS sv
      FROM e, (SELECT unnest(range(8)) AS s) t(s)
    ),
    cdim AS (
      SELECT s, vec_id % 16 AS cid, d.i AS dim, ROUND(AVG(sv[d.i + 1]), 6) AS c
      FROM sub, (SELECT unnest(range(8)) AS i) d(i)
      GROUP BY 1, 2, 3
    ),
    cb AS (SELECT s, cid, list(c ORDER BY dim) AS centroid FROM cdim GROUP BY s, cid),
    pscored AS (
      SELECT sub.vec_id, sub.s, cb.cid,
             ROUND({_l2sq_sql('sub.sv', 'cb.centroid')}, 6) AS d2
      FROM sub JOIN cb USING (s)
    ),
    codes AS (
      SELECT vec_id, s, cid AS code FROM pscored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) = 1
    ),
    qtab AS (
      SELECT qq.vec_id AS query_id, qq.s, cb.cid,
             CAST(ROUND(ROUND({_l2sq_sql('qq.sv', 'cb.centroid')}, 6) * 1e6) AS BIGINT) AS d2u
      FROM sub qq JOIN cb USING (s) WHERE qq.vec_id < 5
    ),
    adc AS (
      SELECT t.query_id, c.vec_id AS neighbor_id, SUM(t.d2u) AS du
      FROM codes c JOIN qtab t ON c.s = t.s AND c.code = t.cid AND c.vec_id <> t.query_id
      GROUP BY 1, 2
    ),
    pruned AS (
      SELECT adc.query_id, adc.neighbor_id, adc.du
      FROM adc JOIN cand ON adc.query_id = cand.query_id
                        AND adc.neighbor_id = cand.neighbor_id
    ),
    short AS (
      SELECT query_id, neighbor_id, du FROM pruned
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY du, neighbor_id) <= 20
    ),
    rer AS (
      SELECT s.query_id, s.neighbor_id,
             ROUND(CAST(s.du AS DOUBLE) / 1e6, 4) AS approx_dist,
             ROUND(CAST({_COS_SQL.format(a='n.v', b='q.qv')} AS DOUBLE), 4) AS cos_sim
      FROM short s
      JOIN e n ON n.vec_id = s.neighbor_id
      JOIN q ON q.query_id = s.query_id
    )
    SELECT query_id, neighbor_id, approx_dist, cos_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rnk
    FROM rer QUALIFY rnk <= 5
    """,
)
def q_embedding_ivf_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ANN serving stack (operators/similarity.py:ivf_pq_refine_topk):
    IVF cell prune → PQ/ADC shortlist of 20 → exact cosine re-rank to
    top-5. The oracle replays all three stages — coarse assignment, code
    assignment, integer ADC sums, prune, shortlist, and refine — so any
    drift in any stage breaks the hash."""
    from azure_medicine_data_engineering_spark.operators import similarity

    return similarity.ivf_pq_refine_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4],
        k=5, shortlist=20,
    )


@register(
    "calibration_bins_quality",
    f"""
    WITH w AS (
      SELECT t.b,
             CAST(('0x' || substr(md5('w|' || CAST(t.b AS VARCHAR)), 1, 8)) AS BIGINT)
               % 2001 - 1000 AS w_u
      FROM (SELECT unnest(range(256)) AS b) t
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t.tk), 1, 8)) AS BIGINT) % 256 AS b
      FROM documents, unnest({_TOKS.format(t='text')}) AS t(tk)
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w_u) AS BIGINT) AS logit_u
      FROM tok JOIN w USING (b)
      GROUP BY doc_id
    ),
    probd AS (
      SELECT s.doc_id,
             ROUND(1.0 / (1.0 + exp(-(s.logit_u / (s.n_tokens * 1000.0)))), 4) AS prob,
             CASE WHEN length(d.text) >= 170 THEN 1 ELSE 0 END AS y
      FROM scored s JOIN documents d USING (doc_id)
    ),
    binned AS (
      SELECT CAST(LEAST(7, FLOOR(prob * 8)) AS INT) AS bin, prob, y FROM probd
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (CAST(SUM(CAST(ROUND(prob * 1e4) AS BIGINT)) AS BIGINT) // COUNT(*)) / 1e4 AS mean_prob,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           (CAST(SUM(y) AS BIGINT) * 1000000 // COUNT(*)) / 1e6 AS pos_rate
    FROM binned GROUP BY bin
    """,
)
def q_calibration_bins_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability bins (operators/text_rank.py:
    calibration_bins) of the served hashed-linear quality probabilities
    against the length>=170 reference label — the readout that tells a
    pipeline whether its quality-filter probabilities can be THRESHOLDED
    as probabilities or only ranked (md5-derived weights are near-random,
    so the expected picture is a flat, uninformative diagram — honestly
    measured). The oracle replays the full serving chain, the binning,
    and both integer-grid means."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        calibration_bins,
        hashed_linear_scores,
    )

    d = _t(spark, sf_dir, "documents")
    scored = hashed_linear_scores(d).join(
        d.select("doc_id", (F.length("text") >= 170).alias("y")), "doc_id"
    )
    return calibration_bins(scored, "prob", "y", n_bins=8)


@register(
    "corpus_datasheet_by_source",
    f"""
    WITH base AS (
      SELECT source, lang, doc_id,
             CAST(len({_TOKS.format(t='text')}) AS BIGINT) AS n_toks,
             CAST(length(text) AS BIGINT) AS n_chars,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents
    ),
    lang_counts AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM base GROUP BY 1, 2
    ),
    top_lang AS (
      SELECT source, lang AS top_lang FROM lang_counts
      QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang) = 1
    ),
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_docs
      FROM base GROUP BY 1
    )
    SELECT p.source, p.n_docs, p.n_tokens, p.n_chars, p.n_langs, t.top_lang,
           p.n_unique_docs,
           ((p.n_docs - p.n_unique_docs) * 1000000 // p.n_docs) / 1e6 AS dup_rate
    FROM per_src p JOIN top_lang t USING (source)
    """,
)
def q_corpus_datasheet_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus DATASHEET — the release artifact every dataset
    ships (Gebru et al. 2021's datasheets, operationalized): doc/token/
    char volumes, language spread with the deterministic majority
    language, and the exact-duplicate rate from the normalized-text
    fingerprint (``operators/text.py:fingerprint``). One keyed pass over
    the corpus plus a (source, lang)-frame argmax — every number
    engine-exact (integer micro dup-rate), so the datasheet itself is
    reproducible evidence, not an estimate."""
    from azure_medicine_data_engineering_spark.operators.text import (
        fingerprint,
        token_count,
    )
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "source",
        "lang",
        token_count(F.col("text")).cast("long").alias("n_toks"),
        F.length("text").cast("long").alias("n_chars"),
        fingerprint(F.col("text")).alias("fp"),
    ).persist()
    lang_counts = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "lang")
    top = (
        lang_counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    per = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.count_distinct("fp").cast("long").alias("n_unique_docs"),
    )
    _out = per.join(top, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "top_lang",
        "n_unique_docs",
        (F.expr("(n_docs - n_unique_docs) * 1000000 div n_docs") / 1e6).alias(
            "dup_rate"
        ),
    )
    _out._stage_caches = [base]  # r15 leak fix
    return _out


@register(
    "score_separation_ks",
    f"""
    WITH w AS (
      SELECT t.b,
             CAST(('0x' || substr(md5('w|' || CAST(t.b AS VARCHAR)), 1, 8)) AS BIGINT)
               % 2001 - 1000 AS w_u
      FROM (SELECT unnest(range(256)) AS b) t
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t.tk), 1, 8)) AS BIGINT) % 256 AS b
      FROM documents, unnest({_TOKS.format(t='text')}) AS t(tk)
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w_u) AS BIGINT) AS logit_u
      FROM tok JOIN w USING (b)
      GROUP BY doc_id
    ),
    probd AS (
      SELECT ROUND(1.0 / (1.0 + exp(-(s.logit_u / (s.n_tokens * 1000.0)))), 4) AS v,
             length(d.text) >= 170 AS f
      FROM scored s JOIN documents d USING (doc_id)
    ),
    byval AS (
      SELECT v, CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN f THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM probd GROUP BY v
    ),
    cdf AS (
      SELECT v,
        CAST(SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        CAST(SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
      FROM byval
    ),
    tot AS (SELECT CAST(MAX(cum1) AS BIGINT) AS n1, CAST(MAX(cum2) AS BIGINT) AS n2 FROM cdf),
    scoredk AS (
      SELECT v, t.n1, t.n2, CAST(abs(cum1 * t.n2 - cum2 * t.n1) AS BIGINT) AS dn
      FROM cdf, tot t
    ),
    best AS (SELECT CAST(MAX(dn) AS BIGINT) AS d_num FROM scoredk),
    s2 AS (
      SELECT CAST(MAX(s.n1) AS BIGINT) AS n1, CAST(MAX(s.n2) AS BIGINT) AS n2,
             CAST(MAX(s.dn) AS BIGINT) AS d_num, MIN(s.v) AS v_at_d
      FROM scoredk s JOIN best b ON s.dn = b.d_num
    )
    SELECT n1, n2, d_num, v_at_d,
           round(d_num * 1e0 / (n1 * 1e0 * n2), 4) AS d
    FROM s2
    """,
)
def q_score_separation_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-separation KS — the credit-scoring industry's classifier
    metric (max CDF gap between the score distributions of positives and
    negatives; 2·AUC−1-adjacent but locates WHERE on the score axis the
    separation peaks, i.e. the natural cutoff): the served hashed-linear
    probabilities vs the length>=170 label through the integer-exact KS
    machinery (``rankstats.ks_two_sample``). The oracle replays serving,
    the grouped CDF and the sup maximization end to end."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ks_two_sample,
    )
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        hashed_linear_scores,
    )

    d = _t(spark, sf_dir, "documents")
    scored = hashed_linear_scores(d).join(
        d.select("doc_id", (F.length("text") >= 170).alias("y")), "doc_id"
    ).select("prob", F.when(F.col("y"), "pos").otherwise("neg").alias("cls"))
    return ks_two_sample(scored, "prob", "cls", "pos")


@register(
    "gains_table_quality_scores",
    f"""
    WITH w AS (
      SELECT t.b,
             CAST(('0x' || substr(md5('w|' || CAST(t.b AS VARCHAR)), 1, 8)) AS BIGINT)
               % 2001 - 1000 AS w_u
      FROM (SELECT unnest(range(256)) AS b) t
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(t.tk), 1, 8)) AS BIGINT) % 256 AS b
      FROM documents, unnest({_TOKS.format(t='text')}) AS t(tk)
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(w_u) AS BIGINT) AS logit_u
      FROM tok JOIN w USING (b)
      GROUP BY doc_id
    ),
    probd AS (
      SELECT s.doc_id,
             CAST(ROUND(ROUND(1.0 / (1.0 + exp(-(s.logit_u / (s.n_tokens * 1000.0)))), 4) * 1e4) AS BIGINT)
               * 10000000000 + s.doc_id AS ckey,
             CASE WHEN length(d.text) >= 170 THEN 1 ELSE 0 END AS y
      FROM scored s JOIN documents d USING (doc_id)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos_tot FROM probd),
    ranked AS (
      SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY ckey DESC) AS BIGINT) AS pos
      FROM probd
    ),
    dec AS (
      SELECT CAST((pos - 1) * 10 // t.n + 1 AS INT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM ranked, tot t GROUP BY 1, t.n
    ),
    cum AS (
      SELECT decile, n_docs, n_pos,
             CAST(SUM(n_pos) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
      FROM dec
    )
    SELECT decile, n_docs, n_pos,
           (n_pos * 1000000 // n_docs) / 1e6 AS pos_rate,
           (cum_pos * 1000000 // t.pos_tot) / 1e6 AS cum_capture,
           round((n_pos * 1e0 / n_docs) / (t.pos_tot * 1e0 / t.n), 4) AS lift
    FROM cum, tot t
    """,
)
def q_gains_table_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table — the model-eval capstone next to AUC,
    the score-separation KS and the calibration bins (the marketing
    question: 'if we act on the top 10%%, what fraction of positives do
    we capture, and at what lift?'). Row-exact score deciles WITHOUT a
    data-grain window: a composite key ``round(prob·1e4)·1e10 + doc_id``
    makes every row's sort value UNIQUE, so the bucketed rank prefix sum
    (``ranked_value_counts``, bounded 1024-row offset window) assigns
    exact descending positions and ``decile = (pos−1)·10 div n + 1`` —
    byte-identical to the oracle's ROW_NUMBER ordering. Per decile:
    counts, positive rate, cumulative capture and lift on the micro
    grid."""
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        ranked_value_counts,
    )
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        hashed_linear_scores,
    )

    d = _t(spark, sf_dir, "documents")
    probd = hashed_linear_scores(d).join(
        d.select("doc_id", (F.length("text") >= 170).cast("long").alias("y")),
        "doc_id",
    ).select(
        (
            F.round(F.col("prob") * 1e4).cast("long") * 10_000_000_000
            + F.col("doc_id")
        ).alias("ckey"),
        "y",
    )
    ranked = ranked_value_counts(
        probd.select("ckey", "y"),
        "ckey",
        extra_counts=[F.sum("y").cast("long").alias("ypos")],
    )
    tot = ranked.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum("ypos").cast("long").alias("pos_tot"),
    )
    # composite keys are unique: c_all == 1, descending pos = n - cnt_less
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("(n - cnt_less - 1) * 10 div n + 1").cast("int").alias("decile"),
            "ypos",
            "n",
            "pos_tot",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ypos").cast("long").alias("n_pos"),
            F.max("n").alias("n"),
            F.max("pos_tot").alias("pos_tot"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        dec.select(
            "decile",
            "n_docs",
            "n_pos",
            "n",
            "pos_tot",
            F.sum("n_pos").over(w).cast("long").alias("cum_pos"),
        )
        .select(
            "decile",
            "n_docs",
            "n_pos",
            (F.expr("n_pos * 1000000 div n_docs") / 1e6).alias("pos_rate"),
            (F.expr("cum_pos * 1000000 div pos_tot") / 1e6).alias("cum_capture"),
            F.expr(
                "round((n_pos * 1e0 / n_docs) / (pos_tot * 1e0 / n), 4)"
            ).alias("lift"),
        )
    )


@register(
    "duplicate_span_ranges",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, {_TOKS.format(t='text')} AS tk FROM documents
    ),
    wins AS MATERIALIZED (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS ord,
             md5(array_to_string(tk[i : i + 7], ' ')) AS h
      FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i FROM toks)
    ),
    dup_h AS (SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    flagged AS (SELECT w.doc_id, w.ord FROM wins w JOIN dup_h USING (h)),
    isl AS (
      SELECT doc_id, ord,
             CASE WHEN lag(ord) OVER (PARTITION BY doc_id ORDER BY ord) IS NULL
                       OR ord > lag(ord) OVER (PARTITION BY doc_id ORDER BY ord) + 8
                  THEN 1 ELSE 0 END AS ni
      FROM flagged
    ),
    isl2 AS (
      SELECT doc_id, ord,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY ord
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    )
    SELECT doc_id,
           CAST(MIN(ord) AS BIGINT) AS span_start,
           CAST(MAX(ord) + 8 AS BIGINT) AS span_end,
           CAST(MAX(ord) + 8 - MIN(ord) AS BIGINT) AS span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl2 GROUP BY doc_id, island
    """,
)
def q_duplicate_span_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span cut ranges (round 11, operators/dedup.py:
    duplicate_span_ranges) — merges duplicate_window_spans' fixed-width
    flagged windows into the maximal token ranges Lee et al.'s
    ExactSubstr actually cuts: islands-and-gaps over flagged window
    ordinals (new island when a flagged window starts past the previous
    one's coverage), per-document keyed windows only. The oracle replays
    the window hashing, the distinct-doc duplicate test, and the same
    lag/running-sum island assignment."""
    from azure_medicine_data_engineering_spark.operators.dedup import (
        duplicate_span_ranges,
    )

    return duplicate_span_ranges(_t(spark, sf_dir, "documents"), w=8)


from azure_medicine_data_engineering_spark.operators.sampling import (  # noqa: E402
    DOREMI_ALPHA_EXPR,
    DOREMI_WEIGHT_EXPR,
    doremi_domain_weights,
)


@register(
    "doremi_domain_weights",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT source AS g, unnest({_TOKS.format(t='text')}) AS tok
      FROM documents
    ),
    vocab AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lpu AS MATERIALIZED (
      SELECT tok, CAST(ROUND(ln(cnt / (total * 1e0)) * 1e6) AS BIGINT) AS lpu
      FROM vocab, tot
    ),
    per_dom AS MATERIALIZED (
      SELECT t.g, SUM(l.lpu) AS slpu,  -- HUGEINT: no BIGINT cap on the sum
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM toks t JOIN lpu l USING (tok) GROUP BY t.g
    ),
    docs AS (
      SELECT source AS g, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    base AS (
      SELECT CAST((-SUM(slpu)) // SUM(n_tokens) AS BIGINT) AS base_micro
      FROM per_dom
    ),
    staged AS MATERIALIZED (
      SELECT g, n_docs, n_tokens,
             CAST((-slpu) // n_tokens AS BIGINT) AS nll_micro,
             CAST(LEAST(GREATEST((-slpu) // n_tokens - base_micro, 0),
                        5000000) AS BIGINT)
               AS excess_micro
      FROM per_dom JOIN docs USING (g), base
    ),
    alphas AS MATERIALIZED (
      SELECT *, {DOREMI_ALPHA_EXPR} AS alpha FROM staged
    ),
    norm AS (
      SELECT CAST(SUM(alpha) AS BIGINT) AS alpha_sum,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM alphas
    )
    SELECT g, n_docs, n_tokens, nll_micro, excess_micro,
           {DOREMI_WEIGHT_EXPR} AS weight
    FROM alphas, norm
    """,
)
def q_doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-shaped domain mixture weights (round 11,
    operators/sampling.py:doremi_domain_weights; Xie et al. 2023): per
    source the mean unigram-LM NLL on the 1e-6 integer grid, excess over
    the global mean clamped at 0, one exponentiated-gradient step on the
    token-share prior (alpha snapped to an exact integer BEFORE the
    normalizing sum — cross-domain double sums would be fold-order-
    dependent), 1%-uniform smoothing. The mixture table a pretraining
    data team feeds back into quota sampling."""
    return doremi_domain_weights(_t(spark, sf_dir, "documents"))


@register(
    "ccnet_perplexity_buckets",
    f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, source AS g, unnest({_TOKS.format(t='text')}) AS tok
      FROM documents
    ),
    vocab AS MATERIALIZED (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lpu AS MATERIALIZED (
      SELECT tok, CAST(ROUND(ln(cnt / total) * 1e6) AS BIGINT) AS lpu
      FROM vocab, tot
    ),
    doc_nll AS MATERIALIZED (
      SELECT t.doc_id, t.g,
             CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll
      FROM tok t JOIN lpu l USING (tok) GROUP BY t.doc_id, t.g
    ),
    byval AS (
      SELECT g, nll AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM doc_nll GROUP BY 1, 2
    ),
    cum AS MATERIALIZED (
      SELECT g, v,
             CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM byval
    ),
    n_g AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM doc_nll GROUP BY g),
    cuts AS MATERIALIZED (
      SELECT c.g,
             MIN(CASE WHEN c.cum >= (1 * ng.n + 2) // 3 THEN c.v END) AS t1,
             MIN(CASE WHEN c.cum >= (2 * ng.n + 2) // 3 THEN c.v END) AS t2
      FROM cum c JOIN n_g ng USING (g) GROUP BY c.g
    )
    SELECT d.g,
           CASE WHEN d.nll <= k.t1 THEN 'head'
                WHEN d.nll <= k.t2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(d.nll) AS BIGINT) AS nll_min,
           CAST(MAX(d.nll) AS BIGINT) AS nll_max
    FROM doc_nll d JOIN cuts k USING (g)
    GROUP BY 1, 2
    """,
)
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity routing per source (round 11,
    operators/text_rank.py:ccnet_perplexity_buckets; Wenzek et al.
    2020): per-doc unigram NLL on the 1e-6 integer grid, per-slice
    EXACT tercile order statistics (min v with cum ≥ ceil(k·n/3) —
    never a sketch), head = cleanest third. The routing table CCNet
    derivatives (RedPajama, CulturaX) key their quality splits on."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        ccnet_perplexity_buckets,
    )

    return ccnet_perplexity_buckets(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Kneser-Ney trigram router (round 12).
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    KN_LPU_EXPR as _KN_LPU,
)


@register(
    "kn_trigram_perplexity_by_source",
    f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, g, t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] AS tg
      FROM tk t, LATERAL (SELECT unnest(range(1, len(t.w) - 1)) AS i) r
    ),
    t3 AS MATERIALIZED (
      SELECT tg, CAST(COUNT(*) AS BIGINT) AS c3,
             string_split(tg, ' ')[1] AS a,
             string_split(tg, ' ')[2] AS b,
             string_split(tg, ' ')[3] AS c
      FROM tri GROUP BY tg
    ),
    ab AS MATERIALIZED (
      SELECT a, b, CAST(SUM(c3) AS BIGINT) AS cab, CAST(COUNT(*) AS BIGINT) AS nab
      FROM t3 GROUP BY a, b
    ),
    bc AS MATERIALIZED (
      SELECT b, c, CAST(COUNT(*) AS BIGINT) AS nbc FROM t3 GROUP BY b, c
    ),
    bb AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nbb,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nbl
      FROM t3 GROUP BY b
    ),
    c1 AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n1c FROM bc GROUP BY c
    ),
    na AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM bc),
    lpu AS MATERIALIZED (
      SELECT t3.tg AS tg_k, {_KN_LPU} AS lpu
      FROM t3 JOIN ab USING (a, b) JOIN bc USING (b, c)
              JOIN bb USING (b) JOIN c1 USING (c), na
    )
    SELECT g,
           CAST(COUNT(DISTINCT tri.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll_micro
    FROM tri JOIN lpu l ON tri.tg = l.tg_k
    GROUP BY g
    """,
)
def q_kn_trigram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM perplexity per source slice
    (``operators/text_rank.py:kn_trigram_logprob_by_group``) — the CCNet
    router's published model class (Wenzek et al. 2020), upgrading the
    engine's add-k bigram rung: continuation counts instead of raw counts,
    absolute discount d = 0.75, closed-form from five keyed groupBys of
    the distinct-trigram model table. The KN log-prob is ONE shared
    expression string interpolated verbatim into this oracle (identical
    IEEE op sequence both engines); sums ride the DECIMAL(38,0)/HUGEINT
    micro-grid."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        kn_trigram_logprob_by_group,
    )

    return kn_trigram_logprob_by_group(_t(spark, sf_dir, "documents"))


@register(
    "ccnet_router_model_delta",
    f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, g, t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] AS tg
      FROM tk t, LATERAL (SELECT unnest(range(1, len(t.w) - 1)) AS i) r
    ),
    t3 AS MATERIALIZED (
      SELECT tg, CAST(COUNT(*) AS BIGINT) AS c3,
             string_split(tg, ' ')[1] AS a,
             string_split(tg, ' ')[2] AS b,
             string_split(tg, ' ')[3] AS c
      FROM tri GROUP BY tg
    ),
    ab AS MATERIALIZED (
      SELECT a, b, CAST(SUM(c3) AS BIGINT) AS cab, CAST(COUNT(*) AS BIGINT) AS nab
      FROM t3 GROUP BY a, b
    ),
    bc AS MATERIALIZED (
      SELECT b, c, CAST(COUNT(*) AS BIGINT) AS nbc FROM t3 GROUP BY b, c
    ),
    bb AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nbb,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nbl
      FROM t3 GROUP BY b
    ),
    c1 AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n1c FROM bc GROUP BY c
    ),
    na AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM bc),
    lpu AS MATERIALIZED (
      SELECT t3.tg AS tg_k, {_KN_LPU} AS lpu
      FROM t3 JOIN ab USING (a, b) JOIN bc USING (b, c)
              JOIN bb USING (b) JOIN c1 USING (c), na
    ),
    kdoc AS MATERIALIZED (
      SELECT tri.doc_id, tri.g,
             CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nk
      FROM tri JOIN lpu l ON tri.tg = l.tg_k GROUP BY tri.doc_id, tri.g
    ),
    utk AS MATERIALIZED (
      SELECT doc_id, unnest(w) AS tok FROM tk
    ),
    uv AS MATERIALIZED (SELECT tok, COUNT(*) AS cnt FROM utk GROUP BY tok),
    ut AS (SELECT SUM(cnt) AS total FROM uv),
    ulpu AS MATERIALIZED (
      SELECT tok, CAST(ROUND(ln(cnt / (total * 1e0)) * 1e6) AS BIGINT) AS lpu
      FROM uv, ut
    ),
    udoc AS MATERIALIZED (
      SELECT u.doc_id, CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nu
      FROM utk u JOIN ulpu l USING (tok) GROUP BY u.doc_id
    ),
    pop AS MATERIALIZED (
      SELECT kdoc.doc_id, g, nk, nu FROM kdoc JOIN udoc USING (doc_id)
    ),
    cutk AS MATERIALIZED (
      SELECT g,
        MIN(CASE WHEN cum >= (1 * n + 2) // 3 THEN v END) AS k1,
        MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS k2
      FROM (
        SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY g) AS n
        FROM (SELECT g, nk AS v, COUNT(*) AS c FROM pop GROUP BY g, nk)
      ) GROUP BY g
    ),
    cutu AS MATERIALIZED (
      SELECT g,
        MIN(CASE WHEN cum >= (1 * n + 2) // 3 THEN v END) AS u1,
        MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS u2
      FROM (
        SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY g) AS n
        FROM (SELECT g, nu AS v, COUNT(*) AS c FROM pop GROUP BY g, nu)
      ) GROUP BY g
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk = ru THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
           CAST(SUM(CASE WHEN rk > ru THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kn_stricter,
           CAST(SUM(CASE WHEN rk < ru THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kn_looser
    FROM (
      SELECT pop.g,
        CASE WHEN nk <= k1 THEN 0 WHEN nk <= k2 THEN 1 ELSE 2 END AS rk,
        CASE WHEN nu <= u1 THEN 0 WHEN nu <= u2 THEN 1 ELSE 2 END AS ru
      FROM pop JOIN cutk USING (g) JOIN cutu USING (g)
    ) GROUP BY g
    """,
)
def q_ccnet_router_model_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-decision delta between the unigram score and the KN
    trigram (``operators/text_rank.py:ccnet_router_model_delta``): both
    models score the KN-scoreable population, exact per-slice terciles
    each, and the report counts kept vs moved buckets per slice split by
    direction — the number that says what upgrading the router's model
    actually changes."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        ccnet_router_model_delta,
    )

    return ccnet_router_model_delta(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Kneser-Ney 5-gram (round 13) — the order production CCNet ships.
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    KN5_LPU_EXPR as _KN5_LPU,
)


@register(
    "kn_5gram_perplexity_by_source",
    f"""
    WITH tk5 AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    pen AS MATERIALIZED (
      SELECT doc_id, g,
             t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] || ' ' ||
             t.w[r.i + 3] || ' ' || t.w[r.i + 4] AS pg
      FROM tk5 t, LATERAL (SELECT unnest(range(1, len(t.w) - 3)) AS i) r
    ),
    g5 AS MATERIALIZED (
      SELECT pg, CAST(COUNT(*) AS BIGINT) AS c5,
             string_split(pg, ' ')[1] AS a, string_split(pg, ' ')[2] AS b,
             string_split(pg, ' ')[3] AS c, string_split(pg, ' ')[4] AS d,
             string_split(pg, ' ')[5] AS e
      FROM pen GROUP BY pg
    ),
    abcd AS MATERIALIZED (
      SELECT a, b, c, d, CAST(SUM(c5) AS BIGINT) AS cabcd,
             CAST(COUNT(*) AS BIGINT) AS nabcd
      FROM g5 GROUP BY a, b, c, d
    ),
    bcde AS MATERIALIZED (
      SELECT b, c, d, e, CAST(COUNT(*) AS BIGINT) AS m4 FROM g5 GROUP BY b, c, d, e
    ),
    bcd AS MATERIALIZED (
      SELECT b, c, d, CAST(COUNT(*) AS BIGINT) AS w4,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l4
      FROM g5 GROUP BY b, c, d
    ),
    cde AS MATERIALIZED (
      SELECT c, d, e, CAST(COUNT(*) AS BIGINT) AS m3 FROM bcde GROUP BY c, d, e
    ),
    cd AS MATERIALIZED (
      SELECT c, d, CAST(COUNT(*) AS BIGINT) AS w3,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l3
      FROM bcde GROUP BY c, d
    ),
    de AS MATERIALIZED (
      SELECT d, e, CAST(COUNT(*) AS BIGINT) AS m2 FROM cde GROUP BY d, e
    ),
    dk AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS w2,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l2
      FROM cde GROUP BY d
    ),
    ek AS MATERIALIZED (
      SELECT e, CAST(COUNT(*) AS BIGINT) AS n1e FROM de GROUP BY e
    ),
    na5 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM de),
    lpu AS MATERIALIZED (
      SELECT g5.pg AS pg_k, {_KN5_LPU} AS lpu
      FROM g5 JOIN abcd USING (a, b, c, d) JOIN bcde USING (b, c, d, e)
              JOIN bcd USING (b, c, d) JOIN cde USING (c, d, e)
              JOIN cd USING (c, d) JOIN de USING (d, e)
              JOIN dk USING (d) JOIN ek USING (e), na5
    )
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll_micro
    FROM pen JOIN lpu l ON pen.pg = l.pg_k
    GROUP BY g
    """,
)
def q_kn_5gram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney 5-GRAM perplexity per source slice
    (``operators/text_rank.py:kn_5gram_logprob_by_group``) — the model
    ORDER production CCNet ships (Wenzek et al. 2020 trains KenLM
    5-grams; the round-12 trigram is the teaching rung below). Suffix-
    table recursion: every level-k quantity is a keyed groupBy of the
    distinct 5-gram model table or its suffix tables — never a corpus
    re-scan; the KN log-prob is ONE shared expression interpolated
    verbatim here; micro-grid sums in DECIMAL(38,0)/HUGEINT."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        kn_5gram_logprob_by_group,
    )

    return kn_5gram_logprob_by_group(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# MODIFIED Kneser-Ney 5-gram (round 13) — KenLM's estimator.
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    MKN5_LPU_EXPR as _MKN5_LPU,
)


@register(
    "mkn_5gram_perplexity_by_source",
    f"""
    WITH tkm AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    pen AS MATERIALIZED (
      SELECT doc_id, g,
             t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] || ' ' ||
             t.w[r.i + 3] || ' ' || t.w[r.i + 4] AS pg
      FROM tkm t, LATERAL (SELECT unnest(range(1, len(t.w) - 3)) AS i) r
    ),
    g5 AS MATERIALIZED (
      SELECT pg, CAST(COUNT(*) AS BIGINT) AS c5,
             string_split(pg, ' ')[1] AS a, string_split(pg, ' ')[2] AS b,
             string_split(pg, ' ')[3] AS c, string_split(pg, ' ')[4] AS d,
             string_split(pg, ' ')[5] AS e
      FROM pen GROUP BY pg
    ),
    abcd AS MATERIALIZED (
      SELECT a, b, c, d, CAST(SUM(c5) AS BIGINT) AS cabcd,
             CAST(SUM(CASE WHEN c5 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ka1,
             CAST(SUM(CASE WHEN c5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ka2,
             CAST(SUM(CASE WHEN c5 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS ka3
      FROM g5 GROUP BY a, b, c, d
    ),
    bcde AS MATERIALIZED (
      SELECT b, c, d, e, CAST(COUNT(*) AS BIGINT) AS m4 FROM g5 GROUP BY b, c, d, e
    ),
    bcd AS MATERIALIZED (
      SELECT b, c, d, CAST(SUM(m4) AS BIGINT) AS w4,
             CAST(SUM(CASE WHEN m4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kb1,
             CAST(SUM(CASE WHEN m4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS kb2,
             CAST(SUM(CASE WHEN m4 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS kb3
      FROM bcde GROUP BY b, c, d
    ),
    cde AS MATERIALIZED (
      SELECT c, d, e, CAST(COUNT(*) AS BIGINT) AS m3 FROM bcde GROUP BY c, d, e
    ),
    cd AS MATERIALIZED (
      SELECT c, d, CAST(SUM(m3) AS BIGINT) AS w3,
             CAST(SUM(CASE WHEN m3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kc1,
             CAST(SUM(CASE WHEN m3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS kc2,
             CAST(SUM(CASE WHEN m3 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS kc3
      FROM cde GROUP BY c, d
    ),
    de AS MATERIALIZED (
      SELECT d, e, CAST(COUNT(*) AS BIGINT) AS m2 FROM cde GROUP BY d, e
    ),
    dk AS MATERIALIZED (
      SELECT d, CAST(SUM(m2) AS BIGINT) AS w2,
             CAST(SUM(CASE WHEN m2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kd1,
             CAST(SUM(CASE WHEN m2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS kd2,
             CAST(SUM(CASE WHEN m2 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS kd3
      FROM de GROUP BY d
    ),
    ek AS MATERIALIZED (
      SELECT e, CAST(COUNT(*) AS BIGINT) AS n1e FROM de GROUP BY e
    ),
    na5 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM de),
    cc5 AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN c5 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s51,
             CAST(SUM(CASE WHEN c5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s52,
             CAST(SUM(CASE WHEN c5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS s53,
             CAST(SUM(CASE WHEN c5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS s54
      FROM g5
    ),
    cc4 AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN m4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s41,
             CAST(SUM(CASE WHEN m4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s42,
             CAST(SUM(CASE WHEN m4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS s43,
             CAST(SUM(CASE WHEN m4 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS s44
      FROM bcde
    ),
    cc3 AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN m3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s31,
             CAST(SUM(CASE WHEN m3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s32,
             CAST(SUM(CASE WHEN m3 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS s33,
             CAST(SUM(CASE WHEN m3 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS s34
      FROM cde
    ),
    cc2 AS MATERIALIZED (
      SELECT CAST(SUM(CASE WHEN m2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS s21,
             CAST(SUM(CASE WHEN m2 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS s22,
             CAST(SUM(CASE WHEN m2 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS s23,
             CAST(SUM(CASE WHEN m2 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS s24
      FROM de
    ),
    lpu AS MATERIALIZED (
      SELECT g5.pg AS pg_k, {_MKN5_LPU} AS lpu
      FROM g5 JOIN abcd USING (a, b, c, d) JOIN bcde USING (b, c, d, e)
              JOIN bcd USING (b, c, d) JOIN cde USING (c, d, e)
              JOIN cd USING (c, d) JOIN de USING (d, e)
              JOIN dk USING (d) JOIN ek USING (e),
           na5, cc5, cc4, cc3, cc2
    )
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll_micro
    FROM pen JOIN lpu l ON pen.pg = l.pg_k
    GROUP BY g
    """,
)
def q_mkn_5gram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODIFIED Kneser-Ney 5-gram perplexity per source — KenLM's
    estimator (Chen & Goodman 1999 eq. 26): order-specific discounts
    D1/D2/D3+ from each order's count-of-counts (four 1-row broadcast
    scalar frames), per-context N1/N2/N3+ extension tallies for the
    estimated backoff mass, deterministic fixed-0.75 fallback when an
    order's 1..4 count buckets are degenerate (exact-replica corpora).
    One shared 3.8 KB log-prob expression, identical IEEE op sequence on
    both engines; micro-grid sums in DECIMAL(38,0)/HUGEINT."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        mkn_5gram_logprob_by_group,
    )

    return mkn_5gram_logprob_by_group(_t(spark, sf_dir, "documents"))


@register(
    "ccnet_router_order_delta",
    f"""
    WITH tko AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, g, t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] AS tg
      FROM tko t, LATERAL (SELECT unnest(range(1, len(t.w) - 1)) AS i) r
    ),
    t3 AS MATERIALIZED (
      SELECT tg, CAST(COUNT(*) AS BIGINT) AS c3,
             string_split(tg, ' ')[1] AS a,
             string_split(tg, ' ')[2] AS b,
             string_split(tg, ' ')[3] AS c
      FROM tri GROUP BY tg
    ),
    ab AS MATERIALIZED (
      SELECT a, b, CAST(SUM(c3) AS BIGINT) AS cab, CAST(COUNT(*) AS BIGINT) AS nab
      FROM t3 GROUP BY a, b
    ),
    bc AS MATERIALIZED (
      SELECT b, c, CAST(COUNT(*) AS BIGINT) AS nbc FROM t3 GROUP BY b, c
    ),
    bb AS MATERIALIZED (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nbb,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nbl
      FROM t3 GROUP BY b
    ),
    c1 AS MATERIALIZED (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n1c FROM bc GROUP BY c
    ),
    na3 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM bc),
    lpu3 AS MATERIALIZED (
      SELECT t3.tg AS tg_k, {_KN_LPU} AS lpu
      FROM t3 JOIN ab USING (a, b) JOIN bc USING (b, c)
              JOIN bb USING (b) JOIN c1 USING (c), na3
    ),
    kdoc3 AS MATERIALIZED (
      SELECT tri.doc_id, tri.g,
             CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS n3
      FROM tri JOIN lpu3 l ON tri.tg = l.tg_k GROUP BY tri.doc_id, tri.g
    ),
    pen AS MATERIALIZED (
      SELECT doc_id, g,
             t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] || ' ' ||
             t.w[r.i + 3] || ' ' || t.w[r.i + 4] AS pg
      FROM tko t, LATERAL (SELECT unnest(range(1, len(t.w) - 3)) AS i) r
    ),
    g5 AS MATERIALIZED (
      SELECT pg, CAST(COUNT(*) AS BIGINT) AS c5,
             string_split(pg, ' ')[1] AS a, string_split(pg, ' ')[2] AS b,
             string_split(pg, ' ')[3] AS c, string_split(pg, ' ')[4] AS d,
             string_split(pg, ' ')[5] AS e
      FROM pen GROUP BY pg
    ),
    abcd AS MATERIALIZED (
      SELECT a, b, c, d, CAST(SUM(c5) AS BIGINT) AS cabcd,
             CAST(COUNT(*) AS BIGINT) AS nabcd
      FROM g5 GROUP BY a, b, c, d
    ),
    bcde AS MATERIALIZED (
      SELECT b, c, d, e, CAST(COUNT(*) AS BIGINT) AS m4 FROM g5 GROUP BY b, c, d, e
    ),
    bcd AS MATERIALIZED (
      SELECT b, c, d, CAST(COUNT(*) AS BIGINT) AS w4,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l4
      FROM g5 GROUP BY b, c, d
    ),
    cde AS MATERIALIZED (
      SELECT c, d, e, CAST(COUNT(*) AS BIGINT) AS m3 FROM bcde GROUP BY c, d, e
    ),
    cd AS MATERIALIZED (
      SELECT c, d, CAST(COUNT(*) AS BIGINT) AS w3,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l3
      FROM bcde GROUP BY c, d
    ),
    de AS MATERIALIZED (
      SELECT d, e, CAST(COUNT(*) AS BIGINT) AS m2 FROM cde GROUP BY d, e
    ),
    dk AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS w2,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l2
      FROM cde GROUP BY d
    ),
    ek AS MATERIALIZED (
      SELECT e, CAST(COUNT(*) AS BIGINT) AS n1e FROM de GROUP BY e
    ),
    na5 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM de),
    lpu5 AS MATERIALIZED (
      SELECT g5.pg AS pg_k, {_KN5_LPU} AS lpu
      FROM g5 JOIN abcd USING (a, b, c, d) JOIN bcde USING (b, c, d, e)
              JOIN bcd USING (b, c, d) JOIN cde USING (c, d, e)
              JOIN cd USING (c, d) JOIN de USING (d, e)
              JOIN dk USING (d) JOIN ek USING (e), na5
    ),
    kdoc5 AS MATERIALIZED (
      SELECT pen.doc_id, pen.g,
             CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS n5
      FROM pen JOIN lpu5 l ON pen.pg = l.pg_k GROUP BY pen.doc_id, pen.g
    ),
    pop AS MATERIALIZED (
      SELECT kdoc5.doc_id, kdoc5.g, n5, n3
      FROM kdoc5 JOIN kdoc3 ON kdoc5.doc_id = kdoc3.doc_id
    ),
    cut5 AS MATERIALIZED (
      SELECT g,
        MIN(CASE WHEN cum >= (1 * n + 2) // 3 THEN v END) AS f1,
        MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS f2
      FROM (
        SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY g) AS n
        FROM (SELECT g, n5 AS v, COUNT(*) AS c FROM pop GROUP BY g, n5)
      ) GROUP BY g
    ),
    cut3 AS MATERIALIZED (
      SELECT g,
        MIN(CASE WHEN cum >= (1 * n + 2) // 3 THEN v END) AS t1,
        MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS t2
      FROM (
        SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY g) AS n
        FROM (SELECT g, n3 AS v, COUNT(*) AS c FROM pop GROUP BY g, n3)
      ) GROUP BY g
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN r5 = r3 THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
           CAST(SUM(CASE WHEN r5 > r3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_5g_stricter,
           CAST(SUM(CASE WHEN r5 < r3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_5g_looser
    FROM (
      SELECT pop.g,
        CASE WHEN n5 <= f1 THEN 0 WHEN n5 <= f2 THEN 1 ELSE 2 END AS r5,
        CASE WHEN n3 <= t1 THEN 0 WHEN n3 <= t2 THEN 1 ELSE 2 END AS r3
      FROM pop JOIN cut5 USING (g) JOIN cut3 USING (g)
    ) GROUP BY g
    """,
)
def q_ccnet_router_order_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing-decision delta for the ORDER upgrade KN trigram -> KN
    5-gram (``operators/text_rank.py:ccnet_router_order_delta``) —
    completes the router ladder the round-12 unigram->KN3 delta started:
    both orders score the 5-gram-scoreable population, exact per-slice
    terciles each (one stacked rank pass), kept vs moved buckets per
    slice split by direction. Trigram-consistent chimeras (every window
    seen, seams only at order 5) move strictly to n_5g_stricter."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        ccnet_router_order_delta,
    )

    return ccnet_router_order_delta(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Round 14: KN model pruning + quantized serving (KenLM --prune / -q 8).
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    KN5_PRUNED_LPU_EXPR as _KN5P_LPU,
    KN5_QUANT_EXPR_TPL as _KN5Q_TPL,
)

_KN5_PRUNE_MIN_COUNT = 2


@register(
    "kn_5gram_pruned_delta",
    f"""
    WITH tk5 AS MATERIALIZED (
      SELECT doc_id, source AS g, {_TOKS.format(t='text')} AS w FROM documents
    ),
    pen AS MATERIALIZED (
      SELECT doc_id, g,
             t.w[r.i] || ' ' || t.w[r.i + 1] || ' ' || t.w[r.i + 2] || ' ' ||
             t.w[r.i + 3] || ' ' || t.w[r.i + 4] AS pg
      FROM tk5 t, LATERAL (SELECT unnest(range(1, len(t.w) - 3)) AS i) r
    ),
    g5 AS MATERIALIZED (
      SELECT pg, CAST(COUNT(*) AS BIGINT) AS c5,
             string_split(pg, ' ')[1] AS a, string_split(pg, ' ')[2] AS b,
             string_split(pg, ' ')[3] AS c, string_split(pg, ' ')[4] AS d,
             string_split(pg, ' ')[5] AS e
      FROM pen GROUP BY pg
    ),
    abcd AS MATERIALIZED (
      SELECT a, b, c, d, CAST(SUM(c5) AS BIGINT) AS cabcd,
             CAST(COUNT(*) AS BIGINT) AS nabcd
      FROM g5 GROUP BY a, b, c, d
    ),
    bcde AS MATERIALIZED (
      SELECT b, c, d, e, CAST(COUNT(*) AS BIGINT) AS m4 FROM g5 GROUP BY b, c, d, e
    ),
    bcd AS MATERIALIZED (
      SELECT b, c, d, CAST(COUNT(*) AS BIGINT) AS w4,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l4
      FROM g5 GROUP BY b, c, d
    ),
    cde AS MATERIALIZED (
      SELECT c, d, e, CAST(COUNT(*) AS BIGINT) AS m3 FROM bcde GROUP BY c, d, e
    ),
    cd AS MATERIALIZED (
      SELECT c, d, CAST(COUNT(*) AS BIGINT) AS w3,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l3
      FROM bcde GROUP BY c, d
    ),
    de AS MATERIALIZED (
      SELECT d, e, CAST(COUNT(*) AS BIGINT) AS m2 FROM cde GROUP BY d, e
    ),
    dk AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS w2,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l2
      FROM cde GROUP BY d
    ),
    ek AS MATERIALIZED (
      SELECT e, CAST(COUNT(*) AS BIGINT) AS n1e FROM de GROUP BY e
    ),
    na5 AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nal FROM de),
    g5p AS MATERIALIZED (
      SELECT * FROM g5 WHERE c5 >= {_KN5_PRUNE_MIN_COUNT}
    ),
    abcdp AS MATERIALIZED (
      SELECT a, b, c, d, CAST(SUM(c5) AS BIGINT) AS cabcdp,
             CAST(COUNT(*) AS BIGINT) AS nabcdp
      FROM g5p GROUP BY a, b, c, d
    ),
    bcdep AS MATERIALIZED (
      SELECT b, c, d, e, CAST(COUNT(*) AS BIGINT) AS m4p FROM g5p GROUP BY b, c, d, e
    ),
    bcdp AS MATERIALIZED (
      SELECT b, c, d, CAST(COUNT(*) AS BIGINT) AS w4p,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l4p
      FROM g5p GROUP BY b, c, d
    ),
    cdep AS MATERIALIZED (
      SELECT c, d, e, CAST(COUNT(*) AS BIGINT) AS m3p FROM bcdep GROUP BY c, d, e
    ),
    cdp AS MATERIALIZED (
      SELECT c, d, CAST(COUNT(*) AS BIGINT) AS w3p,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l3p
      FROM bcdep GROUP BY c, d
    ),
    dep AS MATERIALIZED (
      SELECT d, e, CAST(COUNT(*) AS BIGINT) AS m2p FROM cdep GROUP BY d, e
    ),
    dkp AS MATERIALIZED (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS w2p,
             CAST(COUNT(DISTINCT e) AS BIGINT) AS l2p
      FROM cdep GROUP BY d
    ),
    ekp AS MATERIALIZED (
      SELECT e, CAST(COUNT(*) AS BIGINT) AS n1ep FROM dep GROUP BY e
    ),
    nap AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nalp FROM dep),
    sc0 AS MATERIALIZED (
      SELECT g5.pg, g5.c5, abcd.cabcd, abcd.nabcd, bcde.m4, bcd.w4, bcd.l4,
             cde.m3, cd.w3, cd.l3, de.m2, dk.w2, dk.l2, ek.n1e, na5.nal,
             COALESCE(p5.c5, 0) AS c5p,
             COALESCE(abcdp.cabcdp, 0) AS cabcdp,
             COALESCE(abcdp.nabcdp, 0) AS nabcdp,
             COALESCE(bcdep.m4p, 0) AS m4p,
             COALESCE(bcdp.w4p, 0) AS w4p, COALESCE(bcdp.l4p, 0) AS l4p,
             COALESCE(cdep.m3p, 0) AS m3p,
             COALESCE(cdp.w3p, 0) AS w3p, COALESCE(cdp.l3p, 0) AS l3p,
             COALESCE(dep.m2p, 0) AS m2p,
             COALESCE(dkp.w2p, 0) AS w2p, COALESCE(dkp.l2p, 0) AS l2p,
             COALESCE(ekp.n1ep, 0) AS n1ep, nap.nalp
      FROM g5
      JOIN abcd ON g5.a = abcd.a AND g5.b = abcd.b AND g5.c = abcd.c AND g5.d = abcd.d
      JOIN bcde ON g5.b = bcde.b AND g5.c = bcde.c AND g5.d = bcde.d AND g5.e = bcde.e
      JOIN bcd ON g5.b = bcd.b AND g5.c = bcd.c AND g5.d = bcd.d
      JOIN cde ON g5.c = cde.c AND g5.d = cde.d AND g5.e = cde.e
      JOIN cd ON g5.c = cd.c AND g5.d = cd.d
      JOIN de ON g5.d = de.d AND g5.e = de.e
      JOIN dk ON g5.d = dk.d
      JOIN ek ON g5.e = ek.e
      CROSS JOIN na5 CROSS JOIN nap
      LEFT JOIN g5p p5 ON g5.pg = p5.pg
      LEFT JOIN abcdp ON g5.a = abcdp.a AND g5.b = abcdp.b AND g5.c = abcdp.c AND g5.d = abcdp.d
      LEFT JOIN bcdep ON g5.b = bcdep.b AND g5.c = bcdep.c AND g5.d = bcdep.d AND g5.e = bcdep.e
      LEFT JOIN bcdp ON g5.b = bcdp.b AND g5.c = bcdp.c AND g5.d = bcdp.d
      LEFT JOIN cdep ON g5.c = cdep.c AND g5.d = cdep.d AND g5.e = cdep.e
      LEFT JOIN cdp ON g5.c = cdp.c AND g5.d = cdp.d
      LEFT JOIN dep ON g5.d = dep.d AND g5.e = dep.e
      LEFT JOIN dkp ON g5.d = dkp.d
      LEFT JOIN ekp ON g5.e = ekp.e
    ),
    scored AS MATERIALIZED (
      SELECT pg AS pg_k, {_KN5_LPU} AS lpu_f, {_KN5P_LPU} AS lpu_p
      FROM sc0
    ),
    mm AS MATERIALIZED (
      SELECT CAST(MIN(lpu_p) AS BIGINT) AS minu,
             CAST(MAX(lpu_p) AS BIGINT) AS maxu
      FROM scored
    ),
    served AS MATERIALIZED (
      SELECT pg_k, lpu_f, lpu_p, {_KN5Q_TPL.format(d='//')} AS lpu_q
      FROM scored CROSS JOIN mm
    ),
    sizes AS MATERIALIZED (
      SELECT CAST((SELECT COUNT(*) FROM g5) AS BIGINT) AS n_model_full,
             CAST((SELECT COUNT(*) FROM g5p) AS BIGINT) AS n_model_pruned
    )
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(s.lpu_f)) // COUNT(*) AS BIGINT) AS nll_full,
           CAST((-SUM(s.lpu_p)) // COUNT(*) AS BIGINT) AS nll_pruned,
           CAST((-SUM(s.lpu_q)) // COUNT(*) AS BIGINT) AS nll_pruned_q8,
           n_model_full, n_model_pruned
    FROM pen JOIN served s ON pen.pg = s.pg_k CROSS JOIN sizes
    GROUP BY g, n_model_full, n_model_pruned
    """,
)
def q_kn_5gram_pruned_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KN 5-gram serving-artifact decision table: per-slice perplexity
    under the FULL model, the PRUNED model (5-grams with count >=
    2, every suffix table rebuilt from the pruned top — backoff
    mass genuinely moves), and the pruned model's 8-bit QUANTIZED score
    cache (`operators/text_rank.py:kn_5gram_pruned_delta_by_group`) —
    KenLM's --prune/-q production step, where at 100 TB the model table
    is itself the big-data object. Scoring falls back level by level via
    ONE guarded shared expression; quantization is pure integer
    round-half-up on the micro grid (zero float surface)."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        kn_5gram_pruned_delta_by_group,
    )

    return kn_5gram_pruned_delta_by_group(
        _t(spark, sf_dir, "documents"), min_count=_KN5_PRUNE_MIN_COUNT
    )


# ---------------------------------------------------------------------------
# Round 14: quantized serving delta for the mKN production estimator.
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.queries.registry import (  # noqa: E402
    ORACLES as _OR14B,
)

_MKN_BASE = _OR14B["mkn_5gram_perplexity_by_source"]
_MKN_FINAL = """
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(l.lpu)) // COUNT(*) AS BIGINT) AS nll_micro
    FROM pen JOIN lpu l ON pen.pg = l.pg_k
    GROUP BY g
    """
assert _MKN_BASE.endswith(_MKN_FINAL), "mkn oracle tail drifted"
_MKN_QUANT_SQL = _MKN_BASE[: -len(_MKN_FINAL)] + f""",
    mm AS MATERIALIZED (
      SELECT CAST(MIN(lpu) AS BIGINT) AS minu,
             CAST(MAX(lpu) AS BIGINT) AS maxu
      FROM lpu
    ),
    served AS MATERIALIZED (
      SELECT pg_k, lpu AS lpu_p, {_KN5Q_TPL.format(d='//')} AS lpu_q
      FROM lpu CROSS JOIN mm
    ),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_model FROM g5)
    SELECT g,
           CAST(COUNT(DISTINCT pen.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_5grams,
           CAST((-SUM(s.lpu_p)) // COUNT(*) AS BIGINT) AS nll_mkn,
           CAST((-SUM(s.lpu_q)) // COUNT(*) AS BIGINT) AS nll_mkn_q8,
           n_model
    FROM pen JOIN served s ON pen.pg = s.pg_k CROSS JOIN nm
    GROUP BY g, n_model
    """


@register("mkn_5gram_quantized_delta", _MKN_QUANT_SQL)
def q_mkn_5gram_quantized_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit quantized serving cache for the PRODUCTION estimator
    (`operators/text_rank.py:mkn_5gram_quantized_delta_by_group`) —
    KenLM's -q step on the modified-KN model, completing the serving
    ladder KN-pruned / KN-quant / mKN-quant: per-slice perplexity at
    full precision vs the 255-bin integer cache. The oracle is the
    registered mKN chain extended with the shared quantization template
    (`//` spelling) — single-sourced, so estimator drift is impossible."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        mkn_5gram_quantized_delta_by_group,
    )

    return mkn_5gram_quantized_delta_by_group(_t(spark, sf_dir, "documents"))
