"""Text-analysis / dedup / similarity queries over documents + embeddings —
the LLM-training-data operator surface, oracle-checked bit-exactly (both
engines compute identical md5-derived hashes and double arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators import dedup, similarity, text
from azure_medicine_data_engineering_spark.queries.registry import register, table as _t

# Shared oracle fragments ----------------------------------------------------

_TOKS = "list_filter(regexp_split_to_array({t}, '\\s+'), x -> x <> '')"
_NORM = "trim(regexp_replace(lower({t}), '[^a-z0-9]+', ' ', 'g'))"
_HASH60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_HASH32 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


def _minhash_slot_sql(hashes: str, j: int) -> str:
    """j-th MinHash slot from the shared permutation constants (kept in
    operators.dedup so the Spark and oracle sides cannot drift)."""
    a, b = dedup._MINHASH_AB[j]
    return f"list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {dedup._MERSENNE31}))"


def _shingles_sql(t: str, n: int = 3) -> str:
    toks = _TOKS.format(t=t)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(len({toks}) - {n - 1}), "
        f"i -> array_to_string(({toks})[i + 1 : i + {n}], ' ')) "
        f"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# Per-document text statistics (length, tokens, ratios, quality score).
# ---------------------------------------------------------------------------


@register(
    "text_quality_scores",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len({_TOKS.format(t='text')}) AS n_tokens,
             list_sum(list_transform({_TOKS.format(t='text')}, x -> length(x))) AS tok_chars,
             len(list_filter({_TOKS.format(t='lower(text)')},
                 x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
               AS sw_hits,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS INT) AS n_chars,
           CAST(n_tokens AS INT) AS n_tokens,
           ROUND(CAST(tok_chars / nullif(n_tokens, 0) AS DOUBLE), 4) AS avg_token_len,
           ROUND(CAST(sw_hits / nullif(n_tokens, 0) AS DOUBLE), 4) AS stopword_ratio,
           ROUND(CAST(punct_chars / nullif(n_chars, 0) AS DOUBLE), 4) AS punct_ratio,
           ROUND(CAST(0.5 * least(n_tokens / 100.0, 1.0)
                 + 0.4 * least(sw_hits / nullif(n_tokens, 0) * 5.0, 1.0)
                 - 0.1 * least(punct_chars / nullif(n_chars, 0) * 10.0, 1.0) AS DOUBLE), 4)
             AS quality
    FROM base
    """,
)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Language-ID heuristic vs the stored label (confusion counts).
# ---------------------------------------------------------------------------


def _lang_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
    toks = _TOKS.format(t="lower(text)")
    return f"len(list_filter({toks}, x -> list_contains([{markers}], x)))"


_LANGID_PRED = (
    "CASE "
    + " ".join(
        f"WHEN c_{lang} = best AND best > 0 THEN '{lang}'"
        for lang in text.LANG_MARKERS
    )
    + " ELSE 'und' END"
)


@register(
    "langid_confusion",
    f"""
    WITH hits AS (
      SELECT lang,
             {_lang_hits_sql('en')} AS c_en,
             {_lang_hits_sql('es')} AS c_es,
             {_lang_hits_sql('fr')} AS c_fr,
             {_lang_hits_sql('de')} AS c_de,
             {_lang_hits_sql('zh')} AS c_zh
      FROM documents
    ),
    pred AS (
      SELECT lang, {_LANGID_PRED} AS predicted
      FROM (SELECT lang, c_en, c_es, c_fr, c_de, c_zh,
                   greatest(c_en, c_es, c_fr, c_de, c_zh) AS best FROM hits) t
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY lang, predicted
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", text.predict_language(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Exact dedup by content fingerprint (md5 of normalized text).
# ---------------------------------------------------------------------------

_NORM_TEXT = _NORM.format(t="text")


@register(
    "exact_dedup_groups",
    f"""
    SELECT md5({_NORM_TEXT}) AS fp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS representative
    FROM documents
    GROUP BY 1
    """,
)
def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# MinHash signatures (first two slots + shingle count — verifies the whole
# shingle→hash→min pipeline bit-exactly).
# ---------------------------------------------------------------------------


@register(
    "minhash_signatures",
    f"""
    WITH sh AS (
      SELECT doc_id, {_shingles_sql(_NORM_TEXT)} AS shingles FROM documents
    ),
    h AS (
      SELECT doc_id, len(shingles) AS n_shingles,
             list_transform(shingles, s -> {_HASH32.format(x='s')}) AS hashes
      FROM sh
    )
    SELECT doc_id,
           CAST(n_shingles AS INT) AS n_shingles,
           {_minhash_slot_sql('hashes', 0)} AS sig0,
           {_minhash_slot_sql('hashes', 1)} AS sig1
    FROM h
    """,
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    sig = dedup.minhash_signature(F.col("text"), k=2)
    return docs.select(
        "doc_id",
        F.size(dedup.word_shingles(F.col("text"))).cast("int").alias("n_shingles"),
        F.element_at(sig, 1).alias("sig0"),
        F.element_at(sig, 2).alias("sig1"),
    )


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs + exact Jaccard verification.
# ---------------------------------------------------------------------------


# Shared CTE block replicating the MinHash-LSH pipeline in DuckDB (shingles →
# 32-bit hashes → 8-slot signature → 4 bands → bucket self-join → exact
# Jaccard). Used by both the pair oracle and the cluster oracle.
_LSH_CTES = f"""
    sh AS (
      SELECT doc_id, {_shingles_sql(_NORM_TEXT)} AS shingles FROM documents
    ),
    hh AS (
      SELECT doc_id, shingles,
             list_transform(shingles, s -> {_HASH32.format(x='s')}) AS hashes
      FROM sh
    ),
    sig AS (
      SELECT doc_id, shingles,
             [{', '.join(_minhash_slot_sql('hashes', j) for j in range(8))}] AS sig
      FROM hh
    ),
    banded AS (
      SELECT doc_id, b.band, sig[b.band * 2 + 1 : b.band * 2 + 2] AS bucket
      FROM sig, (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ),
    scored AS (
      SELECT p.id_a, p.id_b,
             ROUND(CAST(len(list_intersect(a.dsh, b.dsh)) /
                   nullif(len(a.dsh) + len(b.dsh) - len(list_intersect(a.dsh, b.dsh)), 0)
                   AS DOUBLE), 4) AS jaccard
      FROM cand p
      JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) a ON p.id_a = a.doc_id
      JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) b ON p.id_b = b.doc_id
    )"""


@register(
    "minhash_lsh_dedup",
    f"WITH {_LSH_CTES}\n    SELECT id_a, id_b, jaccard FROM scored",
)
def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, k=8, bands=4)


@register(
    "dedup_cluster_assignment",
    f"""
    WITH RECURSIVE {_LSH_CTES},
    verified AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM verified
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM verified
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    mins AS (SELECT src AS id, MIN(dst) AS mr FROM reach GROUP BY src)
    SELECT LEAST(d.doc_id, COALESCE(m.mr, d.doc_id)) AS cluster_id,
           d.doc_id,
           d.doc_id = LEAST(d.doc_id, COALESCE(m.mr, d.doc_id)) AS is_representative
    FROM documents d LEFT JOIN mins m ON d.doc_id = m.id
    """,
)
def q_dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup pairs (Jaccard-verified ≥ 0.5) resolved into dedup
    clusters via distributed min-label propagation; every doc appears once,
    representative = min id. Oracle: recursive-CTE transitive closure over
    the identical SQL-replicated pair set."""
    from azure_medicine_data_engineering_spark.operators import clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, k=8, bands=4)
    return clusters.dedup_clusters(docs.select("doc_id"), pairs, threshold=0.5)


# ---------------------------------------------------------------------------
# Capped LSH pair emission + representatives-only mode (round 13 — the
# SCALE.md-named mitigation for the mega-bucket C(k,2) blowup).
# ---------------------------------------------------------------------------

_LSH_CAP = 2  # sf0.01's largest buckets have 3 members (C(3,2)=3 pairs), so
# cap=2 genuinely truncates at gate scale — the 3-member buckets keep the
# two lowest-id-star pairs and drop the (2nd,3rd) edge; at sf0.1 the
# 10-member buckets emit 2 of 45. Production would run ~10k; the rule is
# scale-free so the gate exercises the same branch.


@register(
    "minhash_lsh_dedup_capped",
    f"""
    WITH {_LSH_CTES},
    mr AS (
      SELECT doc_id, band, bucket,
             ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY doc_id) AS r,
             COUNT(*) OVER (PARTITION BY band, bucket) AS n
      FROM banded
    ),
    cpairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM mr l JOIN mr r
        ON l.band = r.band AND l.bucket = r.bucket AND l.r < r.r
      WHERE (l.r - 1) * (2 * l.n - l.r) // 2 < {_LSH_CAP}
        AND (l.r - 1) * (2 * l.n - l.r) // 2 + (r.r - l.r) <= {_LSH_CAP}
    )
    SELECT p.id_a, p.id_b,
           ROUND(CAST(len(list_intersect(a.dsh, b.dsh)) /
                 nullif(len(a.dsh) + len(b.dsh) - len(list_intersect(a.dsh, b.dsh)), 0)
                 AS DOUBLE), 4) AS jaccard
    FROM cpairs p
    JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) a ON p.id_a = a.doc_id
    JOIN (SELECT doc_id, list_distinct(shingles) AS dsh FROM sh) b ON p.id_b = b.doc_id
    """,
)
def q_minhash_lsh_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-bucket pair-emission cap (deterministic lexicographic
    lowest-id selection, closed-form rank rule) over the same LSH
    pipeline as `minhash_lsh_dedup` — bounds a pathological mega-bucket
    at `cap` pairs instead of C(k,2)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        docs, k=8, bands=4, max_pairs_per_bucket=_LSH_CAP
    )


@register(
    "lsh_bucket_representatives",
    f"""
    WITH {_LSH_CTES},
    reps AS (
      SELECT band, bucket, MIN(doc_id) AS mn FROM banded GROUP BY band, bucket
    )
    SELECT b.doc_id, MIN(r.mn) AS rep_id,
           b.doc_id = MIN(r.mn) AS is_representative
    FROM banded b
    JOIN reps r ON b.band = r.band AND b.bucket = r.bucket
    GROUP BY b.doc_id
    """,
)
def q_lsh_bucket_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representatives-only LSH output: per-doc min id over its band
    buckets, zero pair emission — the bounded mode for corpora where the
    pair volume itself is the bottleneck."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.lsh_bucket_representatives(docs, k=8, bands=4)


# ---------------------------------------------------------------------------
# SimHash sketches.
# ---------------------------------------------------------------------------


@register(
    "simhash_sketches",
    f"""
    WITH h AS (
      SELECT doc_id,
             list_transform({_TOKS.format(t=_NORM_TEXT)}, t -> {_HASH60.format(x='t')}) AS hs
      FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(60),
                b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                          THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
    FROM h
    """,
)
def q_simhash_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", dedup.simhash60(F.col("text")).alias("simhash"))


@register(
    "simhash_near_pairs",
    f"""
    WITH h AS (
      SELECT doc_id,
             list_transform({_TOKS.format(t=_NORM_TEXT)}, t -> {_HASH60.format(x='t')}) AS hs
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(range(60),
                  b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                            THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS simhash
      FROM h
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, banded (never O(n^2) in Spark) but with
    provably exact recall at hamming <= 3 / 4 bands — so the brute-force
    all-pairs DuckDB oracle is an equality check, not an approximation."""
    return dedup.simhash_near_pairs(_t(spark, sf_dir, "documents"))


@register(
    "typo_token_pairs",
    """
    SELECT a.s_name AS tok_a, b.s_name AS tok_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
    FROM supplier a JOIN supplier b ON a.s_name < b.s_name
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def q_typo_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical identifier pairs via symmetric-delete blocking (exact
    recall at distance 1 — see operators.dedup.typo_pairs) over supplier
    names, checked against the brute-force all-pairs oracle as an equality
    (900 pairs at sf0.01 — non-vacuous). The entity-resolution shape: at
    100 TB the blocked self-join shuffles on deletion keys while the oracle's
    O(n²) comparison is only feasible because the test dimension is small."""
    return dedup.typo_pairs(_t(spark, sf_dir, "supplier"), "s_name")


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (ANN baseline) + sign-grid LSH near-pairs.
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@register(
    "embedding_knn_topk",
    f"""
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(CAST({_COS} AS DOUBLE), 4) AS cos_sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                   ORDER BY ROUND(CAST({_COS} AS DOUBLE), 4) DESC,
                                            b.vec_id) AS INT) AS rnk
    FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
    WHERE a.vec_id < 5
    QUALIFY rnk <= 10
    """,
)
def q_embedding_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.knn_topk(emb, queries, k=10)


@register(
    "embedding_lsh_near_pairs",
    f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(12),
                  i -> CASE WHEN embedding[i + 1] > 0
                            THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(CAST({_COS} AS DOUBLE), 4) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(CAST({_COS} AS DOUBLE), 4) > 0.2
    """,
)
def q_embedding_lsh_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.bucketed_near_pairs(emb, threshold=0.2, bits=12)


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (the coarse-quantizer scale path; nprobe=1).
# ---------------------------------------------------------------------------

_COS_AB = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


@register(
    "embedding_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    scored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM assigned WHERE vec_id < 5)
    SELECT q.query_id, b.vec_id AS neighbor_id,
           ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) AS cos_sim,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                         b.vec_id) AS INT) AS rnk
    FROM assigned b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
    QUALIFY rnk <= 10
    """,
)
def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN: queries search only their own cluster —
    at 100 TB the corpus is pre-partitioned by cluster so a query touches
    1/k of the data (vs the exact brute-force baseline embedding_knn_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_knn_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8)


@register(
    "embedding_ivf_nprobe2",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    scored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM scored
      WHERE vec_id < 5
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) <= 2
    )
    SELECT p.query_id, b.vec_id AS neighbor_id,
           ROUND(CAST({_COS_AB.format(a='b.v', b='p.qv')} AS DOUBLE), 4) AS cos_sim,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY p.query_id
                ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='p.qv')} AS DOUBLE), 4) DESC,
                         b.vec_id) AS INT) AS rnk
    FROM assigned b JOIN probes p ON b.cluster = p.qc AND b.vec_id <> p.query_id
    QUALIFY rnk <= 10
    """,
)
def q_embedding_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2 — the recall knob: each query searches its two
    nearest coarse clusters (2/8 of the corpus), trading 2x candidate work
    for recall on queries near cluster boundaries."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_knn_topk(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8, nprobe=2
    )


@register(
    "embedding_dedup_clusters",
    f"""
    WITH RECURSIVE bucketed AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(range(12),
                  i -> CASE WHEN embedding[i + 1] > 0
                            THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS bucket
      FROM embeddings
    ),
    near AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ROUND(CAST({_COS} AS DOUBLE), 4) > 0.9
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM near
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM near
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    mins AS (SELECT src AS id, MIN(dst) AS mr FROM reach GROUP BY src)
    SELECT LEAST(v.vec_id, COALESCE(m.mr, v.vec_id)) AS cluster_id,
           v.vec_id,
           v.vec_id = LEAST(v.vec_id, COALESCE(m.mr, v.vec_id)) AS is_representative
    FROM embeddings v LEFT JOIN mins m ON v.vec_id = m.id
    """,
)
def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup end-to-end: sign-grid LSH pairs at
    cosine > 0.9 resolved into keep/drop clusters by the same connected-
    components operator as the text path — the full modality-agnostic dedup
    story (pairs → components → representative)."""
    from azure_medicine_data_engineering_spark.operators import clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.bucketed_near_pairs(emb, threshold=0.9, bits=12)
    return clusters.dedup_clusters(
        emb.select("vec_id"), pairs, id_col="vec_id", threshold=None
    )


# ---------------------------------------------------------------------------
# Python UDTF surface (Spark 4): table function expanding each document into
# its leading tokens via LATERAL join.
# ---------------------------------------------------------------------------


@register(
    "udtf_leading_tokens",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    expanded AS (
      SELECT doc_id,
             unnest(list_transform(range(least(5, len(tk))),
                    i -> {'token': tk[i + 1], 'pos': i})) AS s
      FROM toks
    )
    SELECT doc_id, s.token AS token, CAST(s.pos AS INT) AS pos FROM expanded
    """,
)
def q_udtf_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) exploding each document into its first 5
    tokens via LATERAL — the row-generating UDF surface. Production note:
    posexplode(slice(split(...))) expresses the same thing JVM-side; the UDTF
    exists to verify the arbitrary-row-generator path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class LeadingTokens:
        def eval(self, text_value: str, k: int):
            if text_value:
                emitted = 0
                for t in text_value.split():
                    if not t:
                        continue
                    if emitted >= k:
                        break
                    yield t, emitted
                    emitted += 1

    spark.udtf.register("amde_leading_tokens", LeadingTokens)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM docs_udtf_v d, LATERAL amde_leading_tokens(d.text, 5) t"
    )


@register(
    "ngram_frequency_topk",
    f"""
    WITH sh AS (
      SELECT {_shingles_sql(_NORM.format(t='text'), 2)} AS bigrams FROM documents
    ),
    flat AS (SELECT unnest(bigrams) AS bigram FROM sh),
    counts AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM flat GROUP BY bigram
    )
    SELECT bigram, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS INT) AS rnk
    FROM counts
    QUALIFY rnk <= 25
    """,
)
def q_ngram_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram frequency table (top-25 bigrams): shingle → explode →
    count → deterministic top-k. The building block for n-gram LM stats
    over a training corpus."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from pyspark.sql.window import Window

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(dedup.word_shingles(F.col("text"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no global
    # sort); the rank window then runs over only the 25 survivors, so its
    # single-partition exchange is 25 rows, not the whole vocabulary
    top = counts.orderBy(F.col("n").desc(), F.col("bigram")).limit(25)
    w = Window.orderBy(F.col("n").desc(), F.col("bigram"))
    return top.withColumn("rnk", F.row_number().over(w).cast("int"))


@register(
    "hash_sampled_documents",
    """
    WITH b AS (
      SELECT lang, doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM b
    WHERE (lang = 'en' AND bucket < 2000)
       OR (lang <> 'en' AND bucket < 5000)
    GROUP BY lang
    """,
)
def q_hash_sampled_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (reproducible corpus builds):
    down-sample English to 20%, other languages to 50% — same rows on any
    partitioning/engine (hash-bucketed, not RNG)."""
    from azure_medicine_data_engineering_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        docs, key="doc_id", strata_col="lang",
        fractions={"en": 0.2}, default_fraction=0.5,
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.min("doc_id").cast("long").alias("min_id"),
    )


@register(
    "token_count_report",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS.format(t='text')}) AS INT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
             AS n_tokens_bpe,
           ROUND(CAST(length(text) / nullif(
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')), 0)
                 AS DOUBLE), 4) AS chars_per_bpe_token
    FROM documents
    """,
)
def q_token_count_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens plus the
    BPE-ish subword estimate (letter runs / digit runs / punctuation marks)
    and chars-per-token — all JVM-side column expressions."""
    from azure_medicine_data_engineering_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    bpe = T.bpe_ish_token_count(F.col("text"))
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("int").alias("n_tokens_ws"),
        bpe.cast("int").alias("n_tokens_bpe"),
        F.round(
            (F.length("text") / F.nullif(bpe, F.lit(0))).cast("double"), 4
        ).alias("chars_per_bpe_token"),
    )


@register(
    "corpus_summary_report",
    f"""
    WITH per_doc AS (
      SELECT doc_id, lang,
             len({_TOKS.format(t='text')}) AS n_tokens,
             md5({_NORM_TEXT}) AS fp
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_contents,
           CAST(MIN(n_tokens) AS INT) AS min_tokens,
           CAST(MAX(n_tokens) AS INT) AS max_tokens
    FROM per_doc
    """,
)
def q_corpus_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health report: doc/lang counts, total token volume,
    content-distinct count (dedup rate numerator), token-length extremes —
    the summary a training-data pipeline publishes per snapshot."""
    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.fingerprint(F.col("text")).alias("fp"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("fp").cast("long").alias("n_unique_contents"),
        F.min("n_tokens").cast("int").alias("min_tokens"),
        F.max("n_tokens").cast("int").alias("max_tokens"),
    )


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 4)
               AS tfidf_r
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    r AS (
      SELECT doc_id, term, tfidf_r,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf_r DESC, term ASC) AS rank
      FROM w
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf_r AS tfidf
    FROM r WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/text_rank.py): sparse
    long-form weighting, smoothed idf, rank window partitioned by doc —
    ranked on the ROUNDED weight so a last-ulp ln() difference cannot
    reorder near-ties cross-engine."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


@register(
    "bm25_doc_ranking",
    """
    WITH toklist AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tl
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tl) AS DOUBLE) AS dl FROM toklist),
    stats AS (SELECT AVG(dl) AS avgdl, CAST(COUNT(*) AS DOUBLE) AS n_docs
              FROM dl),
    toks AS (SELECT doc_id, unnest(tl) AS term FROM toklist),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks WHERE term IN ('spark', 'table', 'query') GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS contrib
      FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id,
           CAST((2 * SUM(CAST(ROUND(contrib * 1e6) AS BIGINT)) + 100) // 200
                AS DOUBLE) / 1e4 AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_matched_terms
    FROM scored GROUP BY doc_id
    """,
)
def q_bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to the query bag
    {spark, table, query} (operators/text_rank.py, k1=1.2, b=0.75). The
    oracle mirrors the Spark expression tree operation-for-operation
    (same literal forms, same left-associative order), avgdl is an
    exact-integer sum / count, and per-term contribs snap to the 1e-6
    grid before the per-doc sum so the aggregate is an order-free BIGINT.
    No top-k limit: the full scored set is compared."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        bm25_scores,
    )

    return bm25_scores(
        _t(spark, sf_dir, "documents"), ["spark", "table", "query"]
    )


@register(
    "pii_redaction_report",
    """
    WITH pii AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-123-4567' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                THEN ' card 4111111111111111 on file' ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(t, '\\b\\d{16}\\b')) AS INT) AS n_card,
           CAST(len(regexp_extract_all(t,
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS INT) AS n_phone,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
             '\\b\\d{16}\\b', '[CARD]', 'g'),
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g')) AS INT)
             AS redacted_len,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
             '\\b\\d{16}\\b', '[CARD]', 'g'),
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g'))
             AS redacted_md5
    FROM pii
    """,
)
def q_pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators/text.py:redact_pii): deterministic synthetic
    email/phone/card spans are appended per doc_id (both engines manufacture
    identical strings), then the regexp_replace chain redacts them. The
    md5 of the redacted text forces span-exact agreement between Java regex
    and RE2 on every document — a byte-level cross-engine check of the
    scrubber. Map-only at any scale."""
    from azure_medicine_data_engineering_spark.operators.text import (
        pii_counts,
        redact_pii,
    )

    docs = _t(spark, sf_dir, "documents")
    pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567"))
            .otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" card 4111111111111111 on file")
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    counts = pii_counts(F.col("t"))
    red = redact_pii(F.col("t"))
    return pii.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["card"].alias("n_card"),
        counts["phone"].alias("n_phone"),
        F.length(red).cast("int").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


def _kmeans_round_sql(
    src: str, carr: str, a_out: str, cent_out: str, carr_out: str,
    dim: int = 64,
) -> str:
    """One unrolled Lloyd round: assign `src` rows to nearest `carr`
    centroid (rounded cosine, tie-break lower cluster), recompute rounded
    means. Mirrors operators/similarity.py kmeans_fit exactly. ``dim``
    is the embedding dimension (64 = the embeddings table; 32 = the
    image grid tower)."""
    cos = _COS_AB.format(a=f"{src}.v", b="c.centroid")
    return f"""
    {a_out} AS (
      SELECT vec_id, v, cluster FROM (
        SELECT {src}.vec_id, {src}.v, c.cluster,
               ROUND(CAST({cos} AS DOUBLE), 6) AS c_sim
        FROM {src}, {carr} c
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY c_sim DESC, cluster) = 1
    ),
    {cent_out} AS (
      SELECT cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM {a_out}, (SELECT unnest(range({dim})) AS i) t(i)
      GROUP BY 1, 2
    ),
    {carr_out} AS (SELECT cluster, list(c ORDER BY dim) AS centroid
                   FROM {cent_out} GROUP BY cluster)"""


@register(
    "kmeans_embedding_codebook",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent0 AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr0 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
              FROM cent0 GROUP BY cluster),
    {_kmeans_round_sql('e', 'carr0', 'a1', 'cent1', 'carr1')},
    {_kmeans_round_sql('e', 'carr1', 'a2', 'cent2', 'carr2')},
    sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS size
              FROM a2 GROUP BY cluster)
    SELECT s.cluster, s.size, CAST(c2.dim AS INT) AS dim, c2.c
    FROM cent2 c2 JOIN sizes s USING (cluster)
    """,
)
def q_kmeans_embedding_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained vector-quantizer codebook: 2 Lloyd rounds of k=8 k-means
    over the embeddings (operators/similarity.py:kmeans_fit) — the
    production replacement for the id-seeded IVF coarse quantizer. The
    oracle unrolls both rounds CTE-for-CTE (same rounded cosine
    assignment, same tie-break, same rounded means), so the entire
    iterative fit must be bit-reproducible to hash-match.

    Output is the codebook EXPLODED to scalar rows (cluster, size, dim,
    c) — one row per centroid dimension — because array-typed columns are
    unsortable by the gate's pandas canonicalization (r3's only red row).
    The array-returning ``kmeans_fit`` API is unchanged;
    ``tests/test_similarity.py`` pins exploded view == array view."""
    from azure_medicine_data_engineering_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    cents, assigned = similarity.kmeans_fit(emb, k=8, iterations=2)
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        cents.join(sizes, "cluster")
        .select("cluster", "size", F.posexplode("centroid").alias("dim", "c"))
        .select("cluster", "size", F.col("dim").cast("int").alias("dim"), "c")
    )


@register(
    "embedding_ivf_trained_topk",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent0 AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr0 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
              FROM cent0 GROUP BY cluster),
    {_kmeans_round_sql('e', 'carr0', 'a1', 'cent1', 'carr1')},
    {_kmeans_round_sql('e', 'carr1', 'a2', 'cent2', 'carr2')},
    a3 AS (
      SELECT vec_id, v, cluster FROM (
        SELECT e.vec_id, e.v, c.cluster,
               ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
        FROM e, carr2 c
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM a3 WHERE vec_id < 5)
    SELECT q.query_id, b.vec_id AS neighbor_id,
           ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) AS cos_sim,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                         b.vec_id) AS INT) AS rnk
    FROM a3 b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
    QUALIFY rnk <= 10
    """,
)
def q_embedding_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN served from the TRAINED coarse quantizer: the k=8 Lloyd
    codebook (kmeans_fit, 2 rounds) replaces the id-mod centroid stub via
    ivf_knn_topk's ``centroids=`` override. Trained cells partition the
    actual vector space, so nprobe=1 searches a genuine Voronoi cell
    instead of a random id-slice — the production IVF configuration. The
    oracle unrolls init + both Lloyd rounds + the serving re-assignment
    CTE-for-CTE (a3 mirrors ivf_assign against the trained codebook)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents, _ = similarity.kmeans_fit(emb, k=8, iterations=2)
    return similarity.ivf_knn_topk(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8, centroids=cents
    )


@register(
    "weighted_sample_documents",
    f"""
    WITH s AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS weight,
             ROUND(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                         AS BIGINT) + 1.0) / {float((1 << 48) + 1)!r})
                   / length(text), 8) AS es_score
      FROM documents
    )
    SELECT doc_id, weight, es_score
    FROM s
    QUALIFY ROW_NUMBER() OVER (ORDER BY es_score, doc_id) <= 50
    """,
)
def q_weighted_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis,
    operators/sampling.py): 50 documents drawn with probability ∝ text
    length, from md5-derived deterministic uniforms — reproducible on any
    partitioning, any engine. The oracle recomputes every score; the plan
    guard for top-k (TakeOrderedAndProject) covers the orderBy+limit
    path."""
    from azure_medicine_data_engineering_spark.operators.sampling import (
        weighted_sample_keys,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("weight"), "text"
    )
    return weighted_sample_keys(docs, "doc_id", F.col("weight"), k=50).select(
        "doc_id", "weight", "es_score"
    )


@register(
    "semantic_dedup_embeddings",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent0 AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr0 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
              FROM cent0 GROUP BY cluster),
    {{r1}},
    {{r2}},
    near AS (
      SELECT y.vec_id AS hi,
             CAST(COUNT(*) AS BIGINT) AS n_near_lower
      FROM a2 x JOIN a2 y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE ROUND(CAST({_COS_AB.format(a='x.v', b='y.v')} AS DOUBLE), 4) >= 0.25
      GROUP BY y.vec_id
    )
    SELECT a.vec_id, a.cluster,
           COALESCE(n.n_near_lower, 0) AS n_near_lower,
           (n.hi IS NULL) AS keep
    FROM a2 a LEFT JOIN near n ON a.vec_id = n.hi
    """.format(
        r1=_kmeans_round_sql("e", "carr0", "a1", "cent1", "carr1"),
        r2=_kmeans_round_sql("e", "carr1", "a2", "cent2", "carr2"),
    ),
)
def q_semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-dup pruning (operators/dedup.py:
    semantic_dedup_flags; Abbas et al. 2023): k=8 trained Lloyd clusters,
    within-cluster cosine >= 0.25 marks a lower-id near-neighbor, one
    representative survives per similarity chain. The oracle unrolls the
    full k-means fit CTE-for-CTE (shared _kmeans_round_sql fragments) and
    recomputes every within-cluster pair — clustering, pairing and the
    keep rule must all be bit-reproducible to hash-match. The synthetic
    embeddings have no planted near-dups, so the threshold sits in the
    upper cosine tail to exercise a non-trivial drop set."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup_flags(emb, k=8, iterations=2, threshold=0.25)


@register(
    "ann_recall_ivf_vs_exact",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    scored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM assigned WHERE vec_id < 5),
    ivf AS (
      SELECT q.query_id, b.vec_id AS neighbor_id
      FROM assigned b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY q.query_id
          ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                   b.vec_id) <= 10
    ),
    exact AS (
      SELECT q.query_id, b.vec_id AS neighbor_id
      FROM e b JOIN q ON b.vec_id <> q.query_id
      QUALIFY ROW_NUMBER() OVER (
          PARTITION BY q.query_id
          ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                   b.vec_id) <= 10
    ),
    ov AS (
      SELECT x.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM exact x JOIN ivf i ON x.query_id = i.query_id
                              AND x.neighbor_id = i.neighbor_id
      GROUP BY x.query_id
    )
    SELECT ex.query_id,
           CAST(ex.n AS BIGINT) AS n_exact,
           CAST(iv.n AS BIGINT) AS n_ivf,
           COALESCE(ov.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(ov.n_overlap, 0) / 10.0, 4) AS recall
    FROM (SELECT query_id, COUNT(*) AS n FROM exact GROUP BY 1) ex
    JOIN (SELECT query_id, COUNT(*) AS n FROM ivf GROUP BY 1) iv USING (query_id)
    LEFT JOIN ov USING (query_id)
    """,
)
def q_ann_recall_ivf_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index evaluation (operators/similarity.py:ann_recall): recall@10
    of the nprobe=1 id-mod IVF against the exact brute-force ground truth
    on the 5-query panel — the measurement that justifies (or rejects) an
    index configuration before production. Both ranking paths are
    deterministic (rounded cosine, id tie-break) so the recall itself is
    bit-reproducible; the oracle recomputes both paths and the overlap."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_recall(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8
    )


# ---------------------------------------------------------------------------
# Graded retrieval quality (MRR + nDCG@10) of the IVF index vs exact truth.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.similarity import (
    dcg_weights_micro as _dcg_w,
)

_W_VALUES = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_dcg_w(10)))


@register(
    "retrieval_mrr_ndcg_ivf",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    scored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM assigned WHERE vec_id < 5),
    ivf AS (
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk FROM (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                          b.vec_id) AS rn
        FROM assigned b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
      ) WHERE rn <= 10
    ),
    exact AS (
      SELECT query_id, neighbor_id, CAST(rn AS INT) AS rnk FROM (
        SELECT q.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                          b.vec_id) AS rn
        FROM e b JOIN q ON b.vec_id <> q.query_id
      ) WHERE rn <= 10
    ),
    w(r, wm) AS (VALUES {_W_VALUES}),
    graded AS (
      SELECT i.query_id, i.rnk, x.rnk AS ex_rnk,
             COALESCE(11 - x.rnk, 0) * w.wm AS gain
      FROM ivf i
      LEFT JOIN exact x ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
      JOIN w ON w.r = i.rnk
    ),
    per_q AS (
      SELECT query_id,
             CAST(COUNT(ex_rnk) AS BIGINT) AS n_hits,
             CAST(COALESCE(MIN(CASE WHEN ex_rnk IS NOT NULL THEN rnk END), 0) AS INT)
               AS first_hit_rank,
             CAST(SUM(gain) AS BIGINT) AS dcg_micro
      FROM graded GROUP BY query_id
    ),
    ideal AS (
      SELECT x.query_id, CAST(SUM((11 - x.rnk) * w.wm) AS BIGINT) AS idcg_micro
      FROM exact x JOIN w ON w.r = x.rnk GROUP BY x.query_id
    )
    SELECT per_q.query_id, n_hits, first_hit_rank,
           CASE WHEN first_hit_rank > 0 THEN 1000000 // first_hit_rank ELSE 0 END
             / 1e6 AS rr,
           dcg_micro, idcg_micro,
           ((dcg_micro * 1000000) // idcg_micro) / 1e6 AS ndcg
    FROM per_q JOIN ideal ON ideal.query_id = per_q.query_id
    """,
)
def q_retrieval_mrr_ndcg_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded retrieval evaluation (operators/similarity.py:
    retrieval_rank_eval): MRR and nDCG@10 of the nprobe=1 id-mod IVF
    against the exact brute-force ranking on the 5-query panel — the
    order-sensitive complement of ann_recall_ivf_vs_exact. All position
    weights are shared integer literals (dcg_weights_micro) and every
    ratio is integer micro-unit division, so the metric is bit-identical
    across engines."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.retrieval_rank_eval(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, n_clusters=8
    )


# ---------------------------------------------------------------------------
# WordPiece-style subword vocabulary induction (counting round).
# ---------------------------------------------------------------------------


@register(
    "subword_vocab_candidates",
    f"""
    WITH words AS (
      SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents
    ),
    pieces AS (
      SELECT unnest(
        flatten([
          list_transform(range(1, least(4, length(w)) + 1),
                         L -> substr(w, 1, CAST(L AS INT))),
          flatten(list_transform(range(2, length(w) + 1),
            s -> list_transform(range(1, least(4, length(w) - s + 1) + 1),
                                L -> '##' || substr(w, CAST(s AS INT), CAST(L AS INT)))))
        ])
      ) AS piece
      FROM words
    ),
    counted AS (
      SELECT piece, CAST(COUNT(*) AS BIGINT) AS cnt FROM pieces GROUP BY piece
    )
    SELECT piece, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank
    FROM counted
    ORDER BY cnt DESC, piece LIMIT 40
    """,
)
def q_subword_vocab_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword vocabulary induction (operators/text.py:
    subword_vocab_candidates): corpus-wide candidate-unit frequencies
    (bare prefixes + '##'-marked continuations, ≤4 chars) and the top-40
    seed vocabulary — the counting pass of a WordPiece/BPE trainer."""
    return text.subword_vocab_candidates(
        _t(spark, sf_dir, "documents"), top_k=40, max_len=4
    )


# ---------------------------------------------------------------------------
# Cross-source overlap matrix (shared-boilerplate dataset-health report).
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    f"""
    WITH fps AS (
      SELECT DISTINCT source AS src,
             md5(array_to_string(({_TOKS.format(t='text')})[1:8], ' ')) AS fp
      FROM documents
    ),
    totals AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_set FROM fps GROUP BY src),
    pairs AS (
      SELECT a.src AS source_a, b.src AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           ta.n_set AS n_a, tb.n_set AS n_b,
           (n_shared * 1000000 // (ta.n_set + tb.n_set - n_shared)) / 1e6 AS jaccard
    FROM pairs
    JOIN totals ta ON ta.src = source_a
    JOIN totals tb ON tb.src = source_b
    """,
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shared-boilerplate matrix (operators/dedup.py:
    source_overlap_matrix): sources keyed by the md5 of each document's
    first-8-token opening — one sparse row per source pair sharing an
    opening, with distinct-set Jaccard. The exact-fingerprint variant is
    the same operator with the default key (empty on this synthetic
    corpus, so the registered query measures the prefix key)."""
    from azure_medicine_data_engineering_spark.operators.dedup import (
        source_overlap_matrix,
    )
    from azure_medicine_data_engineering_spark.operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 8)))
    return source_overlap_matrix(docs, key=key)


# ---------------------------------------------------------------------------
# Contrastive training-pair mining (positive + hard negative per anchor).
# ---------------------------------------------------------------------------


@register(
    "contrastive_pairs_panel",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, label AS ql FROM e WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, b.vec_id AS neighbor_id, b.label = q.ql AS same,
             ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) AS cos_sim
      FROM e b JOIN q ON b.vec_id <> q.query_id
    ),
    pos AS (
      SELECT query_id, neighbor_id AS pos_id, cos_sim AS pos_sim FROM scored
      WHERE same
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) = 1
    ),
    neg AS (
      SELECT query_id, neighbor_id AS neg_id, cos_sim AS neg_sim FROM scored
      WHERE NOT same
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) = 1
    )
    SELECT pos.query_id, pos_id, pos_sim, neg_id, neg_sim,
           ROUND(pos_sim - neg_sim, 4) AS margin
    FROM pos JOIN neg ON pos.query_id = neg.query_id
    """,
)
def q_contrastive_pairs_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive pair mining (operators/similarity.py:contrastive_pairs):
    nearest same-label positive + nearest other-label hard negative for the
    8-anchor panel, with the pos-neg margin — the data-prep step of a
    contrastive embedding trainer (SimCSE/DPR-style hard-negative mining)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.contrastive_pairs(emb, query_ids=list(range(8)))


# ---------------------------------------------------------------------------
# WordPiece tokenizer SERVING: apply the induced vocab (greedy longest-match)
# — Arrow kernel on the Spark side, recursive CTE in the oracle.
# ---------------------------------------------------------------------------


@register(
    "wordpiece_tokenize_stats",
    f"""
    WITH RECURSIVE
    allpieces AS (
      SELECT unnest(
        flatten([
          list_transform(range(1, least(4, length(w)) + 1),
                         L -> substr(w, 1, CAST(L AS INT))),
          flatten(list_transform(range(2, length(w) + 1),
            s -> list_transform(range(1, least(4, length(w) - s + 1) + 1),
                                L -> '##' || substr(w, CAST(s AS INT), CAST(L AS INT)))))
        ])
      ) AS piece
      FROM (SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents)
    ),
    vocab AS (
      SELECT piece FROM (
        SELECT piece, COUNT(*) AS cnt FROM allpieces GROUP BY piece
      ) ORDER BY cnt DESC, piece LIMIT 200
    ),
    vl AS (SELECT list(piece) AS vp FROM vocab),
    words AS (
      SELECT DISTINCT unnest({_TOKS.format(t='text')}) AS w FROM documents
    ),
    steps(w, pos, n_pieces, failed) AS (
      SELECT w, CAST(1 AS BIGINT), 0, FALSE FROM words
      UNION ALL
      SELECT w, pos + COALESCE(bestL, 0), n_pieces + 1, bestL IS NULL
      FROM (
        SELECT w, pos, n_pieces,
               list_max(list_filter(list_transform(
                 range(least(4, length(w) - pos + 1), 0, -1),
                 L -> CASE WHEN list_contains(vp,
                        (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                          || substr(w, CAST(pos AS INT), CAST(L AS INT)))
                      THEN L END), x -> x IS NOT NULL)) AS bestL
        FROM steps, vl WHERE pos <= length(w) AND NOT failed
      ) t
    ),
    word_stats AS (
      SELECT w,
             CASE WHEN failed THEN 1 ELSE n_pieces END AS w_pieces,
             CASE WHEN failed THEN 1 ELSE 0 END AS w_unk
      FROM steps WHERE failed OR pos = length(w) + 1
    ),
    corpus AS (
      SELECT doc_id, unnest({_TOKS.format(t='text')}) AS w FROM documents
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(w_unk) AS BIGINT) AS n_unk
    FROM corpus JOIN word_stats USING (w)
    GROUP BY doc_id
    """,
)
def q_wordpiece_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer serving (operators/text.py:wordpiece_tokenize_stats): the
    top-200 induced subword vocabulary applied back to the corpus by greedy
    longest-match with whole-word [UNK] fallback. The Spark matcher is an
    Arrow kernel over the DISTINCT word table; the oracle replays the same
    greedy walk as a DuckDB recursive CTE — agreement pins every match
    decision, not just the totals."""
    from azure_medicine_data_engineering_spark.operators.text import (
        subword_vocab_candidates,
        wordpiece_tokenize_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = [
        r.piece for r in subword_vocab_candidates(docs, top_k=200, max_len=4).collect()
    ]
    return wordpiece_tokenize_stats(docs, vocab, max_len=4)


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized search (the 4x-compression integer fast path).
# ---------------------------------------------------------------------------


@register(
    "embedding_sq8_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS (
      SELECT vec_id, t.i AS dim, v[t.i + 1] AS x
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
    ),
    ranges AS (SELECT dim, MIN(x) AS lo, MAX(x) AS hi FROM dims GROUP BY dim),
    codes AS (
      SELECT d.vec_id, d.dim,
             CAST(CASE WHEN r.hi > r.lo
                  THEN greatest(0, least(255,
                       floor((d.x - r.lo) * 255.0 / (r.hi - r.lo) + 0.5)))
                  ELSE 0 END AS BIGINT) AS c
      FROM dims d JOIN ranges r USING (dim)
    ),
    q AS (SELECT vec_id AS query_id, dim, c AS qc FROM codes WHERE vec_id < 5),
    pairs AS (
      SELECT q.query_id, codes.vec_id AS neighbor_id,
             CAST(SUM((codes.c - q.qc) * (codes.c - q.qc)) AS BIGINT) AS code_dist
      FROM codes JOIN q ON codes.dim = q.dim AND codes.vec_id <> q.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, code_dist,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY code_dist, neighbor_id) AS INT) AS rnk
    FROM pairs QUALIFY rnk <= 10
    """,
)
def q_embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search (operators/similarity.py:sq8_knn_topk):
    per-dimension byte codes from corpus [min, max] ranges, exact integer
    squared-code distances, top-10 per panel query — the 4x-compression
    companion to the PQ path."""
    return similarity.sq8_knn_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4], k=10
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval (k=3 greedy rounds unrolled in the oracle).
# ---------------------------------------------------------------------------


@register(
    "mmr_diversified_top3",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    cand AS (
      SELECT query_id, neighbor_id, cos_sim, cv FROM (
        SELECT q.query_id, b.vec_id AS neighbor_id, b.v AS cv,
               ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) AS cos_sim,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                          b.vec_id) AS rn
        FROM e b JOIN q ON b.vec_id <> q.query_id
      ) WHERE rn <= 10
    ),
    csim AS (
      SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
             ROUND(CAST({_COS_AB.format(a='a.cv', b='b.cv')} AS DOUBLE), 4) AS s
      FROM cand a JOIN cand b
        ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
    ),
    p1 AS (
      SELECT query_id, neighbor_id, cos_sim, cos_sim AS mmr_score, 1 AS pick
      FROM cand
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) = 1
    ),
    p2 AS (
      SELECT query_id, neighbor_id, cos_sim, mmr_score, 2 AS pick FROM (
        SELECT c.query_id, c.neighbor_id, c.cos_sim,
               ROUND(0.7 * c.cos_sim - (1.0 - 0.7) * s.s, 4) AS mmr_score
        FROM cand c
        JOIN p1 ON p1.query_id = c.query_id AND c.neighbor_id <> p1.neighbor_id
        JOIN csim s ON s.query_id = c.query_id AND s.ca = c.neighbor_id
                   AND s.cb = p1.neighbor_id
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr_score DESC, neighbor_id) = 1
    ),
    p3 AS (
      SELECT query_id, neighbor_id, cos_sim, mmr_score, 3 AS pick FROM (
        SELECT c.query_id, c.neighbor_id, c.cos_sim,
               ROUND(0.7 * c.cos_sim - (1.0 - 0.7) * MAX(s.s), 4) AS mmr_score
        FROM cand c
        JOIN p1 ON p1.query_id = c.query_id AND c.neighbor_id <> p1.neighbor_id
        JOIN p2 ON p2.query_id = c.query_id AND c.neighbor_id <> p2.neighbor_id
        JOIN csim s ON s.query_id = c.query_id AND s.ca = c.neighbor_id
                   AND s.cb IN (p1.neighbor_id, p2.neighbor_id)
        GROUP BY c.query_id, c.neighbor_id, c.cos_sim
      )
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY mmr_score DESC, neighbor_id) = 1
    )
    SELECT query_id, neighbor_id, cos_sim, mmr_score, CAST(pick AS INT) AS pick
    FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)
    """,
)
def q_mmr_diversified_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (operators/similarity.py:mmr_diversified_topk):
    3 greedy MMR rounds (λ=0.7) over the exact top-10 pool — the
    redundancy-penalized re-rank between ANN and a RAG context window;
    the oracle unrolls every greedy round."""
    out = similarity.mmr_diversified_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=[0, 1, 2, 3, 4],
        k=3, pool=10, lam=0.7,
    )
    return out.select(
        "query_id", "neighbor_id", "cos_sim", "mmr_score",
        F.col("pick").cast("int").alias("pick"),
    )


# ---------------------------------------------------------------------------
# Edit-distance verification over LSH candidates (keystroke-level near-dups).
# ---------------------------------------------------------------------------


@register(
    "edit_distance_near_pairs",
    f"""
    WITH {_LSH_CTES},
    lev AS (
      SELECT c.id_a, c.id_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
             CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len
      FROM cand c
      JOIN documents da ON da.doc_id = c.id_a
      JOIN documents db ON db.doc_id = c.id_b
    )
    SELECT id_a, id_b, edit_distance, max_len,
           (edit_distance * 1000000 // max_len) / 1e6 AS edit_ratio
    FROM lev WHERE edit_distance * 1000000 <= 300000 * max_len
    """,
)
def q_edit_distance_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keystroke-level near-dup verification (operators/dedup.py:
    edit_distance_near_pairs): LSH candidates re-checked by exact
    Levenshtein, kept at ≤30% normalized distance — the strictest rung of
    the pair-verify ladder (Jaccard → SimHash → edit distance), with the
    O(len²) DP confined to candidate pairs."""
    return dedup.edit_distance_near_pairs(
        _t(spark, sf_dir, "documents"), max_ratio_micro=300_000
    )


# ---------------------------------------------------------------------------
# BPE merge-loop tokenizer training (the iterative half of the subword story).
# ---------------------------------------------------------------------------

_BPE_MERGES = 12


def _bpe_round_sql(i: int, carry_word: bool = False) -> str:
    """One unrolled BPE round (the kmeans/LPA CTE-for-CTE pattern): pair
    counts from the delimited symbol strings, deterministic argmax, merge
    rewrite via the boundary-safe ``replace``. ``carry_word`` threads the
    original word through the rounds (the serving oracle joins on it)."""
    wcol = "w.wd, " if carry_word else ""
    return f"""
    p{i} AS (
      SELECT t.l[r.j] AS a, t.l[r.j + 1] AS b, CAST(SUM(t.f) AS BIGINT) AS cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), '||') AS l, f
            FROM w{i - 1}) t,
           LATERAL (SELECT unnest(range(1, len(t.l))) AS j) r
      GROUP BY 1, 2
    ),
    m{i} AS MATERIALIZED (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT {wcol}replace(w.s, '|' || m.a || '||' || m.b || '|',
                     '|' || m.a || m.b || '|') AS s, w.f
      FROM w{i - 1} w, m{i} m
    )"""


_BPE_FINAL = " UNION ALL ".join(
    f"SELECT CAST({i} AS INT) AS merge_idx, a AS left_sym, b AS right_sym, "
    f"cnt AS pair_count FROM m{i}"
    for i in range(1, _BPE_MERGES + 1)
)


@register(
    "bpe_vocab_merges",
    r"""
    WITH w0 AS MATERIALIZED (
      SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS s, f FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g
    ),
    """
    + ",".join(_bpe_round_sql(i) for i in range(1, _BPE_MERGES + 1))
    + "\n    "
    + _BPE_FINAL,
)
def q_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the documents corpus
    (``operators/text.py:bpe_merge_train``): 12 merge rounds, each one
    keyed pair-count shuffle over the DISTINCT-WORD table + a 1-row
    argmax + a map-only boundary-safe ``replace`` rewrite — the
    train-small/serve-distributed loop the subword counting pass
    (``subword_vocab_candidates``) feeds. The oracle unrolls every round
    CTE-for-CTE (the kmeans/LPA pattern); the delimited ``|s1||s2|``
    symbol encoding makes the merge rewrite a single ``replace`` with
    identical leftmost-non-overlap semantics on both engines."""
    return text.bpe_merge_train(
        _t(spark, sf_dir, "documents"), n_merges=_BPE_MERGES
    )


_BPE_SERVE_FINAL = f"""
    pieces AS (
      SELECT wd,
             CAST(len(string_split(substring(s, 2, length(s) - 2), '||')) AS BIGINT) AS np
      FROM w{_BPE_MERGES}
    ),
    tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) t WHERE regexp_matches(w, '^[a-z]+$')
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces
    FROM tok JOIN pieces ON tok.w = pieces.wd
    GROUP BY doc_id"""


@register(
    "bpe_tokenize_stats_docs",
    r"""
    WITH w0 AS MATERIALIZED (
      SELECT w AS wd, regexp_replace(w, '(.)', '|\1|', 'g') AS s, f FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g
    ),
    """
    + ",".join(_bpe_round_sql(i, carry_word=True) for i in range(1, _BPE_MERGES + 1))
    + ",\n    "
    + _BPE_SERVE_FINAL,
)
def q_bpe_tokenize_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE SERVING (``operators/text.py:bpe_tokenize_stats``): the 12
    merges trained by ``bpe_vocab_merges`` are collected as the model
    artifact (the WordPiece-vocab convention) and applied in training
    order as a fixed chain of boundary-safe ``replace`` ops over the
    DISTINCT word table; per-doc ``(n_words, n_pieces)`` re-joins the
    exploded corpus. The oracle replays the full train-then-serve chain —
    every merge round CTE-for-CTE with the original word threaded
    through, then the identical per-doc join — so the end-to-end
    tokenizer (training argmaxes AND serving rewrites) must be exact."""
    d = _t(spark, sf_dir, "documents")
    trained = text.bpe_merge_train(d, n_merges=_BPE_MERGES)
    merges = [
        (r.left_sym, r.right_sym)
        for r in trained.orderBy("merge_idx").collect()
    ]
    for c in getattr(trained, "_stage_caches", []):
        c.unpersist()
    return text.bpe_tokenize_stats(d, merges)


# ---------------------------------------------------------------------------
# Rank-biased overlap of the IVF ranking vs exact truth (eval family cap).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.similarity import (  # noqa: E402
    rbo_suffix_nano as _rbo_sfx,
)

_RBO_VALUES = ", ".join(f"({m + 1}, {s})" for m, s in enumerate(_rbo_sfx(10, 0.9)))


@register(
    "retrieval_rbo_ivf",
    f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (
      SELECT vec_id % 8 AS cluster, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    carr AS (SELECT cluster, list(c ORDER BY dim) AS centroid FROM cent GROUP BY cluster),
    scored AS (
      SELECT e.vec_id, e.v, c.cluster,
             ROUND(CAST({_COS_AB.format(a='e.v', b='c.centroid')} AS DOUBLE), 6) AS c_sim
      FROM e, carr c
    ),
    assigned AS (
      SELECT vec_id, v, cluster FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, cluster) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, cluster AS qc FROM assigned WHERE vec_id < 5),
    ivf AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                        b.vec_id) AS rnk
      FROM assigned b JOIN q ON b.cluster = q.qc AND b.vec_id <> q.query_id
      QUALIFY rnk <= 10
    ),
    exact AS (
      SELECT q.query_id, b.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY ROUND(CAST({_COS_AB.format(a='b.v', b='q.qv')} AS DOUBLE), 4) DESC,
                        b.vec_id) AS rnk
      FROM e b JOIN q ON b.vec_id <> q.query_id
      QUALIFY rnk <= 10
    ),
    sfx(m, s) AS (VALUES {_RBO_VALUES}),
    pairs AS (
      SELECT i.query_id, sfx.s AS gain
      FROM ivf i JOIN exact x ON i.query_id = x.query_id
                             AND i.neighbor_id = x.neighbor_id
      JOIN sfx ON sfx.m = GREATEST(i.rnk, x.rnk)
    ),
    per_q AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(gain) AS BIGINT) AS nano
      FROM pairs GROUP BY 1
    )
    SELECT s.query_id,
           COALESCE(p.n_common, 0) AS n_common,
           ROUND(COALESCE(p.nano, 0) / 1e9, 4) AS rbo
    FROM (SELECT DISTINCT query_id FROM ivf) s
    LEFT JOIN per_q p USING (query_id)
    """,
)
def q_retrieval_rbo_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap @10, p=0.9 (operators/similarity.py:rbo_eval;
    Webber et al. 2010 truncated form) between the nprobe=1 IVF ranking
    and the exact ground truth on the 5-query panel — the ranking-level
    agreement metric that completes recall (order-blind) and MRR/nDCG
    (relevance-graded). Each common pair's gain is the shared nano-unit
    SUFFIX literal at its first co-present depth, so per-query RBO is one
    integer sum; the oracle replays both rankings and the same literal
    table."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.rbo_eval(
        emb, query_ids=[0, 1, 2, 3, 4], k=10, p=0.9, n_clusters=8
    )


from azure_medicine_data_engineering_spark.operators.text import (  # noqa: E402
    FLESCH_EXPR as _FLESCH,
)


@register(
    "flesch_reading_ease_docs",
    f"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS w,
             GREATEST(CAST(1 AS BIGINT),
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
      FROM documents
    )
    SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
           {_FLESCH} AS flesch
    FROM c
    """,
)
def q_flesch_reading_ease_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (``operators/text.py:
    flesch_reading_ease``): sentence runs and vowel-group syllables as
    RE2-safe regexp counts, the score one shared expression over three
    exact integers — the readability column of the text-quality panel."""
    return text.flesch_reading_ease(_t(spark, sf_dir, "documents"))


from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    ZIPF_INTERCEPT_EXPR,
    ZIPF_SLOPE_EXPR,
    zipf_fit,
)


@register(
    "zipf_fit_documents",
    f"""
    WITH counts AS (
      SELECT t.tk AS tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM documents,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS t(tk)
      GROUP BY 1
    ),
    top AS (
      SELECT tok, freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS rank
      FROM counts
      QUALIFY ROW_NUMBER() OVER (ORDER BY freq DESC, tok) <= 200
    ),
    mic AS (
      SELECT CAST(ROUND(LN(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS lx,
             CAST(ROUND(LN(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS ly
      FROM top
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx) AS DOUBLE) / 1e6 AS sx,
             CAST(SUM(ly) AS DOUBLE) / 1e6 AS sy,
             CAST(SUM(lx * lx) AS DOUBLE) / 1e12 AS sxx,
             CAST(SUM(lx * ly) AS DOUBLE) / 1e12 AS sxy
      FROM mic
    )
    SELECT n AS n_top, {ZIPF_SLOPE_EXPR} AS slope,
           {ZIPF_INTERCEPT_EXPR} AS intercept
    FROM s
    """,
)
def q_zipf_fit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-200 corpus tokens
    (``operators/text_rank.py:zipf_fit``): ln(freq) ~ ln(rank) OLS, the
    linguistic sanity screen (natural text sits near slope −1; template
    or synthetic floods drift away). TakeOrderedAndProject top-k,
    micro-grid ln values, order-free integer moments, shared
    finalizations."""
    return zipf_fit(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Per-language BPE training (the stratified iterative trainer).
# ---------------------------------------------------------------------------

_BPEG_MERGES = 8


def _bpeg_round_sql(i: int) -> str:
    return f"""
    gp{i} AS (
      SELECT t.g, t.l[r.j] AS a, t.l[r.j + 1] AS b, CAST(SUM(t.f) AS BIGINT) AS cnt
      FROM (SELECT g, string_split(substring(s, 2, length(s) - 2), '||') AS l, f
            FROM gw{i - 1}) t,
           LATERAL (SELECT unnest(range(1, len(t.l))) AS j) r
      GROUP BY 1, 2, 3
    ),
    gm{i} AS MATERIALIZED (
      SELECT g, a, b, cnt FROM gp{i}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY cnt DESC, a, b) = 1
    ),
    gw{i} AS MATERIALIZED (
      SELECT w.g, replace(w.s, '|' || m.a || '||' || m.b || '|',
                          '|' || m.a || m.b || '|') AS s, w.f
      FROM gw{i - 1} w JOIN gm{i} m USING (g)
    )"""


_BPEG_FINAL = " UNION ALL ".join(
    f"SELECT g, CAST({i} AS INT) AS merge_idx, a AS left_sym, b AS right_sym, "
    f"cnt AS pair_count FROM gm{i}"
    for i in range(1, _BPEG_MERGES + 1)
)


@register(
    "bpe_vocab_merges_by_lang",
    r"""
    WITH gw0 AS MATERIALIZED (
      SELECT g, regexp_replace(w, '(.)', '|\1|', 'g') AS s, f FROM (
        SELECT lang AS g, w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY lang, w
      ) q
    ),
    """
    + ",".join(_bpeg_round_sql(i) for i in range(1, _BPEG_MERGES + 1))
    + "\n    "
    + _BPEG_FINAL,
)
def q_bpe_vocab_merges_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE BPE training (``operators/text.py:
    bpe_merge_train_by_group``): one merge table per language in a single
    unrolled loop — per-round pair counts keyed by (lang, pair), the
    argmax from a LANG-KEYED row_number window (no global ordering
    anywhere), the rewrite a lang join with column-argument replace. The
    oracle unrolls every round CTE-for-CTE with PARTITION BY lang
    argmaxes. The multilingual reality next to the global trainer
    (``bpe_vocab_merges``)."""
    return text.bpe_merge_train_by_group(
        _t(spark, sf_dir, "documents"), n_merges=_BPEG_MERGES, group_col="lang"
    )


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: heuristic prediction vs stored label.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text import (  # noqa: E402
    LANG_MARKERS as _LM,
    predict_language as _predict_language,
)


def _langid_oracle() -> str:
    hits = []
    for lang, markers in _LM.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        hits.append(
            f"CAST(len(list_filter(toks, x -> list_contains([{arr}], x)))"
            f" AS BIGINT) AS h_{lang}"
        )
    hit_cols = ",\n             ".join(hits)
    langs = list(_LM)
    best = "GREATEST(" + ", ".join(f"h_{l}" for l in langs) + ")"
    # priority order mirrors predict_language: first lang in LANG_MARKERS
    # order wins ties (the Python when-chain wraps later langs inside)
    case = (
        "CASE "
        + " ".join(f"WHEN h_{l} = best AND best > 0 THEN '{l}'" for l in langs)
        + " ELSE 'und' END"
    )
    return f"""
    WITH base AS (
      SELECT lang AS true_lang,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    scored AS (
      SELECT true_lang,
             {hit_cols}
      FROM base
    ),
    pred AS (SELECT true_lang, {best} AS best, * FROM scored)
    SELECT true_lang, {case} AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """


@register("langid_confusion_matrix", _langid_oracle())
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality control: the stopword-marker heuristic
    (``operators/text.py:predict_language``) evaluated against the
    STORED language label as a confusion matrix — the label-vs-content
    audit a multilingual corpus runs before trusting either column (on
    this synthetic corpus the content is English-ish regardless of
    label, and the matrix reports exactly that honestly). The oracle
    re-derives every marker count, the greatest-hit argmax and the
    priority tie-break."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("true_lang"),
            _predict_language(F.col("text")).alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


from azure_medicine_data_engineering_spark.operators.text_rank import (  # noqa: E402
    HEAPS_BETA_EXPR,
    HEAPS_LNK_EXPR,
    heaps_law_fit,
)


@register(
    "heaps_law_fit_documents",
    f"""
    WITH tok AS (
      SELECT doc_id AS d, t.tk AS tok
      FROM documents,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS t(tk)
    ),
    bounds AS (
      SELECT CAST(MIN(doc_id) AS BIGINT) AS dmin,
             CAST(MAX(doc_id) AS BIGINT) AS dmax
      FROM documents
    ),
    per_doc AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS nt FROM tok GROUP BY d),
    tb AS (
      SELECT LEAST(CAST(10 AS BIGINT), GREATEST(CAST(1 AS BIGINT),
               CAST(CEIL((d - b.dmin + 1) * 10 * 1e0 / (b.dmax - b.dmin + 1)) AS BIGINT)))
             AS k,
             CAST(SUM(nt) AS BIGINT) AS bt
      FROM per_doc, bounds b GROUP BY 1
    ),
    fo AS (SELECT tok, CAST(MIN(d) AS BIGINT) AS fd FROM tok GROUP BY tok),
    vb AS (
      SELECT LEAST(CAST(10 AS BIGINT), GREATEST(CAST(1 AS BIGINT),
               CAST(CEIL((fd - b.dmin + 1) * 10 * 1e0 / (b.dmax - b.dmin + 1)) AS BIGINT)))
             AS k,
             CAST(COUNT(*) AS BIGINT) AS bv
      FROM fo, bounds b GROUP BY 1
    ),
    pts AS (
      SELECT k,
        CAST(SUM(COALESCE(bt, 0)) OVER (ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS t_cum,
        CAST(SUM(COALESCE(bv, 0)) OVER (ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v_cum
      FROM tb FULL JOIN vb USING (k)
    ),
    mic AS (
      SELECT CAST(ROUND(LN(CAST(t_cum AS DOUBLE)) * 1e6) AS BIGINT) AS lx,
             CAST(ROUND(LN(CAST(v_cum AS DOUBLE)) * 1e6) AS BIGINT) AS ly
      FROM pts WHERE t_cum > 0 AND v_cum > 0
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx) AS DOUBLE) / 1e6 AS sx,
             CAST(SUM(ly) AS DOUBLE) / 1e6 AS sy,
             CAST(SUM(lx * lx) AS DOUBLE) / 1e12 AS sxx,
             CAST(SUM(lx * ly) AS DOUBLE) / 1e12 AS sxy
      FROM mic
    )
    SELECT n AS n_points, {HEAPS_BETA_EXPR} AS beta, {HEAPS_LNK_EXPR} AS ln_k
    FROM s
    """,
)
def q_heaps_law_fit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (``operators/text_rank.py:
    heaps_law_fit``): V(T) ~ K·T^beta over 10 value-based corpus-prefix
    cuts — Zipf's companion screen (natural corpora near beta 0.4-0.6;
    linear growth flags id floods, hard saturation flags templates).
    Prefix vocab counts come from token FIRST-occurrence doc ids — no
    doc-grain ordering anywhere, only 10-row cumulations."""
    return heaps_law_fit(_t(spark, sf_dir, "documents"))


@register(
    "source_centroid_similarity",
    f"""
    WITH e AS (
      SELECT d.source, CAST(em.embedding AS DOUBLE[]) AS v
      FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id
    ),
    per_dim AS (
      SELECT source, t.i AS dim, ROUND(AVG(v[t.i + 1]), 6) AS c
      FROM e, (SELECT unnest(range(64)) AS i) t(i)
      GROUP BY 1, 2
    ),
    cents AS (
      SELECT source, list(c ORDER BY dim) AS v FROM per_dim GROUP BY source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           ROUND(CAST({_COS_AB.format(a='a.v', b='b.v')} AS DOUBLE), 4) AS cos
    FROM cents a JOIN cents b ON a.source < b.source
    """,
)
def q_source_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-similarity map (``operators/similarity.py:
    source_centroid_similarity``): pairwise cosine between per-source
    embedding centroids — the corpus-mixing diagnostic (redundant twins
    vs diversity outliers). 1e-6-grid centroid averages (the kmeans
    convention), cosines over the sources-row frame only; the oracle
    replays centroids and every pair."""
    return similarity.source_centroid_similarity(
        _t(spark, sf_dir, "embeddings"), _t(spark, sf_dir, "documents")
    )


@register(
    "containment_top_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(regexp_split_to_array(
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'),
               x -> x <> '') AS t
      FROM documents
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT id,
             t[r.i + 1] || ' ' || t[r.i + 2] || ' ' || t[r.i + 3] AS s
      FROM toks, LATERAL (SELECT unnest(range(len(t) - 2)) AS i) r
      WHERE len(t) >= 3
    ),
    sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_set FROM sh GROUP BY id),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT id_a, id_b, n_shared, sa.n_set AS n_a, sb.n_set AS n_b,
             (n_shared * 1000000 // sa.n_set) / 1e6 AS containment_a,
             (n_shared * 1000000 // sb.n_set) / 1e6 AS containment_b
      FROM pairs
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    )
    SELECT id_a, id_b, n_shared, n_a, n_b, containment_a, containment_b
    FROM joined
    ORDER BY GREATEST(containment_a, containment_b) DESC, id_a, id_b
    LIMIT 50
    """,
)
def q_containment_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (``operators/dedup.py:
    containment_top_pairs``; Broder): C(A→B) = |A∩B|/|A| over distinct
    3-token shingle sets — the quote/subset signal symmetric Jaccard
    dilutes. Shingle-keyed join (posting-list bounded; behind the LSH
    prefilter at 100 TB), top-50 by max-directional containment with id
    tie-break; the oracle rebuilds every shingle set and both
    directions."""
    return dedup.containment_top_pairs(_t(spark, sf_dir, "documents"), top_k=50)


@register(
    "bpe_fertility_by_lang",
    r"""
    WITH w0 AS MATERIALIZED (
      SELECT w AS wd, regexp_replace(w, '(.)', '|\1|', 'g') AS s, f FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g
    ),
    """
    + ",".join(_bpe_round_sql(i, carry_word=True) for i in range(1, _BPE_MERGES + 1))
    + f"""
    ,
    pieces AS (
      SELECT wd,
             CAST(len(string_split(substring(s, 2, length(s) - 2), '||')) AS BIGINT) AS np
      FROM w{_BPE_MERGES}
    ),
    tok AS (
      SELECT lang, w FROM (
        SELECT lang, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) t WHERE regexp_matches(w, '^[a-z]+$')
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces,
           (CAST(SUM(np) AS BIGINT) * 1000000 // COUNT(*)) / 1e6 AS fertility
    FROM tok JOIN pieces ON tok.w = pieces.wd
    GROUP BY lang
    """,
)
def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language (pieces per word — THE
    multilingual tokenizer-quality metric: a vocabulary trained on the
    pooled corpus over-fragments under-represented languages, and
    fertility is where that shows): the 12 trained merges served over
    the distinct-word table, per-word piece counts re-joined to the
    language-tagged corpus, micro-grid means. The oracle replays the
    full train-then-serve chain with the per-language aggregation."""
    d = _t(spark, sf_dir, "documents")
    trained = text.bpe_merge_train(d, n_merges=_BPE_MERGES)
    merges = [
        (r.left_sym, r.right_sym) for r in trained.orderBy("merge_idx").collect()
    ]
    for c in getattr(trained, "_stage_caches", []):
        c.unpersist()
    from azure_medicine_data_engineering_spark.operators.text import tokens as _tk

    enc = F.regexp_replace("_w", "(.)", r"|$1|")
    for a, b in merges:
        enc = F.replace(enc, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    n_pieces = F.size(F.split(F.regexp_replace(enc, r"^\||\|$", ""), r"\|\|"))
    words = (
        d.select(F.explode(_tk(F.lower(F.col("text")))).alias("_w"))
        .where(F.col("_w").rlike("^[a-z]+$"))
        .distinct()
        .select("_w", n_pieces.cast("long").alias("_np"))
    )
    exploded = d.select(
        "lang", F.explode(_tk(F.lower(F.col("text")))).alias("_w")
    ).where(F.col("_w").rlike("^[a-z]+$"))
    return (
        exploded.join(words, "_w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_np").cast("long").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_words",
            "n_pieces",
            (F.expr("n_pieces * 1000000 div n_words") / 1e6).alias("fertility"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: Good-Turing unseen mass + Chao1 richness over corpus 4-grams.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.text import (  # noqa: E402
    CHAO1_EXPR,
    good_turing_ngram_mass,
)


@register(
    "good_turing_4gram_mass",
    f"""
    WITH sh AS (
      SELECT {_shingles_sql(_NORM.format(t='text'), 4)} AS grams FROM documents
    ),
    flat AS (SELECT unnest(grams) AS gr FROM sh),
    counts AS (SELECT gr, CAST(COUNT(*) AS BIGINT) AS c FROM flat GROUP BY gr),
    scal AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_grams,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM counts
    )
    SELECT n_grams, vocab, f1, f2,
           (f1 * 1000000 // n_grams) / 1e6 AS p0_unseen,
           {CHAO1_EXPR} AS chao1
    FROM scal
    """,
)
def q_good_turing_4gram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability-mass and Chao1 vocabulary-richness
    estimates over the corpus 4-gram distribution
    (``text.good_turing_ngram_mass``) — the LM-smoothing / corpus-coverage
    diagnostics: how much 4-gram probability mass sits on sequences the
    corpus has never seen, and how many distinct 4-grams the underlying
    process likely has. 4-grams (not 3) because the synthetic corpus's
    31-word vocabulary saturates trigrams at sf0.1 (F1 → 0 — a degenerate
    but honest statistic); the 4-gram space stays sparse at every SF."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    return good_turing_ngram_mass(docs, n=4)


# ---------------------------------------------------------------------------
# TextRank keywords: PageRank over the word co-occurrence graph (round 6).
# ---------------------------------------------------------------------------

_TR_TOKS = _TOKS.format(t=_NORM_TEXT)


def _tr_round_sql(i: int) -> str:
    return f"""
    r{i} AS (SELECT x.node, (1.0 - 0.85) / nn.n
                  + 0.85 * COALESCE(m.mass, 0.0) AS pr
           FROM nodes x CROSS JOIN nn
           LEFT JOIN (SELECT t.dst AS node, SUM(r{i - 1}.pr * t.p) AS mass
                      FROM t JOIN r{i - 1} ON t.src = r{i - 1}.node GROUP BY 1) m
             USING (node))"""


@register(
    "textrank_keywords_documents",
    f"""
    WITH tk AS (SELECT {_TR_TOKS} AS ws FROM documents),
    adj AS (
      SELECT ws[i] AS a, ws[i + 1] AS b
      FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM tk
            WHERE len(ws) >= 2)
      WHERE ws[i] <> ws[i + 1]
    ),
    e AS (
      SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
        SELECT a AS src, b AS dst FROM adj
        UNION ALL SELECT b, a FROM adj
      ) GROUP BY 1, 2
    ),
    outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1),
    t AS (SELECT e.src, e.dst, e.w / outw.ow AS p FROM e JOIN outw USING (src)),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
    {','.join(_tr_round_sql(i) for i in range(1, 4))}
    SELECT node AS word, ROUND(CAST(pr AS DOUBLE), 4) AS pr FROM r3
    """,
)
def q_textrank_keywords_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scores (``operators/text_rank.py:
    textrank_keywords``, Mihalcea & Tarau 2004): PageRank (3 rounds,
    d=0.85) over the word co-occurrence graph — an undirected edge per
    adjacent normalized-token pair, weight = corpus co-occurrence count.
    The unsupervised keyword extractor next to the frequency-weighted
    ones (TF-IDF, BM25): a word ranks high when its neighbours rank
    high, not merely when it is frequent. The oracle unrolls the same
    three propagation rounds CTE-for-CTE (same init, damping, dangling
    policy as the ``pagerank_nation_trade`` oracle). Output is the full
    vocabulary-sized (word, pr) frame — the scale-safe shape; edge
    building is one explode + one pair-count shuffle, observed-bigram
    bounded, never vocab²."""
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        textrank_keywords,
    )

    ranks = textrank_keywords(
        _t(spark, sf_dir, "documents"), "text", iterations=3, damping=0.85
    )
    return ranks.select(
        F.col("node").alias("word"),
        F.round(F.col("pr").cast("double"), 4).alias("pr"),
    )


# ---------------------------------------------------------------------------
# Round 9: per-label embedding centroid cohesion.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.similarity import (  # noqa: E402
    CENTROID_COS_U_EXPR,
    label_centroid_cohesion,
)


@register(
    "embedding_label_cohesion",
    f"""
    WITH m AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
      FROM embeddings
    ),
    e AS (
      SELECT label, vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS dim
      FROM m
    ),
    c AS (
      SELECT label, dim, CAST(SUM(val) AS BIGINT) AS s FROM e GROUP BY 1, 2
    ),
    ncs AS (SELECT label, SUM(CAST(s AS HUGEINT) * s) AS nc FROM c GROUP BY 1),
    p AS (
      SELECT e.label, e.vec_id,
             SUM(CAST(e.val AS HUGEINT) * c.s) AS dotc,
             SUM(CAST(e.val AS HUGEINT) * e.val) AS nv
      FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
      GROUP BY 1, 2
    ),
    u AS (
      SELECT p.label, {CENTROID_COS_U_EXPR.replace("nc", "ncs.nc")} AS cos_u
      FROM p JOIN ncs ON p.label = ncs.label
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(sum(cos_u) * 1e0 / count(1) / 1e6, 6) AS avg_cos, -- lint: ok exact 1e-6-grid BIGINT sum
           round(min(cos_u) * 1e0 / 1e6, 6) AS min_cos
    FROM u WHERE cos_u IS NOT NULL GROUP BY label
    """,
)
def q_embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cohesion (``similarity.label_centroid_cohesion``):
    each vector's cosine to its own label's centroid, reduced to the
    per-label mean (drift trend) and minimum (mislabel/outlier tail) —
    the embedding-corpus companion to the pairwise source-centroid cosine
    matrix. 1e-6 integer grid end to end: integer centroid sums, DECIMAL/
    HUGEINT quadratics, per-vector snapped cosine, exact integer mean."""
    emb = _t(spark, sf_dir, "embeddings")
    return label_centroid_cohesion(emb, "label", "embedding")


from azure_medicine_data_engineering_spark.operators.unigram_lm import (  # noqa: E402
    unigram_lm_oracle,
    unigram_lm_train,
)


@register("unigram_lm_vocab", unigram_lm_oracle())
def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training — the third
    tokenizer family next to BPE and WordPiece (round 11,
    `operators/unigram_lm.py`): substring-seeded vocab, Viterbi-EM
    rounds on the 1e-6 integer cost grid (shared ln expression — the
    repo's micro-grid discipline), frequency-weighted piece counts from
    one Arrow mapInPandas pass per round over the distinct-word frame,
    lowest-count pruning. The oracle unrolls every EM round AND every
    Viterbi DP position as MATERIALIZED CTEs (the BPE-oracle
    discipline), so the seed selection, integer argmin tie-breaks,
    backtrace multiplicities, and prune order must all be exact to
    hash-match. Emits the final ``(piece, cnt, cost_micro)`` vocab."""
    return unigram_lm_train(_t(spark, sf_dir, "documents"))


from azure_medicine_data_engineering_spark.operators.unigram_lm import (  # noqa: E402
    unigram_fertility_by_group,
    unigram_fertility_oracle,
)


@register("unigram_fertility_by_source", unigram_fertility_oracle())
def q_unigram_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per corpus slice under the trained unigram-LM
    vocab (round 11, `operators/unigram_lm.py`) — pieces per word, the
    number every tokenizer evaluation quotes (a slice with fertility
    >> 1 blows its token budget). Train → collect the vocab-bounded
    final cost table → ONE serve-Viterbi Arrow pass over the distinct
    word frame → join per-(source, word) counts back; fertility is an
    exact micro-grid integer division. The oracle replays the FULL
    training (every EM round and DP position as MATERIALIZED CTEs) plus
    the serve DP, counting backtrace rows per word."""
    return unigram_fertility_by_group(_t(spark, sf_dir, "documents"))


#: corpus-total twins of the three family oracles, each isolated in its
#: own derived-table WITH scope so the union needs no CTE renaming.
_BPE_TOTALS_SQL = (
    r"""
    WITH w0 AS MATERIALIZED (
      SELECT w AS wd, regexp_replace(w, '(.)', '|\1|', 'g') AS s, f FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g
    ),
    """
    + ",".join(_bpe_round_sql(i, carry_word=True) for i in range(1, _BPE_MERGES + 1))
    + f""",
    pieces AS (
      SELECT wd,
             CAST(len(string_split(substring(s, 2, length(s) - 2), '||')) AS BIGINT) AS np
      FROM w{_BPE_MERGES}
    ),
    tok AS (
      SELECT w FROM (
        SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) t WHERE regexp_matches(w, '^[a-z]+$')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces
    FROM tok JOIN pieces ON tok.w = pieces.wd"""
)

_WP_TOTALS_SQL = f"""
    WITH RECURSIVE
    allpieces AS (
      SELECT unnest(
        flatten([
          list_transform(range(1, least(4, length(w)) + 1),
                         L -> substr(w, 1, CAST(L AS INT))),
          flatten(list_transform(range(2, length(w) + 1),
            s -> list_transform(range(1, least(4, length(w) - s + 1) + 1),
                                L -> '##' || substr(w, CAST(s AS INT), CAST(L AS INT)))))
        ])
      ) AS piece
      FROM (SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents)
    ),
    vocab AS (
      SELECT piece FROM (
        SELECT piece, COUNT(*) AS cnt FROM allpieces GROUP BY piece
      ) ORDER BY cnt DESC, piece LIMIT 200
    ),
    vl AS (SELECT list(piece) AS vp FROM vocab),
    words AS (
      SELECT DISTINCT unnest({_TOKS.format(t='text')}) AS w FROM documents
    ),
    steps(w, pos, n_pieces, failed) AS (
      SELECT w, CAST(1 AS BIGINT), 0, FALSE FROM words
      UNION ALL
      SELECT w, pos + COALESCE(bestL, 0), n_pieces + 1, bestL IS NULL
      FROM (
        SELECT w, pos, n_pieces,
               list_max(list_filter(list_transform(
                 range(least(4, length(w) - pos + 1), 0, -1),
                 L -> CASE WHEN list_contains(vp,
                        (CASE WHEN pos > 1 THEN '##' ELSE '' END)
                          || substr(w, CAST(pos AS INT), CAST(L AS INT)))
                      THEN L END), x -> x IS NOT NULL)) AS bestL
        FROM steps, vl WHERE pos <= length(w) AND NOT failed
      ) t
    ),
    word_stats AS (
      SELECT w,
             CASE WHEN failed THEN 1 ELSE n_pieces END AS w_pieces
      FROM steps WHERE failed OR pos = length(w) + 1
    ),
    corpus AS (
      SELECT unnest({_TOKS.format(t='text')}) AS w FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_pieces) AS BIGINT) AS n_pieces
    FROM corpus JOIN word_stats USING (w)"""


def _unigram_totals_sql() -> str:
    full = unigram_fertility_oracle(group_col="'all'")
    # keep only the totals columns (the derived-table wrapper selects them)
    return full


@register(
    "tokenizer_family_report",
    f"""
    SELECT family, n_words, n_pieces,
           (n_pieces * 1000000 // n_words) / 1e6 AS fertility
    FROM (
      SELECT 'bpe' AS family, n_words, n_pieces FROM ({_BPE_TOTALS_SQL})
      UNION ALL
      SELECT 'wordpiece', n_words, n_pieces FROM ({_WP_TOTALS_SQL})
      UNION ALL
      SELECT 'unigram_lm', n_words, n_pieces FROM ({_unigram_totals_sql()})
    )
    """,
)
def q_tokenizer_family_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-family comparison table (round 11): BPE (12 merges,
    trained+served), WordPiece (top-200 induced vocab, greedy
    longest-match) and Unigram-LM (Viterbi-EM trained+served) each
    tokenize the corpus AS CONFIGURED by their own oracled queries; one
    row per family with corpus totals and fertility (pieces per word,
    exact micro-grid division) — the number that picks a tokenizer for
    a pretraining run. The oracle replays all three train+serve chains
    (merge rounds, the recursive greedy walk, the unrolled EM) in
    isolated subquery scopes.

    Round 12 (r11 verdict nit #1): the corpus collapses to ONE
    localCheckpointed distinct-word frequency frame feeding the BPE and
    WordPiece families (each used to re-tokenize the corpus from
    parquet); per-family word gates derive from it by column algebra, so
    results are unchanged (oracle untouched) while the dominant
    occurrence-grain explodes shrink to the 31-distinct-word grain."""
    from pyspark.sql import functions as FF

    from azure_medicine_data_engineering_spark.operators.text import (
        subword_vocab_candidates,
        tokens as _tokens,
        wordpiece_word_pieces,
    )
    from azure_medicine_data_engineering_spark.operators.unigram_lm import (
        unigram_fertility_by_group,
    )

    d = _t(spark, sf_dir, "documents")

    # THE shared collapse: raw distinct-word frequencies, one corpus scan
    wf_raw = (
        d.select(FF.explode(_tokens(FF.col("text"))).alias("w"))
        .groupBy("w")
        .agg(FF.count(FF.lit(1)).cast("long").alias("f"))
        .localCheckpoint(eager=True)
    )
    # BPE's gate (lowercased, ^[a-z]+$) derived by column algebra
    wf_bpe = (
        wf_raw.select(FF.lower("w").alias("_w"), "f")
        .where(FF.col("_w").rlike("^[a-z]+$"))
        .groupBy("_w")
        .agg(FF.sum("f").cast("long").alias("f"))
        .localCheckpoint(eager=True)
    )

    trained = text.bpe_merge_train(d, n_merges=_BPE_MERGES, words_freq=wf_bpe)
    merges = [
        (r.left_sym, r.right_sym)
        for r in trained.orderBy("merge_idx").collect()
    ]
    for c in getattr(trained, "_stage_caches", []):
        c.unpersist()
    # BPE serve totals straight off the shared frame: pieces per distinct
    # word (the bpe_tokenize_stats merge-chain encoding), f-weighted
    enc = FF.regexp_replace("_w", "(.)", r"|$1|")
    for a, b in merges:
        enc = FF.replace(enc, FF.lit(f"|{a}||{b}|"), FF.lit(f"|{a}{b}|"))
    np_col = FF.size(FF.split(FF.regexp_replace(enc, r"^\||\|$", ""), r"\|\|"))
    bpe = (
        wf_bpe.select("f", np_col.cast("long").alias("_np"))
        .agg(
            FF.sum("f").cast("long").alias("n_words"),
            FF.sum(FF.col("f") * FF.col("_np")).cast("long").alias("n_pieces"),
        )
        .select(FF.lit("bpe").alias("family"), "n_words", "n_pieces")
    )
    vocab = [
        r.piece
        for r in subword_vocab_candidates(
            d, top_k=200, max_len=4,
            words_freq=wf_raw.select(FF.col("w").alias("_w"), "f"),
        ).collect()
    ]
    wp = (
        wordpiece_word_pieces(wf_raw.select("w"), vocab, max_len=4)
        .join(wf_raw, "w")
        .agg(
            FF.sum("f").cast("long").alias("n_words"),
            FF.sum(FF.col("f") * FF.col("w_pieces")).cast("long").alias("n_pieces"),
        )
        .select(FF.lit("wordpiece").alias("family"), "n_words", "n_pieces")
    )
    ug = (
        unigram_fertility_by_group(d.withColumn("_all", FF.lit("all")), "_all")
        .select(
            FF.lit("unigram_lm").alias("family"), "n_words", "n_pieces"
        )
    )
    return (
        bpe.unionByName(wp)
        .unionByName(ug)
        .selectExpr(
            "family",
            "n_words",
            "n_pieces",
            "(n_pieces * 1000000 div n_words) / 1e6 AS fertility",
        )
    )


# ---------------------------------------------------------------------------
# Byte-level BPE (GPT-2 style) — round 12.
# ---------------------------------------------------------------------------
from azure_medicine_data_engineering_spark.operators.byte_bpe import (  # noqa: E402
    BYTE_SYMBOLS,
    DELIM as _BB_D,
    byte_bpe_merge_train,
)

_BB_DD = _BB_D + _BB_D
_BB_MERGES = 12
# SQL literal of the 256-entry GPT-2 byte->unicode table ('' escapes the
# single-quote symbol, byte 0x27)
_BB_U = "[" + ", ".join("'" + s.replace("'", "''") + "'" for s in BYTE_SYMBOLS) + "]"


def _byte_bpe_round_sql(i: int) -> str:
    """One unrolled byte-BPE round — _bpe_round_sql with the unit-separator
    delimiter (| is a byte symbol at byte level, chr(31) is outside the
    GPT-2 symbol image)."""
    return f"""
    bp{i} AS (
      SELECT t.l[r.j] AS a, t.l[r.j + 1] AS b, CAST(SUM(t.f) AS BIGINT) AS cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), '{_BB_DD}') AS l, f
            FROM bw{i - 1}) t,
           LATERAL (SELECT unnest(range(1, len(t.l))) AS j) r
      GROUP BY 1, 2
    ),
    bm{i} AS MATERIALIZED (SELECT a, b, cnt FROM bp{i} ORDER BY cnt DESC, a, b LIMIT 1),
    bw{i} AS MATERIALIZED (
      SELECT replace(w.s, '{_BB_D}' || m.a || '{_BB_DD}' || m.b || '{_BB_D}',
                     '{_BB_D}' || m.a || m.b || '{_BB_D}') AS s, w.f
      FROM bw{i - 1} w, bm{i} m
    )"""


_BB_FINAL = " UNION ALL ".join(
    f"SELECT CAST({i} AS INT) AS merge_idx, a AS left_sym, b AS right_sym, "
    f"cnt AS pair_count FROM bm{i}"
    for i in range(1, _BB_MERGES + 1)
)


@register(
    "byte_bpe_vocab_merges",
    f"""
    WITH ut AS (SELECT {_BB_U} AS U),
    bw0 AS MATERIALIZED (
      SELECT '{_BB_D}' || array_to_string(list_transform(
               regexp_extract_all(hex(replace(replace(replace(
                 w, 'a', 'ä'), 'e', '日'), 'o', 'ø')), '..'),
               c -> U[('0x' || c)::INT + 1]), '{_BB_DD}') || '{_BB_D}' AS s, f
      FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g, ut
    ),
    """
    + ",".join(_byte_bpe_round_sql(i) for i in range(1, _BB_MERGES + 1))
    + "\n    "
    + _BB_FINAL,
)
def q_byte_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level (GPT-2) BPE training over the documents corpus with the
    deterministic multi-byte enrichment a->ä / e->日 / o->ø
    (``operators/byte_bpe.py``): 12 merges over UTF-8 BYTE symbols mapped
    through the public bytes_to_unicode table — merges cross multi-byte
    character boundaries, the case char-level BPE cannot represent. The
    oracle unrolls every round CTE-for-CTE with the same delimiter trick
    (unit separator; '|' is itself a byte symbol at byte level)."""
    return byte_bpe_merge_train(
        _t(spark, sf_dir, "documents"), n_merges=_BB_MERGES
    )


def _byte_bpe_round_sql_cw(i: int) -> str:
    """carry-word variant of _byte_bpe_round_sql (serving oracle joins
    per-word piece counts back to the corpus)."""
    return f"""
    bp{i} AS (
      SELECT t.l[r.j] AS a, t.l[r.j + 1] AS b, CAST(SUM(t.f) AS BIGINT) AS cnt
      FROM (SELECT string_split(substring(s, 2, length(s) - 2), '{_BB_DD}') AS l, f
            FROM bw{i - 1}) t,
           LATERAL (SELECT unnest(range(1, len(t.l))) AS j) r
      GROUP BY 1, 2
    ),
    bm{i} AS MATERIALIZED (SELECT a, b, cnt FROM bp{i} ORDER BY cnt DESC, a, b LIMIT 1),
    bw{i} AS MATERIALIZED (
      SELECT w.wd, replace(w.s, '{_BB_D}' || m.a || '{_BB_DD}' || m.b || '{_BB_D}',
                     '{_BB_D}' || m.a || m.b || '{_BB_D}') AS s, w.f
      FROM bw{i - 1} w, bm{i} m
    )"""


@register(
    "byte_bpe_tokenize_stats_docs",
    f"""
    WITH ut AS (SELECT {_BB_U} AS U),
    bw0 AS MATERIALIZED (
      SELECT w AS wd,
             '{_BB_D}' || array_to_string(list_transform(
               regexp_extract_all(hex(replace(replace(replace(
                 w, 'a', 'ä'), 'e', '日'), 'o', 'ø')), '..'),
               c -> U[('0x' || c)::INT + 1]), '{_BB_DD}') || '{_BB_D}' AS s, f
      FROM (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
              FROM documents) t
        WHERE regexp_matches(w, '^[a-z]+$')
        GROUP BY w
      ) g, ut
    ),
    """
    + ",".join(_byte_bpe_round_sql_cw(i) for i in range(1, _BB_MERGES + 1))
    + f""",
    pieces AS (
      SELECT wd,
             CAST(len(string_split(substring(s, 2, length(s) - 2), '{_BB_DD}'))
                  AS BIGINT) AS np
      FROM bw{_BB_MERGES}
    ),
    tok AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
        FROM documents
      ) t WHERE regexp_matches(w, '^[a-z]+$')
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(np) AS BIGINT) AS n_pieces
    FROM tok JOIN pieces ON tok.w = pieces.wd
    GROUP BY doc_id
    """,
)
def q_byte_bpe_tokenize_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE SERVING (``operators/byte_bpe.py:
    byte_bpe_tokenize_stats``): the 12 trained byte merges applied in
    training order over the distinct-word table, per-doc piece counts via
    the corpus re-join — and NO UNK column, because byte-level serving
    cannot fail (every byte is a base symbol). Completes the byte
    family's train+serve pair, mirroring the char-level
    ``bpe_tokenize_stats_docs``."""
    from azure_medicine_data_engineering_spark.operators.byte_bpe import (
        byte_bpe_tokenize_stats,
    )

    d = _t(spark, sf_dir, "documents")
    trained = byte_bpe_merge_train(d, n_merges=_BB_MERGES)
    merges = [
        (r.left_sym, r.right_sym)
        for r in trained.orderBy("merge_idx").collect()
    ]
    return byte_bpe_tokenize_stats(d, merges)


# ---------------------------------------------------------------------------
# GPT-2 regex pretokenization (round 13 — the split byte-level BPE runs
# before merging; lookahead-free two-pass form, operators/pretokenize.py).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.pretokenize import (  # noqa: E402
    gpt2_fixup_sql,
    gpt2_matches_sql,
    gpt2_pretokens,
)

#: deterministic enrichment suffix — the corpus text is single-spaced
#: lowercase ASCII, so this makes every doc exercise the contraction,
#: digit, punctuation, tab, multi-space, Unicode-letter and trailing-
#: whitespace branches (the byte-BPE enrichment precedent)
_GPT2_SUFFIX = " it's no3 42 a.b  x\t日本 end  "
_GPT2_SUFFIX_SQL = "' it''s no3 42 a.b  x' || chr(9) || '日本 end  '"


@register(
    "gpt2_pretokenize_docs",
    f"""
    WITH t AS (SELECT doc_id, text || {_GPT2_SUFFIX_SQL} AS t2 FROM documents),
    m AS MATERIALIZED (
      SELECT doc_id, {gpt2_matches_sql('t2')} AS tk FROM t
    ),
    p AS (SELECT doc_id, {gpt2_fixup_sql('tk')} AS toks FROM m)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_pretokens,
           md5(array_to_string(toks, chr(31))) AS pretokens_md5
    FROM p
    """,
)
def q_gpt2_pretokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2 regex pretokenization over the (branch-enriched) corpus:
    per-doc pretoken count + md5 of the unit-separator-joined pretoken
    sequence — the md5 makes every split decision load-bearing. The
    lookahead-free two-pass form is pinned EXACTLY EQUAL to the published
    pattern (true lookahead) in tests/test_pretokenize.py. Pure column
    algebra, map-only."""
    docs = _t(spark, sf_dir, "documents")
    toks = gpt2_pretokens(F.concat(F.col("text"), F.lit(_GPT2_SUFFIX)))
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_pretokens"),
        F.md5(F.array_join(toks, "\x1f")).alias("pretokens_md5"),
    )


# ---------------------------------------------------------------------------
# Byte-level BPE over GPT-2 pretokens (round 13) — the ACTUAL GPT-2
# training unit: pretokens keep their leading space, which byte-maps to
# the famous 'Ġ' symbol, so merges learn space-prefixed word pieces.
# ---------------------------------------------------------------------------

_BBG_MERGES = 12


@register(
    "byte_bpe_gpt2_merges",
    f"""
    WITH ut AS (SELECT {_BB_U} AS U),
    gtk AS MATERIALIZED (
      SELECT {gpt2_matches_sql(f"text || {_GPT2_SUFFIX_SQL}")} AS tk
      FROM documents
    ),
    gw AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest({gpt2_fixup_sql('tk')}) AS w FROM gtk) t
      GROUP BY w
    ),
    bw0 AS MATERIALIZED (
      SELECT '{_BB_D}' || array_to_string(list_transform(
               regexp_extract_all(hex(w), '..'),
               c -> U[('0x' || c)::INT + 1]), '{_BB_DD}') || '{_BB_D}' AS s, f
      FROM gw, ut
    ),
    """
    + ",".join(_byte_bpe_round_sql(i) for i in range(1, _BBG_MERGES + 1))
    + "\n    "
    + " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS merge_idx, a AS left_sym, b AS right_sym, "
        f"cnt AS pair_count FROM bm{i}"
        for i in range(1, _BBG_MERGES + 1)
    ),
)
def q_byte_bpe_gpt2_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE trained on GPT-2 PRETOKENS (the published pipeline's
    actual unit, vs the whitespace-word variant `byte_bpe_vocab_merges`):
    pretokens keep their leading space (byte 0x20 -> 'Ġ' through the
    public table), so learned merges include space-prefixed pieces. The
    oracle replays the two-pass pretokenization and unrolls every merge
    round CTE-for-CTE."""
    docs = _t(spark, sf_dir, "documents")
    toks = gpt2_pretokens(F.concat(F.col("text"), F.lit(_GPT2_SUFFIX)))
    wf = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return byte_bpe_merge_train(
        docs, n_merges=_BBG_MERGES, words_freq=wf
    )
