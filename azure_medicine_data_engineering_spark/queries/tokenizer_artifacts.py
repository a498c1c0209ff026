"""GPT-2 tokenizer artifact round trip (round 15 — the tokenizer sibling
of the ARPA round trip `queries/kn_arpa.py`): train the GPT-2-pretokenized
byte-BPE merges, land ``merges.txt`` + ``vocab.json`` in the published
interchange format, re-ingest FROM THE LANDED BYTES, and serve the corpus
with the re-ingested artifacts. Per-slice pretoken/piece counts, the sum
of assigned token IDs, and a must-be-zero OOV column all have to equal the
oracle's direct replay — any defect in line formatting, header handling,
id numbering, JSON escaping, or parsing breaks an integer exactly.

The oracle replays the two-pass GPT-2 pretokenization, unrolls the 12
merge rounds CTE-for-CTE (carry-word form, so bw12's strings ARE the
encoded pretokens), numbers the vocab the published way (256 base symbols
in codepoint order with ``"!"`` = 0, merge ``i`` at id ``255 + i``), and
left-joins pieces to ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.pretokenize import (
    gpt2_fixup_sql,
    gpt2_matches_sql,
    gpt2_pretokens,
)
from azure_medicine_data_engineering_spark.operators.tokenizer_io import (
    gpt2_base_vocab_order,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)
from azure_medicine_data_engineering_spark.queries.text_dedup import (
    _BB_D,
    _BB_DD,
    _BB_U,
    _BBG_MERGES,
    _GPT2_SUFFIX,
    _GPT2_SUFFIX_SQL,
    _byte_bpe_round_sql_cw,
)

# base vocab in PUBLISHED id order (codepoint-sorted symbols, "!" = 0) as
# inlined literals — computed once from the same public bytes_to_unicode
# table and pinned against hand values in tests/test_tokenizer_io.py
_BASE_VOCAB_VALUES = ", ".join(
    "('" + s.replace("'", "''") + f"', {i})"
    for i, s in enumerate(gpt2_base_vocab_order())
)

_VOCAB_CTE = (
    f"""
    vocab AS (
      SELECT tok, CAST(id AS BIGINT) AS id
      FROM (VALUES {_BASE_VOCAB_VALUES}) bv(tok, id)
    """
    + "".join(
        f"""
      UNION ALL
      SELECT m{i}.a || m{i}.b AS tok, CAST({255 + i} AS BIGINT) AS id
      FROM bm{i} m{i}"""
        for i in range(1, _BBG_MERGES + 1)
    )
    + "\n    )"
)

_ROUNDTRIP_SQL = (
    f"""
    WITH ut AS (SELECT {_BB_U} AS U),
    gtk AS MATERIALIZED (
      SELECT doc_id, source, {gpt2_matches_sql(f"text || {_GPT2_SUFFIX_SQL}")} AS tk
      FROM documents
    ),
    tok AS MATERIALIZED (
      SELECT doc_id, source, unnest({gpt2_fixup_sql('tk')}) AS w FROM gtk
    ),
    gw AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY w
    ),
    bw0 AS MATERIALIZED (
      SELECT w AS wd,
             '{_BB_D}' || array_to_string(list_transform(
               regexp_extract_all(hex(w), '..'),
               c -> U[('0x' || c)::INT + 1]), '{_BB_DD}') || '{_BB_D}' AS s, f
      FROM gw, ut
    ),
    """
    + ",".join(_byte_bpe_round_sql_cw(i) for i in range(1, _BBG_MERGES + 1))
    + ",\n    "
    + _VOCAB_CTE
    + f""",
    wpieces AS (
      SELECT wd,
             unnest(string_split(substring(s, 2, length(s) - 2), '{_BB_DD}'))
               AS piece
      FROM bw{_BBG_MERGES}
    ),
    wstats AS (
      SELECT wp.wd,
             CAST(COUNT(*) AS BIGINT) AS np,
             CAST(COALESCE(SUM(v.id), 0) AS BIGINT) AS sid,
             CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS nov
      FROM wpieces wp LEFT JOIN vocab v ON wp.piece = v.tok
      GROUP BY wp.wd
    )
    SELECT t.source AS g,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_pretokens,
           CAST(SUM(ws.np) AS BIGINT) AS n_pieces,
           CAST(SUM(ws.sid) AS BIGINT) AS sum_ids,
           CAST(SUM(ws.nov) AS BIGINT) AS n_oov
    FROM tok t JOIN wstats ws ON t.w = ws.wd
    GROUP BY t.source
    """
)


@register("gpt2_tokenizer_roundtrip", _ROUNDTRIP_SQL)
def q_gpt2_tokenizer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the GPT-2-pretokenized byte-BPE merges
    (`operators/byte_bpe.py`, the `byte_bpe_gpt2_merges` trainer), export
    ``merges.txt`` + ``vocab.json`` (`operators/tokenizer_io.py`, atomic
    writes, vocab.json last as the commit marker), re-ingest the landed
    files with full cross-validation, and serve the corpus with the
    RE-INGESTED merges and vocab — distinct-pretoken encode chain, one
    broadcast id join, per-slice integer stats. ``n_oov`` must be 0:
    byte-level pieces are base symbols or merge results, all in the vocab
    by construction, so a dropped or mis-parsed vocab entry surfaces as a
    nonzero count.

    Optimization round 15 (guide §8/§2.3): the pretokenize+explode pass
    runs ONCE into a persisted per-``(g, w)`` count frame; the trainer's
    word frequencies derive from it by a second-level aggregation, and
    the serving stats attach at count grain
    (`tokenizer_io.gpt2_encode_ids_stats_from_counts`) instead of
    replaying the regex chain three times at position grain. Per-group
    doc counts come from a light no-explode scan: the GPT-2 pattern's
    alternation covers every character class, so a doc contributes >= 1
    pretoken iff ``text IS NOT NULL`` (the appended suffix literal is
    non-empty)."""
    import os
    import shutil

    from azure_medicine_data_engineering_spark.operators.byte_bpe import (
        byte_bpe_merge_train,
    )
    from azure_medicine_data_engineering_spark.operators.tokenizer_io import (
        export_gpt2_tokenizer,
        gpt2_encode_ids_stats_from_counts,
        parse_gpt2_tokenizer,
    )
    from azure_medicine_data_engineering_spark.session import (
        ensure_parallelism,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = gpt2_pretokens(F.concat(F.col("text"), F.lit(_GPT2_SUFFIX)))
    gw = (
        ensure_parallelism(docs)
        .select(F.col("source").alias("g"), F.explode(toks).alias("w"))
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    wf = gw.groupBy("w").agg(F.sum("c").cast("long").alias("f"))
    ndocs = (
        docs.where(F.col("text").isNotNull())
        .groupBy(F.col("source").alias("g"))
        .agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    )
    trained = byte_bpe_merge_train(docs, n_merges=_BBG_MERGES, words_freq=wf)
    merges = [
        (r.left_sym, r.right_sym)
        for r in trained.orderBy("merge_idx").collect()
    ]  # bounded: vocab grain (n_merges rows)

    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    root = os.path.join("/tmp/amde_fixtures", f"gpt2_tok_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    export_gpt2_tokenizer(merges, root)
    merges_rt, vocab_rt = parse_gpt2_tokenizer(root)
    out = gpt2_encode_ids_stats_from_counts(
        gw, ndocs, merges_rt, vocab_rt, spark
    )
    # nothing in `out`'s lineage reads the landed files lazily (merges and
    # vocab are re-ingested driver-side at vocab grain), so the tree can
    # go as soon as the frame is built
    shutil.rmtree(root, ignore_errors=True)
    out._stage_caches = [gw] + list(getattr(trained, "_stage_caches", []))
    return out
