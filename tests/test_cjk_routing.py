"""CJK / whitespace-free-script pins (round 12): the whitespace-collapse
failure mode asserted EXPLICITLY, the script router, and the routed unit
counter."""

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.text_clean import (
    CJK_STOP_CHARS,
    CJK_TRANSLATE_TO,
    cjk_char_count,
    cjk_stop_hits,
    gopher_ok_all,
    script_route,
    text_units,
)

CJK_DOC = "".join(CJK_TRANSLATE_TO[i % 26] for i in range(80))  # no spaces
LATIN_DOC = "the quick brown fox jumps over the lazy dog " * 8
MIXED_DOC = "hello " + CJK_TRANSLATE_TO[:5] + " world"  # 5/17 chars CJK


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col.alias("v")).collect()[0].v


def test_whitespace_tokenization_collapses_on_cjk(spark):
    """The documented failure mode: an 80-char unbroken CJK document is
    ONE whitespace 'word' — every whitespace-based metric silently
    miscounts, which is exactly why routing exists."""
    ws_words = F.size(F.filter(F.split(F.col("t"), r"\s+"), lambda x: x != ""))
    assert _one(spark, CJK_DOC, ws_words) == 1
    # and Gopher's word-count rule therefore REJECTS it wholesale even
    # though it is an 80-unit document
    assert _one(spark, CJK_DOC, gopher_ok_all(F.col("t"))) is False


def test_script_route_and_units(spark):
    assert _one(spark, CJK_DOC, script_route(F.col("t"))) == "cjk"
    assert _one(spark, LATIN_DOC, script_route(F.col("t"))) == "latin"
    # 5 of 17 chars (~29%) is below the 30% threshold -> latin
    assert _one(spark, MIXED_DOC, script_route(F.col("t"))) == "latin"
    assert _one(spark, CJK_DOC, cjk_char_count(F.col("t"))) == 80
    assert _one(spark, CJK_DOC, text_units(F.col("t"))) == 80  # chars
    assert _one(spark, LATIN_DOC, text_units(F.col("t"))) == 72  # ws words
    assert _one(spark, MIXED_DOC, text_units(F.col("t"))) == 3


def test_routed_query_reports_collapse_and_units(spark):
    from azure_medicine_data_engineering_spark.queries.corpus_clean import (
        q_gopher_quality_cjk_routed,
    )

    rows = q_gopher_quality_cjk_routed(spark, "/root/testdata/sf0.001").collect()
    by_script: dict = {}
    for r in rows:
        s = by_script.setdefault(r.script, [0, 0, 0])
        s[0] += r.n_docs
        s[1] += r.n_ws_tokens
        s[2] += r.n_units
    assert set(by_script) == {"cjk", "latin"}
    cjk = by_script["cjk"]
    # collapse visible: ~1 whitespace token per CJK doc, but many units
    assert cjk[1] <= 2 * cjk[0]
    assert cjk[2] > 10 * cjk[0]
    # latin route: units ARE the whitespace tokens
    lat = by_script["latin"]
    assert lat[1] == lat[2]
    # round 13: the ROUTED stop rule is meaningful on the CJK route too —
    # the fixture transliteration maps a/n/o/u onto the genuine particles
    # BELOW, so essentially every CJK doc passes
    assert all(r.n_stop_ok > 0 for r in rows if r.script == "cjk")
    assert any(r.n_stop_ok > 0 for r in rows if r.script == "latin")


def test_cjk_stop_hits_particles(spark):
    """Distinct-particle substring counting: the full fixture alphabet
    contains exactly the four in-range particles; a doc built only from
    non-particle ideographs scores zero; real particles outside the
    transliteration range count too."""
    assert _one(spark, CJK_DOC, cjk_stop_hits(F.col("t"))) == 4  # 一不与且
    no_particles = "".join(CJK_TRANSLATE_TO[i] for i in (1, 2, 3, 5)) * 10
    assert _one(spark, no_particles, cjk_stop_hits(F.col("t"))) == 0
    real = "这本书是我的了" * 5  # contains 的/了/是
    assert _one(spark, real, cjk_stop_hits(F.col("t"))) >= 3
    assert set("一不与且") <= set(CJK_STOP_CHARS) and len(CJK_STOP_CHARS) == 10
