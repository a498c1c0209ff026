"""Crawl-funnel plumbing pins: URL-grain robots gate vs the pure
evaluator, frontier fixture path space, with_text extraction variants,
and funnel invariants on a tiny corpus."""

import hashlib

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.robots import (
    doc_path,
    host_rules_text,
    parse_robots,
    robots_allowed,
    robots_gate_urls,
)
from azure_medicine_data_engineering_spark.sources.sitemap import (
    attach_frontier_sitemap_payload,
    sitemap_ingest_urls,
)


def test_url_gate_matches_pure_evaluator(spark):
    rows = []
    want = {}
    for i in range(40):
        hexd = hashlib.md5(str(i).encode()).hexdigest()
        path = doc_path(hexd)
        k = i % 7
        rows.append((i, 0, k, path))
        want[i] = robots_allowed(parse_robots(host_rules_text(k)), path)
    df = spark.createDataFrame(
        rows, "media_id long, pos int, host_idx int, path string"
    )
    got = {r.media_id: r.allowed for r in robots_gate_urls(df).collect()}
    assert got == want
    assert set(want.values()) == {True, False}  # both outcomes exercised


def test_frontier_fixture_paths_live_in_rule_space(spark):
    df = spark.createDataFrame(
        [(i, f"text {i} alpha beta") for i in range(12)],
        "doc_id long, text string",
    )
    media = attach_frontier_sitemap_payload(df, "doc_id", "text")
    urls = sitemap_ingest_urls(media).collect()
    assert urls
    for r in urls:
        host = f"h{r.media_id % 7}.example.com"
        assert r.loc.startswith(f"https://{host}/")
        path = r.loc[len(f"https://{host}"):]
        assert path[:2] in ("/p", "/q") and "/page" in path
        # replays doc_path over the digest slice at this position
        hexd = hashlib.md5(f"text {r.media_id} alpha beta".encode()).hexdigest()
        assert path == doc_path(hexd[r.pos:])


def test_with_text_variants_match_md5(spark):
    from azure_medicine_data_engineering_spark.operators.html_text import (
        warc_html_extract,
    )
    from azure_medicine_data_engineering_spark.operators.pdf_text import (
        attach_pdf_payload,
        pdf_extract_e2e,
    )
    from azure_medicine_data_engineering_spark.sources.warc import (
        attach_warc_payload,
    )

    docs = spark.createDataFrame(
        [(1, "<html><body><p>hello crawl world</p></body></html>")],
        "doc_id long, page string",
    )
    out = warc_html_extract(
        attach_warc_payload(docs, "doc_id", "page"), with_text=True
    ).collect()[0]
    assert out.extracted == "hello crawl world"
    assert out.text_md5 == hashlib.md5(out.extracted.encode()).hexdigest()

    pdocs = spark.createDataFrame(
        [(2, "pdf text body words here")], "doc_id long, text string"
    )
    pout = pdf_extract_e2e(
        attach_pdf_payload(pdocs, "doc_id", "text", 80, 4), with_text=True
    ).collect()[0]
    assert pout.extracted.startswith("Doc 2\n")
    assert pout.text_md5 == hashlib.md5(pout.extracted.encode()).hexdigest()
    assert pout.n_chars == len(pout.extracted)


def test_funnel_monotone_and_nontrivial(spark):
    # run the registered query against the sf0.001 tables
    from azure_medicine_data_engineering_spark.queries.crawl_funnel import (
        q_crawl_e2e_frontier_docs,
    )

    out = {
        r.stage_id: r
        for r in q_crawl_e2e_frontier_docs(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert [out[i].stage for i in range(7)] == [
        "frontier_urls", "robots_allowed", "fetched_docs", "extracted_docs",
        "c4_line_clean", "gopher_pass", "exact_dedup",
    ]
    # monotone survivor counts and consistent drop accounting
    for i in range(1, 7):
        assert out[i].n_out <= out[i - 1].n_out
        assert out[i].n_dropped == out[i - 1].n_out - out[i].n_out
    # the gates actually bite on the fixture corpus
    assert out[1].n_out < out[0].n_out  # robots drops URLs
    assert out[2].n_out < out[1].n_out  # URL -> doc collapse
    assert 0 < out[5].n_out < out[4].n_out  # gopher separates
