"""HTML → text extractor tests (round 10). The naive-reference pins use
hand-written pages with known expected text — independent of the fixture
builder, so a contract bug shared by builder and extractor can't hide."""

import pytest

from azure_medicine_data_engineering_spark.operators.html_text import (
    html_to_text,
)


def test_basic_blocks_and_inline():
    html = "<html><body><h1>Title</h1><p>Hello <b>bold</b> world</p></body></html>"
    assert html_to_text(html) == "Title\nHello bold world"


def test_script_style_comment_dropped():
    html = (
        "<head><script>var a = '<p>fake</p>';</script>"
        "<style>p { color: red }</style></head>"
        "<body><!-- note --><p>real</p><noscript>off</noscript></body>"
    )
    assert html_to_text(html) == "real"


def test_entities_decode():
    assert html_to_text("<p>a &amp; b &lt;c&gt; &#233;</p>") == "a & b <c> é"


def test_whitespace_collapse_html5_set():
    assert html_to_text("<p>a\t\tb\n  c\r\nd\fe</p>") == "a b c d e"
    # vertical tab is NOT HTML5 whitespace: preserved as a character
    assert html_to_text("<p>a\x0bb</p>") == "a\x0bb"


def test_tag_soup_unclosed():
    assert html_to_text("<p>a<p>b<br>c<div>d") == "a\nb\nc\nd"
    assert html_to_text("plain text, no tags") == "plain text, no tags"


def test_nested_drop_subtrees():
    html = "<p>keep</p><script><script>x</script><p>lost until outer closes"
    # stdlib parser ends script CDATA at the FIRST </script>; the inner
    # <script> open inside CDATA is data, so depth returns to 0 there
    out = html_to_text(html)
    assert "keep" in out and "x" not in out


def test_inline_tags_do_not_split():
    html = "<p><span>a</span><em>b</em><a href='#'>c</a></p>"
    assert html_to_text(html) == "abc"


def test_empty_and_blank_lines_drop():
    assert html_to_text("<p>  </p><p>x</p><div></div>") == "x"
    assert html_to_text("") == ""


def test_spark_stage_roundtrip(spark):
    from azure_medicine_data_engineering_spark.operators.html_text import (
        attach_html_payload,
        extract_text_stats,
    )
    import hashlib

    df = spark.createDataFrame(
        [(1, "alpha  beta"), (2, "x & y <z>")], "doc_id long, text string"
    )
    rows = {
        r["media_id"]: r
        for r in extract_text_stats(
            attach_html_payload(df, "doc_id", "text")
        ).collect()
    }
    h1 = hashlib.md5(b"alpha  beta").hexdigest()[:8]
    expect1 = f"T{h1}\nDoc 1\nalpha beta"
    assert rows[1]["n_lines"] == 3
    assert rows[1]["n_chars"] == len(expect1)
    assert rows[1]["text_md5"] == hashlib.md5(expect1.encode()).hexdigest()
    h2 = hashlib.md5("x & y <z>".encode()).hexdigest()[:8]
    expect2 = f"T{h2}\nDoc 2\nx & y <z>"  # escape + entity decode round-trip
    assert rows[2]["text_md5"] == hashlib.md5(expect2.encode()).hexdigest()


def test_fused_warc_html_extract(spark):
    """Fused crawl stage: WARC-of-HTML in, extraction stats out — the
    metadata record is filtered, the response record's page round-trips."""
    import hashlib

    from azure_medicine_data_engineering_spark.operators.html_text import (
        warc_html_extract,
    )
    from azure_medicine_data_engineering_spark.sources.warc import (
        attach_warc_payload,
    )

    df = spark.createDataFrame(
        [(5, "<html><body><p>hi &amp; bye</p></body></html>")],
        "doc_id long, page string",
    )
    media = attach_warc_payload(df, "doc_id", "page", gzip_members=True)
    rows = warc_html_extract(media).collect()
    assert len(rows) == 1  # metadata record filtered out
    r = rows[0]
    assert r["media_id"] == 5
    assert r["content_length"] == len(
        "<html><body><p>hi &amp; bye</p></body></html>".encode()
    )
    assert r["n_lines"] == 1 and r["n_chars"] == len("hi & bye")
    assert r["text_md5"] == hashlib.md5(b"hi & bye").hexdigest()


def test_url_canonicalize_hand_pins(spark):
    """Hand-pinned canonical forms + UDF-free plan guard (the operator's
    100 TB claim IS that it's pure JVM expressions)."""
    from azure_medicine_data_engineering_spark.operators.urls import (
        canonicalize_urls,
    )

    cases = [
        ("HtTp://WwW.ExAmple.COM:80/A/B/?b=2&utm_source=x&a=1#frag",
         "http://www.example.com/A/B?a=1&b=2"),
        ("https://Site.ORG:443/", "https://site.org/"),
        ("https://site.org:8080/x", "https://site.org:8080/x"),  # real port kept
        ("http://h.io", "http://h.io/"),  # empty path -> '/'
        ("http://h.io/p?fbclid=1&gclid=2&ref=z", "http://h.io/p"),  # all tracking
        ("http://h.io/p?z=1&a=2&a=1", "http://h.io/p?a=1&a=2&z=1"),  # dup params sort
        ("http://h.io/CaSe/Path", "http://h.io/CaSe/Path"),  # path case preserved
        ("http://h.io:443/x", "http://h.io:443/x"),  # :443 on http is NOT default
        ("http://h.io/p?k=a=b&utm_x=1", "http://h.io/p?k=a=b"),  # '=' in value
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    out = canonicalize_urls(df, "url")
    got = {r["i"]: r["canon_url"] for r in out.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure JVM: no Python UDF nodes
    flags = {r["i"]: (r["had_tracking"], r["had_fragment"])
             for r in out.collect()}
    assert flags[0] == (True, True)
    assert flags[2] == (False, False)


def test_flesch_kincaid_hand_pinned(spark):
    """Naive-reference pin (mirror-blind-spot convention): hand-counted
    words/syllables/sentences and a hand-evaluated FK grade."""
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        flesch_kincaid_by_group,
    )

    # 'the cat sat. it sat on a mat!' -> 8 words, 8 syllables (all
    # 1-vowel-group), 2 sentences. 'beautiful education everywhere.' ->
    # 3 words, eau-i-u=3 + e-u-a-io=4 + e-e-y-e-e=5 -> 12 syllables? count:
    # beautiful: eau,i,u -> 3; education: e,u,a,io -> 4;
    # everywhere: e,e,y? y in [aeiouy]: e,ve,ryw... groups of [aeiouy]+ in
    # 'everywhere': e,e,y? -> 'e','e','ywhe'... compute: e|v|e|r|y|w|h|e|r|e
    # vowel runs: e / e / y / e / e -> 5. total 12.
    rows = [
        ("s1", "the cat sat. it sat on a mat!"),
        ("s2", "beautiful education everywhere."),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r["g"]: r for r in flesch_kincaid_by_group(df, "text", "source").collect()
    }
    assert (got["s1"]["n_words"], got["s1"]["n_syllables"],
            got["s1"]["n_sentences"]) == (8, 8, 2)
    fk1 = round(0.39 * 8 / 2 + 11.8 * 8 / 8 - 15.59, 4)
    assert got["s1"]["fk_grade"] == fk1
    assert (got["s2"]["n_words"], got["s2"]["n_syllables"],
            got["s2"]["n_sentences"]) == (3, 12, 1)
    fk2 = round(0.39 * 3 / 1 + 11.8 * 12 / 3 - 15.59, 4)
    assert got["s2"]["fk_grade"] == fk2
    # degenerate: no letters at all -> NULL grade
    df0 = spark.createDataFrame([("z", "123 456!")], "source string, text string")
    r0 = flesch_kincaid_by_group(df0, "text", "source").collect()[0]
    assert r0["n_words"] == 0 and r0["fk_grade"] is None
