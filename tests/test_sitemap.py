"""sitemap.xml ingest tests (`sources/sitemap.py`)."""

from __future__ import annotations

import gzip

import pytest

from azure_medicine_data_engineering_spark.sources.sitemap import (
    sitemap_parse,
    sitemap_write,
)


def test_handmade_urlset_wire_pin():
    # authored by hand (not via sitemap_write): namespace, whitespace,
    # an extra unknown element the parser must skip
    raw = (
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        b"  <url>\n"
        b"    <loc> https://a.example.com/x </loc>\n"
        b"    <lastmod>2023-12-31</lastmod>\n"
        b"    <changefreq>daily</changefreq>\n"
        b"    <priority>0.8</priority>\n"
        b"  </url>\n"
        b"  <url><loc>https://a.example.com/y</loc></url>\n"
        b"</urlset>\n"
    )
    rows = sitemap_parse(raw)
    assert rows == [
        {"loc": "https://a.example.com/x", "lastmod": "2023-12-31",
         "priority": "0.8", "is_index": False},
        {"loc": "https://a.example.com/y", "lastmod": None,
         "priority": None, "is_index": False},
    ]


def test_index_and_gzip_roundtrip():
    kids = [{"loc": f"https://h.example.com/s{i}.xml"} for i in range(3)]
    data = sitemap_write(kids, index=True, gz=True)
    assert data[:2] == b"\x1f\x8b"
    rows = sitemap_parse(data)
    assert all(r["is_index"] for r in rows) and len(rows) == 3
    # deterministic bytes (pinned mtime)
    assert data == sitemap_write(kids, index=True, gz=True)


def test_error_surface():
    with pytest.raises(ValueError):
        sitemap_parse(b"<urlset><url></url></urlset>")  # no <loc>
    with pytest.raises(ValueError):
        sitemap_parse(b"<rss></rss>")  # wrong root
    with pytest.raises(ValueError):
        sitemap_parse(b"<urlset><url><loc>x</loc>")  # truncated XML
    with pytest.raises(ValueError):
        sitemap_parse(b"\x1f\x8b" + b"junk")  # corrupt gzip
    # un-namespaced documents still parse (lenient like real crawlers)
    rows = sitemap_parse(b"<urlset><url><loc>u</loc></url></urlset>")
    assert rows[0]["loc"] == "u"
