"""sitemap.xml ingest — the URL-DISCOVERY stage of a crawl pipeline,
upstream of the robots politeness gate (`operators/robots.py`) and the
WARC fetch ingest (`sources/warc.py`): a crawler seeds its frontier from
the sitemaps hosts publish (sitemaps.org protocol).

Parser scope (stdlib ``xml.etree``):
* ``<urlset>`` documents with the sitemaps.org namespace (or none):
  per-``<url>`` ``loc`` (required), optional ``lastmod`` / ``priority``.
* ``<sitemapindex>`` documents: child ``<sitemap><loc>`` rows flagged
  ``is_index`` (a real frontier enqueues them for a second fetch).
* gzip-compressed payloads (``sitemap.xml.gz`` — sniffed on the 0x1F8B
  magic), the protocol's standard transport.
* Malformed XML raises ValueError (the WARC error-contract convention).

The Spark stage is one Arrow ``mapInPandas`` fan-out (1 sitemap → n URL
rows), map-only. The fixture writer emits deterministic md5-derived
urlsets (even doc ids gzipped) so the DuckDB oracle recomputes every
loc/lastmod/priority from ``md5(text)``.

No counterpart in the reference (crawl-scale extension, same family as
WARC/robots/URL canonicalization)."""

from __future__ import annotations

import gzip
import hashlib
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def sitemap_parse(payload: bytes) -> list[dict]:
    """Parse a sitemap payload (plain or gzipped) into URL rows:
    ``[{loc, lastmod, priority, is_index}, ...]`` in document order.
    Raises ValueError on malformed XML or an unknown root element."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = gzip.decompress(payload)
        except (OSError, EOFError) as exc:
            raise ValueError(f"corrupt gzip sitemap: {exc}") from exc
    try:
        root = ET.parse(io.BytesIO(payload)).getroot()
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from exc
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"unexpected sitemap root <{kind}>")
    is_index = kind == "sitemapindex"
    rows: list[dict] = []
    for el in root:
        if _local(el.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = priority = None
        for child in el:
            name = _local(child.tag)
            text = (child.text or "").strip()
            if name == "loc":
                loc = text
            elif name == "lastmod":
                lastmod = text
            elif name == "priority":
                priority = text
        if not loc:
            raise ValueError("sitemap entry without <loc>")
        rows.append(
            {
                "loc": loc,
                "lastmod": lastmod,
                "priority": priority,
                "is_index": is_index,
            }
        )
    return rows


def sitemap_write(urls: list[dict], index: bool = False, gz: bool = False) -> bytes:
    """Serialize URL rows into a spec-correct urlset / sitemapindex with
    the sitemaps.org namespace; optionally gzip (the .xml.gz transport)."""
    root_tag, entry_tag = ("sitemapindex", "sitemap") if index else ("urlset", "url")
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<{root_tag} xmlns="{_NS}">']
    for u in urls:
        parts.append(f"<{entry_tag}>")
        parts.append(f"<loc>{u['loc']}</loc>")
        if u.get("lastmod"):
            parts.append(f"<lastmod>{u['lastmod']}</lastmod>")
        if u.get("priority"):
            parts.append(f"<priority>{u['priority']}</priority>")
        parts.append(f"</{entry_tag}>")
    parts.append(f"</{root_tag}>")
    data = "".join(parts).encode("utf-8")
    if gz:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(data)
        return buf.getvalue()
    return data


def _attach_sitemap(df: DataFrame, id_col: str, text_col: str, path_fn) -> DataFrame:
    """Shared sitemap-fixture kernel: 1 + (b4 % 4) URLs on the doc's
    ``h<doc_id%7>.example.com`` host, lastmod = a January-2024 day from
    the digest, priority on the 0.1 grid; even doc ids ship gzipped
    (.xml.gz transport). ``path_fn(did, hexd, k)`` builds the loc path —
    the ONLY difference between the fixture variants. Arrow mapInPandas,
    no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                did = int(i)
                hexd = hashlib.md5(str(t).encode("utf-8")).hexdigest()
                n = 1 + int(hexd[4], 16) % 4
                urls = []
                for k in range(n):
                    urls.append(
                        {
                            "loc": (
                                f"https://h{did % 7}.example.com"
                                + path_fn(did, hexd, k)
                            ),
                            "lastmod": "2024-01-%02d"
                            % (1 + int(hexd[k + 1], 16)),
                            "priority": "0.%d" % (int(hexd[k + 2], 16) % 10),
                        }
                    )
                ids.append(did)
                payloads.append(sitemap_write(urls, gz=(did % 2 == 0)))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "sitemap", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    return ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias(id_col), F.col(text_col))
    ).mapInPandas(run, out_schema)


def attach_sitemap_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic sitemap fixture per document (shared kernel
    :func:`_attach_sitemap`; '/s<nibble>/page<hex>' paths)."""
    return _attach_sitemap(
        df,
        id_col,
        text_col,
        lambda did, hexd, k: f"/s{int(hexd[k], 16)}/page{hexd[k + 5]}",
    )


SITEMAP_ROWS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("pos", IntegerType()),
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("priority_deci", IntegerType()),
        StructField("is_index", BooleanType()),
    ]
)


def sitemap_ingest_urls(df: DataFrame) -> DataFrame:
    """Explode sitemap payloads into per-URL frontier rows
    ``(media_id, pos, loc, lastmod, priority_deci, is_index)`` — one
    Arrow fan-out pass (gzip sniff + namespace-aware parse inside);
    priority parses onto the deci grid as an exact integer."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for pos, u in enumerate(sitemap_parse(bytes(p))):
                    pr = u["priority"]
                    deci = (
                        int(round(float(pr) * 10)) if pr is not None else -1
                    )
                    rows.append(
                        (
                            mid,
                            pos,
                            u["loc"],
                            u["lastmod"],
                            deci,
                            u["is_index"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "pos", "loc", "lastmod",
                    "priority_deci", "is_index",
                ],
            )

    return df.mapInPandas(run, SITEMAP_ROWS_SCHEMA)


def attach_frontier_sitemap_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Frontier-fixture variant of :func:`attach_sitemap_payload` (round
    12, for the end-to-end crawl funnel): same URL count / lastmod /
    priority / gzip rules, but the loc PATHS live in the robots-rule
    space — ``operators/robots.doc_path`` over the digest nibbles at each
    position — so the downstream REP gate actually bites (the '/s…' paths
    of the plain fixture never match any fixture rule). Shared kernel
    :func:`_attach_sitemap`; Arrow mapInPandas, no shuffle."""
    from azure_medicine_data_engineering_spark.operators.robots import doc_path

    return _attach_sitemap(
        df, id_col, text_col, lambda did, hexd, k: doc_path(hexd[k:])
    )
