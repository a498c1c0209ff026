"""HTML → text extraction, pure stdlib — the stage between WARC ingest
(`sources/warc.py`) and the text-quality operators (`text_clean.py`,
`text.py`): a Common-Crawl-scale pipeline demuxes WARC, strips markup, THEN
runs C4/Gopher rules. Round 10 completes that chain.

Extraction contract (deterministic, SQL-mirrorable — a simplified
trafilatura/WET-class extractor):
* ``script`` / ``style`` / ``noscript`` / ``template`` subtrees are
  dropped entirely; comments and DOCTYPE are ignored.
* BLOCK-level boundaries (``p h1-h6 div li ul ol table tr br title
  section article header footer blockquote pre``) split the output into
  lines; inline markup (``a b i em span strong code ...``) concatenates.
* Character/entity references decode (``&amp;`` → ``&``).
* Within each line, whitespace runs collapse to one space and the line is
  stripped; empty lines drop; lines join with ``\\n``.

No counterpart in the reference (training-data scale extension, same
class as the WARC/JPEG/AVI containers).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator
from html.parser import HTMLParser

#: HTML5 whitespace set (space \t \n \f \r) — EXACTLY this class, not
#: Python's unicode str.split(), so the DuckDB mirror
#: ``regexp_replace(..., '[ \\t\\n\\f\\r]+', ' ', 'g')`` is bit-identical
#: (RE2's \\s is the same five characters; unicode spaces pass through
#: as text on both engines).
_WS_RUN = re.compile(r"[ \t\n\f\r]+")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_DROP_SUBTREE = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "li", "ul", "ol",
    "table", "tr", "br", "title", "section", "article", "header",
    "footer", "blockquote", "pre",
}


class _TextExtractor(HTMLParser):
    """Streaming extractor: accumulates text per block-level line; a depth
    counter suppresses everything under drop-subtree tags (convert_charrefs
    — the stdlib default — decodes entities into handle_data)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._lines: list[str] = []
        self._buf: list[str] = []
        self._drop_depth = 0

    def _flush(self) -> None:
        line = _WS_RUN.sub(" ", "".join(self._buf)).strip(" ")
        if line:
            self._lines.append(line)
        self._buf = []

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth == 0:
            self._buf.append(data)

    def text(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def html_to_text(html: str) -> str:
    """Extract readable text from an HTML document per the module
    contract. Pure stdlib ``html.parser`` — tolerant of unclosed tags and
    attribute soup the way browsers are."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()


def attach_html_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic HTML fixture: each document's text is wrapped in a
    realistic page — title from md5(text), heading from the id, the text
    ESCAPED inside ``<p>`` (so extraction round-trips it exactly), plus
    ``<script>``/``<style>`` noise and a comment the extractor must drop.
    The extraction contract makes the expected text SQL-recomputable:
    ``T<hex8>\\nDoc <id>\\n<whitespace-collapsed text>``. Arrow
    mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import html as html_mod

        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = str(t)
                hex8 = hashlib.md5(text.encode("utf-8")).hexdigest()[:8]
                page = (
                    "<!DOCTYPE html><html><head>"
                    f"<title>T{hex8}</title>"
                    '<script type="text/javascript">var p = "<p>NOISE</p>";'
                    "</script><style>p { color: red }</style>"
                    "</head><body>"
                    f"<h1>Doc {i}</h1>"
                    f"<p>{html_mod.escape(text)}</p>"
                    "<!-- crawler comment -->"
                    "</body></html>"
                )
                ids.append(i)
                payloads.append(page.encode("utf-8"))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "html", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


HTML_EXTRACT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_lines", LongType()),
        StructField("n_chars", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def extract_text_stats(df: DataFrame) -> DataFrame:
    """Strip HTML payloads to text and emit per-document extraction stats
    ``(media_id, n_lines, n_chars, text_md5)`` in one Arrow mapInPandas
    pass (map-only; a production variant also emits the text column and
    feeds the C4/Gopher stages directly)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                text = html_to_text(bytes(p).decode("utf-8"))
                rows.append(
                    (
                        mid,
                        text.count("\n") + 1 if text else 0,
                        len(text),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_lines", "n_chars", "text_md5"]
            )

    return df.mapInPandas(run, HTML_EXTRACT_SCHEMA)


CRAWL_E2E_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content_length", LongType()),
        StructField("n_lines", LongType()),
        StructField("n_chars", LongType()),
        StructField("text_md5", StringType()),
    ]
)


def warc_html_extract(df: DataFrame, with_text: bool = False) -> DataFrame:
    """FUSED crawl-ingest stage: parse each WARC payload
    (`sources/warc.py` — member-gzip aware), keep the ``response``
    records, strip their HTML to text, and emit per-document extraction
    stats — WARC demux and HTML extraction in ONE Arrow pass so the
    (potentially large) raw page bytes never cross a stage boundary.
    This is the composition a Common-Crawl pipeline actually runs:
    ``.warc.gz → response filter → text → quality rules``. Map-only.

    Emits ``(media_id, content_length, n_lines, n_chars, text_md5)``
    (one row per response record); ``with_text=True`` appends the
    ``extracted`` text column so downstream C4/Gopher stages can consume
    it directly (round 12 — the crawl-funnel composition)."""
    from azure_medicine_data_engineering_spark.sources.warc import warc_parse

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for headers, content in warc_parse(bytes(p)):
                    if headers.get("warc-type") != "response":
                        continue
                    text = html_to_text(content.decode("utf-8"))
                    row = (
                        mid,
                        len(content),
                        text.count("\n") + 1 if text else 0,
                        len(text),
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                    )
                    rows.append(row + (text,) if with_text else row)
            cols = [
                "media_id", "content_length", "n_lines", "n_chars",
                "text_md5",
            ]
            if with_text:
                cols.append("extracted")
            yield pd.DataFrame(rows, columns=cols)

    schema = CRAWL_E2E_SCHEMA
    if with_text:
        schema = StructType(
            CRAWL_E2E_SCHEMA.fields + [StructField("extracted", StringType())]
        )
    return df.mapInPandas(run, schema)
