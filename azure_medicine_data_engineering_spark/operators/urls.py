"""URL canonicalization for crawl dedup — the normalization a
FineWeb/Common-Crawl-class pipeline applies BEFORE exact-URL dedup (the
cheapest dedup pass: one hash-groupBy on the canonical form).

Canonicalization contract (deterministic, mirrored in DuckDB SQL):
* scheme and host:port lowercase;
* default ports stripped (``:80`` for http, ``:443`` for https);
* fragment dropped;
* tracking query parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``);
* remaining query parameters sorted bytewise and re-joined with ``&``
  (empty query → no ``?``);
* path: runs of trailing slashes stripped; empty path → ``/``.

Spark-first: :func:`canonicalize_url` is a PURE Column expression —
regexp_extract / higher-order array filter / array_sort, all JVM-side and
whole-stage-codegen-able. No Python UDF anywhere (the 100 TB property:
this runs at scan throughput).

No counterpart in the reference (training-data scale extension; the
reference has no web-ingest surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tracking parameters dropped by the canonical form (name before '=')
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL per the module contract —
    one Column expression, no UDF."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    hostport = (
        F.when(
            scheme == "http", F.regexp_replace(hostport, ":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), hostport, path, qtail)


def url_flags(url: Column) -> tuple[Column, Column]:
    """(had_tracking, had_fragment) indicator columns for audit reports."""
    query = F.regexp_extract(url, _QUERY_RE, 1)
    had_tracking = F.exists(
        F.split(query, "&"), lambda p: p.rlike(TRACKING_PARAM_RE)
    )
    had_fragment = url.contains("#")
    return had_tracking, had_fragment


def canonicalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Append ``canon_url`` / ``had_tracking`` / ``had_fragment`` to a
    frame with a URL column — the map-only normalization stage before an
    exact-URL dedup groupBy."""
    ht, hf = url_flags(F.col(url_col))
    return df.select(
        "*",
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        ht.alias("had_tracking"),
        hf.alias("had_fragment"),
    )


#: DuckDB mirror of the Spark contract above — interpolated into oracle
#: SQL. {u} is the URL expression.
def canonicalize_url_sql(u: str) -> str:
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    hostport = (
        f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1))"
    )
    hostport_c = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    raw_path = (
        f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1)"
    )
    trimmed = f"regexp_replace({raw_path}, '/+$', '')"
    path = f"CASE WHEN {trimmed} = '' THEN '/' ELSE {trimmed} END"
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    qtail = (
        f"CASE WHEN len({kept}) > 0 "
        f"THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    )
    return f"({scheme} || '://' || {hostport_c} || {path} || {qtail})"
