"""URL canonicalization — the crawl-hygiene step that runs BEFORE url
dedup: two crawls of the same page routinely differ only in scheme/host
case, default ports, fragments, tracking parameters, or query-parameter
order, and deduping raw strings silently keeps all of them as distinct
urls. Pure Catalyst expressions (regexp / split / filter / sort_array /
array_join — whole-stage codegen, no UDF, no shuffle), with a DuckDB twin
of identical semantics for the oracle gate.

Canonical form:
  1. fragment (``#…``) dropped;
  2. scheme and host lowercased (path/query case preserved);
  3. default ports dropped (``:80`` for http, ``:443`` for https);
  4. tracking parameters dropped: ``utm_*``, ``gclid``, ``fbclid``;
  5. remaining query parameters sorted bytewise; an emptied query loses
     its ``?``. Path is otherwise preserved verbatim (no trailing-slash
     or dot-segment rewriting — those change semantics on real servers).

Scheme-less / malformed urls (no ``scheme://`` prefix — relative links,
protocol-relative ``//host/x``, junk) pass through UNCHANGED: without a
recognizable scheme the host/path split is meaningless, and the previous
behavior (emitting ``://example.com/x``) silently collided distinct
malformed urls before dedup.

Reference provenance: the reference dedups granule paths verbatim
(src/EOProducts.jl product scan); canonicalization is part of the ☆
web-corpus extension, feeding flagship.prepare_corpus's url dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_RE = "^(utm_.*|gclid|fbclid)="


def canonicalize_url_expr(url: Column) -> Column:
    """Canonical url as one JVM expression tree (see module docstring)."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?]*)", 1)
    host = F.lower(hostport)
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 20))
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canonical).otherwise(url)


def canonicalize_url_sql(url_expr: str) -> str:
    """DuckDB twin with identical semantics (oracle for the Spark expr)."""
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace(lower({hostport}), ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace(lower({hostport}), ':443$', '') "
        f"ELSE lower({hostport}) END"
    )
    pathq = f"substring({rest}, length({hostport}) + 1)"
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_replace({pathq}, '^[^?]*\\??', '')"
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{TRACKING_RE}'))"
    )
    sorted_q = f"array_to_string(list_sort({params}), '&')"
    canonical = (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {sorted_q} != '' THEN concat('?', {sorted_q}) ELSE '' END)"
    )
    return f"CASE WHEN {scheme} != '' THEN {canonical} ELSE {url_expr} END"
