"""URL normalization & parsing — the first step of every crawl dedup /
host-rollup pipeline (net-new; the reference has no string-parsing
surface). Canonicalizing URLs BEFORE hashing is what makes crawl-level
exact dedup work: `HTTP://WWW.Example.com:80/a/?utm_source=x&b=1#frag`
and `http://example.com/a?b=1` are the same document.

One narrow codegen'd pass — regexp extracts + an array pipeline for the
query string (split → drop tracking params → sort → re-join). No UDF, no
shuffle; every step has an exact DuckDB twin (string_split / list_filter
/ list_sort), so normalization is oracle-checkable bit-for-bit.

Normalization rules (documented contract):
* scheme and host lowercase; a leading ``www.`` and default ports
  (``:80``/``:443``) are dropped from the host;
* the fragment is dropped;
* tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``) are
  removed; remaining query params sort lexicographically;
* a trailing ``/`` is stripped from non-root paths; an empty path
  canonicalizes to ``/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?([^#]*)"

#: dropped query parameters (tracking noise)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "ref")


def parse_urls(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """(id, scheme, host, path, query_norm, url_norm) — parsed and
    canonicalized URL per row. Rows with NULL urls are dropped; malformed
    urls (no ``scheme://``) yield empty scheme/host and pass the raw
    string through ``path``."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
    raw_host = F.lower(F.regexp_extract(u, _HOST, 1))
    host = F.regexp_replace(
        F.regexp_replace(raw_host, r"^www\.", ""), r":(80|443)$", ""
    )
    raw_path = F.regexp_extract(u, _PATH, 1)
    path = F.when(
        (raw_path == "") | (raw_path == "/"), F.lit("/")
    ).otherwise(F.regexp_replace(raw_path, r"/$", ""))
    raw_q = F.regexp_extract(u, _QUERY, 1)
    drop = "(" + "|".join(
        p + (".*" if p.endswith("_") else "") for p in TRACKING_PARAMS
    ) + ")=.*"
    params = F.filter(
        F.split(raw_q, "&"),
        lambda p: (p != "") & ~p.rlike("^" + drop + "$"),
    )
    query_norm = F.array_join(F.array_sort(params), "&")
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query_norm != "", F.concat(F.lit("?"), query_norm)).otherwise(
            F.lit("")
        ),
    )
    return df.where(u.isNotNull()).select(
        F.col(id_col),
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        query_norm.alias("query_norm"),
        F.when(scheme != "", url_norm).otherwise(u).alias("url_norm"),
    )


def host_rollup(
    df: DataFrame, url_col: str, id_col: str, top_k: int = 50
) -> DataFrame:
    """(host, n_docs, rank) — top-``top_k`` hosts by document count from
    parsed URLs (crawl-budget / per-host-cap planning). Partial-combined
    groupBy on the host; TakeOrdered bounds the output; (count DESC,
    host ASC) rank is deterministic."""
    from pyspark.sql import Window

    hosts = parse_urls(df, url_col, id_col).where(F.col("host") != "")
    counts = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    # TakeOrdered bounds the result FIRST (distributed top-k heap), then
    # the rank window runs over <= top_k rows — an unpartitioned window
    # over every host would single-partition millions of rows (the
    # vocabulary-op pattern)
    top = counts.orderBy(F.col("n_docs").desc(), F.col("host").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("host").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "host", "n_docs", "rank"
    )
