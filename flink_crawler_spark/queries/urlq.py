"""URL scalar-layer queries: normalize-lite, validate, PLD extraction.

Messy URLs are synthesized deterministically from ``lineitem`` columns in
BOTH engines; the normalization chain is generated from the single
shared step table in ``functions/urls.py`` (Spark folds Column
regexp_replace; the oracle folds DuckDB CTEs), so the two
implementations cannot drift.

Reference parity: ``urls/SimpleUrlNormalizer.java:266-365`` (subset),
``urls/SimpleUrlValidator.java:53-80``, ``pojos/ValidUrl.java:161-170``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import (
    BARE_AUTHORITY_RE,
    LITE_STEPS,
    MULTI_LABEL_SUFFIXES,
    PREFIX_RE,
    host_expr,
    is_valid_url_expr,
    normalize_url_lite_expr,
    pld_expr,
)
from .base import register, t

# --------------------------------------------------------------------------
# messy-URL fixture (same construction in both engines)
# --------------------------------------------------------------------------

MESSY_SQL = """
messy AS (
  SELECT l_orderkey AS id,
         l_linenumber AS ln,
         CASE l_orderkey % 4 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://'
                             WHEN 2 THEN 'http://' ELSE '' END
         || CASE l_orderkey % 3
              WHEN 0 THEN 'WWW.D' || CAST(l_suppkey % 50 AS VARCHAR) || '.Example.COM'
              WHEN 1 THEN 'd' || CAST(l_suppkey % 50 AS VARCHAR) || '.example.com.'
              ELSE 'd' || CAST(l_suppkey % 50 AS VARCHAR) || '.example.co.uk' END
         || CASE l_orderkey % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':8080' ELSE '' END
         || CASE l_orderkey % 6
              WHEN 0 THEN '//a//b/index.html'
              WHEN 1 THEN '/p/' || CAST(l_partkey % 500 AS VARCHAR)
              WHEN 2 THEN '/index.php'
              WHEN 3 THEN '/x/y.html;jsessionid=ABC123'
              ELSE '' END
         || CASE l_orderkey % 7
              WHEN 0 THEN '?PHPSESSID=abc123&x=1'
              WHEN 1 THEN '?q=1&&z=2&'
              WHEN 2 THEN '?'
              WHEN 3 THEN '?a=1&sessionid=zzz'
              ELSE '' END
         || CASE l_orderkey % 2 WHEN 0 THEN '#ref' ELSE '' END AS url
  FROM lineitem
  WHERE l_linenumber = 1
)
"""


def messy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    k1 = (F.col("l_suppkey") % 50).cast("string")
    k2 = (F.col("l_partkey") % 500).cast("string")
    ok = F.col("l_orderkey")
    scheme = (
        F.when(ok % 4 == 0, "HTTP://")
        .when(ok % 4 == 1, "https://")
        .when(ok % 4 == 2, "http://")
        .otherwise("")
    )
    host = (
        F.when(ok % 3 == 0, F.concat(F.lit("WWW.D"), k1, F.lit(".Example.COM")))
        .when(ok % 3 == 1, F.concat(F.lit("d"), k1, F.lit(".example.com.")))
        .otherwise(F.concat(F.lit("d"), k1, F.lit(".example.co.uk")))
    )
    port = F.when(ok % 5 == 0, ":80").when(ok % 5 == 1, ":8080").otherwise("")
    path = (
        F.when(ok % 6 == 0, F.lit("//a//b/index.html"))
        .when(ok % 6 == 1, F.concat(F.lit("/p/"), k2))
        .when(ok % 6 == 2, F.lit("/index.php"))
        .when(ok % 6 == 3, F.lit("/x/y.html;jsessionid=ABC123"))
        .otherwise(F.lit(""))
    )
    query = (
        F.when(ok % 7 == 0, F.lit("?PHPSESSID=abc123&x=1"))
        .when(ok % 7 == 1, F.lit("?q=1&&z=2&"))
        .when(ok % 7 == 2, F.lit("?"))
        .when(ok % 7 == 3, F.lit("?a=1&sessionid=zzz"))
        .otherwise(F.lit(""))
    )
    frag = F.when(ok % 2 == 0, "#ref").otherwise("")
    return li.select(
        ok.alias("id"),
        F.col("l_linenumber").alias("ln"),
        F.concat(scheme, host, port, path, query, frag).alias("url"),
    )


def _duckdb_lite_chain() -> str:
    """Fold the shared LITE_STEPS into chained DuckDB CTEs (s0..sN)."""
    steps = []
    # s0: trim + default scheme
    steps.append(
        "s0 AS (SELECT id, CASE WHEN strpos(trim(url), '://') = 0 "
        "THEN 'http://' || trim(url) ELSE trim(url) END AS u FROM messy)"
    )
    # s1: lowercase scheme://host[:port] prefix + strip trailing host dot
    steps.append(
        "s1 AS (SELECT id, regexp_replace(lower(regexp_extract(u, '"
        + PREFIX_RE.replace("'", "''")
        + "', 1)), '\\.(:|$)', '\\1', 'g') || substr(u, length(regexp_extract(u, '"
        + PREFIX_RE.replace("'", "''")
        + "', 1)) + 1) AS u FROM s0)"
    )
    prev = "s1"
    for i, (pattern, replacement) in enumerate(LITE_STEPS, start=2):
        duck_pat = pattern.replace("'", "''")
        duck_rep = replacement.replace("$", "\\")
        steps.append(
            f"s{i} AS (SELECT id, regexp_replace(u, '{duck_pat}', '{duck_rep}', 'g') AS u FROM {prev})"
        )
        prev = f"s{i}"
    final = (
        f"norm AS (SELECT id, CASE WHEN regexp_matches(u, '{BARE_AUTHORITY_RE}') "
        f"THEN u || '/' ELSE u END AS normalized_url FROM {prev})"
    )
    steps.append(final)
    return ",\n".join(steps)


@register(
    "url_normalize_lite",
    oracle=f"""
WITH {MESSY_SQL.strip()},
{_duckdb_lite_chain()}
SELECT id, normalized_url FROM norm
""",
)
def url_normalize_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = messy_urls(spark, sf_dir)
    return df.select("id", normalize_url_lite_expr(F.col("url")).alias("normalized_url"))


HOST_RE_SQL = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
SANE_HOST_RE = r"^[A-Za-z0-9._-]+$"


@register(
    "url_validate",
    oracle=f"""
WITH {MESSY_SQL.strip()},
hosts AS (
  SELECT id, url, regexp_extract(url, '{HOST_RE_SQL}', 1) AS host FROM messy
)
SELECT id, url,
       (regexp_matches(url, '^(http|https)://') AND host <> ''
        AND regexp_matches(host, '{SANE_HOST_RE}')) AS is_valid
FROM hosts
""",
)
def url_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = messy_urls(spark, sf_dir)
    host = host_expr(F.col("url"))
    valid = (
        F.col("url").rlike("^(http|https)://") & (host != F.lit("")) & host.rlike(SANE_HOST_RE)
    )
    return df.select("id", "url", valid.alias("is_valid"))


def _suffix_list_sql() -> str:
    return "[" + ", ".join(f"'{s}'" for s in sorted(MULTI_LABEL_SUFFIXES)) + "]"


@register(
    "url_pld_extract",
    oracle=f"""
WITH {MESSY_SQL.strip()},
hosts AS (
  SELECT id, regexp_replace(lower(regexp_extract(url, '{HOST_RE_SQL}', 1)), '\\.$', '') AS host
  FROM messy
),
parts AS (
  SELECT id, host, string_split(host, '.') AS l, length(string_split(host, '.')) AS n
  FROM hosts
)
SELECT id, host,
       CASE WHEN n <= 2 THEN host
            WHEN regexp_matches(host, '^[0-9.]+$') THEN host
            WHEN list_contains({_suffix_list_sql()}, array_to_string(l[n-1:n], '.')) AND n >= 3
                 THEN array_to_string(l[n-2:n], '.')
            ELSE array_to_string(l[n-1:n], '.') END AS pld
FROM parts
""",
)
def url_pld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = messy_urls(spark, sf_dir)
    host = F.regexp_replace(F.lower(host_expr(F.col("url"))), r"\.$", "")
    return df.select("id", host.alias("host"), pld_expr(F.col("url")).alias("pld"))


# --------------------------------------------------------------------------
# live lengthener E2E (P1: LengthenUrlsFunction.java:16-50 +
# SimpleUrlLengthener.java:172-312). A deterministic injected resolver
# stands in for the HEAD fetcher (MockUrlLengthenerFetcher pattern) so
# DuckDB can reproduce the resolution arithmetic exactly; the Spark side
# still runs the REAL machinery — broadcast table join, shortener-host
# split, repartition-on-url, mapInPandas chase loop, per-worker LRU.
# --------------------------------------------------------------------------

LENGTHEN_FIXTURE_SQL = """
surls AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 7 = 0
              THEN 'http://bit.ly/o' || CAST(o_orderkey AS VARCHAR)
              ELSE 'http://shop' || CAST(o_orderkey % 89 AS VARCHAR)
                   || '.example.com/order/' || CAST(o_orderkey AS VARCHAR)
         END AS url
  FROM orders
)
"""


@register(
    "url_lengthen_resolve",
    oracle=f"""
WITH {LENGTHEN_FIXTURE_SQL.strip()}
SELECT id,
       CASE
         WHEN id % 14 = 0 THEN 'http://table.example.com/' || CAST(id AS VARCHAR)
         WHEN id % 7 = 0  THEN 'http://resolved.example.com/' || md5('o' || CAST(id AS VARCHAR))
         ELSE url
       END AS url
FROM surls
""",
)
def url_lengthen_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 7th order gets a bit.ly short URL; every 14th is known to the
    redirect table (broadcast-join path), the rest of the shorts chase
    through the deterministic mock resolver (mapInPandas + LRU path),
    and non-shortener URLs pass through JVM-only."""
    import hashlib

    from ..operators.lengthen import lengthen_urls_live

    orders = t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("id"))
    urls = orders.select(
        "id",
        F.when(
            F.col("id") % 7 == 0,
            F.concat(F.lit("http://bit.ly/o"), F.col("id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("http://shop"),
                (F.col("id") % 89).cast("string"),
                F.lit(".example.com/order/"),
                F.col("id").cast("string"),
            )
        )
        .alias("url"),
    )
    redirects = (
        orders.filter(F.col("id") % 14 == 0)
        .select(
            F.concat(F.lit("http://bit.ly/o"), F.col("id").cast("string")).alias("short_url"),
            F.concat(F.lit("http://table.example.com/"), F.col("id").cast("string")).alias(
                "long_url"
            ),
        )
    )

    def resolver(url: str):
        tag = url.rsplit("/", 1)[-1]
        return 301, "http://resolved.example.com/" + hashlib.md5(tag.encode()).hexdigest()

    out = lengthen_urls_live(urls.select("url", "id"), redirects, resolver=resolver)
    return out.select("id", "url")
