"""URL lengthening (shortener expansion) as a dimension join.

Reference: ``functions/LengthenUrlsFunction.java:16-50`` +
``urls/SimpleUrlLengthener.java:172-312`` — async HEAD-redirect
resolution for URLs whose host is on the shortener list
(``src/main/resources/url-shorteners.txt``), with a 10k LRU memo.

Spark-first: the resolved-redirect cache is a *table*. Non-shortener
URLs pass through untouched (the broadcast shortener set prunes the
join); known redirects resolve via broadcast join; unknown shortener
URLs would go to a mapInPandas HTTP resolver (network-gated — tests
inject the redirect table, like MockUrlLengthenerFetcher).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# subset of src/main/resources/url-shorteners.txt (public knowledge)
DEFAULT_SHORTENER_HOSTS = (
    "bit.ly", "t.co", "goo.gl", "tinyurl.com", "ow.ly", "is.gd", "buff.ly",
    "adf.ly", "bit.do", "mcaf.ee", "su.pr", "j.mp", "tr.im", "tiny.cc",
)


def lengthen_urls(
    urls: DataFrame,
    redirects: DataFrame,
    *,
    shortener_hosts: tuple[str, ...] = DEFAULT_SHORTENER_HOSTS,
    url_col: str = "url",
) -> DataFrame:
    """Expand shortened URLs via the redirects table; others pass through.

    ``redirects``: (short_url, long_url). Output keeps the input schema
    with ``url`` replaced by the lengthened value.
    """
    host = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    is_short = F.lower(host).isin([h for h in shortener_hosts])
    j = urls.withColumn("__is_short", is_short).join(
        F.broadcast(redirects),
        F.col(url_col) == F.col("short_url"),
        "left",
    )
    resolved = F.when(
        F.col("__is_short") & F.col("long_url").isNotNull(), F.col("long_url")
    ).otherwise(F.col(url_col))
    others = [c for c in urls.columns if c != url_col]
    return j.select(resolved.alias(url_col), *[F.col(c) for c in others])
