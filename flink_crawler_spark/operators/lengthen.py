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

from collections import OrderedDict
from collections.abc import Callable, Iterator

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


# ----------------------------------------------------------------------
# Live resolution (SimpleUrlLengthener.java:172-312): HEAD-redirect chase
# for shortener URLs the redirect table doesn't know, with a 10k
# executor-local LRU memo (reference: LruCache of size 10_000,
# SimpleUrlLengthener.java:60-66). The HTTP call itself is injected —
# tests pass a dict-backed mock exactly like the reference's
# MockUrlLengthenerFetcher (src/test/.../fetcher/MockUrlLengthenerFetcher.java);
# production passes `urllib_head_resolver`.
# ----------------------------------------------------------------------

# Per-Python-worker LRU (workers are reused across batches in one
# executor, spark.python.worker.reuse=true — so this memoizes across the
# whole job, not just one Arrow batch).
_RESOLVE_LRU: OrderedDict = OrderedDict()


def _host_of(url: str) -> str:
    from urllib.parse import urlsplit

    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def _chase(
    url: str,
    resolver: Callable[[str], tuple[int, str | None]],
    shorteners: frozenset,
    max_hops: int,
) -> str:
    """Follow HEAD redirects while the host stays on the shortener list.

    Returns the final URL; on any error / non-redirect first answer the
    original URL passes through unchanged (reference behavior: lengthen
    never drops a URL, SimpleUrlLengthener.java:229-247)."""
    cur = url
    for _ in range(max_hops):
        try:
            code, location = resolver(cur)
        except Exception:
            return url
        if code in (301, 302, 303, 307, 308) and location:
            cur = location
            if _host_of(cur) not in shorteners:
                return cur  # landed off the shortener — done
            continue
        # non-redirect answer: a shortener that didn't redirect -> original
        return cur if cur != url else url
    return cur


def _lru_resolve(url, resolver, shorteners, max_hops, lru_size):
    got = _RESOLVE_LRU.get(url)
    if got is not None:
        _RESOLVE_LRU.move_to_end(url)
        return got
    got = _chase(url, resolver, shorteners, max_hops)
    _RESOLVE_LRU[url] = got
    if len(_RESOLVE_LRU) > lru_size:
        _RESOLVE_LRU.popitem(last=False)
    return got


def urllib_head_resolver(timeout_s: float = 10.0) -> Callable[[str], tuple[int, str | None]]:
    """Production resolver: one HEAD request, redirects NOT auto-followed
    (the chase loop owns hop accounting). Network-gated — untestable in
    this container, the seam is what's tested."""

    def resolve(url: str) -> tuple[int, str | None]:
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        opener = urllib.request.build_opener(_NoRedirect)
        req = urllib.request.Request(url, method="HEAD")
        try:
            with opener.open(req, timeout=timeout_s) as resp:
                return resp.status, resp.headers.get("Location")
        except urllib.error.HTTPError as e:
            return e.code, e.headers.get("Location") if e.headers else None

    return resolve


def lengthen_urls_live(
    urls: DataFrame,
    redirects: DataFrame | None = None,
    *,
    resolver: Callable[[str], tuple[int, str | None]],
    shortener_hosts: tuple[str, ...] = DEFAULT_SHORTENER_HOSTS,
    url_col: str = "url",
    max_hops: int = 5,
    lru_size: int = 10_000,
) -> DataFrame:
    """Full P1: table-known redirects resolve by broadcast join; unknown
    shortener URLs go to the mapInPandas HEAD resolver; non-shortener
    URLs never leave the JVM.

    Scale shape: the live path repartitions on the short URL so duplicate
    shorts co-locate and the per-worker LRU turns them into one HTTP call
    per distinct URL per executor; the (usually dominant) non-shortener
    stream stays a pure codegen'd pass-through with zero shuffle.
    """
    import pandas as pd

    host = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    is_short = F.lower(host).isin(list(shortener_hosts))
    marked = urls.withColumn("__is_short", is_short)
    others = [c for c in urls.columns if c != url_col]

    if redirects is not None:
        j = marked.join(
            F.broadcast(redirects), F.col(url_col) == F.col("short_url"), "left"
        )
        table_resolved = F.when(
            F.col("__is_short") & F.col("long_url").isNotNull(), F.col("long_url")
        ).otherwise(F.col(url_col))
        known = j.filter(~F.col("__is_short") | F.col("long_url").isNotNull()).select(
            table_resolved.alias(url_col), *[F.col(c) for c in others]
        )
        unknown = j.filter(F.col("__is_short") & F.col("long_url").isNull()).select(
            F.col(url_col), *[F.col(c) for c in others]
        )
    else:
        known = marked.filter(~F.col("__is_short")).drop("__is_short")
        unknown = marked.filter(F.col("__is_short")).drop("__is_short")

    shorteners = frozenset(h.lower() for h in shortener_hosts)
    out_schema = unknown.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf[url_col] = [
                    _lru_resolve(u, resolver, shorteners, max_hops, lru_size)
                    for u in pdf[url_col]
                ]
            yield pdf

    live = unknown.repartition(F.col(url_col)).mapInPandas(run, out_schema)
    return known.unionByName(live)
