"""CommonCrawl-mode lookups: SURT keys + CDX secondary-index join.

Reference: ``fetcher/commoncrawl/`` — fetching from the CommonCrawl S3
archive via a sorted CDX index: URL -> SURT key
(``CommonCrawlUrls.java:18-66``), binary search over the secondary
index (``SecondaryIndexMap.java:122-142``) to find the segment, then a
byte-range read (``CommonCrawlFetcher.java:135-196``).

Spark-first: the index is a *DataFrame* sorted/bucketed by SURT key;
per-URL binary search becomes a sort-merge (or broadcast, when the
index fits) equi/range join — the same log-cost lookup, set-at-a-time.
The byte-range read slots into ``mapInPandas`` exactly like the HTTP
fetcher (network-gated here).

SURT (Sort-friendly URI Reordering Transform, public format):
``http://www.Example.com:8080/A/b?q=1`` -> ``com,example)/a/b?q=1``
(lowercase, scheme dropped, host labels reversed and comma-joined,
leading ``www.`` dropped, default ports dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surt_key_expr(url: Column) -> Column:
    """SURT key as a native expression (mirrored 1:1 in the SQL oracle)."""
    u = F.lower(url)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/:?#]*:([0-9]+)", 1)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    rev_host = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    port_part = F.when(
        (port != "") & ~port.isin("80", "443"), F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    return F.concat(rev_host, port_part, F.lit(")"), path)


def cdx_lookup(
    frontier: DataFrame,
    cdx_index: DataFrame,
    *,
    url_col: str = "url",
    broadcast_index: bool | None = None,
) -> DataFrame:
    """Join frontier URLs against a CDX index on the SURT key.

    ``cdx_index``: (surt_key, segment, warc_offset, warc_length, ...).
    Missing URLs keep null segment (reference returns 404 for them,
    CommonCrawlFetcher.java:166-170). Broadcasts the index when small;
    at archive scale leave ``broadcast_index=False`` and pre-sort/bucket
    both sides by surt_key so Catalyst picks a sort-merge join with no
    extra shuffle.
    """
    keyed = frontier.withColumn("surt_key", surt_key_expr(F.col(url_col)))
    idx = cdx_index
    if broadcast_index is True:
        idx = F.broadcast(idx)
    return keyed.join(idx, "surt_key", "left")
