"""Synthetic web-graph fixtures — the mock-service tables (FIXTURES.md).

Mirrors the reference's test infrastructure (semantics, not code):
  * ``src/test/.../webgraph/SimpleWebGraph.java:51-61`` — adjacency list
    of page -> outlinks;
  * ``src/test/.../fetcher/WebGraphFetcher.java:22-85`` — "fetches" a page
    by rendering deterministic HTML from the graph (title encodes the
    page score, ``:25``); URLs absent from the graph 404 (``:60-63``);
  * ``src/test/.../fetcher/MockRobotsFetcher.java:40-66`` — robots.txt
    bodies served from a map;
  * ``SiteMapGraphFetcher`` / ``MockUrlLengthenerFetcher`` — sitemap
    entries and shortener redirects from maps.

Everything network-shaped becomes a *table*; the mock fetch becomes a
*join*. Page rendering is native Spark (groupBy + sort_array + concat) so
the same code renders a trillion-row graph without a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEB_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("page_url", T.StringType(), False),
        T.StructField("page_score", T.DoubleType(), True),
        T.StructField("outlink_pos", T.IntegerType(), True),
        T.StructField("outlink_url", T.StringType(), True),
    ]
)


def web_graph_from_adjacency(
    spark: SparkSession,
    adjacency: dict[str, list[str]],
    scores: dict[str, float] | None = None,
) -> DataFrame:
    """Build the web_graph table from ``{page: [outlink, ...]}``.

    Pages with no outlinks get one row with a null outlink (they must
    still exist, or the mock fetch 404s them).
    """
    scores = scores or {}
    rows = []
    for page, links in adjacency.items():
        score = float(scores.get(page, 1.0))
        if not links:
            rows.append((page, score, None, None))
        for pos, link in enumerate(links):
            rows.append((page, score, pos, link))
    return spark.createDataFrame(rows, WEB_GRAPH_SCHEMA)


def render_pages(web_graph: DataFrame) -> DataFrame:
    """Render deterministic HTML per page (WebGraphFetcher.java:22-28).

    Title encodes the page score so a focused-crawl page scorer can read
    it back — exactly the reference's trick. Returns
    ``(page_url, page_score, html)``.
    """
    links = web_graph.groupBy("page_url", "page_score").agg(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("outlink_url").isNotNull(),
                    F.struct(F.col("outlink_pos").alias("pos"), F.col("outlink_url").alias("u")),
                )
            )
        ).alias("links")
    )
    anchors = F.concat_ws(
        "\n",
        F.transform(
            F.col("links"),
            lambda l: F.concat(F.lit('<a href="'), l["u"], F.lit('">'), l["u"], F.lit("</a>")),
        ),
    )
    html = F.concat(
        F.lit("<html><head><title>score="),
        F.col("page_score").cast("string"),
        F.lit("</title></head><body>\n"),
        anchors,
        F.lit("\n</body></html>"),
    )
    return links.select("page_url", "page_score", html.alias("html"))


def robots_table(spark: SparkSession, bodies: dict[str, str]) -> DataFrame:
    """``{robots_url: body}`` -> robots fixture (MockRobotsFetcher map)."""
    rows = [(u, b) for u, b in bodies.items()]
    return spark.createDataFrame(rows, ["robots_url", "body"])


def sitemaps_table(spark: SparkSession, entries: dict[str, list[str]]) -> DataFrame:
    """``{sitemap_url: [entry_url, ...]}`` -> sitemap fixture."""
    rows = [(s, e) for s, urls in entries.items() for e in urls]
    return spark.createDataFrame(rows, ["sitemap_url", "entry_url"])


def redirects_table(spark: SparkSession, redirects: dict[str, str]) -> DataFrame:
    """``{short_url: long_url}`` -> shortener-redirect fixture."""
    rows = list(redirects.items())
    return spark.createDataFrame(rows, ["short_url", "long_url"])
