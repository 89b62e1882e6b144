"""flink_crawler_spark — a PySpark-native engine with the query and
data-processing capabilities of ScaleUnlimited/flink-crawler.

Not a port: the reference (Flink DataStream, Java) is re-expressed as
idiomatic Spark — DataFrame/SQL logical plans optimized by Catalyst, a
driver-side micro-batch crawl loop replacing Flink's IterativeStream,
Pandas-UDF/mapInPandas for the effectful stages, and Structured
Streaming as the continuous-mode wrapper.

Layout:
    schemas      — StructTypes for every record family (reference POJOs)
    session      — SparkSession factory tuned for local[N] + cluster scale
    functions/   — scalar layer: URL normalize/validate/PLD, text analysis
    operators/   — relational core: merge lattice, frontier top-k, windows,
                   dedup, similarity
    sources/     — seeds, mock web-graph fetcher, WARC sink
    plans/       — the crawl loop (driver-side iteration)
    streaming/   — Structured Streaming wrapper
    queries/     — declared (spark, oracle_sql) query pairs for the
                   correctness gate
"""

__version__ = "0.1.0"
