"""Time-vs-size scaling exponents for the heaviest query families.

The sf0.1 bench cannot see a hidden O(n^2) constant; this harness can.
It generates self-consistent synthetic tables (same shape/distributions
as the driver's testdata: 31-token word-salad documents across 20
sources, 64-dim embeddings with 10 labels, lineitem-derived crawl
observations) at 1x / 5x / 10x the sf0.1 row counts — i.e. sf0.1 /
sf0.5 / sf1 equivalents — runs one representative query per family at
each size, and fits the least-squares exponent of log(time) on
log(size). ~1.0 = linear scale-out; the documented exact-pairs paths
(ppjoin on an adversarial 31-token vocabulary) are expected superlinear.

Usage: PYTHONPATH=. python tools/scaling_curves.py [--sizes 1,5,10]
Paste the table into SCALE.md.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query plan join shuffle stage task core disk read write "
    "merge spill skew cache row"
).split()  # 31 tokens, mirroring the driver corpus's vocabulary size

BASE_DOCS = 5_000  # sf0.1 row counts
BASE_VECS = 2_000
BASE_LINEITEM = 600_000
BASE_ORDERS = 150_000
BASE_EVENTS = 100_000  # sf0.1 events rows
BASE_USERS = 1_500
BASE_PART = 20_000


def gen_dir(spark, root: str, mult: int) -> str:
    out = os.path.join(root, f"x{mult}")
    # _DONE4: schema v4 adds the part table for the crawl-graph families
    # (crawl_reachability / hits / sssp derive their link graph from
    # p_partkey)
    if os.path.exists(os.path.join(out, "_DONE4")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    # documents: word salad, deterministic per doc_id; ~10% of docs are
    # near-copies of their predecessor (one word substituted) so the
    # near-dup families have real candidate structure at every size
    n_docs = BASE_DOCS * mult
    words = F.array(*[F.lit(w) for w in VOCAB])
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_words = (F.abs(F.hash("doc_id", F.lit(1))) % 70 + 10).alias("n_words")
    d = d.withColumn("n_words", n_words)
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.col("n_words")),
            lambda i: F.element_at(
                words, (F.abs(F.hash("doc_id", i)) % len(VOCAB)) + 1
            ),
        ),
    )
    # near-dup: doc_id % 10 == 1 copies doc_id-1's text with the first
    # word replaced
    prev = F.col("doc_id") - 1
    prev_n = F.abs(F.hash(prev, F.lit(1))) % 70 + 10
    prev_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), prev_n),
            lambda i: F.element_at(words, (F.abs(F.hash(prev, i)) % len(VOCAB)) + 1),
        ),
    )
    text = F.when(
        (F.col("doc_id") % 10 == 1) & (F.col("doc_id") > 0),
        F.concat(F.lit("dup "), F.substring_index(prev_text, " ", -200)),
    ).otherwise(base_text)
    docs = d.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "es", "fr", "und")]),
            (F.abs(F.hash("doc_id", F.lit(2))) % 5) + 1,
        ).alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # embeddings: 64-dim, 10 label clusters with per-label offset so
    # kmeans/PQ see real structure
    n_vecs = BASE_VECS * mult
    e = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    label = (F.abs(F.hash("vec_id", F.lit(3))) % 10).cast("int").alias("label")
    dims = F.sequence(F.lit(1), F.lit(64))
    emb = F.transform(
        dims,
        lambda i: (
            (F.abs(F.hash("vec_id", i)) % 1000) / F.lit(1000.0)
            + ((F.abs(F.hash(F.col("vec_id") % 10, i)) % 1000) / F.lit(500.0))
        ).cast("float"),
    )
    e.select("vec_id", emb.alias("embedding"), label).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    # lineitem: only the columns the crawl-family queries read
    n_li = BASE_LINEITEM * mult
    li = spark.range(n_li).select(
        (F.abs(F.hash("id", F.lit(3))) % (BASE_ORDERS * mult)).alias("l_orderkey"),
        (F.abs(F.hash("id", F.lit(4))) % 10_000).alias("l_suppkey"),
        (F.abs(F.hash("id", F.lit(5))) % 200_000).alias("l_partkey"),
        F.element_at(
            F.array(F.lit("R"), F.lit("A"), F.lit("N"), F.lit("N")),
            (F.abs(F.hash("id", F.lit(6))) % 4) + 1,
        ).alias("l_returnflag"),
        F.date_add(
            F.lit("1992-01-01").cast("date"), (F.abs(F.hash("id", F.lit(7))) % 2500)
        ).alias("l_shipdate"),
        ((F.abs(F.hash("id", F.lit(8))) % 50) + 1).cast("double").alias("l_quantity"),
        (((F.abs(F.hash("id", F.lit(9))) % 900_000) + 100) / F.lit(100.0)).alias(
            "l_extendedprice"
        ),
        ((F.abs(F.hash("id", F.lit(10))) % 11) / F.lit(100.0)).alias("l_discount"),
    )
    li.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    # orders: the columns the statistics families read (status, price,
    # date, priority) with the driver testdata's calendar span
    n_ord = BASE_ORDERS * mult
    o = spark.range(n_ord).select(
        F.col("id").alias("o_orderkey"),
        (F.abs(F.hash("id", F.lit(15))) % (BASE_USERS * 10 * mult)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("P"), F.lit("O"), F.lit("F")),
            (F.abs(F.hash("id", F.lit(11))) % 3) + 1,
        ).alias("o_orderstatus"),
        (((F.abs(F.hash("id", F.lit(12))) % 9_000_000) + 10_000) / F.lit(100.0)).alias(
            "o_totalprice"
        ),
        F.date_add(
            F.lit("1995-01-01").cast("date"), F.abs(F.hash("id", F.lit(13))) % 2400
        )
        .cast("timestamp")
        .alias("o_orderdate"),
        F.element_at(
            F.array(
                F.lit("1-URGENT"),
                F.lit("2-HIGH"),
                F.lit("3-MEDIUM"),
                F.lit("4-NOT SPECIFIED"),
                F.lit("5-LOW"),
            ),
            (F.abs(F.hash("id", F.lit(14))) % 5) + 1,
        ).alias("o_orderpriority"),
    )
    o.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))

    # events: the wave 25-33 families read (ts, user_id, event_type,
    # value); driver-testdata shape — 30 days of Jan 2024, 5 types,
    # users scale with rows (sf0.1: 100k rows / 1500 users)
    n_ev = BASE_EVENTS * mult
    ev = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_704_067_200) + F.abs(F.hash("id", F.lit(21))) % (30 * 86_400)
        ).alias("ts"),
        (F.abs(F.hash("id", F.lit(22))) % (BASE_USERS * mult)).alias("user_id"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("signup"),
                F.lit("purchase"), F.lit("error"),
            ),
            (F.abs(F.hash("id", F.lit(23))) % 5) + 1,
        ).alias("event_type"),
        ((F.abs(F.hash("id", F.lit(24))) % 100_000) / F.lit(1000.0)).alias("value"),
        F.lit('{"k":1}').alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    # part: the crawl-graph families derive their synthetic web graph
    # from p_partkey alone; keep the driver schema for column parity
    n_part = BASE_PART * mult
    p = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part#"), F.col("id").cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.abs(F.hash("id", F.lit(31))) % 5).cast("string")).alias("p_brand"),
        F.element_at(
            F.array(F.lit("STANDARD"), F.lit("SMALL"), F.lit("MEDIUM"), F.lit("LARGE")),
            (F.abs(F.hash("id", F.lit(32))) % 4) + 1,
        ).alias("p_type"),
        ((F.abs(F.hash("id", F.lit(33))) % 50) + 1).cast("int").alias("p_size"),
        (((F.abs(F.hash("id", F.lit(34))) % 200_000) + 90_000) / F.lit(100.0)).alias(
            "p_retailprice"
        ),
    )
    p.write.mode("overwrite").parquet(os.path.join(out, "part.parquet"))
    open(os.path.join(out, "_DONE4"), "w").write("ok")
    return out


# (label, query, size cap) — ppjoin is the DOCUMENTED exact-pairs path
# (zero-false-negative set similarity on an adversarial 31-token
# vocabulary where the prefix filter prunes little); it is expected
# ~quadratic here and LSH is the linear-scale alternative, so it runs
# capped to keep the harness bounded.
FAMILIES = [
    ("merge-lattice", "crawl_merge_lattice", None),
    ("frontier", "frontier_topk", None),
    ("minhash/LSH", "near_dup_clusters", None),
    ("ppjoin", "ppjoin_pairs", 2),
    ("PQ/ADC", "ann_topk_pq_adc", None),
    # r5 wave: HOF entropy (shuffle-free scan) + bigram LM (two corpus
    # aggs + keyed joins) — both should fit ~linear
    ("entropy-HOF", "doc_entropy_score", None),
    ("bigram-LM", "ccnet_bigram_nll", None),
    # r5 waves 9-12: trigram LM (5 n-gram-key joins), BM25 (filtered tf
    # + broadcast df), PPS prefix sum (two-phase), distributed ntile
    # rank, and the greedy facility loop (K fixed scans) — all expected
    # ~linear
    ("trigram-LM", "stupid_backoff_score", None),
    ("BM25", "bm25_search_topk", None),
    ("pps-prefix", "systematic_pps_sample", None),
    ("dist-rank", "length_bucket_packing", None),
    ("facility-greedy", "facility_location_select", None),
    # r5 waves 17-24: value-domain prefix-sum statistics (KS/AUC ride
    # distributed_keyed_running_sum), shingle-keyed corpus weights,
    # NB training aggregates, the distributed-rank gains table — all
    # expected ~linear. The exact pair paths (threshold sweep's
    # shared-shingle join on the adversarial 31-token vocabulary,
    # margin-MNN's labeled all-pairs fallback) are expected
    # superlinear and run capped, like ppjoin — LSH/ANN buckets are
    # their documented scale path.
    ("ks-prefix", "ks_two_sample_price", None),
    ("auc-prefix", "auc_urgent_by_price", None),
    ("softdedup", "softdedup_loss_weights", None),
    ("novelty", "ngram_novelty_score", None),
    ("nb-train", "naive_bayes_lang_classify", None),
    ("lift-rank", "lift_gains_deciles", None),
    ("sweep-exact", "near_dup_threshold_sweep", 2),
    ("mnn-exact", "margin_mnn_pairs", 2),
    # r6 (verdict task 6): EVERY wave 25-33 query gets a measured
    # exponent — distributed-rank order statistics (winsorize /
    # conformal / SLO percentiles), event-time session & attribution
    # windows, day-grain prefix sums, Markov / neighbor-set joins,
    # constant-size moment aggregates (SRM, Shapley, McNemar, CUPED,
    # Simpson) — all expected ~linear (scan-dominated for the
    # constant-state aggregates); coverage-curve measured after the r6
    # single-pass-aggregate fix.
    ("minhash-calib", "minhash_estimate_calibration", None),
    ("winsorize-rank", "winsorized_mean_price", None),
    ("roll-band", "rolling_quantile_band_alarms", None),
    ("ql-lm", "query_likelihood_retrieval", None),
    ("link-pred", "graph_jaccard_link_prediction", None),
    ("simpson", "simpson_paradox_check", None),
    ("zipf", "zipf_fit_slope", None),
    ("burstiness", "user_burstiness_index", None),
    ("fano", "fano_factor_daily", None),
    ("coverage-curve", "coverage_budget_curve", None),
    ("markov-rate", "entropy_rate_markov", None),
    ("survivor", "dedup_survivor_quality", None),
    ("conformal-rank", "conformal_prediction_interval", None),
    ("cuped", "cuped_variance_reduction", None),
    ("mcnemar", "mcnemar_gate_test", None),
    ("shapley", "shapley_two_feature", None),
    ("worst-group", "worst_group_metric", None),
    ("srm-gate", "ab_srm_check", None),
    ("gap-sens", "session_gap_sensitivity", None),
    ("attribution", "purchase_attribution_models", None),
    ("stickiness", "dau_mau_stickiness", None),
    ("slo-rank", "slo_latency_report", None),
    ("burn-prefix", "error_budget_burn", None),
    # r7 (round-6 verdict task 3): the bench's top-20 queries not yet
    # covered by a family — validate every documented exponent at x5/x10
    # before trusting it at 100 TB. Streaming families measure the
    # whole replay (SS startup floor amortizes with size, so their
    # fitted exponent UNDERSTATES the asymptote at small x; the x5→x10
    # ratio is the number to read). ann_recall_report contains the
    # guarded brute-force ground-truth pass — documented exact path,
    # capped like ppjoin.
    ("crawl-ticks", "crawl_reachability", None),
    ("sssp", "sssp_bellman_ford", None),
    ("hits", "hits_hub_authority", None),
    ("ann-recall", "ann_recall_report", 2),
    ("bucketed-state", "bucketed_state_merge", None),
    ("ccnet-ppl", "ccnet_perplexity_buckets", None),
    ("dedup-calib", "quality_dedup_calibration", None),
    ("curation", "curation_funnel", None),
    ("rrf", "rrf_rank_fusion", None),
    ("cms", "cms_heavy_hitters", None),
    ("warc-rt", "warc_sink_source_roundtrip", None),
    ("w-median", "weighted_median_price", None),
    ("stream-agg", "stream_window_counts_append", None),
    ("stream-join", "stream_stream_left_join", None),
    ("stream-urldb", "stream_url_db_merge", None),
    # r8 session-2: the collapse-then-score rewrites — expected
    # SUBLINEAR in corpus size (their hash/explode work scales with
    # DISTINCT words/keys, which the fixed 31-token vocabulary pins
    # nearly constant while the token stream grows linearly; on a
    # natural corpus distinct grows ~sqrt) plus the linear count agg.
    ("bpe-pairs", "bpe_merge_candidates", None),
    ("theil-sen", "theil_sen_trend", None),
]


def main():
    sizes = [1, 5, 10]
    only: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--only"):
            only = a.split("=", 1)[1].split(",")

    from flink_crawler_spark.queries import REGISTRY
    from flink_crawler_spark.session import get_spark

    spark = get_spark("scaling-curves")
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/scale_curves"
    dirs = {m: gen_dir(spark, root, m) for m in sizes}

    # warm
    spark.read.parquet(os.path.join(dirs[sizes[0]], "documents.parquet")).count()

    # capped families fall back to [1, min(cap, 2)] — always have those dirs
    need = sorted({m for m in sizes} | {1, 2})
    dirs.update({m: gen_dir(spark, root, m) for m in need if m not in dirs})

    families = [
        f for f in FAMILIES if only is None or f[0] in only or f[1] in only
    ]
    results: dict[str, dict[int, float]] = {}
    for fam, qname, cap in families:
        fn = REGISTRY[qname].fn
        fam_sizes = [m for m in sizes if cap is None or m <= cap] or [1, 2]
        if cap is not None and len(fam_sizes) < 2:
            fam_sizes = [1, min(cap, 2)]
        results[fam] = {}
        for m in fam_sizes:
            t0 = time.time()
            # noop sink, not count(): count lets Catalyst prune a pure
            # projection's columns, timing only the scan — the
            # entropy-HOF family would read as flat regardless of its
            # real expression cost. (Not localCheckpoint either: that
            # PINS every measured result's RDD blocks for the rest of
            # the run, so late families would be timed under
            # accumulated memory pressure.)
            fn(spark, dirs[m]).write.format("noop").mode("overwrite").save()
            results[fam][m] = round(time.time() - t0, 2)
            spark.catalog.clearCache()
            # the memoized family builders (shingle base, cluster
            # assignment, bigram LM, merged crawl state) would otherwise
            # let a later family time a CACHE HIT as its scaling point —
            # every measured run must pay its query's full cost
            from flink_crawler_spark.queries.base import clear_query_caches

            clear_query_caches()

    all_sizes = sorted({m for r in results.values() for m in r})
    print(
        f"\n{'family':<14}{'query':<24}"
        + "".join(f"x{m:<7}" for m in all_sizes)
        + "exponent"
    )
    for fam, qname, _cap in families:
        ts = results[fam]
        ms = sorted(ts)
        if len(ms) < 2:
            row = "".join(f"{ts.get(m, '-'):<8}" for m in all_sizes)
            print(f"{fam:<14}{qname:<24}{row}-")
            continue
        xs = [math.log(m) for m in ms]
        ys = [math.log(max(ts[m], 1e-3)) for m in ms]
        mx = sum(xs) / len(xs)
        my = sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        row = "".join(f"{ts.get(m, '-'):<8}" for m in all_sizes)
        print(f"{fam:<14}{qname:<24}{row}{slope:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
