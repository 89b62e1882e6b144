"""Robots.txt checking as a dimension-join.

Reference: ``functions/CheckUrlWithRobotsFunction.java:43-246`` — async
per-host robots fetch+parse with a TTL cache, emitting a 3-way split:
blocked (SKIPPED_BLOCKED rows), passed (FetchUrl + resolved crawl
delay), and sitemap URLs advertised by robots.

Spark-first re-architecture: the robots *cache* becomes a rules
dimension table keyed by host root. Parsing (tiny table, text-heavy)
runs once in an Arrow-vectorized UDF; rule *evaluation* over the big
frontier stays JVM-side — a broadcast join plus array higher-order
functions, no per-URL Python. The 3-way SplitStream (CTB:300-321)
becomes one ``route`` column + three filters.

Allow/deny uses Google-style longest-match (most specific rule wins,
allow breaks ties) like crawler-commons' SimpleRobotRules.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_CRAWL_DELAY_MS = 10_000  # CrawlTopologyBuilder.java:93
DEFERRED_RETRY_MS = 3_600_000  # retry blocked/deferred hosts after 1 h

RULES_SCHEMA = T.StructType(
    [
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("allow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.LongType(), True),
        T.StructField("sitemaps", T.ArrayType(T.StringType()), False),
    ]
)


def parse_robots_txt(body: str, agent: str = "flink-crawler") -> dict:
    """Parse a robots.txt body into prefix rules.

    Honors User-agent grouping (exact agent-token match beats ``*``),
    Disallow/Allow prefixes, Crawl-delay, and global Sitemap directives.
    """
    agent = agent.lower()
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    sitemaps: list[str] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_allow, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_allow, cur_delay))
        cur_agents, cur_dis, cur_allow, cur_delay = [], [], [], None

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
                in_group_body = False
            cur_agents.append(value.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            in_group_body = True
            if key == "disallow":
                if value:
                    cur_dis.append(value)
            elif key == "allow":
                if value:
                    cur_allow.append(value)
            else:
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
        elif key == "sitemap":
            if value:
                sitemaps.append(value)
    flush()

    def pick(match_exact: bool):
        for agents, dis, allow, delay in groups:
            for a in agents:
                if (match_exact and a != "*" and a in agent) or (not match_exact and a == "*"):
                    return dis, allow, delay
        return None

    picked = pick(True) or pick(False) or ([], [], None)
    dis, allow, delay = picked
    return {
        "disallow": dis,
        "allow": allow,
        "crawl_delay_ms": int(delay * 1000) if delay is not None else None,
        "sitemaps": sitemaps,
    }


def parse_robots_rules(robots: DataFrame, agent: str = "flink-crawler") -> DataFrame:
    """robots fixture/crawled table ``(robots_url, body)`` -> rules dim table.

    ``host_root`` is ``scheme://host[:port]`` — the reference's cache key
    (``CheckUrlWithRobotsFunction.java:100-115`` keys by
    ``getUrlWithoutPath()``).
    """

    @F.pandas_udf(RULES_SCHEMA)
    def parse_udf(bodies: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_txt(b, agent) for b in bodies]
        return pd.DataFrame(parsed)

    host_root = F.regexp_extract(F.col("robots_url"), r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    return robots.select(
        host_root.alias("host_root"), parse_udf(F.col("body")).alias("r")
    ).select("host_root", "r.disallow", "r.allow", "r.crawl_delay_ms", "r.sitemaps")


def host_root_expr(url: Column) -> Column:
    return F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)


def path_expr(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return F.when(p == "", "/").otherwise(p)


def _rule_hit_len(path: Column, p) -> Column:
    """Per-rule match length under RFC 9309 pattern semantics: ``*``
    matches any char run, a trailing ``$`` anchors the end, everything
    else is literal; specificity = rule length (crawler-commons'
    ``SimpleRobotRules`` `_prefixLength` convention, the parser the
    reference uses — CheckUrlWithRobotsFunction.java:27,55). Rules with
    neither metachar stay on the cheap ``startswith`` path; pattern
    rules compile to an anchored regex built from the rule itself."""
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    pat = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    simple = (~p.contains("*")) & (~anchored)
    hit = F.when(simple, path.startswith(p)).otherwise(F.regexp_like(path, pat))
    return F.when(hit, F.length(p)).otherwise(F.lit(0))


def _longest_match(prefixes: Column, path: Column) -> Column:
    """Length of the most specific (longest) rule matching ``path``
    (0 if none), wildcard/anchor-aware via ``_rule_hit_len``."""
    return F.aggregate(
        F.coalesce(prefixes, F.array()),
        F.lit(0),
        lambda acc, p: F.greatest(acc, _rule_hit_len(path, p)),
    )


def check_urls_against_robots(
    frontier: DataFrame,
    rules: DataFrame,
    *,
    force_crawl_delay_ms: int | None = None,
    default_crawl_delay_ms: int = DEFAULT_CRAWL_DELAY_MS,
) -> DataFrame:
    """Route each frontier URL: ``blocked`` | ``passed`` (+crawl delay).

    Broadcast join on host root (the rules table is tiny relative to the
    frontier — one row per host). Missing rules row == no robots.txt ==
    allow-all (404 => allow, ``CheckUrlWithRobotsFunction.java:186-199``).

    Crawl-delay resolution: forced > robots > default (``:206-213``).
    """
    f = frontier.withColumn("__host_root", host_root_expr(F.col("url")))
    joined = f.join(F.broadcast(rules), f["__host_root"] == rules["host_root"], "left")

    path = path_expr(F.col("url"))
    dis_len = _longest_match(F.col("disallow"), path)
    allow_len = _longest_match(F.col("allow"), path)
    blocked = F.col("host_root").isNotNull() & (dis_len > allow_len) & (dis_len > 0)

    if force_crawl_delay_ms is not None:
        delay = F.lit(force_crawl_delay_ms)
    else:
        delay = F.coalesce(F.col("crawl_delay_ms"), F.lit(default_crawl_delay_ms))

    return joined.select(
        *[f[c] for c in frontier.columns],
        F.when(blocked, "blocked").otherwise("passed").alias("route"),
        delay.alias("crawl_delay_ms"),
    )


ROBOTS_TTL_MS = {  # per-status rules-cache TTL (CheckUrlWithRobotsFunction.java:186-199)
    "ok": 12 * 3_600_000,  # 200 -> 12 h
    "missing": 24 * 3_600_000,  # 404 -> 24 h (allow-all)
    "error": 1 * 3_600_000,  # 5xx -> 1 h (defer)
}


def refresh_robots_cache(
    cache: DataFrame,
    hosts_needed: DataFrame,
    *,
    fetcher,
    now_ms: int,
    agent: str = "flink-crawler",
) -> DataFrame:
    """Maintain the robots rules cache TABLE with per-status TTLs.

    The reference keeps an in-memory per-operator cache with TTL expiry
    (A1); set-based, the cache is a table with an ``expires_at`` column:
    expired/missing hosts are (re)fetched via the injected fetcher and
    merged back — everything else is reused.

    ``cache``: rules columns + fetch_status + fetched_at + expires_at.
    ``hosts_needed``: one ``host_root`` per distinct frontier host.
    ``fetcher(robots_url) -> (http_status, body_bytes, content_type)``.
    """
    schema = T.StructType(
        [
            T.StructField("host_root", T.StringType()),
            T.StructField("disallow", T.ArrayType(T.StringType())),
            T.StructField("allow", T.ArrayType(T.StringType())),
            T.StructField("crawl_delay_ms", T.LongType()),
            T.StructField("sitemaps", T.ArrayType(T.StringType())),
            T.StructField("fetch_status", T.StringType()),
            T.StructField("fetched_at", T.LongType()),
            T.StructField("expires_at", T.LongType()),
        ]
    )

    fresh = cache.filter(F.col("expires_at") > F.lit(now_ms)).select(
        *[f.name for f in schema.fields]
    )
    stale_hosts = hosts_needed.join(
        F.broadcast(fresh.select("host_root")), "host_root", "left_anti"
    ).distinct()

    def fetch_partition(batches):
        for pdf in batches:
            out = []
            for host_root in pdf["host_root"]:
                try:
                    # (code, body, ctype) or http_fetch's 4-tuple with a
                    # trailing redirect Location — both fetcher shapes work
                    res = fetcher(host_root + "/robots.txt")
                    code, body = res[0], res[1]
                except Exception:
                    code, body = 500, b""
                if code == 200:
                    status, ttl = "ok", ROBOTS_TTL_MS["ok"]
                    text = body.decode("utf-8", errors="replace")
                elif code == 404:
                    status, ttl = "missing", ROBOTS_TTL_MS["missing"]
                    text = ""  # no robots -> allow-all
                else:
                    status, ttl = "error", ROBOTS_TTL_MS["error"]
                    text = "User-agent: *\nDisallow: /"  # defer until retry
                parsed = parse_robots_txt(text, agent)
                out.append(
                    {
                        "host_root": host_root,
                        "disallow": parsed["disallow"],
                        "allow": parsed["allow"],
                        "crawl_delay_ms": parsed["crawl_delay_ms"],
                        "sitemaps": parsed["sitemaps"],
                        "fetch_status": status,
                        "fetched_at": now_ms,
                        "expires_at": now_ms + ttl,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    new_rows = stale_hosts.select("host_root").mapInPandas(fetch_partition, schema)
    return fresh.unionByName(new_rows)


def robots_sitemap_urls(rules: DataFrame) -> DataFrame:
    """Sitemap URLs advertised by robots (the ``sitemap`` split of F3)."""
    return rules.select(F.explode("sitemaps").alias("url")).distinct()


def blocked_status_updates(routed: DataFrame, *, now_ms: int) -> DataFrame:
    """Blocked rows -> SKIPPED_BLOCKED crawl-state observations that retry
    after DEFERRED_RETRY_MS (``CheckUrlWithRobotsFunction.java:201-232``)."""
    # per-tick call: two py4j round-trips instead of ~12 (r13, guide §1.2)
    return routed.where("route = 'blocked'").selectExpr(
        "url",
        "pld",
        "'SKIPPED_BLOCKED' AS status",
        f"CAST({int(now_ms)} AS BIGINT) AS status_time",
        "score",
        f"CAST({int(now_ms + DEFERRED_RETRY_MS)} AS BIGINT) AS next_fetch_time",
    )
