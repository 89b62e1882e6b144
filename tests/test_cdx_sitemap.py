"""SURT/CDX lookup and real sitemap-XML parsing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.commoncrawl import cdx_lookup, surt_key_expr
from flink_crawler_spark.operators.parse import parse_sitemap_xml_body


def test_surt_key_canonicalization(spark):
    urls = [
        "http://www.Example.com/A/b?q=1",
        "https://example.com:443/A/b?q=1",
        "http://example.com:8080/x",
        "http://sub.example.co.uk/",
        "http://example.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r["url"]: r["k"] for r in df.select("url", surt_key_expr(F.col("url")).alias("k")).collect()}
    # www + default ports collapse to the same key; case folds
    assert got["http://www.Example.com/A/b?q=1"] == "com,example)/a/b?q=1"
    assert got["https://example.com:443/A/b?q=1"] == "com,example)/a/b?q=1"
    assert got["http://example.com:8080/x"] == "com,example:8080)/x"
    assert got["http://sub.example.co.uk/"] == "uk,co,example,sub)/"
    assert got["http://example.com"] == "com,example)/"


def test_cdx_lookup_hits_and_misses(spark):
    frontier = spark.createDataFrame(
        [("http://www.a.com/p",), ("http://b.com/q",)], ["url"]
    )
    idx = spark.createDataFrame([("com,a)/p", 7)], ["surt_key", "segment"])
    got = {r["url"]: r["segment"] for r in cdx_lookup(frontier, idx).collect()}
    assert got["http://www.a.com/p"] == 7  # www-variant finds the archive copy
    assert got["http://b.com/q"] is None  # miss -> 404 path


SITEMAP_XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.com/1</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> http://a.com/2 </loc></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.com/sub.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_xml_body_variants():
    assert parse_sitemap_xml_body(SITEMAP_XML) == ["http://a.com/1", "http://a.com/2"]
    # nested index: logged-not-followed (ParseSiteMapFunction.java:38-44)
    assert parse_sitemap_xml_body(SITEMAP_INDEX) == []
    # plain-text sitemap
    assert parse_sitemap_xml_body("http://a.com/x\n# no\nhttp://a.com/y\n") == [
        "http://a.com/x", "http://a.com/y",
    ]
    assert parse_sitemap_xml_body("") == []
    assert parse_sitemap_xml_body("<broken<xml>") == []


# ---------------------------------------------------------------------------
# Archive byte-range fetch (CommonCrawlFetcher flow, local file:// archive)
# ---------------------------------------------------------------------------

def _build_archive(tmp_path, pages):
    """pages: [(url, http_status, headers, body)] -> (archive_path, cdx rows).

    Concatenated gzip members, exactly like a CommonCrawl WARC file; the
    CDX rows carry (url, filename, warc_offset, warc_length, mime).
    """
    from flink_crawler_spark.operators.commoncrawl import warc_response_record

    path = str(tmp_path / "segment-00000.warc.gz")
    rows, offset = [], 0
    with open(path, "wb") as f:
        for url, status, headers, body in pages:
            member = warc_response_record(url, status, headers, body)
            f.write(member)
            rows.append((url, path, offset, len(member), headers.get("Content-Type", ""), status))
            offset += len(member)
    return path, rows


def _cdx_df(spark, rows):
    from flink_crawler_spark.operators.commoncrawl import surt_key_expr

    df = spark.createDataFrame(
        rows,
        "url string, filename string, warc_offset long, warc_length long, mime string, cdx_status int",
    )
    return df.select(surt_key_expr(F.col("url")).alias("surt_key"),
                     "filename", "warc_offset", "warc_length", "mime", "cdx_status")


def test_archive_fetch_hit_miss_and_redirect(spark, tmp_path):
    from flink_crawler_spark.operators.commoncrawl import archive_fetch

    pages = [
        ("http://a.example.com/page", 200, {"Content-Type": "text/html"}, b"<html>hello</html>"),
        ("http://b.example.com/old", 301, {"Location": "http://a.example.com/page"}, b""),
        ("http://c.example.com/loop", 302, {"Location": "http://c.example.com/loop"}, b""),
    ]
    _, cdx_rows = _build_archive(tmp_path, pages)
    cdx = _cdx_df(spark, cdx_rows)
    frontier = spark.createDataFrame(
        [("http://a.example.com/page",), ("http://b.example.com/old",),
         ("http://missing.example.com/",), ("http://c.example.com/loop",)], ["url"]
    )
    got = {r["url"]: r for r in archive_fetch(frontier, cdx, max_redirects=2, now_ms=1000).collect()}
    assert got["http://a.example.com/page"]["status"] == "FETCHED"
    assert bytes(got["http://a.example.com/page"]["content"]) == b"<html>hello</html>"
    # 301 followed through a second CDX lookup to the target page
    assert got["http://b.example.com/old"]["status"] == "FETCHED"
    assert got["http://b.example.com/old"]["fetched_url"] == "http://a.example.com/page"
    # CDX miss -> 404 (CommonCrawlFetcher.java:166-170)
    assert got["http://missing.example.com/"]["status"] == "HTTP_NOT_FOUND"
    # self-redirect exhausts the hop budget
    assert got["http://c.example.com/loop"]["status"] == "HTTP_TOO_MANY_REDIRECTS"


def test_archive_fetch_redirect_modes_and_mime(spark, tmp_path):
    from flink_crawler_spark.operators.commoncrawl import archive_fetch

    pages = [
        ("http://a.example.com/perm", 301, {"Location": "http://a.example.com/t"}, b""),
        ("http://a.example.com/temp", 302, {"Location": "http://a.example.com/t"}, b""),
        ("http://a.example.com/see", 303, {"Location": "http://a.example.com/t"}, b""),
        ("http://a.example.com/t", 200, {"Content-Type": "text/html"}, b"<html>t</html>"),
        ("http://a.example.com/img", 200, {"Content-Type": "image/png"}, b"\x89PNG"),
    ]
    _, cdx_rows = _build_archive(tmp_path, pages)
    cdx = _cdx_df(spark, cdx_rows)
    frontier = spark.createDataFrame(
        [("http://a.example.com/perm",), ("http://a.example.com/temp",),
         ("http://a.example.com/see",), ("http://a.example.com/img",)], ["url"]
    )
    # FOLLOW_TEMP: temp redirect followed, permanent reported as moved,
    # 303 See Other disallowed (reference SEE_OTHER_DISALLOWED ->
    # HTTP_REDIRECTION_ERROR)
    got = {r["url"]: r for r in archive_fetch(
        frontier, cdx, redirect_mode="FOLLOW_TEMP", accept_mime=("text/html",), now_ms=1
    ).collect()}
    assert got["http://a.example.com/perm"]["status"] == "HTTP_MOVED_PERMANENTLY"
    assert got["http://a.example.com/temp"]["status"] == "FETCHED"
    assert got["http://a.example.com/see"]["status"] == "HTTP_REDIRECTION_ERROR"
    # 200 with unacceptable mime aborts before any byte-range read
    assert got["http://a.example.com/img"]["status"] == "ABORTED_INVALID_MIMETYPE"

    # FOLLOW_NONE: every redirect refused
    got2 = {r["url"]: r for r in archive_fetch(
        frontier, cdx, redirect_mode="FOLLOW_NONE", now_ms=1
    ).collect()}
    assert got2["http://a.example.com/perm"]["status"] == "HTTP_MOVED_PERMANENTLY"
    assert got2["http://a.example.com/temp"]["status"] == "HTTP_REDIRECTION_ERROR"
    assert got2["http://a.example.com/see"]["status"] == "HTTP_REDIRECTION_ERROR"

    # FOLLOW_ALL chases 303 like any other redirect
    got3 = {r["url"]: r for r in archive_fetch(
        frontier, cdx, redirect_mode="FOLLOW_ALL", now_ms=1
    ).collect()}
    assert got3["http://a.example.com/see"]["status"] == "FETCHED"
    assert got3["http://a.example.com/see"]["fetched_url"] == "http://a.example.com/t"


def test_warc_member_roundtrip(tmp_path):
    from flink_crawler_spark.operators.commoncrawl import (
        local_range_reader,
        parse_warc_member,
        warc_response_record,
    )

    m1 = warc_response_record("http://x/1", 200, {"Content-Type": "text/html"}, b"AA")
    m2 = warc_response_record("http://x/2", 404, {}, b"")
    path = str(tmp_path / "seg.warc.gz")
    with open(path, "wb") as f:
        f.write(m1)
        f.write(m2)
    # ranged read of the SECOND member only (offset past member 1)
    status, headers, body = parse_warc_member(local_range_reader(path, len(m1), len(m2)))
    assert status == 404 and body == b""
    status1, headers1, body1 = parse_warc_member(local_range_reader(path, 0, len(m1)))
    assert status1 == 200 and body1 == b"AA" and headers1["content-type"] == "text/html"


# ---------------------------------------------------------------------------
# CrawlTool -commoncrawl mode: the archive fetcher plugged into the full
# crawl loop through the fetch_fn seam, plus the SegmentCache analogue
# ---------------------------------------------------------------------------


def _cc_dir(spark, tmp_path):
    """A tiny crawlable archive: root links to /a and /b; /a links out."""
    import os

    root = "http://cc.example.com/"
    a, b, c = (f"http://cc.example.com/{x}" for x in "abc")
    html = {
        root: f'<html><body><a href="{a}">a</a> <a href="{b}">b</a></body></html>',
        a: f'<html><body><a href="{c}">c</a></body></html>',
        b: "<html><body>leaf</body></html>",
        c: "<html><body>deep leaf</body></html>",
    }
    cc = tmp_path / "cc"
    os.makedirs(cc)
    path, rows = _build_archive(
        cc, [(u, 200, {"Content-Type": "text/html"}, h.encode()) for u, h in html.items()]
    )
    # store filenames relative to the archive dir (how a CDX names segments)
    rel_rows = [(u, os.path.basename(f), o, l, m, s) for (u, f, o, l, m, s) in rows]
    _cdx_df(spark, rel_rows).write.mode("overwrite").parquet(str(cc / "cdx.parquet"))
    return str(cc), root


def test_commoncrawl_fetch_fn_drives_crawl_loop(spark, tmp_path):
    from flink_crawler_spark.operators.commoncrawl import commoncrawl_fetch_fn
    from flink_crawler_spark.plans.crawl_loop import CrawlConfig, crawl

    cc, root = _cc_dir(spark, tmp_path)
    cdx = spark.read.parquet(cc + "/cdx.parquet")
    cache = str(tmp_path / "segcache")
    fetch_fn = commoncrawl_fetch_fn(cdx, cc, cache_dir=cache)
    seeds = spark.createDataFrame([(root, 1.0)], ["url", "score"])
    res = crawl(spark, seeds, fetch_fn=fetch_fn, config=CrawlConfig(max_ticks=5))
    st = {r["url"]: r["status"] for r in res.crawl_state.collect()}
    assert st[root] == "FETCHED"
    assert st["http://cc.example.com/a"] == "FETCHED"
    assert st["http://cc.example.com/c"] == "FETCHED", "outlink chain through the archive"
    # SegmentCache: the segment was copied into the cache dir exactly once
    import os

    entries = os.listdir(cache)
    # cache key = md5(full path) prefix + basename (collision-proof for
    # equal basenames in different segment dirs)
    assert len(entries) == 1 and entries[0].endswith("-segment-00000.warc.gz")


def test_cli_commoncrawl_mode(spark, tmp_path):
    """CrawlTool parity: --commoncrawl DIR --cachedir ... end-to-end
    through the argparse main(), no --pages needed."""
    from flink_crawler_spark import cli

    cc, root = _cc_dir(spark, tmp_path)
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(f"# cc seeds\n{root}\n")
    out = str(tmp_path / "state_out")
    rc = cli.main([
        "--seedurls", str(seeds),
        "--commoncrawl", cc,
        "--cachedir", str(tmp_path / "cache2"),
        "--maxticks", "5",
        "--stateout", out,
    ])
    assert rc == 0
    st = {r["url"]: r["status"] for r in spark.read.parquet(out).collect()}
    assert st[root] == "FETCHED"
    assert st["http://cc.example.com/c"] == "FETCHED"


def test_crawl_requires_exactly_one_fetch_source(spark):
    import pytest as _pytest

    from flink_crawler_spark.plans.crawl_loop import crawl

    seeds = spark.createDataFrame([("http://x.com/", 1.0)], ["url", "score"])
    with _pytest.raises(ValueError):
        crawl(spark, seeds)


def test_archive_fetch_many_redirects_set_based(spark, tmp_path):
    """A redirect-heavy batch (every URL redirects, multi-hop chains)
    resolves entirely set-based — redirect routing is column logic plus
    an executor-side urljoin, with no per-row driver round-trip
    (CommonCrawlFetcher.java:135-196 semantics)."""
    from flink_crawler_spark.operators.commoncrawl import archive_fetch

    pages = []
    # 20 independent 3-hop chains: /h0-i -> /h1-i -> /h2-i -> /final-i,
    # with relative Location headers to exercise executor-side urljoin
    for i in range(20):
        pages.append((f"http://m.example.com/h0-{i}", 302, {"Location": f"h1-{i}"}, b""))
        pages.append((f"http://m.example.com/h1-{i}", 301, {"Location": f"/h2-{i}"}, b""))
        pages.append((f"http://m.example.com/h2-{i}", 307,
                      {"Location": f"http://m.example.com/final-{i}"}, b""))
        pages.append((f"http://m.example.com/final-{i}", 200,
                      {"Content-Type": "text/html"}, f"<html>{i}</html>".encode()))
    _, cdx_rows = _build_archive(tmp_path, pages)
    cdx = _cdx_df(spark, cdx_rows)
    frontier = spark.createDataFrame(
        [(f"http://m.example.com/h0-{i}",) for i in range(20)], ["url"]
    )
    got = {r["url"]: r for r in archive_fetch(frontier, cdx, max_redirects=3, now_ms=1).collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[f"http://m.example.com/h0-{i}"]
        assert r["status"] == "FETCHED"
        assert r["fetched_url"] == f"http://m.example.com/final-{i}"
        assert bytes(r["content"]) == f"<html>{i}</html>".encode()


# ---------------------------------------------------------------------------
# r7 (round-6 verdict task 6): the CDX byte-range path over REAL sockets —
# the CommonCrawlFetcherIT analogue. A loopback HTTP server serves the WARC
# segment with Range support; http_range_reader must produce byte-identical
# results to the file-path reader, in both ranged and SegmentCache modes,
# and degrade safely when the server ignores Range.
# ---------------------------------------------------------------------------


def _serve_dir(directory, *, honor_range=True):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            import os

            path = os.path.join(directory, self.path.lstrip("/"))
            if not os.path.isfile(path):
                self.send_response(404)
                self.end_headers()
                return
            data = open(path, "rb").read()
            rng = self.headers.get("Range")
            if honor_range and rng and rng.startswith("bytes="):
                lo, hi = rng[len("bytes="):].split("-")
                lo, hi = int(lo), int(hi)
                chunk = data[lo : hi + 1]
                self.send_response(206)
                self.send_header("Content-Range", f"bytes {lo}-{hi}/{len(data)}")
            else:
                chunk = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(chunk)))
            self.end_headers()
            self.wfile.write(chunk)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, f"http://127.0.0.1:{httpd.server_port}"


def test_http_range_reader_byte_identical_to_file_reader(spark, tmp_path):
    import os

    from flink_crawler_spark.operators.commoncrawl import (
        archive_fetch,
        http_range_reader,
        local_range_reader,
    )

    pages = [
        ("http://x.com/a", 200, {"Content-Type": "text/html"}, b"<html>alpha</html>"),
        ("http://x.com/b", 200, {"Content-Type": "text/html"}, b"<html>beta</html>"),
        ("http://x.com/r", 302, {"Location": "http://x.com/b"}, b""),
    ]
    path, rows = _build_archive(tmp_path, pages)
    rel_rows = [(u, os.path.basename(f), o, l, m, s) for (u, f, o, l, m, s) in rows]
    cdx = _cdx_df(spark, rel_rows)
    frontier = spark.createDataFrame(
        [("http://x.com/a",), ("http://x.com/r",), ("http://x.com/miss",)], ["url"]
    )

    def run(reader):
        out = archive_fetch(
            frontier, cdx, range_reader=reader, max_redirects=2, now_ms=1
        ).collect()
        return {
            r["url"]: (r["status"], r["fetched_url"], bytes(r["content"]) if r["content"] else None)
            for r in out
        }

    # local file baseline (filenames are relative — resolve against tmp_path)
    def local(filename, offset, length):
        return local_range_reader(os.path.join(str(tmp_path), filename), offset, length)

    want = run(local)
    assert want["http://x.com/a"][0] == "FETCHED"
    assert want["http://x.com/r"] == ("FETCHED", "http://x.com/b", b"<html>beta</html>")
    assert want["http://x.com/miss"][0] == "HTTP_NOT_FOUND"

    httpd, base = _serve_dir(str(tmp_path))
    try:
        # ranged-GET mode: one HTTP request per member read
        assert run(http_range_reader(base)) == want
        # SegmentCache mode: whole-segment download, ranges served locally
        cache = str(tmp_path / "httpcache")
        assert run(http_range_reader(base, cache_dir=cache)) == want
        entries = os.listdir(cache)
        assert len(entries) == 1 and entries[0].endswith("-segment-00000.warc.gz")
    finally:
        httpd.shutdown()

    # a server that ignores Range (plain 200): reader slices locally,
    # results still byte-identical
    httpd2, base2 = _serve_dir(str(tmp_path), honor_range=False)
    try:
        assert run(http_range_reader(base2)) == want
    finally:
        httpd2.shutdown()


# ---------------------------------------------------------------------------
# r8 (round-7 verdict task 7): the s3a:// seam — SeedUrlSource.java:184-248
# and fetcher/commoncrawl/S3Utils.java read seeds/CDX/segments from S3;
# S3's GET API is HTTPS + Range, so s3a:// paths route through the
# http_range_reader seam. A loopback server fakes the (path-style) S3
# endpoint; the CLI runs the whole -commoncrawl crawl against it.
# ---------------------------------------------------------------------------


def test_s3_http_base_mapping():
    from flink_crawler_spark.operators.commoncrawl import is_s3_path, s3_http_base

    assert is_s3_path("s3a://bkt/prefix") and is_s3_path("s3://bkt") and not is_s3_path("/local")
    # virtual-hosted AWS default
    assert s3_http_base("s3a://commoncrawl/crawl-data") == \
        "https://commoncrawl.s3.amazonaws.com/crawl-data"
    assert s3_http_base("s3a://bkt") == "https://bkt.s3.amazonaws.com"
    # path-style against a custom endpoint (fs.s3a.endpoint analogue)
    assert s3_http_base("s3a://bkt/a/b/", endpoint="http://127.0.0.1:9000/") == \
        "http://127.0.0.1:9000/bkt/a/b"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s3_http_base("file:///x")
    with _pytest.raises(ValueError):
        s3_http_base("s3a://")


def test_cli_commoncrawl_s3a_end_to_end(spark, tmp_path):
    """--seedurls s3a://… --commoncrawl s3a://… --s3endpoint <loopback>:
    seeds + cdx.parquet arrive as whole-object GETs, segments as ranged
    GETs through the SegmentCache, and the crawl state matches the
    local-dir run."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = "http://cc.example.com/"
    a, b = root + "a", root + "b"
    html = {
        root: f'<html><body><a href="{a}">a</a> <a href="{b}">b</a></body></html>',
        a: "<html><body>leaf a</body></html>",
        b: "<html><body>leaf b</body></html>",
    }
    s3root = tmp_path / "s3root"
    bucket = s3root / "cc-archive"
    os.makedirs(bucket)
    _, rows = _build_archive(
        bucket, [(u, 200, {"Content-Type": "text/html"}, h.encode()) for u, h in html.items()]
    )
    rel_rows = [(u, os.path.basename(f), o, l, m, s) for (u, f, o, l, m, s) in rows]
    # cdx.parquet must be ONE object on S3 (not a Spark part-file dir)
    pdf = _cdx_df(spark, rel_rows).toPandas()
    pq.write_table(pa.Table.from_pandas(pdf), str(bucket / "cdx.parquet"))
    (bucket / "seeds.txt").write_text(f"# s3 seeds\n{root}\n")

    httpd, base = _serve_dir(str(s3root))
    try:
        from flink_crawler_spark import cli

        out = str(tmp_path / "s3_state_out")
        rc = cli.main([
            "--seedurls", "s3a://cc-archive/seeds.txt",
            "--commoncrawl", "s3a://cc-archive",
            "--s3endpoint", base,
            "--cachedir", str(tmp_path / "s3cache"),
            "--maxticks", "4",
            "--stateout", out,
        ])
        assert rc == 0
        st = {r["url"]: r["status"] for r in spark.read.parquet(out).collect()}
        assert st[root] == "FETCHED"
        assert st[a] == "FETCHED" and st[b] == "FETCHED"
        # SegmentCache saw the segment exactly once; seeds+cdx cached too
        cached = os.listdir(str(tmp_path / "s3cache"))
        assert any(e.endswith("-segment-00000.warc.gz") for e in cached)
        assert any(e.endswith("-seeds.txt") for e in cached)
        assert any(e.endswith("-cdx.parquet") for e in cached)
    finally:
        httpd.shutdown()
