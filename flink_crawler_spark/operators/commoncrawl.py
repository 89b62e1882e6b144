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

import pandas as pd
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


# ---------------------------------------------------------------------------
# Archive byte-range fetch (CommonCrawlFetcher.java:135-310)
# ---------------------------------------------------------------------------
#
# Reference flow per URL: SURT lookup -> miss = 404; segment hit gives
# (filename, offset, length, mime, status); unacceptable mime on a 200
# aborts; otherwise a ranged read of one gzip member is gunzipped and
# parsed as a WARC `response` record (HTTP status line + headers + body);
# redirect statuses recurse with a fresh CDX lookup up to maxRedirects.
#
# Spark-first: per-URL recursion becomes set-at-a-time *rounds* in the
# driver (bounded by max_redirects, typically <=3 joins total): each
# round is cdx_lookup -> split(miss | mime-abort | hit) -> ranged reads
# in mapInPandas -> redirect survivors become next round's frontier.
# Hits repartition by archive `filename` so one task reads one segment
# file sequentially (the locality the reference gets from its segment
# cache, SegmentCache.java:232-256).

CRLF_B = b"\r\n"


def warc_response_record(url: str, http_status: int, headers: dict[str, str], body: bytes) -> bytes:
    """One gzip member holding a WARC/1.0 `response` record (test/helper
    builder — the same shape CommonCrawl archives store)."""
    import gzip

    status_line = f"HTTP/1.1 {http_status} X".encode()
    http_block = status_line + CRLF_B
    for k, v in headers.items():
        http_block += f"{k}: {v}".encode() + CRLF_B
    http_block += CRLF_B + body
    warc_headers = (
        b"WARC/1.0" + CRLF_B
        + b"WARC-Type: response" + CRLF_B
        + f"WARC-Target-URI: {url}".encode() + CRLF_B
        + b"Content-Type: application/http; msgtype=response" + CRLF_B
        + f"Content-Length: {len(http_block)}".encode() + CRLF_B
        + CRLF_B
    )
    return gzip.compress(warc_headers + http_block + CRLF_B * 2)


def parse_warc_member(raw: bytes) -> tuple[int, dict[str, str], bytes]:
    """Gunzip one WARC member and parse the HTTP response inside:
    -> (http_status, headers lowercase-keyed, body)."""
    import gzip

    data = gzip.decompress(raw)
    # WARC header block ends at the first blank line
    warc_end = data.index(CRLF_B * 2)
    warc_head = data[:warc_end].decode("utf-8", "replace").split("\r\n")
    lengths = [l.split(":", 1)[1].strip() for l in warc_head if l.lower().startswith("content-length:")]
    http_block = data[warc_end + 4 :]
    if lengths:
        http_block = http_block[: int(lengths[0])]
    head_end = http_block.index(CRLF_B * 2)
    head_lines = http_block[:head_end].decode("iso-8859-1").split("\r\n")
    status = int(head_lines[0].split()[1])
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return status, headers, http_block[head_end + 4 :]


def local_range_reader(filename: str, offset: int, length: int) -> bytes:
    """Byte-range read from a local file — the file:// stand-in for the
    S3 `GetObjectRequest.setRange` call. An s3/http reader drops in with
    the same signature."""
    with open(filename, "rb") as f:
        f.seek(offset)
        return f.read(length)


_REDIRECT_STATUSES = {301, 302, 303, 307, 308}


def archive_fetch(
    frontier,
    cdx_index,
    *,
    range_reader=local_range_reader,
    url_col: str = "url",
    accept_mime: tuple[str, ...] | None = None,
    redirect_mode: str = "FOLLOW_ALL",  # FOLLOW_ALL | FOLLOW_TEMP | FOLLOW_NONE
    max_redirects: int = 3,
    now_ms: int = 0,
) -> DataFrame:
    """Fetch frontier URLs out of a WARC archive via CDX byte ranges.

    Returns FETCH_RESULT_SCHEMA-shaped rows: FETCHED on success,
    HTTP_NOT_FOUND on CDX miss, ABORTED_INVALID_MIMETYPE on mime reject,
    HTTP_MOVED_PERMANENTLY / HTTP_REDIRECTION_ERROR on disallowed
    redirects, HTTP_TOO_MANY_REDIRECTS past the hop budget, and
    ERROR_IOEXCEPTION on unreadable members. `fetched_url` carries the
    final (post-redirect) URL like the reference's FetchedResult.
    """
    import pandas as pd

    from ..schemas import FETCH_RESULT_SCHEMA

    spark = frontier.sparkSession
    result_cols = [f.name for f in FETCH_RESULT_SCHEMA.fields]

    def status_row(orig_url: str, status: str, fetched_url: str | None = None) -> dict:
        return {
            "url": orig_url, "pld": None, "status": status, "status_time": now_ms,
            "fetched_url": fetched_url or orig_url, "headers": {}, "content": None,
            "content_type": None, "response_rate": 0, "next_fetch_time": None,
        }

    def _urljoin_fn(base: pd.Series, loc: pd.Series) -> pd.Series:
        from urllib.parse import urljoin as _uj

        return pd.Series(
            [_uj(b or "", l or "") for b, l in zip(base, loc)], dtype="object"
        )

    _urljoin = F.pandas_udf(_urljoin_fn, "string")

    def read_round():
        """mapInPandas body: ranged read + WARC parse per hit row.

        Emits FETCH_RESULT rows; redirects come out with the raw numeric
        status stashed in headers['__redirect'] for the driver to route.
        """
        def run(batches):
            import time as _t

            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    try:
                        t0 = _t.monotonic()
                        raw = range_reader(row.filename, int(row.warc_offset), int(row.warc_length))
                        http_status, headers, body = parse_warc_member(raw)
                        dt = max(_t.monotonic() - t0, 1e-3)
                        rate = int(len(raw) / dt)
                        hdrs = {k: [v] for k, v in headers.items()}
                        if http_status in _REDIRECT_STATUSES and headers.get("location"):
                            hdrs["__redirect"] = [str(http_status), headers["location"]]
                            status = "FETCHING"  # placeholder, routed by driver
                            content, ctype = None, None
                        elif http_status == 200:
                            status = "FETCHED"
                            content = body
                            ctype = headers.get("content-type")
                        elif http_status == 404:
                            status, content, ctype = "HTTP_NOT_FOUND", None, None
                        elif http_status >= 500:
                            status, content, ctype = "HTTP_SERVER_ERROR", None, None
                        else:
                            status, content, ctype = "HTTP_CLIENT_ERROR", None, None
                        out.append({
                            "url": row.orig_url, "pld": None, "status": status,
                            "status_time": now_ms, "fetched_url": row.url,
                            "headers": hdrs, "content": content, "content_type": ctype,
                            "response_rate": rate, "next_fetch_time": None,
                        })
                    except Exception:
                        out.append(status_row(row.orig_url, "ERROR_IOEXCEPTION", row.url))
                yield pd.DataFrame(out, columns=result_cols)

        return run

    # round state: (orig_url, url) pairs still being chased
    pending = frontier.select(F.col(url_col).alias("orig_url"), F.col(url_col).alias("url"))
    finished: list[DataFrame] = []
    round_caches: list[DataFrame] = []
    empty_headers = F.from_json(F.lit("{}"), "map<string,array<string>>")

    for hop in range(max_redirects + 1):
        if pending.isEmpty():
            break
        looked = cdx_lookup(pending, cdx_index, url_col="url")
        missed = looked.filter(F.col("segment").isNull() if "segment" in looked.columns
                               else F.col("filename").isNull())
        finished.append(missed.select(
            F.col("orig_url").alias("url"), F.lit(None).cast("string").alias("pld"),
            F.lit("HTTP_NOT_FOUND").alias("status"), F.lit(now_ms).alias("status_time"),
            F.col("url").alias("fetched_url"),
            F.lit(None).cast("map<string,array<string>>").alias("headers"),
            F.lit(None).cast("binary").alias("content"),
            F.lit(None).cast("string").alias("content_type"),
            F.lit(0).alias("response_rate"),
            F.lit(None).cast("long").alias("next_fetch_time"),
        ))
        hits = looked.filter(~(F.col("segment").isNull() if "segment" in looked.columns
                               else F.col("filename").isNull()))
        if accept_mime is not None and "mime" in hits.columns:
            bad = hits.filter(
                (F.col("cdx_status") == 200) & ~F.col("mime").isin(*accept_mime)
                if "cdx_status" in hits.columns else ~F.col("mime").isin(*accept_mime)
            )
            finished.append(bad.select(
                F.col("orig_url").alias("url"), F.lit(None).cast("string").alias("pld"),
                F.lit("ABORTED_INVALID_MIMETYPE").alias("status"),
                F.lit(now_ms).alias("status_time"), F.col("url").alias("fetched_url"),
                F.lit(None).cast("map<string,array<string>>").alias("headers"),
                F.lit(None).cast("binary").alias("content"),
                F.col("mime").alias("content_type"),
                F.lit(0).alias("response_rate"),
                F.lit(None).cast("long").alias("next_fetch_time"),
            ))
            hits = hits.join(bad.select("url"), "url", "left_anti")

        # one task per archive segment file: sequential reads, reference
        # segment-cache locality
        fetched = (
            hits.repartition(F.col("filename"))
            .mapInPandas(read_round(), FETCH_RESULT_SCHEMA)
            .persist()
        )
        round_caches.append(fetched)
        finished.append(fetched.filter(~F.map_contains_key("headers", "__redirect")))

        # Redirect routing stays set-based — no driver collect. The
        # follow / permanent / too-many-hops policy is pure column
        # logic (CommonCrawlFetcher.java:135-196 semantics), and the
        # Location resolution runs executor-side via the vectorized
        # urljoin UDF; row counts per round are unbounded and never
        # funnel through the driver.
        red = fetched.filter(F.map_contains_key("headers", "__redirect"))
        code = F.element_at(F.col("headers")["__redirect"], 1).cast("int")
        location = F.element_at(F.col("headers")["__redirect"], 2)
        permanent = code.isin(301, 308)
        if redirect_mode == "FOLLOW_ALL":
            follow = F.lit(True)
        elif redirect_mode == "FOLLOW_TEMP":
            # 303 See Other is NOT a followable temp redirect: the
            # reference's FOLLOW_TEMP raises SEE_OTHER_DISALLOWED
            # (surfaced as HTTP_REDIRECTION_ERROR) for 303
            # (CommonCrawlFetcher.java RedirectMode handling)
            follow = ~permanent & (code != 303)
        else:
            follow = F.lit(False)
        terminal_status = (
            F.when(~follow & permanent, F.lit("HTTP_MOVED_PERMANENTLY"))
            .when(~follow, F.lit("HTTP_REDIRECTION_ERROR"))
            .when(F.lit(hop == max_redirects), F.lit("HTTP_TOO_MANY_REDIRECTS"))
        )
        routed = red.select(
            "url",
            "fetched_url",
            terminal_status.alias("__status"),
            F.when(
                follow & F.lit(hop < max_redirects),
                _urljoin(F.col("fetched_url"), location),
            ).alias("__next"),
        )
        finished.append(
            routed.filter(F.col("__status").isNotNull()).select(
                F.col("url"),
                F.lit(None).cast("string").alias("pld"),
                F.col("__status").alias("status"),
                F.lit(now_ms).cast("long").alias("status_time"),
                F.col("fetched_url"),
                empty_headers.alias("headers"),
                F.lit(None).cast("binary").alias("content"),
                F.lit(None).cast("string").alias("content_type"),
                F.lit(0).alias("response_rate"),
                F.lit(None).cast("long").alias("next_fetch_time"),
            )
        )
        pending = routed.filter(F.col("__next").isNotNull()).select(
            F.col("url").alias("orig_url"), F.col("__next").alias("url")
        )

    out = finished[0]
    for df in finished[1:]:
        out = out.unionByName(df)
    # materialize the bounded final result, then free every per-round
    # cache — otherwise repeated archive_fetch calls leak persist()
    # handles for the session's lifetime
    out = out.localCheckpoint(eager=True)
    for df in round_caches:
        df.unpersist()
    return out


# ---------------------------------------------------------------------------
# SegmentCache + CrawlTool -commoncrawl mode
# (fetcher/commoncrawl/SegmentCache.java, tools/CrawlToolOptions.java
#  "-commoncrawl"/"-cachedir")
# ---------------------------------------------------------------------------


def _read_through_cache(
    cache_dir: str, src_key: str, basename: str, materialize, offset: int, length: int
) -> bytes:
    """One SegmentCache protocol for every reader (file copy or HTTP
    download — ``materialize(tmp_path)`` writes the whole segment):
    cache key = md5 of the RESOLVED source (two readers sharing a
    cache_dir, or equal basenames in different segment dirs, must not
    serve bytes from the wrong segment), ``.tmp-<pid>-<tid>-<uuid>``
    staging + ``os.replace`` so concurrent workers — including two
    threads of ONE process mid-download — race safely, then a plain
    seek/read of the local copy."""
    cached = _materialize_cached(cache_dir, src_key, basename, materialize)
    with open(cached, "rb") as f:
        f.seek(offset)
        return f.read(length)


def _materialize_cached(cache_dir: str, src_key: str, basename: str, materialize) -> str:
    """Install one source under the cache (keyed by md5 of the resolved
    source) and return its local path; no-op when already present."""
    import hashlib
    import os
    import uuid

    os.makedirs(cache_dir, exist_ok=True)
    digest = hashlib.md5(src_key.encode("utf-8")).hexdigest()[:16]
    cached = os.path.join(cache_dir, digest + "-" + basename)
    if not os.path.exists(cached):
        # staging name unique per CALL, not per process: pid alone let two
        # threads of one executor interleave writes into the same tmp file
        # during a long HTTP download and os.replace() install corrupt bytes
        tmp = cached + ".tmp-" + str(os.getpid()) + "-" + uuid.uuid4().hex[:12]
        try:
            materialize(tmp)
            os.replace(tmp, cached)
        finally:
            if os.path.exists(tmp):  # failed materialize: don't litter
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return cached


# ---------------------------------------------------------------------------
# s3a:// seam (r8, round-7 verdict task 7)
#
# Reference: SeedUrlSource.java:184-248 reads seed lists from S3 and
# fetcher/commoncrawl/S3Utils.java reads CDX/segment objects via the AWS
# SDK. Spark-side the production path for DataFrame reads is hadoop-aws
# (spark.read.…("s3a://…") with fs.s3a.* configs); what the engine itself
# must provide is the BYTE-RANGE segment reader and the tiny whole-object
# reads (seed file, cdx.parquet) — and S3's GET API is plain HTTPS with a
# Range header, which is exactly the existing http_range_reader seam. So
# s3a:// paths route through it: virtual-hosted AWS URLs by default, a
# path-style custom endpoint (MinIO/localstack/loopback test double —
# the fs.s3a.endpoint analogue) when given. Requester auth headers are
# out of scope (the reference reads the PUBLIC CommonCrawl bucket, which
# needs none).
# ---------------------------------------------------------------------------

_S3_SCHEMES = ("s3a://", "s3://", "s3n://")


def is_s3_path(path: str) -> bool:
    return path.startswith(_S3_SCHEMES)


def s3_http_base(path: str, *, endpoint: str | None = None) -> str:
    """Map ``s3a://bucket[/prefix]`` to the HTTP(S) base URL its objects
    resolve under: ``https://{bucket}.s3.amazonaws.com[/prefix]`` by
    default, ``{endpoint}/{bucket}[/prefix]`` (path-style) against a
    custom endpoint."""
    for s in _S3_SCHEMES:
        if path.startswith(s):
            rest = path[len(s):]
            break
    else:
        raise ValueError(f"not an S3 path: {path!r}")
    bucket, _, prefix = rest.partition("/")
    if not bucket:
        raise ValueError(f"S3 path has no bucket: {path!r}")
    if endpoint is not None:
        base = endpoint.rstrip("/") + "/" + bucket
    else:
        base = f"https://{bucket}.s3.amazonaws.com"
    return base + ("/" + prefix.strip("/") if prefix.strip("/") else "")


def s3_fetch_object(
    path: str,
    *,
    endpoint: str | None = None,
    timeout_s: float = 10.0,
    cache_dir: str | None = None,
) -> str:
    """Download ONE whole S3 object (a seed list, a cdx.parquet) to a
    local file and return its path — read-through cached under
    ``cache_dir`` when given, a tempdir otherwise. For multi-GB WARC
    segments use :func:`s3_range_reader` instead; this helper is for the
    small driver-side objects the reference's SeedUrlSource reads."""
    import os
    import shutil
    import tempfile
    import urllib.request

    url = s3_http_base(path, endpoint=endpoint)
    cdir = cache_dir or os.path.join(tempfile.gettempdir(), "fcs_s3_objects")

    def materialize(tmp: str) -> None:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(tmp, "wb") as out:
            shutil.copyfileobj(resp, out)

    # the SegmentCache staging protocol, handing back the local path
    # (callers pass it to spark.read / open)
    return _materialize_cached(cdir, url, os.path.basename(path.rstrip("/")), materialize)


def s3_range_reader(
    archive_path: str,
    *,
    endpoint: str | None = None,
    timeout_s: float = 10.0,
    cache_dir: str | None = None,
):
    """Byte-range reader over an ``s3a://bucket/prefix`` archive — the
    S3Utils.java analogue: CDX filenames resolve under the mapped HTTP
    base and each member read is a ranged GET (or a one-time whole-segment
    download when ``cache_dir`` enables the SegmentCache mode)."""
    return http_range_reader(
        s3_http_base(archive_path, endpoint=endpoint),
        timeout_s=timeout_s,
        cache_dir=cache_dir,
    )


def http_range_reader(base_url: str, *, timeout_s: float = 10.0, cache_dir: str | None = None):
    """Ranged-GET reader over HTTP(S) — the live stand-in for the S3
    ``GetObjectRequest.setRange`` call the reference's CommonCrawlFetcher
    issues (``CommonCrawlFetcherIT`` drives the same path against real
    segment URLs). Resolves CDX filenames against ``base_url`` and sends
    ``Range: bytes=offset..offset+length-1``; a 206 returns exactly the
    member bytes, a 200 (server without Range support) is sliced locally
    so the reader degrades rather than mis-reads.

    ``cache_dir`` enables the SegmentCache analogue: the FIRST touch of a
    segment downloads it whole to an executor-local file and every later
    range (including the first) is served from disk — one transfer per
    segment per worker, like ``cached_range_reader``."""
    import os
    import urllib.request

    base = base_url.rstrip("/")

    def read(filename: str, offset: int, length: int) -> bytes:
        url = base + "/" + filename.lstrip("/")
        if cache_dir is not None:
            import shutil

            def materialize(tmp: str) -> None:
                with urllib.request.urlopen(url, timeout=timeout_s) as resp, open(
                    tmp, "wb"
                ) as out:
                    shutil.copyfileobj(resp, out)

            return _read_through_cache(
                cache_dir, url, os.path.basename(filename), materialize, offset, length
            )
        req = urllib.request.Request(
            url, headers={"Range": f"bytes={offset}-{offset + length - 1}"}
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            if resp.status == 206:
                return resp.read(length)
            # Server ignored Range and is streaming the whole object: only
            # the first offset+length bytes matter, so read exactly that
            # much and slice — never resp.read(None), which would buffer a
            # multi-GB segment in executor memory per member fetch.
            return resp.read(offset + length)[offset : offset + length]

    return read


def cached_range_reader(archive_dir: str, cache_dir: str | None = None):
    """Range reader resolving CDX filenames against ``archive_dir``,
    with an optional read-through whole-segment disk cache — the
    SegmentCache analogue (the reference caches fetched segments in
    memory, SegmentCache.java:9-46; a disk cache is the executor-local
    equivalent when segments arrive from an object store). Each Python
    worker copies a segment at most once; subsequent ranged reads of the
    same segment hit the local copy."""
    import os
    import shutil

    def read(filename: str, offset: int, length: int) -> bytes:
        src = filename if os.path.isabs(filename) else os.path.join(archive_dir, filename)
        if cache_dir is not None:
            return _read_through_cache(
                cache_dir,
                src,
                os.path.basename(filename),
                lambda tmp: shutil.copyfile(src, tmp),
                offset,
                length,
            )
        with open(src, "rb") as f:
            f.seek(offset)
            return f.read(length)

    return read


def commoncrawl_fetch_fn(
    cdx_index,
    archive_dir: str,
    *,
    cache_dir: str | None = None,
    accept_mime: tuple[str, ...] | None = None,
    redirect_mode: str = "FOLLOW_ALL",
    max_redirects: int = 3,
    s3_endpoint: str | None = None,
):
    """Build a crawl-loop ``fetch_fn`` that fetches pages out of a
    CommonCrawl-style archive (CDX index + WARC segments) instead of the
    live web — the reference's ``CrawlTool -commoncrawl`` mode
    (CommonCrawlFetcherBuilder slotting into the BaseHttpFetcher seam).
    ``archive_dir`` may be a local directory, an ``http(s)://`` base, or
    an ``s3a://bucket/prefix`` (S3Utils.java parity via the ranged-GET
    seam)."""
    if is_s3_path(archive_dir):
        reader = s3_range_reader(archive_dir, endpoint=s3_endpoint, cache_dir=cache_dir)
    elif archive_dir.startswith(("http://", "https://")):
        reader = http_range_reader(archive_dir, cache_dir=cache_dir)
    else:
        reader = cached_range_reader(archive_dir, cache_dir)

    def fetch(to_fetch, *, now_ms: int):
        return archive_fetch(
            to_fetch,
            cdx_index,
            range_reader=reader,
            accept_mime=accept_mime,
            redirect_mode=redirect_mode,
            max_redirects=max_redirects,
            now_ms=now_ms,
        )

    return fetch
