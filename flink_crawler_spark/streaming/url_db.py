"""Stateful URL DB as a Structured Streaming operator.

Reference: ``functions/UrlDBFunction.java`` — a keyed two-input process
function holding the per-PLD URL map in Flink managed state
(``initializeState``, :94-139) and merging every incoming
``CrawlStateUrl`` through ``DefaultUrlStateMerger`` (:419-528).

Spark-first: ``applyInPandasWithState`` keyed by ``pld`` — the same
partition-by-domain guarantee the reference gets from ``keyBy``
(one domain's state is owned by exactly one task), with the URL map in
``GroupState``. The merge applied per record is the *identical lattice*
as the batch ``operators/merge.py`` fold, so a stream fed the same
observations converges to the batch answer — which is exactly how the
driver's oracle checks it.

State layout: parallel arrays (url, status, status_time, score,
next_fetch_time) — GroupState rows must be a flat struct; a 100 TB
deployment would shard hot PLDs by adding a salt to the key, same as
the batch path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

UNFETCHED = "UNFETCHED"
FETCHED = "FETCHED"
QUEUED = "QUEUED"

OBS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("pld", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("status_time", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("next_fetch_time", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("statuses", T.ArrayType(T.StringType())),
        T.StructField("status_times", T.ArrayType(T.LongType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
        T.StructField("nfts", T.ArrayType(T.LongType())),
    ]
)

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("pld", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("status_time", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("next_fetch_time", T.LongType()),
    ]
)


def _prio(status: str) -> int:
    from ..schemas import FETCH_STATUS_PRIORITY

    return FETCH_STATUS_PRIORITY.get(status, 50)


def merge_one(
    cur: tuple[str, int, float, int] | None, status: str, status_time: int, score: float, nft: int
) -> tuple[str, int, float, int]:
    """Pairwise DefaultUrlStateMerger.doMerge (urldb/DefaultUrlStateMerger.java:18-61),
    identical to the n-way batch lattice in operators/merge.py (including
    the FetchStatus merge-priority tie-break at equal status_time)."""
    if cur is None:
        return (status, status_time, score, nft)
    c_status, c_time, c_score, c_nft = cur
    if c_status == UNFETCHED and status == UNFETCHED:
        return (UNFETCHED, max(c_time, status_time), c_score + score, min(c_nft, nft))
    if c_status == UNFETCHED:
        return (status, status_time, score, nft)
    if status == UNFETCHED:
        return cur
    # both non-UNFETCHED: argmax on (time, priority, status, score, nft)
    return max(
        (cur, (status, status_time, score, nft)),
        key=lambda r: (r[1], _prio(r[0]), r[0], r[2], r[3]),
    )


_OBS_COLS = ["url", "status", "status_time", "score", "next_fetch_time"]


def _merge_batch_vectorized(
    prev: pd.DataFrame | None, batch: pd.DataFrame
) -> pd.DataFrame:
    """N-way lattice fold over (state row + batch rows) per url, vectorized
    in pandas — value-identical to folding ``merge_one`` row by row.

    Why the fold commutes into this shape (the batch lattice's own n-way
    form, property-pinned in test_merge_lattice_laws):

    * any non-UNFETCHED candidate beats every UNFETCHED one, and among
      non-UNFETCHED the winner is the argmax on (status_time, merge
      priority, status, score, next_fetch_time) — a TOTAL order on the
      value, so the sequential pairwise max equals the global argmax;
    * a url whose candidates are all UNFETCHED accumulates (max time,
      summed score, min next_fetch_time); pandas' grouped sum adds in row
      order with the state row first — the same left-to-right double
      additions the sequential fold performs.
    """
    from ..schemas import FETCH_STATUS_PRIORITY

    pool = batch if prev is None or prev.empty else pd.concat(
        [prev, batch], ignore_index=True
    )
    unf = pool["status"].to_numpy() == UNFETCHED
    win_non = None
    if not unf.all():
        pn = pool[~unf].copy()
        pn["_prio"] = (
            pn["status"].map(FETCH_STATUS_PRIORITY).fillna(50).astype("int64")
        )
        pn = pn.sort_values(
            ["url", "status_time", "_prio", "status", "score", "next_fetch_time"],
            kind="mergesort",
        )
        win_non = pn.drop_duplicates("url", keep="last").drop(columns="_prio")
    win_unf = None
    if unf.any():
        pu = pool[unf]
        if win_non is not None:
            pu = pu[~pu["url"].isin(win_non["url"])]
        if len(pu):
            g = pu.groupby("url", sort=False)
            win_unf = pd.DataFrame(
                {
                    "status_time": g["status_time"].max(),
                    "score": g["score"].sum(),
                    "next_fetch_time": g["next_fetch_time"].min(),
                }
            ).reset_index()
            win_unf["status"] = UNFETCHED
    parts = [p for p in (win_non, win_unf) if p is not None and len(p)]
    merged = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
    return merged.sort_values("url", kind="mergesort")[_OBS_COLS].reset_index(
        drop=True
    )


def _url_db_fn(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pld = key[0]
    chunks = [pdf[_OBS_COLS] for pdf in pdfs]
    batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)

    st = None
    if state.exists:
        urls, statuses, times, scores, nfts = state.get
        st = pd.DataFrame(
            {
                "url": urls,
                "status": statuses,
                "status_time": times,
                "score": scores,
                "next_fetch_time": nfts,
            }
        )

    touched = batch["url"].unique()
    prev = st[st["url"].isin(touched)] if st is not None else None
    merged = _merge_batch_vectorized(prev, batch)

    full = merged
    if st is not None:
        untouched = st[~st["url"].isin(touched)]
        if len(untouched):
            full = pd.concat([untouched, merged], ignore_index=True).sort_values(
                "url", kind="mergesort"
            )
    state.update(
        (
            full["url"].tolist(),
            full["status"].tolist(),
            full["status_time"].tolist(),
            full["score"].tolist(),
            full["next_fetch_time"].tolist(),
        )
    )
    out = merged.copy()
    out["pld"] = pld
    yield out[[f.name for f in OUT_SCHEMA.fields]]


def url_db_stateful(obs_stream: DataFrame) -> DataFrame:
    """Streaming URL DB: merge per-URL observations into keyed state,
    emitting the post-merge row for every URL touched in the batch
    (update semantics — the reference's status side-output analogue)."""
    return obs_stream.groupBy("pld").applyInPandasWithState(
        _url_db_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_obs_stream_to_state(spark, obs_dir: str, query_name: str) -> DataFrame:
    """Replay an observation directory through the stateful URL DB into a
    memory sink (availableNow) and return the sink table."""
    import shutil

    from ..queries.streamq import _temp_ckpt

    stream = spark.readStream.schema(OBS_SCHEMA).parquet(obs_dir)
    ckpt = _temp_ckpt("fcs_urldb_ckpt_")
    q = (
        url_db_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)  # explicit ckpts never auto-delete
    return spark.table(query_name)


# ---------------------------------------------------------------------------
# Per-domain timers: the UrlDBFunction timer -> FetchQueue emission path
# (functions/UrlDBFunction.java:192-235, 261-323) as ProcessingTimeTimeout
# ---------------------------------------------------------------------------

def _clamp_interval(ms: float) -> int:
    """checkIntervalForDomain clamp (UrlDBFunction.java:333-351): 1..1000 ms."""
    return int(min(max(ms, 1), 1000))


def _url_db_timer_fn(
    base_interval_ms: int,
    max_per_fire: int,
    min_fetch_score: float,
    refetch: bool = False,
):
    def fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import time as _t

        pld = key[0]
        if state.exists:
            urls, statuses, times, scores, nfts = state.get
            db: dict[str, tuple[str, int, float, int]] = {
                u: (s, t, sc, n) for u, s, t, sc, n in zip(urls, statuses, times, scores, nfts)
            }
        else:
            db = {}
        out: list[dict] = []
        now = int(_t.time() * 1000)

        if state.hasTimedOut:
            # timer fire: admit the domain's best UNFETCHED URL(s) to the
            # fetch queue — status becomes QUEUED and the status-change row
            # is emitted (the reference's side-output loopback)
            # refetch mode mirrors the batch admission predicate
            # (operators/frontier.py _eligible_expr with refetch=True)
            # term for term: due UNFETCHED above the score floor, plus
            # due FETCHED rows re-entering — the reference's continuous
            # re-crawl timers.  Non-refetch keeps the original
            # UNFETCHED-only admission (timer cadence plays the role of
            # the due check).  Batch/streaming equivalence of the
            # re-admission set is pinned in tests/test_refetch_parity.py.
            if refetch:
                def _elig(v):
                    return (
                        v[0] == UNFETCHED
                        and v[2] >= min_fetch_score
                        and v[3] <= now
                    ) or (v[0] == FETCHED and v[3] <= now)
            else:
                def _elig(v):
                    return v[0] == UNFETCHED and v[2] >= min_fetch_score

            cands = sorted(
                ((u, v) for u, v in db.items() if _elig(v)),
                key=lambda kv: (-kv[1][2], kv[0]),
            )[:max_per_fire]
            for u, v in cands:
                db[u] = (QUEUED, now, v[2], v[3])
                out.append(
                    {"url": u, "pld": pld, "status": QUEUED, "status_time": now,
                     "score": v[2], "next_fetch_time": v[3]}
                )
        else:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    db[row.url] = merge_one(
                        db.get(row.url), row.status, int(row.status_time),
                        float(row.score), int(row.next_fetch_time),
                    )

        items = sorted(db.items())
        state.update(
            (
                [u for u, _ in items],
                [v[0] for _, v in items],
                [v[1] for _, v in items],
                [v[2] for _, v in items],
                [v[3] for _, v in items],
            )
        )
        # (re-)arm: score-proportional polling — better domains fire more
        # often (avg score over the domain's URLs vs the 200 ms base)
        avg_score = (
            sum(v[2] for _, v in items) / len(items) if items else 1.0
        ) or 0.01
        state.setTimeoutDuration(_clamp_interval(base_interval_ms / max(avg_score, 0.01)))
        yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA.fields])

    return fn


def url_db_with_timers(
    obs_stream: DataFrame,
    *,
    base_interval_ms: int = 200,
    max_per_fire: int = 1,
    min_fetch_score: float = 0.0,
    refetch: bool = False,
) -> DataFrame:
    """Streaming URL DB with per-domain processing-time timers: incoming
    observations merge into keyed state; each domain's timer re-arms at a
    score-scaled interval and admits its best UNFETCHED URL as QUEUED —
    the continuous form of the frontier-selection quota the batch loop
    computes per tick.  ``refetch=True`` additionally re-admits FETCHED
    rows whose next_fetch_time has come due (UrlDBFunction.java:333-351
    continuous re-crawl), with the admission predicate mirroring the
    batch ``_eligible_expr(refetch=True)`` term for term."""
    return obs_stream.groupBy("pld").applyInPandasWithState(
        _url_db_timer_fn(base_interval_ms, max_per_fire, min_fetch_score, refetch),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
