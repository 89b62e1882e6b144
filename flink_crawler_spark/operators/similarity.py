"""Similarity search over embedding columns (array<float>).

Beyond-reference extension for training-data pipelines:

  * brute-force cosine top-k  — exact baseline; one pass, JVM-side
    arithmetic via higher-order functions (zip_with + aggregate), no UDF.
  * LSH-bucketed ANN          — random-hyperplane signatures (seeded,
    deterministic) so candidate sets shrink to one bucket's worth; the
    scale path for 100 TB (bucket join instead of full scan).
  * pairwise cosine join      — all-pairs above a threshold via LSH
    blocking.

Everything stays declarative: the query vector is a literal array
column, so Catalyst constant-folds it and the scan only reads the
embedding column (column pruning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query.

    Compiles to a single scan + TakeOrderedAndProject: no shuffle of the
    vectors, only of the k winners per partition.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_expr(as_double_array(F.col(vec_col)), q)
    return (
        embeddings.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def _dlit(v: float) -> str:
    """A Spark-SQL DOUBLE literal that round-trips ``v`` bit-exactly.
    Plain decimal text parses as DECIMAL, so suffix D; scientific
    notation already parses as DOUBLE."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r or "n" in r) else r + "D"


def signature_expr(vec: Column | str, planes: np.ndarray) -> Column:
    """Sign-LSH signature as a bigint bucket id (JVM-side, no UDF).

    Pass the vector as a column NAME (or SQL fragment) to build the whole
    signature as ONE parsed SQL expression (r12, guide §1.2): the Column
    path pays ~planes x dim py4j round-trips of pure plan construction
    (measured ~2 s for 8x64 planes — more than the query's execution).
    Both paths build the identical expression tree — the same left-assoc
    ``aggregate(zip_with(...))`` dot fold starting at DOUBLE 0.0 and the
    same left-assoc shiftleft accumulation from bit 0 — so bucket ids
    are bit-identical and the ``_lsh_sig_sql`` DuckDB twin still holds.
    """
    if isinstance(vec, str):
        terms = []
        for i, plane in enumerate(planes):
            arr = ", ".join(_dlit(v) for v in plane)
            dot = (
                f"aggregate(zip_with(transform({vec}, x -> CAST(x AS DOUBLE)), "
                f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            )
            bit = (
                f"(CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END)"
            )
            terms.append(f"shiftleft({bit}, {i})")
        return F.expr("CAST(0 AS BIGINT) + " + " + ".join(terms))
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(as_double_array(vec), p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + F.shiftleft(bit, i)
    return sig


def signature_udf(planes: np.ndarray):
    """Sign-LSH signature as an Arrow-vectorized pandas UDF.

    One `n x dim @ dim x planes` matmul per batch instead of
    planes x dim interpreted expression nodes per row — the fast path
    when the signature feeds an (engine-internal) bucket column where
    bit-exact cross-engine reproducibility isn't required.
    """
    P = planes.astype(np.float64).T  # dim x n_planes
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def sig(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).values)
        bits = (M @ P) >= 0
        return pd.Series(bits @ weights)

    return sig


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    reproducible: bool = False,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: only score vectors in the query's LSH bucket
    (plus Hamming-1 neighbor buckets for recall).

    At 100 TB the bucket column is a partition/bucketing key on the
    embeddings table, so this prunes the scan itself.

    ``reproducible=True`` (r10, round-9 verdict task 2) makes every
    arithmetic step an engine-portable left-associated double chain —
    corpus signatures via ``signature_expr`` (the proven
    ``_lsh_sig_sql`` twin from ann_recall_report), the query signature
    via an explicit Python left-assoc loop (IEEE-identical to the SQL
    sum), and the re-rank cosine rounded to ``round_digits`` before
    ordering — so the WHOLE result is value-oracle-able in DuckDB.
    Default False keeps the Arrow-matmul fast path for production use
    where cross-engine bit-reproducibility isn't needed.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qsig = 0
    if reproducible:
        for i, plane in enumerate(planes):
            s = 0.0
            for d in range(dim):
                s = s + float(query_vec[d]) * float(plane[d])
            qsig |= (1 if s >= 0.0 else 0) << i
    else:
        qv = np.array(query_vec)
        for i, plane in enumerate(planes):
            qsig |= (1 if float(qv @ plane) >= 0 else 0) << i
    # multi-probe out to Hamming distance 2: near-threshold plane signs
    # flip easily, and recall collapses with exact-bucket-only probing
    probe = [qsig] + [qsig ^ (1 << i) for i in range(n_planes)]
    probe += [
        qsig ^ (1 << i) ^ (1 << j)
        for i in range(n_planes)
        for j in range(i + 1, n_planes)
    ]

    sig_col = (
        signature_expr(vec_col, planes)
        if reproducible
        else signature_udf(planes)(F.col(vec_col))
    )
    with_sig = embeddings.withColumn("bucket", sig_col)
    candidates = with_sig.filter(F.col("bucket").isin(probe))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_expr(as_double_array(F.col(vec_col)), q)
    if reproducible:
        sim = F.round(sim, round_digits)
    return (
        candidates.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    reproducible: bool = False,
    round_digits: int = 6,
) -> DataFrame:
    """All pairs with cosine >= threshold, LSH-blocked (no cross join).

    ``reproducible=True``: signatures via ``signature_expr`` (left-assoc
    plane dots, the ``_lsh_sig_sql`` DuckDB twin) and the pair cosine
    rounded to ``round_digits`` before the threshold — fully
    value-oracle-able; each vector lives in exactly one bucket, so every
    surviving pair is emitted exactly once in both engines."""
    planes = hyperplanes_from_df_dim(embeddings, vec_col, n_planes, seed)
    sig_col = (
        signature_expr(vec_col, planes)
        if reproducible
        else signature_udf(planes)(F.col(vec_col))
    )
    with_sig = embeddings.select(F.col(id_col), F.col(vec_col), sig_col.alias("bucket"))
    a = with_sig.alias("a")
    b = with_sig.alias("b")
    cos = cosine_expr(
        as_double_array(F.col(f"a.{vec_col}")), as_double_array(F.col(f"b.{vec_col}"))
    )
    if reproducible:
        cos = F.round(cos, round_digits)
    pairs = (
        a.join(b, "bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= F.lit(threshold)).distinct()


def hyperplanes_from_df_dim(
    embeddings: DataFrame, vec_col: str, n_planes: int, seed: int
) -> np.ndarray:
    dim = len(embeddings.select(vec_col).head()[0])
    return hyperplanes(dim, n_planes, seed)


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer + per-list search
# ----------------------------------------------------------------------


def ivf_centroids(
    embeddings: DataFrame,
    *,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids from the n_lists
    lowest-id vectors, refine with a few Lloyd iterations driver-side
    over a bounded sample (the classic IVF training shape — at 100 TB
    you train on a sample exactly like this, never the full set)."""
    sample = (
        embeddings.orderBy(id_col).limit(max(n_lists * 64, 1024)).select(vec_col).collect()
    )
    X = np.array([list(r[0]) for r in sample], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_lists].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on normalized vectors
        for k in range(n_lists):
            members = X[assign == k]
            if len(members):
                c = members.mean(axis=0)
                C[k] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding") -> DataFrame:
    """Add the inverted-list id (nearest centroid by cosine) — one Arrow
    matmul per batch. At scale ``list_id`` becomes the partition/bucket
    key of the stored table, so probing prunes the scan itself."""
    C = centroids.T  # dim x n_lists

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).values)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C, axis=1).astype(np.int32))

    return embeddings.withColumn("list_id", assign(F.col(vec_col)))


def ivf_probe_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    centroids: np.ndarray,
    n_probe: int,
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN candidate join: query x corpus pairs restricted to
    the query's ``n_probe`` nearest inverted lists — the sub-quadratic
    replacement for a broadcast cross join in pair-mining queries
    (hard-negative mining, MNN bitext mining).

    Shape: the corpus lands in its nearest-centroid list (``ivf_assign``
    — at 100 TB ``list_id`` is the stored table's partition key, so
    probing prunes the scan), each query row explodes into its n_probe
    probe lists, and candidates come from an equi-join on the list id.
    The corpus side never shuffles more than once and no cross join ever
    forms; with ``n_probe == len(centroids)`` the candidate set is
    exactly the full cross product (the property the equivalence tests
    pin). The list id is low-cardinality, so list-size skew is the AQE
    skew-join case; per-list size is bounded by the quantizer, same as
    any IVF index.

    Caller contract: ``queries`` and ``corpus`` must have disjoint
    column names; the returned frame has all columns of both (helper
    columns ``probe_id``/``list_id`` are dropped). Tie-breaks in the
    probe ranking are by stable argsort (lowest list id wins), matching
    ``ivf_assign``'s first-argmax rule, so results are deterministic.
    """
    n_lists = len(centroids)
    n_probe = min(n_probe, n_lists)
    Ct = centroids.T  # dim x n_lists

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).values)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ Ct), axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.withColumn(
        "probe_id", F.explode(probes(F.col(query_vec_col)))
    )
    c = ivf_assign(corpus, centroids, vec_col=corpus_vec_col)
    return q.join(c, q["probe_id"] == c["list_id"]).drop("probe_id", "list_id")


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only vectors in the query's n_probe nearest
    inverted lists, exact cosine re-rank within them."""
    C = ivf_centroids(embeddings, n_lists=n_lists, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ qn))[:n_probe].tolist()

    assigned = ivf_assign(embeddings, C, vec_col=vec_col)
    candidates = assigned.filter(F.col("list_id").isin([int(p) for p in probe]))
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_expr(as_double_array(F.col(vec_col)), qlit)
    return (
        candidates.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Exact Arrow kernels — bit-identical to the SQL left-associated sums
# ---------------------------------------------------------------------------
#
# The oracle-compared brute-force queries write dot products as explicit
# left-associated 64-term sums so DuckDB and Spark agree bit-for-bit.
# Whole-stage codegen handles that, but a 64-term array-index expression
# is a large janino unit and evaluates scalar-at-a-time. These kernels
# produce the SAME doubles from numpy: elementwise column accumulation
# (acc = acc + a_i*b_i) IS the left-associated order, every mul/add a
# single IEEE-754 double op, and float32->float64 widening is exact.
# Only the final round(dot/nprod, 6) happens JVM-side so the rounding
# semantics stay the engines' own (as everywhere else in the repo).

def _leftassoc_dot_matrix(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
    """(m,d) x (n,d) -> (m,n) dots, left-associated over d."""
    P = A[:, 0:1] * B[:, 0][None, :]
    for i in range(1, A.shape[1]):
        P = P + A[:, i : i + 1] * B[:, i][None, :]
    return P


def _leftassoc_norm(A: "np.ndarray") -> "np.ndarray":
    acc = A[:, 0] * A[:, 0]
    for i in range(1, A.shape[1]):
        acc = acc + A[:, i] * A[:, i]
    return np.sqrt(acc)


def exact_cosine_pairs(
    embeddings: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    prefilter_margin: float = 1e-6,
    ground_truth: bool = False,
    num_blocks: int | None = None,
    block_target_rows: int = 4096,
    max_ground_truth_rows: int = 50_000,
) -> DataFrame:
    """All pairs with round(cosine, 6) >= threshold — exact brute force.

    DEFAULT path (distributed, no driver collect): vectors hash into
    ``num_blocks`` blocks (each ~``block_target_rows`` vectors), blocks
    pack into one array-row each, and every unordered block pair
    (NB*(NB+1)/2 tasks) runs the Arrow kernel executor-side. O(n²) work —
    all-pairs is inherently quadratic — but the *shape* scales: no row
    ever visits the driver, task memory is bounded by two blocks, and
    parallelism grows quadratically with n. LSH/IVF remain the sub-
    quadratic 100 TB paths.

    ``ground_truth=True`` keeps the old collect+broadcast variant for
    small-n verification runs, guarded by ``max_ground_truth_rows``.

    Both paths prefilter in the kernel with a safety margin on the
    unrounded cosine; the authoritative round(dot/nprod) >= threshold
    filter runs JVM-side, so results match the SQL formulation exactly.
    """
    if not ground_truth:
        return _blocked_cosine_pairs(
            embeddings,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
            prefilter_margin=prefilter_margin,
            num_blocks=num_blocks,
            block_target_rows=block_target_rows,
        )

    import pandas as pd

    spark = embeddings.sparkSession
    n = embeddings.count()
    if n > max_ground_truth_rows:
        raise ValueError(
            f"ground_truth collect path refused: {n} rows > {max_ground_truth_rows}; "
            "use the default blocked path"
        )
    rows = embeddings.select(id_col, vec_col).collect()
    ids_b = np.array([r[0] for r in rows], dtype=np.int64)
    B = np.asarray([np.asarray(r[1], dtype=np.float32) for r in rows]).astype(np.float64)
    nrm_b = _leftassoc_norm(B)
    bc = spark.sparkContext.broadcast((ids_b, B, nrm_b))

    def run(batches):
        ids_r, Bm, nb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ida = pdf[id_col].to_numpy()
            P = _leftassoc_dot_matrix(A, Bm)
            na = _leftassoc_norm(A)
            nprod = na[:, None] * nb[None, :]
            c = P / nprod
            mask = (c >= threshold - prefilter_margin) & (ida[:, None] < ids_r[None, :])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": ida[ii],
                    "id_b": ids_r[jj],
                    "dot": P[ii, jj],
                    "nprod": nprod[ii, jj],
                }
            )

    n_parts = spark.sparkContext.defaultParallelism
    cand = (
        embeddings.select(id_col, vec_col)
        .repartition(n_parts)
        .mapInPandas(run, "id_a long, id_b long, dot double, nprod double")
    )
    cosine = F.round(F.col("dot") / F.col("nprod"), round_digits)
    return (
        cand.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _blocked_cosine_pairs(
    embeddings: DataFrame,
    *,
    threshold: float,
    id_col: str,
    vec_col: str,
    round_digits: int,
    prefilter_margin: float,
    num_blocks: int | None,
    block_target_rows: int,
) -> DataFrame:
    """Distributed exact all-pairs: block-nested-loop at block granularity.

    groupBy(blk) packs each hash block into ONE row (ids + matrix); the
    NB-row block table self-joins on ``blk_a <= blk_b`` (tiny broadcast
    NL join — NB*(NB+1)/2 rows), and each block-pair row computes its
    cross product in the Arrow kernel. Every unordered vector pair is
    examined exactly once: intra-block pairs by ``id_a < id_b``,
    cross-block pairs orientation-normalized with min/max."""
    import pandas as pd

    if num_blocks is None:
        n = embeddings.count()
        num_blocks = max(1, -(-n // block_target_rows))

    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("blk")
    blocks = (
        embeddings.select(blk, F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .groupBy("blk")
        .agg(
            F.collect_list("id").alias("ids"),
            F.collect_list("v").alias("vecs"),
        )
    )
    a = blocks.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    pair_rows = a.join(b, F.col("blk_a") <= F.col("blk_b")).repartition(
        max(num_blocks * (num_blocks + 1) // 2, 1)
    )

    def run(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ida = np.asarray(row.ids_a, dtype=np.int64)
                idb = np.asarray(row.ids_b, dtype=np.int64)
                A = np.stack([np.asarray(v, dtype=np.float32) for v in row.vecs_a]).astype(
                    np.float64
                )
                B = np.stack([np.asarray(v, dtype=np.float32) for v in row.vecs_b]).astype(
                    np.float64
                )
                P = _leftassoc_dot_matrix(A, B)
                nprod = _leftassoc_norm(A)[:, None] * _leftassoc_norm(B)[None, :]
                c = P / nprod
                mask = c >= threshold - prefilter_margin
                if row.blk_a == row.blk_b:
                    mask &= ida[:, None] < idb[None, :]
                else:
                    mask &= ida[:, None] != idb[None, :]
                ii, jj = np.nonzero(mask)
                u, v = ida[ii], idb[jj]
                lo, hi = np.minimum(u, v), np.maximum(u, v)
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, "dot": P[ii, jj], "nprod": nprod[ii, jj]}
                )

    cand = pair_rows.mapInPandas(run, "id_a long, id_b long, dot double, nprod double")
    cosine = F.round(F.col("dot") / F.col("nprod"), round_digits)
    return (
        cand.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def bipartite_cosine_pairs(
    xdf: DataFrame,
    ydf: DataFrame,
    *,
    x_id: str = "x_id",
    x_vec: str = "ex",
    y_id: str = "y_id",
    y_vec: str = "ey",
    round_digits: int = 6,
    block_target_rows: int = 512,
    x_rows: int | None = None,
    y_rows: int | None = None,
) -> DataFrame:
    """ALL x-side x y-side cosine pairs as (x_id, y_id, cos) — the
    bipartite sibling of the blocked ``exact_cosine_pairs`` kernel.

    ``x_rows``/``y_rows`` are OPTIONAL row-count estimates used only to
    size the block grid (e.g. a parquet-footer count from the caller —
    zero actions); when None the side is counted. Block sizing needs no
    exactness: every pair is produced whatever the grid.

    Same exactness contract: dots and norms are left-associated double
    chains (``_leftassoc_dot_matrix`` / ``_leftassoc_norm``), only the
    final round(dot/nprod, round_digits) runs JVM-side — bit-identical
    to the unrolled 64-term SQL chain the DuckDB oracles spell out, at
    numpy speed (measured ~2x end-to-end on margin_mnn_pairs, whose
    pair materialization was dominated by the codegen'd scalar chain).

    Shape: each side hashes into ~block_target_rows blocks packed one
    row per block; every (x-block, y-block) pair is one task computing
    its cross product in Arrow. No driver collect, task memory bounded
    by two blocks, parallelism grows with |x|x|y| — at 100 TB this is
    the same all-pairs discipline as exact_cosine_pairs (and like it,
    reserved for bounded candidate sets; LSH/IVF remain the
    sub-quadratic paths)."""
    import pandas as pd

    nx_blocks = max(1, -(-(x_rows if x_rows is not None else xdf.count()) // block_target_rows))
    ny_blocks = max(1, -(-(y_rows if y_rows is not None else ydf.count()) // block_target_rows))
    xb = (
        xdf.select(
            F.pmod(F.xxhash64(F.col(x_id)), F.lit(nx_blocks)).alias("xblk"),
            F.col(x_id).alias("id"),
            F.col(x_vec).alias("v"),
        )
        .groupBy("xblk")
        .agg(F.collect_list("id").alias("ids_x"), F.collect_list("v").alias("vecs_x"))
    )
    yb = (
        ydf.select(
            F.pmod(F.xxhash64(F.col(y_id)), F.lit(ny_blocks)).alias("yblk"),
            F.col(y_id).alias("id"),
            F.col(y_vec).alias("v"),
        )
        .groupBy("yblk")
        .agg(F.collect_list("id").alias("ids_y"), F.collect_list("v").alias("vecs_y"))
    )
    pair_rows = xb.crossJoin(yb).repartition(max(nx_blocks * ny_blocks, 1))

    def run(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ida = np.asarray(row.ids_x, dtype=np.int64)
                idb = np.asarray(row.ids_y, dtype=np.int64)
                A = np.stack([np.asarray(v, dtype=np.float32) for v in row.vecs_x]).astype(
                    np.float64
                )
                B = np.stack([np.asarray(v, dtype=np.float32) for v in row.vecs_y]).astype(
                    np.float64
                )
                P = _leftassoc_dot_matrix(A, B)
                nprod = _leftassoc_norm(A)[:, None] * _leftassoc_norm(B)[None, :]
                ii, jj = np.meshgrid(np.arange(len(ida)), np.arange(len(idb)), indexing="ij")
                ii, jj = ii.ravel(), jj.ravel()
                yield pd.DataFrame(
                    {
                        "id_x": ida[ii],
                        "id_y": idb[jj],
                        "dot": P[ii, jj],
                        "nprod": nprod[ii, jj],
                    }
                )

    cand = pair_rows.mapInPandas(run, "id_x long, id_y long, dot double, nprod double")
    cos = F.round(F.col("dot") / F.col("nprod"), round_digits)
    return cand.select(
        F.col("id_x").alias(x_id), F.col("id_y").alias(y_id), cos.alias("cos")
    )


def exact_cosine_topk(
    embeddings: DataFrame,
    query_vec,
    *,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k against one query vector via the same Arrow kernel;
    ordering/limit stays JVM-side (TakeOrderedAndProject)."""
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float32).astype(np.float64)[None, :]
    nq = float(_leftassoc_norm(q)[0])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = _leftassoc_dot_matrix(A, q)[:, 0]
            na = _leftassoc_norm(A)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "dot": P, "nprod": na * nq}
            )

    cand = embeddings.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, dot double, nprod double"
    )
    cosine = F.round(F.col("dot") / F.col("nprod"), round_digits)
    return (
        cand.select("vec_id", cosine.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )
