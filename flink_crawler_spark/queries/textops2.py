"""BPE-style pre-tokenization (the GPT-2 pattern family) — the token
accounting a tokenizer-bound corpus pipeline runs, as a pure codegen'd
projection.

Beyond-reference extension (the reference counts nothing below the page
level); exact-oracled like the rest of the text family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, t

# Lookahead-free variant of the GPT-2 pre-tokenizer regex (public,
# Radford et al. 2019): contractions, space-prefixed letter runs, digit
# runs, punctuation runs, whitespace runs. Alternation order IS the
# tokenization — Java (Spark) and RE2-Perl (DuckDB) both use
# leftmost-first alternation, so the engines agree token-for-token
# (parity spot-checked on contraction/punct/double-space edge cases).
# Whitespace is an EXPLICIT char class, not \s: Java's \s includes \x0B
# (vertical tab) while RE2's does not, so \s would tokenize VT-bearing
# text differently per engine and break the stream_md5 oracle.
_WS = r" \t\n\f\r"
PRETOK_RE = rf"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9{_WS}']+|'| ?[{_WS}]+"
_PRETOK_SQL = PRETOK_RE.replace("'", "''")
_SEP = chr(31)  # unit separator; cannot occur inside any token class


@register(
    "doc_bpe_pretoken",
    oracle=f"""
WITH pt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{_PRETOK_SQL}') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_pretokens,
       CAST(len(list_filter(toks, x -> regexp_full_match(x, ' ?[a-z]+')))
            AS BIGINT) AS n_word,
       CAST(len(list_filter(toks, x -> regexp_full_match(x, ' ?[0-9]+')))
            AS BIGINT) AS n_num,
       CAST(len(list_filter(toks, x -> regexp_full_match(x, '[{_WS}]+')))
            AS BIGINT) AS n_ws,
       md5(coalesce(list_aggregate(toks, 'string_agg', chr(31)), ''))
         AS stream_md5
FROM pt
""",
)
def doc_bpe_pretoken(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pre-tokenization counts: split text with the GPT-2-family
    regex (the stage that feeds a real BPE merge table), classify and
    count the pre-tokens, and md5 the chr(31)-joined token stream so the
    oracle value-checks every token boundary, not just the counts.

    Pure regexp_extract_all + array HOFs — one codegen'd projection, no
    shuffle, no Python; the 100 TB plan is the scan itself."""
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(PRETOK_RE), F.lit(0))
    d = t(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))

    def n_matching(pat: str):
        return F.size(F.filter(F.col("toks"), lambda x: x.rlike(f"^(?:{pat})$"))).cast(
            "long"
        )

    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_pretokens"),
        n_matching(" ?[a-z]+").alias("n_word"),
        n_matching(" ?[0-9]+").alias("n_num"),
        n_matching(f"[{_WS}]+").alias("n_ws"),
        F.md5(F.encode(F.concat_ws(_SEP, F.col("toks")), "UTF-8")).alias("stream_md5"),
    )


# --------------------------------------------------------------------------
# bpe_merge_candidates — the first merge step of BPE tokenizer training
# --------------------------------------------------------------------------

from .textops import DUCK_TOKS  # noqa: E402
from ..functions.text import tokens_expr  # noqa: E402

MERGE_TOP_K = 50


@register(
    "bpe_merge_candidates",
    oracle=f"""
WITH words AS (
  SELECT unnest({DUCK_TOKS}) AS w FROM documents
),
chars AS (
  SELECT w, regexp_extract_all(w, '.') AS cs FROM words
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(cs) - 1),
                i -> cs[i] || cs[i + 1])) AS pair
  FROM chars
)
SELECT pair, count(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {MERGE_TOP_K}
""",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training, step 1: count adjacent character pairs inside every
    word occurrence and rank the merge candidates — the statistic a real
    BPE trainer (Sennrich et al. 2016) computes each round, and exactly
    how reference trainers structure it: collapse the corpus to the
    DISTINCT word + occurrence count first (Zipf makes the vocabulary
    orders of magnitude smaller than the token stream), then split only
    each unique word once and weight its pairs by the word count. The
    pair statistic is identical to splitting every occurrence; the
    explode volume drops from O(tokens) to O(vocab). Both aggs are
    map-side combined; the top-k is TakeOrderedAndProject, never a
    global sort. Symbol-pair cardinality is bounded by alphabet², so
    the final agg state is tiny at any corpus size."""
    wfreq = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wn"))
    )
    cs = F.regexp_extract_all(F.col("w"), F.lit("."), F.lit(0))
    # Spark's sequence(1, 0) DESCENDS to [1, 0] (DuckDB's generate_series
    # is empty there) — guard 1-char words explicitly
    idx = F.when(F.size(cs) >= 2, F.sequence(F.lit(1), F.size(cs) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = wfreq.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat(F.element_at(cs, i), F.element_at(cs, i + 1)),
            )
        ).alias("pair"),
        "wn",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(MERGE_TOP_K)
    )


# --------------------------------------------------------------------------
# vocab_coverage — vocabulary-size/coverage tradeoff curve
# --------------------------------------------------------------------------

VOCAB_CURVE_K = 100


@register(
    "vocab_coverage",
    oracle=f"""
WITH words AS (
  SELECT unnest({DUCK_TOKS}) AS w FROM documents
),
freq AS (
  SELECT w, count(*) AS n FROM words GROUP BY w
),
tot AS (SELECT sum(n) AS tot FROM freq),
ranked AS (
  SELECT w, n, row_number() OVER (ORDER BY n DESC, w ASC) AS rnk
  FROM freq
)
SELECT rnk, w, n,
       round(CAST(sum(n) OVER (ORDER BY rnk) AS DOUBLE) / (SELECT tot FROM tot), 6)
         AS coverage
FROM ranked
WHERE rnk <= {VOCAB_CURVE_K}
ORDER BY rnk
""",
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: for the top-K corpus words, what
    cumulative fraction of all token occurrences a K-word vocab covers —
    the statistic that sizes a tokenizer's vocab. The heavy part (word
    frequency) is one map-side-combined agg; the top-K cut is
    TakeOrderedAndProject; only the K survivors (a driver-scale frame)
    see the running-total window, so the single-partition window is
    bounded by K=100 rows, never by corpus size."""
    freq = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens_expr(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    freq = freq.localCheckpoint(eager=True)  # feeds total + top-k
    tot = freq.agg(F.sum("n").alias("__tot"))
    top = freq.orderBy(F.desc("n"), F.asc("w")).limit(VOCAB_CURVE_K)
    # k-row head: rank + running coverage via ONE triangular broadcast
    # self-join — no unpartitioned WindowExec (r7 task 7)
    from ..operators.windows import bounded_cumsum

    return (
        bounded_cumsum(
            top,
            [("n", False), ("w", True)],
            [("n", "cum_n", True)],
            count_out="rnk",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            "w",
            "n",
            F.round(F.col("cum_n").cast("double") / F.col("__tot"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("rnk")
    )
