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
PRETOK_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|'| ?\s+"
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
       CAST(len(list_filter(toks, x -> regexp_full_match(x, '\\s+')))
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
        n_matching(r"\s+").alias("n_ws"),
        F.md5(F.encode(F.concat_ws(_SEP, F.col("toks")), "UTF-8")).alias("stream_md5"),
    )
