"""Text-analysis scalar layer for the documents pipeline.

Beyond-reference extensions (the reference's text handling is Tika
extraction + language detection inside ParseFunction,
``parser/TikaCallable.java:241-269``); re-expressed as columnar,
JVM-side expressions a 100 TB pipeline can afford:

  * token_count_expr   — whitespace/punct tokenizer count
  * quality features   — length / punctuation ratio / stopword ratio /
                         mean word length -> composite quality score
  * lang_id_expr       — stopword-profile language heuristic (the
                         header/meta/profiler cascade of TikaCallable
                         reduced to its statistical core)
  * fingerprint_expr   — md5 content digest + min-shingle fingerprint
                         (winnowing-lite document signature)

All pure built-ins -> exact DuckDB oracle mirrors exist in queries/textops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles (public, common knowledge lists)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "con"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "他", "这", "中"),
}


def tokens_expr(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"[^a-z0-9À-ɏ一-鿿]+"), lambda x: x != "")


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio_expr(text: Column, lang: str = "en") -> Column:
    toks = tokens_expr(text)
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(n > 0, n_stop.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_len_expr(text: Column) -> Column:
    toks = tokens_expr(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality score (Gopher/C4-style heuristic features):

    starts at 1.0, penalized for: too-short docs, extreme punctuation,
    missing stopwords, degenerate mean word length.
    """
    n_tok = token_count_expr(text).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio_expr(text) * 4, F.lit(0.0))
    stop_score = F.least(stopword_ratio_expr(text) * 5, F.lit(1.0))
    mwl = mean_word_len_expr(text)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_score * punct_pen * (F.lit(0.5) + stop_score / 2) * mwl_ok, 6)


def lang_score_expr(text: Column, lang: str) -> Column:
    """Count of language-profile stopword hits in the text."""
    toks = tokens_expr(text)
    stops = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))


def lang_id_expr(text: Column, langs: tuple[str, ...] = ("en", "de", "es", "fr")) -> Column:
    """Argmax language over stopword-profile hit counts; 'und' if no hits.

    Deterministic tie-break: earlier language in ``langs`` wins.
    """
    best = F.lit("und")
    best_score = F.lit(0)
    # fold right-to-left so earlier langs win ties with strict '>'
    for lang in reversed(langs):
        score = lang_score_expr(text, lang)
        best = F.when(score > best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(score, best_score)
    return best


def fingerprint_expr(text: Column) -> Column:
    """Content digest of the token-normalized text (whitespace-insensitive)."""
    return F.md5(F.concat_ws(" ", tokens_expr(text)))


def min_shingle_fingerprint_expr(text: Column, n: int = 5) -> Column:
    """Winnowing-lite: lexicographic min of hashed word n-grams."""
    toks = tokens_expr(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))
    return F.array_min(shingles)
