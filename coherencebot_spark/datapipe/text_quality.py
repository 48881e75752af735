"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything is a JVM column expression (regexp + arithmetic) so the same
logic can run as the DuckDB oracle SQL — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword tables for an n-gram/stopword language
# heuristic (public common-word lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "que", "por"],
}


def _word_hits(text: Column, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary regexp, JVM-side)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(1)))


def with_lang_id(docs: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language hit counts;
    'und' when no stopwords match at all."""
    hits = [
        F.struct(_word_hits(F.col(text_col), ws).alias("n"), F.lit(lang).alias("lang"))
        for lang, ws in STOPWORDS.items()
    ]
    best = F.array_max(F.array(*hits))
    return docs.withColumn(
        out_col, F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def token_count(text: Column) -> Column:
    """Whitespace tokens (the fast proxy for corpus sizing)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword estimate: count matches of a GPT-2-style pretoken
    regexp (words, numbers, punctuation runs)."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality columns (length/punct/stopword/uppercase ratios +
    a combined [0,1] score) — the C4/Gopher-style cheap filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^!?.,;:]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_stop = _word_hits(t, STOPWORDS["en"])
    # true mean word length = non-whitespace chars / words (dividing the
    # RAW char count inflated it by ~1+ per word — the separators counted)
    n_wordchars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_word_len = F.when(n_tokens > 0, n_wordchars / n_tokens) \
        .otherwise(F.lit(0.0))
    df = (
        docs.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("alpha_ratio", F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4))
        .withColumn("upper_ratio", F.round(n_upper / F.greatest(n_alpha, F.lit(1)), 4))
        .withColumn("stopword_ratio",
                    F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4))
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
    )
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.25)
        .otherwise(0.0)
        + F.when((F.col("alpha_ratio") >= 0.6), 0.25).otherwise(0.0)
        + F.when((F.col("punct_ratio") <= 0.1), 0.25).otherwise(0.0)
        + F.when(
            (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), 0.25
        ).otherwise(0.0)
    )
    return df.withColumn("quality_score", F.round(score, 2))


def fingerprint64(text: Column, portable: bool = False) -> Column:
    """Order-sensitive 64-bit document fingerprint: hash chained over each
    whitespace token (a rolling-hash analogue that stays JVM-side: fold
    tokens with hash-combine).

    Default combines with xxhash64 (fast, intrinsic).  ``portable=True``
    folds ``acc' = md5_long60(acc ":" token)`` starting from "0" — the
    exact same fold is expressible in DuckDB as ``list_reduce`` over a
    '0'-prepended token list, putting the chained fingerprint under the
    oracle."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 0)
    if portable:
        return F.aggregate(
            toks,
            F.lit("0"),
            lambda acc, t: F.conv(
                F.substring(
                    F.md5(F.concat(acc, F.lit(":"), t).cast("binary")), 1, 15
                ), 16, 10,
            ).cast("long").cast("string"),
            lambda acc: acc.cast("long"),
        )
    return F.aggregate(
        toks,
        F.lit(-3750763034362895579),  # FNV offset basis as int64
        lambda acc, t: F.xxhash64(acc, F.xxhash64(t)),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text",
                     portable: bool = False) -> DataFrame:
    return docs.withColumn("fingerprint",
                           fingerprint64(F.col(text_col), portable))
