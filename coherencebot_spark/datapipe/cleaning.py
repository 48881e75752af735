"""Heuristic corpus cleaning: the full Gopher quality rule set and
C4-style line-level cleaning.

Two public-recipe passes every large-scale text pipeline runs before
dedup/mixing (both are described in their papers; nothing here touches
the reference engine):

* **Gopher quality rules** (Rae et al. 2021, appendix A1.1) — document
  gates: word count in [50, 100k], mean word length in [3, 10],
  symbol-to-word ratio (``#``/ellipsis) <= 0.1, < 90% of lines starting
  with a bullet, <= 30% of lines ending with an ellipsis, >= 80% of
  words containing an alphabetic character, and at least 2 of the 8
  English "stop words" (the, be, to, of, and, that, have, with).
  Complements :mod:`.repetition` (the same paper's repetition rules).

* **C4 cleaning** (Raffel et al. 2020, §2.2) — line gates: keep only
  lines that end in terminal punctuation AND have >= ``min_line_words``
  words, drop lines containing the word "javascript"; then page gates:
  drop pages containing "lorem ipsum" or a curly brace, pages matching a
  caller-supplied badword list, and pages with fewer than
  ``min_sentences`` sentences after line cleaning.

Everything is a Catalyst Project over the text scan — ``split`` /
``filter`` / ``regexp`` array expressions, no Python in the row path, no
shuffle, and no UDF.  Every predicate stays inside the RE2-compatible
regexp subset so the DuckDB twin can evaluate the SAME pattern strings:
both passes run under the hard oracle (`__spark_entry__.py`
gopher_quality / c4_clean).

100 TB shape: a pure narrow Project — whole-stage codegen, zero
exchanges; the filters combine with the scan and any downstream
predicate pushes through them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "GOPHER_STOPWORDS", "gopher_quality_columns", "gopher_quality_filter",
    "c4_clean_lines",
]

# the paper's 8-word English presence test (public list, quoted verbatim
# in the Gopher paper's appendix)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^\s*[-*•‣▪]"   # -, *, •, ‣, ▪
_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def _words(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: F.length(w) > 0)


def _lines(text: Column) -> Column:
    return F.filter(F.split(text, r"\n"),
                    lambda l: F.length(F.trim(l)) > 0)


def gopher_quality_columns(text: Column) -> dict[str, Column]:
    """The seven Gopher measurements as named columns (undouble for
    reuse in monitoring rollups; each is a pure array/regexp expr)."""
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    wf = n_words.cast("double")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda a, w: a + F.length(w)).cast("double") / wf
    ).otherwise(F.lit(0.0))
    n_sym = (F.size(F.regexp_extract_all(text, F.lit(r"#"), F.lit(0)))
             + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"),
                                           F.lit(0))))
    sym_ratio = F.when(n_words > 0, n_sym.cast("double") / wf) \
        .otherwise(F.lit(0.0))
    bullet_frac = F.size(F.filter(
        lines, lambda l: l.rlike(_BULLET_RE))).cast("double") / n_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda l: l.rlike(_ELLIPSIS_RE))).cast("double") / n_lines
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
        .cast("double") / wf).otherwise(F.lit(0.0))
    n_stop = sum(
        (F.when(F.lower(text).rlike(r"\b" + w + r"\b"), 1).otherwise(0)
         for w in GOPHER_STOPWORDS),
        F.lit(0))
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_stopwords": n_stop.cast("int"),
    }


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_ratio: float = 0.1,
                          max_bullet_frac: float = 0.9,
                          max_ellipsis_frac: float = 0.3,
                          min_alpha_frac: float = 0.8,
                          min_stopwords: int = 2,
                          keep_col: str = "keep",
                          with_metrics: bool = True) -> DataFrame:
    """Append the Gopher quality measurements and the conjunction keep
    flag (paper defaults).  ``with_metrics=False`` appends only the flag.
    """
    cols = gopher_quality_columns(F.col(text_col))
    out = df
    if with_metrics:
        # metrics are rounded for display/oracle stability; the keep flag
        # always evaluates the UNROUNDED expressions so a boundary value
        # can't flip between with_metrics modes
        for name, c in cols.items():
            if name in ("mean_word_len", "symbol_ratio", "bullet_line_frac",
                        "ellipsis_line_frac", "alpha_word_frac"):
                c = F.round(c, 6)
            out = out.withColumn(name, c)
    m = cols
    keep = (
        (m["n_words"] >= min_words) & (m["n_words"] <= max_words)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
        & (m["symbol_ratio"] <= max_symbol_ratio)
        & (m["bullet_line_frac"] < max_bullet_frac)
        & (m["ellipsis_line_frac"] <= max_ellipsis_frac)
        & (m["alpha_word_frac"] >= min_alpha_frac)
        & (m["n_stopwords"] >= min_stopwords)
    )
    return out.withColumn(keep_col, keep)


_TERMINAL_RE = r'[.!?"”]\s*$'
_SENTENCE_RE = r"[.!?]"


def c4_clean_lines(df: DataFrame, text_col: str = "text",
                   min_line_words: int = 5,
                   min_sentences: int = 3,
                   badwords: Sequence[str] = (),
                   out_col: str = "clean_text",
                   keep_col: str = "keep") -> DataFrame:
    """C4 line+page cleaning; appends ``out_col`` (retained lines joined
    with newline), ``n_lines`` / ``n_lines_kept`` / ``n_sentences``
    counters, and the page-level ``keep_col``.

    Line is retained iff it ends in terminal punctuation (., !, ?, " or
    ”), has >= ``min_line_words`` whitespace words, and does not contain
    the word "javascript" (case-insensitive).  Page is kept iff the raw
    text has no "lorem ipsum" and no curly brace, no badword-list match,
    and the CLEANED text still has >= ``min_sentences`` sentence-final
    punctuation marks.
    """
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL_RE)
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"),
                           lambda w: F.length(w) > 0)) >= min_line_words)
        & ~F.lower(l).rlike(r"\bjavascript\b"))
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(_SENTENCE_RE),
                                         F.lit(0)))
    page_ok = (~F.lower(t).contains("lorem ipsum")
               & ~t.contains("{") & ~t.contains("}"))
    if badwords:
        pat = r"(?i)\b(" + "|".join(badwords) + r")\b"
        page_ok = page_ok & ~t.rlike(pat)
    return (df
            .withColumn(out_col, clean)
            .withColumn("n_lines", F.size(F.filter(
                lines, lambda l: F.length(F.trim(l)) > 0)))
            .withColumn("n_lines_kept", F.size(kept))
            .withColumn("n_sentences", n_sent)
            .withColumn(keep_col, page_ok & (n_sent >= min_sentences)))
