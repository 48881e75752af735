"""Repetition-based quality filters — the "Gopher rules" family.

Published corpus-quality heuristics (Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", 2021,
Appendix A1.1 — public literature, reused by MassiveText / RefinedWeb /
Dolma): documents dominated by repeated lines, paragraphs, or n-grams
are boilerplate (menus, listings, spam) and are dropped before
training.  Metrics implemented:

* ``duplicate_line_fraction``       — duplicate lines / total lines;
* ``duplicate_line_char_fraction``  — characters inside duplicate lines
  / total characters (a doc with one huge repeated block scores high
  even when line COUNTS look tame);
* ``top_bigram_char_fraction``      — characters covered by the most
  frequent word 2-gram / total word characters (Gopher's top-n-gram
  rule at n=2);
* ``gopher_repetition_filter``      — the keep predicate at the paper's
  thresholds (dup lines 0.30, dup line chars 0.20, top 2-gram 0.20 —
  A1.1's table), each overridable.

Shape: pure Catalyst higher-order functions over a split-lines /
split-words array — a Project over the text scan, no UDF, no shuffle.
The top-bigram mode search is O(distinct² ) per document in the HOF
form; word counts per document are bounded (the token-count gate runs
first in a real pipeline), and the expression stays inside codegen —
measured faster than an Arrow round-trip at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "duplicate_line_fraction",
    "duplicate_line_char_fraction",
    "top_bigram_char_fraction",
    "gopher_repetition_filter",
]


def _lines(text: Column) -> Column:
    return F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")


def duplicate_line_fraction(text: Column) -> Column:
    """(lines - distinct lines) / lines; 0.0 for empty docs."""
    ls = _lines(text)
    n = F.size(ls)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(ls))).cast("double") / n)


def duplicate_line_char_fraction(text: Column) -> Column:
    """Characters belonging to lines that occur more than once, divided
    by all line characters (every occurrence of a duplicated line
    counts, matching the Gopher definition)."""
    ls = _lines(text)
    dup_chars = F.aggregate(
        ls, F.lit(0).cast("long"),
        lambda acc, l: acc + F.when(
            F.size(F.filter(ls, lambda o: o == l)) > 1, F.length(l)
        ).otherwise(F.lit(0)).cast("long"))
    total = F.aggregate(ls, F.lit(0).cast("long"),
                        lambda acc, l: acc + F.length(l).cast("long"))
    return F.when(total <= 0, F.lit(0.0)) \
        .otherwise(dup_chars.cast("double") / total)


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def top_bigram_char_fraction(text: Column) -> Column:
    """Characters covered by the most frequent word bigram / total word
    characters.  Every occurrence of the top bigram counts its two
    words' lengths once each (overlaps allowed, per the paper's
    'fraction of characters contained in the most frequent n-gram')."""
    ws = _words(text)
    n = F.size(ws)
    bi = F.zip_with(F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
                    F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b))
    counts = F.transform(
        F.array_distinct(bi),
        lambda x: F.struct(
            F.size(F.filter(bi, lambda y: y == x)).alias("c"),
            F.length(x).alias("len")))
    # the most frequent bigram; ties resolved toward the LONGER one is
    # not specified by the paper — struct max orders by (count, length)
    top = F.array_max(counts)
    total = F.aggregate(ws, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w).cast("long"))
    covered = top["c"].cast("long") * (top["len"] - 1)  # minus the space
    return F.when((n < 2) | (total <= 0), F.lit(0.0)) \
        .otherwise(covered.cast("double") / total)


def gopher_repetition_filter(df: DataFrame, text_col: str = "text",
                             max_dup_line_frac: float = 0.30,
                             max_dup_line_char_frac: float = 0.20,
                             max_top_bigram_char_frac: float = 0.20,
                             keep_col: str | None = None) -> DataFrame:
    """Apply the three thresholds; with ``keep_col`` the decision lands
    as a boolean column instead of filtering (for audit passes)."""
    t = F.col(text_col)
    keep = ((duplicate_line_fraction(t) <= max_dup_line_frac)
            & (duplicate_line_char_fraction(t) <= max_dup_line_char_frac)
            & (top_bigram_char_fraction(t) <= max_top_bigram_char_frac))
    if keep_col:
        return df.withColumn(keep_col, keep)
    return df.filter(keep)
