"""scoring-similarity — cosine similarity of each parsed page against a
gold-standard document.

Reference: ``src/plugin/scoring-similarity/src/java/org/apache/nutch/
scoring/similarity/cosine/Model.java:49-163`` (gold-standard TF vector +
max cosine over the corpus), ``CosineSimilarity.java:47-82`` (page score
after parsing; every outlink target's score is SET to the parent's
similarity — replacing the OPIC split), ``util/LuceneTokenizer.java``
(STANDARD tokenize → lowercase → stopfilter → Porter stem; ngram mode:
lowercase → stem → word shingles mingram..maxgram with unigrams off and
no stopword filter).

Spark-first shape: the gold vector is tokenized driver-side ONCE and
embedded as a map literal (a single document — a few hundred distinct
terms), so per-row scoring is one JVM expression tree: split → filter →
TF via higher-order functions → dot/norm against the literal map.  No
shuffle, no UDF, scales as a plain projection over 10^10 parsed pages.
The Porter-stem path (the reference default) routes token arrays through
one Arrow-batched pandas UDF — the only non-JVM step, used only when
``stem='porter'``; tokenisation parity holds because the driver-side
gold tokenizer and the executor-side stemmer are the same function.
"""

from __future__ import annotations

import math
import re
from typing import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Lucene StandardAnalyzer's classic English stop set (the reference's
# default StopFilter input, LuceneTokenizer.java:59).
LUCENE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# word characters for the STANDARD-tokenizer stand-in: unicode letters
# and digits; everything else is a break (a pragmatic re-expression of
# UAX#29 word segmentation — cited as an approximation, not a port)
_SPLIT = r"[^\p{L}\p{N}]+"
_SPLIT_PY = re.compile(r"[^\w]+|_+", re.UNICODE)


# ------------------------------------------------------------- porter stem

_V = "aeiou"


def _cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _V:
        return False
    if c == "y":
        return i == 0 or not _cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """The m of Porter's (C)(VC)^m(V) decomposition."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_cons(w, len(w) - 3) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 1) and w[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Classic Porter (1980) — the algorithm behind Lucene's
    PorterStemFilter (``LuceneTokenizer.java:166``).  Words shorter than
    3 chars pass through, per the original implementation."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in (
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ------------------------------------------------------------ tokenisation


def _py_tokens(text: str, stopwords: Sequence[str], ngrams=(1, 1),
               stem: str | None = None) -> list[str]:
    """Driver-side twin of :func:`tokens_expr` — used to build the gold
    vector so both sides tokenize identically."""
    toks = [t for t in _SPLIT_PY.split(text.lower()) if t]
    mi, ma = ngrams
    if mi > 1:
        if stem == "porter":
            toks = [porter_stem(t) for t in toks]
        return [" ".join(toks[i:i + n])
                for n in range(mi, ma + 1)
                for i in range(len(toks) - n + 1)]
    stop = set(stopwords or ())
    toks = [t for t in toks if t not in stop]
    if stem == "porter":
        toks = [porter_stem(t) for t in toks]
    return toks


def _raw_tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _SPLIT), lambda t: t != "")


def _shingles(arr: Column, mi: int, ma: int) -> Column:
    """Word shingles mingram..maxgram, unigrams off
    (LuceneTokenizer.java:144-153)."""
    def _join_at(n: int):
        # NB: must be a 1-arg lambda — a second (defaulted) parameter
        # would make PySpark bind it as the (element, index) form
        return lambda i: F.concat_ws(" ", F.slice(arr, i, n))

    out = None
    for n in range(mi, ma + 1):
        sh = F.when(
            F.size(arr) >= n,
            F.transform(F.sequence(F.lit(1), F.size(arr) - (n - 1)),
                        _join_at(n)),
        ).otherwise(F.array().cast("array<string>"))
        out = sh if out is None else F.concat(out, sh)
    return out


def _stop_filtered(arr: Column, stopwords: Sequence[str]) -> Column:
    stops = F.array(*[F.lit(s) for s in stopwords])
    return F.filter(arr, lambda t: ~F.array_contains(stops, t))


def tokens_expr(text: Column, stopwords: Sequence[str] = LUCENE_STOPWORDS,
                ngrams=(1, 1)) -> Column:
    """JVM token array: split on non-alphanumerics, lowercase, then drop
    stopwords (unigram mode) or emit word shingles (ngram mode — no stop
    filter, matching the reference's ngram token stream)."""
    raw = _raw_tokens(text)
    mi, ma = ngrams
    if mi > 1:
        return _shingles(raw, mi, ma)
    return _stop_filtered(raw, stopwords) if stopwords else raw


def _stemmed(tokens: Column) -> Column:
    """Arrow-batched Porter pass over token arrays (the one non-JVM step,
    only on the ``stem='porter'`` path)."""

    @F.pandas_udf("array<string>")
    def _stem_arr(s: pd.Series) -> pd.Series:
        return s.map(lambda ts: None if ts is None
                     else [porter_stem(t) for t in ts])

    return _stem_arr(tokens)


def gold_vector(text: str, stopwords: Sequence[str] = LUCENE_STOPWORDS,
                ngrams=(1, 1), stem: str | None = None) -> dict[str, int]:
    """Gold-standard TF vector (Model.createModel — one document today,
    ``cosine.goldstandard.file``)."""
    vec: dict[str, int] = {}
    for t in _py_tokens(text, stopwords, ngrams, stem):
        vec[t] = vec.get(t, 0) + 1
    return vec


# ----------------------------------------------------------------- scoring


def similarity_score(df: DataFrame, gold_text: str, text_col: str = "text",
                     out_col: str = "sim_score",
                     stopwords: Sequence[str] = LUCENE_STOPWORDS,
                     ngrams=(1, 1), stem: str | None = None) -> DataFrame:
    """Add ``out_col`` = cosine(page TF, gold TF) in [0, 1].

    Empty/NULL pages score 0.0 (Model.computeCosineSimilarity returns
    maxScore 0 when the 0/0 NaN never beats it).  The whole computation
    is a projection: TF via ``array_distinct``/``transform``/``filter``,
    dot and norm via ``aggregate`` against the gold map literal.
    """
    gold = gold_vector(gold_text, stopwords, ngrams, stem)
    gnorm = math.sqrt(sum(c * c for c in gold.values()))
    if not gold or gnorm == 0:
        return df.withColumn(out_col, F.lit(0.0))
    gmap = F.create_map(
        *[F.lit(x) for t, c in sorted(gold.items())
          for x in (t, float(c))])

    # compose in the reference's order: unigram = lower → stop → stem;
    # ngram = lower → stem → shingle (stemming always precedes shingling)
    raw = _raw_tokens(F.coalesce(F.col(text_col), F.lit("")))
    mi, ma = ngrams
    dropcols = ["_sim_toks"]
    if mi > 1:
        # stage the token array in its own column BEFORE shingling:
        # _join_at slices back into it per gram index, and an inline
        # split/stem expression would be re-evaluated per gram
        # (BENCH.md round-4 finding #3); an attribute slice is linear
        df = df.withColumn(
            "_sim_raw", _stemmed(raw) if stem == "porter" else raw)
        toks = _shingles(F.col("_sim_raw"), mi, ma)
        dropcols.append("_sim_raw")
    else:
        toks = _stop_filtered(raw, stopwords) if stopwords else raw
        if stem == "porter":
            toks = _stemmed(toks)
    df = df.withColumn("_sim_toks", toks)
    t = F.col("_sim_toks")
    uniq = F.array_distinct(t)
    tf = F.transform(
        uniq, lambda u: F.size(F.filter(t, lambda x: x == u)).cast("double"))
    dot = F.aggregate(
        F.zip_with(uniq, tf,
                   lambda u, c: c * F.coalesce(F.try_element_at(gmap, u),
                                               F.lit(0.0))),
        F.lit(0.0), lambda a, x: a + x)
    norm = F.sqrt(F.aggregate(tf, F.lit(0.0), lambda a, c: a + c * c))
    score = F.when(norm > 0, dot / (norm * F.lit(gnorm))).otherwise(0.0)
    return df.withColumn(out_col, score).drop(*dropcols)


def score_outlinks_by_parent(parse_out: DataFrame, page_scores: DataFrame,
                             score_col: str = "sim_score") -> DataFrame:
    """CosineSimilarity.distributeScoreToOutlinks:74-82 — every outlink
    target's score is SET to its parent page's similarity score (the
    OPIC-split value is discarded).  ``page_scores`` is (url, score_col),
    segment-sized → broadcast; LINKED rows join on from_url, other rows
    pass through untouched."""
    from ..status import Msg
    ps = F.broadcast(page_scores.select(
        F.col("url").alias("from_url"),
        F.col(score_col).cast("float").alias("_parent_sim")))
    linked = F.col("status") == int(Msg.LINKED)
    out = parse_out.join(ps, "from_url", "left")
    return out.withColumn(
        "score",
        F.when(linked & F.col("_parent_sim").isNotNull(),
               F.col("_parent_sim")).otherwise(F.col("score"))
    ).drop("_parent_sim").select(*parse_out.columns)
