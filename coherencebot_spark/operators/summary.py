"""text-summarizer — the fork's extractive summary index filter.

Reference: ``src/plugin/text-summarizer/.../TextSummarizer.java:35-153``
(field precedence, clean pass, PDF heading, length fields) and
``SummaryTool.java:24-158`` (sentence extraction, common-word
intersection matrix, top-N in reading order), ``Sentence.java`` /
the two comparators (score rank, stable ties → reading order).

The sentence scorer is O(sentences² · words²) per document — inherently
per-row imperative, so it runs as ONE Arrow-batched pandas UDF over the
parse text (capped at 499 sentences × 400 chars by the reference's own
constants, which bounds the batch cost).  Everything around it — field
precedence, fallbacks, length fields — stays JVM expressions.
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SUMMARY_SENTENCES = 5   # TextSummarizer.MAX_SUMMARY_LENGTH
MAX_CANDIDATES = 500        # SummaryTool constants
MAX_SENTENCE_LENGTH = 400
MIN_SENTENCE_LENGTH = 20
MAX_HEADING_CANDIDATES = 20
MIN_HEADING_LENGTH = 15
MAX_HEADING_LENGTH = 100

_URL_RE = re.compile(r"https?://[-a-zA-Z0-9+&@#/%?=~_|!:,.;]*"
                     r"[-a-zA-Z0-9+&@#/%=~_|]")
_WS_RE = re.compile(r"\s+")
_SENT_SPLIT = re.compile(r"\.\s+")


def _pdf_spacing(text: str) -> str:
    """SummaryTool ctor (:28): PDF extracts often lack the space between
    sentences — insert one after any period followed by an uppercase
    letter (``isupper()`` is the unicode \\p{Lu} test)."""
    return re.sub(
        r"\.(\S)",
        lambda m: ". " + m.group(1) if m.group(1).isupper() else m.group(0),
        text)


def _sentences(text: str) -> list[str]:
    """extractSentencesFromContext (:42-59): split on ``\\.\\s+`` with
    the 500 limit, first 499 candidates, truncate > 400 chars, skip
    < 20 chars BEFORE trimming, then trim and re-append the period."""
    raw = _SENT_SPLIT.split(text, maxsplit=MAX_CANDIDATES - 1)
    out = []
    for s in raw[:MAX_CANDIDATES - 1]:
        if len(s) > MAX_SENTENCE_LENGTH:
            s = s[:MAX_SENTENCE_LENGTH]
        if len(s) < MIN_SENTENCE_LENGTH:
            continue
        out.append(s.strip() + ".")
    return out


def summarize_text(text: str | None,
                   count: int = MAX_SUMMARY_SENTENCES) -> str:
    """createSummary (:114-136): score each sentence by its common-word
    intersection with every sentence (self included) normalised by the
    average word count, keep the top ``count`` by score (stable ties =
    reading order), emit in reading order joined by `` [...] ``."""
    if not text:
        return ""
    text = _pdf_spacing(text.replace("�", ""))
    sents = _sentences(text)
    if not sents:
        return ""
    words = [s.split() for s in sents]
    counters = [Counter(w.lower() for w in ws) for ws in words]
    scores = []
    for i, ci in enumerate(counters):
        score = 0.0
        for j, cj in enumerate(counters):
            common = sum(n * cj[w] for w, n in ci.items())
            score += common / ((len(words[i]) + len(words[j])) / 2.0)
        scores.append(score)
    order = sorted(range(len(sents)), key=lambda i: -scores[i])[:count]
    return " [...] ".join(sents[i] for i in sorted(order)).strip()


def clean_summary(text: str) -> str:
    """TextSummarizer.clean (:142-153): strip links, non-printables
    (\\p{C} — unicode category C*), collapse whitespace."""
    if not text:
        return text
    text = _URL_RE.sub(" ", text)
    text = "".join(
        " " if unicodedata.category(c).startswith("C") else c for c in text)
    return _WS_RE.sub(" ", text).strip()


def extract_heading(text: str | None) -> str | None:
    """SummaryTool.extractHeading (:141-158): first of the leading 19
    lines with 15 ≤ len ≤ 100 after trimming; a longer line aborts."""
    if not text:
        return None
    text = _pdf_spacing(text.replace("�", ""))
    for line in text.split("\n", MAX_HEADING_CANDIDATES - 1)[
            :MAX_HEADING_CANDIDATES - 1]:
        line = line.strip()
        if len(line) > MAX_HEADING_LENGTH:
            break
        if len(line) >= MIN_HEADING_LENGTH:
            return line + " [from PDF text]"
    return None


def summary_filter(text_col: str = "text",
                   count: int = MAX_SUMMARY_SENTENCES,
                   heading_min_text: int = 4000):
    """The IndexingFilter (TextSummarizer.filter:35-133) as a doc
    transform.

    Field precedence for an existing summary: the ``summary`` column,
    else ``parse_meta['metatag.description']``, else
    ``parse_meta['metatag.twitter:description']`` (metatag fields live
    in the parse-metadata map in this engine); the metatag keys are
    dropped from the map when the result is empty and a fresh summary is
    generated from the parse text (then cleaned).  A ``heading`` is
    extracted for ``application/pdf`` docs with > 4000 chars of text.
    ``contentLength`` is filled when absent; ``titleLength`` /
    ``headingLength`` / ``anchorLength`` are always (re)computed.
    """
    _META_KEYS = ("metatag.description", "metatag.twitter:description")

    @F.pandas_udf("string")
    def _summ(s: pd.Series) -> pd.Series:
        return s.map(lambda t: clean_summary(summarize_text(t, count)))

    @F.pandas_udf("string")
    def _head(s: pd.Series) -> pd.Series:
        return s.map(extract_heading)

    def _col(doc: DataFrame, name: str):
        return F.col(name) if name in doc.columns else F.lit(None).cast(
            "string")

    def _apply(doc: DataFrame) -> DataFrame:
        text = F.coalesce(_col(doc, text_col), F.lit(""))
        meta = (F.coalesce(F.col("parse_meta"),
                           F.create_map().cast("map<string,string>"))
                if "parse_meta" in doc.columns
                else F.create_map().cast("map<string,string>"))
        existing = F.coalesce(
            F.nullif(_col(doc, "summary"), F.lit("")),
            *[F.nullif(F.try_element_at(meta, F.lit(k)), F.lit(""))
              for k in _META_KEYS],
            F.lit(""))
        # materialize the decision before the summary column is replaced
        # — F.col("summary") inside `existing` resolves by NAME, so a
        # later reference would see the freshly generated value
        doc = doc.withColumn("_sum_need", existing == "")
        need = F.col("_sum_need")
        doc = doc.withColumn(
            "summary",
            F.when(~need, existing).otherwise(
                F.nullif(_summ(text), F.lit(""))))
        if "parse_meta" in doc.columns:
            # removeField on the empty-summary path (:56-61)
            keys = F.array(*[F.lit(k) for k in _META_KEYS])
            doc = doc.withColumn(
                "parse_meta",
                F.when(need, F.map_filter(
                    meta, lambda k, _: ~F.array_contains(keys, k)))
                 .otherwise(F.col("parse_meta")))

        mime = F.lower(F.coalesce(_col(doc, "type"), F.lit("")))
        head_ok = ((_col(doc, "heading").isNull())
                   & (mime == "application/pdf")
                   & (F.length(text) > heading_min_text))
        doc = doc.withColumn(
            "heading",
            F.when(head_ok, _head(text)).otherwise(_col(doc, "heading")))

        if "contentLength" in doc.columns:
            cl = F.when(F.col("contentLength").isNull()
                        & (F.length(text) > 0),
                        F.length(text)).otherwise(F.col("contentLength"))
        else:
            cl = F.when(F.length(text) > 0, F.length(text))
        doc = doc.withColumn("contentLength", cl.cast("int"))
        for fld, src in (("titleLength", "title"),
                         ("headingLength", "heading"),
                         ("anchorLength", "anchor")):
            doc = doc.withColumn(
                fld,
                F.coalesce(F.length(_col(doc, src)),
                           F.lit(0)).cast("int"))
        return doc.drop("_sum_need")

    return _apply
