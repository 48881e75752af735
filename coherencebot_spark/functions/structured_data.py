"""any23 plugin — structured-data (RDF triple) extraction + indexing.

The reference wraps the Apache Any23 library to pull RDF triples out of
web documents and index them as ``structured_data`` maps:

* ``plugin/any23/.../Any23ParseFilter.java:74-168`` — runs the configured
  Any23 extractors over the raw HTML, serializes the result as N-Triples,
  splits on ``\\n`` and stores the lines as a *sorted set*
  (``TreeSet``, :76) in the multi-valued ``Any23-Triples`` parse-metadata
  key; documents whose content type is not in ``any23.content_types``
  (default ``text/html``, ``application/xhtml+xml``) pass through
  untouched (:144-149).
* ``plugin/any23/.../Any23IndexingFilter.java:86-117`` — re-parses each
  stored triple line with ``^([^ ]+) ([^ ]+) (.+) \\.`` into a
  ``{node, key, short_key, value}`` map added to the ``structured_data``
  field; lines that don't match are skipped.  ``short_key`` strips the
  angle brackets and keeps the last ``/``-segment's last ``#``-segment
  (``keyToShortKey``, :109-117).

Any23 itself is a large RDF library with ~20 extractors; re-expressing
all of it is out of scope.  This module implements the three extractors
the engine's corpus can exercise, each as pure Catalyst expressions
(``regexp_extract_all`` + higher-order functions — no Python in the row
path, the extraction is a Project over the content scan):

* ``html-head-title`` — ``<title>`` → ``<url> <dcterms:title> "..." .``
* ``html-head-meta``  — ``<meta name=... content=...>`` →
  ``<url> <http://vocab.sindice.net/any23#NAME> "CONTENT" .`` (the
  Any23 HTMLMetaExtractor vocabulary).
* ``html-microdata``  — FLAT (non-nested) microdata items:
  each ``itemscope`` element becomes a blank node ``_:nodeK`` in document
  order; every ``itemprop`` element inside it (up to the next
  ``itemscope``) yields one triple.  Property URI = the item's
  ``itemtype`` vocabulary (text up to and including the last ``/`` or
  ``#``) + property name, or ``http://www.w3.org/1999/xhtml/microdata#``
  + name when the item has no ``itemtype`` (the W3C microdata-RDF
  fallback vocabulary).  Value rules follow the HTML microdata spec:
  ``meta``→content, ``img/audio/video/source/embed/iframe``→src (URL),
  ``a/area/link``→href (URL), ``time``→datetime attr else text,
  ``data``→value attr, anything else→its text content up to the first
  nested tag.  URL-valued properties resolve absolute and root-relative
  references against the page URL and serialize as ``<...>``; everything
  else is an escaped literal.  Documented deltas from Any23's DOM walk:
  nested itemscopes are attributed to the OUTER item, itemref is not
  supported, and text values stop at nested markup.

Triples are N-Triples lines; the set is deduplicated and sorted
(TreeSet semantics) before landing in the ``any23_triples`` array column
(the array-column analogue of the multi-valued ``Any23-Triples``
metadata key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .html_fields import _META_TAG, _attr

__all__ = [
    "extract_any23_triples",
    "any23_parse_filter",
    "any23_indexing_filter",
    "ANY23_DEFAULT_EXTRACTORS",
    "ANY23_DEFAULT_CONTENT_TYPES",
]

# Any23ParseFilter.java:142 default is "html-head-meta"; the reference's
# test config enables the full registry — we default to everything this
# module implements.
ANY23_DEFAULT_EXTRACTORS = ("html-head-title", "html-head-meta",
                            "html-microdata")
ANY23_DEFAULT_CONTENT_TYPES = ("text/html", "application/xhtml+xml")

_META_VOCAB = "http://vocab.sindice.net/any23#"
_MD_VOCAB = "http://www.w3.org/1999/xhtml/microdata#"
_TITLE_PRED = "<http://purl.org/dc/terms/title>"


def _nt_escape(s: Column) -> Column:
    """N-Triples literal escaping (backslash first)."""
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    s = F.replace(s, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\n"), F.lit("\\n"))
    s = F.replace(s, F.lit("\r"), F.lit("\\r"))
    return F.replace(s, F.lit("\t"), F.lit("\\t"))


def _literal(s: Column) -> Column:
    return F.concat(F.lit('"'), _nt_escape(s), F.lit('"'))


def _clean_text(s: Column) -> Column:
    """Collapse whitespace + trim (Any23 normalizes extracted text)."""
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def _resolve(ref: Column, base: Column) -> Column:
    """Absolute / root-relative / directory-relative URL resolution
    (the subset the CC filter uses, plus relative-to-directory — enough
    for microdata src/href values on the synthetic corpus)."""
    origin = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*://[^/]+)", 1)
    dirpart = F.regexp_extract(base, r"^(.*/)[^/]*$", 1)
    return (F.when(ref.rlike(r"(?i)^[a-z][a-z0-9+.-]*://"), ref)
             .when(ref.startswith("/"), F.concat(origin, ref))
             .otherwise(F.concat(
                 F.when(dirpart == "", F.concat(base, F.lit("/")))
                  .otherwise(dirpart), ref)))


# one itemprop-carrying element + its immediate text content (up to the
# first nested tag); group structure consumed positionally via group 0
_ITEMPROP_EL = r"(?is)<([a-z][a-z0-9]*)\b([^>]*\bitemprop\b[^>]*)>([^<]*)"
_URL_TAGS = ("img", "audio", "video", "source", "embed", "iframe",
             "a", "area", "link")


def _microdata_triples(html: Column, url: Column) -> Column:
    """array<string> of N-Triples for flat microdata items (see module
    docstring for the documented subset)."""
    # chunk k (0-based, k>=1) = markup following the k-th "itemscope"
    # token: its own tag's remaining attributes (itemtype lives there)
    # + the item's properties, until the next itemscope
    chunks = F.split(html, r"(?i)\bitemscope\b")
    items = F.slice(chunks, 2, F.greatest(F.size(chunks) - 1, F.lit(0)))

    def per_item(chunk: Column, i: Column) -> Column:
        itemtype = F.regexp_extract(
            chunk, r'(?is)^[^>]*\bitemtype\s*=\s*["\']([^"\']*)["\']', 1)
        # vocabulary prefix: itemtype up to and incl. the last / or #
        vocab = F.when(
            itemtype == "", F.lit(_MD_VOCAB)
        ).otherwise(
            F.when(itemtype.rlike(r"[/#]$"), itemtype)
             .otherwise(F.concat(itemtype, F.lit("/"))))
        subject = F.concat(F.lit("_:node"), i.cast("string"))
        els = F.regexp_extract_all(chunk, F.lit(_ITEMPROP_EL), 0)

        def per_prop(el: Column) -> Column:
            tag = F.lower(F.regexp_extract(el, _ITEMPROP_EL, 1))
            attrs = F.regexp_extract(el, _ITEMPROP_EL, 2)
            text = F.regexp_extract(el, _ITEMPROP_EL, 3)
            name = _attr(attrs, "itemprop")
            src = _attr(attrs, "src")
            href = _attr(attrs, "href")
            dt = _attr(attrs, "datetime")
            dval = _attr(attrs, "value")
            content = _attr(attrs, "content")
            is_url = (tag.isin(*_URL_TAGS)
                      & (F.when(tag.isin("a", "area", "link"), href)
                          .otherwise(src) != ""))
            obj = (
                F.when(tag == "meta", _literal(content))
                 .when(is_url & tag.isin("a", "area", "link"),
                       F.concat(F.lit("<"), _resolve(href, url), F.lit(">")))
                 .when(is_url,
                       F.concat(F.lit("<"), _resolve(src, url), F.lit(">")))
                 .when((tag == "time") & (dt != ""), _literal(dt))
                 .when((tag == "data") & (dval != ""), _literal(dval))
                 .otherwise(_literal(_clean_text(text))))
            return F.when(
                name == "", F.lit(None).cast("string")
            ).otherwise(F.concat(
                subject, F.lit(" <"), vocab, name, F.lit("> "),
                obj, F.lit(" .")))

        return F.filter(F.transform(els, per_prop),
                        lambda t: t.isNotNull())

    # i is the 0-based document-order item index (Any23's bnode counter)
    nested = F.zip_with(
        items,
        F.sequence(F.lit(0), F.greatest(F.size(items) - 1, F.lit(0))),
        per_item)
    return F.when(F.size(items) > 0, F.flatten(nested)) \
            .otherwise(F.array().cast("array<string>"))


def extract_any23_triples(
        html: Column, url: Column,
        extractors: Sequence[str] = ANY23_DEFAULT_EXTRACTORS) -> Column:
    """``array<string>`` of N-Triples lines, deduplicated and sorted —
    the TreeSet the reference accumulates (Any23ParseFilter.java:76,120).
    """
    subject = F.concat(F.lit("<"), url, F.lit(">"))
    parts: list[Column] = []
    if "html-head-title" in extractors:
        title = _clean_text(F.regexp_extract(
            html, r"(?is)<title[^>]*>(.*?)</title>", 1))
        parts.append(F.when(title == "", F.array().cast("array<string>"))
                      .otherwise(F.array(F.concat(
                          subject, F.lit(" " + _TITLE_PRED + " "),
                          _literal(title), F.lit(" .")))))
    if "html-head-meta" in extractors:
        blobs = F.regexp_extract_all(html, F.lit(_META_TAG), 1)
        metas = F.filter(
            F.transform(blobs, lambda b: F.struct(
                _attr(b, "name").alias("k"),
                _attr(b, "content").alias("v"))),
            lambda e: (e["k"] != "") & (e["v"] != ""))
        parts.append(F.transform(metas, lambda e: F.concat(
            subject, F.lit(" <" + _META_VOCAB), e["k"], F.lit("> "),
            _literal(e["v"]), F.lit(" ."))))
    if "html-microdata" in extractors:
        parts.append(_microdata_triples(html, url))
    if not parts:
        return F.array().cast("array<string>")
    allt = parts[0]
    for p in parts[1:]:
        allt = F.concat(allt, p)
    return F.array_sort(F.array_distinct(allt))


def any23_parse_filter(
        extractors: Sequence[str] = ANY23_DEFAULT_EXTRACTORS,
        content_types: Sequence[str] = ANY23_DEFAULT_CONTENT_TYPES,
        html_col: str = "html", url_col: str = "url",
        ctype_col: str | None = None, out_col: str = "any23_triples"):
    """Parse-filter transform: add the sorted triple set as ``out_col``.

    ``ctype_col``: when given, rows whose content type is not in
    ``content_types`` get an EMPTY set and pass through otherwise
    untouched (Any23ParseFilter.java:144-149's unsupported-type skip).
    """
    types = [t for t in content_types]

    def _apply(df: DataFrame) -> DataFrame:
        triples = extract_any23_triples(
            F.col(html_col), F.col(url_col), extractors)
        if ctype_col is not None:
            triples = F.when(F.col(ctype_col).isin(types), triples) \
                       .otherwise(F.array().cast("array<string>"))
        return df.withColumn(out_col, triples)

    return _apply


# the reference regex, anchored find (Any23IndexingFilter.java:91)
_TRIPLE_RE = r"^([^ ]+) ([^ ]+) (.+) \."


def _short_key(key: Column) -> Column:
    """keyToShortKey (Any23IndexingFilter.java:109-117): strip <>, last
    ``/`` part, then last ``#`` part."""
    stripped = F.when(
        key.rlike(r"^<.*>$"), F.regexp_extract(key, r"^<(.*)>$", 1)
    ).otherwise(key)
    last_slash = F.element_at(F.split(stripped, "/"), -1)
    return F.element_at(F.split(last_slash, "#"), -1)


def any23_indexing_filter(triples_col: str = "any23_triples",
                          out_col: str = "structured_data"):
    """Indexing filter: triples → multi-valued ``structured_data``
    ``array<struct<node,key,short_key,value>>`` (the reference adds one
    map per triple; a struct array is the columnar analogue).  Lines that
    don't match the triple regex are skipped (:105 warn-and-drop)."""

    def _apply(doc: DataFrame) -> DataFrame:
        if triples_col not in doc.columns:
            return doc
        triples = F.coalesce(F.col(triples_col),
                             F.array().cast("array<string>"))
        matched = F.filter(triples, lambda t: t.rlike(_TRIPLE_RE))
        entries = F.transform(matched, lambda t: F.struct(
            F.regexp_extract(t, _TRIPLE_RE, 1).alias("node"),
            F.regexp_extract(t, _TRIPLE_RE, 2).alias("key"),
            _short_key(F.regexp_extract(t, _TRIPLE_RE, 2))
            .alias("short_key"),
            F.regexp_extract(t, _TRIPLE_RE, 3).alias("value")))
        return doc.withColumn(out_col, entries)

    return _apply
