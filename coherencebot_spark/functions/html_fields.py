"""HTML field-extraction parse filters — the reference's DOM-walking
plugins re-expressed as pure JVM column expressions.

Covers four reference plugins that walk the parse DOM and land fields in
``parse_meta`` / the index doc:

* **headings** (``plugin/headings/.../HeadingsParseFilter.java:48-112``):
  per configured tag (h1, h2, ...) collect the element's text content —
  nested markup stripped, whitespace collapsed (``:42``), trimmed, empties
  dropped (``:57-63``); first element only unless ``headings.multivalued``
  (``:100-103``).
* **parse-metatags** (``plugin/parse-metatags/.../MetaTagsParser.java:
  69-107``): promote ``<meta name=... content=...>`` (multi-add, document
  order) and ``<meta http-equiv=... content=...>`` (``Properties``
  last-wins — ``parse-html/.../HTMLMetaProcessor.java:83-124``) to
  ``metatag.<lowercased name>`` keys, filtered by ``metatags.names``
  (``*`` = all).
* **microformats-reltag** (``.../reltag/RelTagParser.java:60-135``):
  anchors carrying ``rel="tag"`` (case-insensitive value) and an ABSOLUTE
  href (``new URL(href)`` — relative hrefs throw and are skipped, :126);
  the tag is the URL-decoded last path segment (:128-130), empties
  dropped, set-deduped in sorted order (``TreeSet``, :80).
* **creativecommons** (``.../nutch/CCParseFilter.java:80-116,141-258``):
  license URL by priority — RDF-in-comment subject (``rdf:about`` of a
  ``cc:License`` inside a comment naming RDF + the CC namespace), then
  ``<a rel="license">``, then any anchor pointing at
  ``http://creativecommons.org/licenses/...`` — with the location tag
  ``rdf``/``rel``/``a`` and the ``cc:Work`` ``dc:type`` work type;
  ``CCIndexingFilter.java:53-115`` then fans the URL into ``cc`` features
  (``license=<url>``, the path components split on ``/-``, ``meta=<loc>``,
  the work type).

Everything here is a Catalyst expression (regexp_extract_all + transform /
filter / aggregate higher-order functions) — no Python UDFs, so the
extraction stays inside whole-stage codegen and scales as a Project over
the content scan.  Deliberate deltas from the DOM walkers, noted per
function: regex tag scanning does not honor commented-out markup, and the
CC anchor path resolves only absolute and root-relative hrefs (the
reference resolves any relative href against ``<base>``; a relative CC
license link off creativecommons.org cannot satisfy the host check
anyway).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------- headings


def extract_headings(html: Column, tag: str = "h1",
                     multivalued: bool = False) -> Column:
    """``array<string>`` of heading texts for one tag.

    HeadingsParseFilter.getElement/getNodeValue: text of the element
    including nested children (markup stripped), ``\\s+`` collapsed to a
    single space, trimmed; non-multivalued keeps only the FIRST element
    (even if that first one is empty and then dropped, :100-103 breaks
    before looking further).
    """
    raw = F.regexp_extract_all(
        html, F.lit(rf"(?is)<{tag}(?:\s[^>]*)?>(.*?)</{tag}\s*>"), 1)
    texts = F.transform(
        raw,
        lambda x: F.trim(F.regexp_replace(
            F.regexp_replace(x, r"<[^>]*>", ""), r"\s+", " ")))
    picked = texts if multivalued else F.slice(texts, 1, 1)
    return F.filter(picked, lambda x: x != F.lit(""))


def headings_filter(tags: Sequence[str] = ("h1", "h2"),
                    multivalued: bool = False,
                    html_col: str = "html"):
    """Parse-filter transform: one ``array<string>`` column per tag name
    (the parse_meta key the reference uses is the tag name itself)."""

    def _apply(df: DataFrame) -> DataFrame:
        for t in tags:
            df = df.withColumn(
                t, extract_headings(F.col(html_col), t, multivalued))
        return df

    return _apply


# --------------------------------------------------------------- metatags

# one <meta ...> tag's attribute blob; attr extractors below handle both
# quote kinds.  Self-closing slashes ride along harmlessly.
_META_TAG = r"(?is)<meta\s([^>]*?)/?>"


def _attr(blob: Column, name: str) -> Column:
    """First ``name="value"`` / ``name='value'`` attribute value in an
    attribute blob (empty string when absent — regexp_extract contract)."""
    dq = F.regexp_extract(blob, rf'(?i){name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(blob, rf"(?i){name}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(blob, rf"(?i){name}\s*=\s*([^\s\"'>]+)", 1)
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def extract_metatags(html: Column, names: Sequence[str] = ("*",),
                     sep: str = "\t") -> Column:
    """``map<string,string>`` of ``metatag.<name>`` → values.

    General (``name=``) tags append every occurrence in document order
    (``Metadata.add``); ``http-equiv`` tags keep the LAST occurrence
    (``Properties.setProperty``) and append after the general values of
    the same key, mirroring MetaTagsParser.filter's two passes (:69-107).
    Multiple values join on ``sep`` (the map-column analogue of a
    multi-valued Metadata key; ``indexing.metadata_filter`` re-splits).
    ``names`` filters lowercased keys, ``("*",)`` keeps everything.
    """
    blobs = F.regexp_extract_all(html, F.lit(_META_TAG), 1)
    gen = F.filter(
        F.transform(blobs, lambda b: F.struct(
            F.lower(_attr(b, "name")).alias("key"),
            _attr(b, "content").alias("value"))),
        lambda e: (e["key"] != "") & (e["value"] != ""))
    equiv = F.filter(
        F.transform(blobs, lambda b: F.struct(
            F.lower(_attr(b, "http-equiv")).alias("key"),
            _attr(b, "content").alias("value"))),
        lambda e: (e["key"] != "") & (e["value"] != ""))
    wanted = [n.lower() for n in names]
    if "*" not in wanted:
        keep = F.array(*[F.lit(n) for n in wanted])
        gen = F.filter(gen, lambda e: F.array_contains(keep, e["key"]))
        equiv = F.filter(equiv, lambda e: F.array_contains(keep, e["key"]))
    # per-key fold: general values in order, then the last http-equiv
    keys = F.array_distinct(F.concat(
        F.transform(gen, lambda e: e["key"]),
        F.transform(equiv, lambda e: e["key"])))
    entries = F.transform(keys, lambda k: F.struct(
        F.concat(F.lit("metatag."), k).alias("key"),
        F.array_join(F.concat(
            F.transform(F.filter(gen, lambda e: e["key"] == k),
                        lambda e: e["value"]),
            F.slice(F.transform(F.filter(equiv, lambda e: e["key"] == k),
                                lambda e: e["value"]),
                    -1, 1),
        ), sep).alias("value")))
    return F.map_from_entries(entries)


def metatags_filter(names: Sequence[str] = ("*",), sep: str = "\t",
                    html_col: str = "html",
                    meta_col: str = "parse_meta"):
    """Parse-filter transform: merge ``metatag.*`` keys into the parse
    metadata map (new keys win on collision — NUTCH-1559 re-extracts from
    the document, not from prior metadata)."""

    def _apply(df: DataFrame) -> DataFrame:
        tags = extract_metatags(F.col(html_col), names, sep)
        if meta_col in df.columns:
            merged = F.map_concat(
                F.map_filter(
                    F.coalesce(F.col(meta_col),
                               F.create_map().cast("map<string,string>")),
                    lambda k, _: ~F.array_contains(F.map_keys(tags), k)),
                tags)
            return df.withColumn(meta_col, merged)
        return df.withColumn(meta_col, tags)

    return _apply


# ---------------------------------------------------------------- rel-tag

_ANCHOR_TAG = r"(?is)<a\s[^>]*>"


def extract_rel_tags(html: Column) -> Column:
    """Sorted distinct ``array<string>`` of microformat rel-tags.

    RelTagParser: anchor with ``rel`` attribute equal (ignore-case) to
    ``tag`` and an href that parses as an ABSOLUTE URL; the tag is the
    URL-decoded substring after the last ``/`` of the path (:121-131);
    empty tags skipped; ``TreeSet`` order (:80).  ``try_url_decode``
    mirrors the reference's catch-and-drop on malformed escapes.
    """
    anchors = F.regexp_extract_all(html, F.lit(_ANCHOR_TAG), 0)
    tagged = F.filter(anchors,
                      lambda a: F.lower(_attr(a, "rel")) == "tag")
    # absolute-URL requirement: new URL(href) in the reference throws on
    # scheme-less hrefs, so require a scheme before taking the path
    tags = F.transform(
        F.filter(tagged, lambda a: _attr(a, "href").rlike(
            r"(?i)^[a-z][a-z0-9+.-]*://")),
        lambda a: F.try_url_decode(F.substring_index(
            F.coalesce(F.try_parse_url(_attr(a, "href"), F.lit("PATH")),
                       F.lit("")), "/", -1)))
    tags = F.filter(tags, lambda t: t.isNotNull() & (t != ""))
    return F.array_sort(F.array_distinct(tags))


def reltag_filter(html_col: str = "html", out_col: str = "tag"):
    """Parse+index transform: the RelTagIndexingFilter end state — the
    multi-valued ``tag`` doc field (RelTagIndexingFilter.java:47-50)."""

    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumn(out_col, extract_rel_tags(F.col(html_col)))

    return _apply


# -------------------------------------------------------- creativecommons

_CC_NS = "http://web.resource.org/cc/"
# CCIndexingFilter work-type URI table (CCParseFilter.java:262-271)
_WORK_TYPES = (
    ("http://purl.org/dc/dcmitype/MovingImage", "video"),
    ("http://purl.org/dc/dcmitype/StillImage", "image"),
    ("http://purl.org/dc/dcmitype/Sound", "audio"),
    ("http://purl.org/dc/dcmitype/Text", "text"),
    ("http://purl.org/dc/dcmitype/Interactive", "interactive"),
    ("http://purl.org/dc/dcmitype/Software", "software"),
    ("http://purl.org/dc/dcmitype/Image", "image"),
)

_COMMENT = r"(?s)<!--(.*?)-->"


def _cc_anchor_url(a: Column, base: Column) -> Column:
    """Resolved href when it points at a CC license, else null.

    CCParseFilter.findLicenseUrl:144-170 — resolve against base, require
    protocol http, host creativecommons.org, path ``/licenses/<more>``.
    Absolute and root-relative hrefs are resolved here (see module note).
    """
    href = _attr(a, "href")
    origin = F.concat(F.lit("http://"),
                      F.coalesce(F.try_parse_url(base, F.lit("HOST")),
                                 F.lit("")))
    resolved = (F.when(href.rlike(r"(?i)^[a-z][a-z0-9+.-]*://"), href)
                 .when(href.startswith("/"), F.concat(origin, href)))
    return F.when(
        resolved.rlike(
            r"(?i)^http://creativecommons\.org/licenses/.+"),
        resolved)


def extract_cc(html: Column, base: Column) -> Column:
    """``struct<license_url, license_loc, work_type>`` per CCParseFilter.

    Priority rdf → rel → a (:85-99); within each bucket the FIRST
    occurrence wins (walk order, :165-169).  The RDF arm scans comments
    naming ``RDF`` + the CC namespace (:192-198) for the ``cc:License``
    subject and the ``cc:Work``/``dc:type`` resource (regex over the
    comment body in place of the namespace-aware XML parse).
    """
    comments = F.filter(
        F.regexp_extract_all(html, F.lit(_COMMENT), 1),
        lambda c: F.contains(c, F.lit("RDF")) &
        F.contains(c, F.lit(_CC_NS)))
    rdf = F.try_element_at(F.filter(F.transform(
        comments,
        lambda c: F.regexp_extract(
            c, r'(?is)<(?:\w+:)?License[^>]*rdf:about\s*=\s*["' + "'" +
            r']([^"' + "'" + r']*)', 1)),
        lambda u: u != ""), F.lit(1))
    work_uri = F.try_element_at(F.filter(F.transform(
        comments,
        lambda c: F.regexp_extract(
            c, r'(?is)<(?:\w+:)?type[^>]*rdf:resource\s*=\s*["' + "'" +
            r']([^"' + "'" + r']*)', 1)),
        lambda u: u != ""), F.lit(1))
    work_map = F.create_map(
        *[F.lit(x) for pair in _WORK_TYPES for x in pair])
    anchors = F.regexp_extract_all(html, F.lit(_ANCHOR_TAG), 0)
    cc_urls = F.filter(
        F.transform(anchors, lambda a: F.struct(
            _cc_anchor_url(a, base).alias("u"),
            # "license".equals(rel) — value match is case-SENSITIVE
            # (CCParseFilter.java:165), unlike rel-tag's equalsIgnoreCase
            (_attr(a, "rel") == "license").alias("isrel"))),
        lambda s: s["u"].isNotNull())
    rel = F.try_element_at(
        F.transform(F.filter(cc_urls, lambda s: s["isrel"]),
                    lambda s: s["u"]), F.lit(1))
    plain = F.try_element_at(
        F.transform(F.filter(cc_urls, lambda s: ~s["isrel"]),
                    lambda s: s["u"]), F.lit(1))
    url = F.coalesce(rdf, rel, plain)
    loc = (F.when(rdf.isNotNull(), "rdf")
            .when(rel.isNotNull(), "rel")
            .when(plain.isNotNull(), "a"))
    return F.struct(url.alias("license_url"), loc.alias("license_loc"),
                    F.try_element_at(work_map,
                                     F.coalesce(work_uri, F.lit("")))
                     .alias("work_type"))


def cc_features(cc: Column) -> Column:
    """The multi-valued ``cc`` doc field (CCIndexingFilter.java:53-115):
    ``license=<url>``, each ``/``/``-`` path token after ``licenses``,
    ``meta=<location>``, and the work type — in that order, nulls
    dropped."""
    path = F.coalesce(
        F.try_parse_url(cc["license_url"], F.lit("PATH")), F.lit(""))
    toks = F.filter(F.split(path, r"[/-]"), lambda t: t != "")
    feats = F.concat(
        F.when(cc["license_url"].isNotNull(),
               F.array(F.concat(F.lit("license="), cc["license_url"])))
         .otherwise(F.array().cast("array<string>")),
        F.when(cc["license_url"].isNotNull(), F.slice(toks, 2, 10_000))
         .otherwise(F.array().cast("array<string>")),
        F.when(cc["license_loc"].isNotNull(),
               F.array(F.concat(F.lit("meta="), cc["license_loc"])))
         .otherwise(F.array().cast("array<string>")),
        F.when(cc["work_type"].isNotNull(), F.array(cc["work_type"]))
         .otherwise(F.array().cast("array<string>")),
    )
    return feats


def cc_filter(html_col: str = "html", base_col: str = "url",
              out_col: str = "cc"):
    """Parse+index transform: CCParseFilter + CCIndexingFilter end state —
    the ``cc`` features array on the doc."""

    def _apply(df: DataFrame) -> DataFrame:
        cc = extract_cc(F.col(html_col), F.col(base_col))
        return df.withColumn(out_col, cc_features(cc))

    return _apply


# --------------------------------------------------------- parsefilter-regex


def parse_regex_rules(conf: str) -> list[tuple[str, str, str]]:
    """``parsefilter.regex.rules`` / rules-file parser
    (RegexParseFilter.readConfiguration:155-178): skip blank and ``#``
    lines, split on whitespace, exactly 3 parts = ``field source regex``
    else the line is dropped; duplicate fields last-wins (HashMap put)."""
    rules: dict[str, tuple[str, str, str]] = {}
    for line in conf.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) == 3:
            rules[parts[0]] = (parts[0], parts[1], parts[2])
    return list(rules.values())


def regex_parse_filter(rules, html_col: str = "html",
                       text_col: str = "text",
                       meta_col: str = "parse_meta"):
    """plugin parsefilter-regex (RegexParseFilter.java:59-88): for each
    rule ``(field, source, regex)`` set ``parse_meta[field]`` to
    ``'true'``/``'false'`` by unanchored ``Matcher.find`` over the raw
    html or the extracted text.  ``rlike`` is Java ``find`` semantics, so
    the whole filter is one JVM projection.  A misconfigured source (or a
    NULL source value) matches nothing → ``'false'`` (:76-84, matches()
    returns false on null)."""
    dedup: dict[str, tuple[str, str]] = {
        f: (s, r) for f, s, r in rules}

    def _apply(df: DataFrame) -> DataFrame:
        entries = []
        for field, (source, regex) in dedup.items():
            s = source.lower()
            if s == "html" and html_col in df.columns:
                src = F.col(html_col)
            elif s == "text" and text_col in df.columns:
                src = F.col(text_col)
            else:
                src = F.lit(None).cast("string")
            val = (F.when(src.rlike(regex), "true")
                    .otherwise("false"))
            entries += [F.lit(field), val]
        new = F.create_map(*entries)
        if meta_col in df.columns:
            fields = F.array(*[F.lit(f) for f in dedup])
            kept = F.map_filter(
                F.coalesce(F.col(meta_col),
                           F.create_map().cast("map<string,string>")),
                lambda k, _: ~F.array_contains(fields, k))
            return df.withColumn(meta_col, F.map_concat(kept, new))
        return df.withColumn(meta_col, new)

    return _apply


# ------------------------------------------------------------------ debug

def debug_filter(html_col: str = "html", meta_col: str = "parse_meta"):
    """parsefilter-debug: record the document source the parser saw under
    the parse-metadata key ``DOM`` (``DebugParseFilter.java:49-57`` saves
    the serialized DOM fragment).  This engine parses the raw markup with
    Catalyst expressions rather than building a DOM, so the faithful
    equivalent of "what the parser interpreted" is the markup itself."""

    def _apply(df: DataFrame) -> DataFrame:
        dom = F.create_map(
            F.lit("DOM"), F.coalesce(F.col(html_col), F.lit("")))
        if meta_col in df.columns:
            kept = F.map_filter(
                F.coalesce(F.col(meta_col),
                           F.create_map().cast("map<string,string>")),
                lambda k, _: k != F.lit("DOM"))
            return df.withColumn(meta_col, F.map_concat(kept, dom))
        return df.withColumn(meta_col, dom)

    return _apply
