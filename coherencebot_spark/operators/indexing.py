"""Indexing-filter chain (SURVEY.md §2.12 IndexingFilter surface).

The reference runs every fetched document through an ordered chain of
``IndexingFilter`` plugins before handing it to the index writers
(``indexer/IndexingFilters.java:41-59``: a filter may add/replace fields
or reject the document by returning null).  This module re-expresses each
filter the fork ships or enables as a composable DataFrame transform —
pure JVM column expressions, no Python in the row path — over the J5
document frame built by ``sources.sinks.build_index_documents``.

Field model: a Nutch document field is multi-valued; multi-valued outputs
become ``array<string>`` columns, single-valued ones plain columns.  A
filter "returning null" becomes a row filter.  ``Date`` fields are
epoch-ms longs (the engine's time convention).

Filters re-expressed (reference file:line cited per function):
  * basic_filter      — index-basic ``BasicIndexingFilter.java:71-133``
  * anchor_filter     — index-anchor ``AnchorIndexingFilter.java:80-106``
  * metadata_filter   — index-metadata ``MetadataIndexer.java:53-107``
  * more_filter       — index-more ``MoreIndexingFilter.java:110-320``
  * static_filter     — index-static ``StaticFieldIndexer.java:62-97``
  * links_filter      — index-links ``LinksIndexingFilter.java:84-160``
  * mimetype_filter   — mimetype-filter ``MimeTypeIndexingFilter.java:63-105``
  * jexl_filter       — index-jexl-filter ``JexlIndexingFilter.java:60-110``
    (JEXL expression → Spark SQL predicate: both are expression languages
    over the named doc fields; the translation is the config author's)
  * criteria_filter   — the fork's index-criteria
    ``CriteriaIndexer.java:85-645`` (min-length gate, bestTitle/
    bestTranslatedTitle/bestAuthors/bestInlink selection, phrase rejects)
  * org_filter        — the fork's index-org ``OrgIndexer.java:84-251``
    (org-metadata lookup keyed by org.slug else domain; the HTTP API is an
    injectable lookup table — no network in this sandbox)
  * link_score_filter — scoring-link
    ``LinkAnalysisScoringFilter.java:66-73`` indexerScore (doc boost)

Chain runner: ``apply_chain(doc, [f1, f2, ...])`` applies in order, like
``indexingfilter.order``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Filter = Callable[[DataFrame], DataFrame]

# ---------------------------------------------------------------- helpers


def _has(doc: DataFrame, col: str) -> bool:
    return col in doc.columns


def _host_of(url: Column) -> Column:
    """java.net.URL.getHost() analogue (no lowercasing — index-basic keeps
    case; index-links lowercases explicitly)."""
    return F.try_parse_url(url, F.lit("HOST"))


def _registered_domain(host: Column) -> Column:
    """JVM fast-path registered domain: last two host labels.

    The full public-suffix logic (``URLUtil.getDomainName``,
    ``util/URLUtil.java:97`` with ``conf/domain-suffixes.xml``) lives in
    ``functions.urls.domain_of`` (vectorized pandas); the indexing chain
    uses the JVM expression so the doc pipeline stays codegen'd.  The two
    agree on every two-level-TLD-free host; pass a custom ``domain_expr``
    to ``basic_filter`` for ccTLD corpora.
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n >= 2, F.concat_ws(".", F.element_at(parts, -2),
                                      F.element_at(parts, -1))).otherwise(host)


def apply_chain(doc: DataFrame, filters: Iterable[Filter]) -> DataFrame:
    """IndexingFilters.filter (``indexer/IndexingFilters.java:41-59``):
    apply in order; a rejected row stays rejected (null short-circuit)."""
    for f in filters:
        doc = f(doc)
    return doc


# ------------------------------------------------------------ index-basic


def basic_filter(max_title_length: int = 100, add_domain: bool = False,
                 max_content_length: int = -1,
                 domain_expr: Callable[[Column], Column] | None = None,
                 ) -> Filter:
    """BasicIndexingFilter.java:71-133 — host/domain/url/content/title/
    tstamp.  The indexed url is repr_url when the datum carries one
    (``Nutch.WRITABLE_REPR_URL_KEY``), else the key url; it lands in
    ``doc_url`` so the join-key ``url`` column stays untouched for later
    filters (index-links hosts compare against the KEY url, :147).
    Malformed urls raise IndexingException in the reference, which drops
    the document (IndexerMapReduce catches) — here: host-null row filter.
    A zero-length title is not indexed (NUTCH-1004, :118-121).
    """
    dom = domain_expr or _registered_domain

    def _apply(doc: DataFrame) -> DataFrame:
        eff = (F.coalesce(F.col("repr_url"), F.col("url"))
               if _has(doc, "repr_url") else F.col("url"))
        host = _host_of(eff)
        doc = (doc.withColumn("doc_url", eff)
                  .withColumn("host", host)
                  .filter(host.isNotNull() & (host != "")))
        if add_domain:
            doc = doc.withColumn("domain", dom(F.col("host")))
        content = F.col("text")
        if max_content_length > -1:
            content = F.substring(content, 1, max_content_length)
        # StringUtil.cleanField: strip U+FFFD replacement chars (:155-157)
        clean = lambda c: F.regexp_replace(c, "�", "")  # noqa: E731
        title = F.col("title")
        if max_title_length > -1:
            title = F.substring(title, 1, max_title_length)
        title = clean(title)
        return (doc.withColumn("content", clean(content))
                   .withColumn("title",
                               F.when(F.length(title) > 0, title))
                   .withColumn("tstamp", F.col("fetch_time")))

    return _apply


# ----------------------------------------------------------- scoring-link


def link_score_filter(normalize: float = 1.0) -> Filter:
    """scoring-link ``LinkAnalysisScoringFilter.indexerScore``
    (``LinkAnalysisScoringFilter.java:66-73``): the document boost is
    ``link.analyze.normalize.score * dbDatum.score`` — the db score the
    WebGraph/LinkRank ScoreUpdater wrote back — replacing whatever
    ``initScore`` the chain carried; a doc with no db datum keeps the
    incoming boost.  The db score rides the J5 document frame as the
    frontier ``score`` column, so this is one Project, no join."""

    def _apply(doc: DataFrame) -> DataFrame:
        boost = F.lit(float(normalize)) * F.col("score")
        if _has(doc, "boost"):
            boost = F.when(F.col("score").isNotNull(), boost) \
                .otherwise(F.col("boost"))
        return doc.withColumn("boost", boost.cast("float"))

    return _apply


# ----------------------------------------------------------- index-anchor


def anchor_filter(deduplicate: bool = False,
                  anchors_col: str = "anchors") -> Filter:
    """AnchorIndexingFilter.java:80-106 — emit inlink anchor texts as the
    multi-valued ``anchor`` field; ``anchorIndexingFilter.deduplicate``
    keeps the FIRST occurrence of each case-insensitive anchor (:87-99).
    """

    def _apply(doc: DataFrame) -> DataFrame:
        a = F.coalesce(F.col(anchors_col), F.array())
        if deduplicate:
            # keep x when no earlier element lowercases equal (order
            # kept); eqNullSafe so a null element can't turn the exists
            # into NULL and silently drop every later anchor
            a = F.filter(
                a, lambda x, i: ~F.exists(
                    F.slice(F.coalesce(F.col(anchors_col), F.array()), 1, i),
                    lambda y: F.lower(y).eqNullSafe(F.lower(x))))
        return doc.withColumn("anchor", a)

    return _apply


# --------------------------------------------------------- index-metadata


def metadata_filter(db_keys: Sequence[str] = (),
                    parse_keys: Sequence[str] = (),
                    content_keys: Sequence[str] = (),
                    separator: str | None = None,
                    mv_fields: Sequence[str] = ()) -> Filter:
    """MetadataIndexer.java:53-107 — promote configured metadata keys
    (``index.db.md`` / ``index.parse.md`` / ``index.content.md``) to doc
    fields.  A key found in several sources appends (multi-valued field ⇒
    array column, db→parse→content order, :59-87).  Values containing
    ``index.metadata.separator`` split into parts when the field is listed
    multivalued; every part is trimmed and empties are dropped (:92-107).
    """
    sources = (("db_meta", db_keys), ("parse_meta", parse_keys),
               ("content_meta", content_keys))
    mv = set(mv_fields)

    def _apply(doc: DataFrame) -> DataFrame:
        per_key: dict[str, list[Column]] = {}
        for src, keys in sources:
            for k in keys:
                raw = (F.col(src).getItem(k) if _has(doc, src)
                       else F.lit(None).cast("string"))
                if separator is not None and k in mv:
                    vals = F.split(raw, F.lit(separator), -1)
                else:
                    vals = F.array(raw)
                vals = F.filter(
                    F.transform(F.coalesce(vals, F.array()),
                                lambda v: F.trim(v)),
                    lambda v: v.isNotNull() & (v != ""))
                per_key.setdefault(k, []).append(vals)
        for k, parts in per_key.items():
            col = parts[0] if len(parts) == 1 else F.concat(*parts)
            doc = doc.withColumn(k, col)
        return doc

    return _apply


# ------------------------------------------------------------- index-more

# tika.detect(url) fallback when no Content-Type header: extension-based
# detection over the types the synthetic world emits + common web types
_EXT_MIME = {
    "html": "text/html", "htm": "text/html", "pdf": "application/pdf",
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "bmp": "image/bmp", "gif": "image/gif", "txt": "text/plain",
    "xml": "application/xml", "json": "application/json",
}
# HttpDateFormat.java pattern is "EEE, dd MMM yyyy HH:mm:ss zzz"; Spark's
# post-3.0 parser forbids day-of-week on parse, and RFC-1123's weekday is
# redundant anyway — strip "EEE, " and the GMT/UTC zone suffix, parse the
# rest in the session's UTC zone (non-GMT zone names fall to null, the
# reference's "can't parse erroneous date" path, MoreIndexingFilter:158-163)
_HTTP_DATE = "dd MMM yyyy HH:mm:ss"


def more_filter(mime_map: Mapping[str, str] | None = None,
                map_field: str | None = None,
                index_mime_parts: bool = True) -> Filter:
    """MoreIndexingFilter.java:110-320 — time/length/type/title-reset.

    * ``last_modified_ms`` from the Last-Modified header when parseable
      (:118-133; primary HttpDateFormat pattern — the 23 fallback styles
      are data-cleaning for wild servers, not semantics);
      ``date_ms`` = last-modified else datum.modifiedTime>0 else
      fetchTime (:135-146).
    * ``content_length`` = trimmed Content-Length header (NUTCH-1010,
      :170-181).
    * ``type`` = canonical mime (header param-stripped + lowercased; no
      header ⇒ url-extension detection, :203-240), optionally remapped via
      ``contenttype-mapping.txt`` (=``mime_map``; with ``map_field`` the
      mapped value lands in that extra field instead, :244-251), plus
      primary/sub parts appended to the same multi-valued field when
      ``moreIndexingFilter.indexMimeTypeParts`` (:255-262).
    * title reset from Content-Disposition filename= when the doc has no
      title yet (:298-311, patterns :290-292).
    """

    def _apply(doc: DataFrame) -> DataFrame:
        cm = (F.col("content_meta") if _has(doc, "content_meta")
              else F.lit(None).cast("map<string,string>"))
        last_mod_hdr = F.regexp_replace(
            F.regexp_replace(cm.getItem("Last-Modified"),
                             r"^[A-Za-z]{3},\s*", ""),
            r"\s*(GMT|UTC)\s*$", "")
        parsed = F.try_to_timestamp(last_mod_hdr, F.lit(_HTTP_DATE))
        last_ms = (F.unix_timestamp(parsed) * 1000).cast("long")
        doc = doc.withColumn("last_modified_ms", last_ms)
        modified = (F.col("modified_time") if _has(doc, "modified_time")
                    else F.lit(0).cast("long"))
        doc = doc.withColumn(
            "date_ms",
            F.coalesce(last_ms,
                       F.when(modified > 0, modified),
                       F.col("fetch_time")).cast("long"))

        clen = F.trim(cm.getItem("Content-Length"))
        doc = doc.withColumn("content_length",
                             F.when(F.length(clen) > 0, clen))

        hdr = (F.coalesce(F.col("db_meta").getItem("Content-Type"),
                          cm.getItem("Content-Type"))
               if _has(doc, "db_meta") else cm.getItem("Content-Type"))
        cleaned = F.lower(F.trim(F.split(hdr, ";").getItem(0)))
        ext = F.lower(F.regexp_extract(F.col("url"), r"\.([A-Za-z0-9]+)$", 1))
        detect = F.element_at(
            F.create_map(*[F.lit(x) for kv in _EXT_MIME.items() for x in kv]),
            ext)
        mime = F.coalesce(
            F.when(F.length(cleaned) > 0, cleaned),
            detect, F.lit("application/octet-stream"))
        if mime_map:
            mapped = F.element_at(
                F.create_map(*[F.lit(x) for kv in mime_map.items()
                               for x in kv]), mime)
            if map_field is not None:
                doc = doc.withColumn(map_field, mapped)
            else:
                mime = F.coalesce(mapped, mime)
        parts = F.split(mime, "/")
        type_col = (F.concat(F.array(mime), parts) if index_mime_parts
                    else F.array(mime))
        doc = doc.withColumn("type", type_col)

        disp = cm.getItem("Content-Disposition")
        fname = F.coalesce(
            F.nullif(F.regexp_extract(disp, "filename=['\"]([^\"]+)", 1),
                     F.lit("")),
            F.nullif(F.regexp_extract(disp, r"filename=(\S+)", 1),
                     F.lit("")))
        title = (F.col("title") if _has(doc, "title")
                 else F.lit(None).cast("string"))
        return doc.withColumn("title", F.coalesce(title, fname))

    return _apply


# ----------------------------------------------------------- index-static


def static_filter(fields_string: str, fieldsep: str = ",",
                  keysep: str = ":", valuesep: str = " ") -> Filter:
    """StaticFieldIndexer.java:62-97 — literal fields from ``index.static``
    (``field:val1 val2,field2:val``; NUTCH-2052 custom separators).
    Parsed driver-side; rows get constant array columns.
    """
    fields: dict[str, list[str]] = {}
    for field in fields_string.split(fieldsep):
        entry = field.split(keysep)
        if len(entry) == 2:
            fields[entry[0].strip()] = entry[1].strip().split(valuesep)

    def _apply(doc: DataFrame) -> DataFrame:
        for name, vals in fields.items():
            doc = doc.withColumn(name, F.array(*[F.lit(v) for v in vals]))
        return doc

    return _apply


# ------------------------------------------------------------ index-links


def links_filter(ignore_outlinks_host: bool = False,
                 ignore_inlinks_host: bool = False,
                 hosts_only: bool = False,
                 outlinks_col: str = "outlink_urls",
                 inlinks_col: str = "inlink_urls") -> Filter:
    """LinksIndexingFilter.java:84-160 — ``outlinks``/``inlinks`` fields.

    Per link: take its lowercased host (malformed urls dropped, :96/:125);
    with ``index.links.hosts.only`` the HOST becomes the value and
    duplicates keep the first occurrence (:99-105 — dedup happens BEFORE
    the host-ignore check); with ``*.host.ignore`` links whose host equals
    the KEY url's host are dropped (:147-152).
    """
    page_host = F.lower(_host_of(F.col("url")))

    def one(col: str, ignore: bool) -> Column:
        src = F.coalesce(F.col(col), F.array())
        pairs = F.filter(
            F.transform(src, lambda x: F.struct(
                x.alias("link"), F.lower(_host_of(x)).alias("h"))),
            lambda p: p["h"].isNotNull() & (p["h"] != ""))
        if hosts_only:
            pairs = F.transform(pairs, lambda p: F.struct(
                p["h"].alias("link"), p["h"].alias("h")))
            keep_first = F.filter(
                pairs, lambda p, i: ~F.exists(F.slice(pairs, 1, i),
                                              lambda q: q["h"] == p["h"]))
            pairs = keep_first
        if ignore:
            pairs = F.filter(pairs, lambda p: p["h"] != page_host)
        return F.transform(pairs, lambda p: p["link"])

    def _apply(doc: DataFrame) -> DataFrame:
        return (doc
                .withColumn("outlinks", one(outlinks_col,
                                            ignore_outlinks_host))
                .withColumn("inlinks", one(inlinks_col,
                                           ignore_inlinks_host)))

    return _apply


# -------------------------------------------------------- mimetype-filter


def mimetype_filter(patterns: Sequence[str],
                    accept_mode: bool = True,
                    type_col: str = "type") -> Filter:
    """MimeTypeIndexingFilter.java:63-105 — gate documents by detected
    mime type.  The trie's shortestMatch is prefix matching: a doc MATCHES
    when its type starts with any configured pattern.  ``accept_mode``
    (a ``+``/``-`` switch in ``mimetype-filter.txt``) keeps unmatched docs
    and drops matched ones; ``accept_mode=False`` inverts.
    """

    def _apply(doc: DataFrame) -> DataFrame:
        t = F.col(type_col)
        if dict(doc.dtypes).get(type_col, "").startswith("array"):
            t = F.element_at(t, 1)
        matched = F.lit(False)
        for p in patterns:
            matched = matched | t.startswith(p)
        keep = ~matched if accept_mode else matched
        return doc.filter(keep)

    return _apply


# ------------------------------------------------------- index-jexl-filter


def jexl_filter(predicate: str) -> Filter:
    """JexlIndexingFilter.java:60-110 — keep docs for which the configured
    expression evaluates true.  The reference exposes the datum
    (status/fetchTime/score/...), parse text/title and every doc field to
    a JEXL expression; this engine's doc frame exposes the same names to a
    Spark SQL predicate — the idiomatic Spark equivalent of an embedded
    expression language (and Catalyst pushes it into the scan, which JEXL
    never could).
    """

    def _apply(doc: DataFrame) -> DataFrame:
        return doc.filter(F.expr(predicate))

    return _apply


# ---------------------------------------------------- index-criteria (fork)

# CriteriaIndexer.java:75-77
ANCHOR_FILTERS = ("pdf", "download", "click", "read more", "learn more",
                  "full report", "thumbnail", "read the", "read it",
                  "more information")
PUB_SECTION_KEYWORDS = ("publ", "report", "article", "brief")
# CriteriaIndexer.java removeExt extension switch (:471-496)
_TITLE_EXTS = ("doc", "docx", "dvi", "htm", "html", "key", "odp", "ods",
               "pdf", "pps", "ppt", "pptm", "pptx", "qxd", "rtf", "tex",
               "txt", "wpd", "xls", "xlsx")
_MAX_TITLE = 250


def _strip_ctrl(c: Column) -> Column:
    return F.regexp_replace(c, r"\p{C}", "")


def _remove_ext(c: Column) -> Column:
    """CriteriaIndexer.removeExt (:447-497): drop a trailing filename
    extension (PDF titles are often file names).  Suffix = text after the
    last dot, query-string-stripped when a ``?`` sits past position 2;
    longer than 4 chars ⇒ not an extension."""
    suffix = F.regexp_extract(c, r"\.([^.]*)$", 1)
    q = F.instr(suffix, "?")
    suffix = F.when(q > 3, F.substring(suffix, 1, q - 1)).otherwise(suffix)
    is_ext = (F.length(suffix) <= 4) & F.lower(suffix).isin(*_TITLE_EXTS)
    return F.when((F.instr(c, ".") > 0) & is_ext,
                  F.regexp_replace(c, r"\.[^.]*$", "")).otherwise(c)


def _clean_candidate(c: Column) -> Column:
    """shared cleaning (:157-200): strip non-printables, cap at 250,
    trim, drop a filename extension."""
    return _remove_ext(F.trim(F.substring(_strip_ctrl(c), 1, _MAX_TITLE)))


def _norm_match(c: Column) -> Column:
    """punctuation→space + trim, the comparison variant (:205-210)."""
    return F.trim(F.regexp_replace(c, r"\p{Punct}", " "))


def _n_words(c: Column) -> Column:
    return F.size(F.split(c, r"\s+"))


def _n_upper(c: Column) -> Column:
    return F.length(F.regexp_replace(c, r"[^\p{Lu}]", ""))


def _n_lower(c: Column) -> Column:
    return F.length(F.regexp_replace(c, r"[^\p{Ll}]", ""))


def _strong(c: Column) -> Column:
    """'reasonably long with mixed case' test (:229-236)."""
    return (_n_words(c) > 7) & (_n_upper(c) > 0) & (_n_lower(c) > 5)


def criteria_filter(min_length: int = 4000,
                    filters: Mapping[str, Sequence[str]] | None = None,
                    ) -> Filter:
    """The fork's CriteriaIndexer (``index-criteria/.../CriteriaIndexer
    .java:85-645``) — quality gates + best-field selection for the
    publications index:

    1. reject docs with text shorter than ``index.criteria.minlength``
       (:105-110);
    2. ``title``/``title_algorithm`` ← bestTitle(title, heading, anchor)
       (:145-314): candidates cleaned (non-printables stripped, 250-cap,
       filename-extension dropped); anchors pre-filtered (boilerplate
       phrases, single-word) keeping the first longest; then pick by
       exact-match / mixed-case-length strength / word count;
    3. ``title_english`` ← translated variant tracking which candidate
       won (:325-338);
    4. ``author`` keeps only multi-word names (:345-366);
    5. ``referrer_url`` ← bestInlink (:374-419): non-PDF inlinks with a
       real path, preferring publication-section keywords, else longest;
    6. reject docs whose normalized field values contain a configured
       phrase (``index.criteria.filters``, :507-546).
    """
    filters = dict(filters or {})

    def _apply(doc: DataFrame) -> DataFrame:
        doc = doc.filter(F.length(F.col("text")) >= min_length)

        heading_raw = (F.col("heading") if _has(doc, "heading")
                       else F.lit(None).cast("string"))
        # heading algorithm tag: embedded " [from PDF fonts|text]" marker
        h_alg = F.when(
            heading_raw.contains(" [from PDF text]"), F.lit("from PDF text")
        ).otherwise(F.lit("from PDF fonts"))
        heading = F.when(
            heading_raw.isNotNull(),
            _clean_candidate(F.replace(
                F.replace(heading_raw, F.lit(" [from PDF fonts]")),
                F.lit(" [from PDF text]"))))
        title = F.when(F.col("title").isNotNull(),
                       _clean_candidate(F.col("title")))

        anchors = (F.coalesce(F.col("anchor"), F.array())
                   if _has(doc, "anchor") else F.array())
        cand = F.filter(
            anchors,
            lambda x: (F.instr(x, " ") > 0)
            & ~F.exists(F.array(*[F.lit(w) for w in ANCHOR_FILTERS]),
                        lambda w: F.instr(F.lower(x), w) > 0))
        raw_anchor = F.aggregate(
            cand, F.lit(None).cast("string"),
            lambda acc, x: F.when(acc.isNull()
                                  | (F.length(x) > F.length(acc)),
                                  x).otherwise(acc))
        anchor = F.when(raw_anchor.isNotNull(), _clean_candidate(raw_anchor))

        mt, mh, ma = _norm_match(title), _norm_match(heading), \
            _norm_match(anchor)
        both_th = title.isNotNull() & heading.isNotNull()
        both_ah = anchor.isNotNull() & heading.isNotNull()
        pick_t = F.struct(title.alias("t"), F.lit("title").alias("a"))
        pick_h = F.struct(heading.alias("t"), h_alg.alias("a"))
        pick_a = F.struct(anchor.alias("t"), F.lit("anchor").alias("a"))
        best = (
            F.when(both_th,
                   F.when(mt == mh, pick_t)
                    .when(_strong(mt), pick_t)
                    .when(_strong(mh), pick_h)
                    .when(_n_words(mt) > _n_words(mh), pick_t)
                    .otherwise(pick_h))
            .when(both_ah,
                  F.when(ma == mh, pick_a)
                   .when(_strong(ma), pick_a)
                   .when(_strong(mh), pick_h)
                   .when(_n_words(ma) > _n_words(mh), pick_a)
                   .otherwise(pick_h))
            .when(heading.isNotNull() & (F.length(heading) > 0), pick_h)
            .when(title.isNotNull() & (F.length(title) > 0), pick_t)
            .when(anchor.isNotNull() & (F.length(anchor) > 0), pick_a)
            .otherwise(F.struct(F.lit("no title").alias("t"),
                                F.lit("no options").alias("a")))
        )
        doc = (doc.withColumn("_best", best)
                  .filter(F.col("_best")["t"].isNotNull()
                          & (F.trim(F.col("_best")["t"]) != ""))
                  .withColumn("title", F.col("_best")["t"])
                  .withColumn("title_algorithm", F.col("_best")["a"]))

        # bestTranslatedTitle (:325-338)
        te = (F.col("title_english") if _has(doc, "title_english")
              else F.lit(None).cast("string"))
        he = (F.col("heading_english") if _has(doc, "heading_english")
              else F.lit(None).cast("string"))
        alg = F.col("title_algorithm")
        doc = doc.withColumn(
            "title_english",
            F.when(alg.contains("PDF") & he.isNotNull(), he)
             .when(alg.contains("title") & te.isNotNull(), te)
             .otherwise(F.coalesce(te, he)))

        # bestAuthors (:345-366): keep multi-word names; if none survive,
        # the original field stays
        if _has(doc, "author"):
            kept = F.filter(
                F.transform(F.coalesce(F.col("author"), F.array()),
                            lambda a: F.trim(a)),
                lambda a: (F.length(a) > 0) & (F.instr(a, " ") > 2))
            doc = doc.withColumn(
                "author",
                F.when(F.size(kept) > 0, kept).otherwise(F.col("author")))

        # bestInlink → referrer_url (:374-419)
        inl = (F.coalesce(F.col("inlinks"), F.array())
               if _has(doc, "inlinks") else F.array())
        valid = F.filter(
            inl,
            lambda s: (F.length(F.trim(s)) > 0)
            & ~(F.instr(F.lower(s), ".pdf") > 1)
            & F.try_parse_url(s, F.lit("PATH")).isNotNull()
            & (F.length(F.try_parse_url(s, F.lit("PATH"))) > 1))
        longest = F.aggregate(
            valid, F.lit(None).cast("string"),
            lambda acc, x: F.when(acc.isNull()
                                  | (F.length(x) > F.length(acc)),
                                  x).otherwise(acc))
        kw = F.filter(
            valid,
            lambda s: F.exists(
                F.array(*[F.lit(w) for w in PUB_SECTION_KEYWORDS]),
                lambda w: F.instr(F.lower(s), w) > 0))
        best_kw = F.aggregate(
            kw, F.lit(None).cast("string"),
            lambda acc, x: F.when(acc.isNull()
                                  | (F.length(x) > F.length(acc)),
                                  x).otherwise(acc))
        doc = doc.withColumn("referrer_url", F.coalesce(best_kw, longest))

        # filterTest (:507-546): reject when any normalized value of a
        # configured field contains a configured phrase
        reject = F.lit(False)
        for field, phrases in filters.items():
            if not _has(doc, field) or not phrases:
                continue
            vals = (F.col(field)
                    if dict(doc.dtypes)[field].startswith("array")
                    else F.array(F.col(field)))
            norm = F.transform(
                F.coalesce(vals, F.array()),
                lambda v: F.lower(F.regexp_replace(
                    F.regexp_replace(v, r"\p{Punct}", " "), r"\s+", " ")))
            hit = F.exists(
                norm,
                lambda v: F.exists(
                    F.array(*[F.lit(_norm_phrase(p)) for p in phrases]),
                    lambda p: F.instr(v, p) > 0))
            reject = reject | F.coalesce(hit, F.lit(False))
        return doc.filter(~reject).drop("_best")

    return _apply


def _norm_phrase(p: str) -> str:
    """config-side phrase normalization (CriteriaIndexer.parseConf
    :569-607): punctuation→space, whitespace collapse, lowercase, trim."""
    import re
    out = re.sub(r"[!-/:-@\[-`{-~]", " ", p)
    return re.sub(r"\s+", " ", out).lower().strip()


# ----------------------------------------------------------- index-replace


# java.util.regex.Pattern flag bits → Java-regex inline-flag letters
# (CASE_INSENSITIVE=2, COMMENTS=4, MULTILINE=8, DOTALL=32, UNICODE_CASE=64)
_JAVA_FLAG_LETTERS = ((2, "i"), (4, "x"), (8, "m"), (32, "s"), (64, "u"))


def _parse_replace_conf(conf: str) -> list[tuple]:
    """ReplaceIndexer.parseConf (``index-replace/.../ReplaceIndexer
    .java:131-233``): parse ``index.replace.regexp`` property lines.

    Lines are ``fieldname=/regexp/replacement/[flags]`` (any first char is
    the separator; no escaping — a pattern cannot contain its separator);
    ``hostmatch=``/``urlmatch=`` lines scope the rules that follow them
    (hostmatch resets urlmatch, :153-155); ``src:dst=`` writes the
    transformed src values into dst.  Malformed rules are skipped exactly
    like the reference: missing separator or non-integer flags drop the
    RULE (:184-203); an uncompilable field regex keeps the rule as a
    no-op replace (FieldReplacer.java:118-124 invalid → value unchanged);
    an uncompilable host/url match deactivates its whole set (:157-170).

    Returns ``(scope_col, scope_pattern|None, src, dst, pattern|None,
    replacement)`` tuples — HOST-scoped rules first then URL-scoped,
    mirroring doReplace's two-map order (:243-249); a ``None`` pattern
    means no-op, a ``None`` scope_pattern means match-nothing.
    """
    import re as _re

    host_rules: list[tuple] = []
    url_rules: list[tuple] = []
    host_pat: str | None = ".*"
    url_pat: str | None = None
    in_url = False
    for raw in conf.splitlines():
        line = raw.strip()
        if not line:
            continue
        m = _re.match(r"(.*?)=(.*)", line)
        if not m:
            continue
        name, value = m.group(1).strip(), m.group(2)
        if name == "hostmatch":
            in_url = False
            host_pat = value if _compiles(value) else None
            continue
        if name == "urlmatch":
            in_url = True
            url_pat = value if _compiles(value) else None
            continue
        if len(value) <= 3:
            continue
        # indexOf(':') > 0 — a LEADING colon is not a target split (:174)
        if ":" in name and name.index(":") > 0:
            src, dst = name.split(":", 1)
        else:
            src, dst = name, name
        src, dst = src.strip(), dst.strip()
        sep, rest = value[0], value[1:]
        if sep not in rest:
            continue  # "missing separator" — rule dropped
        pattern = rest[: rest.index(sep)]
        rest = rest[len(pattern) + 1:]
        repl = rest[: rest.index(sep)] if sep in rest else rest
        if len(rest) > len(repl) + 1:
            try:
                flags = int(rest[len(repl) + 1:].strip())
            except ValueError:
                continue  # "invalid flags component" — rule dropped
            letters = "".join(c for bit, c in _JAVA_FLAG_LETTERS
                              if flags & bit)
            if letters:
                pattern = f"(?{letters})" + pattern
        eff = pattern if _compiles(pattern) else None
        tup = (("url", url_pat, src, dst, eff, repl) if in_url
               else ("host", host_pat, src, dst, eff, repl))
        (url_rules if in_url else host_rules).append(tup)
    return host_rules + url_rules


def _compiles(pattern: str) -> bool:
    """Best-effort Pattern.compile validity probe.  Runtime evaluation is
    Java regex (Spark's regexp_replace/rlike), so Python's ``re`` is only
    a screen; Java-only constructs (possessive quantifiers, ``\\p{Punct}``
    variants) are allowed through by falling back to a JVM-safe True."""
    import re as _re

    try:
        _re.compile(pattern)
        return True
    except _re.error:
        pass
    # Python rejects some valid Java syntax — \p{Punct}-style classes
    # (Python only knows them via the regex module) and possessive
    # quantifiers.  Rewrite those to Python-benign stand-ins and
    # re-probe, so only structural errors ("**", unbalanced groups)
    # disable a rule.
    probe = _re.sub(r"\\[pP]\{[A-Za-z][A-Za-z0-9_]*\}", "X", pattern)
    probe = _re.sub(r"([*+?}])\+", r"\1", probe)
    try:
        _re.compile(probe)
        return True
    except _re.error:
        return False


def replace_filter(conf: str) -> Filter:
    """index-replace ``ReplaceIndexer.java:243-331`` — regex rewriting of
    doc fields prior to indexing (NUTCH-2058), scoped by host/url match.

    Per rule: when the doc's scope key (``host``/``url`` column) FINDS the
    scope pattern (``rlike`` — Java ``Matcher.find`` semantics) and the
    doc carries the source field (non-null column), the target field is
    replaced wholesale with ``replaceAll(pattern, replacement)`` over the
    source values (:305-325; multi-valued fields map per element).  Rules
    apply in order — later rules see earlier rewrites.  Non-string fields
    are skipped (the reference only rewrites String values, :309-317).
    """
    rules = _parse_replace_conf(conf)
    # promoted metadata fields carry dots (metatag.author) — quote refs
    q = lambda n: F.col("`%s`" % n)  # noqa: E731

    def _apply(doc: DataFrame) -> DataFrame:
        for scope_col, scope_pat, src, dst, pattern, repl in rules:
            if scope_col not in doc.columns or src not in doc.columns:
                continue
            dt = dict(doc.dtypes)[src]
            if dt not in ("string",) and dt != "array<string>":
                continue
            if scope_pat is None:
                continue  # deactivated match set (bad host/url pattern)
            matched = q(scope_col).rlike(scope_pat)
            src_c = q(src)
            if pattern is None:
                newv = src_c  # invalid field regex → no-op replace
            elif dt == "array<string>":
                newv = F.transform(
                    src_c, lambda v: F.regexp_replace(v, pattern, repl))
            else:
                newv = F.regexp_replace(src_c, pattern, repl)
            existing = (q(dst) if dst in doc.columns
                        else F.lit(None).cast(dt))
            doc = doc.withColumn(
                dst,
                F.when(F.coalesce(matched, F.lit(False))
                       & src_c.isNotNull(), newv).otherwise(existing))
        return doc

    return _apply


# ------------------------------------------------------- index-org (fork)

ORG_FIELDS = ("slug", "name", "city", "region", "country", "country_code",
              "type")


def org_filter(orgs: DataFrame) -> Filter:
    """The fork's OrgIndexer (``index-org/.../OrgIndexer.java:84-251``):
    enrich docs with organization metadata looked up by ``org.slug``
    (injected by FeedInjector, carried in db metadata) else by the doc's
    ``domain`` (from index-basic, which must run first, :69-70).

    The reference calls an HTTP API returning a JSON hit array and picks
    the exact slug match, else the hit whose ``domains`` contains the
    queried domain, else the first hit (:185-209); its LRU response cache
    (:282-294) is obsolete here — the lookup table broadcast-joins once
    per job instead of once per 500 urls.  ``orgs`` schema: one row per
    query key with the ordered hit array::

        query: string,
        hits: array<struct<slug:string, name:string, city:string,
                           state:string, country_name:string,
                           country_code:string, org_type:string,
                           domains:array<string>>>

    Adds ``organization_slug/name/city/region/country/country_code/type``
    and ``organization_domains`` (';'-joined, :234-244); 'null' strings
    from the API are absent values (:217-233).
    """

    def _apply(doc: DataFrame) -> DataFrame:
        slug = (F.col("db_meta").getItem("org.slug") if _has(doc, "db_meta")
                else F.lit(None).cast("string"))
        domain = (F.col("domain") if _has(doc, "domain")
                  else F.lit(None).cast("string"))
        query = F.coalesce(slug, domain)
        doc = doc.withColumn("_org_q", query).withColumn("_org_slugq", slug)
        joined = doc.join(F.broadcast(orgs.withColumnRenamed("query",
                                                             "_org_q")),
                          "_org_q", "left")
        hits = F.coalesce(F.col("hits"), F.array())
        exact = F.when(
            F.col("_org_slugq").isNotNull(),
            F.try_element_at(F.filter(
                hits, lambda h: h["slug"] == F.col("_org_slugq")), F.lit(1))
        ).otherwise(
            F.try_element_at(F.filter(
                hits, lambda h: F.array_contains(
                    F.coalesce(h["domains"], F.array()), F.col("_org_q"))),
                F.lit(1)))
        pick = F.coalesce(exact, F.try_element_at(hits, F.lit(1)))
        nn = lambda c: F.when((c != "null") & (F.length(c) > 0), c)  # noqa
        out = (joined
               .withColumn("organization_slug", nn(pick["slug"]))
               .withColumn("organization_name", nn(pick["name"]))
               .withColumn("organization_city", nn(pick["city"]))
               .withColumn("organization_region", nn(pick["state"]))
               .withColumn("organization_country", nn(pick["country_name"]))
               .withColumn("organization_country_code",
                           nn(pick["country_code"]))
               .withColumn("organization_type", nn(pick["org_type"]))
               .withColumn(
                   "organization_domains",
                   F.when(pick["domains"].isNotNull()
                          & (F.size(pick["domains"]) > 0),
                          F.array_join(pick["domains"], ";"))))
        return out.drop("_org_q", "_org_slugq", "hits")

    return _apply


# ---------------------------------------------------------------- index-tld

# multi-level public suffixes (mirrors functions.urls._MULTI_SUFFIXES — the
# embedded subset of the reference's conf/domain-suffixes.xml)
_TLD_MULTI = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
)


def tld_filter(boosts: Mapping[str, float] | None = None,
               score_col: str = "score") -> Filter:
    """plugin tld — TLDIndexingFilter.java:46-59 adds the url's public
    suffix as the ``tld`` field; TLDScoringFilter.java:52-66 multiplies
    the indexing score by the per-suffix boost (``boosts`` stands in for
    the boost attributes of ``domain-suffixes.xml``; absent entries keep
    boost 1.0, and with no map at all the score is untouched — the
    reference's default file carries no boosts either)."""

    def _apply(doc: DataFrame) -> DataFrame:
        host = F.lower(F.coalesce(
            F.col("host") if _has(doc, "host") else _host_of(F.col("url")),
            F.lit("")))
        parts = F.split(host, r"\.")
        last2 = F.concat_ws(".", F.element_at(parts, -2),
                            F.element_at(parts, -1))
        multi = F.array(*[F.lit(s) for s in _TLD_MULTI])
        tld = F.when((F.size(parts) >= 2) & F.array_contains(multi, last2),
                     last2).otherwise(F.element_at(parts, -1))
        doc = doc.withColumn(
            "tld", F.when(F.length(host) > 0, tld))
        if boosts and _has(doc, score_col):
            bmap = F.create_map(
                *[F.lit(x) for kv in boosts.items() for x in kv])
            doc = doc.withColumn(
                score_col,
                F.col(score_col) * F.coalesce(
                    F.try_element_at(bmap, F.coalesce(F.col("tld"),
                                                      F.lit(""))),
                    F.lit(1.0)))
        return doc

    return _apply


# ------------------------------------------------------------ subcollection


def subcollection_filter(collections: Sequence[Mapping],
                         field_name: str = "subcollection",
                         metadata_source: str = "subcollection",
                         case_insensitive: bool = False) -> Filter:
    """plugin subcollection — SubcollectionIndexingFilter.java:52-120 +
    Subcollection.filter (``collection/Subcollection.java:183-200``).

    ``collections`` rows are ``{"name": ..., "whitelist": [...],
    "blacklist": [...], "key": optional-field-override}`` (the
    ``subcollections.xml`` entries).  Matching is the reference's plain
    ``String.contains`` over the url — blacklist first (any hit excludes),
    then whitelist (any hit includes); every matching collection appends
    its name to ``field_name`` (or its ``key`` field).  A non-empty
    ``parse_meta[metadata_source]`` value overrides everything
    (:95-104, the per-document HTML metadata escape hatch).
    """

    def _apply(doc: DataFrame) -> DataFrame:
        url = F.col("url")
        if case_insensitive:
            url = F.lower(url)
        override = (F.trim(F.coalesce(
            F.col("parse_meta").getItem(metadata_source), F.lit("")))
            if _has(doc, "parse_meta") else F.lit(""))

        def match(coll) -> Column:
            wl = [w for w in coll.get("whitelist", ()) if w]
            bl = [b for b in coll.get("blacklist", ()) if b]
            hit = F.lit(False)
            for w in wl:
                hit = hit | F.contains(url, F.lit(
                    w.lower() if case_insensitive else w))
            for b in bl:
                hit = hit & ~F.contains(url, F.lit(
                    b.lower() if case_insensitive else b))
            return hit

        per_field: dict[str, list[Column]] = {}
        for coll in collections:
            tgt = coll.get("key") or field_name
            per_field.setdefault(tgt, []).append(
                F.when(match(coll), F.lit(coll["name"])))
        for tgt, vals in per_field.items():
            arr = F.filter(F.array(*vals), lambda x: x.isNotNull())
            if tgt == field_name:
                arr = F.when(override != "", F.array(override)).otherwise(arr)
            doc = doc.withColumn(tgt, F.when(F.size(arr) > 0, arr))
        return doc

    return _apply


# ------------------------------------------------------------------ urlmeta


def urlmeta_filter(tags: Sequence[str]) -> Filter:
    """plugin urlmeta — URLMetaIndexingFilter.java:66-84: every
    ``urlmeta.tags`` key present in the crawl datum's metadata becomes a
    doc field of the same name.  (The companion scoring-filter half —
    propagating those keys from parent to outlink datums — is
    ``operators.parse.parse(urlmeta_tags=...)``.)"""

    def _apply(doc: DataFrame) -> DataFrame:
        if not _has(doc, "db_meta"):
            return doc
        for t in tags:
            doc = doc.withColumn(t, F.col("db_meta").getItem(t))
        return doc

    return _apply


# -------------------------------------------------------------- index-geoip

# Per-usage field sets, mirroring GeoIPDocumentCreator's add sequences.
# Field names (including the `subDivIdoCode` spelling) match the reference
# exactly; `latLon` is assembled from the geodb's latitude/longitude pair
# the way createDocFromCityDb concatenates Location lat + "," + lon.
_GEO_CITY_FIELDS = (
    "cityName", "cityConfidence", "cityGeoNameId",
    "continentCode", "continentGeoNameId", "continentName",
    "countryIsoCode", "countryName", "countryConfidence", "countryGeoName",
    "accRadius", "timeZone", "metroCode",
    "postalCode", "postalConfidence", "countryType",
    "subDivName", "subDivIdoCode", "subDivConfidence", "subDivGeoNameId",
)
_GEO_TRAIT_FIELDS = ("autonSystemNum", "autonSystemOrg", "domain", "isp",
                     "org", "userType", "isAnonProxy")
_GEO_USAGE_FIELDS: Mapping[str, tuple] = {
    # createDocFromCityDb (GeoIPDocumentCreator.java:187-232)
    "cityDatabase": _GEO_CITY_FIELDS + ("latLon",),
    # createDocFromIspDb (:156-166)
    "ispDatabase": ("autonSystemNum", "autonSystemOrg", "isp", "org"),
    # createDocFromDomainDb (:168-175)
    "domainDatabase": ("domain",),
    # createDocFromConnectionDb (:177-185)
    "connectionTypeDatabase": ("connType",),
    # createDocFromInsightsService (:85-138) = city set + traits
    "insightsService": _GEO_CITY_FIELDS + ("latLon",) + _GEO_TRAIT_FIELDS,
}


def geoip_filter(geodb: DataFrame, usage: str = "cityDatabase",
                 ip_col: str | None = None) -> Filter:
    """index-geoip (``GeoIPIndexingFilter.java:118-233``,
    ``GeoIPDocumentCreator.java:85-232``): enrich docs with the geo
    attributes of the server that produced them, looked up by the IP the
    fetcher stored in content metadata under ``_ip_``
    (``net/protocols/Response.java:40-42``, requires
    ``store.ip.address=true``).

    The reference reads a licensed MaxMind mmdb (or the paid Insights web
    service) per row; both the binary-format reader and the database
    itself are outside this sandbox's public-knowledge scope, so — like
    :func:`org_filter`'s HTTP API — the database is an INJECTABLE lookup
    table: one row per ip with whichever of the usage's attribute columns
    the export carries (export the mmdb to parquet with the vendor's CSV
    dump outside the sandbox; tests inject a deterministic fake).  Scale
    shape: the geo table broadcast-joins once per job (a full GeoLite2
    city export is ~100 MB — broadcastable; the reference opens the mmdb
    once per task and probes per row, an equivalent access pattern with
    worse locality), the doc side never shuffles.

    ``usage`` picks the field set exactly as ``index.geoip.usage`` does:
    cityDatabase / ispDatabase / domainDatabase / connectionTypeDatabase /
    insightsService.  A doc whose ip is absent from the table keeps null
    geo fields (the reference's AddressNotFoundException path: the doc
    passes through unenriched); ``addIfNotNull`` parity means a null
    attribute is simply a null column value.  ``latLon`` is emitted only
    when both coordinates are present.  Documented deviation: a Nutch doc
    field is multi-valued, so geoip's ``domain``/``org`` can pile onto
    values earlier filters added; the columnar model instead lands a geo
    field on a name the doc already carries as ``geoip_<field>`` (both
    values survive, as separate columns).
    """
    if usage not in _GEO_USAGE_FIELDS:
        raise ValueError(
            f"index.geoip.usage must be one of {sorted(_GEO_USAGE_FIELDS)}, "
            f"got {usage!r}")
    fields = _GEO_USAGE_FIELDS[usage]

    def _apply(doc: DataFrame) -> DataFrame:
        if ip_col is not None:
            ip = F.col(ip_col)
        elif _has(doc, "metadata"):
            ip = F.col("metadata").getItem("_ip_")
        else:
            ip = F.lit(None).cast("string")
        doc = doc.withColumn("ip", ip)
        side_cols = [F.col("ip").alias("_geo_ip")]
        for f in fields:
            if f == "latLon":
                continue
            side_cols.append(
                (F.col(f) if f in geodb.columns
                 else F.lit(None).cast("string")).alias(f"_geo_{f}"))
        if "latLon" in fields:
            for c in ("latitude", "longitude"):
                side_cols.append(
                    (F.col(c) if c in geodb.columns
                     else F.lit(None).cast("double")).alias(f"_geo_{c}"))
        side = geodb.select(*side_cols)
        taken = set(doc.columns)
        out = doc.join(F.broadcast(side),
                       doc["ip"] == side["_geo_ip"], "left")
        for f in fields:
            tgt = f if f not in taken else f"geoip_{f}"
            if f == "latLon":
                lat, lon = F.col("_geo_latitude"), F.col("_geo_longitude")
                out = out.withColumn(
                    tgt,
                    F.when(lat.isNotNull() & lon.isNotNull(),
                           F.concat(lat.cast("string"), F.lit(","),
                                    lon.cast("string"))))
            else:
                out = out.withColumn(tgt, F.col(f"_geo_{f}"))
        drop = ["_geo_ip"] + [f"_geo_{f}" for f in fields if f != "latLon"]
        if "latLon" in fields:
            drop += ["_geo_latitude", "_geo_longitude"]
        return out.drop(*drop)

    return _apply


# ---------------------------------------------------------------- exchanges


def route_exchanges(doc: DataFrame, exchanges: Sequence[Mapping],
                    all_writers: Sequence[str] = ()) -> dict[str, DataFrame]:
    """Exchange framework + exchange-jexl
    (``exchange/Exchanges.java:145-160``, ``exchange/jexl/
    JexlExchange.java:54-67``, ``conf/exchanges.xml.template``).

    ``exchanges`` rows are ``{"id": ..., "expr": <spark-sql predicate>,
    "writers": [writer ids]}``; a row with ``expr=None`` is the
    ``class="default"`` exchange.  A doc goes to the union of the writers
    of every matching exchange; docs matching nothing go to the default
    exchange's writers (if configured); with no exchanges at all every
    doc goes to every writer in ``all_writers`` (Exchanges.java:79-82).

    Returns ``{writer_id: DataFrame}``.  Each frame is a filter over the
    same ``doc`` plan — predicates are Catalyst expressions (the JEXL
    stand-in, as in :func:`jexl_filter`), so each sink branch pushes its
    own predicate into the shared scan; nothing is collected or joined.
    """
    real = [e for e in exchanges if e.get("expr") is not None]
    default = next((e for e in exchanges if e.get("expr") is None), None)
    if not real and default is None:
        return {w: doc for w in all_writers}

    writer_ids: list[str] = list(dict.fromkeys(
        [w for e in exchanges for w in e.get("writers", ())]
        + list(all_writers)))
    preds = [F.expr(e["expr"]) for e in real]
    none_matched = F.lit(True)
    for p in preds:
        # JexlExchange.match treats NULL/error as no-match (:60-66)
        none_matched = none_matched & ~F.coalesce(p, F.lit(False))

    out: dict[str, DataFrame] = {}
    for w in writer_ids:
        cond = F.lit(False)
        for e, p in zip(real, preds):
            if w in e.get("writers", ()):
                cond = cond | F.coalesce(p, F.lit(False))
        if default is not None and w in default.get("writers", ()):
            cond = cond | none_matched
        out[w] = doc.filter(cond)
    return out
