"""RSS/Atom feed parsing — the ``feed`` plugin, Spark-first.

Reference: ``plugin/feed/.../parse/feed/FeedParser.java:103-146``
(each syndication entry becomes its own sub-parse keyed by the entry
link, plus one feed-level parse for the feed url itself) and
``:218-284,301-339`` (per-entry fields: title, description/content as
the text, author(s), categories, published/updated millis, the ``feed``
back-pointer); ``.../indexer/feed/FeedIndexingFilter.java:69-105``
(doc fields author/tags/feed/publishedDate/updatedDate).

The reference leans on the ROME library + a nested re-parse of each
entry body; here the extraction is pure Catalyst — ``regexp_extract_all``
splits the XML into ``<item>``/``<entry>`` blocks and per-block
``regexp_extract`` pulls the fields, so a corpus of feeds parses as one
whole-stage-codegen projection, no Python and no shuffle.  The nested
re-parse collapses to markup-stripping (what it amounts to for the
html/plain content types the reference routes).

Multi-valued metadata (authors, tags) uses the repo's ``\\t``-join
convention (``functions/html_fields.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_tags", "feed_parse", "feed_indexing_filter"]

_BLOCK_RSS = r"(?s)<item[\s>].*?</item>"
_BLOCK_ATOM = r"(?s)<entry[\s>].*?</entry>"


def strip_tags(c: Column) -> Column:
    """``FeedParser.stripTags`` (:286-299): drop every ``<...>`` span,
    trim the remainder."""
    return F.trim(F.regexp_replace(c, r"<[^>]*>", ""))


def _field(block: Column, tag: str) -> Column:
    """First ``<tag ...>text</tag>`` body in the block, null if absent."""
    return F.nullif(F.regexp_extract(
        block, rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1), F.lit(""))


def _entry_link(block: Column) -> Column:
    """Atom ``<link href="..."/>`` wins, RSS ``<link>text</link>``
    otherwise (SyndEntry.getLink resolves the same way)."""
    href = F.nullif(F.regexp_extract(
        block, r"""<link[^>]*href=["']([^"']+)["']""", 1), F.lit(""))
    return F.coalesce(href, _field(block, "link"))


def _authors(block: Column) -> Column:
    """RSS ``<author>``/``<dc:creator>`` + Atom ``<author><name>``,
    tab-joined (FeedParser.addFields:306-321 multi-adds)."""
    atom = F.transform(
        F.regexp_extract_all(
            block, F.lit(r"(?s)<author[^>]*>.*?<name[^>]*>(.*?)</name>"), 1),
        strip_tags)
    rss = F.transform(
        F.regexp_extract_all(
            block, F.lit(r"(?s)<dc:creator[^>]*>(.*?)</dc:creator>"), 1),
        strip_tags)
    plain = F.when(
        F.size(atom) == 0,
        F.transform(
            F.regexp_extract_all(
                block, F.lit(r"(?s)<author[^>]*>([^<]*?)</author>"), 1),
            strip_tags)
    ).otherwise(F.array().cast("array<string>"))
    all_a = F.filter(F.concat(atom, rss, plain), lambda a: a != "")
    return F.nullif(F.array_join(all_a, "\t"), F.lit(""))


def _tags(block: Column) -> Column:
    """RSS ``<category>name</category>`` + Atom ``<category term=...>``
    (:323-325), tab-joined."""
    rss = F.regexp_extract_all(
        block, F.lit(r"(?s)<category[^>]*>([^<]+?)</category>"), 1)
    atom = F.regexp_extract_all(
        block, F.lit(r"""<category[^>]*term=["']([^"']+)["']"""), 1)
    cleaned = F.filter(F.transform(F.concat(rss, atom), strip_tags),
                       lambda t: t != "")
    return F.nullif(F.array_join(cleaned, "\t"), F.lit(""))


def _epoch_ms(raw: Column) -> Column:
    """Feed date string -> epoch-ms STRING (``Long.toString(
    published.getTime())``, :327-332).  RFC-822 (RSS pubDate) and
    ISO-8601 (Atom) both accepted."""
    # Spark >= 3 refuses 'E' in PARSE patterns — drop the RFC-822 weekday
    # prefix instead of matching it
    no_dow = F.regexp_replace(raw, r"^[A-Za-z]{3},\s*", "")
    ts = F.coalesce(
        F.try_to_timestamp(no_dow, F.lit("dd MMM yyyy HH:mm:ss Z")),
        F.try_to_timestamp(raw, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    return F.unix_millis(ts).cast("string")


def feed_parse(df: DataFrame, xml_col: str = "xml",
               url_col: str = "url") -> DataFrame:
    """Explode a frame of fetched feeds into parse rows.

    Output: one row per syndication entry (``is_entry=true``, ``url`` =
    entry link) plus one feed-level row per input (``is_entry=false``,
    the feed's own title/description — FeedParser.java:139-143).  Rows
    whose entry has no link are dropped (:230-238).  ``parse_meta``
    carries feed/author/tags/published/updated exactly as the reference
    sets them."""
    xml = F.col(xml_col)
    feed_link = F.coalesce(
        # Atom: first <link href=...> OUTSIDE entries — approximate with
        # the first in the doc, which precedes entries in practice
        F.nullif(F.regexp_extract(
            xml, r"""<link[^>]*href=["']([^"']+)["']""", 1), F.lit("")),
        F.nullif(F.regexp_extract(
            xml, r"(?s)<link[^>]*>\s*([^<\s][^<]*?)\s*</link>", 1),
            F.lit("")))

    blocks = F.concat(F.regexp_extract_all(xml, F.lit(_BLOCK_RSS), 0),
                      F.regexp_extract_all(xml, F.lit(_BLOCK_ATOM), 0))

    def meta_pairs(*kvs):
        keys, vals = [], []
        for k, v in kvs:
            keys.append(F.lit(k))
            vals.append(v)
        return F.map_filter(
            F.map_from_arrays(F.array(*keys), F.array(*vals)),
            lambda k, v: v.isNotNull())

    entry = F.explode(blocks).alias("_block")
    entries = (
        df.select(F.col(url_col).alias("_feed_url"), xml.alias("_xml"),
                  feed_link.alias("_feed_link"), entry)
        .select(
            F.col("_feed_url").alias("feed_url"),
            _entry_link(F.col("_block")).alias("url"),
            strip_tags(F.coalesce(_field(F.col("_block"), "title"),
                                  F.lit(""))).alias("title"),
            # description else the concatenated contents (:256-266);
            # sub-parse ~ markup strip
            strip_tags(F.coalesce(
                _field(F.col("_block"), "description"),
                _field(F.col("_block"), "summary"),
                _field(F.col("_block"), "content"),
                F.lit(""))).alias("text"),
            F.lit(True).alias("is_entry"),
            meta_pairs(
                ("feed", F.col("_feed_link")),
                ("author", _authors(F.col("_block"))),
                ("tags", _tags(F.col("_block"))),
                ("published",
                 _epoch_ms(_field(F.col("_block"), "pubDate"))),
                ("published.atom",
                 _epoch_ms(_field(F.col("_block"), "published"))),
                ("updated",
                 _epoch_ms(_field(F.col("_block"), "updated"))),
            ).alias("parse_meta"),
        )
        .filter(F.col("url").isNotNull())
    )
    # fold the atom <published> variant into the canonical key
    entries = entries.withColumn(
        "parse_meta",
        F.when(
            F.map_contains_key("parse_meta", "published.atom"),
            F.map_concat(
                F.map_filter(
                    F.col("parse_meta"),
                    lambda k, v: (k != F.lit("published.atom"))
                    & (k != F.lit("published"))),
                F.map_from_arrays(
                    F.array(F.lit("published")),
                    F.array(F.element_at("parse_meta", "published.atom")))))
        .otherwise(F.col("parse_meta")))

    feed_rows = df.select(
        F.col(url_col).alias("feed_url"),
        F.col(url_col).alias("url"),
        strip_tags(F.coalesce(
            F.regexp_extract(xml, r"(?s)<title[^>]*>(.*?)</title>", 1),
            F.lit(""))).alias("title"),
        strip_tags(F.coalesce(
            F.nullif(F.regexp_extract(
                xml, r"(?s)<description[^>]*>(.*?)</description>", 1),
                F.lit("")),
            F.regexp_extract(xml, r"(?s)<subtitle[^>]*>(.*?)</subtitle>", 1),
            )).alias("text"),
        F.lit(False).alias("is_entry"),
        F.create_map().cast("map<string,string>").alias("parse_meta"),
    )
    return entries.unionByName(feed_rows)


def feed_indexing_filter(doc: DataFrame,
                         meta_col: str = "parse_meta") -> DataFrame:
    """FeedIndexingFilter.java:69-105: promote the feed parse metadata to
    doc fields — multi-valued ``author``/``tags`` arrays, the ``feed``
    back-pointer, and epoch-ms ``publishedDate``/``updatedDate``."""
    meta = F.col(meta_col)

    def mv(key):
        v = F.element_at(meta, key)
        return F.when(v.isNotNull(), F.split(v, "\t"))

    return (doc
            .withColumn("author", mv("author"))
            .withColumn("tags", mv("tags"))
            .withColumn("feed", F.element_at(meta, "feed"))
            .withColumn("publishedDate",
                        F.element_at(meta, "published").cast("long"))
            .withColumn("updatedDate",
                        F.element_at(meta, "updated").cast("long")))
