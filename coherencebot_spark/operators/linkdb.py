"""LinkDb — inverted link graph (SURVEY.md §2 A4/J7; ref
``crawl/LinkDb.java``, ``crawl/LinkDbMerger.java``, ``crawl/Inlinks.java``).

The reference's invert job (map outlinks → shuffle by target → collect
Inlinks) is a ``groupBy(to_url).agg(collect_list)`` with the same caps:
anchors truncated to ``linkdb.max.anchor.length`` (100,
``LinkDb.java:207-210``), at most ``linkdb.max.inlinks`` (10000) per
target (``LinkDbMerger.java:88``).  Internal links ignored by default
(``linkdb.ignore.internal.links``, ``LinkDb.java:128-140``).

A pre-cap window bounds the per-target list *before* the collect so a
target with 10^8 inlinks never materializes an unbounded array (the same
InlinkPriorityQueue-style discipline as updatedb).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Msg


def invert_links(parse_out: DataFrame, cfg: CrawlConfig = DEFAULT) -> DataFrame:
    """parse_out linked rows → LINKDB (url, inlinks array<from_url, anchor>)."""
    links = parse_out.filter(
        (F.col("status") == int(Msg.LINKED)) & F.col("from_url").isNotNull()
    ).select(
        "url",
        "host",
        "from_url",
        F.left(F.coalesce(F.col("anchor"), F.lit("")),
               F.lit(int(cfg.linkdb_max_anchor_length))).alias("anchor"),
        F.lower(F.expr("parse_url(from_url, 'HOST')")).alias("from_host"),
    )
    if cfg.linkdb_ignore_internal_links:
        links = links.filter(
            F.col("from_host").isNull() | (F.col("from_host") != F.col("host"))
        )
    if cfg.linkdb_ignore_external_links:
        links = links.filter(F.col("from_host") == F.col("host"))

    # the reference's Inlinks is a HashSet keyed by (from_url, anchor):
    # identical inlinks collapse — without this a recrawled page re-adds
    # the same edge every cycle until duplicates crowd real inlinks out
    # of the 10k cap
    links = links.dropDuplicates(["url", "from_url", "anchor"])
    w = Window.partitionBy("url").orderBy("from_url", "anchor")
    capped = (
        links.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(cfg.linkdb_max_inlinks))
    )
    return capped.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("from_url", "anchor"))
        ).alias("inlinks")
    )


def merge_linkdb(old: DataFrame | None, new: DataFrame,
                 cfg: CrawlConfig = DEFAULT) -> DataFrame:
    """LinkDbMerger: concat inlink lists, cap at linkdb.max.inlinks
    (``LinkDbMerger.java:80-110``)."""
    if old is None:
        return new
    u = old.unionByName(new)
    # HashSet semantics + a pinned total order: dedup identical
    # (from_url, anchor) edges across cycles, sort, THEN cap — the
    # former unsorted slice both kept duplicates and made which inlinks
    # survive the cap collect_list-order-dependent
    return u.groupBy("url").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("inlinks")))),
            1, int(cfg.linkdb_max_inlinks),
        ).alias("inlinks")
    )
