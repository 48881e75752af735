"""Dedup — mark duplicate documents in the frontier
(SURVEY.md §2 A5/J3; ref ``crawl/DeduplicationJob.java``).

The reference's two MR jobs (group-by-signature argmax, then status-merge
back into the CrawlDb) become a window rank plus a left join:

* only ``db_fetched`` / ``db_notmodified`` rows with a signature compete
  (``DeduplicationJob.java:84-93``);
* group key = signature, optionally + host or + registered domain
  (``dedup.group.mode``, ``:97-119``); in the image graft the natural
  group key is ``phash`` — pass ``group_col="phash_meta"``;
* keep-best = the comparator cascade (``:167-229``) expressed as a window
  ORDER BY: per ``dedup.compare.order`` — ``score`` desc, ``fetchTime``
  desc (latest wins), ``urlLength`` asc on the percent-decoded URL
  (shortest wins), ``httpsOverHttp`` → https-first.

Determinism deviations (documented, SURVEY.md §7.3 risk 2):
the reference's ``httpsOverHttp`` rule only fires when two URLs are
identical up to scheme — as a total order we sort https-first generally;
and full-tie keep-choice is stream-order-dependent in the reference — we
pin url ascending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Db


def _order_cols(compare_order: tuple[str, ...]) -> list[Column]:
    cols: list[Column] = []
    for key in compare_order:
        if key == "score":
            cols.append(F.desc("score"))
        elif key == "fetchTime":
            cols.append(F.desc("fetch_time"))
        elif key == "urlLength":
            cols.append(F.asc(F.length(F.expr("coalesce(try_url_decode(url), url)"))))
        elif key == "httpsOverHttp":
            cols.append(F.desc(F.col("url").startswith("https://")))
        else:
            raise ValueError(f"unknown dedup compare key: {key}")
    cols.append(F.asc("url"))  # pinned tie-break
    return cols


def find_duplicates(frontier: DataFrame, cfg: CrawlConfig = DEFAULT,
                    group_col: str | None = None,
                    key_col: str = "signature") -> DataFrame:
    """Return (url) rows to be marked db_duplicate.

    ``key_col`` replaces the signature as the dedup key (the graft's
    cross-cycle phash dedup passes the metadata-derived ``phash_meta``
    column — rows with a NULL key never compete, mirroring the
    reference's hasSignature gate); ``group_col`` adds a second key
    column on top (the reference's dedup.group.mode extension)."""
    # prune to the deciding columns BEFORE the comparator window: at a
    # 10^10 frontier most rows are fetched and eligible, and the window
    # exchange must not carry signatures/metadata/full rows — only
    # (url, key, comparator columns), the same discipline dedup_by_phash
    # applies (PLANS.md §dedup)
    narrow = {"url", "host", "status", "score", "fetch_time", key_col}
    if group_col is not None:
        narrow.add(group_col)
    eligible = frontier.select(
        *[c for c in frontier.columns if c in narrow]
    ).filter(
        F.col("status").isin(int(Db.FETCHED), int(Db.NOTMODIFIED))
        & F.col(key_col).isNotNull()
    )
    if group_col is not None:
        keys = [F.col(key_col), F.col(group_col)]
    elif cfg.dedup_group_mode == "host":
        keys = [F.col(key_col), F.col("host")]
    elif cfg.dedup_group_mode == "domain":
        from ..functions.urls import domain_of

        def _dom(host):
            return domain_of(host).astype(object)

        eligible = eligible.withColumn(
            "_dom", F.pandas_udf(_dom, "string")(F.col("host"))
        )
        keys = [F.col(key_col), F.col("_dom")]
    else:
        keys = [F.col(key_col)]

    w = Window.partitionBy(*keys).orderBy(*_order_cols(cfg.dedup_compare_order))
    return (
        eligible.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("url")
    )


def dedup(frontier: DataFrame, cfg: CrawlConfig = DEFAULT,
          group_col: str | None = None,
          key_col: str = "signature") -> DataFrame:
    """Full dedup job: returns the frontier with duplicates marked
    (J3 status-merge, ``DeduplicationJob.java:243-266``)."""
    dups = find_duplicates(frontier, cfg, group_col, key_col).withColumn(
        "_dup", F.lit(True)
    )
    return (
        frontier.join(dups, "url", "left")
        .withColumn(
            "status",
            F.when(F.col("_dup"), F.lit(int(Db.DUPLICATE))).otherwise(F.col("status")),
        )
        .drop("_dup")
    )


def dedup_by_phash(frontier: DataFrame, content: DataFrame,
                   cfg: CrawlConfig = DEFAULT,
                   broadcast_content: bool = False) -> DataFrame:
    """Graft-specific dedup: group by the payload's perceptual hash
    (BASELINE.json: "phash used for dedup within the frontier-update join").

    ``content`` provides (url, phash); rows sharing a phash keep the best
    by the same comparator cascade.

    ``broadcast_content=True`` keeps the frontier shuffle-free: the
    (url, phash) side is fetchlist-sized, so both the phash attach and the
    dup-mark join broadcast — the frontier's 10^10 rows never move.  The
    comparator window only shuffles the eligible fetchlist-sized subset,
    pruned to its 5 deciding columns.  (On a cluster with the frontier
    url-bucketed, the same plan is a storage-partitioned join even with
    the flag off.)"""
    ph = content.select("url", F.col("phash").alias("_phash"))
    if broadcast_content:
        ph = F.broadcast(ph)
    eligible = (
        frontier.select("url", "status", "score", "fetch_time")
        .join(ph, "url", "inner")
        .filter(
            F.col("status").isin(int(Db.FETCHED), int(Db.NOTMODIFIED))
            & F.col("_phash").isNotNull()
        )
    )
    w = Window.partitionBy("_phash").orderBy(*_order_cols(cfg.dedup_compare_order))
    dups = (
        eligible.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("url", F.lit(True).alias("_dup"))
    )
    if broadcast_content:
        dups = F.broadcast(dups)
    return (
        frontier.join(dups, "url", "left")
        .withColumn(
            "status",
            F.when(F.col("_dup"), F.lit(int(Db.DUPLICATE))).otherwise(F.col("status")),
        )
        .drop("_dup")
    )
