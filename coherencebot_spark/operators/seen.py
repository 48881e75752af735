"""URL-seen membership acceleration (north rule: broadcast bloom/cuckoo).

The frontier key-set is the ground truth for "seen"; the Bloom filter is a
*pre-filter* that cuts shuffle volume, never a correctness device
(SURVEY.md §2.3): false positives ("maybe seen") always flow through the
exact full-outer updatedb join; only DEFINITE-NEW short-circuits are taken.

Two legitimate short-circuits:

* ``additions_allowed=False`` crawls (the reference's
  ``db.update.additions.allowed``): a link whose target is definitely not
  in the frontier can never produce an output row — drop it before the
  shuffle.  At 10^10 links/cycle this removes the dominant shuffle.
* discovery accounting: count definitely-new URLs per cycle without
  joining.

At 10^10 URLs a single filter is ~12 GB at 1% fpp; production shards it by
host-bucket: :class:`ShardedUrlSeenFilter` builds one bloom per bucket as
a DataFrame (never collected to the driver) and answers membership via a
bucket-cogroup, so each ~47 MB shard crosses the wire once per bucket
group.  :class:`UrlSeenFilter` (monolithic, driver-broadcast) remains the
small/medium-frontier path.

``backend='cuckoo'`` swaps the shards for cuckoo filters (the north
rule's second structure): ~4 bytes/URL instead of ~1.2 but fpp ≤ 0.012%
and — the reason to pay — :meth:`ShardedUrlSeenFilter.remove`, which
un-sees purged URLs in place; a bloom shard can only be rebuilt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import (
    BloomFilter, bloom_contains_col, bloom_contains_sharded, build_bloom_local,
    build_bloom_sharded, build_cuckoo_sharded, cuckoo_contains_sharded,
    cuckoo_delete_sharded,
)


class UrlSeenFilter:
    """Small-frontier convenience (driver-broadcast monolithic bitmap).

    The underlying builder is capacity-guarded (``build_bloom_local``), so
    this class cannot silently be reached with a 10^10 frontier — the
    crawl driver and every scale path use :class:`ShardedUrlSeenFilter`."""

    def __init__(self, spark: SparkSession, bloom: BloomFilter):
        self.spark = spark
        self.bloom = bloom

    @classmethod
    def from_frontier(cls, spark: SparkSession, frontier: DataFrame,
                      capacity: int | None = None,
                      fpp: float = 0.01) -> "UrlSeenFilter":
        if capacity is None:
            capacity = max(frontier.count(), 1024)
        return cls(spark, build_bloom_local(frontier, "url", capacity, fpp))

    def with_maybe_seen(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        return bloom_contains_col(self.spark, df, url_col, self.bloom)

    def drop_definitely_new(self, links: DataFrame,
                            url_col: str = "url") -> DataFrame:
        """For additions-not-allowed updates: keep only maybe-seen links."""
        return (
            self.with_maybe_seen(links, url_col)
            .filter(F.col("maybe_seen"))
            .drop("maybe_seen")
        )

    def count_new(self, links: DataFrame, url_col: str = "url") -> int:
        """Lower bound on definitely-new URLs (discovery metric)."""
        return (
            self.with_maybe_seen(links.select(url_col).distinct(), url_col)
            .filter(~F.col("maybe_seen"))
            .count()
        )


class ShardedUrlSeenFilter:
    """Per-bucket membership shards held as a (cached) DataFrame — the
    10^10 path: no driver bitmap, no monolithic broadcast.  Same contract
    as :class:`UrlSeenFilter` (no false negatives; "maybe" flows to the
    exact join).

    ``backend='bloom'`` (default, the crawl driver's path) or
    ``'cuckoo'`` — the cuckoo shards additionally support
    :meth:`remove` (frontier purges un-see their URLs in place instead
    of forcing a full shard rebuild) at ~4 bytes/URL vs the bloom's
    ~1.2, with a far lower fpp (≤ 0.012%)."""

    def __init__(self, blooms: DataFrame, n_buckets: int,
                 backend: str = "bloom"):
        self.blooms = blooms
        self.n_buckets = n_buckets
        self.backend = backend

    @classmethod
    def from_frontier(cls, frontier: DataFrame, capacity: int | None = None,
                      n_buckets: int = 256, fpp: float = 0.01,
                      backend: str = "bloom") -> "ShardedUrlSeenFilter":
        if capacity is None:
            capacity = max(frontier.count(), 1024)
        if backend == "bloom":
            shards = build_bloom_sharded(frontier, "url", capacity,
                                         n_buckets, fpp)
        elif backend == "cuckoo":
            shards = build_cuckoo_sharded(frontier, "url", capacity,
                                          n_buckets)
        else:
            raise ValueError(f"unknown url-seen backend {backend!r}")
        shards = shards.persist()
        shards.count()  # materialize shards once; reused across probes
        return cls(shards, n_buckets, backend)

    def with_maybe_seen(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        if self.backend == "cuckoo":
            return cuckoo_contains_sharded(df, url_col, self.blooms,
                                           n_buckets=self.n_buckets)
        return bloom_contains_sharded(df, url_col, self.blooms,
                                      n_buckets=self.n_buckets)

    def remove(self, purged: DataFrame,
               url_col: str = "url") -> "ShardedUrlSeenFilter":
        """Un-see purged URLs (cuckoo backend only — a bloom cannot
        delete; rebuild it from the filtered frontier instead).  Only
        delete URLs that were actually inserted (the standard cuckoo
        caveat); frontier purges satisfy that by construction.  Returns
        a NEW filter over rebuilt shards (touched buckets only — the
        cogroup passes untouched shards through) and unpersists this
        one, snapshot-swap style."""
        if self.backend != "cuckoo":
            raise ValueError(
                "remove() needs backend='cuckoo': bloom filters cannot "
                "delete — rebuild via from_frontier on the purged "
                "frontier instead")
        new = cuckoo_delete_sharded(
            self.blooms, purged.select(url_col), url_col,
            n_buckets=self.n_buckets).persist()
        new.count()
        self.blooms.unpersist()
        return ShardedUrlSeenFilter(new, self.n_buckets, self.backend)

    def drop_definitely_new(self, links: DataFrame,
                            url_col: str = "url") -> DataFrame:
        return (
            self.with_maybe_seen(links, url_col)
            .filter(F.col("maybe_seen"))
            .drop("maybe_seen")
        )

    def count_new(self, links: DataFrame, url_col: str = "url") -> int:
        return (
            self.with_maybe_seen(links.select(url_col).distinct(), url_col)
            .filter(~F.col("maybe_seen"))
            .count()
        )

    def unpersist(self) -> None:
        self.blooms.unpersist()
