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
host-bucket (one bloom per bucket, broadcast only to that bucket's tasks).
The sandbox build uses one filter (``functions.hashing.build_bloom``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import BloomFilter, bloom_contains_col, build_bloom


class UrlSeenFilter:
    def __init__(self, spark: SparkSession, bloom: BloomFilter):
        self.spark = spark
        self.bloom = bloom

    @classmethod
    def from_frontier(cls, spark: SparkSession, frontier: DataFrame,
                      capacity: int | None = None,
                      fpp: float = 0.01) -> "UrlSeenFilter":
        if capacity is None:
            capacity = max(frontier.count(), 1024)
        return cls(spark, build_bloom(frontier, "url", capacity, fpp))

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
