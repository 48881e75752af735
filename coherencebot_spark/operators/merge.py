"""Mergers — CrawlDbMerger (U2) and SegmentMerger (J6).

* ``merge_crawldbs`` (ref ``crawl/CrawlDbMerger.java``): n frontiers →
  per URL the latest datum by fetch_time wins, metadata maps merged in
  fetch_time order (later wins key conflicts, like the reference's
  ``putAll`` sequence).
* ``merge_segments`` (ref ``segment/SegmentMerger.java:121-``, 810 LoC of
  co-grouping): n per-cycle tables → keep the latest row per URL — a
  window rank, nothing more.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_crawldbs(dbs: list[DataFrame]) -> DataFrame:
    # metadata fold uses map_concat with last-wins semantics (putAll);
    # enforce the policy at the operator boundary — two dbs carrying the
    # same url share keys in the NORMAL case, and the default EXCEPTION
    # policy would abort the merge
    dbs[0].sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    u = reduce(lambda a, b: a.unionByName(b), dbs)
    value = F.struct(
        "fetch_time", "status", "retries", "fetch_interval", "score",
        "signature", "modified_time", "host",
    )
    key = F.struct("fetch_time", "status", "retries", "fetch_interval", "score")
    # sorted-entries string as the EQUAL-fetch_time tie-break: without a
    # total order the overlay winner for conflicting keys would be
    # stream-order-dependent (the struct carries a map, which array_sort's
    # default lexicographic ordering can't handle — hence the comparator)
    mrepr = F.array_sort(
        F.map_entries(F.coalesce(F.col("metadata"), F.expr("map()")))
    ).cast("string")
    g = u.groupBy("url").agg(
        F.max_by(value, key).alias("v"),
        F.array_sort(
            F.collect_list(F.struct("fetch_time", "metadata",
                                    mrepr.alias("_mrepr"))),
            lambda l, r: F.when(l["fetch_time"] < r["fetch_time"], F.lit(-1))
            .when(l["fetch_time"] > r["fetch_time"], F.lit(1))
            .when(l["_mrepr"] < r["_mrepr"], F.lit(-1))
            .when(l["_mrepr"] > r["_mrepr"], F.lit(1))
            .otherwise(F.lit(0)),
        ).alias("metas"),
    )
    merged_meta = F.aggregate(
        "metas",
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, m: F.map_concat(acc, F.coalesce(m["metadata"], F.expr("map()"))),
    )
    v = F.col("v")
    return g.select(
        "url",
        v["host"].alias("host"),
        v["status"].alias("status"),
        v["fetch_time"].alias("fetch_time"),
        v["retries"].alias("retries"),
        v["fetch_interval"].alias("fetch_interval"),
        v["score"].alias("score"),
        v["signature"].alias("signature"),
        v["modified_time"].alias("modified_time"),
        F.when(F.size(merged_meta) > 0, merged_meta).alias("metadata"),
    )


def merge_segments(segments: list[DataFrame]) -> DataFrame:
    u = reduce(lambda a, b: a.unionByName(b), segments)
    w = Window.partitionBy("url").orderBy(F.desc("fetch_time"))
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
