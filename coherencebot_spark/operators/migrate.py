"""Frontier migrations — one-time maintenance passes over the crawldb.

:func:`normalize_frontier` is the counterpart the reference reaches via
``nutch updatedb``'s CrawlDbFilter with url-normalizing enabled
(``crawl/CrawlDbFilter.java:76-125``, ``crawldb.url.normalizers``): after
normalizer RULES change, frontier keys themselves must be rewritten once,
or the per-generate normalization (``generate.normalise``) rewrites urls
the updatedb delta can never match — the un-normalized originals stay due
forever and refetch every cycle.  Run this once, commit the result, then
leave ``normalise_on_generate`` off again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..functions.urls import with_host, with_normalized_url


def normalize_frontier(frontier: DataFrame,
                       cfg: CrawlConfig = DEFAULT) -> DataFrame:
    """Rewrite every frontier url through the normalizer; rows the
    normalizer rejects are dropped (CrawlDbFilter's null-url drop), and
    urls that COLLIDE after normalization keep the best row by the
    reference's merge order (latest fetch_time, ties by status/retries/
    interval/score — the CrawlDbMerger/Reducer tie rule)."""
    df = with_normalized_url(frontier, "url", "url") \
        .filter(F.col("url").isNotNull())
    df = with_host(df, "url", "host")
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("status"), F.desc("retries"),
        F.desc("fetch_interval"), F.desc("score"),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
