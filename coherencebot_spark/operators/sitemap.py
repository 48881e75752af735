"""Sitemap processing (ref ``util/SitemapProcessor.java``; optional step 2
of the crawl loop, ``src/bin/crawl:339-348``).

The reference fetches robots-declared sitemap XML per host, parses entries
(crawler-commons), and merges them into the CrawlDb.  Here the *fetch+XML
parse* is an injectable provider (the sandbox has no network; the synthetic
provider derives deterministic entries per host), while the Spark side is
exact:

* entry → datum mapping (``SitemapProcessor.java:260-283``):
  score = priority, fetch_interval from changefreq
  (always 1 / hourly 3600 / daily 86400 / weekly 604800 / monthly 2592000 /
  yearly 31536000 / never MAX_INT), modified_time = lastmod;
* merge rules (``SitemapReducer:306-353``): existing crawldb row wins
  (sitemap values overlay only when ``sitemap.url.overwrite.existing`` —
  "DO NOT ENABLE!!" in the reference, default false); new URLs enter as
  db_unfetched.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Db
from ..functions.urls import normalize_urls

CHANGEFREQ_S = {
    "always": 1, "hourly": 3600, "daily": 86400, "weekly": 604800,
    "monthly": 2_592_000, "yearly": 31_536_000, "never": (1 << 31) - 1,
}

# provider: hosts -> DataFrame[url, priority, changefreq, lastmod_ms]
SitemapProvider = Callable[[pd.Series], pd.DataFrame]


def synthetic_sitemaps(hosts: pd.Series) -> pd.DataFrame:
    """Deterministic sitemap entries: 3 urls per host with cycling
    changefreqs/priorities (seeded by host index)."""
    import numpy as np

    import re as _re

    rows = []
    freqs = list(CHANGEFREQ_S)
    for h in hosts:
        # only the synth world's hostNNNN.* pattern carries an index; any
        # other hostname seeds from 0 (a substring check crashed on e.g.
        # 'ghost.example.com' → int('g'))
        m = _re.match(r"host(\d+)\.", str(h))
        idx = int(m.group(1)) if m else 0
        rng = np.random.default_rng(42 + idx)
        for j in range(3):
            rows.append({
                "url": f"https://{h}/sitemap/{j}",
                "priority": round(float(rng.integers(1, 11)) / 10, 1),
                "changefreq": freqs[int(rng.integers(len(freqs)))],
                "lastmod_ms": 1_700_000_000_000 - int(rng.integers(0, 10_000_000)),
            })
    return pd.DataFrame(rows, columns=["url", "priority", "changefreq", "lastmod_ms"])


def sitemap_entries(spark, hosts: DataFrame,
                    provider: SitemapProvider | None = None) -> DataFrame:
    """Per distinct host, fetch+parse sitemaps via the provider →
    normalized candidate rows."""
    provider = provider or synthetic_sitemaps

    def gen(it):
        for pdf in it:
            out = provider(pdf["host"])
            out["url"] = normalize_urls(out["url"])
            yield out[out["url"].notna()]

    return hosts.select("host").distinct().mapInPandas(
        gen, schema="url string, priority double, changefreq string, lastmod_ms long"
    )


def sitemap_merge(frontier: DataFrame, entries: DataFrame,
                  cfg: CrawlConfig = DEFAULT,
                  overwrite_existing: bool = False) -> DataFrame:
    """Merge sitemap entries into the frontier (SitemapReducer rules)."""
    freq_map = F.create_map(
        *[x for k, v in CHANGEFREQ_S.items() for x in (F.lit(k), F.lit(v))]
    )
    sm = entries.select(
        "url",
        F.lower(F.expr("parse_url(url, 'HOST')")).alias("sm_host"),
        F.col("priority").cast("float").alias("sm_score"),
        F.coalesce(freq_map.getItem(F.lower("changefreq")),
                   F.lit(int(cfg.interval_default_s))).cast("long")
        .alias("sm_interval"),
        F.coalesce(F.col("lastmod_ms"), F.lit(0)).cast("long").alias("sm_modified"),
    )
    # one entry per url (dedup: highest priority wins, pinned)
    sm = sm.groupBy("url").agg(
        F.max_by(F.struct("sm_host", "sm_score", "sm_interval", "sm_modified"),
                 F.struct("sm_score", "sm_modified")).alias("s")
    ).select("url", "s.*")

    j = frontier.join(sm, "url", "full_outer")
    has_old = F.col("status").isNotNull()
    has_sm = F.col("sm_score").isNotNull()

    def pick(old_col, sm_col):
        if overwrite_existing:
            return F.when(has_old & has_sm, sm_col).when(has_old, old_col).otherwise(sm_col)
        return F.when(has_old, old_col).otherwise(sm_col)

    return j.select(
        "url",
        F.coalesce(F.col("host"), F.col("sm_host")).alias("host"),
        F.when(has_old, F.col("status")).otherwise(F.lit(int(Db.UNFETCHED)))
        .cast("int").alias("status"),
        F.coalesce(F.col("fetch_time"), F.lit(0)).cast("long").alias("fetch_time"),
        F.coalesce(F.col("retries"), F.lit(0)).cast("int").alias("retries"),
        pick(F.col("fetch_interval"), F.col("sm_interval")).cast("long")
        .alias("fetch_interval"),
        pick(F.col("score"), F.col("sm_score")).cast("float").alias("score"),
        F.col("signature"),
        pick(F.col("modified_time"), F.col("sm_modified")).cast("long")
        .alias("modified_time"),
        F.col("metadata"),
    )
