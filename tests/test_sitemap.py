"""SitemapProcessor analogue tests (merge rules + entry mapping)."""

from __future__ import annotations

import pandas as pd

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.sitemap import (
    CHANGEFREQ_S, sitemap_entries, sitemap_merge,
)
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def provider(hosts: pd.Series) -> pd.DataFrame:
    rows = []
    for h in hosts:
        rows.append({"url": f"https://{h}/new", "priority": 0.8,
                     "changefreq": "daily", "lastmod_ms": T - 5})
        rows.append({"url": f"https://{h}/existing", "priority": 0.9,
                     "changefreq": "weekly", "lastmod_ms": T - 9})
    return pd.DataFrame(rows)


def test_sitemap_entry_mapping_and_merge(spark):
    existing = dict(
        url="https://h1.example.org/existing", host="h1.example.org",
        status=int(Db.FETCHED), fetch_time=T, retries=1, fetch_interval=111,
        score=5.0, signature=b"\x01", modified_time=7, metadata=None,
    )
    frontier = spark.createDataFrame([existing], FRONTIER)
    hosts = spark.createDataFrame([("h1.example.org",)], "host string")
    entries = sitemap_entries(spark, hosts, provider)
    out = {r.url: r for r in sitemap_merge(frontier, entries).collect()}
    # new url: injected as unfetched w/ sitemap-derived fields
    new = out["https://h1.example.org/new"]
    assert new.status == Db.UNFETCHED
    assert new.score == pytest_approx(0.8)
    assert new.fetch_interval == CHANGEFREQ_S["daily"]
    assert new.modified_time == T - 5
    # existing url: original datum wins (overwrite off — reference default)
    ex = out["https://h1.example.org/existing"]
    assert ex.status == Db.FETCHED
    assert ex.score == 5.0 and ex.fetch_interval == 111 and ex.modified_time == 7
    # overwrite flag overlays sitemap values onto the existing datum
    out2 = {r.url: r for r in sitemap_merge(
        frontier, entries, overwrite_existing=True).collect()}
    ex2 = out2["https://h1.example.org/existing"]
    assert ex2.status == Db.FETCHED
    assert ex2.score == pytest_approx(0.9)
    assert ex2.fetch_interval == CHANGEFREQ_S["weekly"]


def pytest_approx(x):
    import pytest
    return pytest.approx(x, rel=1e-6)
