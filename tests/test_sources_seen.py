"""Tests for seed sources, sinks, and the Bloom URL-seen pre-filter."""

from __future__ import annotations

import json

import pytest

from coherencebot_spark.operators.seen import UrlSeenFilter
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.sources.seeds import FeedInjector, read_seed_files
from coherencebot_spark.sources.sinks import build_index_documents, write_csv
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def frow(url, status=Db.FETCHED):
    return dict(url=url, host=url.split("/")[2], status=int(status),
                fetch_time=T, retries=0, fetch_interval=100, score=1.0,
                signature=None, modified_time=0, metadata=None)


def test_read_seed_files(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("https://a.example.org/1\n# comment\nhttps://b.example.org/2\tk=v\n")
    df = read_seed_files(spark, str(p))
    assert df.columns == ["line"]
    assert df.count() == 3


def test_feed_injector_parses_feed(spark):
    feed = [{"url": "https://a.example.org/s", "collection": "c1"},
            {"nourl": True}]
    fi = FeedInjector("https://api/feed", "key",
                      http_get=lambda u, k: json.dumps(feed))
    out = fi.fetch_seeds(spark).collect()
    assert len(out) == 1
    assert out[0].line.startswith("https://a.example.org/s\t")
    assert "collection.seed=https://a.example.org/s" in out[0].line
    assert "collection=c1" in out[0].line
    with pytest.raises(NotImplementedError):
        FeedInjector("https://api/feed").fetch_seeds(spark)


def test_url_seen_filter(spark):
    frontier = spark.createDataFrame(
        [frow(f"https://h.example.org/p{i}") for i in range(500)], FRONTIER)
    seen = UrlSeenFilter.from_frontier(spark, frontier, capacity=500, fpp=0.01)
    links = spark.createDataFrame(
        [(f"https://h.example.org/p{i}",) for i in range(400, 600)],
        "url string",
    )
    kept = seen.drop_definitely_new(links)
    kept_urls = {r.url for r in kept.collect()}
    # no false negatives: every truly-seen url survives
    for i in range(400, 500):
        assert f"https://h.example.org/p{i}" in kept_urls
    # most definitely-new urls are dropped (fpp ~1%)
    new_kept = [u for u in kept_urls if int(u.rsplit("p", 1)[1]) >= 500]
    assert len(new_kept) <= 10
    assert seen.count_new(links) >= 90


def test_index_documents_and_csv(spark, tmp_path):
    from coherencebot_spark.schemas import CONTENT
    frontier = spark.createDataFrame(
        [frow("https://h.example.org/ok"),
         frow("https://h.example.org/gone", Db.GONE)], FRONTIER)
    content = spark.createDataFrame(
        [dict(url="https://h.example.org/ok", image_id="i", bytes=b"\x01",
              w=1, h=1, fmt="png", caption="c", phash=1)], CONTENT)
    docs = build_index_documents(frontier, content)
    got = {r.url: r for r in docs.collect()}
    assert got["https://h.example.org/ok"]._delete is False
    assert got["https://h.example.org/gone"]._delete is True
    write_csv(docs, str(tmp_path / "csv"))
    out = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert out.count() == 2
