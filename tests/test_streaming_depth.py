"""Streaming seed intake + depth-limited crawl tests."""

from __future__ import annotations

import pandas as pd

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.depth import (
    limit_outlinks_by_depth, with_seed_depth,
)
from coherencebot_spark.plans.cycle import CrawlDriver
from coherencebot_spark.schemas import PARSE_OUT
from coherencebot_spark.status import Db, Msg
from coherencebot_spark.streaming.continuous import stream_seed_drops

T = 1_700_000_000_000


def test_stream_seed_drops(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.txt").write_text(
        "https://h1.example.org/seed/1\nhttps://h2.example.org/seed/2\n")
    driver = CrawlDriver(spark, str(tmp_path / "crawl"), DEFAULT)
    q = stream_seed_drops(spark, driver, str(drop), str(tmp_path / "ckpt"),
                          clock=lambda: T)
    q.awaitTermination(120)
    f = driver.frontier.read(spark)
    assert f.count() == 2
    assert {r.status for r in f.collect()} == {Db.UNFETCHED}
    # second drop folds into the existing frontier (exactly-once intake)
    (drop / "b.txt").write_text("https://h3.example.org/seed/3\n")
    q = stream_seed_drops(spark, driver, str(drop), str(tmp_path / "ckpt"),
                          clock=lambda: T + 1)
    q.awaitTermination(120)
    assert driver.frontier.read(spark).count() == 3


def test_depth_limiting(spark):
    inj = spark.createDataFrame(
        [("https://h/x", None)], "url string, metadata map<string,string>")
    stamped = with_seed_depth(inj, max_depth=2).collect()[0]
    assert stamped.metadata["_depth_"] == "1"
    assert stamped.metadata["_maxdepth_"] == "2"

    links = spark.createDataFrame(
        [
            dict(url="https://h/c1", host="h", status=int(Msg.LINKED), score=0.1,
                 signature=None, from_url="https://h/depth1", anchor=None,
                 metadata=None),
            dict(url="https://h/c2", host="h", status=int(Msg.LINKED), score=0.1,
                 signature=None, from_url="https://h/depth2", anchor=None,
                 metadata=None),
        ],
        PARSE_OUT,
    )
    parents = spark.createDataFrame(
        [
            ("https://h/depth1", {"_depth_": "1", "_maxdepth_": "2"}),
            ("https://h/depth2", {"_depth_": "2", "_maxdepth_": "2"}),
        ],
        "url string, metadata map<string,string>",
    )
    out = limit_outlinks_by_depth(links, parents).collect()
    # parent at depth 2 of max 2 → its outlink discarded
    assert [r.url for r in out] == ["https://h/c1"]
    assert out[0].metadata["_depth_"] == "2"  # child depth = parent + 1


def test_stream_politeness_pacer_state_across_batches(spark, tmp_path):
    """applyInPandasWithState P2: per-host crawl-delay pacing carries its
    virtual-clock state ACROSS micro-batches and restarts (checkpointed):
    the second drop's fetch_ts continue where the first stopped."""
    import json

    from coherencebot_spark.streaming.continuous import stream_politeness_pacer

    src = tmp_path / "cand"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "url string, host string, sort_key long, cur_time long"

    def drop(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run_once():
        cand = spark.readStream.schema(schema).json(str(src))
        paced = stream_politeness_pacer(cand, delay_ms=1000)
        q = (paced.writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    drop("b1.json", [
        {"url": "https://h1/a", "host": "h1", "sort_key": 2, "cur_time": T},
        {"url": "https://h1/b", "host": "h1", "sort_key": 1, "cur_time": T},
        {"url": "https://h2/x", "host": "h2", "sort_key": 5, "cur_time": T},
    ])
    run_once()
    drop("b2.json", [
        {"url": "https://h1/c", "host": "h1", "sort_key": 9, "cur_time": T},
    ])
    run_once()

    rows = {r.url: r.fetch_ts
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # batch 1, host h1: sort_key order b(1) then a(2)
    assert rows["https://h1/b"] == T
    assert rows["https://h1/a"] == T + 1000
    assert rows["https://h2/x"] == T
    # batch 2 resumes h1's clock AFTER the carried state (T + 2000),
    # not back at cur_time — the state survived the restart
    assert rows["https://h1/c"] == T + 2000
