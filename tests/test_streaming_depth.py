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


def test_stream_fetch_window_metrics_watermark(spark, tmp_path):
    """Windowed fetch metrics with late data: windows finalize only after
    the watermark passes; a row arriving (in a later run, shared
    checkpoint) behind the watermark is DROPPED from its closed window."""
    from pyspark.sql import functions as F

    from coherencebot_spark.schemas import FETCH_LOG
    from coherencebot_spark.status import Fetch
    from coherencebot_spark.streaming.continuous import (
        stream_fetch_window_metrics,
    )

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    MIN = 60_000
    TB = (T // (10 * MIN)) * (10 * MIN)  # aligned to the 10-min grid

    def log_rows(rows, name):
        df = spark.createDataFrame(
            [(u, "h1.org", int(st), TB + int(m * MIN), 0, 0, 1.0,
              None, 0, None, 200, None) for u, st, m in rows],
            FETCH_LOG,
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(src / name))
        # move part file up — the file source watches a flat dir
        import glob
        import shutil
        part = glob.glob(str(src / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))
        shutil.rmtree(str(src / name))

    def run():
        q = stream_fetch_window_metrics(spark, str(src), out, ckpt)
        q.awaitTermination(180)

    # run 1: 3 successes + 1 gone inside window [TB, TB+10min)
    log_rows([("u1", Fetch.SUCCESS, 1), ("u2", Fetch.SUCCESS, 3),
              ("u3", Fetch.GONE, 7), ("u4", Fetch.SUCCESS, 9)], "b1")
    run()
    # watermark = 9min - 5min = 4min < 10min: window still open, no output
    assert spark.read.parquet(out).count() == 0

    # run 2: +25min row — processed under the OLD watermark (4min); the
    # new one (20min) takes effect from the next batch (Spark's contract)
    log_rows([("u5", Fetch.SUCCESS, 25)], "b2")
    run()
    # run 3: watermark is now 20min — the first window closes and emits;
    # a LATE row at +2min (far behind the watermark) must be dropped
    log_rows([("late", Fetch.SUCCESS, 2), ("u6", Fetch.SUCCESS, 26)], "b3")
    run()
    rows = {(r.win_start - TB) // MIN: r.cnt
            for r in spark.read.parquet(out)
            .filter(F.col("status") == int(Fetch.SUCCESS)).collect()}
    # first window finalized with 3 successes — WITHOUT the late row
    assert rows[0] == 3, rows
    gone = {((r.win_start - TB) // MIN, r.cnt)
            for r in spark.read.parquet(out)
            .filter(F.col("status") == int(Fetch.GONE)).collect()}
    assert gone == {(0, 1)}


def test_stream_dedup_urls_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark URL-seen: a url re-delivered in a
    later micro-batch (same run or a restart sharing the checkpoint) is
    dropped; distinct urls all pass."""
    import json

    from coherencebot_spark.streaming.continuous import stream_dedup_urls

    src = tmp_path / "intake"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "url string, ts timestamp"

    def drop(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        deduped = stream_dedup_urls(stream, watermark="1 hour")
        q = (deduped.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    t0 = "2023-11-14T00:00:00"
    drop("b1.json", [{"url": "https://h1/a", "ts": t0},
                     {"url": "https://h1/a", "ts": t0},     # in-batch dup
                     {"url": "https://h1/b", "ts": t0}])
    run_once()
    # restart with the shared checkpoint: the re-delivered url is still
    # recognized (state survived), the new url passes
    drop("b2.json", [{"url": "https://h1/a", "ts": "2023-11-14T00:10:00"},
                     {"url": "https://h1/c", "ts": "2023-11-14T00:10:00"}])
    run_once()
    got = sorted(r.url for r in spark.read.parquet(out).collect())
    assert got == ["https://h1/a", "https://h1/b", "https://h1/c"]


def test_stream_corpus_intake_incremental_dedup(spark, tmp_path):
    """Continuous corpus growth: cross-batch dups dropped via the bloom +
    signature store, intra-batch dups collapse, replays are idempotent."""
    import json
    import os

    from coherencebot_spark.streaming.continuous import stream_corpus_intake

    intake = tmp_path / "intake"
    intake.mkdir()
    corpus = str(tmp_path / "corpus")

    def drop(name, rows):
        (intake / name).write_text(
            "\n".join(json.dumps(r) for r in rows))

    drop("w1.json", [
        {"doc_id": 1, "text": "first unique document"},
        {"doc_id": 2, "text": "second unique document"},
        {"doc_id": 3, "text": "second unique document"},   # intra-batch dup
    ])
    q = stream_corpus_intake(spark, str(intake), corpus,
                             str(tmp_path / "ckpt"), n_buckets=8)
    q.awaitTermination(120)
    got = {r.doc_id for r in
           spark.read.parquet(os.path.join(corpus, "docs")).collect()}
    assert got == {1, 2}

    drop("w2.json", [
        {"doc_id": 10, "text": "first unique document"},   # cross-batch dup
        {"doc_id": 11, "text": "third unique document"},
    ])
    q = stream_corpus_intake(spark, str(intake), corpus,
                             str(tmp_path / "ckpt"), n_buckets=8)
    q.awaitTermination(120)
    got = {r.doc_id for r in
           spark.read.parquet(os.path.join(corpus, "docs")).collect()}
    assert got == {1, 2, 11}

    # replay with a FRESH checkpoint (simulates redelivery of the same
    # files): the applied/ markers make the fold idempotent only for the
    # same batch ids, so assert the real guard — signature store dedup
    # still rejects every already-accepted text
    q = stream_corpus_intake(spark, str(intake), corpus,
                             str(tmp_path / "ckpt2"), n_buckets=8)
    q.awaitTermination(120)
    rows = spark.read.parquet(os.path.join(corpus, "docs")).collect()
    assert {r.doc_id for r in rows} == {1, 2, 11}
    assert len(rows) == 3                      # no duplicate appends
