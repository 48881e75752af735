"""T3 mime-adaptive schedule, orphan marking, bucketed frontier lookup."""

from __future__ import annotations

import pandas as pd
import pytest

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.orphan import LAST_INLINK_KEY, mark_orphans
from coherencebot_spark.operators.readdb import url_lookup
from coherencebot_spark.schemas import FETCH_LOG, FRONTIER, PARSE_OUT
from coherencebot_spark.status import Db, Fetch, Msg

T = 1_700_000_000_000
DAY = 86_400_000


def test_mime_adaptive_rates(spark):
    from tests.test_updatedb import db_row, fetch_row, run

    cfg = DEFAULT.with_(
        schedule="adaptive", adaptive_sync_delta=False,
        mime_rates=(("jpeg", 0.8, 0.5),),
    )
    parse_meta = [
        dict(url="http://t/a", host="t", status=int(Msg.PARSE_META), score=0.0,
             signature=None, from_url=None, anchor=None,
             metadata={"img.fmt": "jpeg"}),
    ]
    old = db_row("http://t/a", Db.FETCHED)
    old["signature"] = b"\x01"
    # notmodified w/ jpeg override → interval * (1 + 0.8)
    got = run(spark, [old],
              [fetch_row("http://t/a", Fetch.SUCCESS, signature=b"\x01")],
              parse_meta, cfg)
    assert got["http://t/a"].fetch_interval == int(
        DEFAULT.interval_default_s * 1.8)
    # no parse meta → global rate applies
    got = run(spark, [old],
              [fetch_row("http://t/a", Fetch.SUCCESS, signature=b"\x01")],
              None, cfg)
    assert got["http://t/a"].fetch_interval == int(
        DEFAULT.interval_default_s * (1 + cfg.adaptive_inc_rate))


def frow(url, status=Db.FETCHED, metadata=None):
    return dict(url=url, host="h", status=int(status), fetch_time=T,
                retries=0, fetch_interval=100, score=1.0, signature=None,
                modified_time=0, metadata=metadata)


def test_mark_orphans(spark):
    rows = [
        frow("http://h/fresh-inlink"),
        frow("http://h/old-no-inlink",
             metadata={LAST_INLINK_KEY: str(T - 45 * DAY)}),
        frow("http://h/mid-no-inlink",
             metadata={LAST_INLINK_KEY: str(T - 35 * DAY)}),
        frow("http://h/never-seen"),
    ]
    links = [dict(url="http://h/fresh-inlink", host="h", status=int(Msg.LINKED),
                  score=0.1, signature=None, from_url="http://s/", anchor=None,
                  metadata=None)]
    out = {r.url: r for r in mark_orphans(
        spark.createDataFrame(rows, FRONTIER),
        spark.createDataFrame(links, PARSE_OUT),
        T).collect()}
    assert out["http://h/fresh-inlink"].status == Db.FETCHED
    assert out["http://h/fresh-inlink"].metadata[LAST_INLINK_KEY] == str(T)
    assert out["http://h/old-no-inlink"].status == Db.ORPHAN   # >40d
    assert out["http://h/mid-no-inlink"].status == Db.GONE     # >30d
    assert out["http://h/never-seen"].status == Db.FETCHED     # stamped now
    assert out["http://h/never-seen"].metadata[LAST_INLINK_KEY] == str(T)


def test_bucketed_frontier_lookup(spark, tmp_path):
    from coherencebot_spark.plans.cycle import CrawlDriver
    from coherencebot_spark.schemas import SEEDS
    from coherencebot_spark.synth import world

    cfg = DEFAULT.with_(host_buckets=8)
    d = CrawlDriver(spark, str(tmp_path / "c"), cfg)
    seeds = spark.createDataFrame(world.gen_seed_lines(30, 10), SEEDS)
    d.inject(seeds, T)
    fr = d.frontier.read(spark)
    assert "bucket" in fr.columns
    assert fr.select("bucket").distinct().count() <= 8
    some_url = fr.select("url").first().url
    hit = url_lookup(fr, some_url, host_buckets=8)
    assert hit.count() == 1
    # pruned plan touches a single bucket partition
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan
