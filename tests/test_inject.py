"""Injector merge-rule tests — the 5-rule table from
crawl/Injector.java:292-343 (SURVEY.md §5.2 #3) plus seed parsing."""

from __future__ import annotations

import pandas as pd

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.inject import inject, parse_seed_lines
from coherencebot_spark.schemas import FRONTIER, SEEDS
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def _seeds(spark, lines):
    return spark.createDataFrame(pd.DataFrame({"line": lines}), schema=SEEDS)


def _frontier(spark, rows):
    return spark.createDataFrame(rows, schema=FRONTIER)


OLD = dict(
    url="https://host0001.example.org/seed/1", host="host0001.example.org",
    status=Db.FETCHED, fetch_time=T - 1000, retries=1, fetch_interval=999,
    score=7.0, signature=b"\x01", modified_time=5, metadata={"k": "old"},
)


def test_parse_seed_lines(spark):
    lines = [
        "",
        "# comment",
        "https://host0001.example.org/seed/1",
        "HTTP://Host0002.Example.ORG:80/a/../b\tnutch.score=3.5\tnutch.fetchInterval=7200\tfoo=bar",
        "https://host0003.example.org/x\tnutch.fixedFetchInterval=1234",
        "not_a_url",
    ]
    out = parse_seed_lines(_seeds(spark, lines), DEFAULT, T).orderBy("url").collect()
    assert len(out) == 3
    by_url = {r.url: r for r in out}
    plain = by_url["https://host0001.example.org/seed/1"]
    assert plain.score == 1.0 and plain.fetch_interval == DEFAULT.interval_default_s
    norm = by_url["http://host0002.example.org/b"]
    assert norm.score == 3.5 and norm.fetch_interval == 7200
    assert norm.metadata == {"foo": "bar"}
    fixed = by_url["https://host0003.example.org/x"]
    assert fixed.fetch_interval == 1234
    assert fixed.metadata == {"fixedInterval": "1234"}


def test_rule1_only_new(spark):
    out = inject(_frontier(spark, []), _seeds(spark, [OLD["url"]]), T).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == Db.UNFETCHED and r.score == 1.0 and r.fetch_time == T


def test_rule2_only_old(spark):
    out = inject(_frontier(spark, [OLD]), _seeds(spark, ["https://other.example.org/p"]), T)
    rows = {r.url: r for r in out.collect()}
    assert rows[OLD["url"]].status == Db.FETCHED
    assert rows[OLD["url"]].score == 7.0


def test_rule3a_overwrite(spark):
    cfg = DEFAULT.with_(inject_overwrite=True)
    out = inject(_frontier(spark, [OLD]), _seeds(spark, [OLD["url"]]), T, cfg).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == Db.UNFETCHED and r.score == 1.0 and r.signature is None


def test_rule3bi_keep_old(spark):
    out = inject(_frontier(spark, [OLD]), _seeds(spark, [OLD["url"]]), T).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == Db.FETCHED and r.score == 7.0 and r.metadata == {"k": "old"}


def test_rule3bii_update(spark):
    cfg = DEFAULT.with_(inject_update=True)
    seed = f"{OLD['url']}\tnutch.score=2.5\tk=new\textra=1"
    out = inject(_frontier(spark, [OLD]), _seeds(spark, [seed]), T, cfg).collect()
    assert len(out) == 1
    r = out[0]
    # old row survives, but seed-set score wins; default interval keeps old
    assert r.status == Db.FETCHED
    assert r.score == 2.5
    assert r.fetch_interval == 999
    assert r.metadata == {"k": "new", "extra": "1"}  # injected meta overwrites


def test_update_defaults_keep_old_values(spark):
    cfg = DEFAULT.with_(inject_update=True)
    out = inject(_frontier(spark, [OLD]), _seeds(spark, [OLD["url"]]), T, cfg).collect()
    r = out[0]
    assert r.score == 7.0 and r.fetch_interval == 999


def test_purge_404(spark):
    gone = dict(OLD, status=Db.GONE)
    cfg = DEFAULT.with_(purge_404=True)
    out = inject(_frontier(spark, [gone]), _seeds(spark, ["https://other.example.org/p"]), T, cfg)
    urls = [r.url for r in out.collect()]
    assert OLD["url"] not in urls and len(urls) == 1


def test_malformed_numeric_seed_metadata_is_tolerated(spark):
    # seed files are external input: 'nutch.score=high' must degrade to
    # the default per record (try_cast), not abort the inject job under
    # Spark's default ANSI mode
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.inject import parse_seed_lines
    from coherencebot_spark.schemas import SEEDS

    lines = [
        ("https://a.example.org/\tnutch.score=high\tnutch.fetchInterval=1d",),
        ("https://b.example.org/\tnutch.score=2.5",),
    ]
    out = parse_seed_lines(
        spark.createDataFrame(lines, SEEDS), DEFAULT, 1_700_000_000_000
    ).collect()
    got = {r.url: r for r in out}
    a = got["https://a.example.org/"]
    assert a.score == DEFAULT.score_injected           # bad value → default
    assert a.fetch_interval == DEFAULT.interval_default_s
    assert got["https://b.example.org/"].score == 2.5


def test_duplicate_seed_lines_total_order(spark):
    # a FULL tie on score/size/interval must still pick a deterministic
    # winner (sorted-metadata tie-break), not a stream-order-dependent one
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.inject import parse_seed_lines
    from coherencebot_spark.schemas import SEEDS

    lines = [("https://a.example.org/\tsrc=b",),
             ("https://a.example.org/\tsrc=a",)]
    for perm in (lines, lines[::-1]):
        out = parse_seed_lines(
            spark.createDataFrame(perm, SEEDS), DEFAULT, 1_700_000_000_000
        ).collect()
        assert len(out) == 1
        assert out[0].metadata["src"] == "a"  # same winner either order
