"""A6/A7 reader stats + W3 hostdb-variable maxCount (Jexl→SQL) tests."""

from __future__ import annotations

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.generate import generate
from coherencebot_spark.operators.readdb import (
    crawl_completion_stats, domain_statistics, status_names,
)
from coherencebot_spark.schemas import FRONTIER, HOSTDB
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def frow(url, host, status=Db.UNFETCHED, score=1.0):
    return dict(url=url, host=host, status=int(status), fetch_time=T - 10,
                retries=0, fetch_interval=2_592_000, score=float(score),
                signature=None, modified_time=0, metadata=None)


def test_crawl_completion_and_domain_stats(spark):
    rows = [
        frow("http://a.example.org/1", "a.example.org", Db.FETCHED),
        frow("http://a.example.org/2", "a.example.org", Db.UNFETCHED),
        frow("http://b.example.org/1", "b.example.org", Db.NOTMODIFIED),
    ]
    f = spark.createDataFrame(rows, FRONTIER)
    cc = {r.host: (r.fetched, r.unfetched)
          for r in crawl_completion_stats(f).collect()}
    assert cc["a.example.org"] == (1, 1)
    assert cc["b.example.org"] == (1, 0)
    ds = {r.domain: r["count"] for r in domain_statistics(f, "domain").collect()}
    assert ds == {"example.org": 3}
    suf = {r.suffix: r["count"] for r in domain_statistics(f, "suffix").collect()}
    assert suf == {"org": 3}
    named = status_names(f).select("status", "status_name").distinct().collect()
    assert {(r.status, r.status_name) for r in named} >= {
        (Db.FETCHED, "db_fetched"), (Db.UNFETCHED, "db_unfetched")}


def test_generate_hostdb_variable_maxcount_and_delay(spark):
    # W3: per-host maxCount + fetch delay via SQL expr over hostdb columns
    # (the Jexl analogue; ref Generator.java:437-459)
    rows = [frow(f"http://big.example.org/{i}", "big.example.org", score=10 - i)
            for i in range(6)]
    rows += [frow(f"http://small.example.org/{i}", "small.example.org",
                  score=10 - i) for i in range(6)]
    f = spark.createDataFrame(rows, FRONTIER)
    hostdb = spark.createDataFrame(
        [dict(host="big.example.org", score=1.0, unfetched=100, fetched=900,
              not_modified=0, redir_perm=0, redir_temp=0, gone=0, duplicate=0,
              dns_failures=0, connection_failures=0, metadata=None),
         dict(host="small.example.org", score=1.0, unfetched=90, fetched=10,
              not_modified=0, redir_perm=0, redir_temp=0, gone=0, duplicate=0,
              dns_failures=0, connection_failures=0, metadata=None)],
        HOSTDB)
    cfg = DEFAULT.with_(topn=100, num_partitions=1, filter_on_generate=False,
                        max_count=2)
    out = generate(
        f, T, cfg, hostdb=hostdb,
        # well-behaved hosts (many fetched) get a bigger per-host budget
        max_count_expr="case when hd_fetched > 100 then 5 else 2 end",
        fetch_delay_expr="case when hd_fetched > 100 then 1000 else 0 end",
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["big.example.org"]) == 5
    assert len(by_host["small.example.org"]) == 2
    assert all(r.metadata.get("_variableFetchDelay_") == "1000"
               for r in by_host["big.example.org"])
    assert all((r.metadata or {}).get("_variableFetchDelay_") is None
               for r in by_host["small.example.org"])
