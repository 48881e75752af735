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


def _hostdb(spark):
    rows = [
        dict(host="a.org", score=1.0, unfetched=5, fetched=10, not_modified=2,
             redir_perm=1, redir_temp=1, gone=0, duplicate=0,
             dns_failures=2, connection_failures=1,
             metadata={"homepage_url": "http://a.org/"}),
        dict(host="b.org", score=0.5, unfetched=50, fetched=0, not_modified=0,
             redir_perm=0, redir_temp=0, gone=3, duplicate=0,
             dns_failures=0, connection_failures=0, metadata=None),
        dict(host="c.org", score=2.0, unfetched=0, fetched=4, not_modified=0,
             redir_perm=0, redir_temp=2, gone=1, duplicate=1,
             dns_failures=1, connection_failures=0, metadata=None),
    ]
    return spark.createDataFrame(rows, HOSTDB)


def test_readhostdb_dump_variables_and_jexl(spark):
    # ReadHostDb -dump: derived JEXL variable set (ReadHostDbMapper.map
    # jcontext) + a JEXL expression translated to a pushed SQL predicate
    from coherencebot_spark.operators.readhostdb import dump, jexl_to_sql

    assert " ".join(
        jexl_to_sql("fetched > 2 && ok == 0 || !(gone != 1)").split()
    ) == "fetched > 2 AND ok = 0 OR NOT (gone <> 1)"
    out = {r.host: r for r in dump(_hostdb(spark)).collect()}
    a = out["a.org"]
    assert (a.redirs, a.ok, a.num_records, a.sum_failures) == (2, 12, 19, 3)
    # JEXL operators in the filter expression
    kept = {r.host for r in
            dump(_hostdb(spark), expr="fetched > 0 && dns_failures == 1").collect()}
    assert kept == {"c.org"}


def test_readhostdb_get_hostnames_homepages_stats(spark):
    from coherencebot_spark.operators.readhostdb import (
        get, homepages, hostnames, stats,
    )

    hdb = _hostdb(spark)
    g = get(hdb, "b.org").collect()
    assert len(g) == 1 and g[0].num_records == 53
    assert {r.host for r in hostnames(hdb, expr="gone > 0").collect()} \
        == {"b.org", "c.org"}
    # -dumpHomepages: only hosts with a recorded homepage url
    assert [r.homepage_url for r in homepages(hdb).collect()] \
        == ["http://a.org/"]
    s = stats(hdb).collect()[0]
    assert (s.hosts, s.fetched, s.num_records) == (3, 14, 79)
    assert abs(s.avg_score - round((1.0 + 0.5 + 2.0) / 3, 4)) < 1e-9


def test_protocol_status_statistics(spark):
    # util/ProtocolStatusStatistics: groupBy proto code with the UNFETCHED
    # branch for records that never carried one
    from coherencebot_spark.operators.readseg import protocol_status_statistics

    df = spark.createDataFrame(
        [(200,), (200,), (301,), (None,), (None,), (503,)],
        "proto_status int")
    out = {r.proto_status: r.cnt
           for r in protocol_status_statistics(df).collect()}
    assert out == {"200": 2, "301": 1, "UNFETCHED": 2, "503": 1}


def test_hostdb_dns_resolver_hook(spark):
    # hostdb/ResolverThread analogue: injectable per-distinct-host probe
    # whose failures accumulate into the persistent counters
    import pandas as pd

    from coherencebot_spark.operators.hostdb import update_hostdb

    rows = [frow("http://a.org/1", "a.org", Db.FETCHED),
            frow("http://dead.org/1", "dead.org", Db.UNFETCHED)]
    f = spark.createDataFrame(rows, FRONTIER)

    def resolver(hosts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "host": hosts,
            "dns_failed": [1 if h == "dead.org" else 0 for h in hosts],
            "cnx_failed": [0] * len(hosts),
        })

    h1 = update_hostdb(f, resolver=resolver)
    got = {r.host: r.dns_failures for r in h1.collect()}
    assert got == {"a.org": 0, "dead.org": 1}
    # failures ACCUMULATE across updates (UpdateHostDbReducer running totals)
    h2 = update_hostdb(f, hostdb=h1, resolver=resolver)
    got2 = {r.host: r.dns_failures for r in h2.collect()}
    assert got2 == {"a.org": 0, "dead.org": 2}


def test_hostdb_homepage_recorded(spark):
    # UpdateHostDbMapper homepage detection: a fetched root url lands in
    # metadata['homepage_url']; an unfetched root does not; the reader's
    # -dumpHomepages surfaces it
    from coherencebot_spark.operators.hostdb import update_hostdb
    from coherencebot_spark.operators.readhostdb import homepages

    rows = [
        frow("http://a.org/", "a.org", Db.FETCHED),
        frow("http://a.org/page", "a.org", Db.FETCHED),
        frow("http://b.org/", "b.org", Db.UNFETCHED),   # root not fetched
        frow("http://c.org/deep/only", "c.org", Db.FETCHED),  # no root row
    ]
    hdb = update_hostdb(spark.createDataFrame(rows, FRONTIER))
    md = {r.host: (r.metadata or {}) for r in hdb.collect()}
    assert md["a.org"].get("homepage_url") == "http://a.org/"
    assert "homepage_url" not in md["b.org"]
    assert "homepage_url" not in md["c.org"]
    assert [r.homepage_url for r in homepages(hdb).collect()] \
        == ["http://a.org/"]
    # merge keeps the recorded homepage when a later update has none
    rows2 = [frow("http://a.org/page2", "a.org", Db.FETCHED)]
    hdb2 = update_hostdb(spark.createDataFrame(rows2, FRONTIER), hostdb=hdb)
    md2 = {r.host: (r.metadata or {}) for r in hdb2.collect()}
    assert md2["a.org"].get("homepage_url") == "http://a.org/"


def test_readdb_dump_predicates_and_pushdown(spark, tmp_path):
    """`readdb -dump` parity (CrawlDbReader.java:861-923): the regex is a
    FULL match (Matcher.matches()), -sample is a deterministic url-hash
    threshold, and the raw-column predicates (status, retries) reach the
    parquet scan as PushedFilters."""
    from coherencebot_spark.operators.readdb import dump

    rows = [frow(f"http://h{i % 9}.example.org/p{i}", f"h{i % 9}.example.org",
                 Db.FETCHED if i % 2 == 0 else Db.UNFETCHED)
            for i in range(200)]
    for r, i in zip(rows, range(200)):
        r["retries"] = i % 4
    path = str(tmp_path / "frontier")
    spark.createDataFrame(rows, FRONTIER).write.parquet(path)
    f = spark.read.parquet(path)

    # full-match semantics: a pattern matching only a url PREFIX selects
    # nothing (Java matches() would reject it too)
    assert dump(f, regex=r"http://h1\.example\.org").count() == 0
    got = {r.url for r in dump(f, status=int(Db.FETCHED),
                               regex=r"http://h[12]\.example\.org/.*",
                               min_retry=2).collect()}
    expect = {r["url"] for r in rows
              if r["status"] == int(Db.FETCHED) and r["retries"] >= 2
              and r["url"].split("//")[1].split(".")[0] in ("h1", "h2")}
    assert got == expect and got

    # deterministic sample: same fraction → same rows, and roughly |f|·p
    s1 = {r.url for r in dump(f, sample=0.3).collect()}
    s2 = {r.url for r in dump(f, sample=0.3).collect()}
    assert s1 == s2
    assert 20 <= len(s1) <= 100

    # pushdown: status/retries land in the parquet scan's PushedFilters
    plan = dump(f, status=int(Db.FETCHED), min_retry=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    import re as _re
    pushed = _re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    assert "status" in pushed and "retries" in pushed, pushed


def test_resolve_urls_and_show_properties(spark):
    """tools/ResolveUrls.java distinct-host probe with an injected
    resolver; ShowProperties config dump."""
    import pandas as pd
    import pytest

    from coherencebot_spark.operators.tools import (resolve_urls,
                                                    show_properties)

    urls = spark.createDataFrame(
        [(f"https://h{i % 5}.example.org/p{i}",) for i in range(30)]
        + [("not a url",)], "url string")

    def fake(hosts: pd.Series) -> pd.Series:
        return hosts.str.startswith("h1") | hosts.str.startswith("h3")

    got = {r.host: r.resolved for r in resolve_urls(urls, fake).collect()}
    assert len(got) == 5                     # distinct hosts only
    assert got["h1.example.org"] and got["h3.example.org"]
    assert not got["h0.example.org"]
    s = resolve_urls(urls, fake, summary=True).collect()[0]
    assert (s.total, s.resolved, s.errored) == (5, 2, 3)
    with pytest.raises(ValueError, match="resolver"):
        resolve_urls(urls, None)

    props = dict(show_properties())
    assert props["scoring_filter"] == "opic"
    assert props["interval_default_s"] == str(30 * 86400)
    assert show_properties() == sorted(show_properties())
