"""Generator golden-trace tests (SURVEY.md §5.2 #2), mirroring the
scenarios of crawl/TestGenerator.java:78-289 plus the quota-per-partition
and multi-segment overflow semantics of SelectorReducer."""

from __future__ import annotations

import pandas as pd

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.functions.hashing import host_partition, nutch_tail_hash
from coherencebot_spark.operators.generate import generate
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def row(url, score, host=None, status=Db.UNFETCHED, fetch_time=T - 1000,
        interval=2_592_000, metadata=None):
    if host is None:
        host = url.split("/")[2]
    return dict(url=url, host=host, status=status, fetch_time=fetch_time,
                retries=0, fetch_interval=interval, score=float(score),
                signature=None, modified_time=0, metadata=metadata)


def fdf(spark, rows):
    return spark.createDataFrame(rows, schema=FRONTIER)


def test_generate_highest(spark):
    # TestGenerator.testGenerateHighest: 101 urls scored 0..100, topN=2
    rows = [row(f"http://aaa/{i:03d}", i) for i in range(101)]
    cfg = DEFAULT.with_(topn=2, num_partitions=1, filter_on_generate=False)
    out = generate(fdf(spark, rows), T, cfg).orderBy("score", ascending=False).collect()
    assert [r.url for r in out] == ["http://aaa/100", "http://aaa/099"]


def test_generate_host_limit(spark):
    # TestGenerator.testGenerateHostLimit: maxCount per host
    rows = [row(f"http://aaa/{i:03d}", 100 - i) for i in range(10)]
    rows += [row(f"http://bbb/{i:03d}", 50 - i) for i in range(10)]
    cfg = DEFAULT.with_(topn=100, num_partitions=1, max_count=3,
                        filter_on_generate=False)
    out = generate(fdf(spark, rows), T, cfg).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r.url)
    assert len(by_host["aaa"]) == 3 and len(by_host["bbb"]) == 3
    assert sorted(by_host["aaa"]) == ["http://aaa/000", "http://aaa/001", "http://aaa/002"]


def test_generate_domain_limit(spark):
    rows = [row(f"http://a.dom1.com/{i}", 10 - i, host="a.dom1.com") for i in range(5)]
    rows += [row(f"http://b.dom1.com/{i}", 20 - i, host="b.dom1.com") for i in range(5)]
    rows += [row(f"http://c.dom2.com/{i}", 5 - i, host="c.dom2.com") for i in range(5)]
    cfg = DEFAULT.with_(topn=100, num_partitions=1, max_count=4,
                        count_mode="byDomain", filter_on_generate=False)
    out = generate(fdf(spark, rows), T, cfg).collect()
    doms = {}
    for r in out:
        d = r.host.split(".", 1)[1]
        doms.setdefault(d, []).append((r.score, r.url))
    assert len(doms["dom1.com"]) == 4  # capped across both hosts of dom1
    assert len(doms["dom2.com"]) == 4
    # dom1's four highest scores are b.dom1.com 20,19,18,17
    assert sorted(s for s, _ in doms["dom1.com"]) == [17.0, 18.0, 19.0, 20.0]


def test_due_filter_and_far_future_clamp(spark):
    future = row("http://aaa/future", 99, fetch_time=T + 10_000)
    clamp_interval = 400 * 86400  # > 90d max
    far = row("http://aaa/far", 98, fetch_time=T + 100 * 86400_000,
              interval=clamp_interval)
    due = row("http://aaa/due", 1)
    cfg = DEFAULT.with_(topn=10, num_partitions=1, filter_on_generate=False)
    out = {r.url: r for r in generate(fdf(spark, [future, far, due]), T, cfg).collect()}
    assert "http://aaa/future" not in out          # not yet due
    assert "http://aaa/far" in out                 # far-future clamped to now
    assert out["http://aaa/far"].fetch_time == T
    assert out["http://aaa/far"].fetch_interval == int(DEFAULT.interval_max_s * 0.9)
    assert "http://aaa/due" in out


def test_ngt_pending_exclusion(spark):
    pending = row("http://aaa/pending", 9, metadata={"_ngt_": str(T - 1000)})
    stale = row("http://aaa/stale", 8,
                metadata={"_ngt_": str(T - DEFAULT.gen_delay_ms - 1)})
    cfg = DEFAULT.with_(topn=10, num_partitions=1, filter_on_generate=False)
    urls = [r.url for r in generate(fdf(spark, [pending, stale]), T, cfg).collect()]
    assert urls == ["http://aaa/stale"]
    # selected rows get a fresh _ngt_ stamp
    out = generate(fdf(spark, [stale]), T, cfg).collect()[0]
    assert out.metadata["_ngt_"] == str(T)


def test_quota_is_per_partition_not_global(spark):
    # reference semantics: limit = topN / numReduceTasks per partition
    # (Generator.java:381-382) — NOT an exact global top-N.
    hosts = [f"h{i}.example.org" for i in range(8)]
    parts = {h: int(host_partition(pd.Series([h]), DEFAULT.seed, 2)[0]) for h in hosts}
    p0 = [h for h in hosts if parts[h] == 0]
    p1 = [h for h in hosts if parts[h] == 1]
    assert p0 and p1
    # 6 urls on a partition-0 host with high scores, 6 on partition-1 low
    rows = [row(f"http://{p0[0]}/{i}", 100 - i, host=p0[0]) for i in range(6)]
    rows += [row(f"http://{p1[0]}/{i}", 10 - i, host=p1[0]) for i in range(6)]
    cfg = DEFAULT.with_(topn=8, num_partitions=2, filter_on_generate=False)
    out = generate(fdf(spark, rows), T, cfg).collect()
    per_part = {}
    for r in out:
        per_part.setdefault(r.partition_id, []).append(r.score)
    # each partition contributes exactly limit=4, even though globally the
    # 8 best scores all sit in partition 0
    assert {len(v) for v in per_part.values()} == {4}


def test_multi_segment_overflow(spark):
    # one host, 8 urls, maxCount=2, 3 segments → 6 kept in segs 1,1,2,2,3,3
    rows = [row(f"http://aaa/{i}", 10 - i) for i in range(8)]
    cfg = DEFAULT.with_(topn=1000, num_partitions=1, max_count=2,
                        max_num_segments=3, filter_on_generate=False)
    out = sorted(generate(fdf(spark, rows), T, cfg).collect(),
                 key=lambda r: -r.score)
    assert len(out) == 6
    assert [r.segnum for r in out] == [1, 1, 2, 2, 3, 3]


def test_sort_key_matches_reference_hash(spark):
    rows = [row(f"http://aaa/{i}", i + 1) for i in range(5)]
    cfg = DEFAULT.with_(topn=10, num_partitions=1, filter_on_generate=False)
    out = generate(fdf(spark, rows), T, cfg).collect()
    expect = {
        u: int(h)
        for u, h in zip(
            [r.url for r in out],
            nutch_tail_hash(pd.Series([r.url for r in out])),
        )
    }
    for r in out:
        assert r.sort_key == expect[r.url]


def test_restrict_status_and_min_score(spark):
    rows = [
        row("http://aaa/unf", 5.0, status=Db.UNFETCHED),
        row("http://aaa/fet", 9.0, status=Db.FETCHED),
        row("http://aaa/low", 0.1, status=Db.UNFETCHED),
    ]
    cfg = DEFAULT.with_(topn=10, num_partitions=1, filter_on_generate=False,
                        restrict_status=Db.UNFETCHED, min_score=1.0)
    urls = [r.url for r in generate(fdf(spark, rows), T, cfg).collect()]
    assert urls == ["http://aaa/unf"]


def test_broadcast_select_equivalence(spark):
    """broadcast_select (narrow-column windows + broadcast join-back) is
    row-for-row identical to the wide-window plan across gates (incl. the
    far-future clamp mutation), per-host caps, and multi-segment overflow."""
    rows = [row(f"https://h{i % 7}.example.org/p{i}", score=float(i % 13))
            for i in range(200)]
    # far-future rows: clamp mutates fetch_interval + fetch_time
    rows += [row(f"https://h1.example.org/far{i}", score=5.0,
                 fetch_time=T + 10**10, interval=100 * 86400)
             for i in range(5)]
    f = fdf(spark, rows)

    for cfg in (
        DEFAULT.with_(topn=60, num_partitions=4, max_count=3),
        DEFAULT.with_(topn=60, num_partitions=4, max_count=3,
                      max_num_segments=2),
        DEFAULT.with_(topn=40, num_partitions=2),
    ):
        def snap(**kw):
            return sorted(
                (r.url, r.segnum, r.partition_id, r.fetch_time,
                 r.fetch_interval, r.sort_key, float(r.score))
                for r in generate(f, T, cfg, **kw).collect()
            )

        assert snap() == snap(broadcast_select=True), cfg


def test_generate_normalise_flag(spark):
    # generate.normalise (GeneratorMapper): normalize BEFORE filtering —
    # only matters when normalizer rules changed after rows were written
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.generate import generate
    from coherencebot_spark.schemas import FRONTIER

    T = 1_700_000_000_000
    rows = [dict(url="HTTP://Mixed.Example.org:80/a/../p", host="mixed.example.org",
                 status=1, fetch_time=T - 10, retries=0,
                 fetch_interval=2_592_000, score=1.0, signature=None,
                 modified_time=0, metadata=None)]
    f = spark.createDataFrame(rows, FRONTIER)
    cfg = DEFAULT.with_(topn=10, num_partitions=1, filter_on_generate=False)
    out0 = generate(f, T, cfg).collect()
    assert out0[0].url == "HTTP://Mixed.Example.org:80/a/../p"  # untouched
    out1 = generate(f, T, cfg, normalize=True).collect()
    assert out1[0].url == "http://mixed.example.org/p"
    assert out1[0].host == "mixed.example.org"
    # cfg-driven path (what the crawl driver/CLI reaches): cfg flag alone
    out2 = generate(f, T, cfg.with_(normalise_on_generate=True)).collect()
    assert out2[0].url == "http://mixed.example.org/p"
    # explicit call-site False overrides the cfg flag
    out3 = generate(f, T, cfg.with_(normalise_on_generate=True),
                    normalize=False).collect()
    assert out3[0].url == "HTTP://Mixed.Example.org:80/a/../p"
