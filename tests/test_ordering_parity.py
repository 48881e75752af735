"""Crawl-ordering parity (SURVEY.md §4 invariant 2): partition assignment,
fetchlist order, and fetch processing order reproduce the reference's
arithmetic bit-for-bit under a fixed seed."""

from __future__ import annotations

import pandas as pd

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.functions.hashing import (
    host_partition, java_string_hashcode, nutch_tail_hash,
)
from coherencebot_spark.operators.fetch import fetch
from coherencebot_spark.operators.generate import generate
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.status import Db
from coherencebot_spark.synth import world
from tests.test_fetch import all_success_backend, open_robots

T = 1_700_000_000_000


def test_partition_assignment_matches_java_formula(spark):
    rows = []
    for h in range(20):
        host = world.host_name(h)
        rows.append(dict(url=world.page_url(h, 1), host=host,
                         status=Db.UNFETCHED, fetch_time=T - 10, retries=0,
                         fetch_interval=2_592_000, score=1.0, signature=None,
                         modified_time=0, metadata=None))
    cfg = DEFAULT.with_(topn=1000, num_partitions=3, filter_on_generate=False)
    out = generate(spark.createDataFrame(rows, FRONTIER), T, cfg).collect()
    for r in out:
        expect = int(host_partition(pd.Series([r.host]), cfg.seed, 3)[0])
        assert r.partition_id == expect
        # reference formula: (javaHashCode(host) ^ seed) & MAX_INT % P
        jh = int(java_string_hashcode(pd.Series([r.host]))[0])
        assert expect == ((jh ^ cfg.seed) & 0x7FFFFFFF) % 3


def test_fetch_processing_order_follows_hash_sort(spark):
    """Within a host, items are fetched in HashComparator order (sort_key
    asc) — the reference's anti-correlation politeness ordering (W4)."""
    rows = [dict(url=f"https://h.example.org/p{i}", host="h.example.org",
                 status=Db.UNFETCHED, fetch_time=T - 10, retries=0,
                 fetch_interval=2_592_000, score=float(10 - i), signature=None,
                 modified_time=0, metadata=None) for i in range(8)]
    cfg = DEFAULT.with_(topn=100, num_partitions=1, filter_on_generate=False,
                        server_delay_ms=1000)
    fl = generate(spark.createDataFrame(rows, FRONTIER), T, cfg)
    log, _ = fetch(fl, T, cfg, backend=all_success_backend,
                   robots_provider=open_robots)
    got = sorted(log.collect(), key=lambda r: r.fetch_time)
    hashes = [int(nutch_tail_hash(pd.Series([r.url]))[0]) for r in got]
    # fetch timestamps strictly follow ascending tail-hash order
    assert hashes == sorted(hashes)
    # and pacing holds: consecutive same-host fetches 1s apart
    times = [r.fetch_time for r in got]
    assert all(b - a == 1000 for a, b in zip(times, times[1:]))
