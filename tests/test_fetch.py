"""Fetcher politeness / robots / payload-invariant tests
(SURVEY.md §5.2 #4 and #8)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.fetch import fetch
from coherencebot_spark.schemas import FETCHLIST
from coherencebot_spark.status import Db, Fetch, Proto
from coherencebot_spark.synth import images, world
from coherencebot_spark.synth.phash import phash64

T = 1_700_000_000_000


def flrow(url, host, sort_key=0, score=1.0, metadata=None):
    return dict(url=url, host=host, status=Db.UNFETCHED, fetch_time=T - 10,
                retries=0, fetch_interval=2_592_000, score=score,
                signature=None, modified_time=0, metadata=metadata,
                segnum=1, partition_id=0, sort_key=sort_key)


def fldf(spark, rows):
    return spark.createDataFrame(rows, schema=FETCHLIST)


def all_success_backend(urls: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "proto_status": np.full(len(urls), Proto.SUCCESS, dtype=np.int32),
            "redirect_to": [None] * len(urls),
            "image_idx": np.arange(len(urls), dtype=np.int64),
        },
        index=urls.index,
    )


def open_robots(hosts: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "host": hosts,
            "robots_status": 200,
            "disallow": [[] for _ in range(len(hosts))],
            "crawl_delay_ms": [None] * len(hosts),
        }
    )


def test_per_host_spacing(spark):
    # 5 urls on one host, 2 on another; server delay 5s
    rows = [flrow(f"https://h1.example.org/p{i}", "h1.example.org", sort_key=i)
            for i in range(5)]
    rows += [flrow(f"https://h2.example.org/p{i}", "h2.example.org", sort_key=i)
             for i in range(2)]
    log, _ = fetch(fldf(spark, rows), T, DEFAULT, backend=all_success_backend,
                   robots_provider=open_robots)
    got = sorted(
        [(r.host, r.fetch_time) for r in log.collect() if r.host == "h1.example.org"],
        key=lambda x: x[1],
    )
    times = [t for _, t in got]
    # inter-fetch spacing on one host ≥ server delay
    diffs = np.diff(times)
    assert (diffs >= DEFAULT.server_delay_ms).all()


def test_threads_per_queue_slots(spark):
    # P2 with fetcher.threads.per.queue=2: the reference runs maxThreads
    # items of a queue concurrently with minCrawlDelay between starts
    # (FetchItemQueue.getFetchItem inProgress gate + setEndTime maxThreads>1
    # branch) — the virtual clock admits `threads` starts per delay window
    rows = [flrow(f"https://h1.example.org/p{i}", "h1.example.org", sort_key=i)
            for i in range(6)]
    cfg = DEFAULT.with_(threads_per_queue=2, min_crawl_delay_ms=2000)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=all_success_backend,
                   robots_provider=open_robots)
    times = sorted(r.fetch_time for r in log.collect())
    assert times == [T, T, T + 2000, T + 2000, T + 4000, T + 4000]
    # threads=1 keeps the serial clock (one start per crawl-delay window)
    log1, _ = fetch(fldf(spark, rows), T, DEFAULT.with_(server_delay_ms=2000),
                    backend=all_success_backend, robots_provider=open_robots)
    times1 = sorted(r.fetch_time for r in log1.collect())
    assert times1 == [T + 2000 * i for i in range(6)]


def test_robots_disallow_and_delay_cap(spark):
    def provider(hosts: pd.Series) -> pd.DataFrame:
        rows = []
        for h in hosts:
            if h == "deny.example.org":
                rows.append(dict(host=h, robots_status=200,
                                 disallow=["/private"], crawl_delay_ms=None))
            elif h == "slow.example.org":
                rows.append(dict(host=h, robots_status=200, disallow=[],
                                 crawl_delay_ms=45_000))
            else:
                rows.append(dict(host=h, robots_status=200, disallow=[],
                                 crawl_delay_ms=None))
        return pd.DataFrame(rows)

    rows = [
        flrow("https://deny.example.org/private/x", "deny.example.org"),
        flrow("https://deny.example.org/public/y", "deny.example.org", sort_key=1),
        flrow("https://slow.example.org/z", "slow.example.org"),
    ]
    log, _ = fetch(fldf(spark, rows), T, DEFAULT, backend=all_success_backend,
                   robots_provider=provider)
    st = {r.url: (r.status, r.proto_status) for r in log.collect()}
    assert st["https://deny.example.org/private/x"] == (Fetch.GONE, Proto.ROBOTS_DENIED)
    assert st["https://deny.example.org/public/y"][0] == Fetch.SUCCESS
    # crawl delay over fetcher.max.crawl.delay (30s) → gone
    assert st["https://slow.example.org/z"] == (Fetch.GONE, Proto.ROBOTS_DENIED)


def test_time_limit_drops_overflow(spark):
    cfg = DEFAULT.with_(time_limit_ms=12_000)  # room for 3 fetches at 5s
    rows = [flrow(f"https://h.example.org/p{i}", "h.example.org", sort_key=i)
            for i in range(10)]
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=all_success_backend,
                   robots_provider=open_robots)
    assert log.count() == 3  # t=0,5000,10000 fit; 15000 > 12000


def test_status_mapping_and_redirect(spark):
    def backend(urls: pd.Series) -> pd.DataFrame:
        states, red = [], []
        for u in urls:
            if "moved" in u:
                states.append(Proto.MOVED); red.append("https://t.example.org/new")
            elif "notfound" in u:
                states.append(Proto.NOTFOUND); red.append(None)
            elif "exc" in u:
                states.append(Proto.EXCEPTION); red.append(None)
            elif "notmod" in u:
                states.append(Proto.NOTMODIFIED); red.append(None)
            else:
                states.append(Proto.SUCCESS); red.append(None)
        return pd.DataFrame({"proto_status": states, "redirect_to": red,
                             "image_idx": [0] * len(urls)}, index=urls.index)

    rows = [flrow(f"https://h.example.org/{n}", "h.example.org", sort_key=i)
            for i, n in enumerate(["ok", "moved", "notfound", "exc", "notmod"])]
    log, content = fetch(fldf(spark, rows), T, DEFAULT, backend=backend,
                         robots_provider=open_robots)
    st = {r.url.rsplit("/", 1)[1]: r for r in log.collect()}
    assert st["ok"].status == Fetch.SUCCESS
    assert st["moved"].status == Fetch.REDIR_PERM
    assert st["moved"].redirect_to == "https://t.example.org/new"
    assert st["notfound"].status == Fetch.GONE
    assert st["exc"].status == Fetch.RETRY
    assert st["notmod"].status == Fetch.NOTMODIFIED
    # content only for success rows
    assert content.count() == 1


def test_circuit_breaker(spark):
    cfg = DEFAULT.with_(max_exceptions_per_queue=2)

    def backend(urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"proto_status": [Proto.EXCEPTION] * len(urls),
             "redirect_to": [None] * len(urls),
             "image_idx": [-1] * len(urls)},
            index=urls.index,
        )

    rows = [flrow(f"https://h.example.org/p{i}", "h.example.org", sort_key=i)
            for i in range(6)]
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=backend,
                   robots_provider=open_robots)
    assert log.count() == 2  # queue purged after 2 exceptions


def test_payload_per_row_invariant(spark):
    """BASELINE.json input_hint: decoded-pixel allclose (PSNR≥40dB lossy),
    caption equality, against the deterministic generator."""
    rows = [flrow(f"https://host0000.example.org/seed/{i}",
                  "host0000.example.org", sort_key=i) for i in range(9)]
    _, content = fetch(fldf(spark, rows), T, DEFAULT,
                       robots_provider=open_robots, n_images=100, n_hosts=10)
    got = content.collect()
    assert len(got) == 9  # /seed/ urls always succeed
    for r in got:
        i = int(r.image_id[3:])
        ref = world.payload_row(i)
        assert r.caption == ref["caption"]
        assert r.phash == ref["phash"]
        e = world.payload_effective_index(i)
        src = images.gen_pixels(e, r.w, r.h)
        dec = images.decode(bytes(r.bytes), r.fmt)
        if r.fmt in images.LOSSY:
            assert images.psnr(src, dec) >= 40.0
        else:
            assert (dec == src).all()


def test_queue_mode_by_domain(spark):
    # fetcher.queue.mode=byDomain: all hosts of one registered domain
    # share a single politeness queue (FetchItemQueues.getQueueID)
    rows = [flrow(f"https://a.shared.org/p{i}", "a.shared.org", sort_key=i)
            for i in range(2)]
    rows += [flrow(f"https://b.shared.org/p{i}", "b.shared.org", sort_key=i)
             for i in range(2)]
    cfg = DEFAULT.with_(queue_mode="byDomain", server_delay_ms=1000)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=all_success_backend,
                   robots_provider=open_robots)
    times = sorted(r.fetch_time for r in log.collect())
    assert times == [T, T + 1000, T + 2000, T + 3000]  # ONE serialized queue
    # byHost default: two parallel queues of two
    log2, _ = fetch(fldf(spark, rows), T, DEFAULT.with_(server_delay_ms=1000),
                    backend=all_success_backend, robots_provider=open_robots)
    times2 = sorted(r.fetch_time for r in log2.collect())
    assert times2 == [T, T, T + 1000, T + 1000]


def test_content_limit_truncates_and_parse_drops(spark):
    # http.content.limit: oversized payloads are cut off; the truncated
    # blob then fails parse's decode gate (ParseSegment truncation check)
    from coherencebot_spark.config import DEFAULT as D
    from coherencebot_spark.operators.parse import parse

    rows = [flrow(f"https://h1.example.org/p{i}", "h1.example.org", sort_key=i)
            for i in range(3)]
    cfg = D.with_(content_limit=4, server_delay_ms=0)
    log, content = fetch(fldf(spark, rows), T, cfg,
                         backend=all_success_backend,
                         robots_provider=open_robots, n_images=10)
    got = content.collect()
    assert got and all(len(bytes(r.bytes)) <= 4 for r in got)
    assert all(r.truncated for r in got)  # cut-off rows are flagged
    # parser.skip.truncated (reference default): flagged rows contribute
    # no signature/outlinks even WITHOUT payload validation
    assert parse(log, content, cfg).count() == 0
    # opt-out mirrors parser.skip.truncated=false
    assert parse(log, content, cfg, skip_truncated=False).count() > 0
    # and the per-row decode/validate gate also rejects them
    po = parse(log, content, cfg, skip_truncated=False,
               validate_fn=world.validate_payload_rows)
    assert po.count() == 0
    # sanity: without the limit the same rows parse fine
    log2, content2 = fetch(fldf(spark, rows), T, D.with_(server_delay_ms=0),
                           backend=all_success_backend,
                           robots_provider=open_robots, n_images=10)
    assert parse(log2, content2, cfg,
                 validate_fn=world.validate_payload_rows).count() > 0


def test_redirect_follow_mode(spark):
    # http.redirect.max > 0: targets fetched in-cycle, paced on their own
    # hosts; redirect_max=0 leaves them as linked-only (default)
    from coherencebot_spark.operators.fetch import fetch_with_redirects

    target = "https://h2.example.org/land"

    def backend(urls: pd.Series) -> pd.DataFrame:
        red = urls.str.contains("/redir").to_numpy()
        return pd.DataFrame({
            "proto_status": np.where(red, Proto.MOVED, Proto.SUCCESS
                                     ).astype(np.int32),
            "redirect_to": [target if r else None for r in red],
            "image_idx": np.where(red, -1, np.arange(len(urls))),
        }, index=urls.index)

    rows = [flrow("https://h1.example.org/redir/0", "h1.example.org")]
    cfg = DEFAULT.with_(redirect_max=2)
    log, content = fetch_with_redirects(
        fldf(spark, rows), T, cfg, backend=backend,
        robots_provider=open_robots)
    by_url = {r.url: r.status for r in log.collect()}
    assert by_url["https://h1.example.org/redir/0"] == Fetch.REDIR_PERM
    assert by_url[target] == Fetch.SUCCESS
    assert {r.url for r in content.collect()} == {target}

    # default redirect_max=0: single pass, no target fetch
    log0, content0 = fetch_with_redirects(
        fldf(spark, rows), T, DEFAULT, backend=backend,
        robots_provider=open_robots)
    assert {r.url for r in log0.collect()} \
        == {"https://h1.example.org/redir/0"}
    assert content0.count() == 0


def test_backend_not_invoked_for_denied_or_overbudget(spark, tmp_path):
    """A robots-disallowed url and a time-limit-overflow url must never
    reach the protocol backend (with a real backend those would be actual
    network requests the policy forbids / double fetches next cycle)."""
    import os as _os

    seen_dir = str(tmp_path / "seen")
    _os.makedirs(seen_dir, exist_ok=True)

    def recording_backend(urls: pd.Series) -> pd.DataFrame:
        import hashlib
        for u in urls:
            open(_os.path.join(
                seen_dir, hashlib.md5(u.encode()).hexdigest()), "w").close()
        return all_success_backend(urls)

    def provider(hosts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "host": hosts, "robots_status": 200,
            "disallow": [["/private"] for _ in hosts],
            "crawl_delay_ms": [None] * len(hosts),
        })

    rows = [flrow("https://h.example.org/private/x", "h.example.org")]
    rows += [flrow(f"https://h.example.org/p{i}", "h.example.org", sort_key=i)
             for i in range(6)]
    cfg = DEFAULT.with_(server_delay_ms=5000, time_limit_ms=12_000)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=recording_backend,
                   robots_provider=provider)
    out = {r.url: r for r in log.collect()}
    assert out["https://h.example.org/private/x"].status == Fetch.GONE
    assert len(out) == 4  # denied + 3 within budget
    import hashlib
    contacted = set(_os.listdir(seen_dir))
    # exactly the 3 within-budget allowed urls touched the backend
    assert len(contacted) == 3
    assert hashlib.md5(
        b"https://h.example.org/private/x").hexdigest() not in contacted


def test_circuit_breaker_max_zero_and_robots_exempt(spark):
    # max_exceptions_per_queue=0: the first exception still happens, the
    # REST of the queue is purged (reference checkExceptionThreshold) —
    # not "fetch nothing"
    def exc_backend(urls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {"proto_status": [Proto.EXCEPTION] * len(urls),
             "redirect_to": [None] * len(urls),
             "image_idx": [-1] * len(urls)},
            index=urls.index)

    rows = [flrow(f"https://h.example.org/p{i}", "h.example.org", sort_key=i)
            for i in range(5)]
    cfg = DEFAULT.with_(max_exceptions_per_queue=0)
    log, _ = fetch(fldf(spark, rows), T, cfg, backend=exc_backend,
                   robots_provider=open_robots)
    assert log.count() == 1
    # robots-denied rows don't consume the exception budget
    def provider(hosts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame({
            "host": hosts, "robots_status": 200,
            "disallow": [["/private"] for _ in hosts],
            "crawl_delay_ms": [None] * len(hosts)})
    rows2 = [flrow(f"https://h.example.org/private/{i}", "h.example.org",
                   sort_key=i) for i in range(3)]
    rows2 += [flrow(f"https://h.example.org/ok{i}", "h.example.org",
                    sort_key=10 + i) for i in range(2)]
    cfg2 = DEFAULT.with_(max_exceptions_per_queue=1)
    log2, _ = fetch(fldf(spark, rows2), T, cfg2, backend=all_success_backend,
                    robots_provider=provider)
    st = {r.url: r.status for r in log2.collect()}
    # all 3 denied rows present as GONE, both allowed rows fetched
    assert sum(1 for v in st.values() if v == Fetch.GONE) == 3
    assert sum(1 for v in st.values() if v == Fetch.SUCCESS) == 2
