"""UpdateDb state-machine tests.

Port of the reference's exhaustive state-transition matrix
(crawl/TestCrawlDbStates.java:69-160) plus schedule arithmetic
(T1-T7) and OPIC score accumulation (SC4) — SURVEY.md §5.2 #1/#6.
"""

from __future__ import annotations

import pandas as pd
import pytest

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.updatedb import updatedb
from coherencebot_spark.schemas import FETCH_LOG, FRONTIER, PARSE_OUT
from coherencebot_spark.status import Db, Fetch, Msg

T = 1_700_000_000_000
FETCH_T = T + 3600_000  # fetch happened an hour into the cycle
DAY_MS = 86_400_000

# (fetch_status, db_status) counterparts — TestCrawlDbStates.java:69-79
PAIRS = [
    (None, Db.UNFETCHED),
    (Fetch.SUCCESS, Db.FETCHED),
    (Fetch.GONE, Db.GONE),
    (Fetch.REDIR_TEMP, Db.REDIR_TEMP),
    (Fetch.REDIR_PERM, Db.REDIR_PERM),
    (Fetch.NOTMODIFIED, Db.NOTMODIFIED),
    (Fetch.RETRY, None),
    (None, Db.DUPLICATE),
    (None, Db.ORPHAN),
]


def db_row(url, status, retries=0):
    return dict(url=url, host="test", status=int(status), fetch_time=T,
                retries=retries, fetch_interval=DEFAULT.interval_default_s,
                score=1.0, signature=None, modified_time=0, metadata=None)


def fetch_row(url, status, retries=0, signature=None, fetch_time=FETCH_T,
              interval=DEFAULT.interval_default_s, modified_time=0, metadata=None):
    return dict(url=url, host="test", status=int(status), fetch_time=fetch_time,
                retries=retries, fetch_interval=interval, score=1.0,
                signature=signature, modified_time=modified_time,
                metadata=metadata, proto_status=1, redirect_to=None)


def link_row(url, score=0.1, from_url="http://src/"):
    return dict(url=url, host="test", status=int(Msg.LINKED), score=score,
                signature=None, from_url=from_url, anchor="a", metadata=None)


def run(spark, frontier_rows, fetch_rows, parse_rows=None, cfg=DEFAULT, **kw):
    f = spark.createDataFrame(frontier_rows, schema=FRONTIER)
    fl = spark.createDataFrame(fetch_rows, schema=FETCH_LOG)
    po = (spark.createDataFrame(parse_rows, schema=PARSE_OUT)
          if parse_rows is not None else None)
    return {r.url: r for r in updatedb(f, fl, po, T, cfg, **kw).collect()}


@pytest.mark.parametrize("sched", ["default", "adaptive"])
def test_state_transition_matrix(spark, sched):
    cfg = DEFAULT.with_(schedule=sched)
    frontier, fetches, links, expected = [], [], [], {}
    for i, (_, from_db) in enumerate(PAIRS):
        for j, (fetch_status, to_db) in enumerate(PAIRS):
            for n_links in range(3):
                url = f"http://test/{i}/{j}/{n_links}"
                if from_db is None and fetch_status is None and n_links == 0:
                    continue  # empty cell: no inputs at all
                if from_db is not None:
                    frontier.append(db_row(url, from_db))
                if fetch_status is not None:
                    fetches.append(fetch_row(url, fetch_status))
                for l in range(n_links):
                    links.append(link_row(url, from_url=f"http://src/{l}"))
                # expected status — TestCrawlDbStates.java:133-155
                if fetch_status is None:
                    exp = Db.UNFETCHED if from_db is None else from_db
                    if n_links == 0 and from_db is None:
                        continue
                elif fetch_status == Fetch.RETRY:
                    exp = Db.UNFETCHED  # retries 0+1 < retryMax 3
                else:
                    exp = to_db
                expected[url] = exp
    got = run(spark, frontier, fetches, links, cfg)
    mismatches = {
        u: (got[u].status if u in got else "MISSING", exp)
        for u, exp in expected.items()
        if u not in got or got[u].status != exp
    }
    assert not mismatches, f"{sched}: {len(mismatches)} wrong: {dict(list(mismatches.items())[:10])}"


def test_default_schedule_arithmetic(spark):
    url = "http://t/s"
    got = run(spark, [db_row(url, Db.UNFETCHED)],
              [fetch_row(url, Fetch.SUCCESS, signature=b"\x09")])
    r = got[url]
    assert r.status == Db.FETCHED
    assert r.fetch_time == FETCH_T + DEFAULT.interval_default_s * 1000
    assert r.retries == 0
    assert r.signature == b"\x09"
    assert r.modified_time == FETCH_T  # first fetch: modified := fetch time


def test_retry_accumulates_then_gone(spark):
    url = "http://t/r"
    # retries already at 2 in the *fetch datum* → 3rd retry hits the max
    got = run(spark, [db_row(url, Db.UNFETCHED, retries=2)],
              [fetch_row(url, Fetch.RETRY, retries=2)])
    r = got[url]
    assert r.status == Db.GONE
    assert r.retries == 3
    # gone schedule: interval *= 1.5
    assert r.fetch_interval == int(DEFAULT.interval_default_s * 1.5)
    # below max → unfetched, +1 day
    got = run(spark, [db_row(url, Db.UNFETCHED)], [fetch_row(url, Fetch.RETRY)])
    r = got[url]
    assert r.status == Db.UNFETCHED and r.retries == 1
    assert r.fetch_time == FETCH_T + DAY_MS


def test_signature_modification_detection(spark):
    url = "http://t/m"
    old = db_row(url, Db.FETCHED)
    old["signature"] = b"\x01"
    old["modified_time"] = T - 5 * DAY_MS
    # same signature → notmodified, modifiedTime reset to previous (NUTCH-1341)
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS, signature=b"\x01")])
    r = got[url]
    assert r.status == Db.NOTMODIFIED
    assert r.modified_time == T - 5 * DAY_MS
    assert r.signature == b"\x01"
    # different signature → fetched (modified)
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS, signature=b"\x02")])
    r = got[url]
    assert r.status == Db.FETCHED and r.signature == b"\x02"
    # redirects never signature-compared (NUTCH-1422)
    got = run(spark, [old], [fetch_row(url, Fetch.REDIR_PERM, signature=b"\x01")])
    assert got[url].status == Db.REDIR_PERM


def test_parse_signature_wins_and_parse_meta_merged(spark):
    url = "http://t/p"
    parse = [
        dict(url=url, host="test", status=int(Msg.SIGNATURE), score=0.0,
             signature=b"\xaa", from_url=None, anchor=None, metadata=None),
        dict(url=url, host="test", status=int(Msg.PARSE_META), score=0.0,
             signature=None, from_url=None, anchor=None,
             metadata={"lang": "en"}),
    ]
    got = run(spark, [], [fetch_row(url, Fetch.SUCCESS, signature=b"\x01")], parse)
    r = got[url]
    assert r.signature == b"\xaa"  # parse signature overrides fetch's
    assert r.metadata.get("lang") == "en"


def test_opic_score_accumulation(spark):
    url = "http://t/o"
    links = [link_row(url, score=0.25, from_url=f"http://s/{k}") for k in range(4)]
    # existing url: score = old.score + Σ cash
    got = run(spark, [db_row(url, Db.FETCHED)], [], links)
    assert got[url].score == pytest.approx(1.0 + 1.0)
    assert got[url].status == Db.FETCHED  # status unchanged by links alone
    # brand-new url discovered via links: initialScore 0 + cash
    got = run(spark, [], [], links)
    r = got[url]
    assert r.score == pytest.approx(1.0)
    assert r.status == Db.UNFETCHED
    assert r.fetch_time == T  # initializeSchedule at cycle time


def test_additions_not_allowed(spark):
    cfg = DEFAULT.with_(additions_allowed=False)
    got = run(spark, [], [fetch_row("http://t/new", Fetch.SUCCESS)], None, cfg)
    assert got == {}


def test_force_refetch_on_oversized_interval(spark):
    url = "http://t/f"
    giant = DEFAULT.interval_max_s + 10
    got = run(spark, [db_row(url, Db.FETCHED)],
              [fetch_row(url, Fetch.SUCCESS, interval=giant, signature=b"\x01")])
    r = got[url]
    assert r.status == Db.UNFETCHED  # forceRefetch (T6)
    assert r.fetch_interval == int(DEFAULT.interval_max_s * 0.9)
    assert r.signature is None and r.retries == 0 and r.modified_time == 0


def test_ngt_removed_and_withdrawn(spark):
    url = "http://t/w"
    old = db_row(url, Db.FETCHED)
    old["metadata"] = {"_ngt_": str(T), "collection.seed": "http://seed/1"}
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS)],
              seeds_in_service=["http://seed/OTHER"])
    r = got[url]
    assert "_ngt_" not in (r.metadata or {})
    assert r.status == Db.WITHDRAWN  # SC5: seed no longer in service
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS)],
              seeds_in_service=["http://seed/1"])
    assert got[url].status == Db.FETCHED


def test_adaptive_schedule_inc_dec(spark):
    cfg = DEFAULT.with_(schedule="adaptive", adaptive_sync_delta=False)
    url = "http://t/a"
    old = db_row(url, Db.FETCHED)
    old["signature"] = b"\x01"
    # notmodified → interval grows by inc_rate
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS, signature=b"\x01")],
              cfg=cfg)
    assert got[url].fetch_interval == int(
        DEFAULT.interval_default_s * (1 + cfg.adaptive_inc_rate)
    )
    # modified → interval shrinks by dec_rate
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS, signature=b"\x02")],
              cfg=cfg)
    assert got[url].fetch_interval == int(
        DEFAULT.interval_default_s * (1 - cfg.adaptive_dec_rate)
    )


def test_broadcast_delta_equivalence(spark):
    """broadcast_delta (frontier never shuffles full rows: frontier ⟕
    broadcast(delta) ∪ anti-joined additions) is row-for-row identical to
    the full-outer plan across every interesting shape: fetched, retry,
    gone, pass-through old, link-only addition, sig+meta rows."""
    frontier = [
        db_row("http://t/fetched", Db.FETCHED),
        db_row("http://t/retry", Db.UNFETCHED, retries=1),
        db_row("http://t/gone", Db.FETCHED),
        db_row("http://t/passthrough", Db.FETCHED),
    ]
    fetches = [
        fetch_row("http://t/fetched", Fetch.SUCCESS, signature=b"\x01"),
        fetch_row("http://t/retry", Fetch.RETRY),
        fetch_row("http://t/gone", Fetch.GONE),
    ]
    links = [link_row("http://t/newlink", score=0.5),
             link_row("http://t/fetched", score=0.25)]

    def rows(**kw):
        got = run(spark, frontier, fetches, links, **kw)
        return {
            u: (r.status, r.fetch_time, r.retries, r.fetch_interval,
                round(float(r.score), 5),
                bytes(r.signature) if r.signature else None)
            for u, r in got.items()
        }

    base = rows()
    bcast = rows(broadcast_delta=True)
    assert base == bcast
    assert "http://t/newlink" in base        # addition present in both
    assert "http://t/passthrough" in base    # old-only row carried

    # additions_allowed=False: broadcast path drops delta-only urls too
    cfg = DEFAULT.with_(additions_allowed=False)
    assert rows(cfg=cfg) == rows(cfg=cfg, broadcast_delta=True)
    assert "http://t/newlink" not in rows(cfg=cfg, broadcast_delta=True)


def test_adaptive_fixed_interval_override(spark):
    cfg = DEFAULT.with_(schedule="adaptive")
    url = "http://t/fx"
    old = db_row(url, Db.FETCHED)
    old["metadata"] = {"fixedInterval": "3600"}
    old["signature"] = b"\x01"
    got = run(spark, [old], [fetch_row(url, Fetch.SUCCESS, signature=b"\x01")],
              cfg=cfg)
    r = got[url]
    assert r.fetch_interval == 3600
    assert r.fetch_time == FETCH_T + 3600 * 1000
