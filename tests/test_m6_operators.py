"""Tests for parse, dedup (comparator cascade golden cases), linkdb,
hostdb, readdb, mergers — SURVEY.md §5.2 #5 and M6."""

from __future__ import annotations

import pandas as pd
import pytest

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.dedup import dedup, dedup_by_phash
from coherencebot_spark.operators.hostdb import update_hostdb
from coherencebot_spark.operators.linkdb import invert_links, merge_linkdb
from coherencebot_spark.operators.merge import merge_crawldbs, merge_segments
from coherencebot_spark.operators.parse import parse, redirect_link_rows
from coherencebot_spark.operators.readdb import dump, stats, topn
from coherencebot_spark.schemas import CONTENT, FETCH_LOG, FRONTIER, PARSE_OUT
from coherencebot_spark.status import Db, Fetch, Msg

T = 1_700_000_000_000


def frow(url, status=Db.FETCHED, score=1.0, fetch_time=T, signature=b"\x01",
         host=None, metadata=None):
    return dict(url=url, host=host or url.split("/")[2], status=int(status),
                fetch_time=fetch_time, retries=0, fetch_interval=2_592_000,
                score=float(score), signature=signature, modified_time=0,
                metadata=metadata)


# ---------------------------------------------------------------------------
# dedup — comparator-cascade branches (DeduplicationJob.java:167-229)
# ---------------------------------------------------------------------------


def test_dedup_score_then_time_then_length(spark):
    rows = [
        frow("http://a/keep-best-score", score=9.0),
        frow("http://a/lower-score", score=1.0),
    ]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER)).collect()}
    assert out["http://a/keep-best-score"] == Db.FETCHED
    assert out["http://a/lower-score"] == Db.DUPLICATE

    # equal score → latest fetch time wins
    rows = [
        frow("http://a/old", fetch_time=T - 1000),
        frow("http://a/new", fetch_time=T),
    ]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER)).collect()}
    assert out["http://a/new"] == Db.FETCHED
    assert out["http://a/old"] == Db.DUPLICATE

    # equal score+time → shortest url wins
    rows = [frow("http://a/longerurl"), frow("http://a/short")]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER)).collect()}
    assert out["http://a/short"] == Db.FETCHED
    assert out["http://a/longerurl"] == Db.DUPLICATE

    # full tie → pinned url-asc winner
    rows = [frow("http://a/x1"), frow("http://a/x2")]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER)).collect()}
    assert out["http://a/x1"] == Db.FETCHED and out["http://a/x2"] == Db.DUPLICATE


def test_dedup_https_over_http(spark):
    cfg = DEFAULT.with_(dedup_compare_order=("httpsOverHttp", "score"))
    rows = [frow("http://a/p", score=9.0), frow("https://a/p", score=1.0)]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER), cfg).collect()}
    assert out["https://a/p"] == Db.FETCHED
    assert out["http://a/p"] == Db.DUPLICATE


def test_dedup_groups_and_unfetched_excluded(spark):
    # different signatures never collide; unfetched rows don't compete
    rows = [
        frow("http://a/1", signature=b"\x01"),
        frow("http://a/2", signature=b"\x02"),
        frow("http://a/3", status=Db.UNFETCHED, signature=b"\x01"),
    ]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER)).collect()}
    assert all(s != Db.DUPLICATE for s in out.values())
    # host grouping: same signature on different hosts survives
    cfg = DEFAULT.with_(dedup_group_mode="host")
    rows = [frow("http://a/1"), frow("http://b/1")]
    out = {r.url: r.status for r in dedup(
        spark.createDataFrame(rows, FRONTIER), cfg).collect()}
    assert all(s != Db.DUPLICATE for s in out.values())


def test_dedup_by_phash(spark):
    rows = [frow("http://a/1", score=2.0), frow("http://b/1", score=1.0),
            frow("http://c/1", score=5.0)]
    content = [
        dict(url="http://a/1", image_id="i1", bytes=b"x", w=1, h=1,
             fmt="png", caption="c", phash=42),
        dict(url="http://b/1", image_id="i2", bytes=b"y", w=1, h=1,
             fmt="png", caption="c", phash=42),
        dict(url="http://c/1", image_id="i3", bytes=b"z", w=1, h=1,
             fmt="png", caption="c", phash=7),
    ]
    out = {r.url: r.status for r in dedup_by_phash(
        spark.createDataFrame(rows, FRONTIER),
        spark.createDataFrame(content, CONTENT)).collect()}
    assert out["http://a/1"] == Db.FETCHED   # higher score keeps
    assert out["http://b/1"] == Db.DUPLICATE
    assert out["http://c/1"] == Db.FETCHED   # unique phash


# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------


def fetch_row(url, status=Fetch.SUCCESS, redirect_to=None, score=1.0):
    return dict(url=url, host=url.split("/")[2], status=int(status),
                fetch_time=T, retries=0, fetch_interval=2_592_000,
                score=float(score), signature=None, modified_time=0,
                metadata=None, proto_status=1, redirect_to=redirect_to)


def content_row(url, data=b"payload", caption="cap"):
    return dict(url=url, image_id="img", bytes=data, w=8, h=8, fmt="png",
                caption=caption, phash=1)


def static_outlinks(urls: pd.Series) -> pd.Series:
    return pd.Series(
        [[(f"https://other.example.org/t{i}", "anchor text here")]
         for i in range(len(urls))],
        index=urls.index,
    )


def test_parse_emits_signature_meta_links(spark):
    fl = spark.createDataFrame(
        [fetch_row("https://h.example.org/p", score=2.0),
         fetch_row("https://h.example.org/gone", status=Fetch.GONE)],
        FETCH_LOG,
    )
    ct = spark.createDataFrame([content_row("https://h.example.org/p")], CONTENT)
    out = parse(fl, ct, DEFAULT, outlink_fn=static_outlinks).collect()
    kinds = {}
    for r in out:
        kinds.setdefault(r.status, []).append(r)
    assert len(kinds[Msg.SIGNATURE]) == 1
    import hashlib
    assert bytes(kinds[Msg.SIGNATURE][0].signature) == hashlib.md5(b"payload").digest()
    assert len(kinds[Msg.PARSE_META]) == 1
    assert kinds[Msg.PARSE_META][0].metadata["img.fmt"] == "png"
    # one outlink → full cash 2.0 (external factor 1.0)
    assert len(kinds[Msg.LINKED]) == 1
    link = kinds[Msg.LINKED][0]
    assert link.url == "https://other.example.org/t0"
    assert link.score == pytest.approx(2.0)
    assert link.from_url == "https://h.example.org/p"


def test_urlmeta_propagates_to_outlink_targets(spark):
    # plugin urlmeta (URLMetaScoringFilter.distributeScoreToOutlink):
    # listed datum metadata keys ride onto every outlink target; unlisted
    # keys do not
    row = fetch_row("https://h.example.org/p", score=2.0)
    row["metadata"] = {"collection.seed": "acme", "unlisted": "x"}
    fl = spark.createDataFrame([row], FETCH_LOG)
    ct = spark.createDataFrame([content_row("https://h.example.org/p")],
                               CONTENT)
    links = (parse(fl, ct, DEFAULT, outlink_fn=static_outlinks,
                   urlmeta_tags=["collection.seed"])
             .filter(f"status = {int(Msg.LINKED)}").collect())
    assert links and all(
        dict(r.metadata) == {"collection.seed": "acme"} for r in links)
    # parent without the tag → outlinks carry no metadata (null, the
    # same shape as the urlmeta-off path)
    row2 = fetch_row("https://h.example.org/p", score=2.0)
    fl2 = spark.createDataFrame([row2], FETCH_LOG)
    links2 = (parse(fl2, ct, DEFAULT, outlink_fn=static_outlinks,
                    urlmeta_tags=["collection.seed"])
              .filter(f"status = {int(Msg.LINKED)}").collect())
    assert links2 and all(r.metadata is None for r in links2)


def test_opic_cash_split(spark):
    def two_links(urls: pd.Series) -> pd.Series:
        return pd.Series(
            [[("https://h.example.org/internal", "a"),
              ("https://x.example.org/external", "b")] for _ in urls],
            index=urls.index,
        )

    fl = spark.createDataFrame([fetch_row("https://h.example.org/p", score=3.0)],
                               FETCH_LOG)
    ct = spark.createDataFrame([content_row("https://h.example.org/p")], CONTENT)
    cfg = DEFAULT.with_(score_internal=2.0, score_external=0.5)
    links = {r.url: r.score for r in parse(fl, ct, cfg, outlink_fn=two_links)
             .filter(f"status = {int(Msg.LINKED)}").collect()}
    assert links["https://h.example.org/internal"] == pytest.approx(3.0 / 2 * 2.0)
    assert links["https://x.example.org/external"] == pytest.approx(3.0 / 2 * 0.5)


def test_parse_caption_outlinks_real_text(spark):
    """End-to-end real-text path: the OutlinkExtractor regex port runs
    over the CAPTION column (outlink_source), links are normalized,
    filtered by the default chain, and carry OPIC cash — while the
    divisor honors accepted-count semantics (the mailto link is
    extracted but rejected by normalization, so cash divides by 1)."""
    from coherencebot_spark.functions.outlinks import extract_outlinks_text
    from coherencebot_spark.functions.urls import URLFilterChain

    fl = spark.createDataFrame([fetch_row("https://h.example.org/p", score=2.0)],
                               FETCH_LOG)
    ct = spark.createDataFrame(
        [content_row("https://h.example.org/p",
                     caption="see HTTP://Other.example.org:80/x and "
                             "mailto:a@b.org for details")],
        CONTENT,
    )
    out = parse(fl, ct, DEFAULT, outlink_fn=extract_outlinks_text,
                chain=URLFilterChain(), outlink_source="caption")
    links = [r for r in out.collect() if r.status == int(Msg.LINKED)]
    assert len(links) == 1
    # normalized: scheme+host lowercased, default port stripped
    assert links[0].url == "http://other.example.org/x"
    # divisor = accepted count (1), NOT raw extracted count (2)
    assert links[0].score == pytest.approx(2.0)


def test_parse_payload_validation(spark):
    """North-rule per-row invariant: decoded pixels must match the
    reference (exact for lossless, PSNR>=40dB for lossy) and the caption
    must be equal — corrupted bytes or a tampered caption drop the row."""
    from coherencebot_spark.synth import world

    rows, urls = [], []
    for i in range(3):
        p = world.payload_row(i)
        url = f"https://h.example.org/p{i}"
        urls.append(url)
        rows.append(dict(url=url, image_id=p["image_id"], bytes=p["bytes"],
                         w=p["w"], h=p["h"], fmt=p["fmt"],
                         caption=p["caption"], phash=p["phash"]))
    # corrupt row 1's payload body, tamper row 2's caption
    rows[1]["bytes"] = rows[1]["bytes"][:-40] + b"\x00" * 40
    rows[2]["caption"] = "tampered"
    fl = spark.createDataFrame([fetch_row(u) for u in urls], FETCH_LOG)
    ct = spark.createDataFrame(rows, CONTENT)
    out = parse(fl, ct, DEFAULT, outlink_fn=static_outlinks,
                validate_fn=world.validate_payload_rows)
    sigs = [r.url for r in out.collect() if r.status == int(Msg.SIGNATURE)]
    assert sigs == [urls[0]]  # only the intact row survives


def test_redirect_link_rows(spark):
    fl = spark.createDataFrame(
        [fetch_row("https://h.example.org/m", status=Fetch.REDIR_PERM,
                   redirect_to="https://t.example.org/new"),
         fetch_row("https://h.example.org/self", status=Fetch.REDIR_TEMP,
                   redirect_to="https://h.example.org/self")],
        FETCH_LOG,
    )
    out = redirect_link_rows(fl).collect()
    assert len(out) == 1  # self-redirect dropped
    assert out[0].url == "https://t.example.org/new"
    assert out[0].status == Msg.LINKED


# ---------------------------------------------------------------------------
# linkdb
# ---------------------------------------------------------------------------


def link_row(url, from_url, anchor="a" * 150):
    return dict(url=url, host=url.split("/")[2], status=int(Msg.LINKED),
                score=0.1, signature=None, from_url=from_url, anchor=anchor,
                metadata=None)


def test_invert_links_caps_and_truncates(spark):
    rows = [link_row("https://t.example.org/p", f"https://s{i}.example.org/x")
            for i in range(5)]
    rows.append(link_row("https://t.example.org/p", "https://t.example.org/internal"))
    ldb = invert_links(spark.createDataFrame(rows, PARSE_OUT)).collect()
    assert len(ldb) == 1
    inl = ldb[0].inlinks
    assert len(inl) == 5  # internal link ignored (linkdb.ignore.internal.links)
    assert all(len(i.anchor) == 100 for i in inl)  # anchor truncation

    merged = merge_linkdb(
        invert_links(spark.createDataFrame(rows, PARSE_OUT)),
        invert_links(spark.createDataFrame(
            [link_row("https://t.example.org/p", "https://new.example.org/y")],
            PARSE_OUT)),
    ).collect()
    assert len(merged[0].inlinks) == 6


# ---------------------------------------------------------------------------
# hostdb / readdb / mergers
# ---------------------------------------------------------------------------


def test_update_hostdb(spark):
    rows = [frow("http://a/1", status=Db.FETCHED),
            frow("http://a/2", status=Db.UNFETCHED, signature=None),
            frow("http://b/1", status=Db.GONE, signature=None)]
    hdb = update_hostdb(spark.createDataFrame(rows, FRONTIER))
    got = {r.host: r for r in hdb.collect()}
    assert got["a"].fetched == 1 and got["a"].unfetched == 1
    assert got["b"].gone == 1
    # merge keeps failure counters accumulating
    hdb2 = update_hostdb(spark.createDataFrame(rows, FRONTIER), hdb)
    got2 = {r.host: r for r in hdb2.collect()}
    assert got2["a"].fetched == 1


def test_readdb_stats_and_topn(spark):
    rows = [frow(f"http://h/{i}", score=float(i), signature=None,
                 status=Db.UNFETCHED) for i in range(10)]
    f = spark.createDataFrame(rows, FRONTIER)
    s = stats(f)
    g = s["global"].collect()[0]
    assert g.urls == 10 and g.max_score == 9.0
    t = topn(f, 3).collect()
    assert [r.score for r in t] == [9.0, 8.0, 7.0]
    d = dump(f, expr="score >= 8").collect()
    assert len(d) == 2


def test_merge_crawldbs_latest_wins(spark):
    a = spark.createDataFrame(
        [frow("http://h/1", fetch_time=T - 1000, score=1.0,
              metadata={"k": "old", "x": "1"})], FRONTIER)
    b = spark.createDataFrame(
        [frow("http://h/1", fetch_time=T, score=2.0, metadata={"k": "new"})],
        FRONTIER)
    out = merge_crawldbs([a, b]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.score == 2.0 and r.fetch_time == T
    assert r.metadata == {"k": "new", "x": "1"}  # merged, later wins


def test_merge_segments(spark):
    s1 = spark.createDataFrame([fetch_row("https://h.example.org/p")], FETCH_LOG)
    s2 = spark.createDataFrame(
        [dict(fetch_row("https://h.example.org/p", status=Fetch.GONE),
              fetch_time=T + 5)], FETCH_LOG)
    out = merge_segments([s1, s2]).collect()
    assert len(out) == 1 and out[0].status == Fetch.GONE


def test_parse_ignore_external_with_exemption(spark):
    """db.ignore.external.links at parse time: cross-host outlinks drop
    INSIDE the extract loop (the OPIC divisor counts only kept links,
    ParseOutputFormat.java:283-311); urlfilter-ignoreexempt exempts
    matching targets; db.ignore.internal.links is the mirror case."""
    from coherencebot_spark.functions.outlinks import extract_outlinks_text
    from coherencebot_spark.functions.urls import ExemptionURLFilter

    fl = spark.createDataFrame([fetch_row("https://h.example.org/p", score=3.0)],
                               FETCH_LOG)
    caption = ("see http://h.example.org/in1 and http://h.example.org/in2 "
               "and http://other.org/ext and http://cdn.example.net/img1")
    ct = spark.createDataFrame(
        [content_row("https://h.example.org/p", caption=caption)], CONTENT)

    def links_of(cfg, **kw):
        out = parse(fl, ct, cfg, outlink_fn=extract_outlinks_text,
                    outlink_source="caption", **kw)
        return {r.url: r for r in out.collect() if r.status == int(Msg.LINKED)}

    # baseline: all 4 kept, divisor 4
    got = links_of(DEFAULT)
    assert len(got) == 4
    assert got["http://other.org/ext"].score == pytest.approx(3.0 / 4)

    # ignore external: only same-host links survive, divisor 2
    got = links_of(DEFAULT.with_(ignore_external_links=True))
    assert set(got) == {"http://h.example.org/in1", "http://h.example.org/in2"}
    assert got["http://h.example.org/in1"].score == pytest.approx(3.0 / 2)

    # exemption: the cdn target is exempt from the external drop, divisor 3
    ex = ExemptionURLFilter(rules=(r"+^http://cdn\.example\.net/",))
    got = links_of(DEFAULT.with_(ignore_external_links=True),
                   exemption_filter=ex)
    assert set(got) == {"http://h.example.org/in1", "http://h.example.org/in2",
                        "http://cdn.example.net/img1"}
    assert got["http://cdn.example.net/img1"].score == pytest.approx(3.0 / 3)

    # ignore internal: the mirror — externals only
    got = links_of(DEFAULT.with_(ignore_internal_links=True))
    assert set(got) == {"http://other.org/ext", "http://cdn.example.net/img1"}


def test_linkdb_merge_dedups_recrawled_edges(spark):
    # the reference's Inlinks is a HashSet: a recrawled page re-adding the
    # same (from_url, anchor) edge must not accumulate duplicates that
    # crowd real inlinks out of the cap
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.linkdb import merge_linkdb
    from coherencebot_spark.schemas import LINKDB

    rows = [("http://t/", [("http://a/", "x")])]
    db = spark.createDataFrame(rows, LINKDB)
    merged = db
    for _ in range(3):  # three recrawl cycles of the same edge
        merged = merge_linkdb(merged, db, DEFAULT)
    got = merged.collect()
    assert len(got) == 1
    assert [(i.from_url, i.anchor) for i in got[0].inlinks] \
        == [("http://a/", "x")]
    # distinct edges survive the cap deterministically (sorted)
    db2 = spark.createDataFrame(
        [("http://t/", [("http://b/", "y"), ("http://a/", "z")])], LINKDB)
    cap = merge_linkdb(merged, db2, DEFAULT.with_(linkdb_max_inlinks=2))
    inl = [(i.from_url, i.anchor) for i in cap.collect()[0].inlinks]
    assert inl == [("http://a/", "x"), ("http://a/", "z")]
