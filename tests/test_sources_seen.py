"""Tests for seed sources, sinks, and the Bloom URL-seen pre-filter."""

from __future__ import annotations

import json

import pytest

from coherencebot_spark.operators.seen import UrlSeenFilter
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.sources.seeds import FeedInjector, read_seed_files
from coherencebot_spark.sources.sinks import build_index_documents, write_csv
from coherencebot_spark.status import Db

T = 1_700_000_000_000


def frow(url, status=Db.FETCHED):
    return dict(url=url, host=url.split("/")[2], status=int(status),
                fetch_time=T, retries=0, fetch_interval=100, score=1.0,
                signature=None, modified_time=0, metadata=None)


def test_read_seed_files(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("https://a.example.org/1\n# comment\nhttps://b.example.org/2\tk=v\n")
    df = read_seed_files(spark, str(p))
    assert df.columns == ["line"]
    assert df.count() == 3


def test_feed_injector_parses_feed(spark):
    feed = [{"url": "https://a.example.org/s", "collection": "c1"},
            {"nourl": True}]
    fi = FeedInjector("https://api/feed", "key",
                      http_get=lambda u, k: json.dumps(feed))
    out = fi.fetch_seeds(spark).collect()
    assert len(out) == 1
    assert out[0].line.startswith("https://a.example.org/s\t")
    assert "collection.seed=https://a.example.org/s" in out[0].line
    assert "collection=c1" in out[0].line
    with pytest.raises(NotImplementedError):
        FeedInjector("https://api/feed").fetch_seeds(spark)


def test_url_seen_filter(spark):
    frontier = spark.createDataFrame(
        [frow(f"https://h.example.org/p{i}") for i in range(500)], FRONTIER)
    seen = UrlSeenFilter.from_frontier(spark, frontier, capacity=500, fpp=0.01)
    links = spark.createDataFrame(
        [(f"https://h.example.org/p{i}",) for i in range(400, 600)],
        "url string",
    )
    kept = seen.drop_definitely_new(links)
    kept_urls = {r.url for r in kept.collect()}
    # no false negatives: every truly-seen url survives
    for i in range(400, 500):
        assert f"https://h.example.org/p{i}" in kept_urls
    # most definitely-new urls are dropped (fpp ~1%)
    new_kept = [u for u in kept_urls if int(u.rsplit("p", 1)[1]) >= 500]
    assert len(new_kept) <= 10
    assert seen.count_new(links) >= 90


def test_sharded_url_seen_matches_monolithic(spark):
    """Sharded (per-bucket, never-collected) blooms answer membership with
    the same CONTRACT as the monolithic driver-broadcast filter over a
    multi-bucket frontier: zero false negatives on every inserted URL, and
    the definitely-new drop rate holds.  (Exact bit-for-bit equality is
    not expected — shards use per-bucket m/k — the contract is what
    updatedb relies on.)"""
    from coherencebot_spark.operators.seen import ShardedUrlSeenFilter

    # 40 hosts so URLs spread over many of the 16 buckets
    frontier = spark.createDataFrame(
        [frow(f"https://h{i % 40}.example.org/p{i}") for i in range(800)],
        FRONTIER)
    mono = UrlSeenFilter.from_frontier(spark, frontier, capacity=800, fpp=0.01)
    shard = ShardedUrlSeenFilter.from_frontier(frontier, capacity=800,
                                               n_buckets=16, fpp=0.01)
    assert shard.blooms.count() > 4  # genuinely multi-bucket

    links = spark.createDataFrame(
        [(f"https://h{i % 40}.example.org/p{i}",) for i in range(600, 1000)],
        "url string",
    )
    kept_mono = {r.url for r in mono.drop_definitely_new(links).collect()}
    kept_shard = {r.url for r in shard.drop_definitely_new(links).collect()}
    seen_urls = {f"https://h{i % 40}.example.org/p{i}" for i in range(600, 800)}
    # no false negatives in either path
    assert seen_urls <= kept_mono
    assert seen_urls <= kept_shard
    # definitely-new URLs are mostly dropped by both (fpp ~1% of 200)
    assert len(kept_mono - seen_urls) <= 10
    assert len(kept_shard - seen_urls) <= 10
    assert shard.count_new(links) >= 180
    shard.unpersist()


def test_cuckoo_url_seen_and_remove(spark):
    """Cuckoo backend: same no-false-negative contract as the bloom
    shards, plus the operation the bloom can't do — remove() un-sees
    purged URLs in place (frontier purge support) without touching any
    surviving URL's membership."""
    from coherencebot_spark.operators.seen import ShardedUrlSeenFilter

    frontier = spark.createDataFrame(
        [frow(f"https://h{i % 40}.example.org/p{i}") for i in range(800)],
        FRONTIER)
    cf = ShardedUrlSeenFilter.from_frontier(frontier, capacity=800,
                                            n_buckets=16, backend="cuckoo")
    assert cf.blooms.count() > 4

    links = spark.createDataFrame(
        [(f"https://h{i % 40}.example.org/p{i}",) for i in range(600, 1000)],
        "url string")
    kept = {r.url for r in cf.drop_definitely_new(links).collect()}
    seen_urls = {f"https://h{i % 40}.example.org/p{i}"
                 for i in range(600, 800)}
    assert seen_urls <= kept                      # no false negatives
    # cuckoo fpp ≈ 0.012% — definitely-new URLs essentially all drop
    assert len(kept - seen_urls) <= 2

    # purge p600-p699: after remove() they read definitely-new again,
    # every survivor stays seen
    purged = spark.createDataFrame(
        [(f"https://h{i % 40}.example.org/p{i}",) for i in range(600, 700)],
        "url string")
    cf2 = cf.remove(purged)
    kept2 = {r.url for r in cf2.drop_definitely_new(links).collect()}
    survivors = {f"https://h{i % 40}.example.org/p{i}"
                 for i in range(700, 800)}
    assert survivors <= kept2                     # survivors untouched
    purged_set = {f"https://h{i % 40}.example.org/p{i}"
                  for i in range(600, 700)}
    assert len(kept2 & purged_set) <= 2           # purged are unseen now
    cf2.unpersist()

    # bloom backend refuses remove() with an actionable error
    bl = ShardedUrlSeenFilter.from_frontier(frontier, capacity=800,
                                            n_buckets=16, backend="bloom")
    with pytest.raises(ValueError, match="cuckoo"):
        bl.remove(purged)
    bl.unpersist()


def test_cuckoo_sharded_survives_host_skew(spark):
    """Host-aligned buckets are skewed: one bucket can hold many times
    ``capacity // n_buckets`` URLs.  Each shard sizes its table from its
    OWN row count, so a hot bucket builds instead of exhausting the
    eviction walk (the failure mode a global split had), and the shard
    schema's per-row ``nb`` lets shard sizes differ."""
    from coherencebot_spark.functions.hashing import (
        CuckooFilter, build_cuckoo_sharded, cuckoo_contains_sharded)

    # 4000 URLs on ONE host (one bucket), 16 buckets, capacity hint says
    # 4000/16 = 250 per shard — 16x under the hot bucket's true load
    from pyspark.sql import functions as F

    hostb = F.pmod(F.xxhash64(F.col("host")), F.lit(16)).cast("int")
    frontier = spark.createDataFrame(
        [frow(f"https://hot.example.org/p{i}") for i in range(4000)],
        FRONTIER)
    shards = build_cuckoo_sharded(frontier, "url", capacity=4000,
                                  n_buckets=16, bucket_expr=hostb)
    rows = shards.collect()
    assert len(rows) == 1                      # one host → one bucket
    # sized from the shard's rows, not the global split
    assert rows[0].nb >= CuckooFilter.params(4000)
    probe = spark.createDataFrame(
        [(f"https://hot.example.org/p{i}", "hot.example.org")
         for i in range(0, 8000, 2)],
        "url string, host string")
    got = {r.url: r.maybe_seen
           for r in cuckoo_contains_sharded(probe, "url", shards,
                                            n_buckets=16,
                                            bucket_expr=hostb).collect()}
    inserted = {u for u in got if int(u.rsplit("p", 1)[1]) < 4000}
    assert all(got[u] for u in inserted)       # no false negatives
    fresh = [u for u in got if u not in inserted]
    assert sum(got[u] for u in fresh) <= 2     # fpp stays tiny


def test_elastic_bulk_round_trip(spark, tmp_path):
    """indexer-elastic analogue: _bulk NDJSON with index + delete actions
    parses back exactly (escaping-safe ids, hex binaries)."""
    from coherencebot_spark.sources.sinks import (
        read_elastic_bulk, write_elastic_bulk,
    )

    df = spark.createDataFrame(
        [("https://a.example.org/x", 'tricky "quoted"', b"\x01\x02", False),
         ("https://b.example.org/y", "plain", None, True)],
        'url string, title string, sig binary, _delete boolean',
    )
    out = str(tmp_path / "bulk")
    write_elastic_bulk(df, out, index="docs")
    recs = read_elastic_bulk(out)
    kinds = sorted(k for k, _ in recs)
    assert kinds == ["delete", "index"]
    src = next(s for k, s in recs if k == "index")
    assert src["url"] == "https://a.example.org/x"
    assert src["title"] == 'tricky "quoted"'
    assert src["sig"] == "0102"


def test_warc_round_trip(spark, tmp_path):
    """dump_segment_warc writes spec-layout WARC 1.0 records (version line,
    CRLF headers, Content-Length-delimited payload, record separator) that
    the reader parses back byte-exact."""
    from coherencebot_spark.schemas import CONTENT, FETCH_LOG
    from coherencebot_spark.sources.sinks import (
        dump_segment_warc, read_warc_records,
    )
    from coherencebot_spark.status import Fetch

    T = 1_700_000_000_000
    fl = spark.createDataFrame(
        [dict(url=f"https://h.example.org/p{i}", host="h.example.org",
              status=int(Fetch.SUCCESS), fetch_time=T + i, retries=0,
              fetch_interval=2_592_000, score=1.0, signature=None,
              modified_time=0, metadata=None, proto_status=1,
              redirect_to=None)
         for i in range(3)],
        FETCH_LOG,
    )
    ct = spark.createDataFrame(
        [dict(url=f"https://h.example.org/p{i}", image_id=f"i{i}",
              bytes=bytes([i]) * (10 + i), w=1, h=1, fmt="png",
              caption=f"caption {i}\nwith newline", phash=i)
         for i in range(3)],
        CONTENT,
    )
    out = str(tmp_path / "warc")
    dump_segment_warc(fl, ct, out)
    recs = read_warc_records(out)
    by_type = {}
    for r in recs:
        by_type.setdefault(r["type"], []).append(r)
    assert len(by_type["warcinfo"]) >= 1
    assert len(by_type["resource"]) == 3
    assert len(by_type["metadata"]) == 3
    res = {r["WARC-Target-URI"]: r for r in by_type["resource"]}
    for i in range(3):
        r = res[f"https://h.example.org/p{i}"]
        assert r["payload"] == bytes([i]) * (10 + i)  # byte-exact payload
        assert r["Content-Type"] == "image/png"
        assert r["WARC-Date"].endswith("Z")
        assert r["WARC-Record-ID"].startswith("<urn:uuid:")
    # metadata records link back via WARC-Concurrent-To
    meta_targets = {m["WARC-Concurrent-To"] for m in by_type["metadata"]}
    assert meta_targets == {r["WARC-Record-ID"] for r in by_type["resource"]}


def test_index_documents_and_csv(spark, tmp_path):
    from coherencebot_spark.schemas import CONTENT
    frontier = spark.createDataFrame(
        [frow("https://h.example.org/ok"),
         frow("https://h.example.org/gone", Db.GONE)], FRONTIER)
    content = spark.createDataFrame(
        [dict(url="https://h.example.org/ok", image_id="i", bytes=b"\x01",
              w=1, h=1, fmt="png", caption="c", phash=1)], CONTENT)
    docs = build_index_documents(frontier, content)
    got = {r.url: r for r in docs.collect()}
    assert got["https://h.example.org/ok"]._delete is False
    assert got["https://h.example.org/gone"]._delete is True
    write_csv(docs, str(tmp_path / "csv"))
    out = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert out.count() == 2


def test_kafka_sink_gated_with_actionable_error(spark):
    """No Kafka connector jar ships in this sandbox (permanently ⚪ in
    COVERAGE.md): the sink must fail with the actionable --packages
    message, not Spark's generic ClassNotFound chain."""
    import pytest

    from coherencebot_spark.sources.sinks import write_kafka

    df = spark.createDataFrame([("u1", 1)], "url string, status int")
    with pytest.raises(RuntimeError, match="--packages"):
        write_kafka(df, "localhost:9092", "t")


def test_monolithic_bloom_capacity_guard(spark):
    # VERDICT r3 #9: the driver-bitmap bloom must be unreachable at scale —
    # the sharded builder is the single production API
    import pytest as _pytest

    frontier = spark.range(10).selectExpr("concat('http://h/', id) as url")
    with _pytest.raises(ValueError, match="build_bloom_sharded"):
        UrlSeenFilter.from_frontier(spark, frontier, capacity=10_000_000_000)


def test_file_dumper(spark, tmp_path):
    # tools/FileDumper analogue: one file per payload + mimetype histogram
    import os

    from coherencebot_spark.operators.tools import dump_content_files
    from coherencebot_spark.schemas import CONTENT

    rows = [
        dict(url="http://a.org/img/cat.png", image_id="i1", bytes=b"PNGDATA",
             w=2, h=2, fmt="png", caption="c", phash=1),
        dict(url="http://a.org/img/dog.bmp", image_id="i2", bytes=b"BMPDATA",
             w=2, h=2, fmt="bmp", caption="c", phash=2),
        dict(url="http://a.org/missing", image_id=None, bytes=None,
             w=None, h=None, fmt=None, caption=None, phash=None),
    ]
    content = spark.createDataFrame(rows, CONTENT)
    outdir = str(tmp_path / "dump")
    hist = dump_content_files(content, outdir)
    assert hist == {"png": 1, "bmp": 1}
    files = sorted(os.listdir(outdir))
    assert len(files) == 2
    assert any(f.endswith("_cat.png.png") for f in files)
    data = {f.split(".")[-1]: open(os.path.join(outdir, f), "rb").read()
            for f in files}
    assert data == {"png": b"PNGDATA", "bmp": b"BMPDATA"}
    # format filter (the reference's mimeTypes arg)
    outdir2 = str(tmp_path / "dump2")
    assert dump_content_files(content, outdir2, formats=["png"]) == {"png": 1}


def test_dmoz_parser(spark, tmp_path):
    # tools/DmozParser analogue: RDF → seed lines with topic subset filter
    from coherencebot_spark.operators.inject import parse_seed_lines
    from coherencebot_spark.operators.tools import parse_dmoz_rdf

    rdf = """<?xml version="1.0" encoding="UTF-8"?>
<RDF xmlns:r="http://www.w3.org/TR/RDF/">
<Topic r:id="Top/Arts"><catid>2</catid></Topic>
<ExternalPage about="http://arts.example.org/">
  <d:Title>Arts site</d:Title>
  <topic>Top/Arts</topic>
</ExternalPage>
<ExternalPage about="http://science.example.org/page">
  <d:Title>Science site</d:Title>
  <topic>Top/Science/Physics</topic>
</ExternalPage>
<ExternalPage about="http://no-topic.example.org/">
  <d:Title>Orphan</d:Title>
</ExternalPage>
</RDF>
"""
    p = tmp_path / "dmoz.rdf"
    p.write_text(rdf)
    seeds = parse_dmoz_rdf(spark, str(p))
    lines = sorted(r.line for r in seeds.collect())
    assert lines == [
        "http://arts.example.org/\tdmoz.topic=Top/Arts",
        "http://no-topic.example.org/",
        "http://science.example.org/page\tdmoz.topic=Top/Science/Physics",
    ]
    # topic subset regex (the -topic arg)
    sci = parse_dmoz_rdf(spark, str(p), topic_pattern="^Top/Science")
    assert [r.line for r in sci.collect()] \
        == ["http://science.example.org/page\tdmoz.topic=Top/Science/Physics"]
    # the output is injector-ready seed-line shape
    from coherencebot_spark.config import DEFAULT

    parsed = parse_seed_lines(seeds, DEFAULT, 1_700_000_000_000)
    got = {r.url: r.metadata for r in parsed.collect()}
    assert got["http://arts.example.org/"].get("dmoz.topic") == "Top/Arts"


def test_solr_xml_sink_round_trip(spark, tmp_path):
    """indexer-solr analogue: XML update commands (add docs + delete ids)
    parse back exactly; XML-escaping-safe values, hex binaries, nulls
    omitted like unset SolrInputDocument fields."""
    from coherencebot_spark.sources.sinks import read_solr_xml, write_solr_xml

    df = spark.createDataFrame(
        [("https://a.example.org/x", 'needs <escaping> & "quotes"',
          b"\x01\x02", None, False),
         ("https://b.example.org/y", "plain", None, 7, False),
         ("https://gone.example.org/z", "dead", None, None, True)],
        "url string, title string, sig binary, n int, _delete boolean",
    )
    out = str(tmp_path / "solr")
    write_solr_xml(df, out)
    adds, deletes = read_solr_xml(out)
    assert deletes == ["https://gone.example.org/z"]
    by_url = {d["url"]: d for d in adds}
    assert set(by_url) == {"https://a.example.org/x", "https://b.example.org/y"}
    a = by_url["https://a.example.org/x"]
    assert a["title"] == 'needs <escaping> & "quotes"'
    assert a["sig"] == "0102"
    assert "n" not in a  # null field omitted
    assert by_url["https://b.example.org/y"]["n"] == "7"


def test_cleaning_job(spark, tmp_path):
    """bin/nutch clean (CleaningJob.java): gone + duplicate rows become
    delete actions; everything else is untouched.  Round-trips through
    the solr-xml sink's delete contract."""
    from coherencebot_spark.sources.sinks import (
        cleaning_job, read_solr_xml, write_solr_xml)
    from coherencebot_spark.status import Db

    rows = [
        ("http://h/ok", int(Db.FETCHED)),
        ("http://h/gone", int(Db.GONE)),
        ("http://h/dup", int(Db.DUPLICATE)),
        ("http://h/unfetched", int(Db.UNFETCHED)),
    ]
    f = spark.createDataFrame(rows, "url string, status int")
    got = {r.url for r in cleaning_job(f).collect()}
    assert got == {"http://h/gone", "http://h/dup"}
    # --noCommit analogue of duplicate handling: CleaningJob always
    # includes duplicates; the toggle is for engines doing dedup natively
    only_gone = {r.url for r in
                 cleaning_job(f, include_duplicates=False).collect()}
    assert only_gone == {"http://h/gone"}

    out = str(tmp_path / "deletes")
    write_solr_xml(cleaning_job(f), out)
    docs, deletes = read_solr_xml(out)
    assert docs == []
    assert sorted(deletes) == ["http://h/dup", "http://h/gone"]


def test_dummy_sink(spark, tmp_path):
    """indexer-dummy (DummyIndexWriter.java:90-116): add\\t<id> lines,
    delete\\t<key> only when the writer's delete param is on."""
    import glob

    from coherencebot_spark.sources.sinks import write_dummy

    df = spark.createDataFrame(
        [("u1", False), ("u2", False), ("gone", True)],
        "url string, _delete boolean")

    def lines(path):
        out = []
        for fn in glob.glob(f"{path}/part-*"):
            with open(fn) as f:
                out += [ln.rstrip("\n") for ln in f if ln.strip()]
        return sorted(out)

    p1 = str(tmp_path / "d1")
    write_dummy(df, p1)
    assert lines(p1) == ["add\tu1", "add\tu2"]

    p2 = str(tmp_path / "d2")
    write_dummy(df, p2, delete=True)
    assert lines(p2) == ["add\tu1", "add\tu2", "delete\tgone"]
