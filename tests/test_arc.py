"""Legacy ARC import (tools/arc/): member splitting, header parse,
segment creation, and updatedb ingestion of the produced segment."""
from __future__ import annotations

import gzip

from coherencebot_spark.sources.arc import (arc_to_segment, read_arc,
                                            split_arc_members)
from coherencebot_spark.status import Db, Fetch

T0 = 1_700_000_000_000


def _member(header: str, payload: bytes) -> bytes:
    return gzip.compress(header.encode() + b"\n" + payload)


def _arc_bytes() -> bytes:
    recs = [
        ("filedesc://test.arc 0.0.0.0 20240101000000 text/plain 76",
         b"1 0 Test\nURL IP-address Archive-date Content-type Archive-length"),
        ("http://a.org/x 1.2.3.4 20240102030405 text/html 11",
         b"<p>hello</p>"),
        ("http://b.org/y 5.6.7.8 20240103000000 image/png 4",
         bytes(range(16))),
        ("http://a.org/z 1.2.3.4 20240104000000 text/plain 3",
         b"abc"),
    ]
    return b"".join(_member(h, p) for h, p in recs)


def test_split_arc_members_handles_truncation():
    buf = _arc_bytes()
    got = split_arc_members(buf)
    assert len(got) == 4
    assert got[1][0].startswith("http://a.org/x ")
    assert got[1][1] == b"<p>hello</p>"
    # truncated trailing member is dropped, earlier ones survive
    cut = split_arc_members(buf[:-7])
    assert len(cut) == 3


def test_read_arc_and_segment(spark, tmp_path):
    p = tmp_path / "arcs"
    p.mkdir()
    (p / "part-1.arc.gz").write_bytes(_arc_bytes())
    recs = read_arc(spark, str(p))
    rows = {r.url: r for r in recs.collect()}
    assert len(rows) == 4
    assert rows["http://b.org/y"].content_type == "image/png"
    assert rows["http://a.org/x"].declared_length == 11
    assert bytes(rows["http://a.org/x"].bytes) == b"<p>hello</p>"

    flog, content = arc_to_segment(recs, T0)
    fl = {r.url: r for r in flog.collect()}
    # filedesc file header is skipped (ArcSegmentCreator.java:297-300)
    assert set(fl) == {"http://a.org/x", "http://b.org/y", "http://a.org/z"}
    r = fl["http://a.org/x"]
    assert r.status == int(Fetch.SUCCESS) and r.host == "a.org"
    assert r.score == 1.0 and r.fetch_time == T0
    assert r.metadata["arc_ip"] == "1.2.3.4"
    assert r.metadata["arc_content_type"] == "text/html"
    assert r.signature is not None
    ct = {r.url: r for r in content.collect()}
    assert bytes(ct["http://b.org/y"].bytes) == bytes(range(16))
    assert ct["http://b.org/y"].fmt == "png"

    # url_filter drops rows from BOTH outputs
    from pyspark.sql import functions as F
    flog2, content2 = arc_to_segment(
        recs, T0, url_filter=lambda u: u.filter(~F.col("url").contains("b.org")))
    assert {r.url for r in flog2.collect()} == \
        {"http://a.org/x", "http://a.org/z"}
    assert {r.url for r in content2.collect()} == \
        {"http://a.org/x", "http://a.org/z"}


def test_arc_segment_feeds_updatedb(spark, tmp_path):
    """The produced fetch_log merges into a frontier like any cycle's
    segment — the point of the import tool."""
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.updatedb import updatedb

    p = tmp_path / "arcs"
    p.mkdir()
    (p / "a.arc.gz").write_bytes(_arc_bytes())
    flog, _ = arc_to_segment(read_arc(spark, str(p)), T0)
    empty = spark.createDataFrame([], flog.drop("proto_status",
                                                "redirect_to").schema)
    nf = {r.url: r for r in updatedb(empty, flog, None, T0, DEFAULT).collect()}
    assert len(nf) == 3
    assert all(r.status == int(Db.FETCHED) for r in nf.values())
    assert nf["http://a.org/z"].signature is not None


def test_import_arc_cli(tmp_path):
    """scripts/import_arc.py end-to-end: segment snapshots + merged
    frontier commit, resumable by the crawl driver."""
    import json
    import subprocess
    import sys

    arcs = tmp_path / "arcs"
    arcs.mkdir()
    (arcs / "a.arc.gz").write_bytes(_arc_bytes())
    wd = tmp_path / "crawl"
    out = subprocess.run(
        [sys.executable, "scripts/import_arc.py", "--arcs", str(arcs),
         "--workdir", str(wd), "--t0", str(T0)],
        capture_output=True, text=True, timeout=300, check=True)
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["imported_records"] == 3
    assert line["frontier_size"] == 3
    assert (wd / "frontier").exists() and (wd / "content").exists()
