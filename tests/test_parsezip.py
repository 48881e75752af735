"""parse-zip tests — TestZipParser's extracted-text contract plus the
ZipParser truncation and bad-archive failure paths, entry-extension
gating, and outlink collection from contained HTML."""

import io
import zipfile

import pytest


def _zip(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _run(spark, rows, declared=False):
    from coherencebot_spark.operators.parsezip import parse_zip

    schema = "url string, bytes binary" + (
        ", content_length long" if declared else "")
    df = spark.createDataFrame(rows, schema)
    out = parse_zip(df, declared_len_col="content_length" if declared
                    else None)
    return {r["url"]: r for r in out.collect()}


def test_text_entry_extraction(spark):
    # TestZipParser.testIt: text starts with "textfile.txt This is text
    # file number 1"
    blob = _zip({"textfile.txt": b"This is text file number 1"})
    got = _run(spark, [("http://h/test.zip", blob)])["http://h/test.zip"]
    assert got["status"] == "success"
    assert got["text"].startswith("textfile.txt This is text file number 1")
    assert got["text"].endswith(" ")  # per-entry trailing-space append


def test_entry_order_and_extension_gate(spark):
    blob = _zip({
        "a.txt": b"alpha",
        "noext": b"skipped",          # lastIndexOf('.') == -1 -> skipped
        "dir/": b"",                   # directory -> skipped
        "b.txt": b"beta",
    })
    got = _run(spark, [("u", blob)])["u"]
    assert got["text"] == "a.txt alpha b.txt beta "


def test_html_entry_outlinks_resolve_against_entry_url(spark):
    html = (b'<html><body><a href="page2.html">Next</a>'
            b'<a href="http://other.example/x">X</a>'
            b'<p>Body words</p></body></html>')
    blob = _zip({"docs/index.html": html})
    got = _run(spark, [("http://h/site.zip", blob)])["http://h/site.zip"]
    links = [(o["to_url"], o["anchor"]) for o in got["outlinks"]]
    # base = http://h/site.zip/docs/index.html (ZipTextExtractor:77-81)
    assert ("http://h/site.zip/docs/page2.html", "Next") in links
    assert ("http://other.example/x", "X") in links
    assert "docs/index.html" in got["text"] and "Body words" in got["text"]
    assert "<a" not in got["text"]


def test_truncation_gate(spark):
    blob = _zip({"a.txt": b"alpha"})
    rows = [("ok", blob, len(blob)), ("short", blob[:10], len(blob)),
            ("nolen", blob, None)]
    got = _run(spark, rows, declared=True)
    assert got["ok"]["status"] == "success"
    assert got["nolen"]["status"] == "success"
    assert got["short"]["status"] == "failed"
    assert got["short"]["message"].startswith("Content truncated at 10")
    assert got["short"]["text"] == "" and got["short"]["outlinks"] == []


def test_bad_archive_fails(spark):
    got = _run(spark, [("u", b"not a zip at all")])["u"]
    assert got["status"] == "failed"
    assert got["message"].startswith("Can't be handled as Zip document.")


def test_binary_entry_skipped_but_text_kept(spark):
    blob = _zip({"img.png": b"\x89PNG fake", "note.txt": b"hello"})
    got = _run(spark, [("u", blob)])["u"]
    # png has no parser here -> skipped like a ParseException (:106-110)
    assert got["text"] == "note.txt hello "
