"""Fork parse filters: parsefilter-outlinks / -archive / parse-translate.

Anchor/descendant cases mirror
``parsefilter-outlinks/src/test/.../TestOutlinkParseFilter.java`` — with
one deliberate divergence: that test expects a ``.pdf`` outlink kept
with NO ``org.domains`` metadata, but ``OutlinkParseFilter.java:200-216``
unambiguously rejects it (the allowed-domains loop is empty and falls
through to ``return false``).  We match the source.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.operators.parsefilters import (
    archive_key_col,
    archive_parse_filter,
    outlink_parse_filter,
    parse_anchor_rules,
    translate_parse_filter,
)

OUTLINK_SCHEMA = ("url string, metadata map<string,string>, "
                  "outlinks array<struct<to_url:string, anchor:string>>")

BAD_ANCHORS = ["# this is a comment", "", "reject", ""]


def _kept(spark, rows, **filter_kwargs):
    df = spark.createDataFrame(rows, OUTLINK_SCHEMA)
    out = outlink_parse_filter(**filter_kwargs)(df)
    return {
        r["url"]: [o["to_url"] for o in r["outlinks"]]
        for r in out.collect()
    }


def test_anchor_filter_mirror(spark):
    # TestOutlinkParseFilter.testOutlinkAnchorFilter: 8 outlinks in, only
    # /keep survives (case/whitespace/punctuation-insensitive match, and
    # the second /test6 copy dies because its toUrl was excluded once)
    base = "http://nutch.apache.org/"
    links = [
        (base + "test1", "Reject"),
        (base + "test2", "reject"),
        (base + "test3", "   Reject  \n"),
        (base + "test4", "?.Reject"),
        (base + "test5", "Reject!#"),
        (base + "test6", "@*Reject!#"),
        (base + "test6", "Same page as previous - Should not be kept"),
        (base + "keep", "Dont Reject"),
    ]
    kept = _kept(spark, [(base, None, links)],
                 approve_anchors=True, anchor_rules=BAD_ANCHORS)
    assert kept[base] == [base + "keep"]
    assert parse_anchor_rules(BAD_ANCHORS) == ["reject"]


def test_descendant_filter_mirror(spark):
    url = "http://nutch.apache.org/docs/publications/"
    links = [
        ("http://nutch.apache.org/docs/sibling", "a"),
        ("http://nutch.apache.org/docs", "b"),
        ("http://nutch.apache.org/docs/publications/child", "c"),
        # source-semantics: .pdf outside the descendant subtree needs an
        # org.domains entry; none here -> rejected
        ("http://nutch.apache.org/docs/wp-content/child.pdf", "d"),
    ]
    kept = _kept(spark, [(url, None, links)], require_descendants=True)
    assert kept[url] == ["http://nutch.apache.org/docs/publications/child"]


def test_descendant_pdf_allowed_domains(spark):
    url = "https://org.example.com/reports/"
    meta = {"org.domains": "example.com;bucket.s3.amazonaws.com"}
    links = [
        # registered-domain match
        ("https://cdn.example.com/files/a.pdf", "a"),
        # exact-host match (the CDN case called out in the source)
        ("https://bucket.s3.amazonaws.com/b.pdf", "b"),
        # pdf on an unlisted domain
        ("https://elsewhere.net/c.pdf", "c"),
        # non-pdf on an allowed domain is still not a descendant
        ("https://cdn.example.com/files/page.html", "d"),
        # descendant keeps working alongside the pdf exception
        ("https://org.example.com/reports/2024/e", "e"),
    ]
    kept = _kept(spark, [(url, meta, links)], require_descendants=True)
    assert kept[url] == [
        "https://cdn.example.com/files/a.pdf",
        "https://bucket.s3.amazonaws.com/b.pdf",
        "https://org.example.com/reports/2024/e",
    ]


def test_descendant_seed_meta_and_backslashes(spark):
    # collection.seed overrides the page url as the descendant root, and
    # backslashes normalise to '/' on both sides (:183-188)
    url = "https://h.example.org/deep/page"
    meta = {"collection.seed": "https://h.example.org\\docs\\"}
    links = [
        ("https://h.example.org\\docs\\child", "a"),
        ("https://h.example.org/docs/other", "b"),
        ("https://h.example.org/deep/sibling", "c"),
        ("not a url", "d"),
    ]
    kept = _kept(spark, [(url, meta, links)], require_descendants=True)
    assert kept[url] == [
        "https://h.example.org\\docs\\child",
        "https://h.example.org/docs/other",
    ]


def test_descendant_malformed_seed_rejects_all(spark):
    meta = {"collection.seed": "nonsense",
            "org.domains": "example.com"}
    links = [("https://cdn.example.com/a.pdf", "a"),
             ("https://x.example.com/b", "b")]
    kept = _kept(spark, [("https://x.example.com/", meta, links)],
                 require_descendants=True)
    assert kept["https://x.example.com/"] == []


def test_archive_key_derivation(spark):
    rows = [
        ("https://docs.example.org/files/report.pdf", "abcd12"),
        ("https://docs.example.org/files/report.pdf", None),
        ("https://hostonly.example.org", "ffff00"),   # no path -> no-host
        ("http://h.example.org:8080/a?b=c", "dd00dd"),  # port stays in
    ]
    df = spark.createDataFrame(rows, "url string, digest string")
    got = [r["k"] for r in df.select(
        archive_key_col(F.col("url"), F.col("digest")).alias("k")).collect()]
    assert got == [
        "file/coherencebot-archive/docs.example.org/abcd12.pdf",
        "file/coherencebot-archive/docs.example.org/files-report-pdf.pdf",
        "file/coherencebot-archive/no-host/ffff00.pdf",
        "file/coherencebot-archive/h.example.org:8080/dd00dd.pdf",
    ]


class DirStore:
    """Filesystem-backed stand-in for the S3 client: writes from Spark's
    Python WORKER processes must be visible to the driver, so a plain
    dict won't do — the pickled closure mutates a copy."""

    def __init__(self, root):
        self.root = str(root)

    def _p(self, key):
        import os
        return os.path.join(self.root, key.replace("/", "%2F"))

    def exists(self, key):
        import os
        return os.path.exists(self._p(key))

    def put(self, key, data):
        with open(self._p(key), "wb") as f:
            f.write(data)


def test_archive_parse_filter(spark, tmp_path):
    pre = "file/coherencebot-archive/"
    store = DirStore(tmp_path)
    store.put(pre + "h1.example.org/dup1.pdf", b"")
    rows = [
        ("https://h1.example.org/a.pdf", "application/pdf", b"%PDF-new",
         "new1"),
        ("https://h1.example.org/b.pdf", "application/pdf", b"%PDF-dup",
         "dup1"),                                      # already archived
        ("https://h1.example.org/c.pdf", "application/pdf", b"", "zero1"),
        ("https://h1.example.org/d.html", "text/html", b"<html>", "html1"),
    ]
    df = spark.createDataFrame(
        rows, "url string, mime string, bytes binary, digest string")
    out = archive_parse_filter(store, bucket="test-bucket")(df)
    meta = {r["url"]: r["parse_meta"] for r in out.collect()}
    assert meta["https://h1.example.org/a.pdf"] == {
        "file.url_archive":
            "s3://test-bucket/" + pre + "h1.example.org/new1.pdf"}
    # existing key: meta set, payload NOT rewritten
    assert meta["https://h1.example.org/b.pdf"] == {
        "file.url_archive":
            "s3://test-bucket/" + pre + "h1.example.org/dup1.pdf"}
    # zero bytes / unsupported mime: no meta
    assert meta["https://h1.example.org/c.pdf"] == {}
    assert meta["https://h1.example.org/d.html"] == {}
    with open(store._p(pre + "h1.example.org/new1.pdf"), "rb") as f:
        assert f.read() == b"%PDF-new"
    assert not store.exists(pre + "h1.example.org/zero1.pdf")


def _upper_translator(texts, langs):
    # deterministic per-line "translation": uppercase, but leave lines
    # containing 'same' unchanged to exercise the not-saved rule
    out = []
    for t in texts:
        out.append("\n".join(
            ln if "same" in ln else ln.upper()
            for ln in t.split("\n")))
    return out


def test_translate_parse_filter(spark):
    fmap = {"title": "title.translated", "description": "desc.translated"}
    rows = [
        # meta title + description, non-target lang -> both translated
        ("u1", "fr", "ignored",
         {"title": "le titre", "description": "la  description"}),
        # title falls back to the title COLUMN when meta lacks it
        ("u2", "de", "der titel", {"description": "die beschreibung"}),
        # already target language -> untouched
        ("u3", "en", "the title", {"description": "the description"}),
        # translation identical to source -> not saved
        ("u4", "es", None, {"title": "same text"}),
        # nothing to translate
        ("u5", "fr", None, {}),
    ]
    df = spark.createDataFrame(
        rows, "url string, lang string, title string, "
              "parse_meta map<string,string>")
    out = translate_parse_filter(_upper_translator, fmap)(df)
    meta = {r["url"]: dict(r["parse_meta"]) for r in out.collect()}
    assert meta["u1"] == {"title": "le titre",
                          "description": "la  description",
                          "title.translated": "LE TITRE",
                          "desc.translated": "LA  DESCRIPTION"}
    assert meta["u2"] == {"description": "die beschreibung",
                          "title.translated": "DER TITEL",
                          "desc.translated": "DIE BESCHREIBUNG"}
    assert meta["u3"] == {"description": "the description"}
    assert meta["u4"] == {"title": "same text"}
    assert meta["u5"] == {}


def _len_translator(texts, langs):
    # echoes one X per input char, making the batch length observable
    # from the driver (workers are separate processes — a recorder list
    # would not propagate back)
    return ["X" * len(t) for t in texts]


def test_translate_max_length_cap(spark):
    df = spark.createDataFrame(
        [("u1", "fr", None, {"title": "t" * 100})],
        "url string, lang string, title string, "
        "parse_meta map<string,string>")
    out = translate_parse_filter(
        _len_translator, {"title": "title.translated"}, max_length=50)(df)
    meta = dict(out.collect()[0]["parse_meta"])
    # substring(0, max-1) like TranslateParser.java:106-108
    assert meta["title.translated"] == "X" * 49


# --- parse-thumb ----------------------------------------------------------


def test_thumbnail_key_derivation(spark):
    from coherencebot_spark.operators.parsefilters import thumbnail_key_col

    rows = [
        ("https://docs.example.org/files/Report V2.pdf",),
        ("http://h.example.org:8080/a?b=c",),
        # no path: unlike the archive filter's no-host bucket, parse-thumb
        # collapses to <urlNoProto>/<slug(urlNoProto)>.png (:133-135)
        ("https://hostonly.example.org",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [r["k"] for r in df.select(
        thumbnail_key_col(F.col("url")).alias("k")).collect()]
    assert got == [
        "docs.example.org/files-report-v2-pdf.png",
        "h.example.org:8080/a-b-c.png",
        "hostonly.example.org/hostonly-example-org.png",
    ]


def _png_renderer(urls):
    return [b"PNG:" + u.encode() for u in urls]


def _empty_renderer(urls):
    return [b"" for _ in urls]


def test_thumbnail_parse_filter(spark, tmp_path):
    from coherencebot_spark.operators.parsefilters import (
        thumbnail_parse_filter)

    store = DirStore(tmp_path)
    # pre-existing key: must NOT re-render, must still set meta (:150-158)
    store.put("h1.example.org/old.png", b"OLD")
    big = b"%PDF" + b"x" * 4000
    rows = [
        ("https://h1.example.org/a.pdf", "application/pdf", big, None),
        ("https://h1.example.org/old", "application/pdf", big, None),
        # gates: wrong mime / too small / meta precedence (:79-117)
        ("https://h1.example.org/page.html", "text/html", big, None),
        ("https://h1.example.org/tiny.pdf", "application/pdf", b"%PDF", None),
        ("https://h1.example.org/og.pdf", "application/pdf", big,
         {"og:image": "https://cdn/x.png"}),
    ]
    df = spark.createDataFrame(
        rows, "url string, mime string, bytes binary, "
              "parse_meta map<string,string>")
    out = thumbnail_parse_filter(_png_renderer, store, "thumbs")(df)
    meta = {r["url"]: dict(r["parse_meta"] or {}) for r in out.collect()}

    assert meta["https://h1.example.org/a.pdf"]["thumbnail"] == \
        "https://thumbs.s3.amazonaws.com/h1.example.org/a-pdf.png"
    assert meta["https://h1.example.org/a.pdf"]["thumbnail.url_archive"] \
        == "s3://thumbs/h1.example.org/a-pdf.png"
    assert store.exists("h1.example.org/a-pdf.png")

    # existing key: meta set, stored object untouched
    assert meta["https://h1.example.org/old"]["thumbnail"].endswith(
        "h1.example.org/old.png")
    p = store._p("h1.example.org/old.png")
    with open(p, "rb") as f:
        assert f.read() == b"OLD"

    # gated rows: no thumbnail meta, other meta preserved untouched
    assert "thumbnail" not in meta["https://h1.example.org/page.html"]
    assert "thumbnail" not in meta["https://h1.example.org/tiny.pdf"]
    assert meta["https://h1.example.org/og.pdf"] == {
        "og:image": "https://cdn/x.png"}


def test_thumbnail_zero_byte_render_sets_nothing(spark, tmp_path):
    from coherencebot_spark.operators.parsefilters import (
        thumbnail_parse_filter)

    store = DirStore(tmp_path)
    big = b"%PDF" + b"x" * 4000
    df = spark.createDataFrame(
        [("https://h1.example.org/z.pdf", "application/pdf", big, None)],
        "url string, mime string, bytes binary, "
        "parse_meta map<string,string>")
    out = thumbnail_parse_filter(_empty_renderer, store, "thumbs")(df)
    meta = dict(out.collect()[0]["parse_meta"] or {})
    assert "thumbnail" not in meta                 # :199-201
    assert not store.exists("h1.example.org/z-pdf.png")


def test_thumbnail_bytes_stay_out_of_the_python_stage(spark, tmp_path):
    """The render stage must run on the narrow (url, key) projection —
    the payload column may not appear in any ArrowEvalPython/MapInPandas
    input, and may not cross an Exchange."""
    from coherencebot_spark.operators.parsefilters import (
        thumbnail_parse_filter)

    store = DirStore(tmp_path)
    big = b"%PDF" + b"x" * 4000
    df = spark.createDataFrame(
        [("https://h1.example.org/a.pdf", "application/pdf", big, None)],
        "url string, mime string, bytes binary, "
        "parse_meta map<string,string>")
    out = thumbnail_parse_filter(_png_renderer, store, "thumbs")(df)
    p = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("MapInPandas", "Exchange"):
        for block in p.split(marker)[1:]:
            first_line = block.splitlines()[0]
            assert "bytes" not in first_line, \
                f"payload bytes reach {marker}: {first_line}"
