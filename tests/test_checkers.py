"""Checker-tool tests — URLFilterChecker's +/- prefix contract and
URLNormalizerChecker's normalize-or-empty contract."""

from coherencebot_spark.operators.tools import (
    check_url_filters,
    check_url_normalizers,
)


def test_filter_checker_prefixes(spark):
    from coherencebot_spark.functions.urls import (
        SuffixURLFilter, URLFilterChain)

    df = spark.createDataFrame(
        [("http://a.org/page.html",), ("http://a.org/file.exe",)],
        "line string")
    chain = URLFilterChain([SuffixURLFilter([".exe"])])
    out = {r["line"]: r["result"]
           for r in check_url_filters(df, chain).collect()}
    assert out["http://a.org/page.html"] == "+http://a.org/page.html"
    assert out["http://a.org/file.exe"] == "-http://a.org/file.exe"


def test_normalizer_checker(spark):
    df = spark.createDataFrame(
        [("HTTP://A.Org:80/./x.html",), ("not a url",)], "line string")
    rows = {r["line"]: r["result"]
            for r in check_url_normalizers(df).collect()}
    assert rows["HTTP://A.Org:80/./x.html"] == "http://a.org/x.html"
    # a malformed line answers SOMETHING stable (the basic normalizer
    # passes non-URLs through; a null outcome would answer "")
    assert isinstance(rows["not a url"], str)


def test_parser_checker_single_url(spark):
    """ParserChecker.java:143-301 — one url through the real fetch+parse
    stacks against the synthetic world backend."""
    from coherencebot_spark.operators.tools import check_parser

    out = check_parser(spark, "https://h1.example.org/p/1")
    assert out.startswith("fetching: https://h1.example.org/p/1")
    assert "contentType: image/" in out
    assert "signature: " in out
    assert "Outlinks: " in out
    assert "outlink: toUrl: " in out


def test_indexing_filters_checker_fields_and_discard(spark):
    from coherencebot_spark.operators.indexing import jexl_filter
    from coherencebot_spark.operators.tools import check_indexing_filters

    out = check_indexing_filters(spark, "https://h1.example.org/p/1")
    assert "parsing: https://h1.example.org/p/1" in out
    assert "\nhost :\th1.example.org" in out
    assert "\ndomain :\texample.org" in out
    assert "\ntstamp :\t" in out
    # a rejecting chain reports the reference's discard line (:288)
    out2 = check_indexing_filters(
        spark, "https://h1.example.org/p/1",
        filters=[jexl_filter("score > 1e9")])
    assert "Document discarded by indexing filter" in out2
