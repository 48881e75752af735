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
