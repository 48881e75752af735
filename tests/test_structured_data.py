"""any23 plugin tests — mirror TestAny23ParseFilter / TestAny23IndexingFilter
semantics (content-type gate, TreeSet sort/dedup, triple regex split,
keyToShortKey) plus the microdata value rules on fragments of the
reference's microdata_basic.html sample."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.functions.structured_data import (
    any23_indexing_filter,
    any23_parse_filter,
    extract_any23_triples,
)


def _triples(spark, html, url="http://example.com/a/page.html",
             extractors=("html-head-title", "html-head-meta",
                         "html-microdata")):
    df = spark.createDataFrame([(url, html)], "url string, html string")
    return df.select(extract_any23_triples(
        F.col("html"), F.col("url"), extractors).alias("t")) \
        .collect()[0]["t"]


def test_head_meta_and_title_triples(spark):
    html = ('<html><head><title> A  Title </title>'
            '<meta name="keywords" content="k1,k2">'
            '<meta name="author" content="Jo">'
            '<meta charset="utf-8"></head><body></body></html>')
    t = _triples(spark, html)
    u = "<http://example.com/a/page.html>"
    assert t == sorted(t)  # TreeSet order (Any23ParseFilter.java:76)
    assert f'{u} <http://purl.org/dc/terms/title> "A Title" .' in t
    assert f'{u} <http://vocab.sindice.net/any23#keywords> "k1,k2" .' in t
    assert f'{u} <http://vocab.sindice.net/any23#author> "Jo" .' in t
    # charset-only meta has no name/content pair -> no triple
    assert len(t) == 3


def test_treeset_dedup(spark):
    html = ('<meta name="a" content="x"><meta name="a" content="x">'
            '<meta name="a" content="y">')
    t = _triples(spark, html, extractors=("html-head-meta",))
    assert len(t) == 2  # duplicate line collapses in the set


def test_microdata_flat_items(spark):
    # fragments from the reference sample
    # (plugin/any23/sample/microdata_basic.html): result0/result2 shapes
    html = ('<div itemscope>'
            '<p>My name is <span itemprop="name">Elizabeth</span>.</p>'
            '</div>'
            '<div itemscope>'
            '<p>My name is <span itemprop="name">Neil</span>.</p>'
            '<p>My band is <span itemprop="band">Four Parts Water</span>.'
            '</p></div>')
    t = _triples(spark, html, extractors=("html-microdata",))
    md = "http://www.w3.org/1999/xhtml/microdata#"
    assert f'_:node0 <{md}name> "Elizabeth" .' in t
    assert f'_:node1 <{md}name> "Neil" .' in t
    assert f'_:node1 <{md}band> "Four Parts Water" .' in t
    assert len(t) == 3


def test_microdata_value_rules(spark):
    html = ('<div itemscope itemtype="http://schema.org/Person">'
            '<img itemprop="image" src="google-logo.png" alt="G">'
            '<time itemprop="birthday" datetime="2009-05-10">May 10</time>'
            '<a itemprop="url" href="/home">home</a>'
            '<meta itemprop="height" content="180">'
            '<data itemprop="n" value="42">forty-two</data>'
            '</div>')
    t = _triples(spark, html, url="http://example.com/a/page.html",
                 extractors=("html-microdata",))
    p = "http://schema.org/Person/"
    # img src resolves against the page directory; a href root-relative
    assert (f'_:node0 <{p}image> '
            '<http://example.com/a/google-logo.png> .') in t
    assert f'_:node0 <{p}url> <http://example.com/home> .' in t
    assert f'_:node0 <{p}birthday> "2009-05-10" .' in t
    assert f'_:node0 <{p}height> "180" .' in t
    assert f'_:node0 <{p}n> "42" .' in t


def test_content_type_gate(spark):
    # TestAny23ParseFilter.ignoreUnsupported: a pdf row keeps NO triples
    html = '<title>T</title>'
    df = spark.createDataFrame(
        [("u1", html, "text/html"), ("u2", html, "application/pdf")],
        "url string, html string, content_type string")
    out = any23_parse_filter(extractors=("html-head-title",),
                             ctype_col="content_type")(df)
    got = {r["url"]: r["any23_triples"] for r in out.collect()}
    assert len(got["u1"]) == 1 and got["u2"] == []


def test_indexing_filter_structured_data(spark):
    # TestAny23IndexingFilter.testAny23TriplesFields: the Zürich sameAs
    # triple splits into node/key/short_key/value
    triples = [
        '<http://dbpedia.org/resource/Zürich> '
        '<http://www.w3.org/2002/07/owl#sameAs> '
        '<http://sws.geonames.org/2657896/> .',
        'not a triple',  # unsupported format -> skipped (:105)
    ]
    df = spark.createDataFrame([("u", triples)],
                               "url string, any23_triples array<string>")
    out = any23_indexing_filter()(df).collect()[0]["structured_data"]
    assert len(out) == 1
    sd = out[0].asDict()
    assert sd["node"] == "<http://dbpedia.org/resource/Zürich>"
    assert sd["key"] == "<http://www.w3.org/2002/07/owl#sameAs>"
    assert sd["short_key"] == "sameAs"
    assert sd["value"] == "<http://sws.geonames.org/2657896/>"


def test_short_key_rules(spark):
    # keyToShortKey: <> stripped, last /-segment, last #-segment; bare
    # keys (no angle brackets) pass through the same splits
    cases = [
        ("<http://a/b/c#frag>", "frag"),
        ("<http://purl.org/dc/terms/title>", "title"),
        ("plain", "plain"),
    ]
    triples = [f"_:n {k} \"v\" ." for k, _ in cases]
    df = spark.createDataFrame([("u", triples)],
                               "url string, any23_triples array<string>")
    out = any23_indexing_filter()(df).collect()[0]["structured_data"]
    assert [e["short_key"] for e in out] == [s for _, s in cases]


def test_literal_escaping(spark):
    html = '<meta name="a" content="line1\nline2\t\\"></head>'
    t = _triples(spark, html, extractors=("html-head-meta",))
    assert t == ['<http://example.com/a/page.html> '
                 '<http://vocab.sindice.net/any23#a> '
                 '"line1\\nline2\\t\\\\" .']


def test_missing_triples_col_passthrough(spark):
    df = spark.createDataFrame([("u",)], "url string")
    assert any23_indexing_filter()(df).columns == ["url"]
