"""HTML field-extraction parse filters (headings / parse-metatags /
microformats-reltag / creativecommons) — scenarios mirror the reference's
TestHeadingsParseFilter, TestMetatagParser and TestCCParseFilter."""

from pyspark.sql import functions as F

from coherencebot_spark.functions import html_fields as H


def _one(spark, html, url="http://www.foo.com/"):
    return spark.createDataFrame([(url, html)], "url string, html string")


# ---------------------------------------------------------------- headings


def test_headings_nested_nodes(spark):
    # TestHeadingsParseFilter.testExtractHeadingFromNestedNodes: the h1
    # value includes the inner span's text
    df = _one(spark, "<html><head><title>t</title></head><body>"
                     "<h1>header with <span>span element</span></h1>"
                     "</body></html>")
    out = H.headings_filter(tags=("h1", "h2"))(df).collect()[0]
    assert out["h1"] == ["header with span element"]
    assert out["h2"] == []


def test_headings_multivalued_and_first_only(spark):
    html = ("<body><h2 class='x'> One </h2><h2>Two\n&amp;\tThree</h2>"
            "<h2></h2></body>")
    df = _one(spark, html)
    mv = df.select(H.extract_headings(
        F.col("html"), "h2", multivalued=True).alias("h")).collect()[0]["h"]
    assert mv == ["One", "Two &amp; Three"]  # ws collapsed, no entities
    first = df.select(H.extract_headings(
        F.col("html"), "h2").alias("h")).collect()[0]["h"]
    assert first == ["One"]
    # non-multivalued stops at the FIRST element even when it is empty
    # (HeadingsParseFilter.java:100-103 breaks before looking further)
    df2 = _one(spark, "<h1></h1><h1>late</h1>")
    assert df2.select(H.extract_headings(F.col("html"), "h1")
                      .alias("h")).collect()[0]["h"] == []


# ---------------------------------------------------------------- metatags


def test_metatags_general_multivalue_and_httpequiv_lastwins(spark):
    html = ("<head>"
            '<meta name="Keywords" content="k1, k2">'
            "<meta name='keywords' content='k3'>"
            '<meta http-equiv="Content-Type" content="text/html">'
            '<meta http-equiv="content-type" content="text/plain">'
            '<meta name="empty" content="">'
            '<meta content="orphan">'
            "</head>")
    m = dict(_one(spark, html).select(
        H.extract_metatags(F.col("html")).alias("m")).collect()[0]["m"])
    # name= tags append every occurrence (Metadata.add), keys lowercased;
    # http-equiv keys keep the LAST value (Properties.setProperty)
    assert m == {"metatag.keywords": "k1, k2\tk3",
                 "metatag.content-type": "text/plain"}


def test_metatags_name_subset_and_merge(spark):
    html = ('<meta name="description" content="d">'
            '<meta name="author" content="a">')
    df = _one(spark, html).withColumn(
        "parse_meta",
        F.create_map(F.lit("metatag.description"), F.lit("stale"),
                     F.lit("other"), F.lit("keep")))
    out = H.metatags_filter(names=("Description",))(df).collect()[0]
    m = dict(out["parse_meta"])
    # subset filter is case-insensitive; re-extracted value replaces the
    # stale one (NUTCH-1559: extract from the document, not prior meta);
    # unrelated keys survive
    assert m == {"metatag.description": "d", "other": "keep"}


# ----------------------------------------------------------------- reltag


def test_reltag_absolute_decode_sorted_distinct(spark):
    html = ('<a href="http://ex.org/tags/Foo%20Bar" rel="tag">a</a>'
            '<a href="/tags/relative" rel="tag">skip: not absolute</a>'
            '<a href="http://ex.org/t/alpha" rel="TAG">ci rel value</a>'
            '<a href="http://ex.org/t/alpha" rel="tag">dup</a>'
            '<a href="http://ex.org/t/" rel="tag">empty tag</a>'
            '<a href="http://ex.org/t/beta">no rel</a>')
    out = H.reltag_filter()(_one(spark, html)).collect()[0]
    assert out["tag"] == ["Foo Bar", "alpha"]


# ---------------------------------------------------------- creativecommons


def test_cc_anchor_page(spark):
    # TestCCParseFilter: anchor.html → (licenses url, "a", no work type)
    html = ('<body><a href="http://creativecommons.org/licenses/by-nc-sa/1.0">'
            '<img src="http://creativecommons.org/images/public/somerights.gif">'
            "</a></body>")
    cc = _one(spark, html).select(
        H.extract_cc(F.col("html"), F.col("url")).alias("cc")
    ).collect()[0]["cc"]
    assert cc["license_url"] == \
        "http://creativecommons.org/licenses/by-nc-sa/1.0"
    assert cc["license_loc"] == "a" and cc["work_type"] is None


def test_cc_rel_beats_anchor_and_is_case_sensitive(spark):
    # rel.html → "rel"; the value match is case-SENSITIVE (.equals)
    html = ('<a href="http://creativecommons.org/licenses/by/3.0/">plain</a>'
            '<a rel="license" '
            'href="http://creativecommons.org/licenses/by-nc/2.0">CC</a>')
    cc = _one(spark, html).select(
        H.extract_cc(F.col("html"), F.col("url")).alias("cc")
    ).collect()[0]["cc"]
    assert cc["license_url"] == \
        "http://creativecommons.org/licenses/by-nc/2.0"
    assert cc["license_loc"] == "rel"
    html2 = ('<a rel="LICENSE" '
             'href="http://creativecommons.org/licenses/by-nc/2.0">CC</a>')
    cc2 = _one(spark, html2).select(
        H.extract_cc(F.col("html"), F.col("url")).alias("cc")
    ).collect()[0]["cc"]
    assert cc2["license_loc"] == "a"  # wrong-case rel → plain anchor arm


def test_cc_rdf_comment_wins_and_work_type(spark):
    # rdf.html shape: RDF inside an HTML comment, default-ns License
    # element, dc:type work resource → ("rdf", "text"); the RDF subject
    # beats both anchors
    html = ("<body>"
            '<a href="http://creativecommons.org/licenses/by-nc/1.0">L</a>'
            "<!--\n"
            '<rdf:RDF xmlns="http://web.resource.org/cc/"\n'
            '    xmlns:dc="http://purl.org/dc/elements/1.1/"\n'
            '    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
            '<Work rdf:about="http://boingboing.net">\n'
            '   <dc:type rdf:resource="http://purl.org/dc/dcmitype/Text" />\n'
            '   <license rdf:resource="http://creativecommons.org/licenses/'
            'by-nc/1.0" />\n'
            "</Work>\n"
            '<License rdf:about="http://creativecommons.org/licenses/'
            'by-nc/1.0">\n'
            '   <permits rdf:resource="http://web.resource.org/cc/'
            'Reproduction" />\n'
            "</License>\n"
            "</rdf:RDF>\n"
            "-->"
            "</body>")
    cc = _one(spark, html).select(
        H.extract_cc(F.col("html"), F.col("url")).alias("cc")
    ).collect()[0]["cc"]
    assert cc["license_url"] == \
        "http://creativecommons.org/licenses/by-nc/1.0"
    assert cc["license_loc"] == "rdf" and cc["work_type"] == "text"


def test_cc_features_field(spark):
    # CCIndexingFilter.addUrlFeatures: license=<url>, path tokens after
    # "licenses" split on /-, meta=<loc>, work type
    html = ('<a rel="license" '
            'href="http://creativecommons.org/licenses/by-nc/2.0">CC</a>')
    feats = H.cc_filter()(_one(spark, html)).collect()[0]["cc"]
    assert feats == [
        "license=http://creativecommons.org/licenses/by-nc/2.0",
        "by", "nc", "2.0", "meta=rel"]
    # root-relative href resolves against the page origin; https scheme
    # fails the reference's literal "http" protocol check
    html2 = ('<a href="/licenses/by/1.0/">rel</a>')
    feats2 = H.cc_filter()(_one(
        spark, html2, url="http://creativecommons.org/deed")).collect()[0]["cc"]
    assert feats2[0] == "license=http://creativecommons.org/licenses/by/1.0/"
    html3 = ('<a href="https://creativecommons.org/licenses/by/1.0/">s</a>')
    feats3 = H.cc_filter()(_one(spark, html3)).collect()[0]["cc"]
    assert feats3 == []


# --------------------------------------------------------- parsefilter-regex


def test_regex_parse_filter_mirrors_reference_tests(spark):
    # TestRegexParseFilter.java:34-76 with the shipped sample rules
    # (first html h1 / second text blablabla)
    rules = H.parse_regex_rules(
        "# comment\n\nfirst\thtml\th1\nsecond\ttext\tblablabla\n"
        "bad rule\nmis src rx\n")
    assert rules == [("first", "html", "h1"), ("second", "text", "blablabla"),
                     ("mis", "src", "rx")]
    df = spark.createDataFrame(
        [("http://nutch.apache.org/",
          "<body><html><h1>nutch</h1><p>this is the extracted text"
          " blablabla</p></body></html>",
          "nutch this is the extracted text blablabla"),
         ("http://no.example.org/",
          "<body><html><h2>nutch</h2><p>no bla</p></body></html>",
          "nutch this is the extracted text bla")],
        "url string, html string, text string")
    out = {r.url: dict(r.parse_meta) for r in
           H.regex_parse_filter(rules)(df).collect()}
    assert out["http://nutch.apache.org/"] == {
        "first": "true", "second": "true", "mis": "false"}
    # negative case: the h2 page has no 'h1' substring anywhere in the
    # html, and the text lacks 'blablabla'; the misconfigured source is
    # always false
    assert out["http://no.example.org/"] == {
        "first": "false", "second": "false", "mis": "false"}


def test_regex_parse_filter_merges_existing_meta(spark):
    df = spark.createDataFrame(
        [("u1", "<h1>x</h1>", "t", {"keep": "v", "first": "stale"})],
        "url string, html string, text string, parse_meta map<string,string>")
    out = H.regex_parse_filter([("first", "html", "h1")])(df).collect()[0]
    meta = dict(out.parse_meta)
    # existing unrelated keys survive; the rule's field is overwritten
    assert meta == {"keep": "v", "first": "true"}


def test_debug_filter_records_dom(spark):
    from coherencebot_spark.functions.html_fields import debug_filter

    df = spark.createDataFrame(
        [("u1", "<html><b>x</b></html>", {"k": "v", "DOM": "stale"}),
         ("u2", None, None)],
        "url string, html string, parse_meta map<string,string>")
    out = {r["url"]: r["parse_meta"]
           for r in debug_filter()(df).collect()}
    assert out["u1"]["DOM"] == "<html><b>x</b></html>"
    assert out["u1"]["k"] == "v"          # other keys kept
    assert out["u2"]["DOM"] == ""         # null html → empty dump
