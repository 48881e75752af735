"""Indexing-filter chain tests (operators/indexing.py).

Each case mirrors a reference plugin test or a documented config rule:
TestBasicIndexingFilter.java, TestAnchorIndexingFilter.java,
MimeTypeIndexingFilterTest.java, TestOrgIndexerTest.java, and the
CriteriaIndexer/MoreIndexingFilter semantics read from source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coherencebot_spark.operators import indexing as ix

DOC_SCHEMA = (
    "url string, repr_url string, fetch_time long, text string, "
    "title string, anchors array<string>, inlink_urls array<string>, "
    "outlink_urls array<string>, db_meta map<string,string>, "
    "parse_meta map<string,string>, content_meta map<string,string>"
)


def _doc(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _row(url="http://www.example.org/p.html", repr_url=None, fetch_time=1000,
         text="body text", title="T", anchors=None, inlinks=None,
         outlinks=None, db=None, parse=None, content=None):
    return (url, repr_url, fetch_time, text, title, anchors, inlinks,
            outlinks, db or {}, parse or {}, content or {})


# ------------------------------------------------------------ index-basic


def test_basic_fields_and_title_rules(spark):
    doc = _doc(spark, [
        _row(title="x" * 150),                      # truncated to 100
        _row(url="http://h2.org/a", title=""),      # empty title → null
        _row(url="http://h3.org/a",
             repr_url="http://repr.h3.org/a"),      # repr wins
        _row(url="not a url", title="t"),           # malformed → dropped
    ])
    out = ix.basic_filter(max_title_length=100, add_domain=True)(doc)
    rows = {r["url"]: r for r in out.collect()}
    assert "not a url" not in rows and len(rows) == 3
    r0 = rows["http://www.example.org/p.html"]
    assert len(r0["title"]) == 100
    assert r0["host"] == "www.example.org"
    assert r0["domain"] == "example.org"
    assert r0["tstamp"] == 1000
    # NUTCH-1004: zero-length title is not indexed
    assert rows["http://h2.org/a"]["title"] is None
    r2 = rows["http://h3.org/a"]
    assert r2["doc_url"] == "http://repr.h3.org/a"
    assert r2["host"] == "repr.h3.org"


def test_basic_content_truncation_and_clean(spark):
    doc = _doc(spark, [_row(text="abcdef�gh")])
    out = ix.basic_filter(max_content_length=7)(doc)
    # truncate first (Java substring on raw content), then strip U+FFFD
    assert out.collect()[0]["content"] == "abcdef"


# ----------------------------------------------------------- index-anchor


def test_anchor_dedup_keeps_first_case_insensitive(spark):
    # TestAnchorIndexingFilter.java: [anchor1, anchor2, anchor1] dedups
    doc = _doc(spark, [_row(anchors=["Anchor One", "anchor one", "B"])])
    dd = ix.anchor_filter(deduplicate=True)(doc).collect()[0]["anchor"]
    assert dd == ["Anchor One", "B"]
    raw = ix.anchor_filter(deduplicate=False)(doc).collect()[0]["anchor"]
    assert raw == ["Anchor One", "anchor one", "B"]


def test_anchor_dedup_null_element_does_not_poison(spark):
    # a null anchor element must not NULL-poison the dedup predicate and
    # drop every anchor after it (three-valued logic in exists())
    doc = _doc(spark, [_row(anchors=[None, "Home", "home"])])
    dd = ix.anchor_filter(deduplicate=True)(doc).collect()[0]["anchor"]
    assert dd == [None, "Home"]


# --------------------------------------------------------- index-metadata


def test_metadata_promotion_and_mv_split(spark):
    doc = _doc(spark, [_row(db={"k": "dbv"}, parse={"k": "pv", "lang": "en, fr,"},
                            content={"c": "  "})])
    out = ix.metadata_filter(db_keys=["k"], parse_keys=["k", "lang"],
                             content_keys=["c"], separator=",",
                             mv_fields=["lang"])(doc)
    r = out.collect()[0]
    assert r["k"] == ["dbv", "pv"]        # db then parse append order
    assert r["lang"] == ["en", "fr"]      # split + trim + drop empties
    assert r["c"] == []                   # blank-only value dropped


# ------------------------------------------------------------- index-more


def test_more_time_length_type(spark):
    doc = _doc(spark, [
        _row(content={"Last-Modified": "Tue, 04 Feb 2020 08:00:00 GMT",
                      "Content-Length": " 42 ",
                      "Content-Type": "Application/PDF; q=1"}),
        _row(url="http://h.org/x.png"),   # no headers → ext detection
    ])
    out = ix.more_filter()(doc)
    rows = {r["url"]: r for r in out.collect()}
    r0 = rows["http://www.example.org/p.html"]
    assert r0["last_modified_ms"] == 1580803200000
    assert r0["date_ms"] == 1580803200000
    assert r0["content_length"] == "42"
    assert r0["type"] == ["application/pdf", "application", "pdf"]
    r1 = rows["http://h.org/x.png"]
    assert r1["last_modified_ms"] is None
    assert r1["date_ms"] == 1000          # fetch-time fallback
    assert r1["type"][0] == "image/png"


def test_more_title_reset_only_when_absent(spark):
    disp = {"Content-Disposition": 'inline; filename="foo.ppt"'}
    doc = _doc(spark, [_row(title=None, content=disp),
                       _row(url="http://h.org/b", title="Keep", content=disp)])
    out = ix.more_filter()(doc)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["http://www.example.org/p.html"]["title"] == "foo.ppt"
    assert rows["http://h.org/b"]["title"] == "Keep"


def test_more_mime_mapping(spark):
    doc = _doc(spark, [_row(content={"Content-Type": "text/html"})])
    mapped = ix.more_filter(mime_map={"text/html": "web/page"})(doc)
    assert mapped.collect()[0]["type"] == ["web/page", "web", "page"]
    aside = ix.more_filter(mime_map={"text/html": "web/page"},
                           map_field="mapped_type")(doc).collect()[0]
    assert aside["type"][0] == "text/html"
    assert aside["mapped_type"] == "web/page"


# ----------------------------------------------------------- index-static


def test_static_fields(spark):
    doc = _doc(spark, [_row()])
    out = ix.static_filter("collection:a b,source:bot")(doc).collect()[0]
    assert out["collection"] == ["a", "b"]
    assert out["source"] == ["bot"]


# ------------------------------------------------------------ index-links


def test_links_host_ignore_and_hosts_only(spark):
    doc = _doc(spark, [_row(
        url="http://www.example.org/p.html",
        outlinks=["http://www.example.org/o1", "http://third.org/o2",
                  "bogus", "http://third.org/o3"],
        inlinks=["http://WWW.EXAMPLE.ORG/in", "http://other.org/in2"])])
    out = ix.links_filter(ignore_outlinks_host=True,
                          ignore_inlinks_host=True)(doc).collect()[0]
    assert out["outlinks"] == ["http://third.org/o2", "http://third.org/o3"]
    assert out["inlinks"] == ["http://other.org/in2"]

    hosts = ix.links_filter(hosts_only=True)(doc).collect()[0]
    assert hosts["outlinks"] == ["www.example.org", "third.org"]
    assert hosts["inlinks"] == ["www.example.org", "other.org"]


# -------------------------------------------------------- mimetype-filter


def test_mimetype_gate_modes(spark):
    doc = _doc(spark, [
        _row(content={"Content-Type": "text/html"}),
        _row(url="http://h.org/b.pdf",
             content={"Content-Type": "application/pdf"}),
    ])
    typed = ix.more_filter()(doc)
    # accept_mode: listed prefixes are BLOCKED (MimeTypeIndexingFilter:92-101)
    blocked = ix.mimetype_filter(["text/"], accept_mode=True)(typed)
    assert [r["url"] for r in blocked.collect()] == ["http://h.org/b.pdf"]
    allowed = ix.mimetype_filter(["text/"], accept_mode=False)(typed)
    assert [r["url"] for r in allowed.collect()] == \
        ["http://www.example.org/p.html"]


# ------------------------------------------------------- index-jexl-filter


def test_jexl_predicate(spark):
    doc = _doc(spark, [_row(fetch_time=5), _row(url="http://h.org/b",
                                                fetch_time=50)])
    out = ix.jexl_filter("fetch_time > 10 and url like 'http://%'")(doc)
    assert [r["url"] for r in out.collect()] == ["http://h.org/b"]


# ---------------------------------------------------- index-criteria (fork)


def _crit_doc(spark, title=None, heading=None, anchors=None, text_len=5000,
              inlinks=None, authors=None, te=None, he=None):
    df = _doc(spark, [_row(text="x" * text_len, title=title,
                           anchors=None, inlinks=None)])
    df = df.withColumn("anchor", F.lit(anchors).cast("array<string>"))
    df = df.withColumn("heading", F.lit(heading).cast("string"))
    df = df.withColumn("inlinks", F.lit(inlinks).cast("array<string>"))
    df = df.withColumn("author", F.lit(authors).cast("array<string>"))
    df = df.withColumn("title_english", F.lit(te).cast("string"))
    df = df.withColumn("heading_english", F.lit(he).cast("string"))
    return df


def test_criteria_min_length_gate(spark):
    short = _crit_doc(spark, title="A Good Title Here", text_len=10)
    assert ix.criteria_filter(min_length=4000)(short).count() == 0
    assert ix.criteria_filter(min_length=10)(short).count() == 1


def test_criteria_title_vs_heading(spark):
    # strong title (>7 words, mixed case) beats heading
    strong = "The Quarterly Review of Economic Policy in Northern Regions"
    r = ix.criteria_filter(min_length=1)(
        _crit_doc(spark, title=strong, heading="Short Head")).collect()[0]
    assert r["title"] == strong and r["title_algorithm"] == "title"
    # weak title, strong heading → heading (algorithm records the source)
    strong_h = ("Annual Report on the State of Global Water Resources"
                " [from PDF text]")
    r = ix.criteria_filter(min_length=1)(
        _crit_doc(spark, title="file", heading=strong_h)).collect()[0]
    assert r["title"].endswith("Water Resources")
    assert r["title_algorithm"] == "from PDF text"
    # both weak → more words wins
    r = ix.criteria_filter(min_length=1)(
        _crit_doc(spark, title="one two three", heading="a b")).collect()[0]
    assert r["title"] == "one two three"


def test_criteria_title_removes_extension_and_ctrl(spark):
    r = ix.criteria_filter(min_length=1)(
        _crit_doc(spark, title="annual_report 2020.pdf")).collect()[0]
    assert r["title"] == "annual_report 2020"
    # >4-char suffix is not an extension
    r = ix.criteria_filter(min_length=1)(
        _crit_doc(spark, title="release v1.20210")).collect()[0]
    assert r["title"] == "release v1.20210"


def test_criteria_anchor_candidate_rules(spark):
    # boilerplate + single-word anchors skipped; first longest kept
    r = ix.criteria_filter(min_length=1)(_crit_doc(
        spark, heading="Hmm Head",
        anchors=["Download the full report now", "Solo",
                 "A Moderately Long Anchor Text", "tiny words"])).collect()[0]
    # "Download..." contains 'download' (boilerplate) → skipped;
    # candidates: "A Moderately Long Anchor Text" (29) vs "tiny words" (10)
    assert r["title"] == "A Moderately Long Anchor Text"
    assert r["title_algorithm"] == "anchor"


def test_criteria_no_candidates_fallback(spark):
    r = ix.criteria_filter(min_length=1)(_crit_doc(spark)).collect()[0]
    assert r["title"] == "no title" and r["title_algorithm"] == "no options"


def test_criteria_translated_title_follows_algorithm(spark):
    r = ix.criteria_filter(min_length=1)(_crit_doc(
        spark, title="file", heading="The Long Heading Chosen Over It All"
        " By Word Count", te="TE", he="HE")).collect()[0]
    assert r["title_algorithm"] == "from PDF fonts"
    assert r["title_english"] == "HE"
    r = ix.criteria_filter(min_length=1)(_crit_doc(
        spark, title="A Title", te="TE", he="HE")).collect()[0]
    assert r["title_algorithm"] == "title" and r["title_english"] == "TE"


def test_criteria_authors_and_referrer(spark):
    r = ix.criteria_filter(min_length=1)(_crit_doc(
        spark, title="A Title",
        authors=["Mary Jane Watson", "x y", "Solo", ""],
        inlinks=["http://h.org/", "http://h.org/docs/file.pdf",
                 "http://h.org/publications/2020/reports",
                 "http://h.org/a-very-long-path-indeed/even-longer"])
    ).collect()[0]
    # multi-word names only; 'x y' has the space at position 1 (Java
    # indexOf(" ") > 1 fails) → dropped
    assert r["author"] == ["Mary Jane Watson"]
    # homepage (path '/') and .pdf inlinks skipped; publication-section
    # keyword beats the longer plain path
    assert r["referrer_url"] == "http://h.org/publications/2020/reports"


def test_criteria_phrase_reject(spark):
    ok = _crit_doc(spark, title="A Clean Publication Title")
    bad = _crit_doc(spark, title="Subscribe, to our newsletter!")
    flt = ix.criteria_filter(min_length=1,
                             filters={"title": ["subscribe to our"]})
    assert flt(ok).count() == 1
    # punctuation normalizes away before the phrase match
    assert flt(bad).count() == 0


# --------------------------------------------------------- index-org (fork)

ORG_SCHEMA = ("query string, hits array<struct<slug:string,name:string,"
              "city:string,state:string,country_name:string,"
              "country_code:string,org_type:string,domains:array<string>>>")


def _orgs(spark):
    def hit(slug, name, domains, city="C", state="S", cn="X", cc="XC",
            ot="ngo"):
        return {"slug": slug, "name": name, "city": city, "state": state,
                "country_name": cn, "country_code": cc, "org_type": ot,
                "domains": domains}
    return spark.createDataFrame([
        ("slug-a", [hit("slug-a", "Org A", ["example.org"], state="null")]),
        ("h2.org", [hit("s1", "First", ["other.org"]),
                    hit("s2", "Match", ["h2.org"])]),
        ("h3.org", [hit("s3", "OnlyHit", ["unrelated.org"])]),
    ], ORG_SCHEMA)


def test_org_lookup_slug_then_domain(spark):
    doc = _doc(spark, [
        _row(db={"org.slug": "slug-a"}),                 # slug query
        _row(url="http://h2.org/x"),                     # domain, exact 2nd
        _row(url="http://h3.org/x"),                     # first-hit fallback
        _row(url="http://nohit.org/x"),                  # no org row
    ])
    doc = ix.basic_filter(add_domain=True)(doc)
    out = ix.org_filter(_orgs(spark))(doc)
    rows = {r["url"]: r for r in out.collect()}
    a = rows["http://www.example.org/p.html"]
    assert a["organization_slug"] == "slug-a"
    assert a["organization_region"] is None      # 'null' string → absent
    assert a["organization_domains"] == "example.org"
    assert rows["http://h2.org/x"]["organization_name"] == "Match"
    assert rows["http://h3.org/x"]["organization_name"] == "OnlyHit"
    assert rows["http://nohit.org/x"]["organization_name"] is None


# ------------------------------------------------------------------ chain


def test_apply_chain_order_and_rejection(spark):
    doc = _doc(spark, [
        _row(content={"Content-Type": "text/html"}),
        _row(url="http://h.org/b.pdf",
             content={"Content-Type": "application/pdf"}),
    ])
    out = ix.apply_chain(doc, [
        ix.basic_filter(add_domain=True),
        ix.anchor_filter(),
        ix.more_filter(),
        ix.mimetype_filter(["application/pdf"], accept_mode=False),
    ])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["url"] == "http://h.org/b.pdf"
    assert rows[0]["domain"] == "h.org"


# ---------------------------------------------------------- index-replace


def _rdoc(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, description string, "
              "keywords string, author string, title string, "
              "`metatag.author` string, tags array<string>")


def _rrow(url="http://www.example.org/p.html", host="www.example.org",
          description="With this plugin, I control the description!",
          keywords="Breathtaking, Riveting, Two Thumbs Up!",
          author="Peter Ciuffetti", title="T", meta_author=None, tags=None):
    return (url, host, description, keywords, author, title, meta_author,
            tags)


def test_replace_global(spark):
    # TestIndexReplace.testGlobalReplacement: no hostmatch/urlmatch → all
    # rules apply to every doc
    conf = ("  description=/this(.*)plugin/this awesome plugin/\n"
            "  keywords=/\\,/\\!/\n"
            "  author=/\\s+/ D. /\n")
    out = ix.replace_filter(conf)(_rdoc(spark, [_rrow()])).collect()[0]
    assert out["description"] == \
        "With this awesome plugin, I control the description!"
    assert out["keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"
    assert out["author"] == "Peter D. Ciuffetti"


def test_replace_invalid_patterns_are_safe(spark):
    # TestIndexReplace.testInvalidPatterns: invalid regex → no-op rule;
    # invalid flags → rule dropped; missing separator → rule dropped
    conf = ("  description=/this\\s+**plugin/this awesome plugin/\n"
            "  keywords=/\\,/\\!/what\n"
            " author=#notcomplete")
    out = ix.replace_filter(conf)(_rdoc(spark, [_rrow()])).collect()[0]
    assert out["description"] == "With this plugin, I control the description!"
    assert out["keywords"] == "Breathtaking, Riveting, Two Thumbs Up!"
    assert out["author"] == "Peter Ciuffetti"


def test_replace_java_only_regex_reaches_jvm(spark):
    # \p{Punct} is Java-valid but Python-re-invalid; the validity probe
    # must let it through — runtime evaluation is Java regex, and
    # ReplaceIndexer would apply the rule
    conf = ("  keywords=/\\p{Punct}/!/\n"
            "  hostmatch=\\p{Alnum}+\\.example\\.org\n"
            "  author=/\\s++/ D. /\n")
    out = ix.replace_filter(conf)(_rdoc(spark, [_rrow()])).collect()[0]
    assert out["keywords"] == "Breathtaking! Riveting! Two Thumbs Up!"
    assert out["author"] == "Peter D. Ciuffetti"


def test_replace_url_scoping(spark):
    # testUrlMatchesPattern / testUrlNotMatchesPattern: urlmatch scopes
    # the rules that follow it (Matcher.find semantics)
    conf = (" urlmatch=.*.html\n"
            "  keywords=/\\,/\\!/\n")
    doc = _rdoc(spark, [
        _rrow(),
        _rrow(url="http://www.example.org/feed.xml"),
    ])
    rows = {r["url"]: r for r in ix.replace_filter(conf)(doc).collect()}
    assert rows["http://www.example.org/p.html"]["keywords"] == \
        "Breathtaking! Riveting! Two Thumbs Up!"
    assert rows["http://www.example.org/feed.xml"]["keywords"] == \
        "Breathtaking, Riveting, Two Thumbs Up!"


def test_replace_hostmatch_target_field_order_and_flags(spark):
    # hostmatch scoping; src:dst writes into the target field
    # (ReplaceIndexer.java:174-179); rules chain in order; flag 2 =
    # Pattern.CASE_INSENSITIVE; host rules run before url rules
    # (doReplace order, :243-249) even when configured after them;
    # dotted field names (promoted metadata) are addressable
    conf = (" urlmatch=.*\n"
            "  title=/^B-/C-/\n"
            " hostmatch=.*\\.example\\.org\n"
            "  author:title=/PETER/A-/2\n"
            "  title=/A-/B-/\n"
            "  metatag.author=/x/y/\n")
    doc = _rdoc(spark, [
        _rrow(meta_author="xx"),
        _rrow(url="http://other.net/a", host="other.net", meta_author="xx"),
    ])
    rows = {r["host"]: r for r in ix.replace_filter(conf)(doc).collect()}
    hit = rows["www.example.org"]
    # author→title ("A- Ciuffetti"), then /A-/B-/ → "B- Ciuffetti", then
    # the url-scoped rule (running AFTER all host rules) → "C- Ciuffetti"
    assert hit["title"] == "C- Ciuffetti"
    assert hit["metatag.author"] == "yy"
    # non-matching host: only the global url rule applies (title "T")
    assert rows["other.net"]["title"] == "T"
    assert rows["other.net"]["metatag.author"] == "xx"


def test_replace_array_field_and_null_source(spark):
    # multi-valued fields map per element; a null source leaves the
    # target untouched (docFieldNames.contains check)
    conf = "  tags=/a/b/\n  description:title=/.*/X/\n"
    doc = _rdoc(spark, [
        _rrow(tags=["aa", "ca"]),
        _rrow(url="http://h2.org/x", host="h2.org", description=None),
    ])
    rows = {r["host"]: r for r in ix.replace_filter(conf)(doc).collect()}
    assert rows["www.example.org"]["tags"] == ["bb", "cb"]
    # Java replaceAll(".*","X") = "XX" (whole match + trailing empty
    # match) — the engine reproduces reference semantics exactly
    assert rows["www.example.org"]["title"] == "XX"
    assert rows["h2.org"]["title"] == "T"   # null source → target kept


# -------------------------------------------------- tld / subcollection /
# urlmeta


def test_tld_field_and_boost(spark):
    doc = spark.createDataFrame(
        [("http://a.example.co.uk/p", "a.example.co.uk", 1.0),
         ("http://b.example.org/p", "b.example.org", 2.0),
         ("http://localhost/p", "localhost", 3.0)],
        "url string, host string, score double")
    out = {r["host"]: r for r in
           ix.tld_filter(boosts={"co.uk": 2.5})(doc).collect()}
    # multi-level public suffix recognized; boost multiplies the score
    assert out["a.example.co.uk"]["tld"] == "co.uk"
    assert out["a.example.co.uk"]["score"] == 2.5
    assert out["b.example.org"]["tld"] == "org"
    assert out["b.example.org"]["score"] == 2.0  # no boost entry → 1.0
    assert out["localhost"]["tld"] == "localhost"


def test_subcollection_contains_black_white_and_override(spark):
    doc = spark.createDataFrame(
        [("http://docs.example.org/guide/a", None),
         ("http://docs.example.org/guide/private/b", None),
         ("http://blog.example.org/post", None),
         ("http://other.org/x", {"subcollection": " manual "}),
         ("http://nowhere.org/x", None)],
        "url string, parse_meta map<string,string>")
    colls = [
        {"name": "docs", "whitelist": ["docs.example.org"],
         "blacklist": ["/private/"]},
        {"name": "blogs", "whitelist": ["blog."], "key": "channel"},
    ]
    rows = {r["url"]: r for r in
            ix.subcollection_filter(colls)(doc).collect()}
    assert rows["http://docs.example.org/guide/a"]["subcollection"] == ["docs"]
    # blacklist contains-match excludes despite the whitelist hit
    assert rows["http://docs.example.org/guide/private/b"]["subcollection"] \
        is None
    # key= routes the name to a custom field
    assert rows["http://blog.example.org/post"]["channel"] == ["blogs"]
    assert rows["http://blog.example.org/post"]["subcollection"] is None
    # non-empty parse_meta[subcollection] overrides matching (trimmed)
    assert rows["http://other.org/x"]["subcollection"] == ["manual"]
    assert rows["http://nowhere.org/x"]["subcollection"] is None


def test_urlmeta_index_fields(spark):
    doc = spark.createDataFrame(
        [("http://a.org/", {"collection.seed": "acme", "other": "x"}),
         ("http://b.org/", None)],
        "url string, db_meta map<string,string>")
    rows = {r["url"]: r for r in
            ix.urlmeta_filter(["collection.seed"])(doc).collect()}
    assert rows["http://a.org/"]["collection.seed"] == "acme"
    assert rows["http://b.org/"]["collection.seed"] is None
    assert "other" not in rows["http://a.org/"].asDict()


# ---------------------------------------------------------------- exchanges


def test_exchange_routing_union_default_and_fallback(spark):
    doc = spark.createDataFrame(
        [("http://a.org/", "a.org", 10.0),
         ("http://b.org/", "b.org", 3.0),
         ("http://c.org/", "c.org", 0.5)],
        "url string, host string, score double")
    exchanges = [
        {"id": "x1", "expr": "host = 'a.org'", "writers": ["solr_1"]},
        {"id": "x2", "expr": "score > 2.0", "writers": ["solr_1", "es_1"]},
        {"id": "default", "expr": None, "writers": ["csv_1"]},
    ]
    routed = ix.route_exchanges(doc, exchanges)
    urls = {w: sorted(r.url for r in df.collect())
            for w, df in routed.items()}
    # a matches x1+x2, b matches x2 → union per writer; c matches none →
    # only the default exchange's writer
    assert urls["solr_1"] == ["http://a.org/", "http://b.org/"]
    assert urls["es_1"] == ["http://a.org/", "http://b.org/"]
    assert urls["csv_1"] == ["http://c.org/"]


def test_exchange_no_config_routes_everything(spark):
    doc = spark.createDataFrame([("u1",), ("u2",)], "url string")
    routed = ix.route_exchanges(doc, [], all_writers=["w1", "w2"])
    assert sorted(routed) == ["w1", "w2"]
    assert routed["w1"].count() == 2 and routed["w2"].count() == 2


def test_exchange_null_predicate_is_no_match(spark):
    # a NULL-evaluating predicate behaves like JexlExchange's swallowed
    # exception: no match, so the doc falls through to the default
    doc = spark.createDataFrame([("u1", None)],
                                "url string, title string")
    exchanges = [
        {"id": "x1", "expr": "title = 'x'", "writers": ["w1"]},
        {"id": "default", "expr": None, "writers": ["d"]},
    ]
    routed = ix.route_exchanges(doc, exchanges)
    assert routed["w1"].count() == 0
    assert [r.url for r in routed["d"].collect()] == ["u1"]
