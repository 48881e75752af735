"""Unit tests for hashing parity, normalizers, filters, signatures,
choose_repr — no SparkSession needed (pure pandas/numpy paths)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from coherencebot_spark.functions.hashing import (
    BloomFilter, host_partition, java_string_hashcode, nutch_tail_hash,
)
from coherencebot_spark.functions.signatures import (
    text_profile_signature_one,
)
from coherencebot_spark.functions.urls import (
    DescendantURLFilter, PrefixURLFilter, RegexURLFilter, RegexURLNormalizer,
    SuffixURLFilter, URLFilterChain, choose_repr, domain_of, host_of,
    normalize_urls,
)


def java_hash_ref(x: str) -> int:
    h = 0
    for u in memoryview(x.encode("utf-16-le")).cast("H"):
        h = (h * 31 + u) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


def tail_ref(x: str) -> int:
    b = x.encode("utf-8")
    h = 1
    for i in range(len(b) - 1, -1, -1):
        sb = b[i] - 256 if b[i] >= 128 else b[i]
        h = (31 * h + sb) & 0xFFFFFFFF
    return h - 2**32 if h >= 2**31 else h


def test_hash_parity_random_strings():
    rng = np.random.default_rng(7)
    strings = [
        "".join(chr(rng.integers(32, 1000)) for _ in range(rng.integers(0, 40)))
        for _ in range(200)
    ] + ["", "hello", "host0001.example.org"]
    s = pd.Series(strings)
    assert list(java_string_hashcode(s)) == [java_hash_ref(x) for x in strings]
    assert list(nutch_tail_hash(s)) == [tail_ref(x) for x in strings]


def test_host_partition_matches_reference_formula():
    hosts = pd.Series(["aaa", "bbb", "example.org", "host0042.example.org"])
    seed = 987654321
    got = host_partition(hosts, seed, 7)
    for h, g in zip(hosts, got):
        expect = ((java_hash_ref(h) ^ seed) & 0x7FFFFFFF) % 7
        assert g == expect


def test_bloom_no_false_negatives():
    m, k = BloomFilter.params(10_000, 0.01)
    bf = BloomFilter(m, k)
    rng = np.random.default_rng(1)
    h1 = rng.integers(0, 2**63, 10_000).astype(np.uint64)
    h2 = rng.integers(0, 2**63, 10_000).astype(np.uint64)
    bf.add(h1, h2)
    assert bf.contains(h1, h2).all()
    q1 = rng.integers(0, 2**63, 50_000).astype(np.uint64)
    q2 = rng.integers(0, 2**63, 50_000).astype(np.uint64)
    assert bf.contains(q1, q2).mean() < 0.02


def test_normalizer_table():
    # ported from TestBasicURLNormalizer scenarios
    cases = {
        "HTTP://Example.ORG/": "http://example.org/",
        "http://example.org:80/x": "http://example.org/x",
        "https://example.org:443/x": "https://example.org/x",
        "https://example.org:8443/x": "https://example.org:8443/x",
        "http://example.org/a/./b": "http://example.org/a/b",
        "http://example.org/a/../b": "http://example.org/b",
        "http://example.org/a//b": "http://example.org/a/b",
        "http://example.org/#frag": "http://example.org/",
        "http://example.org": "http://example.org/",
        "http://example.org./x": "http://example.org/x",
        "http://example.org/%7Euser": "http://example.org/~user",
        "http://example.org/%2fpath": "http://example.org/%2Fpath",
        "not a url": None,
    }
    got = normalize_urls(pd.Series(list(cases.keys())))
    for (src, want), g in zip(cases.items(), got):
        assert g == want, (src, g, want)


def test_fast_canonical_mask_live_and_safe():
    """The vectorized fast path must (a) actually activate on canonical
    URLs (it was dead code in round 1: '//' matched every '://') and
    (b) never claim a URL the slow path would rewrite."""
    from coherencebot_spark.functions.urls import _fast_canonical_mask, _normalize_one

    canonical = pd.Series([
        "https://example.org/a/b?x=1",
        "http://example.org/",
        "ftp://files.example.org/pub/file.txt",
    ])
    assert _fast_canonical_mask(canonical).all()

    suspects = pd.Series([
        "http://example.org:80/x",      # default port
        "https://example.org:8443/x",   # explicit port
        "http://example.org/a/./b",     # dot segment
        "http://example.org/a//b",      # duplicate slash
        "http://example.org./x",        # trailing host dot
        "http://example.org/%7Euser",   # escapes
        "HTTP://Example.ORG/",          # case
        "http://user@example.org/x",    # userinfo
        "http://example.org/#frag",     # fragment
        "http://example.org",           # no path
    ])
    assert not _fast_canonical_mask(suspects).any()

    # invariant: every fast-claimed URL is a fixed point of the slow path
    for u in canonical:
        assert _normalize_one(u) == u


def test_misc_normalizers():
    """F1c plugin parity: querystring sort, per-host slash policy, host
    canonicalization, protocol forcing, AJAX hashbang round-trip."""
    from coherencebot_spark.functions.urls import (
        AjaxURLNormalizer, HostURLNormalizer, PassURLNormalizer,
        ProtocolURLNormalizer, QuerystringURLNormalizer, SlashURLNormalizer,
    )

    u = pd.Series(["https://e.org/p?b=2&a=1&c=3#f", "https://e.org/p"])
    qs = QuerystringURLNormalizer().normalize(u).tolist()
    assert qs == ["https://e.org/p?a=1&b=2&c=3#f", "https://e.org/p"]

    s = SlashURLNormalizer({"add.org": True, "rm.org": False})
    got = s.normalize(pd.Series([
        "https://add.org/dir",          # + rule, no extension → add
        "https://add.org/page.html",    # + rule but extension → keep
        "https://add.org/",             # root untouched
        "https://rm.org/dir/",          # - rule → strip
        "https://other.org/dir",        # no rule → keep
    ])).tolist()
    assert got == ["https://add.org/dir/", "https://add.org/page.html",
                   "https://add.org/", "https://rm.org/dir",
                   "https://other.org/dir"]

    h = HostURLNormalizer({"e.org": "www.e.org"})
    assert h.normalize(pd.Series(["https://e.org/x?q=1"])).tolist() == [
        "https://www.e.org/x?q=1"]

    p = ProtocolURLNormalizer({"e.org": "http"})
    assert p.normalize(pd.Series(["https://e.org/x", "https://f.org/x"])
                       ).tolist() == ["http://e.org/x", "https://f.org/x"]

    a = AjaxURLNormalizer()
    fwd = a.normalize(pd.Series([
        "https://e.org/page#!key=value",
        "https://e.org/page?q=1#!k v",   # space escapes to %20, & base has ?
    ])).tolist()
    assert fwd == [
        "https://e.org/page?_escaped_fragment_=key=value",
        "https://e.org/page?q=1&_escaped_fragment_=k%20v",
    ]
    back = AjaxURLNormalizer(scope="indexer").normalize(pd.Series(fwd)).tolist()
    assert back == ["https://e.org/page#!key=value",
                    "https://e.org/page?q=1#!k v"]

    assert PassURLNormalizer().normalize(u).tolist() == u.tolist()


def test_outlink_extractor_table():
    """OutlinkExtractor.java:56-57 regex parity over the reference's tricky
    cases: trailing punctuation is KEPT (the URL charset includes .,;:!),
    mailto matches (scheme policy is the filter chain's job), relative
    refs never match, parens/whitespace terminate, escapes work."""
    from coherencebot_spark.functions.outlinks import extract_outlinks_text

    cases = {
        "visit http://example.org/a for info": ["http://example.org/a"],
        # sentence-final dot stays in the match (reference parity)
        "see http://example.org/a.": ["http://example.org/a."],
        "(docs: https://example.org/x?y=1)": ["https://example.org/x?y=1"],
        "mail me at mailto:foo@bar.org now": ["mailto:foo@bar.org"],
        "relative /about.html and ../up.html": [],
        "escaped http://e.org/a%20b%2Fc ok": ["http://e.org/a%20b%2Fc"],
        "frag http://e.org/p#sec2 end": ["http://e.org/p#sec2"],
        "two http://a.org/1 and ftp://b.org/2": ["http://a.org/1",
                                                 "ftp://b.org/2"],
        "no links here": [],
        None: [],
    }
    got = extract_outlinks_text(pd.Series(list(cases.keys()), dtype=object))
    for (src, want), links in zip(cases.items(), got):
        assert [u for u, _ in links] == want, (src, links)
        assert all(a == "" for _, a in links)


def test_regex_normalizer_session_ids():
    n = RegexURLNormalizer()
    s = pd.Series([
        "http://e.org/p?PHPSESSID=abc123&x=1",
        "http://e.org/p?",
        "http://e.org/a//b",
    ])
    out = n.normalize(s).tolist()
    assert out[0] == "http://e.org/p?x=1"
    assert out[1] == "http://e.org/p"
    assert out[2] == "http://e.org/a/b"


def test_filters():
    urls = pd.Series([
        "https://a.example.org/docs/x.html",
        "https://a.example.org/img/y.gif",
        "ftp://a.example.org/z",
        "https://other.org/docs/q",
    ])
    # default template rejects image extensions AND non-http(s) protocols
    assert RegexURLFilter().accept(urls).tolist() == [True, False, False, True]
    assert PrefixURLFilter(["https://a.example.org/"]).accept(urls).tolist() == \
        [True, True, False, False]
    assert SuffixURLFilter([".gif"]).accept(urls).tolist() == \
        [True, False, True, True]
    d = DescendantURLFilter(["https://a.example.org/docs/index.html"])
    assert d.accept(urls).tolist() == [True, False, False, False]
    chain = URLFilterChain([RegexURLFilter(), PrefixURLFilter(["https://"])])
    assert chain.accept(urls).tolist() == [True, False, False, True]


def test_host_domain():
    h = host_of(pd.Series(["https://a.b.example.co.uk/x", "http://example.org/"]))
    assert h.tolist() == ["a.b.example.co.uk", "example.org"]
    assert domain_of(h).tolist() == ["example.co.uk", "example.org"]


def test_choose_repr_rules():
    src = pd.Series([
        "http://a.com/page",        # cross-domain → dst
        "http://a.com/",            # perm, src root → src
        "http://a.com/x/i.html",    # perm, not root → dst
        "http://a.com/",            # temp, src root, dst not → src
        "http://a.com/x/i.html",    # temp, dst root → dst
        "http://www.a.com/",        # temp, both root → shortest host
        "http://a.com/long/path/x", # temp, same host, neither root → shortest path
    ])
    dst = pd.Series([
        "http://b.com/page",
        "http://a.com/x?y=1",
        "http://a.com/y/j.html",
        "http://a.com/x/i.html",
        "http://a.com/",
        "http://www.news.a.com/",
        "http://a.com/p",
    ])
    temp = pd.Series([False, False, False, True, True, True, True])
    out = choose_repr(src, dst, temp).tolist()
    assert out == [
        "http://b.com/page",
        "http://a.com/",
        "http://a.com/y/j.html",
        "http://a.com/",
        "http://a.com/",
        "http://www.a.com/",
        "http://a.com/p",
    ]


def test_text_profile_signature():
    # small-edit robustness: quantized profiles collapse minor changes
    base = ("spark spark spark frontier frontier crawl " * 30)
    edited = base + " extra"
    assert text_profile_signature_one(base) == text_profile_signature_one(edited)
    # different content → different signature
    assert text_profile_signature_one(base) != text_profile_signature_one(
        "completely different words here " * 30)
    # deterministic, md5-shaped
    sig = text_profile_signature_one("hello world hello")
    assert isinstance(sig, bytes) and len(sig) == 16
    # token rules: tokens of len <= 2 ignored
    assert text_profile_signature_one("ab cd ef") == hashlib.md5(b"").digest()


# ---------------------------------------------------------------------------
# HTML outlink extraction (parse-html DOMContentUtils port)
# ---------------------------------------------------------------------------


def test_html_outlinks_table():
    from coherencebot_spark.functions.outlinks import outlinks_from_html

    page = "http://h.example.org/dir/page.html"

    # relative + absolute + anchor text
    got = outlinks_from_html(
        '<html><body><a href="sub/x.html">Go  here</a>'
        '<a href="/root.html">Root</a>'
        '<a href="http://other.org/abs">Abs</a></body></html>', page)
    assert got == [
        ("http://h.example.org/dir/sub/x.html", "Go here"),
        ("http://h.example.org/root.html", "Root"),
        ("http://other.org/abs", "Abs"),
    ]

    # <base href> wins over the page URL (and itself resolves vs the page)
    got = outlinks_from_html(
        '<html><head><base href="/b/"></head>'
        '<body><a href="y.html">Y</a></body></html>', page)
    assert got == [("http://h.example.org/b/y.html", "Y")]

    # <base> after <body> is ignored (getBase stops at body)
    got = outlinks_from_html(
        '<html><body><base href="http://evil.org/">'
        '<a href="y.html">Y</a></body></html>', page)
    assert got == [("http://h.example.org/dir/y.html", "Y")]

    # frames / iframes / link / script / img / area → src|href, anchor ""
    got = outlinks_from_html(
        '<frameset><frame src="f1.html"><iframe src="f2.html"></iframe>'
        '</frameset><link href="s.css"><script src="j.js"></script>'
        '<img src="i.png"><area href="a.html">', page)
    assert got == [
        ("http://h.example.org/dir/f1.html", ""),
        ("http://h.example.org/dir/f2.html", ""),
        ("http://h.example.org/dir/s.css", ""),
        ("http://h.example.org/dir/j.js", ""),
        ("http://h.example.org/dir/i.png", ""),
        ("http://h.example.org/dir/a.html", ""),
    ]

    # rel=nofollow and method=post are dropped; form needs use_form_action
    assert outlinks_from_html(
        '<a href="x" rel="nofollow">n</a>'
        '<form action="do" method="post"><a href="k">K</a></form>', page
    ) == [("http://h.example.org/dir/k", "K")]
    assert outlinks_from_html(
        '<form action="do.cgi"><input></form>', page) == []
    assert outlinks_from_html(
        '<form action="do.cgi"><input></form>', page,
        use_form_action=True) == [("http://h.example.org/dir/do.cgi", "")]

    # img alt fallback for anchor text; the img src is ALSO a link
    got = outlinks_from_html(
        '<a href="x.html"><img src="pic.png" alt="A pic"></a>', page)
    assert ("http://h.example.org/dir/pic.png", "") in got
    assert ("http://h.example.org/dir/x.html", "A pic") in got

    # ignore_tags removes a source entirely
    assert outlinks_from_html('<img src="i.png"><a href="x">X</a>', page,
                              ignore_tags=("img",)) == [
        ("http://h.example.org/dir/x", "X")]

    # pure-query target: RFC 3986 §5.4.1 ex.7 (URLUtil.fixPureQueryTargets)
    assert outlinks_from_html('<a href="?pg=2">2</a>',
                              "http://h.org/Careers/Search.aspx?co=0") == [
        ("http://h.org/Careers/Search.aspx?pg=2", "2")]

    # nested <a> implicitly closes the open one; unclosed <a> at EOF kept
    got = outlinks_from_html('<a href="one">first<a href="two">second', page)
    assert got == [("http://h.example.org/dir/one", "first"),
                   ("http://h.example.org/dir/two", "second")]

    # garbage in → no links, no exception
    assert outlinks_from_html("\x00<<<>>!!", page) == []
    assert outlinks_from_html(None, page) == []


def test_html_outlinks_in_parse_operator(spark):
    """End-to-end: outlink_fn=extract_outlinks_html over an html column —
    LINKED rows carry resolved urls + anchors; plain-text path unchanged."""
    import pandas as pd
    from coherencebot_spark.functions.outlinks import (
        extract_outlinks_html, extract_outlinks_text)
    from coherencebot_spark.operators.parse import parse
    from coherencebot_spark.status import Fetch, Msg
    from pyspark.sql import functions as F

    content = spark.createDataFrame(
        [("http://h1.org/a/p.html", "h1.org", 1.0,
          b"\x89PNG", 1, 1, "png", 0,
          '<a href="q.html">Q</a><a href="http://h2.org/z">Z</a>'),
         ("http://h2.org/i.html", "h2.org", 1.0,
          b"\x89PNG", 1, 1, "png", 0,
          '<base href="http://cdn.h2.org/x/"><frame src="f.html">')],
        "url string, host string, score float, bytes binary, w int, h int,"
        " fmt string, phash long, caption string")
    log = content.select("url", "host",
                         F.lit(int(Fetch.SUCCESS)).alias("status"))
    out = parse(log, content, outlink_fn=extract_outlinks_html(),
                outlink_source="caption")
    linked = {(r.url, r.anchor, r.from_url) for r in
              out.filter(F.col("status") == int(Msg.LINKED)).collect()}
    assert ("http://h1.org/a/q.html", "Q", "http://h1.org/a/p.html") in linked
    assert ("http://h2.org/z", "Z", "http://h1.org/a/p.html") in linked
    assert ("http://cdn.h2.org/x/f.html", "", "http://h2.org/i.html") in linked

    # the one-arg plain-text contract still works through the same stage
    out2 = parse(log, content,
                 outlink_fn=lambda s: extract_outlinks_text(s),
                 outlink_source="caption")
    assert out2.filter(F.col("status") == int(Msg.LINKED)).count() >= 1


# ---------------------------------------------------------------------------
# urlfilter-validator / urlfilter-automaton (F2c stragglers)
# ---------------------------------------------------------------------------


def test_validator_url_filter_table():
    """Cases from the plugin's own TestUrlValidator.java."""
    from coherencebot_spark.functions.urls import ValidatorURLFilter

    f = ValidatorURLFilter()
    invalid = [
        None,
        "example.com/file[/].html",
        "http://www.example.com/space here.html",
        "/main.html",
        "www.example.com/main.html",
        "ftp:www.example.com/main.html",
        "http://999.000.456.32/nutch/trunk/README.txt",
        " http://www.example.com/ma|in\\toc.html",
    ]
    valid = [
        "https://issues.apache.org/jira/NUTCH-1127",
        "http://domain.tld/function.cgi?url=http://fonzi.com/&amp;name="
        "Fonzi&amp;mood=happy&amp;coat=leather",
        "http://validator.w3.org/feed/check.cgi?url=http%3A%2F%2F"
        "feeds.feedburner.com%2Fperishablepress",
        "ftp://alfa.bravo.pi/mike/check/plan.pdf",
        "http://10.0.0.1:8080/x",
    ]
    got = f.accept(pd.Series(invalid + valid, dtype=object))
    assert list(got) == [False] * len(invalid) + [True] * len(valid)


def test_automaton_url_filter_samples():
    """The plugin's sample corpora verbatim: WholeWebCrawling and
    IntranetCrawling rules/urls (urlfilter-automaton/sample/*) — note the
    full-match semantics difference vs urlfilter-regex (the path-loop urls
    that regex REJECTS are ACCEPTED here, exactly as the sample expects)."""
    from coherencebot_spark.functions.urls import AutomatonURLFilter

    web = AutomatonURLFilter()  # defaults = sample/WholeWebCrawling.rules
    web_cases = {
        "file://home/jc/nutch/index.html": False,
        "ftp://ftp.apache.org/nutch.html": False,
        "mailto:jerome.charron@gmail.com": False,
        "news://any.news.server/comp.lang.java": True,
        "whois:/nutch.org": True,
        "http://www.nutch.org/nutch.gif": False,
        "http://www.nutch.org/nutch.eps": False,
        "http://www.nutch.org/nutch?q=nutch": False,
        "http://www.nutch.org/": True,
        # full-match: the regex plugin's loop-breaker rejects these, the
        # automaton sample accepts them
        "http://www.nutch.org/abcd/foo/bar/foo/bar/foo/": True,
        "http://www.nutch.org/abcd/foo/bar/xyz/foo/bar/foo/": True,
    }
    got = web.accept(pd.Series(list(web_cases), dtype=object))
    assert list(got) == list(web_cases.values())

    intranet = AutomatonURLFilter(rules=(
        "-(file|ftp|mailto):.*",
        r"-.*\.(gif|GIF|jpg|JPG|ico|ICO|css|sit|eps|wmf|zip|ppt|mpg|xls"
        r"|gz|rpm|tgz|mov|MOV|exe|png)",
        "-.*[?*!@=].*",
        r"+http://([a-z0-9]*\.)*MY.DOMAIN.NAME/.*",
        "-.*",
    ))
    intranet_cases = {
        "file://home/jc/nutch/index.html": False,
        "news://any.news.server/comp.lang.java": False,
        "whois:/nutch.org": False,
        "http://MY.DOMAIN.NAME/": True,
        "http://MY.DOMAIN.NAME/nutch": True,
        "http://www.MY.DOMAIN.NAME/": True,
        "http://www.nutch.org/": False,
    }
    got = intranet.accept(pd.Series(list(intranet_cases), dtype=object))
    assert list(got) == list(intranet_cases.values())


def test_validator_in_filter_chain():
    from coherencebot_spark.functions.urls import (
        RegexURLFilter, URLFilterChain, ValidatorURLFilter)

    chain = URLFilterChain([ValidatorURLFilter(), RegexURLFilter()])
    s = pd.Series(["http://ok.example.org/page",
                   "http://bad host/x",
                   "http://ok.example.org/img.gif"], dtype=object)
    assert list(chain.accept(s)) == [True, False, False]


def test_fast_mask_fixpoint_property():
    """Property (hypothesis): for ANY generated url-ish string the
    vectorized fast-path mask may only claim a URL that the per-string
    slow path would leave byte-identical — the invariant that makes the
    residue split safe at any corpus composition."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from coherencebot_spark.functions.urls import (
        _fast_canonical_mask, _normalize_one,
    )

    scheme = st.sampled_from(["http", "https", "ftp", "HTTP", "Http"])
    label = st.text(alphabet="abcz09-AB.", min_size=1, max_size=8)
    hostish = st.lists(label, min_size=1, max_size=3).map(".".join)
    port = st.sampled_from(["", ":80", ":443", ":8080"])
    pathish = st.text(
        alphabet="abz09/.%~?=&#_- ", min_size=0, max_size=20)

    @settings(max_examples=300, deadline=None)
    @given(scheme, hostish, port, pathish)
    def check(sc, host, p, path):
        u = f"{sc}://{host}{p}/{path}"
        if bool(_fast_canonical_mask(pd.Series([u])).iloc[0]):
            assert _normalize_one(u) == u, u

    check()


def test_domain_denylist_filter():
    # urlfilter-domaindenylist: reject listed hosts/registered domains,
    # accept everything else (the inverse of urlfilter-domain)
    from coherencebot_spark.functions.urls import (
        DomainDenylistURLFilter, DomainURLFilter,
    )

    urls = pd.Series([
        "https://spam.example.org/x",      # registered domain listed
        "https://sub.spam.example.org/y",  # hmm: registered domain = example.org
        "https://bad.host.net/z",          # exact host listed
        "https://good.other.io/ok",
    ])
    allow = DomainURLFilter(["example.org", "bad.host.net"])
    deny = DomainDenylistURLFilter(["example.org", "bad.host.net"])
    assert list(allow.accept(urls)) == [True, True, True, False]
    assert list(deny.accept(urls)) == [False, False, False, True]


def test_descendant_filter_hostname_only_seed():
    from coherencebot_spark.functions.urls import DescendantURLFilter

    f = DescendantURLFilter(["https://example.com"])
    urls = pd.Series([
        "https://example.com/",
        "https://example.com/sub/page",
        "https://other.com/x",          # would have passed via 'https://'
        "http://example.com/x",
    ])
    assert list(f.accept(urls)) == [True, True, False, False]


def test_suffix_filter_from_path_mode():
    from coherencebot_spark.functions.urls import SuffixURLFilter

    urls = pd.Series([
        "http://h/big.zip?token=1",   # path rejects in from_path mode
        "http://h/page?file=.zip",    # query must not trigger from_path
        "http://h/big.zip",
        "http://h/ok.html",
    ])
    whole = SuffixURLFilter([".zip"])
    assert list(whole.accept(urls)) == [True, False, False, True]
    path = SuffixURLFilter([".zip"], from_path=True)
    assert list(path.accept(urls)) == [False, True, False, True]


# ---------------------------------------------------------------------------
# JS outlink extraction (parse-js JSParseFilter port)
# ---------------------------------------------------------------------------


def test_js_links_literal_semantics():
    from coherencebot_spark.functions.outlinks import js_links

    base = "http://h.example.org/dir/page.html"
    script = """
    function pick(form) {
      p = form.elements['searchEngine'].value;
      if (p == "one") { form.action = "http://one.example.com/p:find"; }
      else if (p == "two") { form.action = "http://two-example.com/find"; }
      d = "; expires=" + when;
      document.cookie = "searchEngine=" + p;
    }
    """
    # only the two full-URI literals survive: bare words, '=' strings and
    # whitespace-bearing literals all fail STRING/URI pattern gates
    assert js_links(script, base) == [
        ("http://one.example.com/p:find", ""),
        ("http://two-example.com/find", ""),
    ]
    # www. prefix beats base resolution; relative path.like literals
    # resolve against the base; &amp; unescaped
    got = js_links(
        'a = "www.ex.org/x"; b = \'img/pic.png\';'
        ' c = "q?a=1&amp;b=2"; d = "menu_1.2";', base)
    assert got == [
        ("http://www.ex.org/x", ""),
        ("http://h.example.org/dir/img/pic.png", ""),
        ("http://h.example.org/dir/menu_1.2", ""),
    ]
    # "q?a=1&amp;b=2" carries no '/' or '.' at all, so the full-match
    # URI gate rejects it — same as the reference's URI_PATTERN.matches()


def test_js_outlinks_from_html_sources():
    from coherencebot_spark.functions.outlinks import js_outlinks_from_html

    page = "http://h.example.org/"
    html = (
        '<html><body onload="init(\'conf/setup.js\')">'
        '<script type="text/javascript">'
        'target = "http://s.example.com/p:go";\n'
        'other = \'rel/file.css\';'
        '</script>'
        '<a href="javascript:open(\'docs/x.pdf\')">x</a>'
        '<a href="http://plain.example.org/">not js</a>'
        '</body></html>')
    got = js_outlinks_from_html(html, page)
    # onload attr, script body (2 literals), javascript: href — the
    # plain <a href> is NOT a JS source
    assert got == [
        ("http://h.example.org/conf/setup.js", ""),
        ("http://s.example.com/p:go", ""),
        ("http://h.example.org/rel/file.css", ""),
        ("http://h.example.org/docs/x.pdf", ""),
    ]


def test_html_extractor_include_js_prepends():
    import pandas as pd
    from coherencebot_spark.functions.outlinks import extract_outlinks_html

    html = ('<html><body><script>u = "http://js.example.org/found";'
            '</script><a href="/dom">D</a></body></html>')
    fn = extract_outlinks_html(include_js=True)
    out = fn(pd.Series([html]), pd.Series(["http://h.example.org/"]))[0]
    # JS finds precede the DOM links (JSParseFilter.filter appends the
    # original outlinks after its own)
    assert out == [
        ("http://js.example.org/found", ""),
        ("http://h.example.org/dom", "D"),
    ]


def test_path_url_filter_reference_table():
    # mirrors TestPathURLFilter.java's urls / urlsModeReject table
    from coherencebot_spark.functions.urls import PathURLFilter

    f = PathURLFilter(["# this is a comment", "", "reject", ""])
    urls = pd.Series([
        "https://www.example.com/section/reject",
        "https://www.example.com/reject",
        "https://www.example.com/section/reject?result=this-is-rejected",
        "https://www.example.com/reject/?result=this-is-rejected",
        "https://www.example.com/reject/someotherlastpath",
        "https://www.example.com//ok//reject/",   # empty segments skipped
        "https://www.example.com?result=this-is-accepted",
        "https://www.example.com/rej",            # shorter, no match
        "https://www.example.com/rejection",      # longer, no match
        "https://www.example.com//rej//",
    ])
    assert list(f.accept(urls)) == [
        False, False, False, False, False, False, True, True, True, True]
    # backslash normalisation + empty rule set accepts everything
    assert list(PathURLFilter(["reject"]).accept(
        pd.Series([r"https://h\reject\x"]))) == [False]
    assert list(PathURLFilter([]).accept(urls)) == [True] * len(urls)


def test_scoring_ext_generator_boost(spark):
    # scoring-ext ExtensionAnalysisScoringFilter.generatorSortValue:
    # ".ext" substring (index > 0) adds the configured boost to the sort
    from coherencebot_spark.config import CrawlConfig
    from coherencebot_spark.operators.generate import generate

    rows = [
        ("https://a.example.com/report.pdf", "a.example.com", 1.0),
        ("https://b.example.com/page.html", "b.example.com", 5.0),
        ("https://c.example.com/data.pdfx", "c.example.com", 2.0),  # still contains ".pdf"
        ("https://d.example.com/plain", "d.example.com", 3.0),
    ]
    from coherencebot_spark.schemas import FRONTIER
    frontier = spark.createDataFrame(
        [{"url": u, "host": h, "score": s, "status": 1,
          "fetch_time": 0, "fetch_interval": 86400, "retries": 0,
          "modified_time": 0, "signature": None, "metadata": None}
         for u, h, s in rows], schema=FRONTIER)
    # boosted sorts: a=1+10=11, c=2+10=12, b=5, d=3 → topn=2 picks c, a
    cfg = CrawlConfig(ext_boost_extensions=("pdf",), ext_boost=10.0,
                      topn=2, num_partitions=1)
    out = generate(frontier, cur_time=10_000, cfg=cfg)
    assert {r["url"] for r in out.select("url").collect()} == {
        "https://c.example.com/data.pdfx",
        "https://a.example.com/report.pdf"}
    # without the plugin the plain scores win: b=5, d=3
    out0 = generate(frontier, cur_time=10_000,
                    cfg=CrawlConfig(topn=2, num_partitions=1))
    assert {r["url"] for r in out0.select("url").collect()} == {
        "https://b.example.com/page.html",
        "https://d.example.com/plain"}
