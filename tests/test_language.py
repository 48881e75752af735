"""language-identifier plugin: parseLanguage vectors, HTML detection,
policy ordering, and the indexing filter.

The parseLanguage table and the three meta documents are the reference
plugin's own test fixtures
(``TestHTMLLanguageParser.java:41-131``), re-run against the column
expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from coherencebot_spark.functions.language import (
    LANG_MAPPINGS,
    detect_language,
    html_language_filter,
    identify_language,
    language_index_filter,
    parse_language,
)

# TestHTMLLanguageParser.testParseLanguage (44 vectors)
PARSE_VECTORS = [
    ("(SCHEME=ISO.639-1) sv", "sv"), ("(SCHEME=RFC1766) sv-FI", "sv"),
    ("(SCHEME=Z39.53) SWE", "sv"), ("EN_US, SV, EN, EN_UK", "en"),
    ("English Swedish", "en"), ("English, swedish", "en"),
    ("English,Swedish", "en"), ("Other (Svenska)", "sv"), ("SE", "se"),
    ("SV", "sv"), ("SV charset=iso-8859-1", "sv"), ("SV-FI", "sv"),
    ("SV; charset=iso-8859-1", "sv"), ("SVE", "sv"), ("SW", "sw"),
    ("SWE", "sv"), ("SWEDISH", "sv"), ("Sv", "sv"), ("Sve", "sv"),
    ("Svenska", "sv"), ("Swedish", "sv"), ("Swedish, svenska", "sv"),
    ("en, sv", "en"), ("sv", "sv"),
    ("sv, be, dk, de, fr, no, pt, ch, fi, en", "sv"), ("sv,en", "sv"),
    ("sv-FI", "sv"), ("sv-SE", "sv"), ("sv-en", "sv"), ("sv-fi", "sv"),
    ("sv-se", "sv"), ("sv; Content-Language: sv", "sv"), ("sv_SE", "sv"),
    ("sve", "sv"), ("svenska, swedish, engelska, english", "sv"),
    ("sw", "sw"), ("swe", "sv"), ("swe.SPR.", "sv"), ("sweden", "sv"),
    ("swedish", "sv"), ("swedish,", "sv"),
    ("text/html; charset=sv-SE", "sv"), ("text/html; sv", "sv"),
    ("torp, stuga, uthyres, bed & breakfast", None),
]

# TestHTMLLanguageParser.testMetaHTMLParsing documents (fi / en / en)
META_DOCS = [
    ('<html lang="fi"><head>document 1 title</head>'
     "<body>jotain suomeksi</body></html>", "fi"),
    ('<html><head><meta http-equiv="content-language" content="en">'
     "<title>document 2 title</head><body>this is english</body></html>",
     "en"),
    ('<html><head><meta name="dc.language" content="en">'
     "<title>document 3 title</head><body>this is english</body></html>",
     "en"),
]


def test_mappings_table():
    assert LANG_MAPPINGS["swe"] == "sv"
    assert LANG_MAPPINGS["english"] == "en"
    assert LANG_MAPPINGS["sv"] == "sv"
    # file-order collision rule: the later line's alias wins
    assert LANG_MAPPINGS["mlt"] == "mt"
    assert LANG_MAPPINGS["scr"] == "sh"
    # preserved reference quirks
    assert LANG_MAPPINGS["langue d'oc"] == "oc"
    assert LANG_MAPPINGS["yidyiddish"] == "yi"


def test_parse_language_vectors(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(PARSE_VECTORS)], "i int, s string")
    got = {r["i"]: r["lang"]
           for r in df.select("i", parse_language(F.col("s")).alias("lang")
                              ).collect()}
    for i, (s, want) in enumerate(PARSE_VECTORS):
        assert got[i] == want, f"{s!r}: {got[i]} != {want}"


def test_meta_html_parsing(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(META_DOCS)], "i int, html string")
    got = {r["i"]: r["lang"]
           for r in df.select(
               "i", detect_language(F.col("html")).alias("lang")).collect()}
    for i, (_, want) in enumerate(META_DOCS):
        assert got[i] == want


def test_detect_priority_and_fallbacks(spark):
    rows = [
        # lang attribute beats dc.language beats http-equiv
        (0, '<html lang="fi"><meta name="dc.language" content="en"></html>',
         None),
        (1, '<meta name="dc.language" content="de">'
            '<meta http-equiv="content-language" content="en">', None),
        # unparseable candidates are skipped, later ones still scanned
        (2, '<p lang="torp stuga">x</p><div lang="sv-FI">y</div>', None),
        # nothing parseable in the document → raw header fallback
        (3, '<p lang="bed & breakfast">x</p>', "pt-BR"),
        # xml:lang / hreflang must not register as a lang attribute
        (4, '<a hreflang="de" href="x">x</a><html xml:lang="de"></html>',
         None),
    ]
    df = spark.createDataFrame(rows, "i int, html string, hdr string")
    got = {r["i"]: r["lang"] for r in df.select(
        "i", detect_language(F.col("html"), F.col("hdr")).alias("lang")
    ).collect()}
    assert got[0] == "fi"
    assert got[1] == "de"
    assert got[2] == "sv"
    assert got[3] == "pt-BR"  # header is returned raw, not parsed
    assert got[4] is None


def test_identify_language(spark):
    df = spark.createDataFrame(
        [(0, "T", "the cat and the dog of it is that"),
         (1, None, "der hund und die katze ist nicht von"),
         (2, "x", "zzz qqq www")],
        "i int, title string, text string")
    got = {r["i"]: r["lang"] for r in df.select(
        "i", identify_language(F.col("title"), F.col("text")).alias("lang")
    ).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] is None
    # content_maxlength truncates before identification
    short = df.filter("i = 0").select(identify_language(
        F.col("title"), F.col("text"), content_maxlength=3).alias("lang")
    ).collect()[0]["lang"]
    assert short is None  # "T t" carries no stopword


def test_policy_ordering(spark):
    # document whose markup says "fi" but whose text votes English
    df = spark.createDataFrame(
        [(0, '<html lang="fi"></html>', "t",
          "the cat and the dog of it is that")],
        "i int, html string, title string, text string")
    det_first = html_language_filter(("detect", "identify"))(df)
    ident_first = html_language_filter(("identify", "detect"))(df)
    assert det_first.collect()[0]["parse_meta"]["lang"] == "fi"
    assert ident_first.collect()[0]["parse_meta"]["lang"] == "en"
    # identify-only policy never sees the markup
    only_ident = html_language_filter(("identify",))(df)
    assert only_ident.collect()[0]["parse_meta"]["lang"] == "en"
    # detect miss falls through to identify
    df2 = spark.createDataFrame(
        [(0, "<html></html>", "t", "le la les de et est un une")],
        "i int, html string, title string, text string")
    assert html_language_filter()(df2).collect()[0]["parse_meta"]["lang"] == "fr"


def test_language_filter_merges_meta(spark):
    df = spark.createDataFrame(
        [(0, '<html lang="sv"></html>', "t", "x", {"k": "v", "lang": "old"}),
         (1, "<html></html>", "t", "zzz", {"k": "v"})],
        "i int, html string, title string, text string, "
        "parse_meta map<string,string>")
    out = {r["i"]: r["parse_meta"]
           for r in html_language_filter()(df).collect()}
    assert out[0] == {"k": "v", "lang": "sv"}  # new detection wins
    assert out[1] == {"k": "v"}  # null detection leaves meta untouched


def test_language_index_filter(spark):
    df = spark.createDataFrame(
        [(0, {"lang": "sv-FI"}, None),
         (1, {}, "en-US"),
         (2, {}, None),
         (3, {"lang": "de"}, "en")],
        "i int, parse_meta map<string,string>, content_language string")
    out = language_index_filter(header_col="content_language")(df)
    got = {r["i"]: r["lang"] for r in out.collect()}
    # parse-meta wins over header; truncation to the 2-letter code
    assert got == {0: "sv", 1: "en", 2: None, 3: "de"}
    # non-empty lang.index.languages drops non-members AND unknowns;
    # the gate tests the raw pre-truncation value
    kept = language_index_filter(("sv-FI", "de"),
                                 header_col="content_language")(df)
    assert {r["i"]: r["lang"] for r in kept.collect()} == {0: "sv", 3: "de"}
