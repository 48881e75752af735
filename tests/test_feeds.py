"""Feed plugin: RSS/Atom parse rows + the feed indexing filter.

The RSS case mirrors ``plugin/feed/sample/rsstest.rss`` and
``TestFeedParser.testParseFetchChannel`` (3 parse rows: two entry links
plus the feed url itself).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyspark.sql.functions as F

from coherencebot_spark.functions.feeds import feed_indexing_filter, feed_parse

RSSTEST = """<?xml version="1.0" encoding="ISO-8859-1" ?>
<rss version="0.91">
    <channel>
      <title>TestChannel</title>
      <link>http://test.channel.com/</link>
      <description>Sample RSS File for Junit test</description>
      <language>en-us</language>
      <item>
        <title>Home Page of Chris Mattmann</title>
        <link>http://www-scf.usc.edu/~mattmann/</link>
        <description>Chris Mattmann's home page</description>
      </item>
      <item>
        <title>Awesome Open Source Search Engine</title>
        <link>http://www.nutch.org/</link>
        <description>Yup, that's what it is</description>
      </item>
   </channel>
</rss>"""

ATOM = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Test</title>
  <subtitle>atom subtitle</subtitle>
  <link href="https://atom.example.org/"/>
  <entry>
    <title>First &lt;b&gt;post&lt;/b&gt;</title>
    <link href="https://atom.example.org/p/1"/>
    <author><name>Alice A</name></author>
    <author><name>Bob B</name></author>
    <category term="spark"/>
    <category term="crawl"/>
    <published>2024-08-06T10:30:00Z</published>
    <updated>2024-08-07T01:00:00+02:00</updated>
    <summary>the <b>first</b> body</summary>
  </entry>
  <entry>
    <title>No link entry</title>
    <summary>dropped: entries without a link don't become rows</summary>
  </entry>
</feed>"""

RSS_DATES = """<rss version="2.0"><channel>
  <title>D</title><link>http://d.example.org/</link>
  <item>
    <title>dated</title>
    <link>http://d.example.org/a</link>
    <author>writer@example.org (The Writer)</author>
    <category>news</category>
    <pubDate>Tue, 06 Aug 2024 10:30:00 +0000</pubDate>
    <description>d</description>
  </item>
</channel></rss>"""


def _rows(spark, xml, url):
    df = spark.createDataFrame([(url, xml)], "url string, xml string")
    return {r["url"]: r.asDict() for r in feed_parse(df).collect()}


def test_rss_sample_mirror(spark):
    url = "file:/sample/rsstest.rss"
    rows = _rows(spark, RSSTEST, url)
    # ParseResult.size() == 3: both entry links + the feed-level parse
    assert set(rows) == {
        "http://www-scf.usc.edu/~mattmann/",
        "http://www.nutch.org/",
        url,
    }
    e1 = rows["http://www-scf.usc.edu/~mattmann/"]
    assert e1["title"] == "Home Page of Chris Mattmann"
    assert e1["text"] == "Chris Mattmann's home page"
    assert e1["is_entry"] is True
    assert dict(e1["parse_meta"])["feed"] == "http://test.channel.com/"
    feed = rows[url]
    assert feed["is_entry"] is False
    assert feed["title"] == "TestChannel"
    assert feed["text"] == "Sample RSS File for Junit test"


def test_atom_entries(spark):
    rows = _rows(spark, ATOM, "https://atom.example.org/feed.xml")
    # the linkless entry is dropped (FeedParser.java:230-238)
    assert set(rows) == {"https://atom.example.org/p/1",
                         "https://atom.example.org/feed.xml"}
    e = rows["https://atom.example.org/p/1"]
    meta = dict(e["parse_meta"])
    assert meta["author"] == "Alice A\tBob B"
    assert meta["tags"] == "spark\tcrawl"
    pub = datetime(2024, 8, 6, 10, 30, tzinfo=timezone.utc)
    upd = datetime(2024, 8, 6, 23, 0, tzinfo=timezone.utc)  # +02:00
    assert meta["published"] == str(int(pub.timestamp() * 1000))
    assert meta["updated"] == str(int(upd.timestamp() * 1000))
    assert meta["feed"] == "https://atom.example.org/"
    # markup inside text content is stripped, entities untouched
    # (stripTags splits on <...> only)
    assert e["text"] == "the first body"
    feed = rows["https://atom.example.org/feed.xml"]
    assert feed["title"] == "Atom Test"
    assert feed["text"] == "atom subtitle"


def test_rss_dates_and_author(spark):
    rows = _rows(spark, RSS_DATES, "http://d.example.org/feed")
    meta = dict(rows["http://d.example.org/a"]["parse_meta"])
    pub = datetime(2024, 8, 6, 10, 30, tzinfo=timezone.utc)
    assert meta["published"] == str(int(pub.timestamp() * 1000))
    assert "updated" not in meta
    assert meta["author"] == "writer@example.org (The Writer)"
    assert meta["tags"] == "news"


def test_feed_indexing_filter(spark):
    df = spark.createDataFrame(
        [("u1", {"feed": "f", "author": "A\tB", "tags": "x",
                 "published": "1722940200000"}),
         ("u2", {})],
        "url string, parse_meta map<string,string>")
    out = {r["url"]: r.asDict()
           for r in feed_indexing_filter(df).collect()}
    assert out["u1"]["author"] == ["A", "B"]
    assert out["u1"]["tags"] == ["x"]
    assert out["u1"]["feed"] == "f"
    assert out["u1"]["publishedDate"] == 1722940200000
    assert out["u1"]["updatedDate"] is None
    assert out["u2"]["author"] is None
    assert out["u2"]["publishedDate"] is None
