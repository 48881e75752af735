"""FormatCrawlStats tests — seed-line parsing quirks, same-host merge
order, allowed-host claims with final-state meta, unknown-host records,
and count defaulting (util/FormatCrawlStats.java:35-277)."""

import pytest

from coherencebot_spark.operators.tools import format_crawl_stats


def _line(url, title, cid, seed, slug, domains=None):
    cols = [url, f"collection.titles={title}", f"collection.ids={cid}",
            f"collection.seed={seed}", f"org.slug={slug}"]
    if domains is not None:
        cols.append(f"org.domains={domains}")
    return "\t".join(cols)


def _run(spark, lines, completion):
    seeds = spark.createDataFrame([(i, l) for i, l in enumerate(lines)],
                                  "seq long, line string")
    comp = spark.createDataFrame(completion,
                                 "host string, fetched long, unfetched long")
    out = format_crawl_stats(seeds, comp, region="eu", seq_col="seq")
    return {r["host"]: r for r in out.collect()}


def test_merge_by_host_in_line_order(spark):
    lines = [
        _line("http://a.org/x", "T1", "i1", "http://a.org/x", "slug-a",
              "a.org;ally.org"),
        _line("http://b.org/", "TB", "ib", "http://b.org/", "slug-b"),
        _line("http://a.org/y", "T2", "i2", "http://a.org/y", "slug-a2",
              "a.org;d2.org"),
    ]
    got = _run(spark, lines, [("a.org", 10, 3)])
    a = got["a.org"]
    # appended in line order; first line's slug wins
    assert a["collection_titles"] == ["T1", "T2"]
    assert a["collection_ids"] == ["i1", "i2"]
    assert a["collection_seeds"] == ["http://a.org/x", "http://a.org/y"]
    assert a["org_domains"] == ["a.org", "ally.org", "a.org", "d2.org"]
    assert a["org_slug"] == "slug-a"
    assert a["fetched"] == 10 and a["unfetched"] == 3
    assert a["region"] == "eu" and a["type"] == "host"
    # b.org never appears in the completion output -> keys stay absent
    b = got["b.org"]
    assert b["fetched"] is None and b["unfetched"] is None
    # org.domains absent -> defaults to [host] (:231)
    assert b["org_domains"] == ["b.org"]


def test_equals_truncation_quirk(spark):
    # title/id/slug values cut at a second '='; collection.seed keeps it
    lines = [_line("http://a.org/", "A=B", "i=j", "http://a.org/?q=1",
                   "s=t")]
    got = _run(spark, lines, [])
    a = got["a.org"]
    assert a["collection_titles"] == ["A"]
    assert a["collection_ids"] == ["i"]
    assert a["collection_seeds"] == ["http://a.org/?q=1"]
    assert a["org_slug"] == "s"


def test_allowed_host_claim_first_line_wins_final_meta(spark):
    lines = [
        _line("http://a.org/", "T1", "i1", "s1", "slug-a",
              "a.org;shared.org"),
        _line("http://b.org/", "TB", "ib", "sb", "slug-b",
              "b.org;shared.org"),
        # a second a.org line merged AFTER the claim — final-state meta
        # must still show through (the reference aliases the JSONArrays)
        _line("http://a.org/2", "T2", "i2", "s2", "slug-x", "a.org"),
    ]
    got = _run(spark, lines, [("shared.org", 7, 0)])
    s = got["shared.org"]
    assert s["org_slug"] == "slug-a"            # first claimer wins
    assert s["collection_titles"] == ["T1", "T2"]  # final merged arrays
    assert s["fetched"] == 7 and s["unfetched"] == 0
    assert s["region"] is None and s["type"] == "host"


def test_unknown_completion_host(spark):
    got = _run(spark, [_line("http://a.org/", "T", "i", "s", "sl")],
               [("ghost.org", 0, 5)])
    g = got["ghost.org"]
    assert g["collection_titles"] == ["unknown"]
    assert g["collection_ids"] == ["unknown"]
    assert g["collection_seeds"] == ["unknown"]
    assert g["org_slug"] == "unknown"
    assert g["org_domains"] == ["unknown"]
    assert g["fetched"] == 0 and g["unfetched"] == 5


def test_malformed_lines_dropped(spark):
    lines = ["http://short.org/\tonly=two",
             _line("not a url", "T", "i", "s", "sl"),
             _line("http://ok.org/", "T", "i", "s", "sl")]
    got = _run(spark, lines, [])
    assert set(got) == {"ok.org"}
