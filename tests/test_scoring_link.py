"""scoring-link (LinkAnalysisScoringFilter) wiring.

Reference: src/plugin/scoring-link/src/java/org/apache/nutch/scoring/link/
LinkAnalysisScoringFilter.java — updateDbScore and distributeScoreToOutlinks
are no-ops (:56-60, :97-100), new pages start at initialScore 0.0 (:75-78),
generatorSortValue = score * initSort (:62-64), indexerScore =
link.analyze.normalize.score * dbDatum.score (:66-73).  Scores enter the
frontier only through the WebGraph/LinkRank ScoreUpdater job
(webgraph.update_scores).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from coherencebot_spark.config import DEFAULT
from coherencebot_spark.operators.updatedb import updatedb
from coherencebot_spark.schemas import FRONTIER
from coherencebot_spark.status import Db, Fetch, Msg


def _frontier(spark, rows):
    return spark.createDataFrame(
        [(u, h, int(st), ft, 0, 2_592_000, float(sc), None, 0, None)
         for (u, h, st, ft, sc) in rows], FRONTIER)


T0 = 1_700_000_000_000


def _inputs(spark):
    frontier = _frontier(spark, [
        ("https://a.org/p1", "a.org", Db.FETCHED, T0 - 1000, 1.5),
        ("https://a.org/p2", "a.org", Db.UNFETCHED, T0 - 1000, 0.5),
        ("https://b.org/p1", "b.org", Db.FETCHED, T0 - 1000, 2.0),
    ])
    flog = spark.createDataFrame(
        [("https://a.org/p1", "a.org", int(Fetch.SUCCESS), T0 + 100, 0,
          2_592_000, 1.5, None, 0, None, 1, None)],
        "url string, host string, status int, fetch_time long, retries int,"
        "fetch_interval long, score float, signature binary,"
        "modified_time long, metadata map<string,string>,"
        "proto_status int, redirect_to string")
    # a.org/p1 links to an existing page (p2) and a brand-new one, each
    # carrying 0.75 cash (score/outdegree)
    links = spark.createDataFrame(
        [("https://a.org/p2", "a.org", int(Msg.LINKED), 0.75, None,
          "https://a.org/p1", "x", None),
         ("https://c.org/new", "c.org", int(Msg.LINKED), 0.75, None,
          "https://a.org/p1", "x", None)],
        "url string, host string, status int, score float,"
        "signature binary, from_url string, anchor string,"
        "metadata map<string,string>")
    return frontier, flog, links


def test_updatedb_link_mode_ignores_cash(spark):
    """Under scoring_filter='link' the LINKED cash rows still create the
    new frontier row but never touch any score; under opic they do."""
    frontier, flog, links = _inputs(spark)

    opic = {r.url: r.score
            for r in updatedb(frontier, flog, links, T0, DEFAULT).collect()}
    link = {r.url: r.score
            for r in updatedb(frontier, flog, links, T0,
                              DEFAULT.with_(scoring_filter="link")).collect()}

    assert set(opic) == set(link) == {
        "https://a.org/p1", "https://a.org/p2", "https://b.org/p1",
        "https://c.org/new"}
    # opic: cash accumulates (SC4)
    assert abs(opic["https://a.org/p2"] - 1.25) < 1e-6
    assert abs(opic["https://c.org/new"] - 0.75) < 1e-6
    # link: updateDbScore no-op — old scores survive, new rows start 0
    assert abs(link["https://a.org/p2"] - 0.5) < 1e-6
    assert link["https://c.org/new"] == 0.0
    # rows with no inlink cash agree across modes
    assert opic["https://b.org/p1"] == link["https://b.org/p1"] == 2.0


def test_link_scores_flow_scoreupdater_to_generate(spark):
    """End-to-end link-analysis loop: linkrank scores written back by the
    ScoreUpdater are what generatorSortValue (score * initSort) sorts by
    on the next generate."""
    from coherencebot_spark.operators.generate import generate
    from coherencebot_spark.operators.webgraph import update_scores

    frontier = _frontier(spark, [
        (f"https://h{i}.org/", f"h{i}.org", Db.UNFETCHED, T0 - 1000, 0.0)
        for i in range(4)])
    ranks = spark.createDataFrame(
        [("https://h0.org/", 1.0), ("https://h1.org/", 9.0),
         ("https://h2.org/", 4.0)], "url string, rank double")
    scored = update_scores(frontier, ranks)
    fl = generate(scored, T0,
                  DEFAULT.with_(topn=2, num_partitions=1,
                                filter_on_generate=False,
                                scoring_filter="link"))
    got = [r.url for r in fl.orderBy(F.desc("sort_score")).collect()]
    # log1p(9) > log1p(4) > log1p(1) > 0 (absent from graph)
    assert got == ["https://h1.org/", "https://h2.org/"]


def test_link_score_filter_sets_boost(spark):
    """indexerScore: boost = normalize * db score; docs with a null score
    keep the incoming boost."""
    from coherencebot_spark.operators.indexing import (apply_chain,
                                                       link_score_filter)

    doc = spark.createDataFrame(
        [("u1", 2.0, 1.0), ("u2", None, 1.0)],
        "url string, score float, boost float")
    out = {r.url: r.boost
           for r in apply_chain(doc, [link_score_filter(1.5)]).collect()}
    assert abs(out["u1"] - 3.0) < 1e-6
    assert abs(out["u2"] - 1.0) < 1e-6
