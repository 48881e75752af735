"""WebGraph/LinkRank tests: degree extraction, rank convergence on a known
graph, score write-back."""

from __future__ import annotations

import pytest

from coherencebot_spark.operators.webgraph import (
    build_webgraph, linkrank, update_scores,
)
from coherencebot_spark.schemas import FRONTIER, PARSE_OUT
from coherencebot_spark.status import Db, Msg

T = 1_700_000_000_000


def link(frm, to):
    return dict(url=to, host=to.split("/")[2], status=int(Msg.LINKED),
                score=0.1, signature=None, from_url=frm, anchor=None,
                metadata=None)


def test_webgraph_and_linkrank(spark):
    # a -> b, a -> c, b -> c, c -> a (classic 3-node cycle-ish graph)
    a, b, c = "https://a/x", "https://b/x", "https://c/x"
    rows = [link(a, b), link(a, c), link(b, c), link(c, a),
            link(a, a)]  # self-loop must be dropped
    po = spark.createDataFrame(rows, PARSE_OUT)
    nodes, edges = build_webgraph(po)
    nd = {r.url: (r.outdegree, r.indegree) for r in nodes.collect()}
    assert nd[a] == (2, 1) and nd[b] == (1, 1) and nd[c] == (1, 2)
    assert edges.count() == 4

    ranks = {r.url: r.rank for r in linkrank(nodes, edges, iterations=30).collect()}
    # stationary solution of PageRank(d=.85) on this graph: c > a > b
    assert ranks[c] > ranks[a] > ranks[b]
    # total mass conserved: Σrank = N (within float tolerance)
    assert sum(ranks.values()) == pytest.approx(3.0, rel=1e-3)


def test_update_scores(spark):
    fr = spark.createDataFrame(
        [dict(url="https://a/x", host="a", status=int(Db.FETCHED), fetch_time=T,
              retries=0, fetch_interval=1, score=9.0, signature=None,
              modified_time=0, metadata=None),
         dict(url="https://zzz/x", host="zzz", status=int(Db.UNFETCHED),
              fetch_time=T, retries=0, fetch_interval=1, score=9.0,
              signature=None, modified_time=0, metadata=None)],
        FRONTIER)
    ranks = spark.createDataFrame([("https://a/x", 2.0)], "url string, rank double")
    out = {r.url: r.score for r in update_scores(fr, ranks).collect()}
    assert out["https://a/x"] == pytest.approx(1.0986, rel=1e-3)  # log1p(2)
    assert out["https://zzz/x"] == 0.0  # cleared (not in graph)
