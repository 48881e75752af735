"""WebGraph / LinkRank (SURVEY.md §2 SC7; ref
``scoring/webgraph/WebGraph.java`` (821 LoC), ``LinkRank.java`` (770 LoC),
``ScoreUpdater.java`` (272 LoC) — disabled by default in the reference
crawl script, ``src/bin/crawl:489-507``).

The reference's three MR pipelines (node/edge extraction, iterative
link-rank, score write-back) compress to three DataFrame functions:

* ``build_webgraph`` — outlink rows → deduped edge list + node table with
  in/out degrees.  The reference's loop/duplicate handling maps to a
  ``distinct`` on (from, to) and optional self-loop removal
  (``webgraph.url.normalize/filter`` handled upstream).
* ``linkrank`` — the PageRank-style iteration
  (``LinkRank.java``: rank = (1-d) + d·Σ rank_i/outdeg_i, d=0.85 default,
  10 iterations, dangling mass redistributed uniformly).  Each iteration
  is one join+groupBy; the loop is driver-side and bounded.
* ``update_scores`` — ScoreUpdater: frontier.score := computed rank
  (log-scaled like the reference's ``ScoreUpdater`` with scaling factor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import Msg


def build_webgraph(parse_out: DataFrame,
                   ignore_self_loops: bool = True) -> tuple[DataFrame, DataFrame]:
    """linked rows → (nodes, edges).

    nodes: (url, outdegree, indegree); edges: (from_url, to_url)."""
    edges = (
        parse_out.filter(
            (F.col("status") == int(Msg.LINKED)) & F.col("from_url").isNotNull()
        )
        .select(F.col("from_url"), F.col("url").alias("to_url"))
        .distinct()
    )
    if ignore_self_loops:
        edges = edges.filter(F.col("from_url") != F.col("to_url"))
    out_deg = edges.groupBy("from_url").agg(F.count("*").alias("outdegree"))
    in_deg = edges.groupBy("to_url").agg(F.count("*").alias("indegree"))
    nodes = (
        edges.select(F.col("from_url").alias("url"))
        .unionByName(edges.select(F.col("to_url").alias("url")))
        .distinct()
        .join(out_deg.withColumnRenamed("from_url", "url"), "url", "left")
        .join(in_deg.withColumnRenamed("to_url", "url"), "url", "left")
        .select(
            "url",
            F.coalesce("outdegree", F.lit(0)).cast("long").alias("outdegree"),
            F.coalesce("indegree", F.lit(0)).cast("long").alias("indegree"),
        )
    )
    return nodes, edges


def linkrank(nodes: DataFrame, edges: DataFrame, iterations: int = 10,
             damping: float = 0.85) -> DataFrame:
    """Iterative link rank → (url, rank).  Checkpoint-free bounded loop;
    each iteration re-derives from the persisted edge/degree frames, so the
    lineage stays shallow (rank frame is persisted + materialized per
    iteration, the Spark idiom for iterative algorithms)."""
    n = nodes.count()
    if n == 0:
        return nodes.select("url", F.lit(0.0).alias("rank"))
    base = float(1.0 - damping)
    deg = nodes.select("url", "outdegree").persist()
    e = edges.select("from_url", "to_url").persist()
    urls = nodes.select("url").persist()
    # localCheckpoint truncates lineage each iteration — without it the
    # logical plan nests per iteration and analysis cost explodes (the
    # standard Spark iterative-algorithm discipline; GraphX/Pregel do the
    # same internally)
    rank = nodes.select("url", F.lit(1.0).alias("rank")).localCheckpoint()
    for _ in range(iterations):
        # persisted per iteration: the dangling-mass collect and the new
        # rank's checkpoint would otherwise each rebuild this join
        with_deg = rank.join(deg, "url").persist()
        contrib = (
            with_deg.filter(F.col("outdegree") > 0)
            .join(e, with_deg["url"] == e["from_url"])
            .select(
                F.col("to_url").alias("url"),
                (F.col("rank") / F.col("outdegree")).alias("c"),
            )
            .groupBy("url")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass redistributed uniformly (LinkRank keeps total mass)
        dangling = (
            with_deg.filter(F.col("outdegree") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        rank = (
            urls.join(contrib, "url", "left")
            .select(
                "url",
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.lit(dangling / n))
                 ).alias("rank"),
            )
            .localCheckpoint()
        )
        with_deg.unpersist()
    deg.unpersist()
    e.unpersist()
    urls.unpersist()
    return rank


def update_scores(frontier: DataFrame, ranks: DataFrame,
                  scale: float = 1.0) -> DataFrame:
    """ScoreUpdater: write ranks back as frontier scores (log-scaled;
    pages absent from the graph keep a floor score, like the reference's
    ``link.score.updater.clear.score`` default 0)."""
    r = ranks.select("url", F.col("rank").alias("_rank"))
    return (
        frontier.join(r, "url", "left")
        .withColumn(
            "score",
            F.when(
                F.col("_rank").isNotNull(),
                (F.log1p(F.col("_rank")) * float(scale)).cast("float"),
            ).otherwise(F.lit(0.0).cast("float")),
        )
        .drop("_rank")
    )
