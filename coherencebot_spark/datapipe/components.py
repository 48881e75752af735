"""Connected components over near-duplicate pairs — cluster labeling +
canonical-document selection for training-data dedup.

The LSH/SimHash stages (``dedup_text.minhash_lsh_pairs`` /
``simhash_near_dups`` with ``pair_mode='star'``) emit component-
equivalent PAIRS; turning pairs into one keep/drop decision per document
needs the transitive closure — a pair (a,b) and a pair (b,c) must land
a, b, c in ONE cluster with ONE canonical survivor.  The reference
resolves this only pairwise (crawl/DeduplicationJob.java reduces per
signature bucket), so this operator is part of the training-pipeline
surface the task brief adds on top of the reference.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", ACM SoCC 2014; public literature).  Both steps are plain
``groupBy`` aggregations:

* **large-star**: for each node u, attach every LARGER neighbor to the
  minimum of u's neighborhood (including u) — ``(v, m)`` for v > u.
* **small-star**: orient edges toward smaller ids; attach u and all its
  smaller neighbors to the neighborhood minimum.

The edge multiset converges to a forest of depth-1 stars rooted at each
component's minimum id in O(log² n) rounds (O(log n) in practice — near-
dup graphs are unions of LSH-bucket stars, so 2-4 rounds are typical).
Each round is two shuffles on the node id; no driver-side state, no
collect — the 100 TB path.  ``localCheckpoint`` truncates the plan
between rounds so the lineage doesn't grow with the iteration count;
convergence is detected from a 2-row aggregate (edge count + label
checksum), the only driver traffic per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star step over canonical (u, v) edges."""
    # neighborhoods are over the SYMMETRIC edge set for large-star, over
    # the smaller-oriented set for small-star (paper §3, Algorithms 1-2)
    if large:
        nbrs = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        grouped = nbrs.groupBy("u").agg(
            F.collect_set("v").alias("ns"))
        m = F.array_min(F.array_union("ns", F.array("u")))
        out = grouped.select(
            F.explode("ns").alias("dst"), m.alias("m"), F.col("u"))
        # (v, m) for v > u; m may equal v (then the edge is a no-op
        # self-loop and is dropped)
        out = out.filter(F.col("dst") > F.col("u")).select(
            F.col("dst").alias("u"), F.col("m").alias("v"))
    else:
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("ns"))
        m = F.array_min(F.array_union("ns", F.array("u")))
        out = grouped.select(
            F.explode(F.array_union("ns", F.array("u"))).alias("dst"),
            m.alias("m"))
        out = out.select(F.col("dst").alias("u"), F.col("m").alias("v"))
    return out.filter(F.col("u") != F.col("v")) \
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")) \
        .distinct()


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", max_iter: int = 20) -> DataFrame:
    """``(node, component)`` — component = the minimum node id reachable
    from ``node`` through the pair graph.  Nodes that appear in no pair
    are absent (join the doc table with a coalesce-to-self for them —
    see :func:`dedup_clusters`)."""
    edges = pairs.select(
        F.greatest(F.col(a_col), F.col(b_col)).alias("u"),
        F.least(F.col(a_col), F.col(b_col)).alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    prev_sig = None
    for _ in range(max_iter):
        edges = _star_round(edges, large=True)
        edges = _star_round(edges, large=False).localCheckpoint()
        sig_row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v") % 1_000_000_007).alias("h")
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: every edge is (member, component-min)
    members = edges.select(F.col("u").alias("node"),
                           F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"),
                         F.col("v").alias("component")).distinct()
    return members.unionByName(roots)


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", a_col: str = "a",
                   b_col: str = "b",
                   keep: Column | None = None) -> DataFrame:
    """Label every document with its duplicate cluster and the keep/drop
    decision: ``component`` (cluster id — the minimum member id, or the
    doc's own id when it has no near-duplicate) and ``is_canonical``
    (exactly one true per cluster; by default the minimum id survives —
    pass ``keep`` as a struct-ordering column to prefer e.g. the longest
    or highest-quality member: the max ``keep`` wins, ties to min id).

    Shape: one broadcast-sized components frame per corpus partition
    when the duplicate fraction is small (components has one row per
    PAIRED doc only), so the common case is a broadcast left join over
    the doc scan — no full-corpus shuffle."""
    comp = connected_components(pairs, a_col, b_col)
    labeled = docs.join(F.broadcast(comp),
                        docs[id_col] == comp["node"], "left") \
        .drop("node") \
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    if keep is None:
        canon = F.col(id_col) == F.col("component")
        return labeled.withColumn("is_canonical", canon)
    from pyspark.sql import Window
    w = Window.partitionBy("component").orderBy(
        keep.desc(), F.col(id_col).asc())
    return labeled.withColumn(
        "is_canonical", F.row_number().over(w) == 1)
