"""Connected-components tests — equivalence with a reference union-find
on random graphs, convergence on adversarial shapes (long chains, rings,
stars), and the dedup_clusters keep/drop contract."""

import random

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.components import (
    connected_components,
    dedup_clusters,
)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    return {x: find(x) for x in range(n_nodes) if find(x) != x
            or any(x in e for e in edges)}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {r["node"]: r["component"]
            for r in connected_components(df).collect()}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
        edges = [e for e in edges if e[0] != e[1]]
        got = _spark_components(spark, edges)
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in edges:
            union(a, b)
        touched = {x for e in edges for x in e}
        want = {x: find(x) for x in touched}
        # normalize union-find roots to min-of-component
        comp_min = {}
        for x, r in want.items():
            comp_min.setdefault(r, x)
            comp_min[r] = min(comp_min[r], x)
        want = {x: comp_min[r] for x, r in want.items()}
        assert got == want, f"trial {trial}"


def test_chain_ring_star_shapes(spark):
    # chain 0-1-2-...-30 (diameter >> round count exercises the log
    # convergence), ring 100..110, star centered at 200
    chain = [(i, i + 1) for i in range(30)]
    ring = [(100 + i, 100 + (i + 1) % 11) for i in range(11)]
    star = [(200, 200 + i) for i in range(1, 8)]
    got = _spark_components(spark, chain + ring + star)
    assert all(got[i] == 0 for i in range(31))
    assert all(got[100 + i] == 100 for i in range(11))
    assert all(got[200 + i] == 200 for i in range(8))


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_min_id_canonical(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 4), (4, 6), (2, 3)], "a long, b long")
    out = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert out[1]["component"] == 1 and out[4]["component"] == 1 \
        and out[6]["component"] == 1
    assert out[2]["component"] == 2 and out[3]["component"] == 2
    assert out[0]["component"] == 0 and out[7]["component"] == 7
    canon = {k for k, r in out.items() if r["is_canonical"]}
    assert canon == {0, 1, 2, 5, 7}


def test_dedup_clusters_keep_column(spark):
    docs = spark.createDataFrame(
        [(1, 5), (4, 9), (6, 9)], "doc_id long, quality long")
    pairs = spark.createDataFrame([(1, 4), (4, 6)], "a long, b long")
    out = {r["doc_id"]: r["is_canonical"]
           for r in dedup_clusters(docs, pairs,
                                   keep=F.col("quality")).collect()}
    # max quality wins, tie (4 vs 6 at 9) goes to the smaller id
    assert out == {1: False, 4: True, 6: False}
