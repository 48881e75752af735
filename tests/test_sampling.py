"""Deterministic sampling tests — rate accuracy, rerun stability, nested
fractions, stratified recipe, fractional upsampling, and split
stability under corpus growth."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.sampling import (
    deterministic_sample,
    deterministic_upsample,
    stratified_sample,
    train_eval_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 4000).withColumnRenamed("id", "doc_id") \
        .withColumn("lang", F.when(F.col("doc_id") % 3 == 0, "en")
                    .when(F.col("doc_id") % 3 == 1, "de")
                    .otherwise("fr"))


def test_rate_and_stability(docs):
    s1 = deterministic_sample(docs, 0.25, salt="s")
    n = s1.count()
    assert abs(n / 4000 - 0.25) < 0.03
    # identical selection on a re-run (no RNG anywhere)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"]
            for r in deterministic_sample(docs, 0.25, salt="s").collect()}
    assert ids1 == ids2
    # different salt -> a different (roughly independent) selection
    ids3 = {r["doc_id"]
            for r in deterministic_sample(docs, 0.25, salt="t").collect()}
    assert ids3 != ids1


def test_nested_fractions(docs):
    small = {r["doc_id"]
             for r in deterministic_sample(docs, 0.05, salt="s").collect()}
    big = {r["doc_id"]
           for r in deterministic_sample(docs, 0.30, salt="s").collect()}
    assert small <= big  # the 5% sample is inside the 30% sample


def test_degenerate_fractions(docs):
    assert deterministic_sample(docs, 1.0).count() == 4000
    assert deterministic_sample(docs, 0.0).count() == 0


def test_stratified_recipe(docs):
    out = stratified_sample(docs, {"en": 1.0, "de": 0.2}, "lang")
    by = {r["lang"]: r["count"]
          for r in out.groupBy("lang").count().collect()}
    assert by["en"] == docs.filter("lang = 'en'").count()
    assert "fr" not in by  # default 0.0 drops unlisted strata
    de_total = docs.filter("lang = 'de'").count()
    assert abs(by["de"] / de_total - 0.2) < 0.06


def test_upsample_fractional_weight(docs):
    out = deterministic_upsample(docs, 2.5, key_col="doc_id")
    n = out.count()
    assert abs(n / 4000 - 2.5) < 0.1
    # per-doc copies are 2 or 3, numbered from 0
    per = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy").alias("mx")).collect()
    assert all(r["n"] in (2, 3) and r["mx"] == r["n"] - 1 for r in per)
    # deterministic: same copies on re-run
    n2 = deterministic_upsample(docs, 2.5, key_col="doc_id").count()
    assert n2 == n


def test_upsample_column_weight(docs):
    w = F.when(F.col("lang") == "en", 2.0).otherwise(0.0)
    out = deterministic_upsample(docs, w)
    assert out.filter("lang != 'en'").count() == 0
    assert out.count() == 2 * docs.filter("lang = 'en'").count()


def test_split_stable_under_growth(spark, docs):
    split1 = {r["doc_id"]: r["split"]
              for r in train_eval_split(docs, 0.1).collect()}
    bigger = spark.range(0, 8000).withColumnRenamed("id", "doc_id")
    split2 = {r["doc_id"]: r["split"]
              for r in train_eval_split(bigger, 0.1).collect()}
    assert all(split2[k] == v for k, v in split1.items())
    frac = sum(1 for v in split2.values() if v == "eval") / 8000
    assert abs(frac - 0.1) < 0.02


def test_cluster_safe_split_no_straddle(spark):
    """The leakage property: every member of a near-dup cluster lands in
    the same split; plain doc-id hashing demonstrably straddles."""
    from coherencebot_spark.datapipe.sampling import (
        cluster_safe_split, train_eval_split)

    docs = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    # 3-node chains: 3k — 3k+1 — 3k+2
    pairs = (spark.range(0, 300).where("id % 3 != 2")
             .selectExpr("id AS a", "id + 1 AS b"))

    out = cluster_safe_split(docs, pairs, 0.3).collect()
    by_comp = {}
    for r in out:
        assert r.component == 3 * (r.doc_id // 3)
        by_comp.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values())
    splits = {r.doc_id: r.split for r in out}
    assert {"train", "eval"} == set(splits.values())   # both sides hit

    # counter-property: id-keyed split straddles at least one cluster
    naive = {r.doc_id: r.split
             for r in train_eval_split(docs, 0.3).collect()}
    assert any(len({naive[3 * k], naive[3 * k + 1], naive[3 * k + 2]}) > 1
               for k in range(100))


def test_cap_per_key_semantics_and_grouplimit_plan(spark):
    from coherencebot_spark.datapipe.sampling import cap_per_key

    df = spark.range(0, 200).selectExpr("id AS doc_id",
                                        "id % 3 AS source_key")
    out = cap_per_key(df, "source_key", 4, "doc_id")
    rows = out.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.source_key, []).append(r.doc_id)
    # earliest 4 ids of each key survive
    assert {k: sorted(v) for k, v in by_key.items()} == {
        k: [k, k + 3, k + 6, k + 9] for k in range(3)}
    # the scale property: map-side group limit prunes BEFORE the
    # exchange — a hot key never ships its full multiplicity
    plan = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    # two instances: Final above the exchange AND Partial below it —
    # the Partial one is the map-side prune that bounds hot-key skew
    assert plan.count("WindowGroupLimit") == 2, plan
    assert plan.rindex("WindowGroupLimit") > plan.index("Exchange"), plan
