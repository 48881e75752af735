"""Physical-plan shape assertions for the round-4 datapipe operators —
each documented scale claim in PLANS.md §datapipe-additions is checked
against the actual executed plan, not just prose."""

import pyspark.sql.functions as F
import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_sampling_and_scrub_are_pure_projections(spark):
    from coherencebot_spark.datapipe.sampling import (
        deterministic_sample, train_eval_split)
    from coherencebot_spark.datapipe.scrub import scrub_pii

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.lit("a b c"))
    for df in (deterministic_sample(docs, 0.5),
               train_eval_split(docs, 0.1),
               scrub_pii(docs)):
        p = _plan(df)
        assert "Exchange" not in p, p


def test_repetition_filter_no_shuffle(spark):
    from coherencebot_spark.datapipe.repetition import (
        gopher_repetition_filter)

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.lit("x\ny\nz words here"))
    p = _plan(gopher_repetition_filter(docs, keep_col="keep"))
    assert "Exchange" not in p, p


def test_decontaminate_corpus_side_never_shuffles(spark):
    """The train corpus must reach the eval join via BroadcastHashJoin;
    the only Exchanges allowed touch the (tiny) hit/eval sides — no
    Exchange may carry the train text column."""
    from coherencebot_spark.datapipe.contamination import decontaminate

    train = spark.range(0, 200).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("w x y z t"),
                                     F.col("doc_id").cast("string")))
    ev = spark.createDataFrame([(1, "w x y")], "doc_id long, text string")
    out = decontaminate(train, ev, n=3)
    p = _plan(out)
    assert "BroadcastHashJoin" in p, p
    # no sort-merge join anywhere (that would shuffle the corpus)
    assert "SortMergeJoin" not in p, p
    for block in p.split("Exchange")[1:]:
        first_line = block.splitlines()[0]
        assert "text" not in first_line, f"corpus text crosses a shuffle: {first_line}"


def test_packing_single_pass_shape(spark):
    """The manifest's only wide operations are the range partitioning of
    the (doc_id, n) projection and the P-row totals aggregate — the text
    column itself must not cross an Exchange."""
    from coherencebot_spark.datapipe.packing import chunk_manifest

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.lit("one two three four"))
    man = chunk_manifest(docs, 7, parallelism=4)
    p = _plan(man)
    for block in p.split("Exchange")[1:]:
        first_line = block.splitlines()[0]
        assert "text" not in first_line, f"text crosses a shuffle: {first_line}"


def test_lm_typicality_plan_shape(spark):
    """PLANS.md §trigram-LM typicality: the model reaches scoring via
    BroadcastHashJoin (never a sort-merge join that would shuffle the
    exploded corpus), the (total, V) scalars arrive as broadcast
    nested-loop crossJoins, the top-V cut is a TakeOrderedAndProject
    (no global Sort), and every Exchange is an aggregation exchange —
    none carries the text column."""
    from coherencebot_spark.datapipe.lm_quality import (
        lm_typicality, train_trigram_lm)

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("some words here number "),
                                     F.col("doc_id").cast("string")))
    # train plan: top-V is a TakeOrderedAndProject, never a full Sort
    pt = _plan(train_trigram_lm(docs))
    assert "TakeOrderedAndProject" in pt, pt
    # scoring plan: model arrives as a materialized local relation
    # (ExistingRDD — the training explode is NOT re-derived inside the
    # broadcast), joined broadcast, scalars via broadcast crossJoin
    p = _plan(lm_typicality(docs))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p      # scalar crossJoins
    assert "ExistingRDD" in p, p                  # model materialized once
    for line in p.splitlines():                   # text never shuffles
        if "Exchange" in line:
            assert "text" not in line, line


def test_bpe_apply_is_pure_projection(spark):
    """BPE apply is a replace chain over staged projections — zero
    Exchanges, zero Python (no BatchEvalPython / ArrowEvalPython)."""
    from coherencebot_spark.datapipe.tokenizer import (
        bpe_segment, bpe_token_count)

    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("table row agg line "),
                                     F.col("doc_id").cast("string")))
    merges = [("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
              ("r", "o"), ("ro", "w")]
    for df in (bpe_segment(docs, merges), bpe_token_count(docs, merges)):
        p = _plan(df)
        assert "Exchange" not in p, p
        assert "EvalPython" not in p, p


def test_dsir_scoring_corpus_never_wide_shuffles(spark):
    """The model arrives materialized (local scan — the training
    aggregation is NOT re-derived inside the broadcast) and joins back
    as a broadcast; the only Exchanges carry bounded-key aggregates
    (word counts, per-doc combine) — never the text column."""
    from coherencebot_spark.datapipe.importance import dsir_weights

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("alpha beta gamma delta "),
                                     F.col("doc_id").cast("string")))
    target = docs.where("doc_id % 10 = 0")
    p = _plan(dsir_weights(docs, target, vocab_limit=100))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert ("LocalTableScan" in p or "ExistingRDD" in p), p
    for line in p.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
