"""Decontamination tests — n-gram extraction, single-shared-ngram
flagging, eval-id attribution, threshold behavior, drop mode."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.contamination import decontaminate, ngrams


def test_ngrams_extraction(spark):
    df = spark.createDataFrame([("The quick Brown fox jumps",)],
                               "text string")
    got = df.select(ngrams(F.col("text"), 3).alias("g")).collect()[0]["g"]
    assert got == ["the quick brown", "quick brown fox", "brown fox jumps"]
    short = df.select(ngrams(F.lit("one two"), 3).alias("g")) \
        .collect()[0]["g"]
    assert short == []


def _run(spark, train_rows, eval_rows, **kw):
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    return {r["doc_id"]: r
            for r in decontaminate(train, ev, **kw).collect()}


def test_single_shared_ngram_flags(spark):
    train_rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "totally unrelated words in this one here"),
    ]
    eval_rows = [(100, "xx beta gamma delta yy")]
    got = _run(spark, train_rows, eval_rows, n=3)
    assert got[1]["contaminated"] is True
    assert got[1]["n_hits"] == 1          # "beta gamma delta"
    assert got[1]["eval_ids"] == [100]
    assert got[2]["contaminated"] is False
    assert got[2]["n_hits"] == 0 and got[2]["eval_ids"] == []


def test_multiple_eval_docs_attributed(spark):
    train_rows = [(1, "a b c d e f g h")]
    eval_rows = [(100, "z a b c z"), (200, "q f g h q")]
    got = _run(spark, train_rows, eval_rows, n=3)
    assert got[1]["eval_ids"] == [100, 200]
    assert got[1]["n_hits"] == 2
    assert got[1]["n_ngrams"] == 6


def test_threshold(spark):
    train_rows = [(1, "a b c d e f g h i j")]   # 8 tri-grams
    eval_rows = [(100, "x a b c x")]            # 1 hit -> 1/8
    got = _run(spark, train_rows, eval_rows, n=3, max_hit_frac=0.2)
    assert got[1]["contaminated"] is False
    got = _run(spark, train_rows, eval_rows, n=3, max_hit_frac=0.1)
    assert got[1]["contaminated"] is True


def test_drop_mode(spark):
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s")], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    kept = decontaminate(train, ev, n=3, keep_col=None)
    assert [r["doc_id"] for r in kept.collect()] == [2]
