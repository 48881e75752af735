"""End-to-end corpus-pipeline test: a small corpus with planted PII,
boilerplate, exact dupes, near dupes, and eval leakage flows through
every stage; each planted defect must be handled by exactly the stage
that owns it."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.pipeline import (
    CorpusConfig,
    build_training_corpus,
)

PROSE = ("the quick brown fox jumps over the lazy dog while many other "
         "words keep every line and bigram of this paragraph distinct "
         "from its neighbours in all respects")


def _corpus(spark):
    near = PROSE + " extra tail tokens here"
    rows = [
        (0, PROSE),                                   # clean survivor
        (1, PROSE),                                   # exact dupe of 0
        (2, near),                                    # near dupe of 0
        (3, "Home | About\n" * 30),                   # boilerplate
        (4, "contact me at alice@example.com today regarding a wholly "
            "unrelated administrative matter with scheduling details and "
            "budget figures that no other document in this corpus "
            "mentions anywhere"),
        (5, "an entirely different document about completely other "
            "topics whose words overlap nothing else written here and "
            "which therefore survives every stage of the whole corpus "
            "pipeline without being touched at all by any filter"),
        (6, "leak " + PROSE[:90] + " padding so this one document "
            "carries the eval benchmark thirteen gram inside it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_stages(spark):
    docs = _corpus(spark)
    ev = spark.createDataFrame(
        [(900, PROSE[:90])], "doc_id long, text string")
    cfg = CorpusConfig(decontam_n=8, chunk_tokens=16,
                       minhash_k=3, pack=False)
    out, audit = build_training_corpus(docs, ev, cfg)
    ids = {r["doc_id"] for r in out.collect()}
    # 3 dropped by Gopher rules; 1 dropped by exact dedup; 2 by near
    # dedup; 0 and 6 share eval 8-grams -> decontaminated; 4 and 5 stay
    assert ids == {4, 5}
    # the PII was scrubbed before anything else saw it
    t4 = out.filter("doc_id = 4").collect()[0]["text"]
    assert "<EMAIL>" in t4 and "alice@example.com" not in t4
    assert audit["input"] == 7
    assert audit["quality"] == 6
    assert audit["exact_dedup"] == 5
    assert audit["near_dedup"] == 4
    assert audit["decontaminate"] == 2


def test_pipeline_pack_stage(spark):
    docs = _corpus(spark).filter("doc_id in (0, 5)")
    cfg = CorpusConfig(quality=False, near_dedup=False,
                       decontaminate=False, chunk_tokens=10)
    man, audit = build_training_corpus(docs, None, cfg)
    total = man.agg(F.sum("len")).collect()[0][0]
    n_words = sum(len(r["text"].split())
                  for r in docs.collect())
    assert total == n_words
    assert audit["chunks"] == (n_words + 9) // 10


def test_pipeline_mix_stage(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id") \
        .withColumn("text", F.concat(F.lit("unique words "),
                                     F.col("doc_id").cast("string"))) \
        .withColumn("src", F.when(F.col("doc_id") % 2 == 0, "a")
                    .otherwise("b"))
    cfg = CorpusConfig(scrub=False, quality=False, exact_dedup=False,
                       near_dedup=False, decontaminate=False, pack=False,
                       strata_col="src", fractions={"a": 1.0, "b": 0.25})
    out, audit = build_training_corpus(docs, None, cfg)
    by = {r["src"]: r["count"]
          for r in out.groupBy("src").count().collect()}
    assert by["a"] == 1000
    assert abs(by["b"] / 1000 - 0.25) < 0.07
