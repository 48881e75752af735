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


def test_pipeline_round4_stages(spark):
    """line_dedup / typicality / passage_dedup / semantic slots: each
    planted defect is removed by exactly the stage that owns it."""
    # docs 0/1/2/6 share VOCABULARY (trigram mass for the typicality
    # model) but never a >=11-char passage (so winnowing won't pair
    # them); only 4/5 share a long verbatim passage
    shared_passage = ("this very long shared boilerplate passage repeats "
                      "verbatim across several documents in the corpus")
    rows = [
        (0, "the sun rises over a green hill and the river runs past an "
            "old mill while birds sing in tall trees", [1.0, 0.0, 0.0]),
        # duplicated line corpus-wide -> line_dedup strips it, doc stays
        (1, "Accept cookies banner\nbirds sing near that river while a "
            "green sun sets and the old hill rests beyond the mill",
            [0.0, 1.0, 0.0]),
        (2, "Accept cookies banner\nthe mill stands beyond the hill while "
            "the river birds rest and a green sun rises slowly",
            [0.0, 0.0, 1.0]),
        # gibberish (trigrams unlike the corpus) -> typicality drops it
        (3, "@@## $$%% ^^&& **(( ))__ ++== @@## $$%% ^^&& **((",
            [1.0, 1.0, 0.0]),
        # passage-dominated pair -> passage_dedup drops both
        (4, shared_passage + " unique a", [0.0, 1.0, 1.0]),
        (5, shared_passage + " unique b", [1.0, 0.0, 1.0]),
        # semantic dup: same embedding direction as doc 0, typical text
        (6, "an old river runs while green birds rise past a sun hill "
            "and that mill sings slowly in tall trees", [2.0, 0.0, 0.0]),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>")
    cfg = CorpusConfig(
        quality=False, exact_dedup=False, near_dedup=False,
        decontaminate=False, mix=False, pack=False,
        line_dedup=True,
        typicality=True, min_typicality=-5.65,
        passage_dedup=True, max_shared_frac=0.7,
        semantic=True, embedding_col="embedding",
        semantic_threshold=0.999, semantic_centroids=3,
    )
    out, audit = build_training_corpus(docs, None, cfg)
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 not in ids                   # typicality drop
    assert 4 not in ids and 5 not in ids  # passage dedup drops the pair
    assert 6 not in ids                   # semantic dup of 0 (keep-first)
    assert {0, 1, 2} <= ids               # line-deduped docs survive
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "Accept cookies banner" not in texts[1]   # line stripped
    assert audit["line_dedup"] == 7
    assert set(audit) >= {"input", "line_dedup", "typicality",
                          "passage_dedup", "semantic_dedup"}


def test_pipeline_round5_stages(spark):
    """c4 / gopher_quality slots: each planted defect is removed by
    exactly the stage that owns it."""
    prose = ("The sun rises over the green hill and we have time to "
             "watch it move with the morning light. ") * 4
    rows = [
        # clean prose page with three good sentences -> survives both
        (0, prose + "\nAnother complete sentence sits right here today. "
            "\nA third full sentence closes the page nicely."),
        # javascript + short lines are stripped by c4 but page survives
        (1, "Please enable javascript to continue browsing now.\n"
            "Short one.\n" + prose +
            "\nAnother complete sentence sits right here today."),
        # lorem ipsum page -> c4 page gate drops the whole doc
        (2, prose + "\nLorem ipsum dolor sit amet consectetur elit."),
        # survives c4 (good lines) but fails gopher word-shape rules:
        # no stopwords at all
        (3, "Alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu.\n"
            "Alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "again for good measure to pass every line word gate there.\n"
            "Zulu yankee xray whiskey victor uniform tango sierra "
            "romeo quebec papa oscar november mike lima kilo concluded."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CorpusConfig(
        scrub=False, quality=False, exact_dedup=False, near_dedup=False,
        decontaminate=False, mix=False, pack=False,
        c4=True, gopher_quality=True,
    )
    out, audit = build_training_corpus(docs, None, cfg)
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 not in ids                   # c4 page gate (lorem ipsum)
    assert 3 not in ids                   # gopher stopword rule
    assert {0, 1} <= ids
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "javascript" not in texts[1]   # line stripped, doc kept
    assert "Short one." not in texts[1]
    assert audit["c4"] == 3 and audit["gopher_quality"] == 2
