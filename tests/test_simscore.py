"""scoring-similarity parity tests (reference src/plugin/scoring-similarity:
Model.java TF/cosine, CosineSimilarity.java score + outlink distribution,
LuceneTokenizer.java stream composition)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from coherencebot_spark.operators.simscore import (
    LUCENE_STOPWORDS, gold_vector, porter_stem, score_outlinks_by_parent,
    similarity_score, _py_tokens,
)


# classic-Porter end-to-end outputs (full pipeline, not the paper's
# per-step examples — e.g. differentli passes step 2 AND step 4)
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "hopping": "hop", "falling": "fall", "filing": "file",
    "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "analogousli": "analog",
    "vietnamization": "vietnam", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "formaliti": "formal", "formative": "form",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "effective": "effect", "rate": "rate",
    "cease": "ceas", "roll": "roll",
}


def test_porter_stem_vectors():
    got = {w: porter_stem(w) for w in PORTER_VECTORS}
    assert got == PORTER_VECTORS


def test_tokenizer_modes():
    # unigram: lowercase → stop filter; ngram: shingles, stops kept
    assert _py_tokens("The quick, THE dog!", LUCENE_STOPWORDS) == \
        ["quick", "dog"]
    assert _py_tokens("a b c", (), ngrams=(2, 3)) == \
        ["a b", "b c", "a b c"]
    # ngram+stem stems words BEFORE shingling
    assert _py_tokens("running dogs", (), ngrams=(2, 2),
                      stem="porter") == ["run dog"]


def test_cosine_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "quick quick fox"), (3, ""), (4, None)],
        "id long, text string")
    gold = "The quick brown fox and the quick dog"
    out = {r.id: r.sim_score
           for r in similarity_score(df, gold).collect()}
    # gold TF (stop-filtered): quick:2 brown:1 fox:1 dog:1 → norm √7
    # doc2 TF: quick:2 fox:1 → norm √5, dot = 2·2 + 1·1 = 5
    assert out[2] == pytest.approx(5 / (math.sqrt(5) * math.sqrt(7)))
    assert 0 < out[1] < out[2]
    # empty/NULL text scores 0 (Model.computeCosineSimilarity maxScore
    # never beats 0 on the 0/0 path)
    assert out[3] == 0.0 and out[4] == 0.0


def test_porter_path_matches_driver_side_model(spark):
    # executor-side stemmed TF equals the driver-side gold tokenizer on
    # the same text → cosine of a doc against itself is exactly 1
    text = "Motoring operators adjusted the dependent replacements happily"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = similarity_score(df, text, stem="porter").collect()[0]
    assert out.sim_score == pytest.approx(1.0)
    # and the stem actually changed tokens (guards a no-op stub)
    assert gold_vector(text, stem="porter") != gold_vector(text)


def test_ngram_mode(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"),
         (3, "alpha gamma beta")],
        "id long, text string")
    out = {r.id: r.sim_score
           for r in similarity_score(df, "alpha beta gamma",
                                     ngrams=(2, 2)).collect()}
    # doc1 = gold word order → both bigrams match; doc2 shares one
    # ("alpha beta"); doc3 shares none
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(0.5)
    assert out[3] == 0.0


def test_outlink_targets_inherit_parent_similarity(spark):
    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.parse import parse
    from coherencebot_spark.schemas import CONTENT, FETCH_LOG
    from coherencebot_spark.status import Msg
    from tests.test_m6_operators import (content_row, fetch_row,
                                         static_outlinks)

    fl = spark.createDataFrame([fetch_row("https://h.example.org/p",
                                          score=4.0)], FETCH_LOG)
    ct = spark.createDataFrame([content_row("https://h.example.org/p")],
                               CONTENT)
    pout = parse(fl, ct, DEFAULT, outlink_fn=static_outlinks)
    scores = spark.createDataFrame([("https://h.example.org/p", 0.37)],
                                   "url string, sim_score double")
    out = score_outlinks_by_parent(pout, scores)
    assert out.columns == pout.columns
    links = out.filter(f"status = {int(Msg.LINKED)}").collect()
    # every target's score is SET to the parent similarity — the OPIC
    # split is discarded (CosineSimilarity.java:77-80)
    assert links and all(r.score == pytest.approx(0.37) for r in links)
    # non-link rows keep their original score
    sig = out.filter(f"status != {int(Msg.LINKED)}").collect()
    orig = pout.filter(f"status != {int(Msg.LINKED)}").collect()
    assert {r.url: r.score for r in sig} == {r.url: r.score for r in orig}
