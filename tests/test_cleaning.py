"""Gopher quality rules + C4 line cleaning (datapipe/cleaning.py)."""

from __future__ import annotations

from coherencebot_spark.datapipe.cleaning import (
    c4_clean_lines, gopher_quality_filter,
)

GOOD = ("The quick brown fox jumps over the lazy dog and runs away. "
        "We have seen that it can be useful to keep sentences with "
        "many plain words. ") * 4  # ~100 words, all rules pass


def test_gopher_keeps_plain_prose(spark):
    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    row = gopher_quality_filter(df).collect()[0]
    assert row.keep
    assert row.n_words >= 50
    assert 3 <= row.mean_word_len <= 10
    assert row.n_stopwords >= 2


def test_gopher_word_count_gates(spark):
    df = spark.createDataFrame(
        [(0, "too short to have fifty words with the and that of be")],
        "doc_id long, text string")
    row = gopher_quality_filter(df).collect()[0]
    assert not row.keep and row.n_words < 50


def test_gopher_symbol_and_alpha_rules(spark):
    hashy = GOOD + " #" * 30                 # symbol ratio > 0.1
    numeric = ("12 34 56 78 90 " * 20) + "the of and be"  # alpha frac low
    df = spark.createDataFrame(
        [(0, hashy), (1, numeric)], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_filter(df).collect()}
    assert not out[0].keep and out[0].symbol_ratio > 0.1
    assert not out[1].keep and out[1].alpha_word_frac < 0.8


def test_gopher_line_shape_rules(spark):
    bullets = "\n".join(f"- item {i} of the list that we have" for i in range(20))
    dots = "\n".join(
        f"the sentence number {i} of this document trails off..."
        for i in range(20))
    df = spark.createDataFrame(
        [(0, bullets), (1, dots)], "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_quality_filter(df).collect()}
    assert not out[0].keep and out[0].bullet_line_frac >= 0.9
    assert not out[1].keep and out[1].ellipsis_line_frac > 0.3


def test_gopher_stopword_presence(spark):
    # 60 alphabetic words, mean length fine — but zero of the 8 stopwords
    text = " ".join(["alpha bravo charlie delta echoes"] * 12)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = gopher_quality_filter(df).collect()[0]
    assert row.n_stopwords == 0 and not row.keep


def test_c4_line_rules(spark):
    text = "\n".join([
        "This is a perfectly normal sentence with many words.",   # kept
        "Short line.",                                             # <5 words
        "No terminal punctuation here at all on this line",        # no punct
        "Please enable javascript to view this page properly.",    # js word
        "Another good sentence that ends the right way!",          # kept
        "And a third good sentence to clear the sentence gate.",   # kept
    ])
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = c4_clean_lines(df).collect()[0]
    assert row.n_lines == 6 and row.n_lines_kept == 3
    assert row.keep
    assert "javascript" not in row.clean_text
    assert "Short line." not in row.clean_text


def test_c4_page_gates(spark):
    good_line = "This is a perfectly normal sentence with many words."
    lorem = "\n".join([good_line] * 3) + "\nLorem Ipsum dolor sit amet."
    curly = "\n".join([good_line] * 3) + "\nfunction f() { return 1; }"
    thin = good_line                       # only 1 sentence after cleaning
    bad = "\n".join([good_line] * 3) + "\nThe badword appears right here."
    df = spark.createDataFrame(
        [(0, lorem), (1, curly), (2, thin), (3, bad)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           c4_clean_lines(df, badwords=["badword"]).collect()}
    assert not out[0].keep and not out[1].keep
    assert not out[2].keep and out[2].n_sentences < 3
    assert not out[3].keep


def test_c4_plan_is_pure_project(spark):
    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    plan = c4_clean_lines(gopher_quality_filter(df)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow Project end-to-end
