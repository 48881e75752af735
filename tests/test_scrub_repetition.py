"""PII scrub + Gopher repetition-filter tests."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.repetition import (
    duplicate_line_char_fraction,
    duplicate_line_fraction,
    gopher_repetition_filter,
    top_bigram_char_fraction,
)
from coherencebot_spark.datapipe.scrub import scrub_pii


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col(F.col("text")).alias("v")).collect()[0]["v"]


def test_scrub_all_categories(spark):
    text = ("Mail bob.smith+x@example.co.uk or call +49 30 1234567, "
            "US (555) 123-4567, server 192.168.0.1, acct 1234567890.")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = scrub_pii(df).collect()[0]
    t = out["text"]
    assert "<EMAIL>" in t and "bob.smith" not in t
    assert "<IP>" in t and "192.168.0.1" not in t
    assert "<PHONE>" in t and "(555) 123-4567" not in t
    assert "<ID>" in t and "1234567890" not in t
    assert out["pii_counts"]["email"] == 1
    assert out["pii_counts"]["ipv4"] == 1
    assert out["pii_counts"]["phone"] == 2
    assert out["pii_counts"]["id_number"] == 1


def test_scrub_order_email_before_phone(spark):
    # the email's digits must not be half-eaten by the phone pass
    df = spark.createDataFrame([("x 5551234567890@mail.com y",)],
                               "text string")
    t = scrub_pii(df, counts_col=None).collect()[0]["text"]
    assert t == "x <EMAIL> y"


def test_scrub_clean_text_untouched(spark):
    df = spark.createDataFrame([("just words, no pii at all",)],
                               "text string")
    out = scrub_pii(df).collect()[0]
    assert out["text"] == "just words, no pii at all"
    assert all(v == 0 for v in out["pii_counts"].values())


def test_duplicate_line_fraction(spark):
    text = "a\nb\na\nc\na\n"
    assert _one(spark, text, duplicate_line_fraction) == pytest.approx(2 / 5)
    assert _one(spark, "x\ny\nz", duplicate_line_fraction) == 0.0
    assert _one(spark, "", duplicate_line_fraction) == 0.0


def test_duplicate_line_char_fraction(spark):
    # "aaaa" twice (8 chars duplicated) + "bc" once -> 8/10
    text = "aaaa\nbc\naaaa"
    got = _one(spark, text, duplicate_line_char_fraction)
    assert got == pytest.approx(8 / 10)


def test_top_bigram_char_fraction(spark):
    # "click here" x3 -> top bigram covers 3*9=27 of 30 word chars
    text = "click here click here click here"
    got = _one(spark, text, top_bigram_char_fraction)
    # words: click(5) here(4) x3 = 27 chars; bigram "click here" occurs 3
    # times among 5 bigrams; covered = 3 * 9 = 27 -> 27/27 = 1.0
    assert got == pytest.approx(1.0)
    assert _one(spark, "a long sentence whose word pairs never repeat "
                "anywhere keeps this fraction small by construction",
                top_bigram_char_fraction) < 0.25
    assert _one(spark, "single", top_bigram_char_fraction) == 0.0


def test_gopher_filter_drops_boilerplate(spark):
    menu = "\n".join(["Home | About | Contact"] * 20)
    prose = ("A reasonably varied paragraph of text that repeats no "
             "line and keeps its bigrams diverse across the board.")
    df = spark.createDataFrame([(1, menu), (2, prose)],
                               "doc_id long, text string")
    kept = [r["doc_id"] for r in
            gopher_repetition_filter(df).collect()]
    assert kept == [2]
    flags = {r["doc_id"]: r["keep"] for r in gopher_repetition_filter(
        df, keep_col="keep").collect()}
    assert flags == {1: False, 2: True}
