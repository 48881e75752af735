"""parsefilter-naivebayes: tokenizer parity, train/classify arithmetic,
model file round-trip, outlink rescue semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from coherencebot_spark.operators.nbayes import (
    NBModel, java_tokens, naive_bayes_parse_filter, nb_relevant_col,
    parse_train_lines, read_model, train_nb, write_model,
)

CORPUS = [
    ("1", "open data portal with research data"),
    ("1", "research publications and data archive"),
    ("0", "buy cheap pills casino bonus"),
    ("0", "casino bonus spins casino"),
]


def _model(spark) -> NBModel:
    return train_nb(spark.createDataFrame(CORPUS, "label string, text string"))


def test_java_tokens_split_semantics(spark):
    df = spark.createDataFrame(
        [("a  b!",), ("",), ("   ",), ("x9y z  ",)], "t string")
    got = [r["v"] for r in
           df.select(java_tokens(F.col("t")).alias("v")).collect()]
    # Java: interior empties kept, trailing removed, "" -> [""], "   " -> []
    assert got == [["a", "", "b"], [""], [], ["xy", "z"]]


def test_parse_train_lines_first_occurrence_only():
    assert parse_train_lines(["1\tkeep\tthis 1\ttab"]) == [
        ("1", "keep\tthis 1\ttab")]


def test_train_counts(spark):
    m = _model(spark)
    assert (m.n_ir, m.n_r) == (2, 2)
    assert m.words_ir == 9 and m.words_r == 11
    assert m.freq_r["data"] == 3 and m.freq_ir["casino"] == 3
    assert "" not in m.freq_ir and "" not in m.freq_r
    # vocab: distinct tokens across both classes
    vocab = set()
    for _, text in CORPUS:
        vocab.update(text.lower().split(" "))
    assert m.vocab_size == len(vocab)


def test_classify_matches_reference_arithmetic(spark):
    m = _model(spark)

    def ref_classify(text):  # Classify.java:54-117 transcription
        toks = []
        cleaned = "".join(c for c in text.lower()
                          if c.isalpha() or c == " ")
        stripped = cleaned.rstrip(" ")
        if cleaned == "":
            toks = [""]
        elif stripped == "":
            toks = []
        else:
            toks = stripped.split(" ")
        def score(freq, numwords, n_self):
            s = 0.0
            for w in toks:
                if w in freq:
                    s += math.log(freq[w]) + 1 - math.log(
                        numwords + m.vocab_size)
                else:
                    s += 1 - math.log(numwords + m.vocab_size)
            return s + math.log(n_self) - math.log(m.n_ir + m.n_r)
        return not (score(m.freq_ir, m.words_ir, m.n_ir)
                    > score(m.freq_r, m.words_r, m.n_r))

    texts = ["research data is great", "casino bonus pills now",
             "data casino", "", "unrelated words entirely"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["v"] for r in df.select(
        nb_relevant_col(m, F.col("text")).alias("v")).collect()]
    assert got == [ref_classify(t) for t in texts]
    assert got[0] is True and got[1] is False


def test_outlink_rescue(spark):
    m = _model(spark)
    rows = [
        ("research data archive portal",  # relevant -> outlinks untouched
         [("http://x/casino", "a"), ("http://x/other", "b")]),
        ("casino casino bonus pills",     # irrelevant -> wordlist rescue
         [("http://x/data/set", "a"), ("http://x/other", "b")]),
    ]
    df = spark.createDataFrame(
        rows, "text string, outlinks array<struct<to_url:string,anchor:string>>")
    out = naive_bayes_parse_filter(m, ["data"])(df).collect()
    assert [o["to_url"] for o in out[0]["outlinks"]] == [
        "http://x/casino", "http://x/other"]
    assert out[0]["nb_relevant"] is True
    assert [o["to_url"] for o in out[1]["outlinks"]] == ["http://x/data/set"]
    assert out[1]["nb_relevant"] is False


def test_model_file_round_trip(spark, tmp_path):
    m = _model(spark)
    p = str(tmp_path / "naivebayes-model")
    write_model(m, p)
    assert read_model(p) == m


def test_train_nb_vocab_guard(spark):
    """The trainer collects per-word frequencies to the driver (seed-scale
    training file by contract); max_vocab fails fast with an actionable
    error when pointed at corpus-sized input."""
    import pytest

    from coherencebot_spark.operators.nbayes import train_nb

    def w(p, i):  # letter-only words: the tokenizer strips digits
        return p + "abcdefghij"[i // 10] + "abcdefghij"[i % 10]

    ex = spark.createDataFrame(
        [("1", f"{w('x', i)} {w('y', i)} {w('z', i)}") for i in range(40)]
        + [("0", w("q", i)) for i in range(10)], "label string, text string")
    with pytest.raises(ValueError, match="max_vocab"):
        train_nb(ex, max_vocab=50)
    m = train_nb(ex, max_vocab=1000)
    assert m.vocab_size > 50
