"""BPE tokenizer + DSIR importance weighting.

The trainer is verified against an independent pure-Python reference
BPE (the subword-nmt algorithm written directly on strings, no shared
code with the module's word-type loop), and the distributed apply is
verified against per-word reference segmentation."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from coherencebot_spark.datapipe.importance import dsir_weights
from coherencebot_spark.datapipe.tokenizer import (
    END, bpe_segment, bpe_token_count, bpe_train, word_counts)

CORPUS = [
    "the cat sat on the mat",
    "the cats eat the oats",
    "that hat is the cat hat",
    "mats and hats and oats",
    "the the the cat cat sat",
]


def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE: operate on the flat multiset of WORD INSTANCES
    (not types) — slower, structurally different from the module."""
    import re
    words = [tuple(w) + (END,)
             for t in texts for w in re.findall("[a-z0-9]+", t.lower())]
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w in words:
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_words = []
        for w in words:
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    return merges


def _ref_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_word_counts(spark, docs):
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    import re
    want = Counter(w for t in CORPUS for w in re.findall("[a-z0-9]+",
                                                         t.lower()))
    assert got == dict(want)


def test_train_matches_reference(spark, docs):
    assert bpe_train(docs, n_merges=12) == _ref_train(CORPUS, 12)


def test_segment_matches_reference_apply(spark, docs):
    merges = bpe_train(docs, n_merges=10)
    rows = bpe_segment(docs, merges).orderBy("doc_id").collect()
    import re
    for r in rows:
        words = re.findall("[a-z0-9]+", CORPUS[r["doc_id"]].lower())
        want = [tok for w in words for tok in _ref_apply(w, merges)]
        assert r["bpe_tokens"] == want
        assert r["n_bpe_tokens"] == len(want)


def test_token_count_matches_segment(spark, docs):
    merges = bpe_train(docs, n_merges=10)
    seg = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_segment(docs, merges).collect()}
    cnt = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_count(docs, merges).collect()}
    assert seg == cnt


def test_segment_stages_long_merge_chains(spark, docs):
    # > stage_every merges: the chain must still produce reference output
    merges = bpe_train(docs, n_merges=30)
    rows = bpe_segment(docs, merges, stage_every=8).orderBy("doc_id") \
        .collect()
    import re
    words = re.findall("[a-z0-9]+", CORPUS[0].lower())
    want = [tok for w in words for tok in _ref_apply(w, merges)]
    assert rows[0]["bpe_tokens"] == want


def test_train_word_type_guard(spark, docs):
    with pytest.raises(ValueError, match="max_word_types"):
        bpe_train(docs, n_merges=2, max_word_types=3)


def test_empty_and_punct_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "!!! ??? ..."), (2, "ok")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            bpe_segment(df, [("o", "k")]).collect()}
    assert rows[0]["bpe_tokens"] == [] and rows[1]["bpe_tokens"] == []
    assert rows[2]["bpe_tokens"] == ["ok", END]


def test_dsir_weights_reference(spark, docs):
    # target = docs about cats (0, 2); background = all
    target = docs.where("doc_id in (0, 2)")
    got = {r["doc_id"]: r for r in
           dsir_weights(docs, target, vocab_limit=100).collect()}

    import re
    bg: Counter = Counter(w for t in CORPUS
                          for w in re.findall("[a-z0-9]+", t.lower()))
    tg: Counter = Counter(w for i in (0, 2)
                          for w in re.findall("[a-z0-9]+",
                                              CORPUS[i].lower()))
    v = len(bg)
    t_bg, t_tg = sum(bg.values()), sum(tg[w] for w in bg)
    for i, t in enumerate(CORPUS):
        ws = re.findall("[a-z0-9]+", t.lower())
        want = sum(math.log(tg.get(w, 0) + 1) - math.log(bg[w] + 1)
                   + math.log((t_bg + v) / (t_tg + v)) for w in ws) / len(ws)
        assert got[i]["n_words"] == len(ws)
        assert abs(got[i]["dsir_logw"] - want) < 1e-9
    # cat-docs must outrank the oats doc
    assert got[0]["dsir_logw"] > got[3]["dsir_logw"]
    assert got[2]["dsir_logw"] > got[3]["dsir_logw"]


def test_dsir_empty_doc_is_neutral(spark, docs):
    df = docs.unionByName(
        docs.sparkSession.createDataFrame([(99, "???")],
                                          "doc_id long, text string"))
    target = docs.where("doc_id = 0")
    row = {r["doc_id"]: r for r in
           dsir_weights(df, target, vocab_limit=100).collect()}[99]
    assert row["n_words"] == 0
    # exact neutral constant: log((T_b+V)/(T_t+V)) over the shared vocab
    import re
    bg: Counter = Counter(w for t in CORPUS
                          for w in re.findall("[a-z0-9]+", t.lower()))
    tg: Counter = Counter(re.findall("[a-z0-9]+", CORPUS[0].lower()))
    v = len(bg)
    t_bg, t_tg = sum(bg.values()), sum(tg[w] for w in bg)
    assert row["dsir_logw"] == pytest.approx(
        math.log((t_bg + v) / (t_tg + v)), abs=1e-9)
