"""parsefilter-naivebayes — relevance-gated outlink pruning.

Reference: ``parsefilter-naivebayes/.../NaiveBayesParseFilter.java:49-197``
(filter semantics: a page classified irrelevant keeps only the outlinks
whose URL contains a wordlist word), ``Train.java:68-146`` (the model is
per-class example/word counts plus a word→frequency map over a labeled
``label\\ttext`` file), ``Classify.java:54-117`` (the add-log score with
the reference's exact smoothing arithmetic, ties classify as relevant).

Spark-first: training is ONE DataFrame aggregation (tokenize → explode →
groupBy) so a labeled corpus of any size trains distributed; the model
folds to a small driver-side object (training files are curated example
sets) embedded as map LITERALS, and classification + outlink filtering
are pure JVM expressions — ``aggregate`` over the token array with
``element_at`` lookups, no Python in the per-row path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "NBModel", "java_tokens", "train_nb", "parse_train_lines",
    "write_model", "read_model", "nb_relevant_col",
    "naive_bayes_parse_filter",
]


def java_tokens(col: Column) -> Column:
    """``line.replaceAll("[^a-zA-Z ]", "").toLowerCase().split(" ")`` with
    Java's split semantics: trailing empty strings removed, interior ones
    kept, and the empty string splitting to ``[""]`` (Train.java:99,
    Classify.java:61-62)."""
    cleaned = F.lower(F.regexp_replace(col, "[^a-zA-Z ]", ""))
    stripped = F.regexp_replace(cleaned, " +$", "")
    return (
        F.when(cleaned == "", F.array(F.lit("")))
        .when(stripped == "", F.array().cast("array<string>"))
        .otherwise(F.split(stripped, " "))
    )


@dataclass(frozen=True)
class NBModel:
    """The 9-line ``naivebayes-model`` file as a value (Train.java:126-141:
    vocab size, then per class its example count, word count, and
    ``word:freq`` map)."""

    vocab_size: int
    n_ir: int
    words_ir: int
    freq_ir: dict
    n_r: int
    words_r: int
    freq_r: dict


def parse_train_lines(lines: list[str]) -> list[tuple[str, str]]:
    """One ``label\\ttext`` example per line.  The reference takes
    ``split("\\t")[0]`` as the target and removes only the FIRST
    occurrence of ``target + "\\t"`` (Train.java:34-43,95-97), so extra
    tabs stay in the text."""
    out = []
    for line in lines:
        target = line.split("\t")[0]
        out.append((target, line.replace(target + "\t", "", 1)))
    return out


def train_nb(examples: DataFrame, label_col: str = "label",
             text_col: str = "text",
             max_vocab: int = 1_000_000) -> NBModel:
    """Distributed Train.start: per-class example counts, token counts
    (INCLUDING interior empty tokens — ``linearray.length``), word→freq
    maps (empty tokens skipped — ``updateHashMap``), and the shared
    unique-word count (empty tokens INCLUDED — ``uniquewords.add`` has no
    guard).  Classes: ``"0"`` = irrelevant, anything else = relevant
    (Train.java:104-120's if/else).

    The frequency maps are collected to the driver — correct by the
    reference's contract (``parsefilter-naivebayes`` trains on a
    seed-scale labeled file, and the model is broadcast whole to every
    classify task, so it must fit in one process either way).
    ``max_vocab`` makes misuse loud: pointing the trainer at a corpus
    instead of a training file fails fast with an actionable error
    instead of silently materializing a corpus-sized dict."""
    toks = examples.select(
        (F.col(label_col) == "0").alias("is_ir"),
        java_tokens(F.col(text_col)).alias("toks"))
    toks = toks.persist()
    try:
        per_class = {
            r["is_ir"]: (r["n"], r["words"])
            for r in toks.groupBy("is_ir").agg(
                F.count("*").alias("n"),
                F.sum(F.size("toks")).alias("words")).collect()}
        word_rows = (toks.select("is_ir", F.explode("toks").alias("w"))
                     .persist())
        vocab_size = word_rows.select("w").distinct().count()
        if vocab_size > max_vocab:
            word_rows.unpersist()
            raise ValueError(
                f"train_nb: vocabulary {vocab_size} exceeds max_vocab="
                f"{max_vocab}. The naive-bayes trainer collects per-word "
                "frequencies to the driver (the reference broadcasts the "
                "whole model); it is meant for a seed-scale labeled "
                "training file, not a corpus. Raise max_vocab only if "
                "the model must really hold this many words.")
        freq = {(r["is_ir"], r["w"]): r["c"]
                for r in word_rows.filter(F.col("w") != "")
                .groupBy("is_ir", "w").count()
                .withColumnRenamed("count", "c").collect()}
        word_rows.unpersist()
    finally:
        toks.unpersist()
    n_ir, words_ir = per_class.get(True, (0, 0))
    n_r, words_r = per_class.get(False, (0, 0))
    return NBModel(
        vocab_size=vocab_size,
        n_ir=n_ir, words_ir=int(words_ir or 0),
        freq_ir={w: c for (is_ir, w), c in freq.items() if is_ir},
        n_r=n_r, words_r=int(words_r or 0),
        freq_r={w: c for (is_ir, w), c in freq.items() if not is_ir})


def write_model(model: NBModel, path: str) -> None:
    """The reference's ``naivebayes-model`` file format (Train.java:126-141)."""
    def flat(d: dict) -> str:
        return ",".join(f"{k}:{v}" for k, v in d.items())
    with open(path, "w") as f:
        f.write(f"{model.vocab_size}\n0\n{model.n_ir}\n{model.words_ir}\n"
                f"{flat(model.freq_ir)}\n1\n{model.n_r}\n{model.words_r}\n"
                f"{flat(model.freq_r)}\n")


def read_model(path: str) -> NBModel:
    """Classify.java:66-88's reader."""
    def unflat(line: str) -> dict:
        if not line:
            return {}
        return {f.split(":")[0]: int(f.split(":")[1])
                for f in line.split(",")}
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    return NBModel(vocab_size=int(lines[0]),
                   n_ir=int(lines[2]), words_ir=int(lines[3]),
                   freq_ir=unflat(lines[4]),
                   n_r=int(lines[6]), words_r=int(lines[7]),
                   freq_r=unflat(lines[8]))


def _class_score(toks: Column, freq: dict, numwords: int, vocab: int,
                 n_self: int, n_total: int) -> Column:
    """Classify.java:92-110: per word ``log(freq)+1-log(numwords+V)`` when
    known else ``1-log(numwords+V)``, plus the class prior
    ``log(n_class)-log(n_total)``.  All constants fold driver-side."""
    log_denom = math.log(numwords + vocab) if numwords + vocab > 0 else 0.0
    unseen = 1.0 - log_denom
    if freq:
        entries = []
        for w, c in freq.items():
            entries += [F.lit(w), F.lit(float(c))]
        fmap = F.create_map(*entries)
        per_word = lambda w: F.coalesce(  # noqa: E731
            F.log(F.element_at(fmap, w)) + F.lit(1.0 - log_denom),
            F.lit(unseen))
    else:
        per_word = lambda w: F.lit(unseen)  # noqa: E731
    prior = (math.log(n_self) if n_self > 0 else float("-inf")) - \
        (math.log(n_total) if n_total > 0 else 0.0)
    return F.aggregate(
        toks, F.lit(0.0),
        lambda acc, w: acc + per_word(w)) + F.lit(prior)


def nb_relevant_col(model: NBModel, text_col: Column) -> Column:
    """True when the text classifies relevant ("1"); the reference's
    strict ``prob_ir > prob_r`` means ties stay relevant
    (Classify.java:112-117).  The margin is rounded to 9 decimals before
    the comparison so exact mathematical ties (equal class evidence, a
    real case on symmetric corpora) don't flip on float summation order;
    genuine margins are O(0.1) log-units, far above the quantum."""
    toks = java_tokens(F.coalesce(text_col, F.lit("")))
    n_total = model.n_ir + model.n_r
    s_ir = _class_score(toks, model.freq_ir, model.words_ir,
                        model.vocab_size, model.n_ir, n_total)
    s_r = _class_score(toks, model.freq_r, model.words_r,
                       model.vocab_size, model.n_r, n_total)
    return ~(F.round(s_ir - s_r, 9) > 0)


def naive_bayes_parse_filter(model: NBModel, wordlist: list[str],
                             text_col: str = "text",
                             outlinks_col: str = "outlinks",
                             flag_col: str = "nb_relevant"):
    """The HtmlParseFilter (NaiveBayesParseFilter.filter:158-197): pages
    classified relevant keep their outlinks; irrelevant pages keep only
    outlinks whose URL CONTAINS a wordlist word (plain substring,
    ``containsWord`` :98-106) — the "second chance".  Adds ``flag_col``
    so downstream steps can see the verdict."""
    words = F.array(*[F.lit(w) for w in wordlist]) if wordlist else None

    def _apply(df: DataFrame) -> DataFrame:
        df = df.withColumn(flag_col, nb_relevant_col(model, F.col(text_col)))
        if outlinks_col not in df.columns:
            return df
        if words is None:
            rescued = F.array().cast(df.schema[outlinks_col].dataType)
        else:
            rescued = F.filter(
                F.col(outlinks_col),
                lambda o: F.exists(
                    words, lambda w: F.instr(o["to_url"], w) > 0))
        return df.withColumn(
            outlinks_col,
            F.when(F.col(flag_col), F.col(outlinks_col)).otherwise(rescued))

    return _apply
