"""Distributed BPE tokenizer: corpus-trained merges, JVM-side apply.

The token-counting surface in :mod:`text_quality` is a BPE-ish regex
heuristic; real training-data pipelines budget and pack by the tokens an
actual subword tokenizer produces.  This module supplies that as three
Spark-first pieces:

* :func:`word_counts` — the classic (word, count) table, one bounded-key
  aggregation (map-side partial combine, vocabulary-bounded shuffle);
* :func:`bpe_train` — byte-pair-merge learning over the WORD-TYPE table,
  which is vocabulary-bounded, not corpus-bounded: at 10^10 documents
  the distinct-word table is still ~10^6 rows, so the driver-side merge
  loop (the lm_typicality / IVF-codebook "bounded model collect"
  pattern) costs O(n_merges × total word-type chars) with a hard
  ``max_word_types`` guard that raises before an unbounded collect;
* :func:`bpe_segment` / :func:`bpe_token_count` — distributed apply as a
  chain of PLAIN string replaces, entirely JVM-side whole-stage-codegen
  expressions: no Python, no UDF, no shuffle.

Apply encoding — why plain ``replace`` is exactly BPE here: a word is
encoded symbol-by-symbol as ``(h)(e)(l)(l)(o)(_)`` (``(_)`` is the
word-end marker symbol).  Merging pair ``(a, b)`` is then the literal
replacement ``"(a)(b)" → "(ab)"``.  Because every symbol is wrapped in
its own parentheses, a pair occurrence consumes exactly its two symbols
and two adjacent occurrences share no characters — so a single-pass
non-overlapping global ``replace`` merges every occurrence left-to-right,
which is precisely the greedy leftmost semantics of applying BPE merges
in rank order.  Documents apply merges on ONE concatenated string (words
joined by a space); no pair pattern can span the space, so cross-word
merges are impossible by construction.  The same chain is expressible
verbatim in ANSI SQL (`replace(replace(...))`), which is what makes the
oracle twin exact.

Reference parity: the reference has no tokenizer (it indexes raw text);
this is part of the training-data-pipeline surface the graft adds
(brief: "token counting (whitespace + a BPE-ish regex)" — upgraded here
to a real learned-merge BPE).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: word tokenization rule shared by train and apply (and the SQL twin):
#: lowercased maximal [a-z0-9] runs — punctuation and whitespace drop out.
WORD_PATTERN = "[a-z0-9]+"

#: word-end marker symbol (a char outside WORD_PATTERN, so it can never
#: collide with a character symbol).
END = "_"


def _words(text: Column, max_chars: int) -> Column:
    return F.regexp_extract_all(
        F.lower(F.substring(text, 1, max_chars)),
        F.lit(WORD_PATTERN), F.lit(0))


def word_counts(docs: DataFrame, text_col: str = "text",
                max_chars: int = 20_000) -> DataFrame:
    """(word, n) over the corpus — BPE training input.

    One explode + one hash aggregation whose key space is the corpus
    vocabulary (bounded), so map-side partial aggregation collapses the
    per-partition stream before the single shuffle."""
    return (docs
            .select(F.explode(_words(F.col(text_col), max_chars))
                    .alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def bpe_train(docs: DataFrame, n_merges: int = 64, *,
              text_col: str = "text", max_chars: int = 20_000,
              min_count: int = 1,
              max_word_types: int = 1_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Distributed part: the (word, count) aggregation.  Driver part: the
    merge loop over WORD TYPES (each distinct word once, weighted by its
    count) — the standard trick that makes BPE training cost independent
    of corpus size.  ``max_word_types`` guards the collect: exceeding it
    raises with the knob to turn (raise the cap, or raise ``min_count``
    to drop hapax types) instead of silently pulling an unbounded table
    through the driver (the nbayes-guard pattern)."""
    wc = word_counts(docs, text_col, max_chars)
    if min_count > 1:
        wc = wc.where(F.col("n") >= min_count)
    n_types = wc.count()
    if n_types > max_word_types:
        raise ValueError(
            f"bpe_train: {n_types} distinct word types exceed "
            f"max_word_types={max_word_types}; raise the cap or raise "
            f"min_count (currently {min_count}) to drop rare types — "
            "the driver-side merge loop is bounded by this table")
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END,): r["n"] for r in wc.collect()}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, n in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic: max count, ties broken by lexicographically
        # smallest pair (so train is reproducible across partitionings)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _encoded_doc(text: Column, max_chars: int) -> Column:
    """Whole document as one merge-ready string:
    ``(h)(e)(l)(l)(o)(_) (w)(o)(r)(l)(d)(_)``."""
    return F.array_join(
        F.transform(
            _words(text, max_chars),
            lambda w: F.concat(F.regexp_replace(w, "(.)", r"($1)"),
                               F.lit(f"({END})"))),
        " ")


def _apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    for a, b in merges:
        col = F.replace(col, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
    return col


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]],
                text_col: str = "text", max_chars: int = 20_000,
                stage_every: int = 48) -> DataFrame:
    """docs + ``bpe_tokens`` (array<string>, word-end marker ``_``
    attached to each word-final token) + ``n_bpe_tokens``.

    The merge chain is plain nested ``replace`` — JVM codegen, no
    Python.  Every ``stage_every`` merges the running expression is
    staged in its own projection: a single janino method holding
    hundreds of nested string builders can blow the JIT method limit
    (the round-4 IVF unrolling lesson), and staging also keeps each
    codegen span a bounded size.  Cost is O(n_merges × doc length) char
    scans per document, embarrassingly parallel, zero shuffles."""
    staged = docs.withColumn("_enc", _encoded_doc(F.col(text_col),
                                                  max_chars))
    for i in range(0, len(merges), stage_every):
        staged = staged.withColumn(
            "_enc", _apply_merges(F.col("_enc"),
                                  merges[i:i + stage_every]))
    toks = F.regexp_extract_all(F.col("_enc"), F.lit(r"\(([^)]*)\)"),
                                F.lit(1))
    return (staged
            .withColumn("bpe_tokens", toks)
            .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
            .drop("_enc"))


def bpe_token_count(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text",
                    max_chars: int = 20_000) -> DataFrame:
    """docs + ``n_bpe_tokens`` only — counts tokens as the number of
    ``(`` in the merged string, skipping token-array materialization
    (the packing/budgeting hot path needs only the count)."""
    staged = docs.withColumn("_enc", _encoded_doc(F.col(text_col),
                                                  max_chars))
    for i in range(0, len(merges), 48):
        staged = staged.withColumn(
            "_enc", _apply_merges(F.col("_enc"), merges[i:i + 48]))
    n = (F.length("_enc")
         - F.length(F.replace(F.col("_enc"), F.lit("(")))).cast("int")
    return staged.withColumn("n_bpe_tokens", n).drop("_enc")
