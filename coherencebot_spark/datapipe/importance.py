"""DSIR-style importance weighting: rank corpus documents by how much
they look like a TARGET distribution (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023 — public
method).  The importance weight of a document is its average per-word
log-likelihood ratio between a target unigram LM (trained on a small
high-quality seed set) and a background LM (trained on the corpus
itself):

    w(doc) = (1/n) Σ_i  log p_target(w_i) − log p_background(w_i)

with add-one smoothing over a shared top-V vocabulary.  High w = the
document is target-like; resampling by w (compose with
:func:`datapipe.sampling.sample_fraction` or a threshold) is the DSIR
selection step.

Spark shape (the lm_typicality pattern):

* both LMs are ONE bounded-key aggregation each — the distinct-word
  table is vocabulary-bounded, not corpus-bounded, so map-side partial
  combine collapses the streams before their single shuffles;
* the shared vocabulary is top-V of the BACKGROUND counts via
  ``TakeOrderedAndProject`` (no full sort), ties broken (count DESC,
  word ASC) so the model is deterministic under any partitioning;
* the merged model (≤ vocab_limit rows: word, n_target, n_background)
  joins back as a BROADCAST; scoring is explode → broadcast-join → one
  per-doc combine (map-side partial).  The corpus never wide-shuffles.

DSIR proper hashes n-grams into a fixed bucket count instead of using a
top-V word vocabulary; the bounded-vocabulary form keeps identical
memory behavior (the model is capped either way) while staying exactly
expressible in the DuckDB oracle twin — note in the docstring of
:func:`dsir_weights` if hashing is ever needed, it drops in as
``pmod(xxhash64(word), n_buckets)`` on both sides of the model join.

At 10^10 docs: target is seed-sized by contract (same posture as
nbayes training); the background LM is one bounded aggregation over the
corpus; scoring is map-side except the per-doc combine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coherencebot_spark.datapipe.tokenizer import _words


def _unigram_counts(docs: DataFrame, text_col: str,
                    max_chars: int) -> DataFrame:
    return (docs
            .select(F.explode(_words(F.col(text_col), max_chars))
                    .alias("word"))
            .groupBy("word").agg(F.count("*").alias("n")))


def dsir_weights(docs: DataFrame, target: DataFrame, *,
                 text_col: str = "text", id_col: str = "doc_id",
                 vocab_limit: int = 200_000,
                 max_chars: int = 20_000) -> DataFrame:
    """(id_col, n_words, dsir_logw) for every document of ``docs``.

    ``dsir_logw`` is the average per-word log-ratio
    ``log((n_t+1)/(T_t+V)) − log((n_b+1)/(T_b+V))`` over a shared top-V
    background vocabulary; words outside the vocabulary score with both
    counts at 0 (pure smoothing mass), so junk outside the model pulls
    the weight toward the constant ``log((T_b+V)/(T_t+V))`` rather than
    dominating it.  Documents with no words at all carry that same
    neutral constant."""
    bg = _unigram_counts(docs, text_col, max_chars)
    tg = _unigram_counts(target, text_col, max_chars)

    vocab = (bg.orderBy(F.desc("n"), F.asc("word")).limit(vocab_limit)
             .select("word", F.col("n").alias("n_bg")))
    # materialize the ≤vocab_limit model ONCE (the lm_typicality
    # ExistingRDD pattern): the scoring broadcast below must not
    # re-derive — and so re-aggregate the corpus for — the same counts
    # the totals read
    rows = (vocab.join(tg.withColumnRenamed("n", "n_tg"), "word", "left")
            .select("word", "n_bg",
                    F.coalesce("n_tg", F.lit(0)).alias("n_tg"))
            .collect())
    model = docs.sparkSession.createDataFrame(
        rows, "word string, n_bg long, n_tg long")
    t_bg = sum(r["n_bg"] for r in rows)
    t_tg = sum(r["n_tg"] for r in rows)
    v = len(rows)

    words = docs.select(
        F.col(id_col),
        F.explode_outer(_words(F.col(text_col), max_chars)).alias("word"))
    # empty vocabulary (wordless corpus): every document is neutral-0
    neutral = math.log((t_bg + v) / (t_tg + v)) if v else 0.0
    logr = (F.log(F.coalesce(F.col("n_tg"), F.lit(0)) + 1.0)
            - F.log(F.coalesce(F.col("n_bg"), F.lit(0)) + 1.0)
            + F.lit(neutral))
    scored = (words
              .join(F.broadcast(model), "word", "left")
              .groupBy(id_col)
              .agg(F.sum(F.when(F.col("word").isNotNull(), 1)
                         .otherwise(0)).cast("int").alias("n_words"),
                   F.avg(F.when(F.col("word").isNotNull(), logr))
                   .alias("_avg")))
    return scored.select(
        id_col, "n_words",
        F.coalesce("_avg", F.lit(neutral)).alias("dsir_logw"))
