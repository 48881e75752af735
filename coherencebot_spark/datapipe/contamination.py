"""Eval-set decontamination — n-gram overlap between a training corpus
and held-out benchmarks.

Standard practice in LLM corpus construction (public literature: GPT-3's
appendix describes 13-gram dedup against benchmarks; The Pile, PaLM and
Llama papers repeat the recipe): a training document that shares long
word n-grams with an eval document leaks the benchmark and must be
dropped or flagged.

Shape for 100 TB: the EVAL side is small by definition (benchmarks are
thousands of documents), so its n-gram set broadcasts; the TRAIN side
explodes to (doc, n-gram-key) pairs MAP-SIDE and flows straight into a
broadcast hash join — the corpus never shuffles, and only the matching
pairs (a tiny set) reach the per-document aggregation.  N-gram keys are
md5 prefixes, not raw strings, so the exploded rows stay narrow AND the
key is portable (DuckDB computes the identical md5, putting the whole
operator under the hard oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ngrams", "decontaminate"]


def ngrams(text: Column, n: int) -> Column:
    """array<string> of word ``n``-grams (lowercased, whitespace
    tokenized) in document order; empty below ``n`` words.

    Column-level convenience (small-scale / tests): the lambda slices
    back into the ``ws`` expression, which re-evaluates the split per
    gram.  The hot path (:func:`decontaminate`) uses the staged
    DataFrame form :func:`_with_keys` instead — split once, zip with
    shifted copies (BENCH.md round-4 finding #3)."""
    ws = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    m = F.size(ws) - (n - 1)
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), m),
                    lambda i: F.array_join(F.slice(ws, i, n), " ")))


def _with_keys(df: DataFrame, text_col: str, n: int,
               keep: "list[Column | str]") -> DataFrame:
    """(*keep, _keys) — the distinct md5-16 n-gram keys of each row,
    with the word split STAGED in its own projection so it is evaluated
    once, and the grams built by zipping the staged array with its n−1
    shifted copies (never re-splitting per gram index)."""
    ws = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                  lambda w: w != "")
    staged = df.select(*keep, ws.alias("_ws"))
    w = F.col("_ws")
    m = F.size(w) - (n - 1)
    zipped = F.arrays_zip(w.alias("w0"),
                          *[F.slice(w, j + 1, 1 << 30).alias(f"w{j}")
                            for j in range(1, n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)]))
    keys = F.transform(
        F.slice(grams, 1, F.greatest(m, F.lit(0))),
        lambda g: F.substring(F.md5(g), 1, 16))
    return staged.select(*staged.columns[:-1],
                         F.array_distinct(keys).alias("_keys"))


def decontaminate(train: DataFrame, eval_docs: DataFrame, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  max_hit_frac: float = 0.0,
                  keep_col: str | None = "contaminated") -> DataFrame:
    """Flag (or drop) training documents sharing any ``n``-gram with the
    eval set.

    Adds ``n_ngrams`` (distinct n-grams in the doc), ``n_hits``
    (distinct n-grams also present in ANY eval doc), ``hit_frac``, the
    sorted ``eval_ids`` the doc collides with, and the ``contaminated``
    flag (``hit_frac > max_hit_frac``; the default 0.0 flags a single
    shared n-gram, GPT-3's rule).  With ``keep_col=None`` contaminated
    rows are filtered out instead."""
    ev = _with_keys(eval_docs, eval_text_col, n,
                    [F.col(eval_id_col).alias("_eval_id")]) \
        .select("_eval_id", F.explode("_keys").alias("_key")).distinct()
    from pyspark.sql.types import ArrayType

    # one staged key pass per train row serves BOTH the candidate
    # explode and the n_ngrams count (previously two full recomputes)
    keyed = _with_keys(train, text_col, n, list(train.columns))
    exploded = keyed.select(
        F.col(id_col).alias("_id"), F.explode("_keys").alias("_key"))
    # only MATCHING pairs survive the broadcast join; the per-doc agg
    # and the join-back are over this tiny hit set, never the corpus
    hits = exploded.join(F.broadcast(ev), "_key").groupBy("_id").agg(
        F.count_distinct("_key").alias("n_hits"),
        F.array_sort(F.collect_set("_eval_id")).alias("eval_ids"))
    eval_id_type = ArrayType(eval_docs.schema[eval_id_col].dataType)
    out = keyed.withColumn(
        "n_ngrams", F.size("_keys").cast("long")).drop("_keys") \
        .join(F.broadcast(hits), keyed[id_col] == hits["_id"], "left") \
        .drop("_id") \
        .withColumn("n_hits",
                    F.coalesce("n_hits", F.lit(0)).cast("long")) \
        .withColumn("eval_ids",
                    F.coalesce("eval_ids", F.array().cast(eval_id_type)))
    hit_frac = F.when(F.col("n_ngrams") > 0,
                      F.col("n_hits") / F.col("n_ngrams")) \
        .otherwise(F.lit(0.0))
    out = out.withColumn("hit_frac", hit_frac)
    flag = F.col("hit_frac") > F.lit(float(max_hit_frac))
    if keep_col is None:
        return out.filter(~flag)
    return out.withColumn(keep_col, flag)
