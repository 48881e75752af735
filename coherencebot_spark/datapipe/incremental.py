"""Incremental corpus dedup — dedup a NEW batch against an append-only
historical corpus WITHOUT rescanning history.

At 100 TB the corpus grows by crawl-cycle batches; re-running exact
dedup over the whole store per batch is O(corpus) forever.  The
incremental shape mirrors the crawl's URL-seen design
(``functions/hashing.py``): the history is summarized once into sharded
Bloom bitmaps (≤ ~47 MB per shard at 10^10 keys, built where the data
lives), every new batch probes them (cogrouped by shard bucket — each
bitmap crosses the wire once per bucket, not per row), and only the
bloom-POSITIVE sliver touches the exact signature store for
verification (a semi-join pruned to maybe-seen rows; false-positive
rate ≈ fpp, so the history side reads ~fpp × |batch| rows, not
|history|).  Bloom false NEGATIVES don't exist, so definitely-new rows
skip the store entirely — the result is exact.

After accepting a batch, fold its signatures into the shards with
:func:`merge_bloom_shards` (bitwise OR per bucket — Bloom filters are
unionable) instead of rebuilding from history.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_signatures(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   sig_col: str = "sig") -> DataFrame:
    """Exact-dup signature frame (id, sig) — md5 of the raw text, the
    same signature exact_duplicates/pipeline exact dedup key on."""
    return docs.select(F.col(id_col), F.md5(F.col(text_col)).alias(sig_col))


def incremental_exact_dedup(batch: DataFrame, history_sigs: DataFrame,
                            blooms: DataFrame | None = None,
                            id_col: str = "doc_id", text_col: str = "text",
                            n_buckets: int = 256) -> DataFrame:
    """Rows of ``batch`` that are new: not byte-identical to any history
    doc, and the min-id representative of their signature within the
    batch.  Exact regardless of the bloom (it only prunes).

    ``history_sigs``: (id, sig) store, e.g. :func:`doc_signatures`
    persisted per accepted batch.  ``blooms``: optional sharded bitmaps
    over the sig column (``build_bloom_sharded(history_sigs, 'sig')``);
    when given, only bloom-positive rows join the store — at a 1% fpp
    the store-side read is ~1% of the batch instead of a full semi-join
    against 10^10 signatures."""
    from coherencebot_spark.functions.hashing import bloom_contains_sharded

    sigged = batch.withColumn("_sig", F.md5(F.col(text_col)))
    # intra-batch: keep the min-id copy per signature (one narrow shuffle)
    keep = (sigged.select(F.col(id_col).alias("_kid"), "_sig")
            .groupBy("_sig").agg(F.min("_kid").alias("_keep")))
    reps = sigged.join(
        keep, (sigged["_sig"] == keep["_sig"])
        & (sigged[id_col] == keep["_keep"]), "left_semi")

    hist = history_sigs.select(F.col("sig").alias("_sig"))
    if blooms is not None:
        probed = bloom_contains_sharded(reps, "_sig", blooms,
                                        out_col="_maybe",
                                        n_buckets=n_buckets)
        fresh = probed.where(~F.col("_maybe")).drop("_maybe")
        maybe = probed.where(F.col("_maybe")).drop("_maybe")
        verified = maybe.join(hist, "_sig", "left_anti")
        return fresh.unionByName(verified).drop("_sig")
    return reps.join(hist, "_sig", "left_anti").drop("_sig")


def merge_bloom_shards(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two sharded bloom frames (bucket, m, k, bits) by bitwise OR
    per bucket — the O(shards) way to fold an accepted batch's
    signatures into the history summary.  Shards must share (m, k);
    buckets present on one side only pass through."""
    schema = "bucket int, m long, k int, bits binary"

    def mrg(pdf: pd.DataFrame) -> pd.DataFrame:
        ms, ks = pdf["m"].unique(), pdf["k"].unique()
        if len(ms) > 1 or len(ks) > 1:
            raise ValueError(
                f"merge_bloom_shards: mismatched shard params m={ms} k={ks}"
                " — rebuild with identical capacity/fpp before merging")
        acc = None
        for raw in pdf["bits"]:
            arr = np.frombuffer(raw, dtype=np.uint64)
            acc = arr.copy() if acc is None else (acc | arr)
        return pd.DataFrame({
            "bucket": [int(pdf["bucket"].iloc[0])],
            "m": [int(ms[0])], "k": [int(ks[0])],
            "bits": [acc.tobytes()],
        })

    return (a.unionByName(b)
            .groupBy("bucket").applyInPandas(mrg, schema=schema))
