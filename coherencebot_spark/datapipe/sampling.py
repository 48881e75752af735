"""Deterministic sampling, stratified mixing, and upsampling — the
data-mixing half of a training-data pipeline.

``df.sample()`` draws from a per-partition RNG: the selection changes
with partitioning, retries, and cluster size, which makes 100 TB mixes
unreproducible and resume-unsafe.  Everything here instead derives the
keep/repeat decision from a HASH of a stable document key — the same
technique the engine's URL-seen sharding uses — so a re-run, a
different cluster, or an incremental extension of the corpus selects
the exact same documents:

* keep ⇔ ``md5(salt ‖ key)[:8] < hex(⌊fraction·2³²⌋)`` — an 8-nibble
  lowercase-hex prefix compared LEXICOGRAPHICALLY equals the numeric
  comparison, and md5 is bit-identical across engines (the DuckDB twin
  computes the same predicate, making the sample exactly verifiable).
* stratified mixing applies a per-stratum fraction (language, source,
  quality band) — one Project over the scan, no shuffle;
* upsampling repeats a document ``⌊w⌋ + (hash < frac(w))`` times via
  ``explode(sequence(...))`` — fractional epoch weights land
  deterministically per document instead of per run;
* train/eval splitting is the same predicate with a dedicated salt, so
  membership is stable forever (no eval-set leakage when the corpus
  grows — a document's split never changes).

All pure Catalyst expressions (md5/substring/concat are codegen'd JVM
calls); the only cost is one md5 per row — no RNG state, no shuffle, no
driver coordination.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["keep_fraction", "deterministic_sample", "stratified_sample",
           "deterministic_upsample", "train_eval_split",
           "cluster_safe_split", "cap_per_key"]

_SCALE = 1 << 32


def _threshold_hex(fraction: float) -> str:
    # only called for 0 < fraction < 1 (keep_fraction short-circuits
    # the degenerate ends)
    return format(int(float(fraction) * _SCALE), "08x")


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt),
                                      key.cast("string"))), 1, 8)


def keep_fraction(key: Column, fraction: float, salt: str = "") -> Column:
    """Boolean: this key falls inside the deterministic ``fraction``.

    ``fraction >= 1`` keeps everything, ``<= 0`` nothing; membership is
    NESTED across fractions (the 1% sample is a subset of the 10%
    sample at the same salt) — handy for scaling ablations."""
    f = float(fraction)
    if f >= 1.0:
        return F.lit(True)
    if f <= 0.0:
        return F.lit(False)
    return _hash_prefix(key, salt) < F.lit(_threshold_hex(f))


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         salt: str = "") -> DataFrame:
    """Stable ``fraction`` sample keyed by ``key_col``."""
    return df.filter(keep_fraction(F.col(key_col), fraction, salt))


def stratified_sample(df: DataFrame, fractions: Mapping[str, float],
                      strata_col: str, key_col: str = "doc_id",
                      salt: str = "", default: float = 0.0) -> DataFrame:
    """Per-stratum fractions (a data-mix recipe): keep each row with its
    stratum's fraction; strata not in the recipe get ``default``."""
    expr = keep_fraction(F.col(key_col), default, salt)
    for value, frac in fractions.items():
        expr = F.when(F.col(strata_col) == value,
                      keep_fraction(F.col(key_col), frac, salt)) \
            .otherwise(expr)
    return df.filter(expr)


def deterministic_upsample(df: DataFrame, weight: Column | float,
                           key_col: str = "doc_id", salt: str = "up",
                           copy_col: str = "copy") -> DataFrame:
    """Repeat each row ``⌊w⌋ + (hash < frac(w))`` times (fractional
    epoch weights); ``copy_col`` numbers the repetitions from 0 so a
    downstream global shuffle key can be ``(key, copy)``.  ``weight``
    may be a per-row Column (e.g. a quality-tiered map lookup)."""
    w = F.lit(float(weight)) if not isinstance(weight, Column) else weight
    frac = w - F.floor(w)
    frac_hex = F.lpad(F.conv(
        F.floor(frac * _SCALE).cast("long").cast("string"), 10, 16), 8, "0")
    extra = F.when(F.lower(frac_hex) > _hash_prefix(F.col(key_col), salt),
                   1).otherwise(0)
    copies = (F.floor(w).cast("int") + extra).alias("_n")
    return df.withColumn("_n", copies) \
        .filter(F.col("_n") > 0) \
        .withColumn(copy_col,
                    F.explode(F.sequence(F.lit(0), F.col("_n") - 1))) \
        .drop("_n")


def train_eval_split(df: DataFrame, eval_fraction: float,
                     key_col: str = "doc_id", salt: str = "split",
                     out_col: str = "split") -> DataFrame:
    """Stable ``train``/``eval`` membership column: a document's split
    never changes as the corpus grows (its hash doesn't)."""
    is_eval = keep_fraction(F.col(key_col), eval_fraction, salt)
    return df.withColumn(
        out_col, F.when(is_eval, F.lit("eval")).otherwise(F.lit("train")))


def cap_per_key(df: DataFrame, key_col: str, max_n: int,
                order_col: str) -> DataFrame:
    """Deterministic per-key contribution cap: keep the first ``max_n``
    rows of each key in ``order_col`` order (pass a UNIQUE column, e.g.
    the id — ties would make survivorship run-dependent) — the
    corpus-side analog of the
    generator's per-host cap, and the anti-domination gate of the
    LAION-style recipes: no single domain/source swamps the mix.

    Scale shape: a ``row_number() <= k`` window compiles to
    ``WindowGroupLimit`` (plan-asserted in tests) — every map task
    pre-prunes to k rows per key BEFORE the exchange, so a hot key
    (one domain with 10^8 images) costs k×P shuffled rows instead of
    its full multiplicity.  Skew never reaches the reducer."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= int(max_n)).drop("_rn")


def cluster_safe_split(docs: DataFrame, pairs: DataFrame,
                       eval_fraction: float,
                       id_col: str = "doc_id",
                       a_col: str = "a", b_col: str = "b",
                       salt: str = "split",
                       out_col: str = "split") -> DataFrame:
    """Leakage-free train/eval split: the split hash is keyed on the
    duplicate CLUSTER id (min member of the connected component over
    ``pairs``), not the document id, so a document and every one of its
    near-duplicates land in the same split.  Hash-splitting by doc id
    alone leaks eval content into train through surviving near-dups —
    the contamination mode n-gram decontamination
    (:mod:`.contamination`) then has to mop up; keying on the component
    closes it structurally.

    Returns ``docs`` + ``component`` + the split column.  Scale shape
    is :func:`..datapipe.components.dedup_clusters` (components frame
    holds paired docs only → broadcast left join over the doc scan;
    no full-corpus shuffle) followed by a pure md5-prefix Project."""
    from .components import dedup_clusters

    labeled = dedup_clusters(docs, pairs, id_col=id_col,
                             a_col=a_col, b_col=b_col) \
        .drop("is_canonical")
    return train_eval_split(labeled, eval_fraction,
                            key_col="component", salt=salt,
                            out_col=out_col)
