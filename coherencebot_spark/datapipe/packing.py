"""Sequence packing — concat-and-chunk training-example preparation.

LLM pretraining consumes fixed-length token sequences; the standard
recipe (public: GPT-2/3, T5's "pack until full", Llama) concatenates
documents in a deterministic order and slices the stream into
``chunk_tokens``-sized examples, letting documents straddle chunk
boundaries.  The hard part at 100 TB is the GLOBAL running offset — a
naive ``Window.orderBy(key)`` with no partition key collapses the whole
corpus into ONE task.  Here the offset is a two-level cumulative sum:

1. ``repartitionByRange(order)`` + ``sortWithinPartitions`` — global
   order across partitions, parallel within;
2. within-partition running sum — a window PARTITIONED by
   ``spark_partition_id()``, so every partition scans independently;
3. per-partition totals — a P-row aggregate (P = #partitions), the only
   driver traffic — broadcast back as each partition's base offset.

Token counts use the same whitespace tokenization as the quality
metrics (swap ``token_count_col`` for a BPE count column when one is
materialized).  The primary artifact is the chunk MANIFEST —
``(chunk_id, doc_id, doc_offset, chunk_offset, len)`` — which is what a
data loader actually needs (it can slice token arrays lazily);
``pack_chunks`` additionally materializes the chunk text for small-
scale inspection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_manifest", "pack_chunks"]


def _global_offsets(docs: DataFrame, order_col: str,
                    n_col: str, parallelism: int | None) -> DataFrame:
    """Add ``_start`` = sum of ``n_col`` over all rows strictly before
    this one in ``order_col`` order (two-level cumsum, see module
    docstring)."""
    parts = parallelism or docs.sparkSession.sparkContext.defaultParallelism
    d = docs.repartitionByRange(parts, F.col(order_col)) \
        .sortWithinPartitions(order_col) \
        .withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    d = d.withColumn("_local", F.coalesce(F.sum(n_col).over(w), F.lit(0)))
    totals = d.groupBy("_pid").agg(F.sum(n_col).alias("_tot")) \
        .collect()  # P rows — the only driver traffic
    base, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        base[row["_pid"]] = acc
        acc += row["_tot"] or 0
    offset = F.lit(0).cast("long")
    for pid, off in base.items():
        offset = F.when(F.col("_pid") == pid, F.lit(off)).otherwise(offset)
    return d.withColumn("_start", (offset + F.col("_local")).cast("long")) \
        .drop("_pid", "_local")


def _grouped_offsets(docs: DataFrame, group_col: str, order_col: str,
                     n_col: str, parallelism: int | None) -> DataFrame:
    """Per-group variant of :func:`_global_offsets`: ``_start`` = sum of
    ``n_col`` over rows of the SAME ``group_col`` strictly before this
    one in ``order_col`` order.

    Same two-level shape — range-partition by (group, order) so a
    group's rows are contiguous across partitions and ordered within,
    per-(partition, group) window sums, then a P×G-row totals collect
    (the only driver traffic; P×G stays tiny because G is a handful of
    buckets) joined back broadcast as base offsets.  A window
    partitioned by the group alone would collapse each group into one
    task — useless when G ≪ cores and fatal at 10^10 rows."""
    parts = parallelism or docs.sparkSession.sparkContext.defaultParallelism
    d = docs.repartitionByRange(parts, F.col(group_col), F.col(order_col)) \
        .sortWithinPartitions(group_col, order_col) \
        .withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid", group_col).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, -1)
    d = d.withColumn("_local", F.coalesce(F.sum(n_col).over(w), F.lit(0)))
    totals = d.groupBy("_pid", group_col).agg(F.sum(n_col).alias("_tot")) \
        .collect()  # P×G rows — the only driver traffic
    if any(row[group_col] is None for row in totals):
        # a null group key would vanish in the base-offset equi-join
        # below (null never equals null) — fail loudly instead of
        # silently dropping those rows
        raise ValueError(
            f"_grouped_offsets: null values in group column "
            f"{group_col!r}; filter or fill them before packing")
    base, acc = [], {}
    for row in sorted(totals, key=lambda r: (r[group_col], r["_pid"])):
        g = row[group_col]
        base.append((row["_pid"], g, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + (row["_tot"] or 0)
    gtype = docs.schema[group_col].dataType.simpleString()
    bdf = docs.sparkSession.createDataFrame(
        base, f"_pid int, {group_col} {gtype}, _base long")
    return d.join(F.broadcast(bdf), ["_pid", group_col]) \
        .withColumn("_start", (F.col("_base") + F.col("_local"))
                    .cast("long")) \
        .drop("_pid", "_local", "_base")


def chunk_manifest(docs: DataFrame, chunk_tokens: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   order_col: str | None = None,
                   token_count_col: str | None = None,
                   parallelism: int | None = None) -> DataFrame:
    """``(chunk_id, doc_id, doc_offset, chunk_offset, len)`` — one row
    per (chunk, contributing document) pair.  ``doc_offset`` is where
    the slice starts inside the document, ``chunk_offset`` where it
    lands inside the chunk; ``len`` tokens.  Every chunk except the last
    is exactly ``chunk_tokens`` long; zero-token documents vanish."""
    c = int(chunk_tokens)
    if token_count_col is None:
        n = F.size(F.filter(F.split(F.col(text_col), r"\s+"),
                            lambda w: w != "")).cast("long")
    else:
        n = F.col(token_count_col).cast("long")
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.col(order_col or id_col).alias("_ord"),
                    n.alias("_n")).filter(F.col("_n") > 0)
    d = _global_offsets(d, "_ord", "_n", parallelism)
    first = F.floor(F.col("_start") / c).cast("long")
    last = F.floor((F.col("_start") + F.col("_n") - 1) / c).cast("long")
    out = d.withColumn("chunk_id",
                       F.explode(F.sequence(first, last)))
    cstart = F.col("chunk_id") * c
    s = F.greatest(F.col("_start"), cstart)          # slice start, global
    e = F.least(F.col("_start") + F.col("_n"), cstart + c)
    return out.select(
        "chunk_id", "doc_id",
        (s - F.col("_start")).cast("long").alias("doc_offset"),
        (s - cstart).cast("long").alias("chunk_offset"),
        (e - s).cast("long").alias("len"))


def pack_chunks(docs: DataFrame, chunk_tokens: int,
                id_col: str = "doc_id", text_col: str = "text",
                order_col: str | None = None,
                parallelism: int | None = None) -> DataFrame:
    """Materialized chunks: ``(chunk_id, n_tokens, text)``.  Joins the
    manifest back to the docs (broadcast-sized manifest slices per doc)
    and assembles each chunk from its ordered pieces — chunks are
    bounded at ``chunk_tokens`` so the groupBy state is tiny."""
    man = chunk_manifest(docs, chunk_tokens, id_col, text_col,
                         order_col, parallelism=parallelism)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    src = docs.select(F.col(id_col).alias("doc_id"), words.alias("_ws"))
    pieces = man.join(src, "doc_id").select(
        "chunk_id", "chunk_offset",
        F.slice("_ws", (F.col("doc_offset") + 1).cast("int"),
                F.col("len").cast("int")).alias("_piece"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_offset", "_piece"))),
        lambda s: s["_piece"])
    return pieces.groupBy("chunk_id").agg(
        F.flatten(ordered).alias("_toks")
    ).select(
        "chunk_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.array_join("_toks", " ").alias("text"))
