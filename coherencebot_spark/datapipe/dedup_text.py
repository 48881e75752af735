"""Document deduplication for training-data pipelines.

Beyond the crawl engine's signature/phash dedup (operators/dedup.py), a
100 TB corpus pipeline needs content-level near-dup detection.  Four
strategies, all Spark-first:

* **exact** — hash-groupBy on ``md5(text)`` (JVM-side), keep the smallest
  doc_id per group; one shuffle, map-side partial agg.
* **MinHash + LSH** — shingle → n minhashes via ``xxhash64(shingle, seed_i)``
  (all JVM expressions: explode shingles once, ``groupBy(doc).agg(min)``
  per seed) → band hashes → bucket-join on (band, hash) → candidate pairs →
  optional exact-Jaccard verify.  The shuffle unit is (doc, shingle) — at
  scale, cap shingles per doc and salt hot bands.
* **SimHash** — 64-bit: per token, xxhash64; per bit, sum ±1 weighted;
  sign → bit.  Done with explode + groupBy + bit arithmetic, JVM-side.
* **n-gram Jaccard** — exact pairwise similarity over LSH candidates (or
  small corpora): explode n-grams, self-join on gram, count intersections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: (keep_id, dup_id) pairs, dup_id ≠ keep."""
    h = docs.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("h"))
    w = Window.partitionBy("h").orderBy(F.asc(id_col))
    ranked = h.withColumn("keep_id", F.first(id_col).over(w))
    return (
        ranked.filter(F.col(id_col) != F.col("keep_id"))
        .select("keep_id", F.col(id_col).alias("dup_id"))
    )


def _shingles(docs: DataFrame, id_col: str, text_col: str, k: int,
              max_shingles: int) -> DataFrame:
    """(doc_id, shingle) — character k-shingles, JVM-side via sequence+substring."""
    n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(0))
    return (
        docs.select(
            F.col(id_col),
            F.slice(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.substring(F.col(text_col), i, k),
                ),
                1, max_shingles,
            ).alias("sh"),
        )
        .select(id_col, F.explode(F.array_distinct("sh")).alias("shingle"))
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 5,
                       n_hashes: int = 32,
                       max_shingles: int = 2048) -> DataFrame:
    """(doc_id, sig array<long>[n_hashes]) — one explode + one groupBy."""
    sh = _shingles(docs, id_col, text_col, k, max_shingles)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 5,
                      n_hashes: int = 32, bands: int = 8,
                      verify_threshold: float | None = 0.7,
                      max_shingles: int = 2048) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH; optionally verified
    with exact shingle-Jaccard.  Returns (id_a, id_b[, jaccard]), id_a < id_b."""
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, k, n_hashes, max_shingles)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", *[
                            F.element_at("sig", b * rows + r + 1).cast("string")
                            for r in range(rows)
                        ])
                    ).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    if verify_threshold is None:
        return pairs
    jac = ngram_jaccard(docs, pairs, id_col, text_col, k, max_shingles)
    return jac.filter(F.col("jaccard") >= float(verify_threshold))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 5,
                  max_shingles: int = 2048) -> DataFrame:
    """Exact shingle-Jaccard for given (id_a, id_b) pairs."""
    sh = _shingles(docs, id_col, text_col, k, max_shingles)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sh_a, "id_a").join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(na, "id_a").join(nb, "id_b")
        .select(
            "id_a", "id_b",
            (F.coalesce(F.col("inter"), F.lit(0))
             / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0)))
             ).alias("jaccard"),
        )
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): 64-bit SimHash over whitespace tokens —
    explode + per-bit weighted sums, all JVM expressions."""
    toks = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = toks.select(id_col, F.xxhash64("tok").alias("h"))
    # per bit: +1 if set else -1; sum; sign → bit.  shiftleft (not 1<<i
    # literals — bit 63 overflows a Java long literal)
    bit_sums = h.groupBy(id_col).agg(*[
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ])
    acc = F.lit(0).cast("long")
    for i in range(64):
        acc = acc + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select(id_col, acc.alias("simhash"))


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4×16-bit chunks (any pair within
    hamming ≤3 shares at least one exact chunk), verify hamming distance."""
    sh = simhash64(docs, id_col, text_col)
    chunks = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
            )
            for c in range(4)
        ])).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.v")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(b, ["chunk", "v"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    ).filter(F.col("hamming") <= int(max_hamming)).select("id_a", "id_b", "hamming")
