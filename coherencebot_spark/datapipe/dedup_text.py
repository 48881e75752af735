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

from ..functions.hashing import xxh64_hash

# hash_fn(col, seed|None) -> Column.  Default xxh64_hash (JVM intrinsic);
# pass functions.hashing.md5_long60 to run the SAME operator logic under
# the DuckDB oracle (md5-prefix hash is computable in both engines).


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
    n = F.length(F.col(text_col)) - (k - 1)
    # guard the short-text case explicitly: sequence(1, 0) is the
    # DESCENDING array [1, 0], not empty — without the branch every
    # empty/short doc got a degenerate whole-text shingle ('' for empty
    # docs), and 10^6 empty extraction failures all sharing one shingle
    # is exactly the single-giant-LSH-bucket blowup the skew controls
    # exist to prevent
    sh_arr = F.when(
        n >= 1,
        F.slice(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substring(F.col(text_col), i, k),
            ),
            1, max_shingles,
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), sh_arr.alias("sh"))
        .select(id_col, F.explode(F.array_distinct("sh")).alias("shingle"))
    )


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 5,
                       n_hashes: int = 32,
                       max_shingles: int = 2048,
                       hash_fn=xxh64_hash) -> DataFrame:
    """(doc_id, sig array<long>[n_hashes]) — one explode + one groupBy."""
    sh = _shingles(docs, id_col, text_col, k, max_shingles)
    aggs = [
        F.min(hash_fn(F.col("shingle"), i)).alias(f"h{i}")
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
                      max_shingles: int = 2048,
                      hash_fn=xxh64_hash,
                      max_bucket: int | None = None,
                      pair_mode: str = "all") -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH; optionally verified
    with exact shingle-Jaccard.  Returns (id_a, id_b[, jaccard]), id_a < id_b.

    Skew controls for the 10^10-doc tier (hot bands = boilerplate text
    sharing a band hash → quadratic self-join blowup):

    * ``max_bucket`` — cap each (band, bh) bucket to its first N members
      (by id); overflow members are dropped from THAT band but usually
      recovered by their other bands.  Bounded worst case per bucket.
    * ``pair_mode="star"`` — emit only (bucket-min-id, other) pairs:
      O(bucket) instead of O(bucket²) candidates, connected-component
      equivalent to all-pairs for grouping dedup decisions.
    """
    assert n_hashes % bands == 0
    assert pair_mode in ("all", "star")
    rows = n_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, k, n_hashes,
                             max_shingles, hash_fn)
    banded = sig.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    hash_fn(
                        F.concat_ws(",", *[
                            F.element_at("sig", b * rows + r + 1).cast("string")
                            for r in range(rows)
                        ]),
                        None,
                    ).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    if max_bucket is not None:
        wb = Window.partitionBy("band", "bh").orderBy(F.asc(id_col))
        banded = (
            banded.withColumn("_bn", F.row_number().over(wb))
            .filter(F.col("_bn") <= int(max_bucket))
            .drop("_bn")
        )
    if pair_mode == "star":
        wb = Window.partitionBy("band", "bh")
        pairs = (
            banded.withColumn("_rep", F.min(id_col).over(wb))
            .filter(F.col(id_col) != F.col("_rep"))
            .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
            .distinct()
        )
    else:
        a = banded.alias("a")
        b = banded.alias("b")
        pairs = (
            a.join(b, ["band", "bh"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )
    if verify_threshold is None:
        return pairs
    jac = ngram_jaccard(docs, pairs, id_col, text_col, k, max_shingles)
    return jac.filter(F.col("jaccard") >= float(verify_threshold))


def ngram_jaccard(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 5,
                  max_shingles: int = 2048) -> DataFrame:
    """Exact shingle-Jaccard for given (id_a, id_b) pairs.

    Only docs that actually appear in ``pairs`` are shingled: a semi-join
    prunes the corpus BEFORE the explode, so verifying a handful of LSH
    candidates never re-shingles 10^10 documents."""
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    needed = docs.join(pair_ids, id_col, "left_semi")
    sh = _shingles(needed, id_col, text_col, k, max_shingles)
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
              text_col: str = "text",
              hash_fn=xxh64_hash, n_bits: int = 64) -> DataFrame:
    """(doc_id, simhash long): n-bit SimHash over whitespace tokens —
    explode + per-bit weighted sums, all JVM expressions.  ``n_bits=60``
    with ``md5_long60`` gives the DuckDB-portable variant."""
    toks = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = toks.select(id_col, hash_fn(F.col("tok"), None).alias("h"))
    # per bit: +1 if set else -1; sum; sign → bit.  shiftleft (not 1<<i
    # literals — bit 63 overflows a Java long literal)
    bit_sums = h.groupBy(id_col).agg(*[
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ])
    acc = F.lit(0).cast("long")
    for i in range(n_bits):
        acc = acc + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select(id_col, acc.alias("simhash"))


def _simhash_block_keys(n_chunks: int, max_hamming: int) -> list[tuple[int, ...]]:
    """All (n_chunks - max_hamming)-sized chunk combinations.

    Pigeonhole: a pair within hamming ≤ h differs in at most h chunks, so
    at least (n_chunks - h) chunks match exactly — the pair shares at least
    one combination key.  Wider keys (more chunks per key) shrink buckets
    exponentially: with 6 chunks / h=3, keys carry ~32 significant bits vs
    16 for the round-1 single-chunk scheme → ~65 000× smaller buckets at
    10^10 docs, at the cost of C(6,3)=20 keys per doc."""
    from itertools import combinations

    return list(combinations(range(n_chunks), n_chunks - max_hamming))


def simhash_near_dups(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_hamming: int = 3,
                      n_chunks: int = 6,
                      n_bits: int = 64,
                      max_bucket: int | None = None,
                      pair_mode: str = "all",
                      hash_fn=xxh64_hash,
                      sigs: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs by SimHash with scale-safe multi-chunk blocking.

    The simhash is split into ``n_chunks`` chunks; every combination of
    ``n_chunks - max_hamming`` chunks is a block key (exact recall at
    hamming ≤ max_hamming by pigeonhole — see :func:`_simhash_block_keys`).
    Candidates join on the combination key, then verify the true hamming
    distance.  Returns (id_a, id_b, hamming), id_a < id_b.

    Skew controls (same contract as :func:`minhash_lsh_pairs`):
    ``max_bucket`` caps each block bucket (overflow usually recovered via
    the other C-1 keys); ``pair_mode='star'`` emits only representative
    pairs — O(bucket) candidates, connected-component equivalent.
    Bucket-size distribution for tuning: :func:`simhash_block_stats`.
    """
    assert pair_mode in ("all", "star")
    sh = sigs if sigs is not None else simhash64(docs, id_col, text_col,
                                                hash_fn, n_bits)
    keys = _simhash_block_keys(n_chunks, max_hamming)
    width = n_bits // n_chunks
    mask = (1 << width) - 1

    def chunk(c: int):
        return F.shiftrightunsigned("simhash", c * width).bitwiseAND(F.lit(mask))

    # block-key value: the selected chunks PACKED into one long when they
    # fit (width × chunks-per-key ≤ 63 bits) — the former string
    # concat_ws allocated a ~20-char key per (row, combination) that then
    # crossed the blocking exchange and drove its hash/sort; the packing
    # is bijective per combination, so (bkey, v) groups identically and
    # the pair set is unchanged.  String fallback for wide configs.
    chunks_per_key = n_chunks - max_hamming

    def key_val(combo):
        if chunks_per_key * width <= 63:
            v = chunk(combo[0]).cast("long")
            for c in combo[1:]:
                v = F.shiftleft(v, width).bitwiseOR(chunk(c))
            return v.alias("v")
        return F.concat_ws(
            "|", *[chunk(c).cast("string") for c in combo]).alias("v")

    blocked = sh.select(
        id_col, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(ki).alias("bkey"), key_val(combo))
            for ki, combo in enumerate(keys)
        ])).alias("cc"),
    ).select(id_col, "simhash", "cc.bkey", "cc.v")
    if max_bucket is not None:
        wb = Window.partitionBy("bkey", "v").orderBy(F.asc(id_col))
        blocked = (
            blocked.withColumn("_bn", F.row_number().over(wb))
            .filter(F.col("_bn") <= int(max_bucket))
            .drop("_bn")
        )
    if pair_mode == "star":
        wb = Window.partitionBy("bkey", "v")
        rep = blocked.withColumn("_rep", F.min(id_col).over(wb)).withColumn(
            "_rep_sh", F.min_by("simhash", id_col).over(wb)
        )
        cand = (
            rep.filter(F.col(id_col) != F.col("_rep"))
            .select(
                F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"),
                F.col("_rep_sh").alias("ha"), F.col("simhash").alias("hb"),
            )
            .distinct()
        )
    else:
        a = blocked.alias("a")
        b = blocked.alias("b")
        cand = (
            a.join(b, ["bkey", "v"])
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


def simhash_block_stats(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", max_hamming: int = 3,
                        n_chunks: int = 6, n_bits: int = 64,
                        hash_fn=xxh64_hash) -> DataFrame:
    """Per-block-bucket sizes + implied candidate counts — the skew
    monitor a pipeline operator watches before choosing max_bucket.
    Returns (bkey, v, bucket_size, implied_pairs) sorted descending."""
    sh = simhash64(docs, id_col, text_col, hash_fn, n_bits)
    keys = _simhash_block_keys(n_chunks, max_hamming)
    width = n_bits // n_chunks
    mask = (1 << width) - 1

    def chunk(c: int):
        return F.shiftrightunsigned("simhash", c * width).bitwiseAND(F.lit(mask))

    blocked = sh.select(
        id_col,
        F.explode(F.array(*[
            F.struct(
                F.lit(ki).alias("bkey"),
                F.concat_ws("|", *[chunk(c).cast("string") for c in combo]).alias("v"),
            )
            for ki, combo in enumerate(keys)
        ])).alias("cc"),
    ).select(id_col, "cc.bkey", "cc.v")
    return (
        blocked.groupBy("bkey", "v")
        .agg(F.count("*").alias("bucket_size"))
        .withColumn(
            "implied_pairs",
            (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast("long"),
        )
        .orderBy(F.desc("bucket_size"))
    )


def dedup_lines(docs: DataFrame, max_count: int = 1,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """CCNet-style corpus-wide duplicated-line removal (Wenzek et al.
    2020 drop duplicated paragraphs before LM filtering): a non-blank
    line survives iff its trimmed form occurs ≤ ``max_count`` times
    across the WHOLE corpus; blank lines pass through untouched (they
    are structure, and counting them would delete every paragraph
    break).  Documents are reassembled in original line order; a doc
    whose every line was boilerplate comes back with empty text, never
    dropped.

    Returns (id, text, n_lines, n_dropped).

    Scale shape: three exchanges, all narrow and combinable — the line
    count aggregate (map-side partial over line keys), the count
    join-back keyed by the trimmed line, and the per-doc reassembly
    keyed by id.  Line payloads are bounded by the document length and
    never fan out (posexplode is linear, unlike shingling); no Python,
    no driver state."""
    ex = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))
    common = (ex.where(F.col("key") != "")
                .groupBy("key").agg(F.count("*").alias("c"))
                .where(F.col("c") > int(max_count))
                .select("key", F.lit(True).alias("_dup")))
    j = ex.join(common, "key", "left")
    keep = F.col("_dup").isNull() | (F.col("key") == "")
    kept_struct = F.when(keep, F.struct("pos", "line"))
    return (j.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["line"]),
            "\n").alias(text_col),
        F.count("*").cast("int").alias("n_lines"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("int").alias("n_dropped"),
    ))


def winnow_fingerprints(docs: DataFrame, k: int = 8, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_fn=None, max_chars: int = 2000) -> DataFrame:
    """MOSS winnowing (Schleimer et al., SIGMOD'03): per-doc selected
    k-gram fingerprints — the min rolling hash of each ``window``
    consecutive k-grams.  The winnowing guarantee: any substring of
    length ≥ k + window - 1 shared by two documents yields at least one
    SHARED selected fingerprint, at ~1/window the density of the full
    k-gram set.  Returns (id, fp), distinct per doc.

    Scale shape: grams and window-minima are higher-order array
    expressions over the truncated text — a pure Project, bounded by
    ``max_chars``; only the selected ~len/window fingerprints explode.
    ``hash_fn``: xxhash64 by default; pass ``md5_long60`` for the
    DuckDB-twin portable variant."""
    from coherencebot_spark.functions.hashing import xxh64_hash
    hf = hash_fn or xxh64_hash
    k, window = int(k), int(window)
    t = F.substring(F.col(text_col), 1, int(max_chars))
    # The truncated text is STAGED as its own column before the gram
    # lambda: referencing the ``substring(text, 1, max_chars)``
    # EXPRESSION from inside ``transform`` re-inlines (and re-copies)
    # the whole truncation per element — O(len²) character work per
    # document; a bound column reference is O(k) per element (measured
    # 10.5 → 6.1 s for the fingerprint pass at the 1M-doc bench tier).
    staged0 = (docs.where(F.length(t) >= k + window - 1)
                   .select(F.col(id_col), F.length(t).alias("_len"),
                           t.alias("_t")))
    grams = F.transform(
        F.sequence(F.lit(1), F.col("_len") - (k - 1)),
        lambda i: hf(F.substring(F.col("_t"), i, F.lit(k))),
    )
    # Window minima WITHOUT indexing back into the gram array: a lambda
    # like `j -> array_min(slice(grams, j, w))` inlines the whole grams
    # expression into every window element — O(len²) hash evaluations
    # per document (measured: 20k short docs took 156 s).  Zipping the
    # array with its own shifted copies is linear — and materializing
    # the gram array in its OWN projection first means the hash pass
    # runs exactly ONCE per doc instead of ``window`` times:
    # CollapseProject refuses to merge the projections because ``_g``
    # is non-cheap and referenced window times (plan-asserted in
    # tests; measured 2.2× on the bench corpus).
    staged = staged0.select(F.col(id_col), F.col("_len"),
                            grams.alias("_g"))
    g = F.col("_g")
    shifted = [F.slice(g, j + 1, 1 << 30) for j in range(1, window)]
    zipped = F.arrays_zip(g.alias("g0"),
                          *[s.alias(f"g{j}") for j, s in
                            enumerate(shifted, start=1)])
    mins = F.transform(
        zipped, lambda s: F.least(*[s[f"g{j}"] for j in range(window)]))
    # partial windows at the tail (null-padded zip entries) are excluded:
    # winnowing selects over full windows only
    n_windows = F.col("_len") - (k + window - 2)
    sel = F.array_distinct(F.slice(mins, 1, n_windows))
    return staged.select(F.col(id_col), F.explode(sel).alias("fp"))


def dedup_substrings(docs: DataFrame, k: int = 50,
                     id_col: str = "doc_id", text_col: str = "text",
                     hash_fn=None, max_tokens: int = 5000) -> DataFrame:
    """Exact-substring dedup at k-token granularity (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"),
    keep-first-occurrence: every k-token window whose whitespace-joined
    form occurs more than once across the WHOLE corpus is excised from
    every occurrence except the lexicographically first by
    ``(id, position)``.  Overlapping excised windows merge into spans
    automatically (removal is positional, not per-window), and the
    surviving tokens are reassembled in original order.  Documents
    shorter than ``k`` tokens produce no windows and pass through
    verbatim.  Unlike :func:`shared_passage_stats` (flag-level,
    winnowing-sampled) this CUTS the duplicated spans and is exact.

    Returns (id, text, n_tokens, n_removed).

    Scale shape: the token array is staged in its own projection (the
    CollapseProject discipline — BENCH.md lesson 3) so the split runs
    once; window keys are O(len·k) slice-and-hash work, linear per doc.
    The global first-occurrence is a ``min(struct(id, pos))`` aggregate
    per window key — map-side combinable, so a passage duplicated in
    millions of documents partial-aggregates instead of sorting one hot
    partition (the row_number formulation would); only keys with > 1
    occurrence survive into the join-back.  Excision is relational: each
    non-first window explodes to its k covered positions (O(dups·k),
    bounded), distinct-merged, and anti-marked against the token table —
    no per-doc Python, no interval-merge loop.  Three narrow combinable
    exchanges (key agg, key join-back, per-doc reassembly), the same
    shape as :func:`dedup_lines`; AQE skew-join covers a mega-duplicated
    key in the join-back.  ``hash_fn``: xxhash64 default; ``md5_long60``
    for the DuckDB-twin portable variant."""
    from coherencebot_spark.functions.hashing import xxh64_hash
    hf = hash_fn or xxh64_hash
    k = int(k)
    toks = F.slice(F.split(F.col(text_col), " "), 1, int(max_tokens))
    staged = docs.select(F.col(id_col), toks.alias("_t"),
                         F.size(toks).alias("_n"))
    # (id, wpos, wkey) for every k-token window; slicing the STAGED
    # column is a bound-reference copy (linear), not an expression
    # re-inline (quadratic — the winnowing trap above)
    wins = (
        staged.where(F.col("_n") >= k)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - (k - 1)),
                    lambda i: hf(
                        F.concat_ws(" ", F.slice(F.col("_t"), i, F.lit(k)))),
                )
            ).alias("_p0", "wkey"),
        )
        .select(F.col(id_col), (F.col("_p0") + 1).alias("wpos"), "wkey")
    )
    firsts = (wins.groupBy("wkey")
                  .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                      F.col("wpos").alias("p"))).alias("_f"),
                       F.count("*").alias("_c"))
                  .where(F.col("_c") > 1)
                  .select("wkey", "_f"))
    flagged = (wins.join(firsts, "wkey")
                   .where((F.col(id_col) != F.col("_f.i"))
                          | (F.col("wpos") != F.col("_f.p"))))
    covered = (flagged.select(
                   F.col(id_col),
                   F.explode(F.sequence(F.col("wpos"),
                                        F.col("wpos") + (k - 1))).alias("pos"))
                  .distinct()
                  .withColumn("_cut", F.lit(True)))
    tokens = (staged.select(F.col(id_col),
                            F.posexplode("_t").alias("_p0", "tok"))
                    .select(F.col(id_col), (F.col("_p0") + 1).alias("pos"),
                            "tok"))
    j = tokens.join(covered, [id_col, "pos"], "left")
    keep = F.col("_cut").isNull()
    kept_struct = F.when(keep, F.struct("pos", "tok"))
    return j.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["tok"]),
            " ").alias(text_col),
        F.count("*").cast("int").alias("n_tokens"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("int").alias("n_removed"),
    )


def shared_passage_stats(docs: DataFrame, k: int = 8, window: int = 4,
                         id_col: str = "doc_id", text_col: str = "text",
                         hash_fn=None, max_chars: int = 2000) -> DataFrame:
    """Cross-document repeated-passage detection via winnowing — the
    bounded cousin of Lee et al. 2022 exact-substring dedup: a
    fingerprint seen in > 1 document marks a shared passage of length
    ≥ k + window - 1.  Returns per-doc (id, n_fps, n_shared,
    shared_frac) for threshold filtering downstream.

    Scale shape: fingerprints are already distinct per doc, so the
    cross-doc count is one combinable aggregation; the join-back moves
    (fp, flag) pairs and the per-doc rollup is the second combinable
    aggregation — the same three-narrow-exchange shape as
    :func:`dedup_lines`, never all-pairs."""
    # the fingerprint pass (per-doc gram hash + window minima — the
    # expensive projection) feeds BOTH the cross-doc count and the
    # join-back: persist it so it is evaluated once, not twice (guide
    # §5: reuse > recompute; measured 9.3 s/pass at the 1M-doc bench
    # tier).  AQE broadcasts the shared-fp side at runtime when small,
    # so the fps side then never shuffles for the join.
    fps = winnow_fingerprints(docs, k, window, id_col, text_col,
                              hash_fn, max_chars).persist()
    common = (fps.groupBy("fp").agg(F.count("*").alias("ndocs"))
                 .where(F.col("ndocs") > 1)
                 .select("fp", F.lit(True).alias("_shared")))
    j = fps.join(common, "fp", "left")
    return j.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_fps"),
        F.sum(F.when(F.col("_shared"), 1).otherwise(0)).cast("int")
         .alias("n_shared"),
        F.round(F.sum(F.when(F.col("_shared"), 1).otherwise(0))
                / F.count("*"), 4).alias("shared_frac"),
    )
