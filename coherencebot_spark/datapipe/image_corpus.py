"""Image+caption corpus pipeline over the crawl's content-table shape
``(image_id, bytes, w, h, fmt, caption, phash)`` — the image twin of
:mod:`.pipeline`'s text recipe (the LAION/DataComp skeleton: metadata
gates → caption gates → exact dedup → perceptual near-dedup → optional
decode validation → shard manifest).

Stage order is cheapest-first, and — more important at 100 TB — the
``bytes`` column NEVER crosses a shuffle: every wide stage (dedup argmax,
near-dup blocking, shard offsets) runs on a narrow ``(image_id, phash,
w, h, …)`` projection, and survivors rejoin the payload scan through a
broadcast-able id frame, mirroring the crawl cycle's payload posture
(``plans/cycle.py``).

1. **wellformed**  — pure Project filters on metadata columns: width /
   height floors, aspect-ratio cap, format allowlist, caption length +
   token bounds.  Catalyst pushes these into the parquet scan, so at
   rest the binary column of a rejected row-group is never decoded.
2. **caption language** — n-gram lang-id on the caption
   (:func:`..datapipe.text_quality.with_lang_id`, JVM regexes).
3. **exact phash dedup** — argmax per 64-bit perceptual hash: the
   largest-area copy survives (ties → min id).  One shuffle, on
   ``(image_id, phash, w, h)`` only.
4. **near dedup** — hamming ≤ h pairs via the multi-chunk pigeonhole
   blocking already built for SimHash (:func:`phash_near_dup_pairs`
   wraps :func:`..datapipe.dedup_text.simhash_near_dups` with the
   phash column as the precomputed signature — exact recall at the
   hamming radius, no O(n²) join), then connected components →
   cluster-canonical survivor (largest area wins).
5. **decode validation** (optional, Arrow path) — decode each surviving
   payload with the synthetic codecs and drop rows whose stored (w, h)
   disagree with the decoded pixels (a corrupt-payload gate; the wild-
   codec variant needs PIL/libvips and raises the documented
   ``NotImplementedError`` in :func:`..datapipe.multimodal.decode_rgb`).
6. **junk gate** (optional, Arrow path) — drop images whose decoded
   pixels carry no signal (tracking pixels, placeholder blanks,
   solid/two-tone banners) by luma entropy, modal-color share and luma
   std (:func:`junk_image_gate`) — the image analog of the Gopher
   quality floors.
7. **shard manifest** — assign survivors to byte-budgeted output shards
   by a global running sum of payload sizes (two-level cumsum, same
   pattern as :func:`..datapipe.packing.chunk_manifest`: one P-row
   collect, nothing wide touches bytes).  Images never split: a row
   belongs to the shard its start offset lands in, so shards overflow
   by at most one image.

Reference parity: the reference crawler dedups fetched images by phash
inside the frontier-update join (BASELINE north_star; DeduplicationJob
cadence in src/bin/crawl:421-422); this module is the corpus-side
(post-crawl, training-data) composition of the same primitives.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_text import simhash_near_dups
from .components import dedup_clusters

__all__ = [
    "ImageCorpusConfig",
    "wellformed_images",
    "alignment_score",
    "caption_alignment",
    "phash_near_dup_pairs",
    "image_exact_dedup",
    "eval_phash_decontaminate",
    "junk_image_gate",
    "retrieval_hits_at_k",
    "retrieval_recall_at_k",
    "caption_dedup",
    "aspect_bucket",
    "DEFAULT_ASPECT_LADDER",
    "vision_tokens",
    "vision_token_batches",
    "image_shard_manifest",
    "build_image_corpus",
    "write_image_shards",
    "read_image_shard",
]


@dataclass
class ImageCorpusConfig:
    id_col: str = "image_id"
    phash_col: str = "phash"
    bytes_col: str = "bytes"
    # stage toggles
    wellformed: bool = True
    caption_lang: bool = False
    exact_dedup: bool = True
    near_dedup: bool = True
    validate_decode: bool = False
    junk_gate: bool = False
    shard: bool = True
    # wellformed gates (LAION-style)
    min_w: int = 64
    min_h: int = 64
    max_aspect: float = 4.0
    formats: tuple = ()            # () = any format
    caption_min_chars: int = 5
    caption_max_chars: int = 512
    caption_min_tokens: int = 2
    # caption language gate
    languages: tuple = ("en",)
    # caption spam gate (LAION boilerplate-caption drop; default off to
    # keep the canonical audit stable)
    caption_dedup: bool = False
    caption_max_count: int = 1
    # near-dup radius (multi-chunk blocking: exact at this hamming)
    max_hamming: int = 3
    n_chunks: int = 6
    phash_bits: int = 64
    max_bucket: int | None = None
    pair_mode: str = "all"
    # CLIP-score alignment gate (default off: needs paired embedding
    # columns from an upstream encoder) — drops rows whose caption
    # embedding does not match the image embedding, the DataComp filter
    alignment_min: float | None = None
    img_emb_col: str = "img_emb"
    cap_emb_col: str = "cap_emb"
    # SemDeDup over an image-embedding column (default off): catches the
    # recompressed/rescaled/color-shifted variants that drift past the
    # phash hamming radius — the LAION-2B dedup recipe's semantic pass
    semantic: bool = False
    embedding_col: str | None = None
    semantic_threshold: float = 0.99
    semantic_centroids: int = 16
    semantic_max_cluster: int | None = None
    # junk-image gate thresholds (decoded-pixel statistics; the image
    # analog of the Gopher text-quality floors).  Defaults drop solid /
    # two-tone placeholder images while clearing natural content by a
    # wide margin (synthetic world: px_entropy ≈ 5.5-6, solid_frac < 0.05)
    junk_min_entropy: float = 1.5
    junk_max_solid: float = 0.90
    junk_min_std: float = 2.0
    # blur floor (Laplacian variance of luma).  None = off: smooth
    # synthetic gradients are legitimate content in the toy world, so
    # the default gate stays pixel-statistics-only; real corpora set
    # ~20-100 to drop defocused/heavily-recompressed frames
    junk_min_sharpness: float | None = None
    # sharding
    shard_bytes: int = 1 << 30     # 1 GiB target per output shard


def wellformed_images(images: DataFrame,
                      cfg: ImageCorpusConfig = ImageCorpusConfig(),
                      keep_col: str | None = None) -> DataFrame:
    """Metadata-only validity gates — a single Project/Filter, no bytes
    decoded, no shuffle (plan-asserted in tests).

    With ``keep_col`` the verdict is appended instead of filtering
    (audit mode)."""
    cap_toks = F.size(F.filter(F.split(F.col("caption"), r"\s+"),
                               lambda t: t != ""))
    aspect = F.greatest(F.col("w"), F.col("h")) / \
        F.least(F.col("w"), F.col("h"))
    ok = (
        F.col("w").isNotNull() & F.col("h").isNotNull()
        & (F.col("w") >= cfg.min_w) & (F.col("h") >= cfg.min_h)
        & (aspect <= cfg.max_aspect)
        & F.col("caption").isNotNull()
        & (F.length("caption") >= cfg.caption_min_chars)
        & (F.length("caption") <= cfg.caption_max_chars)
        & (cap_toks >= cfg.caption_min_tokens)
    )
    if cfg.formats:
        ok = ok & F.col("fmt").isin(*cfg.formats)
    if keep_col is not None:
        return images.withColumn(keep_col, ok)
    return images.filter(ok)


def alignment_score(img_col: Column, cap_col: Column) -> Column:
    """Cosine between an image-embedding and a caption-embedding column —
    the CLIP-score analog used by LAION/DataComp-style corpus recipes to
    drop images whose caption does not describe them.

    Pure JVM expressions (``zip_with`` product + left-fold sums), so the
    gate stays inside the Project above the scan: no Python, no shuffle,
    and Catalyst prunes every other column when only the verdict is
    consumed.  Zero-norm vectors (dead embeddings) score 0.0 instead of
    NaN so they are dropped by any positive threshold rather than
    poisoning downstream comparisons.
    """
    dot = F.aggregate(F.zip_with(img_col, cap_col, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    ni = F.sqrt(F.aggregate(img_col, F.lit(0.0), lambda a, v: a + v * v))
    nc = F.sqrt(F.aggregate(cap_col, F.lit(0.0), lambda a, v: a + v * v))
    denom = ni * nc
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot / denom)


def caption_alignment(pairs: DataFrame, img_col: str = "img_emb",
                      cap_col: str = "cap_emb",
                      min_score: float | None = 0.2,
                      score_col: str = "alignment") -> DataFrame:
    """CLIP-score gate over a DataFrame carrying paired image / caption
    embeddings (``array<float>`` or ``array<double>`` columns, produced
    by an upstream encoder — in this engine the embeddings arrive as
    table columns, the same contract as the ANN operators in
    :mod:`.similarity`).

    Appends ``score_col`` and, when ``min_score`` is not None, keeps
    only rows at or above it.  The score is rounded to 4 decimals
    BEFORE the threshold compare so the verdict is reproducible across
    engines and re-runs (the filter then never hinges on sub-1e-4
    float noise).  ``min_score=None`` = audit mode: score everything,
    drop nothing.

    100 TB shape: a narrow Project on whatever partitioning the input
    already has — composes with :func:`wellformed_images` before any
    dedup shuffle so misaligned pairs never enter the wide stages.
    """
    score = F.round(
        alignment_score(F.col(img_col).cast("array<double>"),
                        F.col(cap_col).cast("array<double>")), 4)
    out = pairs.withColumn(score_col, score)
    if min_score is None:
        return out
    return out.filter(F.col(score_col) >= min_score)


def phash_near_dup_pairs(images: DataFrame, id_col: str = "image_id",
                         phash_col: str = "phash",
                         max_hamming: int = 3, n_chunks: int = 6,
                         n_bits: int = 64,
                         max_bucket: int | None = None,
                         pair_mode: str = "all") -> DataFrame:
    """(id_a, id_b, hamming) pairs within ``max_hamming`` of each other's
    perceptual hash — EXACT at the radius by the pigeonhole blocking
    (the phash is split into ``n_chunks`` chunks; any pair with ≤ h
    differing bits agrees on some (n_chunks−h)-chunk combination key).

    Scale shape is inherited from the SimHash machinery it reuses
    (:func:`..datapipe.dedup_text.simhash_near_dups`): candidates are
    generated per combination-key bucket (never all-pairs), ``max_bucket``
    caps pathological buckets (a monochrome-thumbnail phash is the image
    world's empty-document simhash), ``pair_mode='star'`` bounds a
    bucket's output linearly when only connected components are needed."""
    sigs = images.select(id_col, F.col(phash_col).cast("long")
                         .alias("simhash"))
    return simhash_near_dups(
        images, id_col=id_col, max_hamming=max_hamming,
        n_chunks=n_chunks, n_bits=n_bits, max_bucket=max_bucket,
        pair_mode=pair_mode, sigs=sigs)


def image_exact_dedup(images: DataFrame,
                      id_col: str = "image_id",
                      phash_col: str = "phash") -> DataFrame:
    """Keep one copy per exact phash: max area, ties → min id.

    The argmax runs on a narrow (id, phash, w, h) projection — a
    ``max_by`` over a struct ordering, one shuffle on the phash key —
    and survivors rejoin the payload scan via a left-semi join on id,
    so ``bytes`` never enters the exchange."""
    narrow = images.select(
        F.col(id_col).alias("_id"), F.col(phash_col).alias("_ph"),
        (F.col("w").cast("long") * F.col("h")).alias("_area"))
    # composite argmax as two partial-aggregating groupBys (max area per
    # phash, then min id among that phash's max-area rows) — both
    # map-side combinable, unlike a row_number window
    best = narrow.groupBy("_ph").agg(F.max("_area").alias("_best"))
    keep = narrow.join(best, "_ph") \
        .filter(F.col("_area") == F.col("_best")) \
        .groupBy("_ph").agg(F.min("_id").alias("_keep"))
    return images.join(
        keep.select(F.col("_keep").alias(id_col)), id_col, "left_semi")


def junk_image_gate(images: DataFrame,
                    cfg: ImageCorpusConfig = ImageCorpusConfig(),
                    keep_col: str | None = None) -> DataFrame:
    """Drop junk images by decoded-pixel statistics — the image analog
    of the Gopher text-quality floors: tracking pixels, placeholder
    blanks, solid-color banners, and two-tone spacer graphics carry no
    training signal but pass every metadata gate.

    A row survives when ALL of
    ``px_entropy >= junk_min_entropy`` (luma histogram entropy, bits),
    ``solid_frac <= junk_max_solid`` (modal quantized-RGB share), and
    ``px_std >= junk_min_std`` (luma standard deviation); when
    ``cfg.junk_min_sharpness`` is set, also
    ``px_sharpness >= junk_min_sharpness`` (Laplacian-variance blur
    floor — drops defocused / heavily-blurred frames that still carry
    enough tonal spread to clear the entropy and std floors).  Null
    stats (null payload) fail the gate.

    Decode is one map-side Arrow pass over the scan
    (:func:`..datapipe.multimodal.with_image_quality_stats`); no
    shuffle, bytes pruned from everything downstream of the verdict.
    With ``keep_col`` the verdict is appended instead of filtering
    (audit mode), mirroring :func:`wellformed_images`."""
    from .multimodal import with_image_quality_stats

    stats = with_image_quality_stats(images, bytes_col=cfg.bytes_col)
    ok = ((F.col("px_entropy") >= cfg.junk_min_entropy)
          & (F.col("solid_frac") <= cfg.junk_max_solid)
          & (F.col("px_std") >= cfg.junk_min_std))
    if cfg.junk_min_sharpness is not None:
        ok = ok & (F.col("px_sharpness") >= cfg.junk_min_sharpness)
    ok = F.coalesce(ok, F.lit(False))
    if keep_col is not None:
        return stats.withColumn(keep_col, ok)
    return stats.filter(ok).drop("px_std", "px_entropy", "solid_frac",
                                 "px_sharpness")


def eval_phash_decontaminate(train: DataFrame, eval_images: DataFrame,
                             max_hamming: int = 3, n_chunks: int = 6,
                             n_bits: int = 64,
                             id_col: str = "image_id",
                             phash_col: str = "phash",
                             eval_phash_col: str | None = None,
                             keep_col: str | None = None) -> DataFrame:
    """Drop training images within hamming ≤ ``max_hamming`` of ANY
    eval-set image's perceptual hash — eval-set decontamination on the
    image axis (the DataComp/ImageNet-dedup posture: benchmark images
    and their near-duplicate reposts must not leak into training), the
    pixel-side twin of the caption pipeline's n-gram
    :mod:`..datapipe.contamination`.

    Exact recall at the radius by the same pigeonhole chunk blocking as
    :func:`phash_near_dup_pairs`, applied CROSS-TABLE: both sides
    explode into their C(n_chunks, n_chunks−h) combination keys, the
    eval side (tiny next to the corpus) broadcasts, the train side
    streams map-side into the broadcast hash join and verifies the true
    hamming on the spot — the corpus never shuffles for candidates, and
    only the distinct HIT ids (small) are aggregated for the final
    broadcast anti-join.  With ``keep_col`` the verdict is appended
    instead of filtering (audit mode)."""
    from .dedup_text import _simhash_block_keys

    keys = _simhash_block_keys(n_chunks, max_hamming)
    width = n_bits // n_chunks
    mask = (1 << width) - 1
    ephc = eval_phash_col or phash_col

    def blocked(df, idc, phc, pal):
        def chunk(c):
            return F.shiftrightunsigned(F.col(phc), c * width) \
                .bitwiseAND(F.lit(mask))
        return df.select(
            F.col(idc).alias(f"_{pal}_id"),
            F.col(phc).cast("long").alias(f"_{pal}_ph"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(ki).alias("bkey"),
                    F.concat_ws("|", *[chunk(c).cast("string")
                                       for c in combo]).alias("v"))
                for ki, combo in enumerate(keys)
            ])).alias("cc"),
        ).select(f"_{pal}_id", f"_{pal}_ph", "cc.bkey", "cc.v")

    tb = blocked(train, id_col, phash_col, "t")
    eb = blocked(eval_images.select(ephc).distinct(), ephc, ephc, "e")
    hits = (tb.join(F.broadcast(eb), ["bkey", "v"])
            .filter(F.bit_count(F.col("_t_ph").bitwiseXOR(F.col("_e_ph")))
                    <= int(max_hamming))
            .select(F.col("_t_id").alias(id_col))
            .distinct())
    if keep_col is not None:
        flag = hits.withColumn("_hit", F.lit(True))
        return train.join(F.broadcast(flag), id_col, "left") \
            .withColumn(keep_col, F.coalesce(~F.col("_hit"), F.lit(True))) \
            .drop("_hit")
    return train.join(F.broadcast(hits), id_col, "left_anti")


def retrieval_hits_at_k(pairs: DataFrame, k: int,
                        id_col: str = "image_id",
                        img_col: str = "img_emb",
                        cap_col: str = "cap_emb",
                        method: str = "brute",
                        **ann_kwargs) -> DataFrame:
    """Image→caption retrieval eval over paired embeddings: for every
    image, rank ALL captions in the pool by cosine and report where its
    own caption landed — the CLIP-style recall@k diagnostic (does the
    embedding space actually align the modalities this corpus trains?).

    Returns ``(image_id, pair_rank, hit)``: ``pair_rank`` = 1-based
    rank of the true caption among the pool (null when outside the
    top-k), ``hit`` = rank ≤ k.  Ties break to ascending id so the
    verdict is deterministic and engine-portable; embeddings are cast
    to double before scoring for the same reason.

    ``method='brute'`` is exact (crossJoin + window — retrieval eval
    pools are small by construction: rank-vs-everything is only
    meaningful on a few thousand pairs, and a 10^4 pool is a 10^8-row
    scored frame, still one modest stage).  ``method='lsh'`` routes
    the caption pool through :func:`..datapipe.similarity
    .cosine_topk_lsh` (pass dim/n_planes/... through ``ann_kwargs``)
    for bigger pools, then re-ranks every CLAIMED hit exactly against
    the full caption pool — so hits are a recall-bounded
    underestimate, the honest direction for a gate.  (The LSH rank
    alone is computed within the candidate subset only and can
    deflate when a stronger competitor is not a candidate — without
    the exact re-rank the error would be two-sided.)  The re-rank
    costs |claimed hits| x pool with the claimed side broadcast; the
    hit set is bounded by the query count, not the pool."""
    from .similarity import _dot, _norm, cosine_topk_bruteforce, \
        cosine_topk_lsh

    caps = pairs.select(F.col(id_col).alias("_cap_id"),
                        F.col(cap_col).cast("array<double>").alias("_v"))
    imgs = pairs.select(F.col(id_col),
                        F.col(img_col).cast("array<double>").alias("_v"))
    if method == "brute":
        topk = cosine_topk_bruteforce(caps, imgs, k, id_col="_cap_id",
                                      vec_col="_v", qid_col=id_col)
        own = topk.filter(F.col("_cap_id") == F.col(id_col)) \
            .select(id_col, F.col("rank").alias("pair_rank"))
    elif method == "lsh":
        topk = cosine_topk_lsh(caps, imgs, k, id_col="_cap_id",
                               vec_col="_v", qid_col=id_col, **ann_kwargs)
        claimed = topk.filter(F.col("_cap_id") == F.col(id_col)) \
            .select(id_col)
        # exact rank of the true caption for every claimed hit: count
        # the captions in the FULL pool that outrank it, same tie
        # order as the brute window (desc cosine, asc caption id)
        q = (pairs.join(F.broadcast(claimed), id_col, "left_semi")
             .select(F.col(id_col),
                     F.col(img_col).cast("array<double>").alias("_qv"),
                     F.col(cap_col).cast("array<double>").alias("_tv")))
        tcos = _dot(F.col("_qv"), F.col("_tv")) \
            / (_norm(F.col("_qv")) * _norm(F.col("_tv")))
        q = q.select(id_col, "_qv", tcos.alias("_tcos"))
        sc = caps.crossJoin(F.broadcast(q))
        cos = _dot(F.col("_v"), F.col("_qv")) \
            / (_norm(F.col("_v")) * _norm(F.col("_qv")))
        outranks = (cos > F.col("_tcos")) \
            | ((cos == F.col("_tcos")) & (F.col("_cap_id") < F.col(id_col)))
        own = (sc.groupBy(id_col)
               .agg((F.sum(outranks.cast("long")) + 1).alias("pair_rank"))
               .filter(F.col("pair_rank") <= int(k)))
    else:
        raise ValueError(f"unknown retrieval method {method!r}")
    return pairs.select(id_col).join(F.broadcast(own), id_col, "left") \
        .select(id_col, "pair_rank",
                F.col("pair_rank").isNotNull().alias("hit"))


def retrieval_recall_at_k(pairs: DataFrame, k: int,
                          id_col: str = "image_id",
                          img_col: str = "img_emb",
                          cap_col: str = "cap_emb",
                          method: str = "brute",
                          **ann_kwargs) -> DataFrame:
    """One-row summary of :func:`retrieval_hits_at_k`:
    ``(k, n_pairs, n_hits, recall)`` with recall rounded to 4 decimals
    (engine-portable compare)."""
    hits = retrieval_hits_at_k(pairs, k, id_col=id_col, img_col=img_col,
                               cap_col=cap_col, method=method, **ann_kwargs)
    return hits.agg(
        F.lit(int(k)).alias("k"),
        F.count("*").alias("n_pairs"),
        F.sum(F.col("hit").cast("long")).alias("n_hits"),
        F.round(F.avg(F.col("hit").cast("double")), 4).alias("recall"))


def caption_dedup(images: DataFrame,
                  id_col: str = "image_id",
                  caption_col: str = "caption",
                  max_count: int = 1) -> DataFrame:
    """Drop images whose normalized caption repeats corpus-wide more
    than ``max_count`` times, keeping the min-id copy of each repeated
    caption — the LAION-style spam gate (stock-photo boilerplate like
    "image may contain: person" arrives with thousands of distinct
    images attached; those rows add no caption signal).

    Same narrow-projection posture as :func:`image_exact_dedup`: the
    count and the keeper argmin run on (id, trimmed-lower caption) only,
    survivors rejoin the payload scan by left-semi join on id —
    ``bytes`` never enters an exchange."""
    key = F.trim(F.lower(F.col(caption_col)))
    narrow = images.select(F.col(id_col).alias("_id"), key.alias("_k"))
    counts = narrow.groupBy("_k").agg(F.count("*").alias("_c"),
                                      F.min("_id").alias("_keep"))
    keep = (narrow.join(counts, "_k")
            .where((F.col("_c") <= int(max_count))
                   | (F.col("_id") == F.col("_keep")))
            .select(F.col("_id").alias(id_col)))
    return images.join(keep, id_col, "left_semi")


# SDXL-style aspect-ratio ladder (subset): (bucket_w, bucket_h) targets a
# trainer crops/resizes into; ~1 MP each, aspect from 1:2 to 2:1
DEFAULT_ASPECT_LADDER = (
    (704, 1408), (768, 1344), (832, 1216), (896, 1152), (1024, 1024),
    (1152, 896), (1216, 832), (1344, 768), (1408, 704),
)


def aspect_bucket(images: DataFrame,
                  ladder: tuple = DEFAULT_ASPECT_LADDER,
                  id_col: str = "image_id",
                  keep_all: bool = False) -> DataFrame:
    """Aspect-ratio bucketing (the NovelAI/SDXL training trick: batch
    images of similar aspect so the resize-crop loss is minimal): each
    image goes to the ladder entry minimizing |ln(w/h) − ln(bw/bh)|,
    ties → the smaller ladder index.

    Pure projection — the ladder is a literal struct array and the
    argmin is an ``array_min`` over (distance, index), so bucketing adds
    zero exchanges; downstream batching reuses the shard manifest per
    bucket.  Returns (id, w, h, bucket_id, bucket_w, bucket_h) — or,
    with ``keep_all``, every input column plus the three bucket columns
    (the shape :func:`..datapipe.multimodal.resize_to_bucket` consumes:
    it still needs the payload)."""
    log_aspect = F.log(F.col("w").cast("double") / F.col("h"))
    cands = F.array(*[
        F.struct(
            F.abs(log_aspect - F.log(F.lit(float(bw)) / F.lit(float(bh))))
             .alias("d"),
            F.lit(i).alias("i"),
        )
        for i, (bw, bh) in enumerate(ladder)
    ])
    best = F.array_min(cands)["i"]
    bw = F.element_at(F.array(*[F.lit(w) for w, _ in ladder]), best + 1)
    bh = F.element_at(F.array(*[F.lit(h) for _, h in ladder]), best + 1)
    lead = list(images.columns) if keep_all else [id_col, "w", "h"]
    return images.select(*lead,
                         best.alias("bucket_id"),
                         bw.alias("bucket_w"), bh.alias("bucket_h"))


def vision_tokens(w_col: Column | str = "w", h_col: Column | str = "h",
                  patch: int = 14) -> Column:
    """ViT patch-token count at native resolution:
    ``ceil(w/patch) * ceil(h/patch)`` — the sequence length an image
    contributes to a vision-transformer batch (patch 14 = CLIP/SigLIP
    convention).  Pure integer arithmetic, stays in the Project."""
    w = F.col(w_col) if isinstance(w_col, str) else w_col
    h = F.col(h_col) if isinstance(h_col, str) else h_col
    p = int(patch)
    return (F.ceil(w.cast("double") / p) *
            F.ceil(h.cast("double") / p)).cast("long")


def vision_token_batches(images: DataFrame, token_budget: int,
                         patch: int = 14,
                         id_col: str = "image_id",
                         group_col: str | None = None,
                         order_col: str | None = None,
                         require_fit: bool = False,
                         extra_tokens: "Column | str | None" = None,
                         parallelism: int | None = None) -> DataFrame:
    """NaViT-style token-budget batch packing: assign images (in
    deterministic ``order_col`` order, optionally within a
    ``group_col`` such as the aspect bucket) to batches of at most
    ``token_budget`` vision tokens.

    Returns ``(image_id[, group_col], n_tokens, batch_id,
    batch_offset)``.  Offset-interval semantics, the same rows-never-
    split rule as :func:`image_shard_manifest`: an image belongs to the
    batch its running token offset lands in, so a batch overflows its
    budget by less than one image (a loader pads or defers the
    straddler).  ``require_fit=True`` instead drops images whose own
    token count exceeds the budget before packing.

    ``extra_tokens`` (column or name) adds per-row non-vision tokens to
    the budget arithmetic — e.g. a caption's token count for
    VLM-style interleaved image+text sequences, where each example
    consumes patch tokens AND its caption's text tokens.

    Scale shape: the running sum is the packing module's two-level
    cumsum — per-group it range-partitions on (group, order) so no
    group ever collapses into a single task, per-(partition, group)
    window sums, one P×G-row totals collect joined back broadcast
    (:func:`..datapipe.packing._grouped_offsets`).  Everything else is
    a Project; bytes are never touched."""
    from .packing import _global_offsets, _grouped_offsets

    n = vision_tokens(patch=patch)
    if extra_tokens is not None:
        ex = F.col(extra_tokens) if isinstance(extra_tokens, str) \
            else extra_tokens
        n = n + F.coalesce(ex.cast("long"), F.lit(0))
    keep = [id_col] + ([group_col] if group_col else [])
    d = images.select(*keep,
                      F.col(order_col or id_col).alias("_ord"),
                      n.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    if require_fit:
        d = d.filter(F.col("n_tokens") <= int(token_budget))
    if group_col:
        d = _grouped_offsets(d, group_col, "_ord", "n_tokens", parallelism)
    else:
        d = _global_offsets(d, "_ord", "n_tokens", parallelism)
    b = int(token_budget)
    return d.select(
        *keep, "n_tokens",
        F.floor(F.col("_start") / b).cast("long").alias("batch_id"),
        (F.col("_start") % b).cast("long").alias("batch_offset"))


def image_shard_manifest(images: DataFrame,
                         shard_bytes: int = 1 << 30,
                         id_col: str = "image_id",
                         size_col: Column | str | None = None,
                         order_col: str | None = None,
                         parallelism: int | None = None) -> DataFrame:
    """``(image_id, shard_id, shard_offset, nbytes)`` — byte-budgeted
    output shards in deterministic ``order_col`` order (default: id).

    An image is assigned to the shard where its global start offset
    lands (``floor(start / shard_bytes)``): rows never split, shards
    overflow by less than one image.  The running sum reuses the
    packing module's two-level cumsum — range-partition a narrow
    ``(id, nbytes)`` projection, per-partition window sums, one P-row
    totals collect — so the payload column never moves."""
    from .packing import _global_offsets

    if size_col is None:
        n = F.length(F.col("bytes")).cast("long")
    elif isinstance(size_col, str):
        n = F.col(size_col).cast("long")
    else:
        n = size_col.cast("long")
    d = images.select(F.col(id_col).alias("image_id"),
                      F.col(order_col or id_col).alias("_ord"),
                      n.alias("nbytes")).filter(F.col("nbytes") > 0)
    d = _global_offsets(d, "_ord", "nbytes", parallelism)
    sb = int(shard_bytes)
    return d.select(
        "image_id",
        F.floor(F.col("_start") / sb).cast("long").alias("shard_id"),
        (F.col("_start") % sb).cast("long").alias("shard_offset"),
        "nbytes")


def build_image_corpus(images: DataFrame,
                       cfg: ImageCorpusConfig = ImageCorpusConfig(),
                       ) -> tuple[DataFrame, dict[str, int]]:
    """Run the enabled stages in canonical order.

    Returns ``(result, audit)``: the shard manifest joined back to the
    surviving rows when ``cfg.shard``, else the surviving image frame;
    ``audit`` maps stage → row count after the stage (one aggregate per
    enabled stage, same contract as
    :func:`..datapipe.pipeline.build_training_corpus`)."""
    from .text_quality import with_lang_id

    audit: dict[str, int] = {"input": images.count()}
    out = images

    if cfg.wellformed:
        out = wellformed_images(out, cfg)
        audit["wellformed"] = out.count()

    if cfg.caption_lang and cfg.languages:
        out = with_lang_id(out, text_col="caption") \
            .filter(F.col("lang_pred").isin(*cfg.languages)) \
            .drop("lang_pred")
        audit["caption_lang"] = out.count()

    if cfg.alignment_min is not None:
        out = caption_alignment(out, cfg.img_emb_col, cfg.cap_emb_col,
                                min_score=cfg.alignment_min) \
            .drop("alignment")
        audit["alignment"] = out.count()

    if cfg.caption_dedup:
        out = caption_dedup(out, cfg.id_col, "caption",
                            cfg.caption_max_count)
        audit["caption_dedup"] = out.count()

    if cfg.exact_dedup:
        out = image_exact_dedup(out, cfg.id_col, cfg.phash_col)
        audit["exact_dedup"] = out.count()

    if cfg.near_dedup:
        pairs = phash_near_dup_pairs(
            out, id_col=cfg.id_col, phash_col=cfg.phash_col,
            max_hamming=cfg.max_hamming, n_chunks=cfg.n_chunks,
            n_bits=cfg.phash_bits, max_bucket=cfg.max_bucket,
            pair_mode=cfg.pair_mode)
        out = dedup_clusters(
            out, pairs, id_col=cfg.id_col, a_col="id_a", b_col="id_b",
            keep=F.struct((F.col("w").cast("long") * F.col("h"))
                          .alias("a"))) \
            .filter(F.col("is_canonical")) \
            .drop("component", "is_canonical")
        audit["near_dedup"] = out.count()

    if cfg.semantic and cfg.embedding_col:
        # SemDeDup pass on a narrow (surrogate-id, embedding) projection —
        # bytes stay out of every exchange, same posture as the phash
        # stages.  image_id is a string, so the keep-first rule runs on
        # the xxhash64 surrogate: the min-hash member of each duplicate
        # group survives (deterministic, arbitrary — the LAION posture)
        from .similarity import semantic_dedup
        sid = out.select(F.xxhash64(F.col(cfg.id_col)).alias("_sid"),
                         F.col(cfg.id_col), F.col(cfg.embedding_col))
        marks = semantic_dedup(
            sid.select("_sid", cfg.embedding_col),
            threshold=cfg.semantic_threshold,
            n_centroids=cfg.semantic_centroids,
            id_col="_sid", vec_col=cfg.embedding_col,
            max_cluster=cfg.semantic_max_cluster)
        dup_ids = (marks.where("is_dup").select("_sid")
                   .join(sid.select("_sid", cfg.id_col), "_sid")
                   .select(cfg.id_col))
        out = out.join(dup_ids, cfg.id_col, "left_anti")
        audit["semantic_dedup"] = out.count()

    if cfg.validate_decode:
        from .multimodal import with_image_features
        feats = with_image_features(out, bytes_col=cfg.bytes_col)
        out = feats.filter((F.col("dec_w") == F.col("w"))
                           & (F.col("dec_h") == F.col("h"))) \
            .drop("dec_w", "dec_h", "mean_r", "mean_g", "mean_b",
                  "phash64")
        audit["validate_decode"] = out.count()

    if cfg.junk_gate:
        # decoded-pixel junk gate — runs after the dedups so the decode
        # pass (map-side, but it touches every payload byte) only sees
        # surviving rows; a second enabled decode stage
        # (validate_decode) costs its own pass, same as audit re-counts
        out = junk_image_gate(out, cfg)
        audit["junk_gate"] = out.count()

    if cfg.shard:
        manifest = image_shard_manifest(
            out, cfg.shard_bytes, id_col=cfg.id_col,
            size_col=F.length(F.col(cfg.bytes_col)))
        out = out.join(manifest, cfg.id_col)
        audit["shards"] = out.select("shard_id").distinct().count()

    return out, audit


def write_image_shards(images: DataFrame, out_dir: str,
                       shard_bytes: int = 1 << 30,
                       id_col: str = "image_id",
                       bytes_col: str = "bytes",
                       order_col: str | None = None,
                       parallelism: int | None = None) -> None:
    """Materialize the corpus as byte-budgeted shard files — the
    webdataset-style physical output the manifest describes.

    Each shard ``shard-<n>.bin`` is the concatenation of its members'
    payloads in manifest order; ``shard-<n>.idx.json`` carries one JSON
    line per member ``{image_id, offset, nbytes}`` so a reader can
    random-access any image with one ranged read.  A trailing
    ``_MANIFEST.json`` line-file (one line per member, all shards) makes
    the whole output self-describing.

    Scale shape: this is the one image stage that MUST move payload
    bytes — physical co-location of a shard's members is the point — so
    it spends exactly one exchange on it (repartition by shard_id after
    a broadcast-sized manifest join) and writes shards
    partition-parallel, one task per shard group.  Everything upstream
    (gates, dedup, manifest arithmetic) stayed narrow."""
    import json
    import os

    man = image_shard_manifest(images, shard_bytes, id_col=id_col,
                               size_col=F.length(F.col(bytes_col)),
                               order_col=order_col,
                               parallelism=parallelism)
    joined = images.select(F.col(id_col).alias("image_id"),
                           F.col(bytes_col).alias("_payload")) \
        .join(man, "image_id") \
        .repartition("shard_id")
    os.makedirs(out_dir, exist_ok=True)
    target = str(out_dir)

    def _write(part):
        rows = sorted(part, key=lambda r: (r["shard_id"], r["shard_offset"]))
        cur, buf, idx, pos = None, [], [], 0

        def flush():
            if cur is None:
                return
            with open(os.path.join(target, f"shard-{cur:06d}.bin"),
                      "wb") as f:
                for b in buf:
                    f.write(b)
            with open(os.path.join(target, f"shard-{cur:06d}.idx.json"),
                      "w") as f:
                for line in idx:
                    f.write(json.dumps(line) + "\n")

        for r in rows:
            if r["shard_id"] != cur:
                flush()
                cur, buf, idx, pos = r["shard_id"], [], [], 0
            # idx offsets are PHYSICAL file positions: when an image
            # overflows the previous shard's budget, the next shard's
            # first member has a nonzero logical stream offset
            # (manifest shard_offset = start % shard_bytes) but sits at
            # file position 0
            buf.append(bytes(r["_payload"]))
            idx.append({"image_id": r["image_id"],
                        "offset": pos,
                        "nbytes": r["nbytes"]})
            pos += r["nbytes"]
        flush()

    joined.foreachPartition(_write)
    man.select(F.to_json(F.struct("image_id", "shard_id", "shard_offset",
                                  "nbytes")).alias("line")) \
        .write.mode("overwrite").text(os.path.join(target, "_MANIFEST.json"))


def read_image_shard(shard_path: str, idx_path: str) -> "list[tuple]":
    """Round-trip reader for one shard: [(image_id, bytes), ...] in
    offset order — the ranged-read contract a trainer's data loader
    would use."""
    import json

    out = []
    with open(idx_path) as f:
        entries = [json.loads(ln) for ln in f if ln.strip()]
    with open(shard_path, "rb") as f:
        blob = f.read()
    for e in sorted(entries, key=lambda x: x["offset"]):
        out.append((e["image_id"], blob[e["offset"]:e["offset"] + e["nbytes"]]))
    return out
