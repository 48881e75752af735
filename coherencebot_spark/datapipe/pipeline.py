"""End-to-end training-corpus pipeline — the composition the individual
datapipe operators exist for.

Stage order follows the published corpus recipes (C4 / MassiveText /
RefinedWeb / Dolma all converge on the same skeleton), cheapest-first so
each stage shrinks the data the next one touches:

1. **scrub**        — PII redaction (pure Project; run first so every
                      later stage sees clean text);
2. **quality**      — language gate + Gopher repetition rules (pure
                      Project filters — drop early, they're free);
3. **exact dedup**  — md5 groupBy keeps one copy per byte-identical text;
4. **near dedup**   — MinHash-LSH pairs → connected components →
                      cluster-canonical survivor (the only multi-shuffle
                      stage; runs on the already-shrunk corpus);
5. **decontaminate**— n-gram overlap vs the eval set (broadcast join);
6. **mix**          — deterministic stratified sampling + per-stratum
                      upsampling (Project + bounded explode);
7. **pack**         — concat-and-chunk manifest (two-level offset sum).

Optional round-4 stages slot into the same skeleton (all default off):
**line_dedup** (CCNet duplicated-paragraph removal, after scrub),
**typicality** (trigram-LM corpus-typicality gate, after quality),
**passage_dedup** (winnowing shared-passage gate, after near dedup),
**semantic** (SemDeDup over an embedding column, before
decontamination).  Round-5 stages: **c4** (C4 line+page cleaning right
after scrub — the retained-line text feeds every later stage) and
**gopher_quality** (the full Gopher document-shape rule set after the
repetition rules).

Every stage is optional and individually hard-oracled (see
``__spark_entry__``); this module adds the glue, a per-stage row-count
audit (one tiny aggregate per enabled stage — the numbers a pipeline
operator actually watches), and the canonical ordering so users don't
re-derive it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CorpusConfig", "build_training_corpus"]


@dataclass
class CorpusConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    # stage toggles
    scrub: bool = True
    quality: bool = True
    exact_dedup: bool = True
    near_dedup: bool = True
    decontaminate: bool = True
    mix: bool = True
    pack: bool = True
    # quality gates
    languages: tuple = ()           # () = no language gate
    max_dup_line_frac: float = 0.30
    max_dup_line_char_frac: float = 0.20
    max_top_bigram_char_frac: float = 0.20
    # near-dup knobs (minhash_lsh_pairs passthrough)
    minhash_k: int = 5
    minhash_hashes: int = 32
    minhash_bands: int = 8
    # optional round-4 stages (default off: the canonical audit above is
    # oracled/tested as-is; turn on per the recipe you're reproducing —
    # CCNet uses line_dedup + a perplexity gate ≈ typicality, Lee et al.
    # motivates passage_dedup, SemDeDup motivates semantic over embeddings)
    # optional round-5 stages (default off)
    c4: bool = False                    # C4 line+page cleaning after scrub
    c4_min_line_words: int = 5
    c4_min_sentences: int = 3
    c4_badwords: tuple = ()
    gopher_quality: bool = False        # full Gopher rule set (paper defaults)
    line_dedup: bool = False            # CCNet duplicated-paragraph removal
    typicality: bool = False            # trigram-LM corpus-typicality gate
    min_typicality: float = -8.0        # keep docs with avg_logp >= this
    typicality_vocab: int = 4096
    passage_dedup: bool = False         # winnowing shared-passage gate
    max_shared_frac: float = 0.5        # drop docs above this share
    winnow_k: int = 8
    winnow_window: int = 4
    semantic: bool = False              # SemDeDup over an embedding column
    embedding_col: str | None = None
    semantic_threshold: float = 0.99
    semantic_centroids: int = 16
    # decontamination
    decontam_n: int = 13
    # mixing: stratum column + fraction recipe (None = single fraction)
    strata_col: str | None = None
    fractions: Mapping[str, float] = field(default_factory=dict)
    sample_fraction: float = 1.0
    upsample_weight: float = 1.0
    salt: str = ""
    # packing
    chunk_tokens: int = 2048


def build_training_corpus(docs: DataFrame,
                          eval_docs: DataFrame | None = None,
                          cfg: CorpusConfig = CorpusConfig(),
                          ) -> tuple[DataFrame, dict[str, int]]:
    """Run the enabled stages in canonical order.

    Returns ``(result, audit)`` — ``result`` is the chunk manifest when
    ``cfg.pack`` else the surviving document frame; ``audit`` maps stage
    name → row count after the stage (each count is one aggregate; at
    production scale pass the frame through ``persist()`` first or set
    the toggles you don't need to False)."""
    from .contamination import decontaminate as _decon
    from .components import dedup_clusters
    from .dedup_text import minhash_lsh_pairs
    from .packing import chunk_manifest
    from .repetition import gopher_repetition_filter
    from .sampling import deterministic_sample, deterministic_upsample, \
        stratified_sample
    from .scrub import scrub_pii
    from .text_quality import with_lang_id

    audit: dict[str, int] = {"input": docs.count()}
    out = docs

    if cfg.scrub:
        out = scrub_pii(out, text_col=cfg.text_col, counts_col=None)

    if cfg.c4:
        # C4 line+page cleaning runs first in the paper's recipe: the
        # retained-line text replaces the raw text for every later stage
        from .cleaning import c4_clean_lines
        out = c4_clean_lines(out, text_col=cfg.text_col,
                             min_line_words=cfg.c4_min_line_words,
                             min_sentences=cfg.c4_min_sentences,
                             badwords=cfg.c4_badwords,
                             out_col="_c4_text", keep_col="_c4_keep") \
            .filter(F.col("_c4_keep")) \
            .withColumn(cfg.text_col, F.col("_c4_text")) \
            .drop("_c4_text", "_c4_keep", "n_lines", "n_lines_kept",
                  "n_sentences")
        audit["c4"] = out.count()

    if cfg.line_dedup:
        # CCNet: drop corpus-wide duplicated paragraphs BEFORE the quality
        # gates so boilerplate doesn't skew length/repetition ratios
        from .dedup_text import dedup_lines
        cleaned = dedup_lines(out, id_col=cfg.id_col, text_col=cfg.text_col)
        out = out.drop(cfg.text_col).join(
            cleaned.select(cfg.id_col, cfg.text_col), cfg.id_col)
        audit["line_dedup"] = out.count()

    if cfg.quality:
        if cfg.languages:
            out = with_lang_id(out, text_col=cfg.text_col) \
                .filter(F.col("lang_pred").isin(*cfg.languages)) \
                .drop("lang_pred")
        out = gopher_repetition_filter(
            out, text_col=cfg.text_col,
            max_dup_line_frac=cfg.max_dup_line_frac,
            max_dup_line_char_frac=cfg.max_dup_line_char_frac,
            max_top_bigram_char_frac=cfg.max_top_bigram_char_frac)
        audit["quality"] = out.count()

    if cfg.gopher_quality:
        # the same paper's document-shape rules (word count, mean word
        # length, symbol/bullet/ellipsis/alpha fractions, stopwords)
        from .cleaning import gopher_quality_filter
        out = gopher_quality_filter(out, text_col=cfg.text_col,
                                    keep_col="_gq_keep",
                                    with_metrics=False) \
            .filter(F.col("_gq_keep")).drop("_gq_keep")
        audit["gopher_quality"] = out.count()

    if cfg.typicality:
        # corpus-trained trigram-LM gate — the cheap stand-in for CCNet's
        # in-domain-LM perplexity bucket filter
        from .lm_quality import lm_typicality
        scores = lm_typicality(out, id_col=cfg.id_col,
                               text_col=cfg.text_col,
                               vocab_limit=cfg.typicality_vocab)
        keep = scores.where(
            F.col("avg_logp") >= float(cfg.min_typicality)
        ).select(cfg.id_col)
        out = out.join(keep, cfg.id_col, "left_semi")
        audit["typicality"] = out.count()

    if cfg.exact_dedup:
        # keep the minimum id per byte-identical text (one shuffle on
        # the md5 key; text itself never shuffles — only (id, md5) do)
        keys = out.select(F.col(cfg.id_col).alias("_kid"),
                          F.md5(F.col(cfg.text_col)).alias("_sig"))
        keep = keys.groupBy("_sig").agg(F.min("_kid").alias("_keep"))
        survivors = keys.join(keep, "_sig") \
            .filter(F.col("_kid") == F.col("_keep")).select("_kid")
        out = out.join(survivors.withColumnRenamed("_kid", cfg.id_col),
                       cfg.id_col, "left_semi")
        audit["exact_dedup"] = out.count()

    if cfg.near_dedup:
        pairs = minhash_lsh_pairs(
            out, id_col=cfg.id_col, text_col=cfg.text_col,
            k=cfg.minhash_k, n_hashes=cfg.minhash_hashes,
            bands=cfg.minhash_bands, verify_threshold=None,
            pair_mode="star")
        out = dedup_clusters(out, pairs, id_col=cfg.id_col,
                             a_col="id_a", b_col="id_b") \
            .filter(F.col("is_canonical")) \
            .drop("component", "is_canonical")
        audit["near_dedup"] = out.count()

    if cfg.passage_dedup:
        # winnowing shared-passage gate: drop docs dominated by passages
        # repeated elsewhere in the corpus (short docs with no
        # fingerprints have no stats row and are kept)
        from .dedup_text import shared_passage_stats
        stats = shared_passage_stats(out, k=cfg.winnow_k,
                                     window=cfg.winnow_window,
                                     id_col=cfg.id_col,
                                     text_col=cfg.text_col)
        viol = stats.where(
            F.col("shared_frac") > float(cfg.max_shared_frac)
        ).select(cfg.id_col)
        out = out.join(viol, cfg.id_col, "left_anti")
        audit["passage_dedup"] = out.count()

    if cfg.semantic and cfg.embedding_col:
        # SemDeDup: embedding-space near-duplicate removal (keep-first)
        from .similarity import semantic_dedup
        marks = semantic_dedup(
            out.select(cfg.id_col, cfg.embedding_col),
            threshold=cfg.semantic_threshold,
            n_centroids=cfg.semantic_centroids,
            id_col=cfg.id_col, vec_col=cfg.embedding_col)
        dups = marks.where("is_dup").select(cfg.id_col)
        out = out.join(dups, cfg.id_col, "left_anti")
        audit["semantic_dedup"] = out.count()

    if cfg.decontaminate and eval_docs is not None:
        out = _decon(out, eval_docs, n=cfg.decontam_n,
                     id_col=cfg.id_col, text_col=cfg.text_col,
                     keep_col=None) \
            .drop("n_ngrams", "n_hits", "eval_ids", "hit_frac")
        audit["decontaminate"] = out.count()

    if cfg.mix:
        if cfg.strata_col and cfg.fractions:
            out = stratified_sample(out, cfg.fractions, cfg.strata_col,
                                    key_col=cfg.id_col, salt=cfg.salt)
        elif cfg.sample_fraction < 1.0:
            out = deterministic_sample(out, cfg.sample_fraction,
                                       key_col=cfg.id_col, salt=cfg.salt)
        if cfg.upsample_weight != 1.0:
            out = deterministic_upsample(out, cfg.upsample_weight,
                                         key_col=cfg.id_col)
        audit["mix"] = out.count()

    if cfg.pack:
        out = chunk_manifest(out, cfg.chunk_tokens, id_col=cfg.id_col,
                             text_col=cfg.text_col)
        audit["chunks"] = out.select("chunk_id").distinct().count()

    return out, audit
