"""Corpus-trained character-trigram LM typicality scoring.

CCNet-style quality filtering ranks documents by language-model
perplexity against an in-domain model; this is the same signal built
from the corpus itself: train a char-trigram unigram-of-trigrams model
(top-V vocabulary, add-one smoothing) and score every document by its
average trigram log-probability.  Low ``avg_logp`` = atypical text
(binary junk, boilerplate noise, wrong-language residue) — the standard
cheap outlier filter between the C4 heuristics and a real LM pass.

Everything is JVM column expressions and one broadcast join — no Python
in the hot path; the only driver hop is the bounded ≤vocab_limit model
collect in :func:`lm_typicality` (the IVF-codebook pattern):

* trigram explode is bounded per doc by ``max_chars`` truncation;
* the trigram-count aggregation has a bounded key space (distinct
  trigrams ≤ charset³), so map-side partial aggregation collapses it
  before the single shuffle;
* the top-V vocabulary is a ``TakeOrderedAndProject`` (no full sort),
  deterministic under ties via (count DESC, trigram ASC);
* the model (≤ ``vocab_limit`` rows) and its (total, V) scalars join
  back as broadcasts, so scoring adds exactly one more shuffle (the
  per-doc aggregate, again map-side partial).

At 10^10 docs the model is still ≤ vocab_limit rows — training cost is
one bounded-key aggregation over the corpus and scoring is map-side
except the per-doc combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _exploded_trigrams(docs: DataFrame, text_col: str, max_chars: int,
                       *keep: str) -> DataFrame:
    """(*keep, tri) — one row per lowercased character trigram of the
    truncated text.

    Built by zipping the char array with two shifted copies of itself
    rather than `transform(sequence(...), i -> substring(t, i, 3))`: a
    lambda that indexes back into the outer string re-inlines (and
    re-lowers) the whole text expression per element — O(len²) character
    work per document.  The char split is additionally STAGED in its own
    projection, so it is evaluated once per row, not once per shifted
    copy (CollapseProject refuses to merge a multiply-referenced
    non-cheap expression — BENCH.md round-4 finding #3; measured 2.4×
    on the bench corpus)."""
    t = F.lower(F.substring(F.col(text_col), 1, max_chars))
    staged = (docs.where(F.length(t) >= 3)
                  .select(*keep, F.length(t).alias("_len"),
                          F.split(t, "").alias("_c")))
    chars = F.col("_c")
    zipped = F.arrays_zip(chars.alias("c0"),
                          F.slice(chars, 2, 1 << 30).alias("c1"),
                          F.slice(chars, 3, 1 << 30).alias("c2"))
    tris = F.transform(
        zipped, lambda s: F.concat(s["c0"], s["c1"], s["c2"]))
    return staged.select(
        *keep,
        F.explode(F.slice(tris, 1, F.col("_len") - 2)).alias("tri"))


def _exploded_tri_codes(docs: DataFrame, text_col: str, max_chars: int,
                        *keep: str) -> DataFrame:
    """(*keep, tri) with the trigram packed as a LONG code
    ``cp0·2^42 + cp1·2^21 + cp2`` (code points < 2^21 ⇒ 63 bits, no
    collisions).  The packing is a bijection on 3-char strings and
    ORDER-PRESERVING versus UTF8 string comparison (UTF-8 byte order =
    code-point order), so aggregation counts, join matches and the
    (count DESC, key ASC) top-V tie-break are all identical to the
    string-keyed twin — while the 116M-row aggregate and the broadcast
    probe hash/compare an 8-byte primitive instead of allocating a
    3-char UTF8String per trigram (guide §2.3: narrower types).  The
    code-point array is STAGED in its own projection (CollapseProject
    discipline) so ``split``+``ascii`` run once per row, not once per
    shifted copy."""
    t = F.lower(F.substring(F.col(text_col), 1, max_chars))
    staged = (docs.where(F.length(t) >= 3)
                  .select(*keep, F.length(t).alias("_len"),
                          F.transform(F.split(t, ""),
                                      lambda c: F.ascii(c)).alias("_a")))
    a = F.col("_a")
    zipped = F.arrays_zip(a.alias("c0"),
                          F.slice(a, 2, 1 << 30).alias("c1"),
                          F.slice(a, 3, 1 << 30).alias("c2"))
    tris = F.transform(
        zipped,
        lambda s: (s["c0"].cast("long") * F.lit(1 << 42)
                   + s["c1"].cast("long") * F.lit(1 << 21)
                   + s["c2"].cast("long")))
    return staged.select(
        *keep,
        F.explode(F.slice(tris, 1, F.col("_len") - 2)).alias("tri"))


def train_trigram_lm(docs: DataFrame, text_col: str = "text",
                     vocab_limit: int = 4096,
                     max_chars: int = 2000) -> DataFrame:
    """Train the model: top-``vocab_limit`` trigrams with add-one smoothed
    log-probabilities.  Returns (tri, c, logp) — ``c`` kept so callers can
    recompute the smoothing scalars without a second corpus pass."""
    return _train_model(_exploded_trigrams(docs, text_col, max_chars),
                        vocab_limit)


def _train_model(ex: DataFrame, vocab_limit: int) -> DataFrame:
    counts = ex.groupBy("tri").agg(F.count("*").alias("c"))
    top = counts.orderBy(F.desc("c"), F.asc("tri")).limit(vocab_limit)
    stats = top.agg(F.sum("c").alias("total"), F.count("*").alias("v"))
    return (top.crossJoin(F.broadcast(stats))
               .select("tri", "c",
                       F.log((F.col("c") + F.lit(1.0))
                             / (F.col("total") + F.col("v"))).alias("logp")))


def score_typicality(docs: DataFrame, model: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     max_chars: int = 2000) -> DataFrame:
    """Per-document typicality: (id, n_tris, oov_tris, avg_logp) where
    ``avg_logp`` is the mean trigram log-prob with OOV trigrams priced at
    the smoothed floor ln(1 / (total + V)).  Docs shorter than one
    trigram after truncation are dropped (no signal)."""
    return _score(_exploded_trigrams(docs, text_col, max_chars, id_col),
                  model, id_col)


def _score(ex: DataFrame, model: DataFrame, id_col: str) -> DataFrame:
    stats = model.agg(F.sum("c").alias("total"), F.count("*").alias("v"))
    scored = ex.join(F.broadcast(model.select("tri", "logp")), "tri", "left")
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tris"),
        F.sum(F.when(F.col("logp").isNull(), 1).otherwise(0))
         .alias("oov_tris"),
        F.sum("logp").alias("hit_logp"),
    )
    oov_logp = F.log(F.lit(1.0) / (F.col("total") + F.col("v")))
    return (agg.crossJoin(F.broadcast(stats))
               .select(id_col,
                       F.col("n_tris").cast("int").alias("n_tris"),
                       F.col("oov_tris").cast("int").alias("oov_tris"),
                       F.round((F.coalesce(F.col("hit_logp"), F.lit(0.0))
                                + F.col("oov_tris") * oov_logp)
                               / F.col("n_tris"), 4).alias("avg_logp")))


def lm_typicality(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", vocab_limit: int = 4096,
                  max_chars: int = 2000) -> DataFrame:
    """Train on the corpus and score it (self-typicality outlier filter).

    The trained model (≤ ``vocab_limit`` rows) is materialized through
    the driver once — the same bounded-collect pattern as the IVF
    codebook.  Without it the scoring plan recomputes the whole training
    explode inside the broadcast AND inside the stats crossJoin (three
    corpus passes per action; measured 3× the wall time at 2M docs).
    Values are identical: the logp column is computed by the train plan
    before collection.

    Both passes run on the PACKED-LONG trigram key
    (:func:`_exploded_tri_codes`): the packing is a bijection on 3-char
    strings and order-preserving vs string comparison, so counts, the
    top-V tie-break, the broadcast-join matches, and every output value
    are identical to the string-keyed public API (guide §2.3 narrower
    types; before/after in OPTIMIZATION_r06.md).  The public
    :func:`train_trigram_lm` / :func:`score_typicality` keep the
    human-readable string vocabulary."""
    model = _train_model(
        _exploded_tri_codes(docs, text_col, max_chars), vocab_limit)
    rows = model.collect()
    if not rows:
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} long, n_tris int, oov_tris int, avg_logp double")
    local = docs.sparkSession.createDataFrame(rows, model.schema)
    return _score(_exploded_tri_codes(docs, text_col, max_chars, id_col),
                  local, id_col)
