"""Similarity search over embedding columns (``array<float>``).

* **Brute-force cosine top-k** — the correctness baseline: the dot product
  is a JVM expression (``F.zip_with`` + ``F.aggregate``), ranking is a
  window.  Cost O(n_queries × n_vectors) — fine for reranking, wrong as
  the only path at 10^10 rows.
* **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (sign of dot with h broadcast hyperplanes → h-bit bucket), candidates =
  same bucket (multi-probe via b independent tables), exact cosine rerank
  within buckets.  Hyperplanes derive deterministically from a seed via
  xxhash64 arithmetic, so no driver-side randomness and no collect.
* **IVF-style variant** — k-means-lite: deterministic seed centroids, one
  assignment pass, probe nearest ``nprobe`` centroids.
* **Product quantization (PQ)** — the billion-scale memory layout: each
  vector compresses to m small ints (per-subspace codebooks trained on a
  deterministic bounded sample), scoring is ADC-cosine through per-query
  lookup tables over the codes, optional exact rerank of the top
  candidates.  The scored scan touches m ints per row instead of d
  floats.

All pure DataFrame; a Pandas-UDF path (numpy matmul per Arrow batch) is
provided for the dense rerank where JVM expression overhead dominates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk_bruteforce(vectors: DataFrame, queries: DataFrame, k: int,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           qid_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine for each query vector (crossJoin + window).

    ``queries``: (query_id, embedding).  Returns (query_id, vec_id, cosine,
    rank).  Broadcast the query side — it is small by construction."""
    q = F.broadcast(
        queries.select(F.col(qid_col), F.col(vec_col).alias("_qv"))
    )
    j = vectors.crossJoin(q)
    cos = (_dot(F.col(vec_col), F.col("_qv"))
           / (_norm(F.col(vec_col)) * _norm(F.col("_qv"))))
    scored = j.select(qid_col, id_col, cos.alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def cosine_topk_pandas(vectors: DataFrame, query_vecs: np.ndarray, k: int,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Arrow-batched numpy matmul rerank: per-partition local top-k, then a
    tiny global re-rank — the 1000-executor-friendly dense path (only
    n_queries × k rows ever shuffle)."""
    qn = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    nq = len(qn)

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ qn.T  # (rows, nq)
            top = min(k, len(pdf))
            idx = np.argpartition(-sims, top - 1, axis=0)[:top]
            out = {
                "query_id": np.repeat(np.arange(nq), top),
                id_col: pdf[id_col].to_numpy()[idx.T.ravel()],
                "cosine": np.take_along_axis(sims, idx, 0).T.ravel(),
            }
            yield pd.DataFrame(out)

    local = vectors.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id long, {id_col} long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def _weight_factory(seed: int, portable: bool):
    """``make_weight(p) -> (i -> weight_expr)`` — THE single definition of
    the plane weights, shared by the signature and the multi-probe bucket
    expressions (they must match bit-for-bit or probe buckets desync from
    corpus buckets).

    Plane weights are deterministic pseudo-randoms:
    default  w[p][i] = xxhash64(seed', i) / 2^63 ∈ (-1, 1);
    portable w[p][i] = md5_long60("seed':i") / 2^59 - 1 ∈ [-1, 1) — the
    md5-based form is computable bit-identically in DuckDB (same
    left-fold dot product → same sign bits), which puts the ANN bucket
    assignment itself under the oracle.

    NOTE: F.transform dispatches on lambda ARITY (2 params = (elem, idx))
    — the weight fn must be strictly single-argument, so close over p via
    the factory, never a default arg."""
    def make_weight(p: int):
        if portable:
            prefix = f"{seed * 1_000_003 + p}:"

            def weight(i):
                h = F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(prefix), i.cast("string"))
                              .cast("binary")),
                        1, 15,
                    ), 16, 10,
                ).cast("long")
                return h.cast("double") / F.lit(float(1 << 59)) - F.lit(1.0)
        else:
            def weight(i):
                return (
                    F.xxhash64(
                        F.lit(seed * 1_000_003 + p).cast("long")
                        * F.lit(131_071).cast("long")
                        + i.cast("long")
                    ).cast("double") / F.lit(float(2 ** 63))
                )
        return weight

    return make_weight


def _hyperplane_sig(vec_col, dim: int, n_planes: int, seed: int,
                    portable: bool = False):
    """h-bit random-hyperplane signature as a JVM expression."""
    # LONG arithmetic throughout: 1 << p overflows int32 at p >= 31, and
    # lsh_params_for prescribes ~33 planes for a 10^10 corpus
    sig = F.lit(0).cast("long")
    for dot, p in _plane_dots(vec_col, dim, n_planes,
                              _weight_factory(seed, portable)):
        sig = sig + F.when(dot >= 0, F.lit(1 << p).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return sig


def _plane_dots(vec_col, dim: int, n_planes: int, make_weight):
    """[(dot_expr, plane_index)] for each hyperplane."""
    out = []
    for p in range(n_planes):
        weight = make_weight(p)
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), weight),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out.append((dot, p))
    return out


def _hyperplane_probe_buckets(vec_col, dim: int, n_planes: int, seed: int,
                              n_probe: int, portable: bool = False):
    """Multi-probe bucket list (Lv et al., multi-probe LSH): the base
    bucket plus ``n_probe`` perturbed buckets obtained by flipping, one at
    a time, the planes whose |dot| margin is smallest — the planes most
    likely to have put a true neighbor on the other side.  Pure JVM
    expression: an array of (|dot|, bitmask) structs sorted ascending, the
    first ``n_probe`` masks XORed onto the base signature.  Weights come
    from the shared :func:`_weight_factory`, so probe buckets match the
    corpus-side signatures bit-for-bit by construction."""
    dots = _plane_dots(vec_col, dim, n_planes,
                       _weight_factory(seed, portable))
    base = F.lit(0).cast("long")
    for dot, p in dots:
        base = base + F.when(dot >= 0, F.lit(1 << p).cast("long")) \
                       .otherwise(F.lit(0).cast("long"))
    margins = F.array(*[
        F.struct(F.abs(dot).alias("a"), F.lit(1 << p).cast("long").alias("m"))
        for dot, p in dots
    ])
    flips = F.slice(F.array_sort(margins), 1, int(n_probe))
    return F.concat(
        F.array(base),
        F.transform(flips, lambda s: base.bitwiseXOR(s["m"])),
    )


# n_centroids × dim threshold: below, assignment is the literal
# projection (codegen folds, bit-exact with the DuckDB oracle twin);
# above, the Arrow-batched numpy path (one BLAS matmul per batch)
_ASSIGN_LITERAL_BUDGET = 2048


def _dot_unrolled(a, b, dim: int):
    """Dot product as plain unrolled arithmetic — NOT a higher-order fold.

    ``aggregate``/``zip_with`` expressions are interpreted (they block
    whole-stage codegen and allocate per evaluation); for a statically
    known ``dim`` the unrolled chain compiles into codegen arithmetic.
    Use for SINGLE hot expressions (the pair cosine) — an array of many
    unrolled copies (the centroid-score structs) overflows janino method
    limits and was reverted.  The chain starts at ``lit(0.0)`` and adds
    left-to-right — the EXACT evaluation order of the ``F.aggregate``
    fold and of the DuckDB ``list_reduce`` twin, so results are
    bit-identical."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * b[i]
    return acc


def _norm_unrolled(a, dim: int):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i] * a[i]
    return F.sqrt(acc)


def _centroid_score_structs(vec_col, cent_rows, elem_type: str):
    """Per-centroid cosine scores as literal-array projections.

    Returns an array<struct<cc, neg_id>> expression: the centroid vectors
    are embedded as array literals (cast to the corpus element type so the
    arithmetic is bit-identical to the former dataframe-join form), so the
    nearest-centroid decision needs NO join and NO exchange — it is a pure
    map over the corpus.  struct ordering (cc asc, neg_id asc) makes
    array_max pick (max cc, max neg_id) = (max cc, min cent_id), i.e. the
    same tie-break as ``ORDER BY cc DESC, cent_id ASC``.

    The per-centroid cosines stay as ``F.aggregate`` folds: unrolling
    them was tried and REVERTED — the k-struct array expression compiles
    as one janino method, and even a 64×16 codebook overflowed method
    limits (fallback + compile retries cost more than the fold)."""
    structs = []
    for cid, cvec in cent_rows:
        carr = F.array(*[F.lit(float(x)).cast(elem_type) for x in cvec])
        cc = _dot(vec_col, carr) / (_norm(vec_col) * _norm(carr))
        structs.append(F.struct(
            cc.alias("cc"), F.lit(-int(cid)).cast("long").alias("neg_id")
        ))
    return F.array(*structs)


def ivf_assign(vectors: DataFrame, cent_rows: list[tuple],
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment as a shuffle-free projection.

    ``cent_rows``: [(cent_id, centroid_vector), ...] — tiny by construction
    (the IVF codebook), so it lives in the plan as literals instead of a
    crossJoin side.  Physical plan = Scan → Project; a test asserts no
    Exchange appears."""
    if not cent_rows:
        raise ValueError("ivf_assign: empty codebook (empty corpus?) — "
                         "callers must handle the no-centroids case")
    elem_type = vectors.schema[vec_col].dataType.elementType.simpleString()
    best = F.array_max(
        _centroid_score_structs(F.col(vec_col), cent_rows, elem_type)
    )
    return vectors.select(
        id_col, vec_col, (-best["neg_id"]).cast("long").alias("cent_id")
    )


def ivf_assign_pandas(vectors: DataFrame, cent_rows: list[tuple],
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment as an Arrow-batched numpy matmul —
    the large-codebook path.

    The literal-projection :func:`ivf_assign` evaluates k interpreted
    cosine folds per row; at k=512/dim=16 that is ~200 M folds on a 200k
    corpus (measured ~400 s), while one batched ``(batch×dim) @ (dim×k)``
    BLAS call is milliseconds.  Still a pure map — no join, no exchange.
    Tie-break parity with the literal path: centroids are ordered by
    cent_id ascending and ``argmax`` returns the FIRST maximum, i.e.
    (max cosine, min cent_id).  Float results are numpy-accumulated (not
    the fold order), so use the literal path where bit-exact oracle
    parity matters."""
    if not cent_rows:
        raise ValueError("ivf_assign_pandas: empty codebook")
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(cent_rows, key=lambda r: int(r[0]))
    cids = np.array([int(c) for c, _ in ordered], dtype="int64")
    C = np.array([v for _, v in ordered], dtype="float64")
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    Cn = (C / cn).T                       # dim × k

    @pandas_udf("long")
    def _assign(col: pd.Series) -> pd.Series:
        M = np.stack(col.to_numpy()).astype("float64")
        n = np.linalg.norm(M, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (M / n) @ Cn
        return pd.Series(cids[np.argmax(sims, axis=1)])

    return vectors.select(id_col, vec_col,
                          _assign(F.col(vec_col)).alias("cent_id"))


def ivf_seed_codebook(vectors: DataFrame, n_centroids: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      method: str = "sample", seed: int = 42) -> list[tuple]:
    """Deterministic IVF seed centroids as [(cent_id, vector), ...].

    ``method='sample'`` (default): the ``n_centroids`` vectors with the
    smallest ``xxhash64(id, seed)`` — a deterministic uniform sample of
    the corpus (a TakeOrdered job over (hash, id, vec) only).  On
    clustered real data this spreads seeds ∝ cluster mass, unlike
    ``method='first'`` (the first ``n_centroids`` by id — the r3 codebook,
    kept for the bit-exact DuckDB oracle twin), which degenerates to one
    region whenever ids correlate with content."""
    if method == "first":
        picked = vectors.orderBy(F.asc(id_col)).limit(int(n_centroids))
    elif method == "sample":
        picked = vectors.orderBy(
            F.xxhash64(F.col(id_col), F.lit(int(seed))), F.asc(id_col)
        ).limit(int(n_centroids))
    else:
        raise ValueError(method)
    return [(r[0], list(r[1]))
            for r in picked.select(id_col, vec_col).collect()]


def ivf_refine_codebook(vectors: DataFrame, cent_rows: list[tuple],
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        iters: int = 1) -> list[tuple]:
    """k-means-lite refinement: ``iters`` Lloyd passes over the corpus.

    Each pass is (shuffle-free assignment projection) → (posexplode +
    two-level groupBy mean).  The posexplode shuffle moves only
    (cent_id, pos, val) triples and partial-aggregates map-side, so the
    exchange carries ~n_centroids × dim rows per upstream partition — not
    the corpus.  Centroids whose inverted list came up empty keep their
    previous vector (standard Lloyd empty-cluster handling); cent_ids are
    stable across passes."""
    if not cent_rows:
        return cent_rows        # empty corpus: nothing to refine
    for _ in range(max(int(iters), 0)):
        assigned = ivf_assign(vectors, cent_rows, id_col, vec_col)
        agg = (
            assigned
            .select("cent_id", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cent_id", "pos").agg(F.avg("val").alias("m"))
            .groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ps"))
            .collect()
        )
        means = {r["cent_id"]: [x["m"] for x in r["ps"]] for r in agg}
        cent_rows = [(cid, means.get(cid, vec)) for cid, vec in cent_rows]
    return cent_rows


def _resolve_codebook(vectors: DataFrame, n_centroids: int, id_col: str,
                      vec_col: str, codebook: str | list,
                      refine_iters: int, seed: int) -> list[tuple]:
    """Shared codebook resolution: explicit list / 'refined' (hash-sampled
    seeds + Lloyd passes) / 'sample' / 'first' (the DuckDB-reproducible
    oracle codebook)."""
    if isinstance(codebook, list):
        return codebook
    if codebook == "refined":
        return ivf_refine_codebook(
            vectors,
            ivf_seed_codebook(vectors, n_centroids, id_col, vec_col,
                              method="sample", seed=seed),
            id_col, vec_col, iters=refine_iters,
        )
    return ivf_seed_codebook(vectors, n_centroids, id_col, vec_col,
                             method=codebook, seed=seed)


def semantic_dedup(vectors: DataFrame, threshold: float,
                   n_centroids: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   codebook: str | list = "refined",
                   refine_iters: int = 1, seed: int = 42,
                   max_cluster: int | None = None) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embedding space, then mark within-cluster semantic
    duplicates — a row is a duplicate iff some SMALLER-id member of its
    cluster has cosine ≥ ``threshold`` to it; ``dup_of`` is the smallest
    such id (the deterministic keep-first rule, the embedding-space twin
    of the phash/simhash near-dup marking).

    Returns (id, cent_id, dup_of, is_dup) for every input row.

    Scale shape: centroid assignment is the shuffle-free
    :func:`ivf_assign` projection; the candidate set is within-cluster
    only — O(cluster²) per cluster, NEVER all-pairs — so n_centroids is
    the skew dial (size it ~|corpus|/target_cluster, exactly like LSH
    band count).  The self-join co-locates by cent_id: two exchanges of
    narrow (id, cent_id, vec) rows, the only time embeddings move.
    ``max_cluster`` is the hot-bucket cap (same contract as the simhash
    blocker's): clusters larger than the cap — pathological centroid
    collapse — skip pair generation instead of running a quadratic
    straggler, and their rows simply stay non-duplicates.  The final
    mark join-back is on id-only narrow rows."""
    id_type = vectors.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"semantic_dedup: id column '{id_col}' is {id_type}; the IVF "
            "codebook needs an integral id — derive a surrogate first, "
            "e.g. .withColumn('_sid', F.xxhash64(id_col))")
    cent_rows = _resolve_codebook(vectors, n_centroids, id_col, vec_col,
                                  codebook, refine_iters, seed)
    if not cent_rows:
        return vectors.sparkSession.createDataFrame(
            [], f"{id_col} long, cent_id long, dup_of long, is_dup boolean")
    # assignment path: literal projection for small codebooks (bit-exact
    # with the DuckDB twin), Arrow-batched numpy matmul past the budget
    # where k interpreted folds per row dominate the stage
    dim = len(cent_rows[0][1])
    if len(cent_rows) * dim <= _ASSIGN_LITERAL_BUDGET:
        assigned = ivf_assign(vectors, cent_rows, id_col, vec_col)
    else:
        assigned = ivf_assign_pandas(vectors, cent_rows, id_col, vec_col)
    pairside = assigned
    if max_cluster is not None:
        keep = (assigned.groupBy("cent_id").count()
                .where(F.col("count") <= int(max_cluster))
                .select("cent_id"))
        pairside = assigned.join(F.broadcast(keep), "cent_id", "left_semi")
    # precompute each vector's norm BEFORE the pair join, and keep the
    # whole pair predicate as unrolled codegen arithmetic: higher-order
    # folds are interpreted, and evaluating them per PAIR on O(cluster²)
    # rows dominated the stage (measured ~10×)
    withn = pairside.withColumn(
        "_n", _norm_unrolled(F.col(vec_col), dim))
    a = withn.select(F.col(id_col).alias("_ida"),
                     F.col(vec_col).alias("_va"),
                     F.col("_n").alias("_na"), "cent_id")
    b = withn.select(F.col(id_col).alias("_idb"),
                     F.col(vec_col).alias("_vb"),
                     F.col("_n").alias("_nb"), "cent_id")
    cos = (_dot_unrolled(F.col("_va"), F.col("_vb"), dim)
           / (F.col("_na") * F.col("_nb")))
    hits = (a.join(b, "cent_id")
             .where(F.col("_ida") > F.col("_idb"))
             .where(cos >= float(threshold))
             .groupBy("_ida").agg(F.min("_idb").alias("dup_of"))
             .withColumnRenamed("_ida", id_col))
    return (assigned.drop(vec_col)
            .join(hits, id_col, "left")
            .select(id_col, "cent_id", "dup_of",
                    F.col("dup_of").isNotNull().alias("is_dup")))


def cosine_topk_ivf(vectors: DataFrame, queries: DataFrame, k: int,
                    n_centroids: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id",
                    codebook: str | list = "refined",
                    refine_iters: int = 1, seed: int = 42) -> DataFrame:
    """IVF-style ANN: deterministic codebook, every vector assigned to its
    nearest centroid (shuffle-free projection), queries probe their
    ``nprobe`` nearest centroids and rerank exactly within those inverted
    lists.

    ``codebook``: ``'refined'`` (default — hash-sampled seeds +
    ``refine_iters`` Lloyd passes, the quality codebook), ``'sample'``
    (seeds only), ``'first'`` (first-N by id — degenerate on clustered
    data; retained because it is bit-exactly computable in the DuckDB
    oracle twin), or an explicit [(cent_id, vector), ...] list.

    Scale shape: the codebook is ≤ ``n_centroids`` rows by construction,
    so it is collected once and embedded as array literals — centroid
    assignment is then a pure projection over the corpus (no crossJoin,
    no window, no exchange; the former crossJoin+window form shuffled
    |corpus|×n_centroids rows *carrying the embedding column* just to
    take an argmax).  A query touches nprobe/n_centroids of the data;
    recall improves with nprobe (= brute force at nprobe == n_centroids).
    """
    cent_rows = _resolve_codebook(vectors, n_centroids, id_col, vec_col,
                                  codebook, refine_iters, seed)
    if not cent_rows:
        return vectors.sparkSession.createDataFrame(
            [], f"{qid_col} long, {id_col} long, cosine double, rank int")
    # corpus-side assignment auto-routes like semantic_dedup: literal
    # projection within the budget (bit-exact, the oracle path), numpy
    # matmul past it (k interpreted folds per row don't scale)
    if len(cent_rows) * len(cent_rows[0][1]) <= _ASSIGN_LITERAL_BUDGET:
        assigned = ivf_assign(vectors, cent_rows, id_col, vec_col)
    else:
        assigned = ivf_assign_pandas(vectors, cent_rows, id_col, vec_col)

    # query side: top-nprobe centroids per query — the query set is small,
    # so sort the literal score array per row (still shuffle-free)
    elem_type = queries.schema[vec_col].dataType.elementType.simpleString()
    qscores = F.reverse(F.array_sort(
        _centroid_score_structs(F.col(vec_col), cent_rows, elem_type)
    ))
    probes = (
        queries.select(
            F.col(qid_col), F.col(vec_col).alias("_qv"),
            F.explode(F.slice(qscores, 1, int(nprobe))).alias("_s"),
        )
        .select(qid_col, "_qv", (-F.col("_s.neg_id")).cast("long").alias("cent_id"))
    )
    cand = assigned.join(F.broadcast(probes), "cent_id")
    cos = (_dot(F.col(vec_col), F.col("_qv"))
           / (_norm(F.col(vec_col)) * _norm(F.col("_qv"))))
    scored = cand.select(qid_col, id_col, cos.alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def lsh_params_for(n_vectors: int, target_bucket: int = 1024,
                   recall_tables: int = 6) -> tuple[int, int]:
    """Size (n_planes, n_tables) for a corpus: buckets ≈ 2^n_planes, so
    n_planes = ceil(log2(n / target_bucket)) keeps the expected bucket at
    ``target_bucket`` vectors — the rerank cost per query.  The defaults
    that suit a 10^4-row test corpus (8 planes = 256 buckets) are FAR too
    coarse at 10^10 vectors (~40M rows/bucket); this helper gives ~33
    planes there.  More tables buy recall linearly at linear cost."""
    import math

    n_planes = max(4, math.ceil(math.log2(max(n_vectors, 2) / target_bucket)))
    return n_planes, recall_tables


def cosine_topk_lsh(vectors: DataFrame, queries: DataFrame, k: int, dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_planes: int = 8,
                    n_tables: int = 4, seed: int = 42,
                    portable: bool = False, multiprobe: int = 0) -> DataFrame:
    """ANN: random-hyperplane LSH bucketing + exact rerank inside buckets.

    Recall is tunable via (n_planes, n_tables) and ``multiprobe``: each
    query additionally probes the ``multiprobe`` buckets reached by
    flipping its lowest-margin planes (multi-probe LSH) — recall per
    table rises without growing the corpus-side index, so fewer tables
    reach the same recall (n_tables multiplies the CORPUS explode; probes
    only multiply the tiny broadcast query side).  Candidates shuffle
    only by (table, bucket) — no crossJoin ever touches the big side.
    Size the bucket space with :func:`lsh_params_for` — the 8-plane
    default is a small-corpus setting, not a 10^10 one."""
    def bucketize(df, vc, n_probe=0):
        def buckets(t):
            if n_probe > 0:
                return _hyperplane_probe_buckets(
                    F.col(vc), dim, n_planes, seed + t, n_probe, portable)
            return F.array(
                _hyperplane_sig(F.col(vc), dim, n_planes, seed + t, portable)
            )

        return df.select(
            "*",
            F.explode(F.flatten(F.array(*[
                F.transform(
                    buckets(t),
                    lambda b: F.struct(F.lit(t).alias("tbl"), b.alias("bkt")),
                )
                for t in range(n_tables)
            ]))).alias("_b"),
        ).select(*df.columns, F.col("_b.tbl"), F.col("_b.bkt"))

    v = bucketize(vectors.select(id_col, vec_col), vec_col)
    q = bucketize(
        queries.select(qid_col, F.col(vec_col).alias("_qv")), "_qv",
        n_probe=int(multiprobe),
    )
    # score every candidate match map-side (the broadcast join leaves the
    # big side un-shuffled), THEN dedup multi-table duplicates on the
    # narrow (query, id, cosine) rows — the former pre-score .distinct()
    # shuffled candidates still CARRYING both embedding columns, which at
    # 10^10 vectors is n_tables× the corpus bytes through one exchange.
    # Duplicate (query, id) pairs have identical cosine, so max() == dedup.
    cand = v.join(F.broadcast(q), ["tbl", "bkt"])
    cos = (_dot(F.col(vec_col), F.col("_qv"))
           / (_norm(F.col(vec_col)) * _norm(F.col("_qv"))))
    scored = (
        cand.select(qid_col, id_col, cos.alias("_c"))
        .groupBy(qid_col, id_col)
        .agg(F.max("_c").alias("cosine"))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): compressed codes + asymmetric-distance scoring
# --------------------------------------------------------------------------

def pq_train(vectors: DataFrame, m: int = 8, n_centroids: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             method: str = "sample", sample: int = 65536,
             iters: int = 3, seed: int = 42) -> list:
    """Train per-subspace PQ codebooks: the vector is split into ``m``
    equal subvectors and each subspace gets its own ``n_centroids``-entry
    codebook, so a d-float vector compresses to m small ints (Jégou et
    al. 2011 — the memory layout every billion-scale ANN index uses:
    64 floats → 8 codes is a 32× cut in what scoring has to touch).

    ``method='sample'`` (default): train driver-side on a DETERMINISTIC
    hash-sample of at most ``sample`` rows (smallest ``xxhash64(id,
    seed)``, ties to id — the classic bounded-sample k-means posture:
    the corpus never collects, only the sample does), Lloyd ``iters``
    passes per subspace with first-k-of-sample init and empty clusters
    keeping their previous centroid.  ``method='first'``: codebook c =
    subvectors of the c-th row by id ascending, no refinement — the
    degenerate-but-DuckDB-reproducible twin used by the oracle entry,
    same posture as ``ivf_seed_codebook(method='first')``.

    Returns ``codebooks``: list of m lists of n_centroids lists of
    float (python floats, exact float32→float64 widening — both engines
    see identical literals)."""
    m = int(m)
    if method == "first":
        rows = (vectors.orderBy(F.asc(id_col)).limit(int(n_centroids))
                .select(vec_col).collect())
        vecs = [list(r[0]) for r in rows]
    elif method == "sample":
        rows = (vectors
                .orderBy(F.xxhash64(F.col(id_col), F.lit(int(seed))),
                         F.asc(id_col))
                .limit(int(sample)).select(vec_col).collect())
        vecs = [list(r[0]) for r in rows]
    else:
        raise ValueError(f"pq_train: unknown method {method!r}")
    if not vecs:
        raise ValueError("pq_train: empty corpus")
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    w = dim // m
    k = min(int(n_centroids), len(vecs))
    X = np.asarray(vecs, dtype="float64")
    books = []
    for s in range(m):
        Xs = X[:, s * w:(s + 1) * w]
        C = Xs[:k].copy()
        if method == "sample":
            for _ in range(max(int(iters), 0)):
                d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) \
                    if len(Xs) * k * w <= 2_000_000 else \
                    (Xs * Xs).sum(1)[:, None] - 2.0 * (Xs @ C.T) \
                    + (C * C).sum(1)[None, :]
                a = np.argmin(d2, axis=1)
                for c in range(k):
                    mem = Xs[a == c]
                    if len(mem):
                        C[c] = mem.mean(axis=0)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_encode(vectors: DataFrame, codebooks: list,
              id_col: str = "vec_id", vec_col: str = "embedding",
              code_col: str = "code", route: str = "auto") -> DataFrame:
    """Encode every vector to its m-int PQ code (nearest centroid per
    subspace by squared L2, ties to the smaller centroid id) — a pure
    Scan→Project map, no join, no exchange, same posture as
    :func:`ivf_assign`.

    ``route='literal'`` embeds the codebooks as array literals and
    evaluates the distances as ``zip_with``/``aggregate`` folds —
    interpreted, but bit-identical to the DuckDB oracle twin (the fold
    adds left-to-right).  ``route='pandas'`` is the scale path: one
    Arrow-batched numpy argmin per subspace (same assignments; float
    accumulation order differs, so use 'literal' where bit-exact oracle
    parity matters — the same contract as ivf_assign vs
    ivf_assign_pandas).  ``route='auto'`` picks 'pandas' past the same
    m·k·w expression budget the IVF assignment uses."""
    m = len(codebooks)
    k = len(codebooks[0])
    w = len(codebooks[0][0])
    if route == "auto":
        route = "pandas" if m * k * w > 2048 else "literal"
    if route == "pandas":
        C = [np.asarray(b, dtype="float64") for b in codebooks]
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<int>")
        def _enc(col: pd.Series) -> pd.Series:
            # zero-row Arrow batches and null/ragged vectors must not
            # fail the batch (the literal route yields null codes for
            # null vectors; this path matches that instead of raising
            # from np.stack)
            if not len(col):
                return pd.Series([], dtype=object)
            vals = col.to_numpy()
            ok = np.array([v is not None and len(v) == m * w for v in vals])
            out = np.full(len(vals), None, dtype=object)
            if ok.any():
                M = np.stack(vals[ok]).astype("float64")
                codes = np.empty((len(M), m), dtype="int32")
                for s in range(m):
                    Xs = M[:, s * w:(s + 1) * w]
                    d2 = (Xs * Xs).sum(1)[:, None] - 2.0 * (Xs @ C[s].T) \
                        + (C[s] * C[s]).sum(1)[None, :]
                    codes[:, s] = np.argmin(d2, axis=1)
                for j, i in enumerate(np.flatnonzero(ok)):
                    out[i] = codes[j]
            return pd.Series(out)

        return vectors.select(id_col, _enc(F.col(vec_col)).alias(code_col))
    if route != "literal":
        raise ValueError(f"pq_encode: unknown route {route!r}")
    elem = vectors.schema[vec_col].dataType.elementType.simpleString()
    parts = []
    for s in range(m):
        sub = F.slice(F.col(vec_col), s * w + 1, w)
        structs = []
        for c, cvec in enumerate(codebooks[s]):
            carr = F.array(*[F.lit(float(x)).cast(elem) for x in cvec])
            d2 = F.aggregate(
                F.zip_with(sub, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, v: acc + v)
            structs.append(F.struct((F.lit(0.0) - d2).alias("nd"),
                                    F.lit(-c).alias("nc")))
        best = F.array_max(F.array(*structs))
        parts.append((-best["nc"]).cast("int"))
    return vectors.select(id_col, F.array(*parts).alias(code_col))


def cosine_topk_pq(vectors: DataFrame, queries: DataFrame, k: int,
                   codebooks: list | None = None, m: int = 8,
                   n_centroids: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   qid_col: str = "query_id", method: str = "sample",
                   seed: int = 42, rerank: int = 0,
                   route: str = "auto",
                   _table_threshold: int = 1024) -> DataFrame:
    """ANN top-k by PQ asymmetric distance (ADC, inner-product form):
    the corpus is scored through its m-int codes against per-query
    lookup tables — the big side never touches its float vectors after
    the one-off encode, so the scan that matters reads m small ints per
    row instead of d floats (the reason PQ is the billion-scale layout).

    Tables: ``t[s][c] = <q_s, codebook[s][c]>`` — built driver-side
    from the (small by construction) query frame with plain
    left-to-right sums, bit-matching both the JVM unrolled score below
    and the DuckDB ``list_reduce`` twin.  Score = ADC **cosine**
    ``Σ_s t[s][code[s]] / (‖q‖·√(Σ_s n[s][code[s]]))`` where
    ``n[s][c] = ‖codebook[s][c]‖²`` is a query-independent norm table
    (codes address it the same way): plain inner-product ADC is NOT
    rank-equivalent to cosine on unnormalized vectors — large-norm
    reconstructions outrank the true neighbor — and the exact
    self-reconstruction then scores exactly 1.  Both tables are
    unrolled codegen chains over broadcast/literal arrays; zero-norm
    reconstructions score 0.0; ranking ties break to ascending id.

    ``rerank > 0``: take the top ``rerank`` ADC candidates per query
    and re-score them EXACTLY (true cosine against the real vectors —
    only candidate ids join back, a broadcast semi-join on the narrow
    side), then cut to k: the standard two-stage PQ + exact-rerank
    recipe; output column becomes ``cosine``.  With ``rerank=0`` the
    output carries the raw ADC ``score``."""
    if codebooks is None:
        codebooks = pq_train(vectors, m=m, n_centroids=n_centroids,
                             id_col=id_col, vec_col=vec_col,
                             method=method, seed=seed)
    m = len(codebooks)
    w = len(codebooks[0][0])
    codes = pq_encode(vectors, codebooks, id_col=id_col, vec_col=vec_col,
                      route=route)
    qrows = queries.select(qid_col, vec_col).collect()
    if len(qrows) <= _table_threshold:
        # plain left-to-right sums: bit-matches the DuckDB list_reduce
        # twin (oracle query sets are small by construction)
        tbl_rows = []
        for r in qrows:
            qv = [float(x) for x in r[1]]
            qn = 0.0
            for x in qv:
                qn = qn + x * x
            tables = []
            for s in range(m):
                qs = qv[s * w:(s + 1) * w]
                row = []
                for cvec in codebooks[s]:
                    acc = 0.0
                    for i in range(w):
                        acc = acc + qs[i] * cvec[i]
                    row.append(acc)
                tables.append(row)
            tbl_rows.append((r[0], tables, math.sqrt(qn)))
    else:
        # scale route: one batched matmul over the collected block —
        # (nq, m, w) @ (m, w, k) per subspace, no per-query Python.
        # Summation order differs from the toy twin in the last ulp,
        # which cannot matter at a query count no oracle runs at.
        Q = np.asarray([[float(x) for x in r[1]] for r in qrows],
                       dtype="float64")
        Cb = np.asarray(codebooks, dtype="float64")      # (m, k, w)
        T = np.einsum("qsw,skw->qsk", Q.reshape(len(Q), m, w), Cb)
        qn = np.sqrt((Q * Q).sum(axis=1))
        tbl_rows = [(r[0], T[i].tolist(), float(qn[i]))
                    for i, r in enumerate(qrows)]
    qtype = queries.schema[qid_col].dataType.simpleString()
    tdf = queries.sparkSession.createDataFrame(
        tbl_rows,
        f"{qid_col} {qtype}, _tbl array<array<double>>, _qnorm double")
    # query-independent norm table: n[s][c] = ||codebook[s][c]||²,
    # embedded as literals (same left-to-right fold as the twin)
    nrows = []
    for s in range(m):
        row = []
        for cvec in codebooks[s]:
            acc = 0.0
            for x in cvec:
                acc = acc + float(x) * float(x)
            row.append(acc)
        nrows.append(row)
    ntbl = F.array(*[F.array(*[F.lit(v) for v in row]) for row in nrows])
    scored = codes.crossJoin(F.broadcast(tdf))
    ip = F.lit(0.0)
    rn = F.lit(0.0)
    for s in range(m):
        cidx = F.element_at(F.col("code"), s + 1) + 1
        ip = ip + F.element_at(F.element_at(F.col("_tbl"), s + 1), cidx)
        rn = rn + F.element_at(F.element_at(ntbl, s + 1), cidx)
    denom = F.col("_qnorm") * F.sqrt(rn)
    score = F.when(denom == 0, F.lit(0.0)).otherwise(ip / denom)
    scored = scored.select(qid_col, id_col, score.alias("score"))
    wnd = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(wnd))
    if not rerank:
        return ranked.filter(F.col("rank") <= int(k))
    cand = ranked.filter(F.col("rank") <= int(rerank)) \
        .select(qid_col, id_col)
    qv = F.broadcast(queries.select(qid_col, F.col(vec_col).alias("_qv")))
    exact = (vectors.join(F.broadcast(cand.select(id_col).distinct()),
                          id_col, "left_semi")
             .join(F.broadcast(cand), id_col)
             .join(qv, qid_col))
    cos = (_dot(F.col(vec_col), F.col("_qv"))
           / (_norm(F.col(vec_col)) * _norm(F.col("_qv"))))
    exact = exact.select(qid_col, id_col, cos.alias("cosine"))
    w2 = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= int(k)))
