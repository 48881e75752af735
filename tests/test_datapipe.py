"""Training-data pipeline operator tests: text dedup, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from coherencebot_spark.datapipe.dedup_text import (
    exact_duplicates, minhash_lsh_pairs, ngram_jaccard, simhash_near_dups,
)
from coherencebot_spark.datapipe.similarity import (
    cosine_topk_bruteforce, cosine_topk_lsh, cosine_topk_pandas,
)
from coherencebot_spark.datapipe.text_quality import (
    with_fingerprint, with_lang_id, with_quality,
)
from coherencebot_spark.datapipe.multimodal import (
    extract_audio_features, sample_video_frames, with_image_features,
)
from coherencebot_spark.synth import images, world


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight")


def docs_df(spark):
    rows = [
        (0, BASE, "en"),
        (1, BASE, "en"),                                  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy"), "en"),        # near dup of 0
        (3, "der hund und die katze sind nicht im haus mit den kindern", "de"),
        (4, "le chat est dans la maison et il dort pour le moment", "fr"),
        (5, "xyzzy plugh 42", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(spark):
    pairs = exact_duplicates(docs_df(spark)).collect()
    assert [(r.keep_id, r.dup_id) for r in pairs] == [(0, 1)]


def test_minhash_lsh_finds_near_dup(spark):
    pairs = minhash_lsh_pairs(docs_df(spark), k=4, n_hashes=32, bands=16,
                              verify_threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all(a < 3 and b < 3 for a, b in got)  # unrelated docs never pair


def test_ngram_jaccard_values(spark):
    pairs = spark.createDataFrame([(0, 1), (0, 5)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard
         for r in ngram_jaccard(docs_df(spark), pairs, k=4).collect()}
    assert j[(0, 1)] == pytest.approx(1.0)
    assert j[(0, 5)] < 0.05


def test_simhash_near_dups(spark):
    got = {(r.id_a, r.id_b) for r in
           simhash_near_dups(docs_df(spark), max_hamming=4).collect()}
    assert (0, 1) in got
    assert not any(5 in p for p in got)


def skewed_docs_df(spark, cluster=40, background=40):
    """One dominant near-dup cluster (word-swap perturbations of BASE)
    plus unrelated background docs — the hot-bucket stress shape."""
    words = BASE.split()
    rows = []
    for i in range(cluster):
        if i % 2 == 0:
            rows.append((i, BASE))  # exact duplicate — identical simhash
        else:
            w = list(words)
            w[i % len(w)] = f"tok{i}"  # single-token perturbation
            rows.append((i, " ".join(w)))
    for j in range(background):
        rows.append((cluster + j,
                     f"background document {j} about topic{j} with words "
                     f"alpha{j} beta{j} gamma{j} delta{j} epsilon{j}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ground_truth_pairs(spark, docs, max_hamming):
    """All-pairs hamming over collected simhashes (small-n oracle)."""
    from coherencebot_spark.datapipe.dedup_text import simhash64

    sh = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    ids = sorted(sh)
    return {
        (a, b)
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin((sh[a] ^ sh[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= max_hamming
    }


def test_simhash_skew_blocking_exact_recall(spark):
    """Multi-chunk blocking is EXACT at hamming<=3 (pigeonhole): candidate
    pairs surviving verification equal the all-pairs ground truth."""
    docs = skewed_docs_df(spark)
    truth = _ground_truth_pairs(spark, docs, 3)
    got = {(r.id_a, r.id_b) for r in
           simhash_near_dups(docs, max_hamming=3, n_chunks=6).collect()}
    assert got == truth
    assert len(truth) > 10  # the cluster actually collides


def test_simhash_skew_star_mode_bounded(spark):
    """pair_mode='star' keeps candidates O(n) per bucket yet still covers
    the dominant cluster as one connected component."""
    from coherencebot_spark.datapipe.dedup_text import _simhash_block_keys

    docs = skewed_docs_df(spark)
    truth = _ground_truth_pairs(spark, docs, 3)
    star = [(r.id_a, r.id_b) for r in
            simhash_near_dups(docs, max_hamming=3, n_chunks=6,
                              pair_mode="star").collect()]
    # candidate bound: <= n_docs * n_block_keys (star emits per bucket
    # member, never per pair) — quadratic all-pairs would far exceed this
    n_keys = len(_simhash_block_keys(6, 3))
    assert len(star) <= 80 * n_keys
    # connected components over star pairs must merge every truth pair
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in star:
        parent[find(a)] = find(b)
    for a, b in truth:
        assert find(a) == find(b), (a, b)


def test_simhash_bucket_cap_bounds_candidates(spark):
    """max_bucket caps per-bucket fan-out; with the cap each block bucket
    contributes at most C(cap,2) pairs, and the hot cluster stays grouped
    (recovered via multiple block keys)."""
    from coherencebot_spark.datapipe.dedup_text import (
        _simhash_block_keys, simhash_block_stats,
    )

    docs = skewed_docs_df(spark)
    stats = simhash_block_stats(docs, max_hamming=3, n_chunks=6).collect()
    assert max(r.bucket_size for r in stats) > 10  # skew is real
    capped = {(r.id_a, r.id_b) for r in
              simhash_near_dups(docs, max_hamming=3, n_chunks=6,
                                max_bucket=8).collect()}
    uncapped = {(r.id_a, r.id_b) for r in
                simhash_near_dups(docs, max_hamming=3, n_chunks=6).collect()}
    assert capped <= uncapped
    # every capped bucket emits <= C(8,2)=28 pairs; with 20 block keys the
    # global bound is structural, not data-dependent
    assert len(capped) <= 28 * len(_simhash_block_keys(6, 3))


def test_minhash_star_and_cap_modes(spark):
    base = minhash_lsh_pairs(docs_df(spark), k=4, n_hashes=32, bands=16,
                             verify_threshold=None)
    star = minhash_lsh_pairs(docs_df(spark), k=4, n_hashes=32, bands=16,
                             verify_threshold=None, pair_mode="star")
    capped = minhash_lsh_pairs(docs_df(spark), k=4, n_hashes=32, bands=16,
                               verify_threshold=None, max_bucket=2)
    b = {(r.id_a, r.id_b) for r in base.collect()}
    s = {(r.id_a, r.id_b) for r in star.collect()}
    c = {(r.id_a, r.id_b) for r in capped.collect()}
    assert s <= b and c <= b
    # star keeps the exact-dup cluster reachable from its representative
    assert (0, 1) in s and (0, 2) in s


def _components(n_ids, pairs):
    """Union-find → frozenset of frozenset components (singletons too)."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for i in n_ids:
        groups.setdefault(find(i), set()).add(i)
    return frozenset(frozenset(g) for g in groups.values())


def test_star_mode_component_equivalence_property(spark):
    """Property: after union-find, pair_mode='star' yields IDENTICAL dedup
    groups to all-pairs mode — star emits (bucket-min, other) per bucket,
    a spanning star of every bucket clique, so transitive closure is
    preserved.  Random clustered corpus, multiple seeds."""
    import random

    words = ("spark frontier crawl fetch parse host url image caption "
             "robots delay score bucket shard merge snapshot commit "
             "python engine scale shuffle join window agg").split()
    for seed in (7, 19, 83):
        rng = random.Random(seed)
        rows, did = [], 0
        for _ in range(14):  # 14 clusters of 1-6 near-dup docs
            base = " ".join(rng.choices(words, k=40))
            for _ in range(rng.randint(1, 6)):
                toks = base.split()
                for _ in range(rng.randint(0, 3)):  # small mutations
                    toks[rng.randrange(len(toks))] = rng.choice(words)
                rows.append((did, " ".join(toks)))
                did += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ids = [r[0] for r in rows]
        kw = dict(k=4, n_hashes=32, bands=16, verify_threshold=None)
        all_pairs = {(r.id_a, r.id_b) for r in
                     minhash_lsh_pairs(docs, **kw).collect()}
        star_pairs = {(r.id_a, r.id_b) for r in
                      minhash_lsh_pairs(docs, pair_mode="star",
                                        **kw).collect()}
        assert star_pairs <= all_pairs
        assert _components(ids, star_pairs) == _components(ids, all_pairs), \
            f"seed {seed}: dedup groups diverged"


def test_lang_id_and_quality(spark):
    out = {r.doc_id: r for r in
           with_quality(with_lang_id(docs_df(spark))).collect()}
    assert out[0].lang_pred == "en"
    assert out[3].lang_pred == "de"
    assert out[4].lang_pred == "fr"
    assert out[5].lang_pred == "und"
    assert out[0].n_tokens == len(BASE.split())
    assert 0.0 <= out[5].quality_score <= out[0].quality_score <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "c b a")], "doc_id long, text string"
    )
    fp = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


def vectors_df(spark, n=64, dim=8):
    rng = np.random.default_rng(0)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), m


def test_cosine_topk_consistency(spark):
    vecs, m = vectors_df(spark)
    qv = m[:2]
    queries = spark.createDataFrame(
        [(i, [float(x) for x in qv[i]]) for i in range(2)],
        "query_id long, embedding array<float>",
    )
    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    got_b = {(r.query_id, r.rank): r.vec_id for r in brute.collect()}
    # querying with vector i must return i as rank-1 (cosine 1.0)
    assert got_b[(0, 1)] == 0 and got_b[(1, 1)] == 1

    pand = cosine_topk_pandas(vecs, qv.astype(np.float64), k=5)
    got_p = {(r.query_id, r.rank): r.vec_id for r in pand.collect()}
    assert got_p == got_b  # pandas path identical to JVM brute force

    lsh = cosine_topk_lsh(vecs, queries, k=5, dim=8, n_planes=6, n_tables=6)
    got_l = {(r.query_id, r.rank): r.vec_id for r in lsh.collect()}
    # ANN: self-match must survive bucketing (same sig for identical vecs)
    assert got_l[(0, 1)] == 0 and got_l[(1, 1)] == 1


def test_cosine_topk_ivf(spark):
    from coherencebot_spark.datapipe.similarity import cosine_topk_ivf

    vecs, m = vectors_df(spark)
    queries = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(3)],
        "query_id long, embedding array<float>",
    )
    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    got_b = {(r.query_id, r.rank): r.vec_id for r in brute.collect()}

    # probing every centroid = exact brute force (sanity anchor)
    full = cosine_topk_ivf(vecs, queries, k=5, n_centroids=8, nprobe=8)
    got_f = {(r.query_id, r.rank): r.vec_id for r in full.collect()}
    assert got_f == got_b

    # partial probe: self-match survives (query's own cluster is probed
    # first) and recall@5 stays useful
    ivf = cosine_topk_ivf(vecs, queries, k=5, n_centroids=8, nprobe=3)
    rows = ivf.collect()
    got_i = {(r.query_id, r.rank): r.vec_id for r in rows}
    for qid in range(3):
        assert got_i[(qid, 1)] == qid
    brute_sets = {q: {got_b[(q, r)] for r in range(1, 6)} for q in range(3)}
    ivf_sets = {}
    for r in rows:
        ivf_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recall = np.mean([
        len(ivf_sets.get(q, set()) & brute_sets[q]) / 5 for q in range(3)
    ])
    assert recall >= 0.4, recall


def test_pq_encode_and_topk(spark):
    """Product quantization: (a) the literal-fold and numpy encode paths
    produce identical codes; (b) the encode plan is a pure projection
    (no Exchange); (c) ADC ranks the self-match first when the query IS
    a codebook seed (exact reconstruction); (d) ADC + exact rerank over
    the full corpus reproduces brute force."""
    from coherencebot_spark.datapipe.similarity import (
        cosine_topk_bruteforce, cosine_topk_pq, pq_encode, pq_train)

    vecs, m = vectors_df(spark)                     # 64 × dim 8
    books = pq_train(vecs, m=4, n_centroids=8, method="first")
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 2

    lit = {r.vec_id: list(r.code)
           for r in pq_encode(vecs, books, route="literal").collect()}
    pan = {r.vec_id: list(r.code)
           for r in pq_encode(vecs, books, route="pandas").collect()}
    assert lit == pan and len(lit) == 64
    # seeds reconstruct exactly: row c encodes to (c, c, c, c) for c < 8
    assert lit[3] == [3, 3, 3, 3]

    plan = pq_encode(vecs, books, route="literal") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    queries = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(3)],
        "query_id long, embedding array<float>")
    adc = cosine_topk_pq(vecs, queries, k=5, codebooks=books,
                         route="literal")
    got = {(r.query_id, r.rank): r.vec_id for r in adc.collect()}
    for qid in range(3):                             # qid < 8 = a seed
        assert got[(qid, 1)] == qid

    brute = cosine_topk_bruteforce(vecs, queries, k=5)
    got_b = {(r.query_id, r.rank): r.vec_id for r in brute.collect()}
    rr = cosine_topk_pq(vecs, queries, k=5, codebooks=books,
                        rerank=64, route="literal")
    got_r = {(r.query_id, r.rank): r.vec_id for r in rr.collect()}
    assert got_r == got_b

    # trained codebooks beat nothing-at-all: sampled+Lloyd books give
    # useful recall@5 at a 16-candidate rerank
    rr16 = cosine_topk_pq(vecs, queries, k=5, m=4, n_centroids=8,
                          rerank=16)
    sets = {}
    for r in rr16.collect():
        sets.setdefault(r.query_id, set()).add(r.vec_id)
    bsets = {q: {got_b[(q, r)] for r in range(1, 6)} for q in range(3)}
    recall = np.mean([len(sets.get(q, set()) & bsets[q]) / 5
                      for q in range(3)])
    assert recall >= 0.4, recall


def test_pq_encode_pandas_null_guard(spark):
    """The pandas encode route must not fail the batch on null or
    ragged vectors (np.stack would): null/wrong-length rows get null
    codes, valid rows encode exactly as before."""
    from coherencebot_spark.datapipe.similarity import pq_encode, pq_train

    vecs, m = vectors_df(spark)
    books = pq_train(vecs, m=4, n_centroids=8, method="first")
    dirty = vecs.unionByName(spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0])],
        "vec_id long, embedding array<float>"))
    got = {r.vec_id: r.code
           for r in pq_encode(dirty, books, route="pandas").collect()}
    assert got[900] is None and got[901] is None
    assert list(got[3]) == [3, 3, 3, 3]
    assert sum(v is not None for v in got.values()) == 64


def test_pq_adc_tables_vectorized_route(spark):
    """Past 1024 collected queries the ADC lookup tables build with one
    batched einsum instead of the per-query Python loop — results for
    the same query must agree with the loop route."""
    from pyspark.sql import functions as F

    from coherencebot_spark.datapipe.similarity import (
        cosine_topk_pq, pq_train)

    vecs, m = vectors_df(spark)
    books = pq_train(vecs, m=4, n_centroids=8, method="first")
    small_q = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(3)],
        "query_id long, embedding array<float>")
    # same 3 query vectors plus 1027 distinct fillers → numpy route
    big_q = small_q.unionByName(spark.createDataFrame(
        [(100 + j, [float((j * p + 1) % 7) for p in range(1, 9)])
         for j in range(1027)],
        "query_id long, embedding array<float>"))
    small = cosine_topk_pq(vecs, small_q, k=5, codebooks=books,
                           route="literal")
    big = cosine_topk_pq(vecs, big_q, k=5, codebooks=books,
                         route="literal")
    s = {(r.query_id, r.rank): r.vec_id for r in small.collect()}
    b = {(r.query_id, r.rank): r.vec_id
         for r in big.filter(F.col("query_id") < 3).collect()}
    assert s == b
    for qid in range(3):
        assert b[(qid, 1)] == qid              # exact reconstruction


def test_ivf_assign_is_shuffle_free(spark):
    """Centroid assignment must be a pure projection: the codebook lives in
    the plan as literals, so the physical plan for the assignment shows NO
    Exchange (the old crossJoin+window form shuffled |corpus|×n_centroids
    rows carrying the embedding column)."""
    from coherencebot_spark.datapipe.similarity import ivf_assign

    vecs, m = vectors_df(spark)
    cent_rows = [(i, [float(x) for x in m[i]]) for i in range(8)]
    assigned = ivf_assign(vecs, cent_rows)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    # numpy reference: argmax cosine, ties → smallest cent_id
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    c = mn[:8]
    expect = {i: int(np.argmax(mn[i] @ c.T)) for i in range(len(m))}
    got = {r.vec_id: r.cent_id for r in assigned.collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_image_features_real_decode(spark):
    rows = []
    for i in range(4):
        p = world.payload_row(i)
        rows.append((p["image_id"], p["bytes"], p["w"], p["h"], p["fmt"],
                     p["caption"], p["phash"]))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")
    out = {r.image_id: r for r in with_image_features(df).collect()}
    for i in range(4):
        r = out[f"img{i:08d}"]
        assert (r.dec_w, r.dec_h) == (r.w, r.h)
        if r.fmt not in images.LOSSY:
            assert r.phash64 == r.phash  # lossless round-trip → same phash


def test_audio_pcm16_and_video_plan(spark):
    x = (np.sin(np.linspace(0, 20 * np.pi, 1000)) * 10000).astype("<i2")
    audio = spark.createDataFrame(
        [("c1", x.tobytes(), 16000, 1, 62, "pcm16")],
        "clip_id string, bytes binary, sample_rate int, n_channels int, "
        "duration_ms long, codec string")
    r = extract_audio_features(audio).collect()[0]
    assert r.rms == pytest.approx(10000 / np.sqrt(2), rel=0.01)
    assert r.zero_crossings == 19 or r.zero_crossings == 20

    video = spark.createDataFrame(
        [("v1", b"", 640, 360, 30.0, 91, "raw")],
        "clip_id string, bytes binary, w int, h int, fps float, "
        "n_frames int, codec string")
    frames = sample_video_frames(video, every_n=30).collect()
    assert [f.frame_idx for f in frames] == [0, 30, 60, 90]


def test_lsh_params_for():
    from coherencebot_spark.datapipe.similarity import lsh_params_for

    p_small, _ = lsh_params_for(10_000, target_bucket=1024)
    p_huge, _ = lsh_params_for(10_000_000_000, target_bucket=1024)
    assert p_small <= 8 < p_huge
    # bucket-size invariant: n / 2^planes <= target (within the ceil)
    for n in (10_000, 10**7, 10**10):
        p, _ = lsh_params_for(n, 1024)
        assert n / (2 ** p) <= 1024


def test_ivf_refined_codebook_recall(spark):
    """VERDICT r3 #4: on a clustered corpus whose ids correlate with
    cluster membership, the 'first'-N codebook collapses into one region;
    the sampled + one-Lloyd-pass codebook must recover strictly better
    recall vs brute force at the same nprobe."""
    from coherencebot_spark.datapipe.similarity import (
        cosine_topk_bruteforce, cosine_topk_ivf,
    )

    rng = np.random.RandomState(7)
    dim, n_clusters, per = 16, 8, 40
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.concatenate([
        centers[c] + 0.05 * rng.randn(per, dim) for c in range(n_clusters)
    ])  # ids 0..39 are ALL cluster 0, 40..79 cluster 1, ... (worst case
    #     for a first-N codebook: its 8 seeds all land in cluster 0)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )
    qids = [0, 45, 90, 135, 180, 225, 270, 315]  # one query per cluster
    queries = spark.createDataFrame(
        [(i, [float(x) for x in pts[q]]) for i, q in enumerate(qids)],
        "query_id long, embedding array<float>",
    )
    k, nprobe = 10, 2
    brute = {}
    for r in cosine_topk_bruteforce(vecs, queries, k=k).collect():
        brute.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(codebook):
        got = {}
        out = cosine_topk_ivf(vecs, queries, k=k, n_centroids=8,
                              nprobe=nprobe, codebook=codebook)
        for r in out.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return np.mean([
            len(got.get(q, set()) & brute[q]) / k for q in range(len(qids))
        ])

    r_first = recall("first")
    r_refined = recall("refined")
    assert r_refined > r_first, (r_first, r_refined)
    assert r_refined >= 0.8, r_refined


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe LSH: flipping the lowest-margin planes recovers
    neighbors that landed one bit away — recall at ONE table with probes
    must beat the same table without, and never lose the self-match."""
    rng = np.random.RandomState(11)
    dim, n = 16, 400
    pts = rng.randn(n, dim).astype(np.float64)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    qids = list(range(12))
    queries = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in qids],
        "query_id long, embedding array<float>",
    )
    k = 10
    brute = {}
    for r in cosine_topk_bruteforce(vecs, queries, k=k).collect():
        brute.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(multiprobe):
        got = {}
        out = cosine_topk_lsh(vecs, queries, k=k, dim=dim, n_planes=7,
                              n_tables=1, multiprobe=multiprobe)
        for r in out.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        # self-match must always survive (query is its own bucket)
        for q in qids:
            assert q in got.get(q, set())
        return np.mean([len(got.get(q, set()) & brute[q]) / k for q in qids])

    r0 = recall(0)
    r3 = recall(3)
    assert r3 > r0, (r0, r3)


def test_empty_docs_produce_no_shingles_or_pairs(spark):
    # sequence(1, 0) is the DESCENDING [1, 0], not empty: without the
    # guard every empty doc shared one degenerate shingle and all landed
    # in a single giant LSH bucket
    from coherencebot_spark.datapipe.dedup_text import (
        _shingles, minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, ""), (2, "abc"), (3, "a much longer document text"),
         (4, "a much longer document texx")],
        "doc_id long, text string")
    sh = _shingles(docs, "doc_id", "text", k=5, max_shingles=100)
    got = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert got == {3, 4}  # empty + shorter-than-k docs emit nothing
    pairs = minhash_lsh_pairs(docs, k=5, n_hashes=16, bands=4,
                              verify_threshold=None).collect()
    ids = {frozenset((r.id_a, r.id_b)) for r in pairs}
    assert frozenset((0, 1)) not in ids  # empty docs never pair


def test_lsh_33_planes_long_masks(spark):
    # 1 << p overflows int32 at p>=31 — exactly the ~33-plane regime
    # lsh_params_for prescribes at 10^10 vectors; signatures and probe
    # masks must be LONG
    from coherencebot_spark.datapipe.similarity import cosine_topk_lsh

    rng = np.random.RandomState(3)
    pts = rng.randn(40, 8)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    q = spark.createDataFrame(
        [(0, [float(x) for x in pts[0]])],
        "query_id long, embedding array<float>")
    out = cosine_topk_lsh(vecs, q, k=3, dim=8, n_planes=33, n_tables=1,
                          multiprobe=2).collect()
    assert any(r.vec_id == 0 and r.rank == 1 for r in out)  # self-match


def test_lm_typicality_scores_and_model(spark):
    import math

    from coherencebot_spark.datapipe.lm_quality import (
        lm_typicality, score_typicality, train_trigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and the cat sat again"),
         (2, "the dog sat on the mat and the dog ran away"),
         (3, "zzqx!!##@@ qqzx ##!!zz xx@@qq"),
         (4, "ab")],                      # < 3 chars: no trigrams, dropped
        "doc_id long, text string")

    model = train_trigram_lm(docs, vocab_limit=4096)
    mrows = {r.tri: (r.c, r.logp) for r in model.collect()}
    # hand-counted corpus trigram: "at " occurs 4+3 times across docs 1-2
    assert mrows["at "][0] == 7
    total = sum(c for c, _ in mrows.values())
    v = len(mrows)
    assert mrows["at "][1] == pytest.approx(math.log(8 / (total + v)))

    out = {r.doc_id: r for r in lm_typicality(docs).collect()}
    assert set(out) == {1, 2, 3}          # doc 4 dropped (too short)
    assert out[1].oov_tris == 0           # trained on itself: full coverage
    # junk doc is the least typical
    assert out[3].avg_logp < out[2].avg_logp < out[1].avg_logp

    # OOV floor: score unseen text against a model trained only on docs 1-2
    m12 = train_trigram_lm(docs.where("doc_id <= 2"), vocab_limit=4096)
    s3 = score_typicality(docs.where("doc_id = 3"), m12).collect()[0]
    assert s3.oov_tris > 0
    n12 = {r.tri for r in m12.collect()}
    assert "zzq" not in n12               # genuinely unseen trigram


def test_lm_typicality_coded_path_matches_string_path(spark):
    """lm_typicality's packed-long trigram pipeline (r6 optimization) must
    be value-identical to the public string-keyed train+score composition
    — including top-V tie-breaks (tiny vocab_limit) and non-ASCII text
    (the packing must be order-preserving vs UTF8 comparison)."""
    from coherencebot_spark.datapipe.lm_quality import (
        _exploded_trigrams, _score, _train_model, lm_typicality,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and the cat sat again"),
         (2, "ĄĆŻ 中文𝄞 MIXED case ß and ΩΣ with the mat"),
         (3, "abcdefabcdef abcdef"),
         (4, "ab")],
        "doc_id long, text string")

    def string_path(vocab_limit):
        model = _train_model(_exploded_trigrams(docs, "text", 2000),
                             vocab_limit)
        local = spark.createDataFrame(model.collect(), model.schema)
        return _score(_exploded_trigrams(docs, "text", 2000, "doc_id"),
                      local, "doc_id")

    for v in (4096, 5):  # full vocab + a cut that forces tie-breaking
        a = {r.doc_id: (r.n_tris, r.oov_tris, r.avg_logp)
             for r in string_path(v).collect()}
        b = {r.doc_id: (r.n_tris, r.oov_tris, r.avg_logp)
             for r in lm_typicality(docs, vocab_limit=v).collect()}
        assert a == b


def test_lm_typicality_vocab_limit_tiebreak(spark):
    from coherencebot_spark.datapipe.lm_quality import train_trigram_lm

    # every trigram of "abcdef" occurs exactly once: the top-2 cut must be
    # the deterministic (count DESC, tri ASC) prefix
    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    m = train_trigram_lm(docs, vocab_limit=2)
    assert sorted(r.tri for r in m.collect()) == ["abc", "bcd"]


def test_semantic_dedup_marks_scaled_copies(spark):
    from coherencebot_spark.datapipe.similarity import semantic_dedup

    rng = np.random.RandomState(7)
    # 3 well-separated direction clusters of 10 vectors each
    centers = rng.randn(3, 16) * 4
    rows = []
    # noise large enough that two cluster MEMBERS stay below the 0.999
    # threshold (≈0.994 cosine) while a scaled copy is exactly parallel
    for i in range(30):
        v = centers[i % 3] + rng.randn(16) * 0.3
        rows.append((i, [float(x) for x in v]))
    # ids 100+: exact scaled copies of vectors 0..4 — semantic dups
    for i in range(5):
        rows.append((100 + i, [2.0 * x for x in rows[i][1]]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {r.vec_id: r for r in
           semantic_dedup(vecs, threshold=0.999, n_centroids=3,
                          codebook="refined", seed=3).collect()}
    assert len(out) == 35
    for i in range(5):                    # each copy dups its base
        assert out[100 + i].is_dup and out[100 + i].dup_of == i
    assert not any(out[i].is_dup for i in range(30))  # originals all kept
    # copies landed in the same cluster as their base (same direction)
    assert all(out[100 + i].cent_id == out[i].cent_id for i in range(5))


def test_semantic_dedup_max_cluster_cap(spark):
    from coherencebot_spark.datapipe.similarity import semantic_dedup

    # one degenerate cluster: every vector identical — pair generation is
    # quadratic there, the cap must skip it and keep all rows non-dup
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>")
    capped = semantic_dedup(vecs, threshold=0.9, n_centroids=2,
                            codebook="first", max_cluster=5)
    rows = capped.collect()
    assert len(rows) == 20 and not any(r.is_dup for r in rows)
    uncapped = semantic_dedup(vecs, threshold=0.9, n_centroids=2,
                              codebook="first")
    assert uncapped.where("is_dup").count() == 19  # keep-first, all others


def test_dedup_lines_ccnet_semantics(spark):
    from coherencebot_spark.datapipe.dedup_text import dedup_lines

    docs = spark.createDataFrame(
        [(1, "unique one\ncookie banner\n\nreal text here"),
         (2, "cookie banner\nother unique line"),
         (3, "cookie banner\n  cookie banner  \nonly boilerplate")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines(docs).collect()}
    assert len(out) == 3                         # no doc ever dropped
    # trimmed-form matching: the padded variant counts with the bare one
    assert out[1].text == "unique one\n\nreal text here"   # blank kept
    assert out[2].text == "other unique line"
    assert out[3].text == "only boilerplate" and out[3].n_dropped == 2
    # max_count=3: 'cookie banner' occurs 4x corpus-wide, still dropped;
    # raise to 4 and it survives everywhere with original padding
    relaxed = {r.doc_id: r.text
               for r in dedup_lines(docs, max_count=4).collect()}
    assert relaxed[3] == "cookie banner\n  cookie banner  \nonly boilerplate"


def test_dedup_lines_all_boilerplate_doc_kept_empty(spark):
    from coherencebot_spark.datapipe.dedup_text import dedup_lines

    docs = spark.createDataFrame(
        [(1, "same line"), (2, "same line"), (3, "same line")],
        "doc_id long, text string")
    rows = dedup_lines(docs).collect()
    assert len(rows) == 3
    assert all(r.text == "" and r.n_dropped == 1 and r.n_lines == 1
               for r in rows)


def test_dedup_substrings_keep_first(spark):
    """Lee et al. exact-substring dedup: an 8-token passage shared by
    three docs survives only in the lowest-(id, pos) occurrence; the
    other carriers lose exactly the covered token span (overlapping
    k-windows merge into one span); unique text is untouched."""
    from coherencebot_spark.datapipe.dedup_text import dedup_substrings

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, passage + " one"),
         (2, "pre2 " + passage + " post2"),
         (3, passage),
         (4, "totally unrelated words that never repeat anywhere at all")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_substrings(docs, k=4).collect()}
    assert len(out) == 4                          # no doc ever dropped
    assert out[1].text == passage + " one" and out[1].n_removed == 0
    assert out[2].text == "pre2 post2" and out[2].n_removed == 8
    assert out[3].text == "" and out[3].n_removed == 8
    assert out[4].n_removed == 0
    assert out[2].n_tokens == 10 and out[3].n_tokens == 8


def test_dedup_substrings_internal_repetition(spark):
    """Within-document repetition dedups against the doc's own first
    occurrence: 'a b c d' ×3 collapses to one copy at k=4."""
    from coherencebot_spark.datapipe.dedup_text import dedup_substrings

    docs = spark.createDataFrame(
        [(1, "a b c d a b c d a b c d")], "doc_id long, text string")
    r = dedup_substrings(docs, k=4).collect()[0]
    assert r.text == "a b c d" and r.n_removed == 8 and r.n_tokens == 12


def test_dedup_substrings_sub_k_docs_pass_through(spark):
    """Docs shorter than k tokens produce no windows — identical short
    docs pass through verbatim (exact dedup at k-token granularity is
    deliberately blind below k; use exact_duplicates for whole-doc)."""
    from coherencebot_spark.datapipe.dedup_text import dedup_substrings

    docs = spark.createDataFrame(
        [(1, "tiny shared doc"), (2, "tiny shared doc")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_substrings(docs, k=4).collect()}
    assert out[1].text == out[2].text == "tiny shared doc"
    assert out[1].n_removed == out[2].n_removed == 0


def test_dedup_substrings_portable_hash_matches_default(spark):
    """md5_long60 (DuckDB-twin) and xxhash64 keys group identically."""
    from coherencebot_spark.datapipe.dedup_text import dedup_substrings
    from coherencebot_spark.functions.hashing import md5_long60

    docs = spark.createDataFrame(
        [(i, ("shared passage of exactly nine tokens here now %d" % (i % 2)))
         for i in range(6)],
        "doc_id long, text string")
    a = {(r.doc_id, r.text, r.n_removed)
         for r in dedup_substrings(docs, k=5).collect()}
    b = {(r.doc_id, r.text, r.n_removed)
         for r in dedup_substrings(docs, k=5, hash_fn=md5_long60).collect()}
    assert a == b


def test_winnow_shared_passage_guarantee(spark):
    """Winnowing guarantee: a shared substring of length >= k + window - 1
    always yields at least one shared selected fingerprint."""
    from coherencebot_spark.datapipe.dedup_text import (
        shared_passage_stats, winnow_fingerprints,
    )
    from coherencebot_spark.functions.hashing import md5_long60

    passage = "the shared boilerplate passage appears right here"
    docs = spark.createDataFrame(
        [(1, "completely unique text sharing nothing with anyone at all"),
         (2, passage + " in this document"),
         (3, "different start but " + passage + " too")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           shared_passage_stats(docs, hash_fn=md5_long60).collect()}
    assert out[1].n_shared == 0 and out[1].shared_frac == 0.0
    assert out[2].n_shared > 0 and out[3].n_shared > 0

    # density: winnowing selects ~1/window of the grams, never more than
    # the window count, and the guarantee needs >= 1 per doc here
    from pyspark.sql import functions as F
    fps = winnow_fingerprints(docs, k=8, window=4, hash_fn=md5_long60)
    per_doc = {r.doc_id: r.cnt for r in
               fps.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    for r in docs.collect():
        n_windows = len(r.text) - (8 + 4 - 2)
        assert 1 <= per_doc[r.doc_id] <= n_windows


def test_winnow_short_docs_dropped(spark):
    from coherencebot_spark.datapipe.dedup_text import winnow_fingerprints
    from coherencebot_spark.functions.hashing import md5_long60

    docs = spark.createDataFrame(
        [(1, "0123456789"), (2, "0123456789a")],  # k+w-1 = 11
        "doc_id long, text string")
    got = {r.doc_id for r in
           winnow_fingerprints(docs, hash_fn=md5_long60).collect()}
    assert got == {2}


def test_corpus_rollup_levels(spark):
    from coherencebot_spark.datapipe.corpus_stats import corpus_rollup

    d = spark.createDataFrame(
        [(1, "en", "a", 10), (2, "en", "a", 20), (3, "en", "b", 30),
         (4, "de", "a", 40)],
        "doc_id long, lang string, source string, n_chars long")
    rows = {(r.lang, r.source, r.g_lang, r.g_source): r
            for r in corpus_rollup(d).collect()}
    assert rows[("en", "a", 0, 0)].n_docs == 2
    assert rows[("en", None, 0, 1)].total_chars == 60     # lang subtotal
    gt = rows[(None, None, 1, 1)]                         # grand total
    assert gt.n_docs == 4 and gt.total_chars == 100
    assert gt.avg_chars == 25.0


def test_length_quantiles_exact_and_approx(spark):
    from coherencebot_spark.datapipe.corpus_stats import length_quantiles

    d = spark.createDataFrame(
        [(i, "en", v) for i, v in enumerate([10, 20, 30, 40, 50])],
        "doc_id long, lang string, n_chars long")
    exact = {r.prob: r.value
             for r in length_quantiles(d, probs=(0.5, 0.75)).collect()}
    assert exact[0.5] == 30.0
    assert exact[0.75] == 40.0          # linear interpolation on 5 values
    approx = {r.prob: r.value
              for r in length_quantiles(d, probs=(0.5,),
                                        approx=True).collect()}
    assert abs(approx[0.5] - 30.0) <= 10.0   # sketch within one step here


def test_incremental_dedup_batch_vs_history(spark):
    from coherencebot_spark.datapipe.incremental import (
        doc_signatures, incremental_exact_dedup, merge_bloom_shards)
    from coherencebot_spark.functions.hashing import (
        bloom_contains_sharded, build_bloom_sharded)

    hist = spark.createDataFrame(
        [(1, "old document one"), (2, "old document two")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "old document one"),      # historical dup -> drop
         (11, "brand new eleven"),
         (12, "brand new twelve"),
         (13, "brand new twelve")],     # intra-batch dup of 12 -> drop
        "doc_id long, text string")
    sigs = doc_signatures(hist)
    blooms = build_bloom_sharded(sigs, "sig", capacity=10_000, n_buckets=8)

    with_bloom = incremental_exact_dedup(batch, sigs, blooms, n_buckets=8)
    assert sorted(r.doc_id for r in with_bloom.collect()) == [11, 12]
    # bloom is pruning only: the no-bloom path gives the same answer
    exact = incremental_exact_dedup(batch, sigs)
    assert sorted(r.doc_id for r in exact.collect()) == [11, 12]

    # fold the accepted batch in by bitmap OR; everything now maybe-seen
    merged = merge_bloom_shards(
        blooms, build_bloom_sharded(doc_signatures(with_bloom), "sig",
                                    capacity=10_000, n_buckets=8))
    probe = bloom_contains_sharded(doc_signatures(batch), "sig", merged,
                                   n_buckets=8)
    assert all(r.maybe_seen for r in probe.collect())
    # and a never-seen signature still probes negative (no saturation)
    novel = doc_signatures(spark.createDataFrame(
        [(99, "definitely unseen text")], "doc_id long, text string"))
    p2 = bloom_contains_sharded(novel, "sig", merged, n_buckets=8)
    assert [r.maybe_seen for r in p2.collect()] == [False]


def test_merge_bloom_shards_param_mismatch(spark):
    import pytest as _pytest
    from coherencebot_spark.datapipe.incremental import (
        doc_signatures, merge_bloom_shards)
    from coherencebot_spark.functions.hashing import build_bloom_sharded

    sigs = doc_signatures(spark.createDataFrame(
        [(1, "x")], "doc_id long, text string"))
    a = build_bloom_sharded(sigs, "sig", capacity=10_000, n_buckets=4)
    b = build_bloom_sharded(sigs, "sig", capacity=500_000, n_buckets=4)
    with _pytest.raises(Exception, match="mismatched shard params"):
        merge_bloom_shards(a, b).collect()


def test_ivf_assign_pandas_matches_literal_path(spark):
    """The large-codebook numpy assignment must agree with the literal
    projection wherever cosines aren't ulp-tied (well-separated data)."""
    from coherencebot_spark.datapipe.similarity import (
        ivf_assign, ivf_assign_pandas, ivf_seed_codebook)

    rng = np.random.RandomState(11)
    centers = rng.randn(6, 12) * 5
    rows = [(i, [float(x) for x in centers[i % 6] + rng.randn(12) * 0.1])
            for i in range(120)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_seed_codebook(vecs, 6, method="sample", seed=5)

    lit = {r.vec_id: r.cent_id for r in
           ivf_assign(vecs, cents).collect()}
    pnd = {r.vec_id: r.cent_id for r in
           ivf_assign_pandas(vecs, cents).collect()}
    assert lit == pnd


def test_cosine_topk_ivf_large_codebook_routes_pandas(spark):
    """Past the literal budget the IVF corpus assignment auto-routes to
    the numpy path; results still contain each query's true neighbor."""
    from coherencebot_spark.datapipe.similarity import cosine_topk_ivf

    rng = np.random.RandomState(21)
    pts = rng.randn(300, 8) * 3
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(300)],
        "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [float(x) for x in pts[0]])],
        "query_id long, embedding array<double>")
    # 300 centroids × 8 dims = 2400 > budget 2048 -> pandas assignment
    out = cosine_topk_ivf(vecs, q, k=3, n_centroids=300, nprobe=4,
                          codebook="sample").collect()
    assert any(r.vec_id == 0 and r.rank == 1 for r in out)  # self-match


def test_winnow_single_hash_pass_plan(spark):
    """The gram-hash transform must appear exactly once in the physical
    plan: the staged projection keeps CollapseProject from re-inlining
    it into every shifted copy (a window× re-evaluation, measured 2.2×
    slower on the bench corpus)."""
    from coherencebot_spark.datapipe.dedup_text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "some reasonably long text for winnowing " * 4)],
        "doc_id long, text string")
    p = winnow_fingerprints(docs)._jdf.queryExecution() \
        .executedPlan().toString().split("== Initial Plan ==")[0]
    assert p.count("transform(sequence") == 1, p
