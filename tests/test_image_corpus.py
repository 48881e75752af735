"""Image+caption corpus pipeline (datapipe/image_corpus.py): stage
semantics on real synthetic-codec payloads, exact-recall property of the
phash blocking, and the bytes-never-shuffle plan posture."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.image_corpus import (
    ImageCorpusConfig,
    build_image_corpus,
    image_exact_dedup,
    image_shard_manifest,
    phash_near_dup_pairs,
    wellformed_images,
)
from coherencebot_spark.synth import images as simg
from coherencebot_spark.synth.phash import phash64

SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
          "caption string, phash long")


def _img_row(i: int, w: int = 64, h: int = 64, fmt: str = "png",
             caption: str = "a small test image", phash: int | None = None,
             px=None):
    if px is None:
        px = simg.gen_pixels(i, w, h)
    data = simg.encode(px, fmt)
    return (f"img{i:04d}", bytearray(data), w, h, fmt, caption,
            phash if phash is not None else phash64(px))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # four healthy distinct images
        _img_row(0), _img_row(1), _img_row(2, w=128, h=96),
        _img_row(3, fmt="bmp"),
        # exact-phash duplicate pair: img0004 (small) vs img0005 (large
        # area) — the larger must survive the argmax
        _img_row(4, w=64, h=64, phash=777),
        _img_row(5, w=128, h=128, phash=777),
        # near-dup of img0000's phash (1 bit) — smaller area, must drop
        _img_row(6, w=48, h=48, phash=phash64(simg.gen_pixels(0, 64, 64)) ^ 1),
        # gate rejects: tiny, extreme aspect, short caption, one-token
        _img_row(7, w=16, h=16),
        _img_row(8, w=640, h=64),
        _img_row(9, caption="hi"),
        _img_row(10, caption="monoword"),
        # corrupt row: stored dims disagree with the encoded pixels
        (f"img{11:04d}", bytearray(simg.encode(simg.gen_pixels(11, 64, 64),
                                               "png")),
         96, 96, "png", "claims to be ninety-six", 4242),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_wellformed_gates(corpus):
    cfg = ImageCorpusConfig(min_w=48, min_h=48)
    kept = {r.image_id for r in wellformed_images(corpus, cfg)
            .select("image_id").collect()}
    assert "img0007" not in kept          # below the size floor
    assert "img0008" not in kept          # aspect 10:1
    assert "img0009" not in kept          # caption too short
    assert "img0010" not in kept          # one token
    assert {"img0000", "img0001", "img0002", "img0003",
            "img0006"} <= kept


def test_wellformed_format_allowlist(corpus):
    cfg = ImageCorpusConfig(formats=("png", "ppm"))
    kept = {r.image_id for r in wellformed_images(corpus, cfg)
            .select("image_id").collect()}
    assert "img0003" not in kept          # bmp


def test_exact_dedup_keeps_largest_area(corpus):
    out = image_exact_dedup(corpus)
    ids = {r.image_id for r in out.select("image_id").collect()}
    assert "img0005" in ids and "img0004" not in ids
    # everything with a unique phash survives untouched
    assert "img0000" in ids and "img0011" in ids


def test_phash_near_dup_pairs_exact_at_radius(spark):
    # exhaustive ground truth vs the blocked plan on adversarial hashes:
    # bit-flips at chunk boundaries, clustered flips inside one chunk,
    # flips spread across chunks, and far-apart values
    base = 0x0123456789ABCDEF
    hashes = [
        base, base ^ 1, base ^ (1 << 10), base ^ (1 << 63),
        base ^ 0b111,                       # 3 flips, one chunk
        base ^ (1 | 1 << 21 | 1 << 42),     # 3 flips, three chunks
        base ^ (1 | 1 << 21 | 1 << 42 | 1 << 59),  # hamming 4: out
        0x7EDCBA9876543210,
    ]
    df = spark.createDataFrame(
        [(f"i{k:02d}", int(_signed64(h))) for k, h in enumerate(hashes)],
        "image_id string, phash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in phash_near_dup_pairs(df, max_hamming=3).collect()}
    want = set()
    for a in range(len(hashes)):
        for b in range(a + 1, len(hashes)):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 3:
                want.add((f"i{a:02d}", f"i{b:02d}", d))
    assert got == want
    assert ("i00", "i06", 4) not in got


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def test_shard_manifest_invariants(spark):
    df = spark.createDataFrame(
        [(f"i{k:03d}", 300 + 37 * (k % 11)) for k in range(200)],
        "image_id string, nbytes long")
    m = image_shard_manifest(df, shard_bytes=2048, size_col="nbytes",
                             parallelism=4).collect()
    assert len(m) == 200
    rows = sorted(m, key=lambda r: r.image_id)
    cum = 0
    for r in rows:
        assert r.shard_id == cum // 2048
        assert r.shard_offset == cum % 2048
        cum += r.nbytes
    # shards are dense 0..max
    sids = {r.shard_id for r in rows}
    assert sids == set(range(max(sids) + 1))


def test_build_image_corpus_end_to_end(corpus):
    cfg = ImageCorpusConfig(min_w=48, min_h=48, validate_decode=True,
                            shard=True, shard_bytes=1 << 16)
    out, audit = build_image_corpus(corpus, cfg)
    ids = {r.image_id for r in out.select("image_id").collect()}
    # gates: 7/8/9/10 out; exact dedup: 4 loses to 5; near-dup: 6 loses
    # to 0 (smaller area); decode validation: 11 lies about its dims
    assert ids == {"img0000", "img0001", "img0002", "img0003", "img0005"}
    assert audit["input"] == 12
    assert audit["wellformed"] == 8
    assert audit["exact_dedup"] == 7
    assert audit["near_dedup"] == 6
    assert audit["validate_decode"] == 5
    assert audit["shards"] >= 1
    # manifest columns joined back
    assert {"shard_id", "shard_offset", "nbytes"} <= set(out.columns)


def test_wellformed_is_pure_filter_no_shuffle(corpus):
    p = wellformed_images(corpus, ImageCorpusConfig()) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_bytes_never_cross_a_shuffle(corpus):
    """The corpus posture: every wide stage runs on a narrow projection;
    payload bytes reach the output only through scan-side joins."""
    cfg = ImageCorpusConfig(min_w=48, min_h=48, validate_decode=False,
                            shard=True, shard_bytes=1 << 16)
    out, _ = build_image_corpus(corpus, cfg)
    p = out._jdf.queryExecution().executedPlan().toString()
    for block in p.split("Exchange")[1:]:
        first_line = block.splitlines()[0]
        assert "bytes" not in first_line, \
            f"payload bytes cross a shuffle: {first_line}"


def test_write_image_shards_round_trip(spark, tmp_path):
    """Physical shards: every payload lands byte-identical at its
    manifest offset; the idx sidecar supports ranged reads."""
    import glob
    import json
    import os

    from coherencebot_spark.datapipe.image_corpus import (
        read_image_shard, write_image_shards)

    rows = [(f"i{k:03d}", bytes([k % 251]) * (100 + 37 * (k % 7)))
            for k in range(60)]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows],
        "image_id string, bytes binary")
    out = tmp_path / "shards"
    write_image_shards(df, str(out), shard_bytes=1500, parallelism=4)

    want = dict(rows)
    seen = {}
    for idx in sorted(glob.glob(str(out / "shard-*.idx.json"))):
        shard = idx.replace(".idx.json", ".bin")
        for image_id, data in read_image_shard(shard, idx):
            seen[image_id] = data
    assert seen == want

    # offsets in the sidecars are shard-local and contiguous
    for idx in glob.glob(str(out / "shard-*.idx.json")):
        with open(idx) as f:
            entries = sorted((json.loads(ln) for ln in f),
                             key=lambda e: e["offset"])
        pos = 0
        for e in entries:
            assert e["offset"] == pos
            pos += e["nbytes"]
        assert pos == os.path.getsize(idx.replace(".idx.json", ".bin"))

    # the global manifest covers every member exactly once
    man_lines = []
    for p in glob.glob(str(out / "_MANIFEST.json" / "part-*")):
        with open(p) as f:
            man_lines += [json.loads(ln) for ln in f if ln.strip()]
    assert {m["image_id"] for m in man_lines} == set(want)


def test_image_semantic_dedup_stage(spark):
    """SemDeDup slot: an embedding-duplicate that drifted past the phash
    radius is removed by the semantic stage, bytes stay out of it."""
    rows = [
        _img_row(0, caption="a small test image zero"),
        _img_row(1, caption="a small test image one"),
        _img_row(2, caption="a small test image two"),
        # heavy recompress of img0000: phash far (not caught by hamming<=3)
        # but embedding direction identical
        _img_row(20, caption="recompressed copy of image zero",
                 phash=phash64(simg.gen_pixels(0, 64, 64)) ^ 0xFF00FF),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "embedding",
        F.when(F.col("image_id").isin("img0000", "img0020"),
               F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)))
         .when(F.col("image_id") == "img0001",
               F.array(F.lit(0.0), F.lit(1.0), F.lit(0.0)))
         .otherwise(F.array(F.lit(0.0), F.lit(0.0), F.lit(1.0))))
    cfg = ImageCorpusConfig(
        wellformed=False, exact_dedup=False, near_dedup=False,
        shard=False, semantic=True, embedding_col="embedding",
        semantic_threshold=0.999, semantic_centroids=3)
    out, audit = build_image_corpus(df, cfg)
    ids = {r.image_id for r in out.collect()}
    # the surrogate keep rule removes exactly one of the duplicate pair
    # (min-xxhash member survives — deterministic, arbitrary)
    assert audit["semantic_dedup"] == 3
    assert {"img0001", "img0002"} <= ids
    assert len(ids & {"img0000", "img0020"}) == 1


def test_caption_dedup_spam_gate(spark):
    from coherencebot_spark.datapipe.image_corpus import caption_dedup

    rows = [
        _img_row(0, caption="a unique red bicycle by the wall"),
        _img_row(1, caption="Image may contain: person"),
        _img_row(2, caption="  image may contain: PERSON "),  # same key
        _img_row(3, caption="image may contain: person"),      # same key
        _img_row(4, caption="another unique caption entirely"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kept = {r.image_id for r in caption_dedup(df).collect()}
    # min-id copy of the boilerplate survives; uniques untouched
    assert kept == {"img0000", "img0001", "img0004"}
    relaxed = {r.image_id for r in caption_dedup(df, max_count=3).collect()}
    assert relaxed == {f"img{i:04d}" for i in range(5)}


def test_build_corpus_cli_bridge(spark, tmp_path):
    """scripts/build_corpus.py: crawl content SnapshotTable (one snapshot
    per cycle) -> deduped manifest + physical shards."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from build_corpus import build
    from coherencebot_spark.sources.snapshot import SnapshotTable

    wd = str(tmp_path / "crawl")
    tbl = SnapshotTable(os.path.join(wd, "content"), "content")
    base = ("url string, host string, score float, "
            "metadata map<string,string>, " + SCHEMA + ", truncated boolean")

    def seg(rows):
        return spark.createDataFrame(
            [("http://h/x", "h", 1.0, None) + r + (False,) for r in rows],
            base)

    dup = _img_row(5, w=128, h=128, phash=777)
    tbl.write(seg([_img_row(0), _img_row(4, phash=777)]), cycle_id=0)
    tbl.write(seg([dup, _img_row(6, w=16, h=16)]), cycle_id=1)  # tiny: gated

    out = str(tmp_path / "corpus")
    audit = build(spark, wd, out, write_shards=True, shard_bytes=1 << 20)
    assert audit["input"] == 4
    assert audit["wellformed"] == 3          # img0006 fails the size gate
    assert audit["exact_dedup"] == 2         # phash 777: larger copy wins
    assert audit["shard_files"] >= 1
    import duckdb
    kept = {r[0] for r in duckdb.connect().execute(
        f"SELECT image_id FROM read_parquet('{out}/manifest/**/*.parquet')"
    ).fetchall()}
    assert kept == {"img0000", "img0005"}
    assert os.path.exists(os.path.join(out, "shards", "_MANIFEST.json"))


def test_aspect_bucket_assignment(spark):
    from coherencebot_spark.datapipe.image_corpus import (
        DEFAULT_ASPECT_LADDER, aspect_bucket)
    import math

    df = spark.createDataFrame(
        [("sq", 1000, 1000), ("tall", 700, 1400),
         ("wide", 1300, 800), ("vga", 640, 480)],
        "image_id string, w int, h int")
    got = {r.image_id: (r.bucket_w, r.bucket_h)
           for r in aspect_bucket(df).collect()}
    assert got["sq"] == (1024, 1024)
    assert got["tall"] == (704, 1408)
    # hand-check: nearest log-aspect entry for every row
    for r in [("wide", 1300, 800), ("vga", 640, 480)]:
        la = math.log(r[1] / r[2])
        best = min(DEFAULT_ASPECT_LADDER,
                   key=lambda b: abs(la - math.log(b[0] / b[1])))
        assert got[r[0]] == best
    # pure projection: no exchange
    p = aspect_bucket(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_resize_to_bucket(spark):
    """Bucketed resize materialization: every surviving image decodes to
    exactly its bucket's dims (stackable into one tensor batch); null
    payload rows yield a null without failing the Arrow batch; the pass
    is map-side only."""
    import numpy as np
    from coherencebot_spark.datapipe.image_corpus import aspect_bucket
    from coherencebot_spark.datapipe.multimodal import resize_to_bucket
    from coherencebot_spark.synth import images as simg

    rows = [_img_row(60, w=100, h=100), _img_row(61, w=70, h=140),
            ("img0062", None, 64, 64, "png", "null payload", 0)]
    df = aspect_bucket(spark.createDataFrame(rows, SCHEMA),
                       ladder=((32, 32), (24, 48)), keep_all=True)
    out = {r.image_id: r for r in resize_to_bucket(df).collect()}
    assert "bytes" not in resize_to_bucket(df).columns
    for iid, bw, bh in (("img0060", 32, 32), ("img0061", 24, 48)):
        assert (out[iid].bucket_w, out[iid].bucket_h) == (bw, bh)
        px = simg.decode(bytes(out[iid].resized_png), "png")
        assert px.shape == (bh, bw, 3)
    assert out["img0062"].resized_png is None

    p = resize_to_bucket(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_caption_alignment_gate(spark):
    from coherencebot_spark.datapipe.image_corpus import caption_alignment

    rows = [
        ("perfect", [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]),   # cosine 1.0
        ("ortho",   [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),   # cosine 0.0
        ("anti",    [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),  # cosine -1.0
        ("dead",    [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]),   # zero norm -> 0.0
        ("partial", [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),   # cosine ~0.7071
    ]
    df = spark.createDataFrame(
        rows, "image_id string, img_emb array<double>, cap_emb array<double>")

    audit = {r.image_id: r.alignment
             for r in caption_alignment(df, min_score=None).collect()}
    assert audit["perfect"] == 1.0
    assert audit["ortho"] == 0.0
    assert audit["anti"] == -1.0
    assert audit["dead"] == 0.0          # no NaN from the zero norm
    assert audit["partial"] == 0.7071    # rounded to 4 decimals

    kept = {r.image_id for r in caption_alignment(df, min_score=0.2).collect()}
    assert kept == {"perfect", "partial"}

    # threshold compares the ROUNDED score: 0.7071 >= 0.7071 keeps partial
    kept = {r.image_id
            for r in caption_alignment(df, min_score=0.7071).collect()}
    assert kept == {"perfect", "partial"}

    # pure projection + filter: no exchange, no Python stage
    p = (caption_alignment(df, min_score=0.2)
         ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in p, p
    assert "Python" not in p, p


def test_alignment_stage_in_pipeline(spark):
    # wellformed survivors carrying paired embeddings: the misaligned
    # pair is dropped by the alignment stage before any dedup shuffle
    rows = [
        _img_row(70) + ([1.0, 0.0], [1.0, 0.0]),
        _img_row(71) + ([1.0, 0.0], [0.9, 0.1]),
        _img_row(72) + ([1.0, 0.0], [0.0, 1.0]),   # misaligned
    ]
    df = spark.createDataFrame(
        rows, SCHEMA + ", img_emb array<double>, cap_emb array<double>")
    out, audit = build_image_corpus(
        df, ImageCorpusConfig(alignment_min=0.5, languages=()))
    ids = {r.image_id for r in out.select("image_id").collect()}
    assert ids == {"img0070", "img0071"}
    assert audit["alignment"] == 2
    assert "alignment" not in out.columns   # stage drops its score column


def test_junk_image_stats_and_gate(spark):
    """Decoded-pixel junk gate: solid / near-solid placeholders drop,
    natural synthetic content clears every floor, null payloads fail."""
    import numpy as np
    from coherencebot_spark.datapipe.image_corpus import junk_image_gate
    from coherencebot_spark.datapipe.multimodal import (
        with_image_quality_stats)

    solid = np.full((64, 64, 3), 128, dtype=np.uint8)
    spacer = np.full((64, 64, 3), 200, dtype=np.uint8)
    spacer[:2, :, :] = 10                     # 2/64 rows a second tone
    rows = [
        _img_row(80), _img_row(81, fmt="bmp"),
        _img_row(82, px=solid, caption="solid grey placeholder"),
        _img_row(83, px=spacer, caption="two tone spacer banner"),
        ("img0084", None, 64, 64, "png", "null payload", 0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)

    st = {r.image_id: r for r in with_image_quality_stats(df).collect()}
    assert st["img0082"].px_std == 0.0
    assert st["img0082"].px_entropy == 0.0
    assert st["img0082"].solid_frac == 1.0
    assert st["img0082"].px_sharpness == 0.0
    assert st["img0083"].solid_frac == pytest.approx(62 / 64, abs=1e-9)
    assert st["img0083"].px_entropy < 0.5
    for healthy in ("img0080", "img0081"):
        assert st[healthy].px_entropy > 3.0
        assert st[healthy].solid_frac < 0.2
        assert st[healthy].px_std > 10.0
    assert st["img0084"].px_entropy is None

    kept = {r.image_id for r in
            junk_image_gate(df).select("image_id").collect()}
    assert kept == {"img0080", "img0081"}

    # audit mode appends the verdict instead of filtering
    audit = {r.image_id: r.keep for r in
             junk_image_gate(df, keep_col="keep").collect()}
    assert audit == {"img0080": True, "img0081": True, "img0082": False,
                     "img0083": False, "img0084": False}

    # map-side only: one Arrow stage over the scan, no exchange
    p = junk_image_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_junk_gate_sharpness_floor(spark):
    """Laplacian-variance blur floor: a linear luma ramp (the blur
    limit — zero second derivative) fails a positive sharpness floor
    even though its tonal spread clears the entropy/std floors; noisy
    natural content passes.  Off by default: the ramp survives the
    stock gate."""
    import numpy as np
    from coherencebot_spark.datapipe.image_corpus import (
        ImageCorpusConfig, junk_image_gate)
    from coherencebot_spark.datapipe.multimodal import (
        with_image_quality_stats)

    ramp = np.repeat(np.arange(64, dtype=np.uint8) * 4,
                     64 * 3).reshape(64, 64, 3)
    rows = [_img_row(85), _img_row(86, px=ramp, caption="smooth ramp")]
    df = spark.createDataFrame(rows, SCHEMA)

    st = {r.image_id: r for r in with_image_quality_stats(df).collect()}
    assert st["img0086"].px_sharpness < 4.0      # quantization residue only
    assert st["img0086"].px_std > 10.0           # ...yet tonally wide
    assert st["img0085"].px_sharpness > 100.0    # synthetic detail

    stock = {r.image_id for r in junk_image_gate(df).collect()}
    assert stock == {"img0085", "img0086"}
    cfg = ImageCorpusConfig(junk_min_sharpness=10.0)
    strict = {r.image_id for r in junk_image_gate(df, cfg).collect()}
    assert strict == {"img0085"}


def test_junk_gate_stage_in_pipeline(spark):
    import numpy as np

    solid = np.full((64, 64, 3), 55, dtype=np.uint8)
    rows = [_img_row(90), _img_row(91),
            _img_row(92, px=solid, caption="a blank placeholder image")]
    df = spark.createDataFrame(rows, SCHEMA)
    out, audit = build_image_corpus(
        df, ImageCorpusConfig(junk_gate=True, shard=False))
    ids = {r.image_id for r in out.select("image_id").collect()}
    assert ids == {"img0090", "img0091"}
    assert audit["junk_gate"] == 2
    # stat columns are internal to the gate
    assert not {"px_std", "px_entropy", "solid_frac"} & set(out.columns)


def test_retrieval_recall_at_k(spark):
    """Controlled pool: one-hot image embeddings, three true captions
    plus one whose caption points at image 0's axis — its own caption
    ranks LAST among its all-zero cosines (tie → asc id), so it misses
    k=2 while the rest hit at rank 1."""
    from coherencebot_spark.datapipe.image_corpus import (
        retrieval_hits_at_k, retrieval_recall_at_k)

    def onehot(i):
        v = [0.0] * 4
        v[i] = 1.0
        return v

    rows = [(i, onehot(i), onehot(0) if i == 3 else onehot(i))
            for i in range(4)]
    pairs = spark.createDataFrame(
        rows, "image_id long, img_emb array<double>, cap_emb array<double>")

    hits = {r.image_id: (r.pair_rank, r.hit)
            for r in retrieval_hits_at_k(pairs, k=2).collect()}
    assert hits[1] == (1, True) and hits[2] == (1, True)
    # image 0: its own caption AND image 3's caption are both e0 — the
    # cosine ties at 1.0 and asc-id tie-break keeps cap 0 at rank 1
    assert hits[0] == (1, True)
    # image 3: every caption is orthogonal to e3; own cap ranks 4th
    assert hits[3] == (None, False)

    rec = retrieval_recall_at_k(pairs, k=2).collect()[0]
    assert (rec.k, rec.n_pairs, rec.n_hits, rec.recall) == (2, 4, 3, 0.75)

    # LSH method routes through cosine_topk_lsh, then re-ranks every
    # claimed hit EXACTLY against the full pool — so it stays a subset
    # of the brute hits by construction AND each claimed hit carries
    # the exhaustive rank, not the candidate-subset rank
    lsh = {r.image_id: (r.pair_rank, r.hit) for r in retrieval_hits_at_k(
        pairs, k=2, method="lsh", dim=4, n_planes=2, n_tables=2).collect()}
    assert set(lsh) == set(hits)
    for i, (rank, h) in lsh.items():
        if h:
            assert hits[i] == (rank, True)


def test_vision_token_batches_semantics(spark):
    """NaViT packing: deterministic order, per-group running offsets,
    rows never split (a batch overflows by < one image), require_fit
    drops over-budget singletons."""
    from coherencebot_spark.datapipe.image_corpus import (
        vision_token_batches, vision_tokens)

    rows = [(f"i{k:03d}", 14 * ((k * 7) % 9 + 1), 14 * ((k * 5) % 11 + 1),
             k % 3) for k in range(60)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int, g int")

    out = vision_token_batches(df, token_budget=50, patch=14,
                               group_col="g").collect()
    got = {r.image_id: r for r in out}
    # python reference: per-group cumsum in id order
    for g in range(3):
        start = 0
        for iid, w, h, gg in sorted(rows):
            if gg != g:
                continue
            n = -(-w // 14) * -(-h // 14)
            r = got[iid]
            assert (r.n_tokens, r.batch_id, r.batch_offset) == \
                (n, start // 50, start % 50), iid
            start += n
    # rows never split: every image is in exactly one batch, and each
    # batch's offset interval is contiguous from 0
    for g in range(3):
        by_batch = {}
        for r in out:
            if r.g == g:
                by_batch.setdefault(r.batch_id, []).append(r)
        for b, members in by_batch.items():
            tot = sum(m.n_tokens for m in members)
            lo = min(m.batch_offset for m in members)
            assert lo < 50                       # starts inside the budget
            assert tot < 50 + max(m.n_tokens for m in members)

    # ungrouped path + require_fit: an 80-token image exceeds budget 50
    big = spark.createDataFrame(
        [("a", 14, 14, 0), ("huge", 14 * 10, 14 * 8, 0), ("b", 14, 14, 0)],
        "image_id string, w int, h int, g int")
    fit = vision_token_batches(big, token_budget=50, patch=14,
                               require_fit=True)
    assert {r.image_id for r in fit.collect()} == {"a", "b"}

    # vision_tokens column matches the CLIP-patch arithmetic
    v = df.select("image_id", vision_tokens(patch=14).alias("t")).collect()
    for r in v:
        iid = r.image_id
        k = int(iid[1:])
        assert r.t == ((k * 7) % 9 + 1) * ((k * 5) % 11 + 1)


def test_grouped_offsets_never_single_task_per_group(spark):
    """The scale property: the per-group cumsum partitions by
    (spark_partition_id, group) — a group spanning many range
    partitions is summed in parallel, with only the P×G totals on the
    driver.  Verified by matching a single-group run against the
    ungrouped two-level cumsum at parallelism 8."""
    from coherencebot_spark.datapipe.packing import (
        _global_offsets, _grouped_offsets)

    rows = [(f"d{k:04d}", 0, (k * 13) % 97 + 1) for k in range(500)]
    df = spark.createDataFrame(rows, "id string, g int, n long")
    a = {r.id: r._start
         for r in _grouped_offsets(df, "g", "id", "n", 8).collect()}
    b = {r.id: r._start
         for r in _global_offsets(df, "id", "n", 8).collect()}
    assert a == b


def test_eval_phash_decontaminate(spark):
    """Image-side eval decontamination: exact recall at the hamming
    radius, broadcast-only plan (the training corpus never shuffles)."""
    from coherencebot_spark.datapipe.image_corpus import (
        eval_phash_decontaminate)

    base = [(f"t{k:03d}", (0x5A5A5A5A5A5A5A5 << 1 >> 1) ^ (k * 0x9E3779B9))
            for k in range(40)]
    train = spark.createDataFrame(base, "image_id string, phash long")
    # eval: t007's hash 2 bits off (hit), t013's 5 bits off (miss),
    # plus an unrelated hash
    ev = spark.createDataFrame(
        [(base[7][1] ^ 0b101,),
         (base[13][1] ^ 0b10101000001,),
         (0x123456789,)], "phash long")

    out = eval_phash_decontaminate(train, ev, max_hamming=3,
                                   n_chunks=6, n_bits=60)
    kept = {r.image_id for r in out.collect()}
    assert "t007" not in kept
    assert "t013" in kept and len(kept) == 39

    # audit mode
    audit = {r.image_id: r.keep
             for r in eval_phash_decontaminate(
                 train, ev, max_hamming=3, n_chunks=6, n_bits=60,
                 keep_col="keep").collect()}
    assert audit["t007"] is False and audit["t013"] is True

    # plan: candidates and the anti-join are broadcast joins; the only
    # shuffles are the distinct() over the eval phashes and over the
    # HIT ids — both single-column narrow frames, never corpus rows
    p = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in p, p
    assert "LeftAnti, BuildRight" in p, p
    for line in p.splitlines():
        if "Exchange hashpartitioning" in line:
            keys = line.split("hashpartitioning(")[1].rsplit(",", 1)[0]
            assert keys.count("#") == 1, line


def test_vision_token_batches_with_caption_tokens(spark):
    """VLM packing: each example budgets patch tokens PLUS its caption's
    text tokens."""
    from coherencebot_spark.datapipe.image_corpus import (
        vision_token_batches)

    df = spark.createDataFrame(
        [("a", 14, 14, 10), ("b", 14, 14, 30), ("c", 14, 14, 0),
         ("d", 14, 28, None)],
        "image_id string, w int, h int, cap_toks int")
    out = {r.image_id: r for r in
           vision_token_batches(df, token_budget=25, patch=14,
                                extra_tokens="cap_toks").collect()}
    # a: 1+10=11, b: 1+30=31, c: 1+0=1, d: 2+null→2; id order a,b,c,d
    assert {k: v.n_tokens for k, v in out.items()} == \
        {"a": 11, "b": 31, "c": 1, "d": 2}
    starts = {"a": 0, "b": 11, "c": 42, "d": 43}
    assert {k: (v.batch_id, v.batch_offset) for k, v in out.items()} == \
        {k: (s // 25, s % 25) for k, s in starts.items()}
