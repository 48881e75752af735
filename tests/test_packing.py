"""Sequence-packing tests — manifest offsets against a reference
concatenation, boundary-straddling docs, chunk materialization
round-trip, multi-partition offset correctness."""

import pyspark.sql.functions as F
import pytest

from coherencebot_spark.datapipe.packing import chunk_manifest, pack_chunks


def _docs(spark, texts, parts=1):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    return df.repartition(parts)


def test_manifest_matches_reference_concat(spark):
    texts = ["a b c", "d e", "f g h i j", "", "k"]
    docs = _docs(spark, texts)
    man = chunk_manifest(docs, 4).collect()
    # reference: concat tokens in doc_id order, slice into 4-token chunks
    stream = []
    for i, t in enumerate(texts):
        stream += [(i, off) for off, _ in enumerate(t.split())]
    want = {}
    for pos, (doc, off) in enumerate(stream):
        key = (pos // 4, doc)
        if key not in want:
            want[key] = [off, pos % 4, 0]
        want[key][2] += 1
    got = {(r["chunk_id"], r["doc_id"]):
           [r["doc_offset"], r["chunk_offset"], r["len"]] for r in man}
    assert got == want
    # doc 2 straddles chunks 1 and 2
    assert got[(1, 2)][2] + got[(2, 2)][2] == 5
    # empty doc 3 is absent
    assert not any(d == 3 for _, d in got)


def test_full_chunks_exactly_sized(spark):
    docs = _docs(spark, ["w " * 10, "x " * 7, "y " * 3])
    man = chunk_manifest(docs, 5)
    sizes = {r["chunk_id"]: r["total"] for r in
             man.groupBy("chunk_id").agg(
                 F.sum("len").alias("total")).collect()}
    assert sizes == {0: 5, 1: 5, 2: 5, 3: 5}  # 20 tokens -> 4 full chunks


def test_pack_chunks_text(spark):
    docs = _docs(spark, ["a b c", "d e f g"])
    got = {r["chunk_id"]: r for r in pack_chunks(docs, 3).collect()}
    assert got[0]["text"] == "a b c"
    assert got[1]["text"] == "d e f"
    assert got[2]["text"] == "g" and got[2]["n_tokens"] == 1


def test_multi_partition_offsets(spark):
    # 40 docs of varying token counts over 8 input partitions: the
    # two-level cumsum must reproduce the single-stream order exactly
    texts = [("t" + str(i) + " ") * (i % 5 + 1) for i in range(40)]
    docs = _docs(spark, [t.strip() for t in texts], parts=8)
    man = chunk_manifest(docs, 7, parallelism=4).collect()
    stream = []
    for i, t in enumerate(texts):
        stream += [i] * (i % 5 + 1)
    want_len = {}
    for pos, doc in enumerate(stream):
        key = (pos // 7, doc)
        want_len[key] = want_len.get(key, 0) + 1
    got_len = {(r["chunk_id"], r["doc_id"]): r["len"] for r in man}
    assert got_len == want_len


def test_grouped_offsets_rejects_null_groups(spark):
    """A null group key would silently vanish in the base-offset
    equi-join — the grouped cumsum must refuse instead."""
    import pytest as _pt
    from coherencebot_spark.datapipe.packing import _grouped_offsets

    df = spark.createDataFrame(
        [("a", 0, 3), ("b", None, 4)], "id string, g int, n long")
    with _pt.raises(ValueError, match="null values in group column"):
        _grouped_offsets(df, "g", "id", "n", 4).collect()
