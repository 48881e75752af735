"""Legacy Internet-Archive ARC import (SURVEY.md §2 S11 tail; the last
``tools/`` item — VERDICT r4 "what's missing" #3).

Reference: ``tools/arc/ArcRecordReader.java:40-70`` — "Arc files are
essentially tars of gzips": each record is one gzip member, members are
concatenated into one file; the first line of a decompressed member is
the ARC header ``<url> <ip> <archive-date> <content-type> <length>`` and
the rest is the raw payload.  ``tools/arc/ArcSegmentCreator.java:289-345``
turns each record into fetch output: skip ``filedesc://`` file headers,
normalize+filter the url, emit a FETCHED datum (interval =
``db.fetch.interval.default``, score 1.0, protocol status SUCCESS) plus
the Content row.

Spark-first shape: the reference's custom InputFormat scans byte splits
for the gzip magic (with a false-positive recovery loop,
``ArcRecordReader.java:216``).  Here each ARC *file* is one task —
``binaryFile`` scan → ``mapInPandas`` — and the member boundaries come
from ``zlib.decompressobj``'s ``eof``/``unused_data`` contract instead of
magic-byte scanning, which cannot false-positive.  Parallelism is
per-file (archives ship as many ~100 MB arcs, so file-granularity is the
natural split at scale); payload bytes stay inside the task that
decompressed them.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT, CrawlConfig
from ..status import Fetch, Proto

ARC_SCHEMA = ("arc_file string, url string, ip string, archive_date string, "
              "content_type string, declared_length long, bytes binary")


def split_arc_members(buf: bytes) -> list[tuple[str, bytes]]:
    """Split a raw ARC file into (header_line, payload) per gzip member.
    Truncated/corrupt trailing members are dropped (the reference's
    reader likewise skips unreadable gzip data rather than failing the
    job)."""
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            raw = d.decompress(buf[pos:])
        except zlib.error:
            break
        if not d.eof:          # truncated trailing member
            break
        nl = raw.find(b"\n")
        header = raw[: nl if nl >= 0 else len(raw)]
        payload = raw[nl + 1:] if nl >= 0 else b""
        out.append((header.decode("utf-8", "replace"), payload))
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
        while pos < n and buf[pos:pos + 1] in (b"\n", b"\r"):
            pos += 1           # inter-record newline padding
    return out


def read_arc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ARC scan → one row per record, file headers included
    (``url`` starts with ``filedesc://`` for those, mirroring the
    reference, which surfaces and then skips them in the mapper)."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def explode(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                recs = []
                for header, payload in split_arc_members(bytes(row["content"])):
                    parts = header.split()
                    if len(parts) < 5:
                        continue   # not an ARC v1 header — skip record
                    recs.append({
                        "arc_file": row["path"],
                        "url": parts[0],
                        "ip": parts[1],
                        "archive_date": parts[2],
                        "content_type": parts[3],
                        "declared_length": int(parts[4]) if parts[4].isdigit()
                        else len(payload),
                        "bytes": payload,
                    })
                if recs:
                    yield pd.DataFrame(recs)

    return files.mapInPandas(explode, schema=ARC_SCHEMA)


def arc_to_segment(records: DataFrame, cur_time: int,
                   cfg: CrawlConfig = DEFAULT,
                   url_filter=None) -> tuple[DataFrame, DataFrame]:
    """ArcSegmentCreator.map (``ArcSegmentCreator.java:289-345``):
    translate ARC records into the engine's segment frames.

    Returns ``(fetch_log, content)``: every non-``filedesc://`` record
    becomes a FETCHED/SUCCESS fetch-log row (interval =
    ``cfg.interval_default_s``, score 1.0 — :306-308) with the archive
    metadata (ip, archive date, declared content type) in the datum
    metadata map and an md5 content signature, plus a content row
    carrying the raw payload.  ``url_filter`` (optional,
    ``DataFrame[url] -> DataFrame[url]`` on a ``url`` column frame)
    stands in for the reference's URLFilters/URLNormalizers chain —
    compose with :mod:`..functions.urls` chains as needed; rows it drops
    vanish from both outputs, like the mapper's null-url skip."""
    recs = records.filter(~F.col("url").startswith("filedesc://"))
    if url_filter is not None:
        keep = url_filter(recs.select("url").distinct())
        recs = recs.join(F.broadcast(keep.select("url")), "url", "left_semi")
    host = F.try_parse_url(F.col("url"), F.lit("HOST"))
    fetch_log = recs.select(
        "url", host.alias("host"),
        F.lit(int(Fetch.SUCCESS)).cast("int").alias("status"),
        F.lit(int(cur_time)).cast("long").alias("fetch_time"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(int(cfg.interval_default_s)).cast("long")
        .alias("fetch_interval"),
        F.lit(1.0).cast("float").alias("score"),
        F.unhex(F.md5(F.col("bytes"))).alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.map_from_arrays(
            F.array(F.lit("arc_ip"), F.lit("arc_date"),
                    F.lit("arc_content_type")),
            F.array(F.col("ip"), F.col("archive_date"),
                    F.col("content_type"))).alias("metadata"),
        F.lit(int(Proto.SUCCESS)).cast("int").alias("proto_status"),
        F.lit(None).cast("string").alias("redirect_to"),
    )
    content = recs.select(
        "url",
        F.md5(F.col("url")).alias("image_id"),
        "bytes",
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.substring_index(F.col("content_type"), "/", -1).alias("fmt"),
        F.lit(None).cast("string").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    return fetch_log, content
