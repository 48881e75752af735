"""Segment reader tools (S11 extension; ref ``segment/SegmentReader.java``).

The reference's ``readseg -list | -get | -dump`` over a segment's
crawl_fetch/content/parse data, re-expressed over the engine's per-cycle
fetch_log + content frames.  ``-dump`` writes a human-readable text part
per partition (the reference's TextOutputFormat), ``-list`` is one
aggregation row, ``-get`` a url point lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import Fetch


def segment_list(fetch_log: DataFrame) -> DataFrame:
    """One row of segment stats (SegmentReader.java ``-list``):
    (generated, fetched, errors, earliest, latest)."""
    return fetch_log.agg(
        F.count("*").alias("generated"),
        F.sum((F.col("status") == int(Fetch.SUCCESS)).cast("long")).alias("fetched"),
        F.sum((~F.col("status").isin(
            int(Fetch.SUCCESS), int(Fetch.REDIR_TEMP), int(Fetch.REDIR_PERM),
            int(Fetch.NOTMODIFIED))).cast("long")).alias("errors"),
        F.min("fetch_time").alias("earliest_fetch"),
        F.max("fetch_time").alias("latest_fetch"),
    )


def protocol_status_statistics(df: DataFrame,
                               code_col: str = "proto_status") -> DataFrame:
    """Per-protocol-status URL counts (ref
    ``util/ProtocolStatusStatistics.java:140-176``).

    The reference maps crawldb records, keying by the
    ``nutch.protocol.code`` metadata value and emitting ``UNFETCHED`` for
    records that never carried one, then count-sums in a combiner+reducer.
    Here the engine's fetch_log carries ``proto_status`` as a real column,
    so the whole job is one partial-aggregated groupBy; records with a
    NULL code (never fetched) count under ``UNFETCHED`` exactly like the
    reference's missing-metadata branch.  Output shape mirrors the
    reference reducer's ``(count, code)`` rows."""
    key = F.coalesce(F.col(code_col).cast("string"), F.lit("UNFETCHED"))
    return (
        df.groupBy(key.alias("proto_status"))
        .agg(F.count("*").alias("cnt"))
        .select("cnt", "proto_status")
    )


def segment_get(fetch_log: DataFrame, content: DataFrame | None,
                url: str) -> dict:
    """Point lookup of one URL's segment records (``-get``)."""
    out: dict = {"url": url}
    r = fetch_log.filter(F.col("url") == url).collect()
    out["crawl_fetch"] = [row.asDict() for row in r]
    if content is not None:
        c = content.filter(F.col("url") == url).collect()
        out["content"] = [row.asDict() for row in c]
    return out


def segment_dump(fetch_log: DataFrame, content: DataFrame | None,
                 path: str, recode_hex_bytes: bool = True) -> None:
    """Readable text dump (``-dump``): one ``key :: field=value`` block per
    record, written as text parts.  Payload bytes hex-encoded (the
    reference recodes content to the segment's charset)."""
    rec = fetch_log.select(
        "url",
        F.concat_ws(
            "\n",
            F.concat(F.lit("Recno:: url="), F.col("url")),
            F.concat(F.lit("CrawlDatum:: status="), F.col("status").cast("string")),
            F.concat(F.lit("fetch_time="), F.col("fetch_time").cast("string")),
            F.concat(F.lit("retries="), F.col("retries").cast("string")),
            F.concat(F.lit("score="), F.col("score").cast("string")),
        ).alias("txt"),
    )
    if content is not None:
        payload = F.hex("bytes") if recode_hex_bytes else F.col("bytes").cast("string")
        crec = content.select(
            "url",
            F.concat_ws(
                "\n",
                F.concat(F.lit("Content:: fmt="), F.col("fmt")),
                F.concat(F.lit("dims="), F.col("w").cast("string"),
                         F.lit("x"), F.col("h").cast("string")),
                F.concat(F.lit("caption="), F.coalesce(F.col("caption"), F.lit(""))),
                F.concat(F.lit("payload="), payload),
            ).alias("ctxt"),
        )
        rec = rec.join(crec, "url", "left").select(
            "url",
            F.concat_ws("\n", F.col("txt"), F.coalesce(F.col("ctxt"), F.lit(""))).alias("txt"),
        )
    rec.select("txt").write.mode("overwrite").text(path)
