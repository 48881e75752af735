"""Export sinks (SURVEY.md §2 S9-S11).

The reference's nine pluggable index writers (Solr/Elastic/Kafka/RabbitMQ/
CSV/S3/CloudSearch/dummy) and segment dumpers collapse to `df.write`
one-liners; the indexer document shape (the J5 three-way join of crawldb ⟗
linkdb ⟗ content) is built here so any sink can consume it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import Db


def build_index_documents(frontier: DataFrame, content: DataFrame,
                          linkdb: DataFrame | None = None) -> DataFrame:
    """J5 (IndexerMapReduce.java:244-): join frontier ⟗ content ⟗ linkdb,
    drop gone/duplicate rows (the delete logic emits deletions instead —
    exposed via the `_delete` flag column)."""
    doc = frontier.join(content, "url", "left")
    if linkdb is not None:
        anchors = linkdb.select(
            "url",
            F.transform("inlinks", lambda i: i["anchor"]).alias("anchors"),
        )
        doc = doc.join(anchors, "url", "left")
    return doc.withColumn(
        "_delete",
        F.col("status").isin(int(Db.GONE), int(Db.DUPLICATE), int(Db.ORPHAN),
                             int(Db.WITHDRAWN)),
    )


def cleaning_job(frontier: DataFrame,
                 include_duplicates: bool = True) -> DataFrame:
    """``bin/nutch clean`` (indexer/CleaningJob.java:63-76,120-142): scan
    the whole crawldb for DB_GONE (404) — and DB_DUPLICATE unless
    disabled — and emit one delete action per url for the index sinks.

    Returns ``(url, _delete=true)`` rows, the same ``_delete`` contract
    :func:`write_elastic_bulk` / :func:`write_solr_xml` already honor,
    so ``write_solr_xml(cleaning_job(frontier), path)`` is the whole
    job.  Scale shape: a single pushed-down status filter over the
    frontier scan, zero shuffles (the reference funnels every url
    through ONE reducer keyed by a constant byte — the single worst
    bottleneck a 10^10-row MapReduce job can have; the rewrite keeps
    deletes partition-parallel end-to-end)."""
    statuses = [int(Db.GONE)] + ([int(Db.DUPLICATE)]
                                 if include_duplicates else [])
    return frontier.filter(F.col("status").isin(statuses)) \
        .select("url", F.lit(True).alias("_delete"))


def build_segment_index_documents(frontier: DataFrame, content: DataFrame,
                                  seg: DataFrame,
                                  linkdb: DataFrame | None = None,
                                  broadcast_seg: bool = False) -> DataFrame:
    """Segment-restricted J5 join (the ``--index`` step's doc frame) with
    the join order that survives a 10^10-row frontier: the segment
    restriction (``seg`` = this cycle's fetch-log urls, fetchlist-sized)
    lands as an INNER join against the frontier FIRST — with
    ``broadcast_seg`` a map-side BroadcastHashJoin, so the frontier never
    shuffles — and linkdb is pruned to segment urls with a (broadcast)
    semi-join BEFORE its anchor left-join, so the linkdb side never
    shuffles its full 10^9-row table either.  All remaining joins then run
    on segment-sized frames.

    Left joining content/linkdb onto the raw frontier and inner-joining
    ``seg`` afterwards computes the same rows, but Catalyst cannot reorder
    an inner join above left-outer joins, so that plan left-joins the
    entire frontier each cycle — the shape this helper exists to avoid
    (asserted in tests/test_cycle.py::test_segment_index_docs_plan).
    Extra ``seg`` columns (e.g. the segment's fetch instant) ride along.
    """
    b = F.broadcast if broadcast_seg else (lambda d: d)
    fr = frontier.join(b(seg), "url")
    if linkdb is not None:
        linkdb = linkdb.join(b(seg.select("url")), "url", "leftsemi")
    return build_index_documents(fr, content, linkdb)


def write_csv(df: DataFrame, path: str) -> None:
    """indexer-csv analogue (binary columns hex-encoded)."""
    cols = [
        F.hex(F.col(f.name)).alias(f.name) if f.dataType.simpleString() == "binary"
        else F.col(f.name).cast("string").alias(f.name)
        if f.dataType.simpleString().startswith(("map", "array", "struct"))
        else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(cols).write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """readdb -dump json analogue."""
    df.write.mode("overwrite").json(path)


def write_dummy(df: DataFrame, path: str, id_col: str = "url",
                delete: bool = False) -> None:
    """indexer-dummy (``DummyIndexWriter.java:90-116``): debug sink —
    one ``add\\t<id>`` line per doc, ``delete\\t<key>`` lines when
    ``delete`` (the ``_delete`` flag column, same contract as the
    bulk/solr writers).  The reference's single local file becomes one
    text part per partition (lines are self-delimiting)."""
    is_del = (F.col("_delete") if "_delete" in df.columns
              else F.lit(False))
    action = F.when(is_del, "delete").otherwise("add")
    lines = df.select(F.concat_ws("\t", action, F.col(id_col))
                      .alias("value"))
    if not delete:
        lines = df.filter(~is_del).select(
            F.concat_ws("\t", F.lit("add"), F.col(id_col)).alias("value"))
    lines.write.mode("overwrite").text(path)


def write_kafka(df: DataFrame, bootstrap: str, topic: str) -> None:
    """indexer-kafka analogue.  Requires the Kafka connector on the
    classpath (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13``);
    absent (as in this sandbox) it raises a clear, actionable error
    instead of Spark's generic ClassNotFound chain."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    try:
        (
            payload.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        )
    except Exception as e:  # AnalysisException: Failed to find data source
        if "kafka" in str(e).lower() and "find" in str(e).lower():
            raise RuntimeError(
                "Kafka sink needs the connector jar: submit with --packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "(not shipped in this environment)"
            ) from e
        raise


def dump_segment_warc_like(fetch_log: DataFrame, content: DataFrame,
                           path: str) -> None:
    """CommonCrawlDataDumper analogue, JSON flavor: one JSON record per
    fetched doc with response metadata + payload (hex)."""
    rec = (
        fetch_log.join(content, "url", "inner")
        .select(
            "url", "host", "status", "fetch_time", "fmt", "w", "h",
            "caption", F.hex("bytes").alias("payload_hex"),
        )
    )
    rec.write.mode("overwrite").json(path)


def write_elastic_bulk(df: DataFrame, path: str, index: str,
                       id_col: str = "url") -> None:
    """indexer-elastic analogue without the network: the Elasticsearch
    ``_bulk`` NDJSON format (action line + source line per doc; rows
    flagged ``_delete`` become delete actions), written as text parts —
    pipe any part file straight to ``POST /_bulk``.

    Binary columns are hex-encoded; the doc id is ``id_col``.
    """
    has_delete = "_delete" in df.columns
    doc_cols = [
        F.hex(F.col(f.name)).alias(f.name)
        if f.dataType.simpleString() == "binary" else F.col(f.name)
        for f in df.schema.fields if f.name != "_delete"
    ]
    delete_flag = (F.coalesce(F.col("_delete"), F.lit(False)) if has_delete
                   else F.lit(False))
    # the _id rides inside a to_json struct so escaping is correct even
    # for ids with quotes/backslashes
    id_json = F.regexp_extract(
        F.to_json(F.struct(F.col(id_col).alias("i"))), r'^\{"i":(.*)\}$', 1)
    action = F.when(
        delete_flag,
        F.concat(F.lit('{"delete": {"_index": "' + index + '", "_id": '),
                 id_json, F.lit("}}")),
    ).otherwise(
        F.concat(F.lit('{"index": {"_index": "' + index + '", "_id": '),
                 id_json, F.lit("}}")),
    )
    line = F.when(delete_flag, action).otherwise(
        F.concat_ws("\n", action, F.to_json(F.struct(*doc_cols)))
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_elastic_bulk(path: str) -> list[tuple[str, dict | None]]:
    """Parse bulk files back into (action, source) pairs (round-trip
    check): action ∈ {index, delete}; source is None for deletes."""
    import glob
    import json as _json

    out = []
    for fn in sorted(glob.glob(path + "/part-*")):
        with open(fn) as f:
            lines = [l for l in f.read().splitlines() if l]
        i = 0
        while i < len(lines):
            act = _json.loads(lines[i])
            kind = next(iter(act))
            if kind == "index":
                out.append(("index", _json.loads(lines[i + 1])))
                i += 2
            else:
                out.append((kind, None))
                i += 1
    return out


# ---------------------------------------------------------------------------
# real WARC export (S10; ISO 28500 / WARC 1.0 record layout)
# ---------------------------------------------------------------------------

_MIME = {"png": "image/png", "jpeg": "image/jpeg", "jpg": "image/jpeg",
         "bmp": "image/bmp"}


def _warc_date(ms: int) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ")


def _warc_uuid(seed: str) -> str:
    """Deterministic urn:uuid (md5-derived — no wall clock, no randomness)."""
    import hashlib

    h = hashlib.md5(seed.encode()).hexdigest()
    return f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _warc_record(rtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"]
    for k, v in headers.items():
        head.append(f"{k}: {v}\r\n")
    head.append(f"Content-Length: {len(payload)}\r\n\r\n")
    return "".join(head).encode("utf-8") + payload + b"\r\n\r\n"


def dump_segment_warc(fetch_log: DataFrame, content: DataFrame,
                      path: str) -> None:
    """Real WARC 1.0 export (CommonCrawlDataDumper.java's WARC mode): one
    ``resource`` record per fetched image plus a concurrent ``metadata``
    record carrying the caption as warc-fields.  Executors write
    ``part-NNNNN.warc`` files directly (one per partition, records are
    self-delimiting), each starting with a ``warcinfo`` record."""
    import os

    os.makedirs(path, exist_ok=True)
    # WARC-IP-Address from the stored ``_ip_`` (WARCExporter.java:185-190;
    # present only when the crawl ran with store.ip.address=true)
    ip = (fetch_log["metadata"].getItem("_ip_")
          if "metadata" in fetch_log.columns
          else F.lit(None).cast("string"))
    rec = fetch_log.join(content, "url", "inner").select(
        "url", "fetch_time", "fmt", "caption", ip.alias("server_ip"),
        F.col("bytes").alias("payload")
    )

    def write_part(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = None
        try:
            for row in rows:
                if out is None:
                    out = open(os.path.join(path, f"part-{pid:05d}.warc"), "wb")
                    out.write(_warc_record(
                        "warcinfo",
                        {"WARC-Record-ID": f"<{_warc_uuid(f'warcinfo-{pid}')}>",
                         "WARC-Date": _warc_date(int(row["fetch_time"])),
                         "Content-Type": "application/warc-fields"},
                        b"software: coherencebot-spark\r\nformat: WARC File Format 1.0\r\n",
                    ))
                rid = _warc_uuid(f"{row['url']}@{row['fetch_time']}")
                date = _warc_date(int(row["fetch_time"]))
                payload = bytes(row["payload"] or b"")
                headers = {"WARC-Record-ID": f"<{rid}>",
                           "WARC-Date": date,
                           "WARC-Target-URI": row["url"]}
                if row["server_ip"]:
                    headers["WARC-IP-Address"] = row["server_ip"]
                headers["Content-Type"] = _MIME.get(
                    row["fmt"], "application/octet-stream")
                out.write(_warc_record("resource", headers, payload))
                caption = (row["caption"] or "").replace("\r", " ").replace("\n", " ")
                out.write(_warc_record(
                    "metadata",
                    {"WARC-Record-ID": f"<{_warc_uuid(f'meta-{rid}')}>",
                     "WARC-Concurrent-To": f"<{rid}>",
                     "WARC-Date": date,
                     "WARC-Target-URI": row["url"],
                     "Content-Type": "application/warc-fields"},
                    f"caption: {caption}\r\n".encode("utf-8"),
                ))
        finally:
            if out is not None:
                out.close()

    rec.foreachPartition(write_part)


def read_warc_records(path: str) -> list[dict]:
    """Parse WARC files written by :func:`dump_segment_warc` (round-trip
    check + a usable reader for any spec-conforming WARC): returns dicts
    with ``type``, header fields, and ``payload`` bytes."""
    import glob
    import os

    records = []
    for fn in sorted(glob.glob(os.path.join(path, "*.warc"))):
        with open(fn, "rb") as f:
            data = f.read()
        pos = 0
        while pos < len(data):
            head_end = data.index(b"\r\n\r\n", pos)
            head_lines = data[pos:head_end].decode("utf-8").split("\r\n")
            assert head_lines[0] == "WARC/1.0", head_lines[0]
            hdr = dict(l.split(": ", 1) for l in head_lines[1:])
            length = int(hdr["Content-Length"])
            body_start = head_end + 4
            payload = data[body_start:body_start + length]
            assert data[body_start + length:body_start + length + 4] == b"\r\n\r\n"
            records.append({"type": hdr.pop("WARC-Type"),
                            "payload": payload, **hdr})
            pos = body_start + length + 4
    return records


# ---------------------------------------------------------------------------
# indexer-solr analogue (S9): Solr XML update commands, server-free
# ---------------------------------------------------------------------------


def write_solr_xml(df: DataFrame, path: str, id_col: str = "url") -> None:
    """indexer-solr analogue without the network (ref
    ``src/plugin/indexer-solr``, the reference's production ``--index``
    sink): the classic Solr XML update format — ``<update>`` root with
    ``<add><doc><field name=..>..</field></doc></add>`` per document and
    ``<delete><id>..</id></delete>`` for rows flagged ``_delete`` (the J5
    document builder's deletion contract, IndexerMapReduce delete logic).
    One self-contained file per partition; POST any part verbatim to
    ``/solr/<core>/update``.  Binary columns are hex-encoded; null fields
    are omitted like SolrInputDocument skips unset fields."""
    import os
    from xml.sax.saxutils import escape, quoteattr

    os.makedirs(path, exist_ok=True)
    has_delete = "_delete" in df.columns
    doc_cols = [
        F.hex(F.col(f.name)).alias(f.name)
        if f.dataType.simpleString() == "binary"
        else F.col(f.name).cast("string").alias(f.name)
        if f.dataType.simpleString().startswith(("map", "array", "struct"))
        else F.col(f.name)
        for f in df.schema.fields if f.name != "_delete"
    ]
    flag = (F.coalesce(F.col("_delete"), F.lit(False)) if has_delete
            else F.lit(False))
    rows = df.select(F.struct(*doc_cols).alias("d"), flag.alias("_del"),
                     F.col(id_col).cast("string").alias("_id"))

    def write_part(it) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = None
        try:
            for row in it:
                if out is None:
                    out = open(os.path.join(path, f"part-{pid:05d}.xml"), "w",
                               encoding="utf-8")
                    out.write("<update>\n")
                if row["_del"]:
                    out.write(f"<delete><id>{escape(row['_id'])}</id>"
                              "</delete>\n")
                    continue
                out.write("<add><doc>")
                for k, v in row["d"].asDict().items():
                    if v is None:
                        continue
                    # quoteattr: attribute position needs quote escaping
                    # (a column named with backtick-quotes can carry ")
                    out.write(f"<field name={quoteattr(k)}>"
                              f"{escape(str(v))}</field>")
                out.write("</doc></add>\n")
            if out is not None:
                out.write("</update>\n")
        finally:
            if out is not None:
                out.close()

    rows.foreachPartition(write_part)


def read_solr_xml(path: str) -> tuple[list[dict], list[str]]:
    """Parse update files written by :func:`write_solr_xml` (round-trip
    check): returns (added docs as dicts, deleted ids)."""
    import glob
    import os
    import xml.etree.ElementTree as ET

    adds, deletes = [], []
    for fn in sorted(glob.glob(os.path.join(path, "*.xml"))):
        root = ET.parse(fn).getroot()
        assert root.tag == "update"
        for el in root:
            if el.tag == "add":
                for doc in el.findall("doc"):
                    adds.append({f.get("name"): f.text
                                 for f in doc.findall("field")})
            elif el.tag == "delete":
                deletes.extend(i.text for i in el.findall("id"))
    return adds, deletes
