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
    """readdb -dump json / indexer-dummy analogue."""
    df.write.mode("overwrite").json(path)


def write_kafka(df: DataFrame, bootstrap: str, topic: str) -> None:
    """indexer-kafka analogue: requires the Kafka connector jar on the
    cluster (not shipped in the sandbox)."""
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


def dump_segment_warc_like(fetch_log: DataFrame, content: DataFrame,
                           path: str) -> None:
    """CommonCrawlDataDumper/WARC analogue (S10): one JSON record per
    fetched doc with response metadata + payload (hex)."""
    rec = (
        fetch_log.join(content, "url", "inner")
        .select(
            "url", "host", "status", "fetch_time", "fmt", "w", "h",
            "caption", F.hex("bytes").alias("payload_hex"),
        )
    )
    rec.write.mode("overwrite").json(path)
