"""Engine table schemas (SURVEY.md §1.3 Spark mapping).

The reference's ``MapFile(Text -> Writable)`` tables become typed columnar
tables.  Timestamps stay epoch-ms **longs** for bit-exact schedule parity
with the reference (``crawl/CrawlDatum.java:142,147``); intervals are
seconds as in ``CrawlDatum.fetchInterval`` (``crawl/CrawlDatum.java:144``).
``MapWritable`` metadata becomes ``map<string,string>`` — the reference
itself stringifies metadata values when rendering
(``crawl/CrawlDatum.java:518-571``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# frontier — the CrawlDb (ref crawl/CrawlDatum.java:42-148)
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", IntegerType(), False),
        StructField("fetch_time", LongType(), False),      # epoch ms; NEXT fetch
        StructField("retries", IntegerType(), False),
        StructField("fetch_interval", LongType(), False),  # seconds
        StructField("score", FloatType(), False),
        StructField("signature", BinaryType(), True),
        StructField("modified_time", LongType(), False),   # epoch ms (0 = unknown)
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# fetchlist — Generator output (segment crawl_generate analogue)
# ---------------------------------------------------------------------------
FETCHLIST = StructType(
    list(FRONTIER.fields)
    + [
        StructField("segnum", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("sort_key", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# fetch_log — per-cycle fetch outcomes (segment crawl_fetch analogue)
# ---------------------------------------------------------------------------
FETCH_LOG = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", IntegerType(), False),        # Fetch.* code
        StructField("fetch_time", LongType(), False),       # epoch ms; actual fetch instant
        StructField("retries", IntegerType(), False),
        StructField("fetch_interval", LongType(), False),
        StructField("score", FloatType(), False),
        StructField("signature", BinaryType(), True),
        StructField("modified_time", LongType(), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
        StructField("proto_status", IntegerType(), False),
        StructField("redirect_to", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# content — fetched payload (segment `content` analogue; image+caption graft
# per BASELINE.json input_hint)
# ---------------------------------------------------------------------------
CONTENT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("image_id", StringType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

# payload universe table (what the synthetic web serves) — same shape minus url
PAYLOAD = StructType([f for f in CONTENT.fields if f.name != "url"])

# ---------------------------------------------------------------------------
# parse_out — updatedb-bound rows emitted by parse (crawl_parse analogue):
# signature rows, linked outlink rows, parse-metadata rows
# (ref parse/ParseOutputFormat.java:221-400)
# ---------------------------------------------------------------------------
PARSE_OUT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), True),
        StructField("status", IntegerType(), False),        # Msg.* code
        StructField("score", FloatType(), False),
        StructField("signature", BinaryType(), True),
        StructField("from_url", StringType(), True),        # for linked rows
        StructField("anchor", StringType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# linkdb (ref crawl/LinkDb.java, crawl/Inlinks.java)
# ---------------------------------------------------------------------------
INLINK = StructType(
    [
        StructField("from_url", StringType(), False),
        StructField("anchor", StringType(), True),
    ]
)
LINKDB = StructType(
    [
        StructField("url", StringType(), False),
        StructField("inlinks", ArrayType(INLINK), False),
    ]
)

# ---------------------------------------------------------------------------
# hostdb (ref hostdb/HostDatum.java:32-52)
# ---------------------------------------------------------------------------
HOSTDB = StructType(
    [
        StructField("host", StringType(), False),
        StructField("score", FloatType(), True),
        StructField("unfetched", LongType(), False),
        StructField("fetched", LongType(), False),
        StructField("not_modified", LongType(), False),
        StructField("redir_perm", LongType(), False),
        StructField("redir_temp", LongType(), False),
        StructField("gone", LongType(), False),
        StructField("duplicate", LongType(), False),
        StructField("dns_failures", LongType(), False),
        StructField("connection_failures", LongType(), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# seeds — injector input (ref crawl/Injector.java:61-83)
# ---------------------------------------------------------------------------
SEEDS = StructType([StructField("line", StringType(), True)])

# robots universe (synthetic politeness world; FIXTURES.md §4)
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("robots_status", IntegerType(), False),
        StructField("disallow", ArrayType(StringType()), True),
        StructField("crawl_delay_ms", LongType(), True),
    ]
)


def empty_df(spark, schema: StructType):
    """Schema-exact empty DataFrame with ZERO partitions.

    ``spark.createDataFrame([], schema)`` parallelizes the (empty) local
    list through Python into ``defaultParallelism`` slices — in a busy
    cycle those tasks each wait for a Python worker before discovering
    they have nothing to do (measured: 32 tasks × 3.6 s of occupied task
    slots inside the commit phase).  An ``emptyRDD`` has no partitions,
    so the frame contributes zero tasks and no Python round-trip.

    ``schema`` may be a ``StructType`` or a DDL string."""
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
