"""Publisher extension point — the fetcher's pub/sub event stream.

Reference: ``publisher/NutchPublisher.java:24-45`` (the extension
interface), ``fetcher/FetcherThreadEvent.java:35-130`` (event POJO:
type START/END/REPORT, url, timestamp, free-form eventData map,
``addOutlinksToEventData``), ``fetcher/FetcherThread.java:296-299,
370-373,786-796`` (where the three event kinds fire when
``fetcher.publisher`` is on).

Event semantics:

* **START** — emitted as a fetch attempt begins: just (url, timestamp).
* **END** — emitted after the protocol answered: eventData carries the
  protocol status name (:372).
* **REPORT** — emitted per successfully parsed document: eventData
  carries the filtered outlink list plus title / content-type / score /
  fetchTime / content-language (:787-795).

Spark shape: the reference publishes one POJO at a time from each
fetcher thread; on Spark the natural equivalent is an event FRAME — a
union of three narrow projections over the fetch log (and parse rows
for REPORT), each a Project over an existing scan, no shuffle.  The
timestamp is the politeness virtual clock (``fetch_time``) — the
reference stamps wall-clock at event creation, which IS the fetch time
modulo queue latency.  A publisher implementation is any sink over this
frame (``sinks.write_json`` for files, ``foreachBatch`` on a stream);
the rabbitmq transport itself stays gated like indexer-kafka/rabbit —
no connector jar in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import STATUS_NAMES

__all__ = ["fetcher_events"]


def _status_name_expr(col):
    expr = F.lit(None).cast("string")
    for code, name in STATUS_NAMES.items():
        expr = F.when(col == int(code), F.lit(name)).otherwise(expr)
    return expr


def fetcher_events(fetch_log: DataFrame,
                   parse_rows: DataFrame | None = None) -> DataFrame:
    """``(event_type, url, timestamp, event_data)`` rows — START and END
    per fetch-log entry, REPORT per parse row when ``parse_rows``
    (columns ``url, fetch_time, title, content_type, score, lang,
    outlinks``; missing columns are skipped like absent metadata) is
    given."""
    empty = F.create_map().cast("map<string,string>")
    start = fetch_log.select(
        F.lit("START").alias("event_type"), "url",
        F.col("fetch_time").cast("long").alias("timestamp"),
        empty.alias("event_data"))
    end = fetch_log.select(
        F.lit("END").alias("event_type"), "url",
        F.col("fetch_time").cast("long").alias("timestamp"),
        F.map_from_arrays(
            F.array(F.lit("status")),
            F.array(_status_name_expr(F.col("status"))))
        .alias("event_data"))
    events = start.unionByName(end)
    if parse_rows is not None:
        pairs = []
        for key, col, cast in (
                ("title", "title", "string"),
                ("contentType", "content_type", "string"),
                ("score", "score", "string"),
                ("fetchTime", "fetch_time", "string"),
                ("contentLanguage", "lang", "string")):
            if col in parse_rows.columns:
                pairs.append((F.lit(key), F.col(col).cast(cast)))
        data = F.map_filter(
            F.map_from_arrays(F.array(*[k for k, _ in pairs]),
                              F.array(*[v for _, v in pairs])),
            lambda _, v: v.isNotNull())
        if "outlinks" in parse_rows.columns:
            # addOutlinksToEventData flattens to [{url, anchor}] — the
            # map value is its JSON form (the POJO serializes the same
            # way through the rabbitmq JSON writer)
            data = F.map_concat(data, F.map_from_arrays(
                F.array(F.lit("outlinks")),
                F.array(F.to_json("outlinks"))))
        report = parse_rows.select(
            F.lit("REPORT").alias("event_type"), "url",
            F.col("fetch_time").cast("long").alias("timestamp"),
            data.alias("event_data"))
        events = events.unionByName(report)
    return events
