"""HostDb — per-host aggregates (SURVEY.md §2 A3/J8; ref
``hostdb/UpdateHostDbMapper.java``, ``hostdb/UpdateHostDbReducer.java:116-260``,
``hostdb/HostDatum.java:32-52``).

One ``groupBy(host)`` with conditional sums replaces the reducer's counter
loop; the old hostdb merges in via full-outer join (J8).  Failure counters
(dns/connection) accumulate from fetch RETRY outcomes the way the
reference's ResolverThread/counters do.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Db
from ..schemas import HOSTDB

# resolver(hosts: pd.Series) -> pd.DataFrame[host, dns_failed, cnx_failed]
# — the ResolverThread analogue (hostdb/ResolverThread.java:1-127,
# UpdateHostDb.checkAny): per-host DNS/connection probes whose failures
# increment the persistent failure counters.  No network in the sandbox,
# so the probe is injectable; None (default) skips checking entirely, the
# reference's hostdb.check.* = false configuration.
DnsResolver = Callable[[pd.Series], pd.DataFrame]


def _cnt(status: int):
    return F.sum(F.when(F.col("status") == status, 1).otherwise(0)).cast("long")


def update_hostdb(frontier: DataFrame, hostdb: DataFrame | None = None,
                  cfg: CrawlConfig = DEFAULT,
                  resolver: DnsResolver | None = None) -> DataFrame:
    """Aggregate the frontier per host; merge counters into existing hostdb.

    ``resolver`` (optional) runs once per DISTINCT host (mapInPandas over
    the aggregated per-host frame, the same shape as the fetch engine's
    robots lookup) and its failures land in this snapshot's
    dns_failures/connection_failures — which then ACCUMULATE into the old
    hostdb's running totals exactly like the reference's
    UpdateHostDbReducer counter merge."""
    # homepage detection (UpdateHostDbMapper.map:144-181): the host's root
    # url, when its row is no longer unfetched, is recorded as the
    # homepage.  (The reference additionally resolves a redirected root to
    # its target via the protocol-status repr url; the frontier does not
    # persist repr urls, so a redirected root records itself — documented
    # subset.)
    proto = F.regexp_extract("url", r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    is_root = F.col("url") == F.concat(proto, F.lit("://"),
                                       F.col("host"), F.lit("/"))
    hp = F.when(is_root & (F.col("status") != int(Db.UNFETCHED)),
                F.col("url"))

    agg = frontier.filter(F.col("host").isNotNull()).groupBy("host").agg(
        F.avg("score").cast("float").alias("score"),
        _cnt(Db.UNFETCHED).alias("unfetched"),
        _cnt(Db.FETCHED).alias("fetched"),
        _cnt(Db.NOTMODIFIED).alias("not_modified"),
        _cnt(Db.REDIR_PERM).alias("redir_perm"),
        _cnt(Db.REDIR_TEMP).alias("redir_temp"),
        _cnt(Db.GONE).alias("gone"),
        _cnt(Db.DUPLICATE).alias("duplicate"),
        F.min(hp).alias("_homepage"),
    ).withColumn("dns_failures", F.lit(0).cast("long")) \
     .withColumn("connection_failures", F.lit(0).cast("long")) \
     .withColumn(
         "metadata",
         F.when(F.col("_homepage").isNotNull(),
                F.create_map(F.lit("homepage_url"), F.col("_homepage")))
         .cast("map<string,string>"),
     ).drop("_homepage")

    if resolver is not None:
        res = resolver

        def probe(it):
            for pdf in it:
                r = res(pdf["host"])
                yield pd.DataFrame({
                    "host": r["host"],
                    "_dns_failed": r["dns_failed"].astype("int64"),
                    "_cnx_failed": r["cnx_failed"].astype("int64"),
                })

        # distinct hosts straight from the frontier: routing the probe
        # through agg's plan would re-execute the whole per-host
        # aggregation a second time on the join's build side
        checks = (
            frontier.filter(F.col("host").isNotNull())
            .select("host").distinct()
            .mapInPandas(
                probe, schema="host string, _dns_failed long, _cnx_failed long"
            )
        )
        agg = (
            agg.join(F.broadcast(checks), "host", "left")
            .withColumn(
                "dns_failures",
                (F.col("dns_failures")
                 + F.coalesce(F.col("_dns_failed"), F.lit(0))).cast("long"))
            .withColumn(
                "connection_failures",
                (F.col("connection_failures")
                 + F.coalesce(F.col("_cnx_failed"), F.lit(0))).cast("long"))
            .drop("_dns_failed", "_cnx_failed")
        )

    if hostdb is None:
        return agg.select([f.name for f in HOSTDB.fields])

    o = hostdb.select(
        "host",
        *[F.col(c).alias(f"o_{c}") for c in hostdb.columns if c != "host"],
    )
    j = agg.join(o, "host", "full_outer")
    # fresh counts win (they are recomputed snapshots); persistent failure
    # counters accumulate (UpdateHostDbReducer keeps running totals)
    out = j.select(
        "host",
        F.coalesce(F.col("score"), F.col("o_score")).alias("score"),
        *[
            F.coalesce(F.col(c), F.col(f"o_{c}"), F.lit(0)).cast("long").alias(c)
            for c in ("unfetched", "fetched", "not_modified", "redir_perm",
                      "redir_temp", "gone", "duplicate")
        ],
        (F.coalesce(F.col("dns_failures"), F.lit(0))
         + F.coalesce(F.col("o_dns_failures"), F.lit(0))).cast("long").alias("dns_failures"),
        (F.coalesce(F.col("connection_failures"), F.lit(0))
         + F.coalesce(F.col("o_connection_failures"), F.lit(0))).cast("long")
        .alias("connection_failures"),
        F.coalesce(F.col("metadata"), F.col("o_metadata")).alias("metadata"),
    )
    return out
