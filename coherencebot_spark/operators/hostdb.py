"""HostDb — per-host aggregates (SURVEY.md §2 A3/J8; ref
``hostdb/UpdateHostDbMapper.java``, ``hostdb/UpdateHostDbReducer.java:116-260``,
``hostdb/HostDatum.java:32-52``).

One ``groupBy(host)`` with conditional sums replaces the reducer's counter
loop; the old hostdb merges in via full-outer join (J8).  Failure counters
(dns/connection) accumulate from fetch RETRY outcomes the way the
reference's ResolverThread/counters do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Db
from ..schemas import HOSTDB


def _cnt(status: int):
    return F.sum(F.when(F.col("status") == status, 1).otherwise(0)).cast("long")


def update_hostdb(frontier: DataFrame, hostdb: DataFrame | None = None,
                  cfg: CrawlConfig = DEFAULT) -> DataFrame:
    """Aggregate the frontier per host; merge counters into existing hostdb."""
    agg = frontier.filter(F.col("host").isNotNull()).groupBy("host").agg(
        F.avg("score").cast("float").alias("score"),
        _cnt(Db.UNFETCHED).alias("unfetched"),
        _cnt(Db.FETCHED).alias("fetched"),
        _cnt(Db.NOTMODIFIED).alias("not_modified"),
        _cnt(Db.REDIR_PERM).alias("redir_perm"),
        _cnt(Db.REDIR_TEMP).alias("redir_temp"),
        _cnt(Db.GONE).alias("gone"),
        _cnt(Db.DUPLICATE).alias("duplicate"),
    ).withColumn("dns_failures", F.lit(0).cast("long")) \
     .withColumn("connection_failures", F.lit(0).cast("long")) \
     .withColumn("metadata", F.lit(None).cast("map<string,string>"))

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
