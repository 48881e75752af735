"""ReadDb — the analytics entry points (SURVEY.md §2 S11, A1/A2/A6/A7,
W5; ref ``crawl/CrawlDbReader.java``).

Every reader is a one-expression DataFrame query; the reference's
t-digest partial/final quantile merge (``CrawlDbReader.java:442-469``)
maps to Catalyst's own ``percentile_approx`` partial+final aggregation.
Column pruning means stats never read signatures/metadata — a structural
win over the reference's row-blob scan (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..status import STATUS_NAMES


def stats(frontier: DataFrame, sort_by_host: bool = False) -> dict[str, DataFrame]:
    """`readdb -stats` (A1/A2): global + per-status (+ per-host) counters,
    min/max/avg score-fetchInterval-fetchTime, approximate score quantiles."""
    out: dict[str, DataFrame] = {}
    out["global"] = frontier.agg(
        F.count("*").alias("urls"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.avg("score").alias("avg_score"),
        F.sum("score").alias("sum_score"),
        F.min("fetch_time").alias("min_fetch_time"),
        F.max("fetch_time").alias("max_fetch_time"),
        F.min("fetch_interval").alias("min_interval"),
        F.max("fetch_interval").alias("max_interval"),
        F.percentile_approx("score", [0.25, 0.5, 0.75, 0.95]).alias("score_quantiles"),
    )
    out["by_status"] = frontier.groupBy("status").count().orderBy("status")
    out["by_retries"] = frontier.groupBy("retries").count().orderBy("retries")
    if sort_by_host:
        out["by_status_host"] = (
            frontier.groupBy("status", "host").count().orderBy("status", "host")
        )
    return out


def status_names(df: DataFrame, col: str = "status") -> DataFrame:
    mapping = F.create_map(
        *[x for k, v in STATUS_NAMES.items() for x in (F.lit(k), F.lit(v))]
    )
    return df.withColumn(f"{col}_name", mapping.getItem(F.col(col)))


def topn(frontier: DataFrame, n: int, min_score: float | None = None) -> DataFrame:
    """`readdb -topN` (W5, CrawlDbReader.java:473-515)."""
    df = frontier
    if min_score is not None:
        df = df.filter(F.col("score") >= float(min_score))
    return df.select("url", "score").orderBy(F.desc("score"), F.asc("url")).limit(n)


def url_lookup(frontier: DataFrame, url: str,
               host_buckets: int | None = None) -> DataFrame:
    """`readdb -url` point lookup (CrawlDbReader.java:769-798).

    When the frontier is stored host-bucketed (plans/cycle writes
    ``partition_by=["bucket"]``), the bucket predicate constant-folds to a
    literal and parquet partition pruning reads exactly one bucket — the
    MapFile-binary-search analogue."""
    df = frontier.filter(F.col("url") == url)
    if host_buckets and "bucket" in frontier.columns:
        host = url.split("/")[2].lower() if "//" in url else None
        if host:
            df = df.filter(
                F.col("bucket") == F.pmod(F.xxhash64(F.lit(host)), F.lit(int(host_buckets)))
            )
    return df


def dump(frontier: DataFrame, status: int | None = None,
         regex: str | None = None, expr: str | None = None,
         min_retry: int | None = None,
         sample: float | None = None) -> DataFrame:
    """`readdb -dump` with pushed-down predicates
    (CrawlDbDumpMapper, CrawlDbReader.java:861-923).

    Parity notes: the reference's ``-regex`` uses ``Matcher.matches()``
    (:906-911) — a FULL match — so the pattern is anchored here;
    ``-sample`` (:891-893) is ``Math.random() > sample`` per row in the
    reference — non-deterministic by design; here it is a deterministic
    url-hash threshold so dumps are reproducible and engine-portable.
    The raw-column comparisons (status/retry) reach the parquet scan as
    PushedFilters (asserted in tests), so a filtered dump of a 10^10-row
    frontier is row-group-pruned I/O, not a full decode."""
    df = frontier
    if status is not None:
        df = df.filter(F.col("status") == int(status))
    if regex is not None:
        df = df.filter(F.col("url").rlike("^(?:" + regex + ")$"))
    if expr is not None:
        df = df.filter(F.expr(expr))
    if min_retry is not None:
        df = df.filter(F.col("retries") >= int(min_retry))
    if sample is not None and float(sample) < 1.0:
        thresh = int(float(sample) * (1 << 32))
        df = df.filter(
            F.pmod(F.xxhash64(F.col("url"), F.lit(0x5A)), F.lit(1 << 32))
            < thresh)
    return df


def crawl_completion_stats(frontier: DataFrame, mode: str = "host") -> DataFrame:
    """util/CrawlCompletionStats.java (A6): fetched vs unfetched per
    host/domain."""
    from ..status import Db
    key = F.col("host") if mode == "host" else F.col("domain")
    return frontier.groupBy(key.alias(mode)).agg(
        F.sum(F.when(F.col("status").isin(int(Db.FETCHED), int(Db.NOTMODIFIED)), 1)
              .otherwise(0)).alias("fetched"),
        F.sum(F.when(F.col("status") == int(Db.UNFETCHED), 1).otherwise(0))
        .alias("unfetched"),
    )


def domain_statistics(frontier: DataFrame, mode: str = "host") -> DataFrame:
    """util/domain/DomainStatistics.java (A7): url counts per host/domain/
    suffix/tld."""
    if mode == "host":
        key = F.col("host")
    elif mode == "domain":
        from ..functions.urls import domain_of

        def _dom(h):
            return domain_of(h).astype(object)

        key = F.pandas_udf(_dom, "string")(F.col("host"))
    elif mode == "suffix":
        key = F.substring_index(F.col("host"), ".", -1)
    else:
        raise ValueError(mode)
    return frontier.groupBy(key.alias(mode)).count().orderBy(F.desc("count"))
