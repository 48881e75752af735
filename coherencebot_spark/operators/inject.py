"""Inject — seeds → frontier merge (SURVEY.md §2 S1/J1/F1/F2).

Reference: ``crawl/Injector.java``.  One declarative plan replaces the MR
job: seed-line parsing is pure Spark SQL (split / map_from_entries — no
Python in the metadata path), URL normalize+filter are Arrow-batched pandas
UDFs, and the seeds ⟗ frontier resolution is a single full-outer join with
a ``when()`` cascade implementing the NUTCH-1405 rules
(``crawl/Injector.java:292-343``):

  1. only new injected row            → injected (status := db_unfetched)
  2. only old row                     → old
  3. both: overwrite                  → injected
     both: !overwrite, !update        → old
     both: !overwrite, update         → old + merged metadata,
            score/interval taken from injected iff explicitly set in seed

Special seed metadata keys (``crawl/Injector.java:182-205``):
``nutch.score``, ``nutch.fetchInterval`` set columns and are NOT stored in
the metadata map; ``nutch.fixedFetchInterval`` sets the interval and is
stored under key ``fixedInterval`` (``metadata/Nutch.java:83``).

Determinism deviation (documented): when one URL appears on several seed
lines the reference keeps whichever the reduce iterator yields last
(stream-order-dependent).  We pin a total order — highest score, then
longest metadata, then line ascending — so runs are reproducible
(SURVEY.md §7.3 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Db, Msg
from ..functions.urls import URLFilterChain, with_filter_accept, with_host, with_normalized_url

_META_PARSE = """
filter(
  transform(slice(split(line, '\t'), 2, 1000000),
            s -> if(instr(s, '=') > 0,
                    struct(substring(s, 1, instr(s, '=') - 1) AS key,
                           substring(s, instr(s, '=') + 1) AS value),
                    null)),
  x -> x is not null)
"""


def parse_seed_lines(seeds: DataFrame, cfg: CrawlConfig, cur_time: int,
                     chain: URLFilterChain | None = None) -> DataFrame:
    """Seed text lines → injected candidate rows (frontier schema,
    status=Msg.INJECTED)."""
    df = (
        seeds.withColumn("line", F.trim(F.col("line")))
        .filter((F.length("line") > 0) & ~F.col("line").startswith("#"))
        .withColumn("url_raw", F.split("line", "\t").getItem(0))
        .withColumn("meta_entries", F.expr(_META_PARSE))
        .withColumn("seed_meta", F.map_from_entries("meta_entries"))
    )
    df = with_normalized_url(df, "url_raw", "url").filter(F.col("url").isNotNull())
    df = with_filter_accept(df, chain, "url", "_ok").filter("_ok")

    # try_cast: seed files are EXTERNAL input — a malformed numeric
    # ('nutch.score=high') must degrade to the default per record, not
    # abort the whole inject under Spark's default ANSI mode
    score_md = F.expr("try_cast(seed_meta['nutch.score'] AS FLOAT)")
    interval_md = F.expr(
        "try_cast(seed_meta['nutch.fetchInterval'] AS LONG)")
    fixed_md = F.expr(
        "try_cast(seed_meta['nutch.fixedFetchInterval'] AS LONG)")
    reserved = F.array(
        F.lit("nutch.score"), F.lit("nutch.fetchInterval"), F.lit("nutch.fixedFetchInterval")
    )
    stored_meta = F.map_filter("seed_meta", lambda k, _: ~F.array_contains(reserved, k))
    # fixedFetchInterval > -1 → store under 'fixedInterval' + set interval
    fixed_ok = fixed_md.isNotNull() & (fixed_md > -1)
    stored_meta = F.when(
        fixed_ok,
        F.map_concat(stored_meta, F.create_map(F.lit("fixedInterval"), fixed_md.cast("string"))),
    ).otherwise(stored_meta)

    out = df.select(
        "url",
        F.lit(int(Msg.INJECTED)).alias("status"),
        F.lit(cur_time).cast("long").alias("fetch_time"),
        F.lit(0).alias("retries"),
        F.coalesce(
            F.when(fixed_ok, fixed_md), interval_md, F.lit(int(cfg.interval_default_s))
        ).cast("long").alias("fetch_interval"),
        F.coalesce(score_md, F.lit(float(cfg.score_injected))).cast("float").alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        stored_meta.alias("metadata"),
    )
    out = with_host(out)
    # pin a deterministic TOTAL order among duplicate seed lines (see
    # docstring): score desc, metadata size desc, interval asc, then the
    # sorted metadata entries as the final tie-break — without it a full
    # tie on the numeric keys picked a stream-order-dependent winner
    meta_repr = F.array_sort(
        F.map_entries(F.coalesce(F.col("metadata"), F.expr("map()")))
    ).cast("string")
    w = Window.partitionBy("url").orderBy(
        F.desc("score"),
        F.desc(F.size(F.coalesce(F.col("metadata"), F.expr("map()")))),
        F.asc("fetch_interval"),
        F.asc(meta_repr),
    )
    return (
        out.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )


def inject(frontier: DataFrame, seeds: DataFrame, cur_time: int,
           cfg: CrawlConfig = DEFAULT,
           chain: URLFilterChain | None = None) -> DataFrame:
    """The full inject job: returns the new frontier DataFrame.

    ``frontier`` may be empty (first inject).  Purges db_gone rows when
    ``cfg.purge_404`` (ref ``crawl/Injector.java:249-253``).
    """
    # metadata merge below uses map_concat with last-wins semantics
    # (MapWritable.putAll); enforce the policy at the operator boundary
    frontier.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    inj = parse_seed_lines(seeds, cfg, cur_time, chain)

    old = frontier
    if cfg.purge_404:
        old = old.filter(F.col("status") != Db.GONE)

    o = old.select([F.col(c).alias(f"o_{c}") for c in old.columns])
    j = inj.alias("i").join(o, F.col("url") == F.col("o_url"), "full_outer")

    has_new = F.col("status").isNotNull()
    has_old = F.col("o_status").isNotNull()
    take_injected = has_new & (~has_old | F.lit(cfg.inject_overwrite))

    # rule 3.b.ii field updates (update=true, old wins unless seed set values)
    upd = F.lit(cfg.inject_update) & has_new & has_old & ~F.lit(cfg.inject_overwrite)
    merged_meta = F.map_concat(
        F.coalesce(F.col("o_metadata"), F.expr("map()")), F.coalesce(F.col("metadata"), F.expr("map()"))
    )
    upd_score = F.when(F.col("score") != float(cfg.score_injected), F.col("score")).otherwise(F.col("o_score"))
    upd_interval = F.when(
        F.col("fetch_interval") != int(cfg.interval_default_s), F.col("fetch_interval")
    ).otherwise(F.col("o_fetch_interval"))

    def pick(new_col: str, old_col: str, updated=None):
        c = F.when(take_injected, F.col(new_col))
        if updated is not None:
            c = c.when(upd, updated)
        return c.otherwise(F.col(old_col))

    return j.select(
        F.coalesce(F.col("url"), F.col("o_url")).alias("url"),
        F.coalesce(F.col("host"), F.col("o_host")).alias("host"),
        F.when(take_injected, F.lit(int(Db.UNFETCHED)))
        .otherwise(F.col("o_status")).cast("int").alias("status"),
        pick("fetch_time", "o_fetch_time").cast("long").alias("fetch_time"),
        pick("retries", "o_retries").cast("int").alias("retries"),
        pick("fetch_interval", "o_fetch_interval", upd_interval).cast("long").alias("fetch_interval"),
        pick("score", "o_score", upd_score).cast("float").alias("score"),
        pick("signature", "o_signature").alias("signature"),
        pick("modified_time", "o_modified_time").cast("long").alias("modified_time"),
        F.when(take_injected, F.col("metadata"))
        .when(upd, merged_meta)
        .otherwise(F.col("o_metadata")).alias("metadata"),
    )
