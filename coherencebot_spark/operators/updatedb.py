"""UpdateDb — merge fetch results into the frontier
(SURVEY.md §2 J2, T1-T7, SC4/SC5, F3; ref ``crawl/CrawlDbReducer.java``,
``crawl/AbstractFetchSchedule.java``, ``crawl/DefaultFetchSchedule.java``,
``crawl/AdaptiveFetchSchedule.java``, ``crawl/CrawlDbFilter.java``).

The reference's union → shuffle → reducer-state-machine becomes ONE
aggregation plus a pure column-expression cascade:

1. **Classification** (``CrawlDbReducer.java:64-133``): union frontier ∪
   fetch_log ∪ parse_out, tag rows db/fetch/linked/signature/parse_meta,
   then one ``groupBy(url)`` computing latest-old, latest-fetch (both
   "latest by fetch_time", ties pinned by struct order — the reference is
   stream-order-nondeterministic here, SURVEY.md §7.3 risk 2), the inlink
   top-K (pre-capped by a window so no unbounded ``collect_list`` ever
   materializes — the Spark analogue of InlinkPriorityQueue), the parse
   signature, and parse metadata.

2. **State machine** (``CrawlDbReducer.java:196-312``): a ``when()``
   cascade — no Python in the path — covering: link-only rows, the
   success/redirect/notmodified family with signature-based modification
   detection (NUTCH-1422: only fetch_success compares signatures), retry
   accounting (T4), gone scheduling (T5), forceRefetch on oversized
   intervals (T6), and NUTCH-1341 modifiedTime reset.

3. **Schedules** (T1/T2): default (``next = fetch_ts + interval``) and
   adaptive (inc/dec rates, fixedInterval override, SYNC_DELTA) — both as
   column arithmetic on epoch-ms longs, float32-truncation emulated where
   the reference casts ``float`` → ``int`` seconds.

4. **Scoring** (SC4, ``OPICScoringFilter.java:93-103``):
   ``score = (old ?? result).score + Σ inlink cash``; (SC5, fork-specific
   ``WithdrawnScoringFilter.java:155-177``): rows whose ``collection.seed``
   metadata is no longer in service become ``db_withdrawn``.

At 10^10-frontier scale the union shuffles only the *delta* (fetch/parse
rows) plus the frontier itself; SURVEY.md §7.3 risk 3 notes the
Iceberg-MERGE/bucket-join upgrade path where only touched partitions
rewrite — the logical plan here is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType

from ..config import CrawlConfig, DEFAULT
from ..status import Db, Fetch, Msg

_DAY_MS = 86_400_000

# modification states (FetchSchedule constants)
_UNKNOWN, _MODIFIED, _NOTMODIFIED = 0, 1, 2

def _mcoal(c):
    return F.coalesce(c, F.expr("map()"))


def _crawldb_filter(frontier: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Map-side purges (CrawlDbFilter.java:76-125)."""
    df = frontier
    purge = []
    if cfg.purge_404:
        purge.append(Db.GONE)
    if cfg.purge_orphan:
        purge.append(Db.ORPHAN)
    if cfg.purge_withdrawn:
        purge.append(Db.WITHDRAWN)
    if purge:
        df = df.filter(~F.col("status").isin(purge))
    return df


def updatedb(frontier: DataFrame, fetch_log: DataFrame,
             parse_out: DataFrame | None, cur_time: int,
             cfg: CrawlConfig = DEFAULT,
             seeds_in_service: list[str] | None = None,
             frontier_unique: bool = True,
             broadcast_delta: bool = False,
             cache: list | None = None) -> DataFrame:
    """Produce the next frontier snapshot.  Pure function of its inputs.

    ``cache``: with ``broadcast_delta`` the delta is persisted (it feeds
    both the broadcast join and the anti join); callers that loop cycles
    MUST pass a list here and unpersist its entries after materializing
    the result, or one fetchlist-sized cache leaks per call for the
    session lifetime.

    ``parse_out`` carries Msg.SIGNATURE / Msg.LINKED / Msg.PARSE_META rows
    (PARSE_OUT schema); pass None when parse did not run.

    Physical shape: only the DELTA (fetch + parse rows, ≈|fetchlist|)
    goes through the classify aggregation; the frontier (≈10^10 rows)
    joins it by url with a plain projection — never an object-hash agg
    over map-carrying structs on the big side.  ``frontier_unique=True``
    (the engine's own snapshots — every snapshot is the output of this
    very merge, hence url-unique) skips even the old-side dedup;
    pass False when merging external/hand-built crawldbs that may carry
    duplicate urls (reference semantics: latest fetch_time wins).
    """
    # metadata overlays use map_concat with last-wins semantics
    # (MapWritable.putAll); enforce the policy at the operator
    # boundary for sessions not built by session.build_session
    frontier.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    row_struct = F.struct(
        "fetch_time", "status", "retries", "fetch_interval",
        "score", "signature", "modified_time", "metadata", "host",
    )
    # "latest by fetch_time", ties pinned by (status, retries, interval,
    # score) — max_by because the value struct carries a map (not orderable)
    order_key = F.struct("fetch_time", "status", "retries", "fetch_interval", "score")

    old_src = _crawldb_filter(frontier, cfg)
    if frontier_unique:
        old = old_src.select("url", row_struct.alias("old"))
    else:
        old = old_src.groupBy("url").agg(
            F.max_by(row_struct, order_key).alias("old")
        )

    fetch = fetch_log.select(
        "url", "host",
        F.lit("fetch").alias("kind"),
        "status", "fetch_time", "retries", "fetch_interval", "score",
        "signature", "modified_time", "metadata",
        F.lit(None).cast(StringType()).alias("from_url"),
    )
    parts = [fetch]
    if parse_out is not None:
        po = parse_out.select(
            "url", "host",
            F.when(F.col("status") == Msg.LINKED, "linked")
            .when(F.col("status") == Msg.SIGNATURE, "signature")
            .otherwise("parse_meta").alias("kind"),
            "status",
            F.lit(0).cast(LongType()).alias("fetch_time"),
            F.lit(0).alias("retries"),
            F.lit(0).cast(LongType()).alias("fetch_interval"),
            "score", "signature",
            F.lit(0).cast(LongType()).alias("modified_time"),
            "metadata",
            "from_url",
        )
        # inlink top-K pre-cap — the InlinkPriorityQueue analogue
        # (CrawlDbReducer.java:60-61, :328-341); bounds shuffle + agg memory
        wl = Window.partitionBy("url").orderBy(
            F.desc("score"), F.asc("from_url")
        )
        linked = (
            po.filter(F.col("kind") == "linked")
            .withColumn("_rn", F.row_number().over(wl))
            .filter(F.col("_rn") <= int(cfg.max_inlinks))
            .drop("_rn")
        )
        parts.append(po.filter(F.col("kind") != "linked"))
        parts.append(linked)

    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    is_fetch = F.col("kind") == "fetch"
    is_link = F.col("kind") == "linked"
    is_sig = F.col("kind") == "signature"
    is_meta = F.col("kind") == "parse_meta"

    delta = u.groupBy("url").agg(
        F.max_by(F.when(is_fetch, row_struct), F.when(is_fetch, order_key)).alias("fetch"),
        # top link by (score desc, from_url asc): min_by over inverted key
        F.min_by(
            F.when(is_link, F.struct("from_url", "score", "metadata", "host")),
            F.when(is_link, F.struct((-F.col("score")).alias("negscore"), "from_url")),
        ).alias("top_link"),
        F.sum(F.when(is_link, F.col("score"))).alias("link_cash"),
        F.max(F.when(is_sig, F.col("signature"))).alias("parse_sig"),
        # parse emits at most one meta row per url (ParseSegment dedups)
        F.any_value(F.when(is_meta, F.col("metadata")), True).alias("parse_meta"),
    )

    # additions_allowed decides whether delta-only urls (discovered links /
    # out-of-db fetches) enter the frontier (CrawlDbReducer.java:145-146)
    untouched = None
    if broadcast_delta:
        # The frontier (the 10^10 side) must NEVER shuffle its full rows —
        # and the state-machine cascade below must not run over 10^10
        # identity rows either.  Split the frontier against a NARROW
        # broadcast of the delta's url column (guide §3.2 semi-join
        # pre-filter; one broadcast subtree, reused by both joins):
        #
        #   touched   = old ⋉ broadcast(delta.urls)   (≤ |delta| rows)
        #   untouched = old ⟲ broadcast(delta.urls)   (identity under the
        #                                              cascade — bypasses it)
        #
        # then merge ONLY the touched rows with the delta in a small
        # url-keyed join (SHUFFLE_HASH hint: both sides are
        # fetchlist-sized, and the per-partition parallel hash build
        # replaces the former single-threaded driver build of the WIDE
        # delta broadcast — measured as a 6.4 s all-cores-idle gap per
        # cycle at the bench tier).  full_outer keeps delta-only urls
        # (the new-row branch) when additions are allowed; with the
        # frontier Iceberg-bucketed by url-hash both frontier probes are
        # storage-partitioned scans and nothing big ever enters an
        # exchange.
        delta = delta.persist()
        if cache is not None:
            cache.append(delta)
        durls = F.broadcast(delta.select("url"))
        touched_old = old.join(durls, "url", "left_semi")
        # derived from ``old`` (not old_src) so the frontier_unique=False
        # dedup applies to pass-through rows too
        untouched = old.join(durls, "url", "left_anti")
        g = touched_old.join(
            delta.hint("SHUFFLE_HASH"), "url",
            "full_outer" if cfg.additions_allowed else "left_outer")
    else:
        g = old.join(delta, "url",
                     "full_outer" if cfg.additions_allowed else "left_outer")

    has_old = F.col("old").isNotNull()
    has_fetch = F.col("fetch").isNotNull()
    has_link = F.col("top_link").isNotNull()

    # rows with neither fetch nor link: pass old through unchanged
    # (CrawlDbReducer.java:155-171; orphan hook is a no-op by default)
    g = g.filter(has_old | has_fetch | has_link)

    o = F.col("old")
    f = F.col("fetch")
    tl = F.col("top_link")

    # effective fetch: real fetch, else top link promoted (reducer:148-153)
    eff_status = F.when(has_fetch, f["status"]).otherwise(F.lit(int(Msg.LINKED)))
    eff_fetch_time = F.when(has_fetch, f["fetch_time"]).otherwise(F.lit(0))
    eff_retries = F.when(has_fetch, f["retries"]).otherwise(F.lit(0))
    eff_interval = F.when(has_fetch, f["fetch_interval"]).otherwise(F.lit(0))
    eff_score = F.when(has_fetch, f["score"]).otherwise(tl["score"])
    eff_sig = F.when(has_fetch, f["signature"]).otherwise(F.lit(None).cast(BinaryType()))
    eff_modified = F.when(has_fetch, f["modified_time"]).otherwise(F.lit(0))
    eff_meta = F.when(has_fetch, f["metadata"]).otherwise(tl["metadata"])

    signature = F.coalesce(F.col("parse_sig"), eff_sig)
    prev_fetch_time = F.when(has_old, o["fetch_time"]).otherwise(F.lit(0))
    prev_modified = F.when(has_old, o["modified_time"]).otherwise(F.lit(0))

    # base result = effective fetch + old-metadata underlay + modified fallback
    base_meta = F.when(
        has_old & (F.size(_mcoal(o["metadata"])) > 0),
        F.map_concat(_mcoal(o["metadata"]), _mcoal(eff_meta)),
    ).otherwise(_mcoal(eff_meta))
    base_modified = F.when(
        has_old & (o["modified_time"] > 0) & (eff_modified == 0), o["modified_time"]
    ).otherwise(eff_modified)

    is_linked_case = eff_status == int(Msg.LINKED)
    success_family = eff_status.isin(
        int(Fetch.SUCCESS), int(Fetch.REDIR_TEMP),
        int(Fetch.REDIR_PERM), int(Fetch.NOTMODIFIED)
    )
    is_retry = eff_status == int(Fetch.RETRY)
    is_gone = eff_status == int(Fetch.GONE)

    # --- modification state (reducer:225-239; NUTCH-1422) ---
    mod_state = (
        F.when(eff_status == int(Fetch.NOTMODIFIED), F.lit(_NOTMODIFIED))
        .when(
            (eff_status == int(Fetch.SUCCESS)) & has_old
            & o["signature"].isNotNull() & signature.isNotNull(),
            F.when(o["signature"] == signature, F.lit(_NOTMODIFIED))
            .otherwise(F.lit(_MODIFIED)),
        )
        .otherwise(F.lit(_UNKNOWN))
    )

    # metadata for success family gains parse_meta (NUTCH-1656)
    succ_meta = F.when(
        F.col("parse_meta").isNotNull(),
        F.map_concat(base_meta, _mcoal(F.col("parse_meta"))),
    ).otherwise(base_meta)

    # --- schedules -------------------------------------------------------
    max_int_s = int(cfg.interval_max_s)
    default_int_s = int(cfg.interval_default_s)
    interval0 = F.when(eff_interval == 0, F.lit(default_int_s)).otherwise(eff_interval)

    if cfg.schedule == "adaptive":
        mn, mx = int(cfg.adaptive_min_interval_s), int(cfg.adaptive_max_interval_s)
        sd_rate = float(cfg.adaptive_sync_delta_rate)
        # T2 global rates, with T3 per-format overrides from parse metadata
        # (MimeAdaptiveFetchSchedule.java: rate table keyed by content type)
        inc = F.lit(float(cfg.adaptive_inc_rate))
        dec = F.lit(float(cfg.adaptive_dec_rate))
        if cfg.mime_rates:
            fmt = succ_meta.getItem("img.fmt")
            inc_map = F.create_map(
                *[x for f_, i_, _ in cfg.mime_rates for x in (F.lit(f_), F.lit(float(i_)))]
            )
            dec_map = F.create_map(
                *[x for f_, _, d_ in cfg.mime_rates for x in (F.lit(f_), F.lit(float(d_)))]
            )
            inc = F.coalesce(inc_map.getItem(fmt), inc)
            dec = F.coalesce(dec_map.getItem(fmt), dec)
        fixed = succ_meta.getItem("fixedInterval").cast("float")
        m0 = F.when(eff_modified <= 0, eff_fetch_time).otherwise(eff_modified)
        intf = interval0.cast("float")
        intf = (
            F.when(mod_state == _MODIFIED, intf * (F.lit(1.0) - dec))
            .when(mod_state == _NOTMODIFIED, intf * (F.lit(1.0) + inc))
            .otherwise(intf)
        )
        sched_modified = F.when(mod_state == _MODIFIED, eff_fetch_time).otherwise(m0)
        if cfg.adaptive_sync_delta:
            delta_s = (eff_fetch_time - sched_modified) / F.lit(1000.0)
            intf = F.greatest(intf, delta_s.cast("float"))
            ref_time = eff_fetch_time - F.round(delta_s * sd_rate * 1000.0).cast("long")
        else:
            ref_time = eff_fetch_time
        intf = F.least(F.greatest(intf, F.lit(float(mn))), F.lit(float(mx)))
        # fixedInterval overrides everything (AdaptiveFetchSchedule:109-114)
        sched_interval = F.when(fixed.isNotNull(), fixed).otherwise(intf).cast("long")
        sched_fetch_time = (
            F.when(fixed.isNotNull(), eff_fetch_time).otherwise(ref_time)
            + sched_interval * 1000
        )
        sched_modified = F.when(fixed.isNotNull(), eff_modified).otherwise(sched_modified)
    else:
        sched_interval = interval0
        sched_fetch_time = eff_fetch_time + sched_interval * 1000
        sched_modified = F.when(
            (eff_modified <= 0) | (mod_state == _MODIFIED), eff_fetch_time
        ).otherwise(eff_modified)

    # --- success family result fields (reducer:214-283) ---
    succ_status = (
        F.when(mod_state == _NOTMODIFIED, F.lit(int(Db.NOTMODIFIED)))
        .when(eff_status == int(Fetch.SUCCESS), F.lit(int(Db.FETCHED)))
        .when(eff_status == int(Fetch.REDIR_PERM), F.lit(int(Db.REDIR_PERM)))
        .when(eff_status == int(Fetch.REDIR_TEMP), F.lit(int(Db.REDIR_TEMP)))
        .otherwise(F.lit(int(Db.UNFETCHED)))
    )
    succ_sig = F.when(
        mod_state == _NOTMODIFIED,
        F.when(has_old, o["signature"]).otherwise(eff_sig),
    ).otherwise(signature)
    # NUTCH-1341: notmodified resets modifiedTime to previous
    succ_modified = F.when(mod_state == _NOTMODIFIED, prev_modified).otherwise(sched_modified)

    # forceRefetch (T6, AbstractFetchSchedule:220-231) when interval > max
    force = sched_interval > max_int_s
    succ_status = F.when(force, F.lit(int(Db.UNFETCHED))).otherwise(succ_status)
    succ_interval = F.when(
        force, (F.lit(float(max_int_s)) * 0.9).cast("long")
    ).otherwise(sched_interval)
    succ_retries = F.lit(0)
    succ_sig = F.when(force, F.lit(None).cast(BinaryType())).otherwise(succ_sig)
    succ_modified = F.when(force, F.lit(0)).otherwise(succ_modified)
    succ_fetch_time = sched_fetch_time  # forceRefetch(asap=false) keeps it

    # --- retry (T4) ---
    retry_retries = eff_retries + 1
    retry_exceeded = retry_retries >= int(cfg.retry_max)
    # gone schedule (T5): interval*1.5 capped at 0.9*max (float math,
    # int-truncated like Java's setFetchInterval(float))
    def gone_interval(iv):
        grown = (iv.cast("float") * 1.5)
        return F.when(grown < max_int_s, grown.cast("long")).otherwise(
            (F.lit(float(max_int_s)) * 0.9).cast("long")
        )

    # retry/gone paths use the datum's interval as-is (no 0→default
    # normalization — that happens only inside setFetchSchedule)
    retry_interval = F.when(retry_exceeded, gone_interval(eff_interval)).otherwise(eff_interval)
    retry_fetch_time = F.when(
        retry_exceeded, eff_fetch_time + retry_interval * 1000
    ).otherwise(eff_fetch_time + _DAY_MS)
    retry_status = F.when(retry_exceeded, F.lit(int(Db.GONE))).otherwise(F.lit(int(Db.UNFETCHED)))

    # --- gone (T5) ---
    gone_int = gone_interval(eff_interval)
    gone_fetch_time = eff_fetch_time + gone_int * 1000

    # --- linked-only (reducer:198-211) ---
    link_new_status = F.lit(int(Db.UNFETCHED))
    link_new_fetch_time = F.lit(int(cur_time))
    link_new_interval = F.lit(default_int_s)
    link_new_score = F.lit(0.0).cast("float")  # OPIC initialScore

    old_sig = F.when(has_old, o["signature"]).otherwise(F.lit(None).cast(BinaryType()))

    # --- assemble the cascade --------------------------------------------
    def cascade(linked_old, linked_new, succ, retry, gone):
        return (
            F.when(is_linked_case & has_old, linked_old)
            .when(is_linked_case, linked_new)
            .when(success_family, succ)
            .when(is_retry, retry)
            .otherwise(gone)  # Fetch.GONE
        )

    status = cascade(o["status"], link_new_status, succ_status, retry_status,
                     F.lit(int(Db.GONE)))
    fetch_time = cascade(o["fetch_time"], link_new_fetch_time, succ_fetch_time,
                         retry_fetch_time, gone_fetch_time)
    retries = cascade(o["retries"], F.lit(0), succ_retries, retry_retries,
                      eff_retries)
    interval = cascade(o["fetch_interval"], link_new_interval, succ_interval,
                       retry_interval, gone_int)
    sig_out = cascade(o["signature"], F.lit(None).cast(BinaryType()), succ_sig,
                      old_sig, old_sig)
    modified = cascade(o["modified_time"], F.lit(0), succ_modified,
                       base_modified, base_modified)
    meta_out = cascade(o["metadata"], _mcoal(eff_meta), succ_meta, base_meta,
                       base_meta)
    base_score = cascade(o["score"], link_new_score, eff_score, eff_score,
                         eff_score)

    # OPIC updateDbScore (SC4): score = (old ?? result).score + Σ cash.
    # scoring-link (LinkAnalysisScoringFilter.java:56-60,97-100):
    # distributeScoreToOutlinks and updateDbScore are both no-ops — the
    # db score only ever changes via the WebGraph ScoreUpdater job
    # (webgraph.update_scores), so no cash term; new linked rows keep
    # initialScore 0.0 (:75-78, same constant as the OPIC path's
    # link_new_score).
    score = F.when(has_old, o["score"]).otherwise(base_score)
    if cfg.scoring_filter != "link":
        score = score + F.coalesce(F.col("link_cash"), F.lit(0.0))
    score = score.cast("float")

    # drop the generate marker (reducer:319-320) — ONLY on the fetch/link
    # path; old-only pass-through rows (generated but not fetched this
    # cycle) keep their metadata untouched (reducer:154-172 writes `old`
    # unchanged), preserving the gen_delay guard on in-flight URLs
    meta_out = F.when(
        has_fetch | has_link,
        F.map_filter(_mcoal(meta_out), lambda k, _: k != F.lit("_ngt_")),
    ).otherwise(_mcoal(meta_out))

    result = g.select(
        "url",
        F.coalesce(o["host"], f["host"], tl["host"]).alias("host"),
        status.cast("int").alias("status"),
        fetch_time.cast("long").alias("fetch_time"),
        retries.cast("int").alias("retries"),
        interval.cast("long").alias("fetch_interval"),
        score.alias("score"),
        sig_out.alias("signature"),
        modified.cast("long").alias("modified_time"),
        meta_out.alias("metadata"),
    )

    if untouched is not None:
        # untouched rows are identity under the cascade (no fetch, no
        # link): eff_status = LINKED with has_old ⇒ every cascade arm
        # selects the old field, link_cash coalesces to 0, and the
        # metadata arm reduces to map-coalesce — reproduced here as a
        # plain projection so the 10^10-row side never evaluates the
        # state machine (asserted equal by the oracle-gated updatedb
        # queries and the schedule/state-matrix tests)
        uo = F.col("old")
        result = result.unionByName(untouched.select(
            "url",
            uo["host"].alias("host"),
            uo["status"].cast("int").alias("status"),
            uo["fetch_time"].cast("long").alias("fetch_time"),
            uo["retries"].cast("int").alias("retries"),
            uo["fetch_interval"].cast("long").alias("fetch_interval"),
            uo["score"].cast("float").alias("score"),
            uo["signature"].alias("signature"),
            uo["modified_time"].cast("long").alias("modified_time"),
            _mcoal(uo["metadata"]).alias("metadata"),
        ))

    # SC5 withdrawn filter (fork-specific): seed no longer in service
    if seeds_in_service is not None:
        seed_md = F.col("metadata").getItem("collection.seed")
        in_service = seed_md.isin([str(s) for s in seeds_in_service])
        result = result.withColumn(
            "status",
            F.when(seed_md.isNotNull() & ~in_service, F.lit(int(Db.WITHDRAWN)))
            .otherwise(F.col("status")),
        )

    return result
