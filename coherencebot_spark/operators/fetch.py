"""Fetch — politeness-correct fetch engine (SURVEY.md §2.9 P1-P9).

The reference runs one mapper per unsplittable fetchlist file with
producer/consumer threads and per-host in-memory queues
(``fetcher/Fetcher.java:106-123,193-425``).  None of that machinery is
needed on Spark: politeness is a *partitioning invariant* plus a *virtual
clock*, both expressible declaratively:

* **Queue identity (P1)** — all URLs of a host share one window partition;
  the fetchlist's ``partition_id`` (host-hash) already guarantees one host
  never spans two tasks.  We never repartition between generate and fetch
  (the reference's "unsplittable input" invariant, SURVEY.md §4).
* **Crawl-delay pacing (P2)** — the per-host virtual clock is
  ``fetch_ts = cycle_start + rank_in_host * delay_host`` — a window
  ``row_number`` per host over the politeness order (``sort_key``, the
  reference's HashComparator order), entirely in Tungsten.  Items whose
  virtual time exceeds the cycle budget are not fetched this cycle (P9,
  ``fetcher.timelimit.mins``) — they simply stay due in the frontier.
* **robots.txt (P3-P5)** — one robots lookup per *distinct host* per cycle
  (``mapInPandas`` over the distinct-host frame), broadcast-joined back.
  403 ⇒ forbid-all unless ``http.robots.403.allow`` (default true);
  404/5xx ⇒ allow-all (``HttpRobotRulesParser.java:99-189``).  Disallowed
  URLs emit ``fetch_gone`` and consume no crawl-delay slot (the reference
  finishes them "asap", ``FetcherThread.java:317-326``).
  Crawl-delay > ``fetcher.max.crawl.delay`` ⇒ ``fetch_gone`` (P4);
  otherwise ``max(robots_delay, server_delay)`` paces the host's clock.
* **Exception circuit breaker (P8)** — running per-host count of exception
  outcomes; once it reaches ``fetcher.max.exceptions.per.queue`` the rest
  of the host's queue is purged (rows dropped, stay due next cycle).
* **Status mapping (P7)** — a ``when()`` cascade over
  ``PROTO_TO_FETCH`` (``FetcherThread.java:377-458``).
* **Redirects (P6)** — default ``http.redirect.max = 0``: targets are not
  followed; they surface as ``redirect_to`` and become ``linked`` rows in
  parse/updatedb, matching the reference default.

The protocol itself is an injectable backend; the sandbox uses the
deterministic synthetic web (``synth.world``).  Payload bytes (image +
caption) are produced only for successful fetches, in an Arrow-batched
``mapInPandas`` stage, and are kept out of every shuffle that doesn't need
them (SURVEY.md §7.3 risk 5).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT
from ..status import Fetch, Proto
from ..schemas import CONTENT, FETCH_LOG

ProtocolBackend = Callable[[pd.Series], pd.DataFrame]
PayloadFn = Callable[[int], dict]
# batch variant: ndarray[int64] of image indices -> DataFrame with columns
# (image_id, bytes, w, h, fmt, caption, phash) aligned row-for-row
PayloadBatchFn = Callable[["np.ndarray"], pd.DataFrame]


# ---------------------------------------------------------------------------
# server IP (store.ip.address)
# ---------------------------------------------------------------------------


def server_ip_expr(host: Column) -> Column:
    """Deterministic per-host IPv4 for ``store.ip.address``
    (net/protocols/Response.java:40-42 stores the socket peer under
    ``_ip_``; the sandbox's synthetic protocol backend has no socket, so
    the stored IP is a stable hash-derived stand-in — inject real
    resolver output via ``fetch(ip_expr=...)``).  Pure JVM expression:
    four octets from the host's xxhash64, first octet clamped to 1-223
    (unicast space)."""
    h = F.xxhash64(host)
    o1 = F.pmod(h, F.lit(223)) + 1
    o2 = F.pmod(F.shiftright(h, 8), F.lit(256))
    o3 = F.pmod(F.shiftright(h, 16), F.lit(256))
    o4 = F.pmod(F.shiftright(h, 24), F.lit(256))
    return F.concat_ws(".", o1.cast("string"), o2.cast("string"),
                       o3.cast("string"), o4.cast("string"))


# ---------------------------------------------------------------------------
# robots resolution: one lookup per distinct host, broadcast back
# ---------------------------------------------------------------------------


def resolve_robots(fetchlist: DataFrame, cfg: CrawlConfig,
                   robots_provider: Callable[[pd.Series], pd.DataFrame] | None = None,
                   ) -> DataFrame:
    """distinct hosts → (host, forbid_all, disallow, crawl_delay_ms).

    ``robots_provider(hosts) -> DataFrame[host, robots_status, disallow,
    crawl_delay_ms]`` — defaults to the synthetic world.
    """
    if robots_provider is None:
        from ..synth.world import robots_for_hosts
        robots_provider = robots_for_hosts

    allow_403 = cfg.robots_403_allow

    def lookup(it):
        for pdf in it:
            r = robots_provider(pdf["host"])
            status = r["robots_status"].to_numpy()
            forbid = (status == 403) & (not allow_403)
            ok = status == 200
            dis = [
                list(d) if ok[i] and isinstance(d, (list, np.ndarray)) else []
                for i, d in enumerate(r["disallow"])
            ]
            delay = r["crawl_delay_ms"].where(pd.Series(ok, index=r.index), None)
            yield pd.DataFrame(
                {
                    "host": r["host"],
                    "forbid_all": forbid,
                    "disallow": dis,
                    "crawl_delay_ms": delay.astype("Int64"),
                }
            )

    hosts = fetchlist.select("host").distinct()
    return hosts.mapInPandas(
        lookup,
        schema="host string, forbid_all boolean, disallow array<string>, crawl_delay_ms long",
    )


# ---------------------------------------------------------------------------
# the fetch engine
# ---------------------------------------------------------------------------


def fetch(fetchlist: DataFrame, cycle_start: int, cfg: CrawlConfig = DEFAULT,
          backend: ProtocolBackend | None = None,
          payload_fn: PayloadFn | None = None,
          payload_batch_fn: PayloadBatchFn | None = None,
          robots: DataFrame | None = None,
          robots_provider: Callable[[pd.Series], pd.DataFrame] | None = None,
          n_images: int = 1_000_000, n_hosts: int = 1000,
          payload_partitions: int | None = None,
          cache: list | None = None,
          ip_expr: Callable[[Column], Column] | None = None,
          ) -> tuple[DataFrame, DataFrame]:
    """Run one fetch cycle over a fetchlist.

    Returns ``(fetch_log, content)``.  ``fetch_log`` has FETCH_LOG schema;
    ``content`` has CONTENT schema (success rows only).  Rows dropped by the
    time limit or circuit breaker appear in neither — they stay due in the
    frontier, exactly like the reference's purged queue items.

    ``cache`` (optional list): when given, the internal byte-free fetch
    log is persisted and appended to it, so a caller that materializes
    BOTH outputs (the cycle driver writes fetch_log and content as two
    jobs) executes the protocol/politeness pipeline exactly once — with a
    real backend a second execution would re-fetch every URL and could
    diverge on nondeterministic outcomes.  The caller unpersists the
    registered frames after its actions.
    """
    if backend is None:
        from ..synth.world import proto_outcomes

        def backend(urls: pd.Series) -> pd.DataFrame:
            return proto_outcomes(urls, n_images=n_images, n_hosts=n_hosts)

    if payload_fn is None and payload_batch_fn is None:
        from ..synth.world import payload_rows_batch as payload_batch_fn

    if robots is None:
        robots = resolve_robots(fetchlist, cfg, robots_provider)

    fl = fetchlist.join(F.broadcast(robots), "host", "left")

    # --- politeness queue key (P1; ``fetcher.queue.mode``) ---
    # byHost (default): the host IS the queue.  byDomain: all hosts of a
    # registered domain share one queue (FetchItemQueues.getQueueID) —
    # derived once per DISTINCT host (pandas over |hosts| rows, broadcast
    # back), never per fetchlist row.  Robots stay per-host either way.
    if cfg.queue_mode == "byDomain":
        from ..functions.urls import domain_of

        def _dom(it):
            for pdf in it:
                yield pd.DataFrame({
                    "host": pdf["host"],
                    "_qkey": domain_of(pdf["host"]).astype(object),
                })

        dom = fetchlist.select("host").distinct().mapInPandas(
            _dom, schema="host string, _qkey string")
        fl = fl.join(F.broadcast(dom), "host", "left").withColumn(
            "_qkey", F.coalesce(F.col("_qkey"), F.col("host")))
        qkey = "_qkey"
    else:
        # byHost default: the host column IS the queue key — no duplicate
        # column through the politeness exchange
        qkey = "host"

    # --- robots gating FIRST (P3-P5): a robots-denied url must never
    # reach the protocol backend (with a real backend that would be an
    # actual disallowed HTTP request) ---
    path = F.expr("parse_url(url, 'PATH')")
    denied_prefix = F.exists(
        F.coalesce(F.col("disallow"), F.array()),
        lambda p: path.startswith(p),
    )
    delay_too_big = F.col("crawl_delay_ms").isNotNull() & (
        F.col("crawl_delay_ms") > int(cfg.max_crawl_delay_ms)
    )
    robots_denied = (
        F.coalesce(F.col("forbid_all"), F.lit(False)) | denied_prefix | delay_too_big
    )
    fl = fl.withColumn("robots_denied", robots_denied)

    # --- per-host virtual clock (P2), robots-denied items pace-free ---
    # threads_per_queue > 1 (``fetcher.threads.per.queue``): the reference
    # runs maxThreads items of one queue concurrently with minCrawlDelay
    # between starts (``FetchItemQueue.getFetchItem:118-137`` inProgress
    # gate + ``setEndTime:163-169`` maxThreads>1 → minCrawlDelay).  The
    # virtual-clock model is k in-flight slots: rank r starts at
    # ``cycle_start + floor(r / threads) · minCrawlDelay`` — each delay
    # window admits `threads` starts instead of one.
    threads = max(int(cfg.threads_per_queue), 1)
    if threads > 1:
        base_delay = F.lit(int(cfg.min_crawl_delay_ms))
    else:
        base_delay = F.greatest(
            F.coalesce(F.col("crawl_delay_ms"), F.lit(int(cfg.server_delay_ms))),
            F.lit(int(cfg.min_crawl_delay_ms)),
        )
    # hostdb-variable fetch delay (W3) overrides when present
    var_delay = F.col("metadata").getItem("_variableFetchDelay_").cast("long")
    delay = F.coalesce(var_delay, base_delay)

    wh = Window.partitionBy(qkey).orderBy("sort_key", "url")
    paced = Window.partitionBy(qkey, "robots_denied").orderBy("sort_key", "url")
    fl = fl.withColumn(
        "_k",
        F.when(F.col("robots_denied"), F.lit(0))
        .otherwise(F.row_number().over(paced) - 1),
    ).withColumn(
        "fetch_ts",
        F.lit(int(cycle_start))
        + F.floor(F.col("_k") / F.lit(threads)).cast("long") * delay,
    )

    # --- time limit (P9): unfetched overflow stays in the frontier ---
    if cfg.time_limit_ms > 0:
        fl = fl.filter(
            F.col("robots_denied")
            | (F.col("fetch_ts") <= int(cycle_start) + int(cfg.time_limit_ms))
        )

    # --- protocol outcome, AFTER every pre-fetch gate: only rows that
    # will actually be fetched reach the backend (robots-denied rows get
    # literal outcome columns — they are finished "asap" without any
    # protocol contact; time-limit overflow never hits the wire, so it
    # isn't double-fetched when it comes due next cycle) ---
    be = backend

    def outcomes(it):
        for pdf in it:
            o = be(pdf["url"])
            pdf = pdf.copy()
            pdf["proto_status"] = o["proto_status"].to_numpy()
            pdf["redirect_to"] = o["redirect_to"].to_numpy()
            pdf["image_idx"] = o["image_idx"].to_numpy()
            yield pdf

    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    out_schema = StructType(
        list(fl.schema.fields)
        + [
            StructField("proto_status", IntegerType()),
            StructField("redirect_to", StringType()),
            StructField("image_idx", LongType()),
        ]
    )
    fetched_part = fl.filter(~F.col("robots_denied")) \
        .mapInPandas(outcomes, schema=out_schema)
    denied_part = fl.filter(F.col("robots_denied")).select(
        "*",
        F.lit(int(Proto.ROBOTS_DENIED)).cast("int").alias("proto_status"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(-1).cast("long").alias("image_idx"),
    )
    fl = fetched_part.unionByName(denied_part)

    # --- exception circuit breaker (P8) --- robots-denied rows carry
    # ROBOTS_DENIED here, so they never consume the queue's exception
    # budget (the reference counts only actual fetch attempts)
    if cfg.max_exceptions_per_queue >= 0:
        is_exc = F.when(
            F.col("proto_status").isin(Proto.EXCEPTION, Proto.RETRY), 1
        ).otherwise(0)
        prev_exc = F.sum(is_exc).over(
            wh.rowsBetween(Window.unboundedPreceding, -1)
        )
        # reference semantics (FetchItemQueues.checkExceptionThreshold:
        # purge fires when excCount >= max, checked only as exceptions
        # occur): rows up to and INCLUDING the max-th exception are
        # output; max=0 behaves like max=1 — the first exception still
        # happens, the rest of the queue is purged
        bound = max(int(cfg.max_exceptions_per_queue), 1)
        fl = (
            fl.withColumn("_prev_exc", F.coalesce(prev_exc, F.lit(0)))
            .filter(F.col("_prev_exc") < bound)
            .drop("_prev_exc")
        )

    # --- status mapping (P7) ---
    status_expr = F.when(F.col("robots_denied"), F.lit(int(Fetch.GONE)))
    for proto, fstat in (
        (Proto.SUCCESS, Fetch.SUCCESS),
        (Proto.MOVED, Fetch.REDIR_PERM),
        (Proto.TEMP_MOVED, Fetch.REDIR_TEMP),
        (Proto.EXCEPTION, Fetch.RETRY),
        (Proto.RETRY, Fetch.RETRY),
        (Proto.WOULDBLOCK, Fetch.RETRY),
        (Proto.BLOCKED, Fetch.RETRY),
        (Proto.NOTMODIFIED, Fetch.NOTMODIFIED),
    ):
        status_expr = status_expr.when(F.col("proto_status") == proto, F.lit(int(fstat)))
    status_expr = status_expr.otherwise(F.lit(int(Fetch.GONE)))  # GONE family

    fl = fl.withColumn("fetch_status", status_expr).withColumn(
        "proto_status",
        F.when(F.col("robots_denied"), F.lit(int(Proto.ROBOTS_DENIED)))
        .otherwise(F.col("proto_status")),
    )

    # store.ip.address (Response.java:40-42): record the server IP under
    # ``_ip_`` in the fetch metadata — WARC export and index-geoip read it
    if cfg.store_ip_address:
        ip = (ip_expr or server_ip_expr)(F.col("host"))
        fl = fl.withColumn(
            "metadata",
            F.map_concat(
                F.map_filter(
                    F.coalesce(F.col("metadata"), F.expr("map()")),
                    lambda k, _: k != "_ip_"),
                F.create_map(F.lit("_ip_"), ip)))

    fetch_log = fl.select(
        "url",
        "host",
        F.col("fetch_status").cast("int").alias("status"),
        F.col("fetch_ts").cast("long").alias("fetch_time"),
        F.col("retries").cast("int"),
        F.col("fetch_interval").cast("long"),
        F.col("score").cast("float"),
        "signature",
        F.col("modified_time").cast("long"),
        "metadata",
        F.col("proto_status").cast("int"),
        "redirect_to",
        "image_idx",
    )
    if cache is not None:
        # one fetch execution feeds both outputs (see docstring); the
        # cached rows are byte-free — payload is born downstream
        fetch_log = fetch_log.persist()
        cache.append(fetch_log)

    # --- payload materialization (image bytes + caption) for successes ---
    # host/score/metadata ride along so parse never joins the byte-bearing
    # frame back to the fetch log (bytes must not cross a shuffle —
    # SURVEY.md §7.3 risk 5); the cycle driver projects CONTENT columns
    # when persisting.
    pf, pbf = payload_fn, payload_batch_fn
    _COLS = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    # http.content.limit (P/F6; conf default 1 MB): payloads larger than
    # the limit are cut off mid-stream exactly like the reference's
    # protocol readers — the truncated blob then fails parse's decode
    # gate and the row is skipped (ParseSegment's truncation check)
    content_limit = int(cfg.content_limit)

    def materialize(it):
        for pdf in it:
            n = len(pdf)
            idx = pd.to_numeric(pdf["image_idx"], errors="coerce")
            valid = idx.notna().to_numpy() & (
                idx.fillna(-1).to_numpy(dtype=np.int64) >= 0)
            pos = np.nonzero(valid)[0]
            # one object-array fancy-index assignment per column instead
            # of a per-element Python loop (7 cols × batch rows): the
            # batch fn already returns aligned columns
            cols = {k: np.full(n, None, dtype=object) for k in _COLS}
            if len(pos):
                vidx = idx.to_numpy(dtype=np.int64)[pos]
                if pbf is not None:
                    # vectorized payload production over the whole Arrow
                    # batch — no per-row Python loop in the hot path
                    rows_df = pbf(vidx)
                    for k in cols:
                        cols[k][pos] = rows_df[k].to_numpy(dtype=object)
                else:
                    for i, u in zip(pos, vidx):
                        row = pf(int(u))
                        for k in cols:
                            cols[k][i] = row[k]
            truncated = np.zeros(n, dtype=bool)
            if content_limit > 0 and len(pos):
                blobs = cols["bytes"]
                lens = np.fromiter(
                    (len(blobs[i]) for i in pos), dtype=np.int64,
                    count=len(pos))
                for i in pos[lens > content_limit]:
                    blobs[i] = blobs[i][:content_limit]
                    truncated[i] = True
            out = {k: pdf[k] for k in ("url", "host", "score", "metadata")}
            out.update(cols)
            out["truncated"] = truncated
            yield pd.DataFrame(out)

    from pyspark.sql.types import BooleanType, FloatType, MapType

    content_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("score", FloatType()),
            StructField("metadata", MapType(StringType(), StringType())),
        ]
        + [f for f in CONTENT.fields if f.name != "url"]
        # http.content.limit cut this payload off mid-stream (the
        # reference's protocol readers flag the same); parse skips
        # truncated rows by default (parser.skip.truncated)
        + [StructField("truncated", BooleanType())]
    )
    success = (
        fetch_log.filter(F.col("status") == int(Fetch.SUCCESS))
        .select("url", "host", "score", "metadata", "image_idx")
    )
    if payload_partitions:
        # payload materialization is the cycle's dominant compute; split it
        # into fine-grained tasks (rows are still byte-free here, so this
        # round-robin shuffle is cheap) so stragglers — slow nodes on a
        # cluster, stolen cores in this sandbox — average out instead of
        # capping the stage (speculation is off as a politeness invariant,
        # so task granularity is the only straggler defense).  The caller's
        # value is a granularity UPPER BOUND, clamped to 8 tasks per
        # available core (guide §2: partitioning derives from the session's
        # parallelism, not a constant tuned for one machine shape) — 8/core
        # keeps the straggler averaging while a 2-core scaling leg stops
        # paying the scheduler cost of 256 near-empty tasks; results are
        # partitioning-independent (payloads are a pure per-row function).
        sc = fetchlist.sparkSession.sparkContext
        n_parts = max(min(int(payload_partitions),
                          8 * sc.defaultParallelism), 1)
        success = success.repartition(n_parts)
    content = success.mapInPandas(materialize, schema=content_schema)

    return fetch_log.drop("image_idx"), content


def fetch_with_redirects(fetchlist: DataFrame, cycle_start: int,
                         cfg: CrawlConfig = DEFAULT,
                         chain=None,
                         **kw) -> tuple[DataFrame, DataFrame]:
    """P6 follow mode (``http.redirect.max`` > 0): redirect targets are
    fetched IN-CYCLE, up to ``redirect_max`` rounds (the reference queues
    the target as a new fetch item in the same fetch round —
    ``FetcherThread.handleRedirect`` → ``FetchItemQueues.addFetchItem``).

    Each round's targets are normalized and gated by the URL filter
    ``chain`` (handleRedirect normalizes+filters before queueing — a
    target the crawl's policy excludes must not be fetched just because
    a page redirected to it), deduped, stripped of urls already fetched
    this cycle (loop guard — a self-redirect or A↔B cycle terminates),
    and paced through the normal politeness clock on THEIR OWN hosts.
    Rounds restart the virtual clock at ``cycle_start`` — the same
    approximation as the reference, where a redirect target re-enters its
    queue's tail with its own delay slot.  With ``redirect_max == 0``
    (the default) this is exactly :func:`fetch`."""
    from ..functions.hashing import nutch_tail_hash
    from ..functions.urls import with_filter_accept, with_normalized_url

    @F.pandas_udf("long")
    def _nutch_sort_key(url: pd.Series) -> pd.Series:
        # HashComparator parity (same sort key generate assigns) — the
        # in-cycle redirect fetch order must match the reference's queue
        # order, not an arbitrary hash
        return pd.Series(nutch_tail_hash(url).astype(np.int64),
                         index=url.index)

    log, content = fetch(fetchlist, cycle_start, cfg, **kw)
    logs, contents = [log], [content]
    seen = fetchlist.select("url")
    persisted = []
    # redirect-target hosts were NOT in the original fetchlist: a robots
    # frame resolved for the first round must not leak into later rounds
    # (a new host would left-join to nulls = allow-all with no lookup)
    kw_rounds = {k: v for k, v in kw.items() if k != "robots"}
    for _ in range(max(int(cfg.redirect_max), 0)):
        tgt = (
            log.filter(
                F.col("status").isin(int(Fetch.REDIR_PERM),
                                     int(Fetch.REDIR_TEMP))
                & F.col("redirect_to").isNotNull()
            )
            .select(F.col("redirect_to").alias("url"),
                    F.col("url").alias("_src"),
                    "retries", "fetch_interval", "score", "metadata")
        )
        tgt = with_normalized_url(tgt, "url", "url") \
            .filter(F.col("url").isNotNull())
        if chain is not None:
            tgt = with_filter_accept(tgt, chain, "url", "_ok") \
                .filter("_ok").drop("_ok")
        tgt = tgt.join(seen, "url", "left_anti")
        w = Window.partitionBy("url").orderBy(F.desc("score"), F.asc("_src"))
        tgt = (
            tgt.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select(
                "url",
                F.lower(F.expr("parse_url(url, 'HOST')")).alias("host"),
                F.lit(1).cast("int").alias("status"),      # Db.UNFETCHED
                F.lit(int(cycle_start)).cast("long").alias("fetch_time"),
                F.col("retries").cast("int"),
                F.col("fetch_interval").cast("long"),
                F.col("score").cast("float"),
                F.lit(None).cast("binary").alias("signature"),
                F.lit(0).cast("long").alias("modified_time"),
                "metadata",
                F.lit(1).cast("int").alias("segnum"),
                F.lit(0).cast("int").alias("partition_id"),
                _nutch_sort_key(F.col("url")).alias("sort_key"),
            )
        ).persist()
        persisted.append(tgt)
        if not tgt.limit(1).count():
            break
        seen = seen.unionByName(tgt.select("url"))
        log, content = fetch(tgt, cycle_start, cfg, **kw_rounds)
        logs.append(log)
        contents.append(content)
    out_log, out_content = logs[0], contents[0]
    for l in logs[1:]:
        out_log = out_log.unionByName(l)
    for c in contents[1:]:
        out_content = out_content.unionByName(c)
    # release the per-round caches: the unions keep the LINEAGE, so a
    # consumer that materializes later just recomputes the tiny target
    # frames — nothing stays pinned in executor storage across cycles
    for t in persisted:
        t.unpersist()
    return out_log, out_content


def fetch_metrics(fetch_log: DataFrame) -> DataFrame:
    """Per-cycle fetch counters (A8; ref Fetcher.java:159-183): rows of
    (status, count) plus bytes via content join done by the caller."""
    return fetch_log.groupBy("status").count()
