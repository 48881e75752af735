"""Continuous operation (SURVEY.md §2.13).

The reference has NO streaming subsystem — "continuous" crawling is its
shell loop re-running batch jobs (``src/bin/crawl:316-487``, ``-1`` =
infinite).  The rebuild keeps that batch-cycle model (plans/cycle.py) for
exact-ordering guarantees; Structured Streaming is not required for
parity.

What Structured Streaming IS the right tool for here is the *seed intake*
path: the reference polls its collection API every cycle (FeedInjector).
``stream_seed_drops`` watches a drop directory of seed files and folds each
micro-batch into the frontier via the exact batch inject operator
(``foreachBatch`` — streaming plumbing, batch semantics, zero divergence
from the tested inject path).  Checkpointed, so seed intake is
exactly-once across restarts.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from ..config import CrawlConfig, DEFAULT
from ..operators.inject import inject
from ..plans.cycle import CrawlDriver


def stream_seed_drops(spark: SparkSession, driver: CrawlDriver,
                      drop_dir: str, checkpoint_dir: str,
                      cfg: CrawlConfig = DEFAULT,
                      clock=lambda: int(time.time() * 1000),
                      available_now: bool = True):
    """Fold seed files appearing in ``drop_dir`` into the frontier.

    Returns the StreamingQuery.  ``available_now=True`` processes the
    current backlog and stops (the testable mode); False runs continuously.
    ``clock`` injects cur_time per batch (tests pass a fixed clock).
    """
    from ..schemas import FRONTIER, empty_df

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 16)
        .load(drop_dir)
        .withColumnRenamed("value", "line")
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        base = (
            driver.frontier.read(spark)
            if driver.frontier.exists()
            else empty_df(spark, FRONTIER)
        )
        new = inject(base, batch_df, clock(), cfg)
        driver.frontier.write(new, cycle_id=f"seed-drop-{batch_id}")

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_politeness_pacer(candidates, delay_ms: int,
                            state_field: str = "next_free"):
    """Streaming P2: the per-host crawl-delay virtual clock as a CUSTOM
    STATEFUL operator (``applyInPandasWithState``) over a stream of fetch
    candidates — the continuous-intake twin of the batch fetcher's window
    arithmetic (operators/fetch.py P2).

    ``candidates``: a streaming DataFrame with columns
    ``(url string, host string, sort_key long, cur_time long)``.
    Emits ``(url, host, fetch_ts)`` where ``fetch_ts`` respects the
    per-host delay ACROSS micro-batches: each host's state carries its
    virtual-clock high-water mark, checkpointed with the query — a
    restart resumes pacing exactly where it stopped (north-rule
    resumability, streaming flavor).

    Rows within a batch are ordered by the politeness sort_key (the
    HashComparator order), matching the batch fetcher.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def pace(key, pdfs, state):
        host = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["sort_key", "url"], kind="mergesort")
        next_free = state.get[0] if state.exists else 0
        cur = int(next_free)
        ts = []
        # clamp per ROW: a candidate must never be scheduled before its
        # own cur_time (a batch can mix clocks; seeding from the batch
        # minimum let later-clock rows start early)
        for row_cur in rows["cur_time"].astype("int64"):
            cur = max(cur, int(row_cur))
            ts.append(cur)
            cur += int(delay_ms)
        state.update((cur,))
        yield pd.DataFrame({
            "url": rows["url"].to_numpy(),
            "host": host,
            "fetch_ts": pd.array(ts, dtype="int64"),
        })

    return (
        candidates.groupBy("host").applyInPandasWithState(
            pace,
            outputStructType="url string, host string, fetch_ts long",
            stateStructType=f"{state_field} long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_urls(stream_df: DataFrame, watermark: str = "1 hour",
                      ts_col: str = "ts", url_col: str = "url") -> DataFrame:
    """Streaming URL-seen dedup for intake streams
    (``dropDuplicatesWithinWatermark``): a url arriving again within the
    watermark is dropped — across micro-batches AND restarts (the dedup
    state is checkpointed) — while state stays BOUNDED by the watermark
    instead of growing with every url ever seen.  The streaming twin of
    the batch URL-seen filter: the batch bloom answers "ever seen" against
    the frontier, this answers "seen recently" on the wire, which is
    exactly what dedupes a re-delivering feed/drop-dir source before the
    exact inject merge runs."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([url_col])
    )


def stream_fetch_window_metrics(spark: SparkSession, src_dir: str,
                                out_dir: str, checkpoint_dir: str,
                                window: str = "10 minutes",
                                watermark: str = "5 minutes",
                                available_now: bool = True):
    """Streaming A8: windowed per-status fetch metrics with LATE-DATA
    semantics (the cycle lineage counters' continuous twin).

    Reads FETCH_LOG-shaped parquet rows from ``src_dir`` as they land,
    buckets them into event-time tumbling windows on ``fetch_time``,
    and emits FINALIZED windows (append mode) once the watermark passes —
    rows arriving more than ``watermark`` behind the max seen event time
    are dropped, exactly Spark's late-data contract.  Output parquet:
    (win_start long, win_end long, status int, cnt long) — epoch ms, the
    engine's native time unit.

    availableNow=True drains the current backlog and stops; successive
    runs share the checkpoint, so the watermark ADVANCES across runs
    (tested: a late row fed in a second run is excluded from its
    already-closed window).
    """
    from ..schemas import FETCH_LOG
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(FETCH_LOG)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
    )
    agged = (
        stream
        .withColumn("ts", F.timestamp_millis(F.col("fetch_time")))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "status")
        .count()
        .select(
            F.unix_millis(F.col("win.start")).alias("win_start"),
            F.unix_millis(F.col("win.end")).alias("win_end"),
            "status",
            F.col("count").alias("cnt"),
        )
    )
    writer = (
        agged.writeStream.outputMode("append").format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_corpus_intake(spark: SparkSession, intake_dir: str,
                         corpus_dir: str, checkpoint_dir: str,
                         available_now: bool = True,
                         n_buckets: int = 64,
                         bloom_capacity: int = 1_000_000,
                         prepare=None):
    """Continuous training-corpus growth: JSON doc files appearing in
    ``intake_dir`` (schema ``doc_id long, text string``) fold into an
    append-only corpus at ``corpus_dir`` through the incremental dedup
    path — each micro-batch is deduped intra-batch AND against ALL
    previously accepted documents via the sharded-bloom + exact-verify
    store (``datapipe/incremental.py``), so per-batch cost never grows
    with corpus size.

    Layout under ``corpus_dir``: ``docs/`` (accepted rows, parquet
    append), ``sigs/`` (signature store — the source of truth),
    ``blooms/`` (sharded bitmaps — a rebuildable cache, swapped per
    batch), ``applied/`` (batch-id markers making the fold idempotent:
    a replayed micro-batch after a crash between the checkpoint commit
    and the writes is skipped, so appends stay exactly-once).

    ``prepare``: optional callable(batch_df) -> DataFrame for gate
    stages (quality/scrub) before dedup.  Returns the StreamingQuery."""
    import os

    from ..datapipe.incremental import (
        doc_signatures, incremental_exact_dedup, merge_bloom_shards)
    from ..functions.hashing import build_bloom_sharded
    from ..schemas import empty_df

    docs_dir = os.path.join(corpus_dir, "docs")
    sigs_dir = os.path.join(corpus_dir, "sigs")
    blooms_dir = os.path.join(corpus_dir, "blooms")
    applied_dir = os.path.join(corpus_dir, "applied")
    os.makedirs(applied_dir, exist_ok=True)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 16)
        .json(intake_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(applied_dir, f"batch-{batch_id}")
        if os.path.exists(marker):      # replay after crash: already folded
            return
        batch = prepare(batch_df) if prepare is not None else batch_df
        have_hist = os.path.exists(sigs_dir)
        if have_hist:
            sigs = spark.read.parquet(sigs_dir)
            blooms = (spark.read.parquet(blooms_dir)
                      if os.path.exists(blooms_dir) else
                      build_bloom_sharded(sigs, "sig", bloom_capacity,
                                          n_buckets=n_buckets))
            fresh = incremental_exact_dedup(batch, sigs, blooms,
                                            n_buckets=n_buckets)
        else:
            fresh = incremental_exact_dedup(
                batch, empty_df(spark, "doc_id long, sig string"))
        fresh = fresh.persist()
        try:
            fresh.write.mode("append").parquet(docs_dir)
            new_sigs = doc_signatures(fresh)
            new_sigs.write.mode("append").parquet(sigs_dir)
            shards = build_bloom_sharded(new_sigs, "sig", bloom_capacity,
                                         n_buckets=n_buckets)
            if have_hist and os.path.exists(blooms_dir):
                shards = merge_bloom_shards(
                    spark.read.parquet(blooms_dir), shards)
            # blooms are a rebuildable cache: write aside, then swap
            tmp = blooms_dir + f".b{batch_id}"
            shards.write.mode("overwrite").parquet(tmp)
            import shutil
            if os.path.exists(blooms_dir):
                shutil.rmtree(blooms_dir)
            os.rename(tmp, blooms_dir)
            with open(marker, "w") as fh:
                fh.write("done")
        finally:
            fresh.unpersist()

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
