"""Crawl CLI — the `bin/crawl` analogue, spark-submit-able.

    spark-submit --py-files dist/coherencebot_spark.zip \
        scripts/run_crawl.py --workdir /data/crawl --seeds seeds.txt \
        --cycles 10 --topn 50000 --num-partitions 64

In the sandbox:  python scripts/run_crawl.py --workdir /tmp/crawl \
    --synthetic-seeds 200 --cycles 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", help="seed text file/dir (url\\tk=v per line)")
    ap.add_argument("--synthetic-seeds", type=int, default=0,
                    help="generate N synthetic seed lines instead")
    ap.add_argument("--cycles", type=int, default=1)
    ap.add_argument("--topn", type=int, default=50_000)
    ap.add_argument("--num-partitions", type=int, default=2)
    ap.add_argument("--max-count", type=int, default=-1)
    ap.add_argument("--cycle-minutes", type=int, default=60)
    ap.add_argument("--t0", type=int, default=1_700_000_000_000,
                    help="epoch-ms clock origin (injected, deterministic)")
    ap.add_argument("--n-hosts", type=int, default=1000)
    # bucketed/MERGE frontier commits are the production default (cycle
    # cost ∝ touched buckets — the 10^10 posture; wall-clocked in
    # BENCH.md r4: a 5%-touched cycle costs 60-71s vs 82s full on the
    # same input, byte-identical results).  --full-rewrite keeps the
    # whole-frontier rewrite for small crawls / A-B runs.
    ap.add_argument("--bucketed", action="store_true", default=True,
                    help="MERGE-style frontier commits: cycle cost ∝ "
                         "touched buckets (the 10^10 mode; DEFAULT)")
    ap.add_argument("--full-rewrite", dest="bucketed",
                    action="store_false",
                    help="rewrite the full frontier every cycle "
                         "(reference CrawlDb-update semantics at small "
                         "scale)")
    ap.add_argument("--hostdb-every", type=int, default=1,
                    help="update hostdb every N cycles (0 = never; "
                         "ref src/bin/crawl --hostdbupdate)")
    ap.add_argument("--use-url-seen", action="store_true",
                    help="sharded-bloom URL-seen accel (shards refresh "
                         "per cycle when additions are allowed)")
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="after the run, expire all but the last N "
                         "snapshots per table (0 = keep everything)")
    ap.add_argument("--dedup-phash-meta", action="store_true",
                    help="cross-cycle whole-db dedup on the metadata-"
                         "recorded img.phash (ref bin/crawl dedup step)")
    ap.add_argument("--threads-per-queue", type=int, default=1,
                    help="fetcher.threads.per.queue: k in-flight slots "
                         "per host, minCrawlDelay spacing per batch")
    ap.add_argument("--feed-url", help="HTTP collection-API feed endpoint "
                                       "(pulled before every cycle; needs "
                                       "network outside the sandbox)")
    ap.add_argument("--feed-every", type=int, default=1)
    ap.add_argument("--normalise-on-generate", action="store_true",
                    help="re-normalize frontier urls at every generate "
                         "(generate.normalise; needed only after "
                         "normalizer-rule changes)")
    ap.add_argument("--index", choices=["bulk", "json", "solr"],
                    help="index each cycle's segment through the "
                         "IndexingFilter chain into this file sink "
                         "(ref bin/crawl --index)")
    ap.add_argument("--analyze", action="store_true",
                    help="per-cycle segment dump + crawl-completion stats "
                         "under <workdir>/analysis (ref bin/crawl "
                         "--analyze)")
    args = ap.parse_args()

    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.plans.cycle import CrawlDriver
    from coherencebot_spark.session import build_session
    from coherencebot_spark.sources.seeds import read_seed_files

    spark = build_session(app_name="coherencebot-crawl")
    cfg = DEFAULT.with_(topn=args.topn, num_partitions=args.num_partitions,
                        max_count=args.max_count,
                        hostdb_every=args.hostdb_every,
                        use_url_seen=args.use_url_seen,
                        dedup_phash_meta=args.dedup_phash_meta,
                        threads_per_queue=args.threads_per_queue,
                        normalise_on_generate=args.normalise_on_generate)
    driver = CrawlDriver(spark, args.workdir, cfg, n_hosts=args.n_hosts,
                         bucketed=args.bucketed, index_sink=args.index,
                         analyze=args.analyze)

    if args.seeds:
        seeds = read_seed_files(spark, args.seeds)
    elif args.synthetic_seeds:
        from coherencebot_spark.schemas import SEEDS
        from coherencebot_spark.synth.world import gen_seed_lines
        seeds = spark.createDataFrame(
            gen_seed_lines(args.synthetic_seeds, args.n_hosts), SEEDS)
    else:
        seeds = None

    if seeds is not None and not driver.frontier.exists():
        sid = driver.inject(seeds, args.t0)
        print(f"injected → frontier snapshot {sid}")

    feed = None
    if args.feed_url:
        import urllib.request

        from coherencebot_spark.sources.seeds import FeedInjector

        def http_get(url, api_key):
            req = urllib.request.Request(
                url, headers={"x-api-key": api_key} if api_key else {})
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.read().decode("utf-8")

        feed = FeedInjector(args.feed_url, http_get=http_get)

    t = time.time()
    metrics = driver.run(args.cycles, args.t0 + 1000,
                         cycle_ms=args.cycle_minutes * 60_000,
                         feed=feed, feed_every=args.feed_every)
    for m in metrics:
        print(json.dumps(m.as_dict()))
    print(f"{len(metrics)} cycles in {time.time()-t:.1f}s")
    if args.expire_keep > 0:
        removed = sum(
            tbl.expire_snapshots(keep_last=args.expire_keep)
            for tbl in (driver.frontier, driver.fetch_log, driver.content,
                        driver.linkdb, driver.hostdb)
        )
        print(f"expired {removed} snapshot dirs (keep_last="
              f"{args.expire_keep}; merge parents retained)")
    spark.stop()


if __name__ == "__main__":
    main()
