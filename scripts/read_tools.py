"""Reader-tools CLI — the ``bin/nutch readdb | readhostdb | readseg``
analogues over a crawl workdir (SnapshotTable layout written by
``scripts/run_crawl.py``).

    python scripts/read_tools.py readdb  --workdir /tmp/crawl --stats
    python scripts/read_tools.py readdb  --workdir /tmp/crawl --topn 10
    python scripts/read_tools.py readdb  --workdir /tmp/crawl --dump --status 2
    python scripts/read_tools.py readdb  --workdir /tmp/crawl --url https://...
    python scripts/read_tools.py readhostdb --workdir /tmp/crawl --dump \
        --expr 'fetched > 0 && dns_failures == 0'
    python scripts/read_tools.py readhostdb --workdir /tmp/crawl --get host42
    python scripts/read_tools.py readseg --workdir /tmp/crawl --list
    python scripts/read_tools.py readseg --workdir /tmp/crawl --protostats
    python scripts/read_tools.py clean   --workdir /tmp/crawl
    python scripts/read_tools.py clean   --workdir /tmp/crawl \
        --out /tmp/deletes --solr

Each prints JSON lines (the ``-dump json`` flavor of the reference tools).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_OUT_DIR: str | None = None


def _emit(df, limit: int | None = None, name: str | None = None) -> None:
    if _OUT_DIR:
        # distributed write — nothing funnels through the driver.  A
        # multi-result command (readdb --stats) writes each result to its
        # own subdir so the second write can't clobber the first.
        target = os.path.join(_OUT_DIR, name) if name else _OUT_DIR
        df.write.mode("overwrite").json(target)
        return
    it = df.toJSON().toLocalIterator()
    n = 0
    for line in it:
        print(line)
        n += 1
        if limit is not None and n >= limit:
            break


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tool", choices=["readdb", "readhostdb", "readseg",
                                     "clean"])
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--topn", type=int)
    ap.add_argument("--dump", action="store_true")
    ap.add_argument("--status", type=int)
    ap.add_argument("--regex")
    ap.add_argument("--expr", help="SQL/JEXL filter expression")
    ap.add_argument("--url", help="readdb point lookup")
    ap.add_argument("--get", help="readhostdb host point lookup")
    ap.add_argument("--hostnames", action="store_true")
    ap.add_argument("--list", dest="do_list", action="store_true")
    ap.add_argument("--protostats", action="store_true",
                    help="per-proto-status counts over the latest segment")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap printed rows (0 = all)")
    ap.add_argument("--solr", action="store_true",
                    help="clean: write deletes as solr-xml parts (needs "
                         "--out)")
    ap.add_argument("--out", help="write result as json parts to this dir "
                                  "instead of printing (distributed — the "
                                  "right mode for a 10^10-row dump; the "
                                  "reference likewise dumps to HDFS)")
    args = ap.parse_args()

    from coherencebot_spark.session import build_session
    from coherencebot_spark.sources.snapshot import SnapshotTable

    global _OUT_DIR
    _OUT_DIR = args.out
    spark = build_session(app_name=f"cb-{args.tool}")
    limit = args.limit or None

    if args.tool == "readdb":
        from coherencebot_spark.operators import readdb

        frontier = SnapshotTable(
            os.path.join(args.workdir, "frontier"), "frontier"
        ).read(spark).drop("bucket")
        if args.stats:
            s = readdb.stats(frontier)
            _emit(s["global"], name="global")
            _emit(readdb.status_names(s["by_status"]), name="by_status")
        elif args.topn:
            _emit(readdb.topn(frontier, args.topn))
        elif args.url:
            _emit(readdb.url_lookup(frontier, args.url))
        else:
            _emit(readdb.dump(frontier, status=args.status, regex=args.regex,
                              expr=args.expr).drop("signature"), limit)
    elif args.tool == "readhostdb":
        from coherencebot_spark.operators import readhostdb

        hostdb = SnapshotTable(
            os.path.join(args.workdir, "hostdb"), "hostdb").read(spark)
        if args.get:
            _emit(readhostdb.get(hostdb, args.get))
        elif args.stats:
            _emit(readhostdb.stats(hostdb, expr=args.expr))
        elif args.hostnames:
            _emit(readhostdb.hostnames(hostdb, expr=args.expr), limit)
        else:
            _emit(readhostdb.dump(hostdb, expr=args.expr), limit)
    elif args.tool == "clean":
        # bin/nutch clean: whole-db gone/duplicate scan -> delete actions
        # (CleaningJob.java).  With --out + --solr the deletes land as
        # POST-able <delete> XML parts; otherwise JSON delete rows.
        from coherencebot_spark.sources.sinks import cleaning_job, \
            write_solr_xml

        frontier = SnapshotTable(
            os.path.join(args.workdir, "frontier"), "frontier"
        ).read(spark).drop("bucket")
        deletes = cleaning_job(frontier)
        if args.out and args.solr:
            write_solr_xml(deletes, args.out)
        else:
            _emit(deletes, limit)
    else:  # readseg
        from coherencebot_spark.operators.readseg import (
            protocol_status_statistics, segment_list,
        )

        log = SnapshotTable(
            os.path.join(args.workdir, "fetch_log"), "fetch_log").read(spark)
        if args.protostats:
            _emit(protocol_status_statistics(log))
        else:
            _emit(segment_list(log))
    spark.stop()


if __name__ == "__main__":
    main()
