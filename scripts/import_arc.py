"""Import legacy ARC archives into a crawl workdir.

The reference's ``bin/nutch org.apache.nutch.tools.arc.ArcSegmentCreator``
turns ARC files into a segment that a subsequent updatedb merges into the
crawldb.  This CLI does both in one shot against the engine's
snapshot-table workdir:

    python scripts/import_arc.py --arcs /path/to/arcs \\
        --workdir /path/to/crawl [--t0 <epoch_ms>]

Writes the segment (fetch_log + content snapshots tagged
``arc-import@t0``) and commits a merged frontier snapshot, so a
subsequent ``run_crawl.py --workdir ...`` resumes with the imported pages
already FETCHED.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arcs", required=True, help="ARC file/dir/glob")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--t0", type=int, default=1_700_000_000_000,
                    help="fetch_time to stamp (epoch ms, deterministic)")
    args = ap.parse_args()

    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.plans.cycle import CrawlDriver
    from coherencebot_spark.operators.updatedb import updatedb
    from coherencebot_spark.session import build_session
    from coherencebot_spark.sources.arc import arc_to_segment, read_arc

    spark = build_session(app_name="coherencebot-arc-import")
    d = CrawlDriver(spark, args.workdir, DEFAULT)
    flog, content = arc_to_segment(read_arc(spark, args.arcs), args.t0)
    flog = flog.persist()
    n = flog.count()
    tag = f"arc-import@{args.t0}"
    d.fetch_log.write(flog, cycle_id=tag)
    d.content.write(content, cycle_id=tag)
    if d.frontier.exists():
        frontier = d.frontier.read(spark).drop("bucket")
    else:
        frontier = spark.createDataFrame([], flog.drop("proto_status",
                                                       "redirect_to").schema)
    merged = updatedb(frontier, flog, None, args.t0, DEFAULT)
    d._write_frontier(merged, cycle_id=tag)
    size = d.frontier.read(spark).count()
    flog.unpersist()
    print(json.dumps({"imported_records": n, "frontier_size": size,
                      "cycle_id": tag}))
    spark.stop()


if __name__ == "__main__":
    main()
