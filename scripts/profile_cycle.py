"""Profile the crawl cycle phase-by-phase at two parallelism levels.

Times each phase with a persist+count barrier so we can attribute wall time,
at local[8] and local[32], to find the non-scaling (serial) component.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402

T0 = bench.T0
CFG = bench.CFG


def profile(spark, frontier_path):
    from coherencebot_spark.operators.dedup import dedup_by_phash
    from coherencebot_spark.operators.fetch import fetch
    from coherencebot_spark.operators.generate import generate, _gates, _with_partition, _with_hostordomain
    from coherencebot_spark.operators.parse import parse, redirect_link_rows
    from coherencebot_spark.operators.updatedb import updatedb

    frontier = spark.read.parquet(frontier_path)
    out = {}

    t = time.time()
    g = _gates(frontier, T0, CFG, None)
    g.count()
    out["gates"] = round(time.time() - t, 2)

    t = time.time()
    p = _with_partition(g, CFG)
    p = _with_hostordomain(p, CFG)
    p.count()
    out["gates+partition"] = round(time.time() - t, 2)

    t = time.time()
    fl = generate(frontier, T0, CFG).persist()
    nfl = fl.count()
    out["generate_full"] = round(time.time() - t, 2)

    t = time.time()
    log, content = fetch(fl, T0, CFG, payload_batch_fn=bench.tiny_payload_batch,
                         n_images=1_000_000, n_hosts=bench.N_HOSTS)
    log = log.persist()
    nlog = log.count()
    out["fetch_log"] = round(time.time() - t, 2)

    t = time.time()
    content = content.persist()
    content.count()
    out["fetch_content"] = round(time.time() - t, 2)

    t = time.time()
    po = parse(log, content, CFG).unionByName(redirect_link_rows(log)).persist()
    po.count()
    out["parse"] = round(time.time() - t, 2)

    t = time.time()
    nf = updatedb(frontier, log, po, T0, CFG).persist()
    nf.count()
    out["updatedb"] = round(time.time() - t, 2)

    t = time.time()
    nf2 = dedup_by_phash(nf, content, CFG)
    nf2.count()
    out["dedup_phash"] = round(time.time() - t, 2)

    for df in (fl, log, content, po, nf):
        df.unpersist()
    out["_fetchlist_rows"] = nfl
    out["_log_rows"] = nlog
    return out


def main():
    workdir = tempfile.mkdtemp(prefix="cbprof-")
    fp = os.path.join(workdir, "frontier")
    s = build_session(master="local[32]", shuffle_partitions=32, app_name="prof-synth")
    bench.synthesize_frontier(s, fp)
    s.stop()

    results = {}
    for n in (int(x) for x in os.environ.get("PROF_LEVELS", "32,8").split(",")):
        s = build_session(master=f"local[{n}]", shuffle_partitions=max(n, 8),
                          app_name=f"prof-{n}")
        bench.warmup(s, fp)
        results[n] = profile(s, fp)
        s.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
