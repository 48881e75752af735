"""Measure the SERIAL (non-scaling) components of the cycle at local[32]:
driver-side Catalyst planning, robots broadcast, per-action overhead."""
from __future__ import annotations

import json, os, sys, tempfile, time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402

T0, CFG = bench.T0, bench.CFG


def main():
    from coherencebot_spark.operators.dedup import dedup_by_phash
    from coherencebot_spark.operators.fetch import fetch, resolve_robots
    from coherencebot_spark.operators.generate import generate
    from coherencebot_spark.operators.parse import parse, redirect_link_rows
    from coherencebot_spark.operators.updatedb import updatedb

    workdir = tempfile.mkdtemp(prefix="cbser-")
    fp = os.path.join(workdir, "frontier")
    spark = build_session(master="local[32]", shuffle_partitions=32, app_name="serial")
    bench.synthesize_frontier(spark, fp)
    bench.warmup(spark, fp)
    out = {}

    frontier = spark.read.parquet(fp)

    # 1. DAG construction (pure python driver code)
    t = time.time()
    fl = generate(frontier, T0, CFG)
    log, content = fetch(fl, T0, CFG, payload_batch_fn=bench.tiny_payload_batch,
                         n_images=1_000_000, n_hosts=bench.N_HOSTS)
    out["dag_build_to_fetch"] = round(time.time() - t, 2)

    # 2. Catalyst planning for the fetch-log action
    t = time.time()
    log._jdf.queryExecution().executedPlan()
    out["plan_fetch_log"] = round(time.time() - t, 2)

    # 3. robots resolution alone (distinct + mapInPandas + collect-for-broadcast)
    t = time.time()
    resolve_robots(fl, CFG).count()
    out["robots_job"] = round(time.time() - t, 2)

    log = log.persist()
    t = time.time()
    log.count()
    out["fetch_log_exec"] = round(time.time() - t, 2)
    content = content.persist()
    t = time.time()
    content.count()
    out["content_exec"] = round(time.time() - t, 2)

    # 4. DAG + planning for updatedb (the giant cascade)
    t = time.time()
    po = parse(log, content, CFG).unionByName(redirect_link_rows(log))
    nf = updatedb(frontier, log, po, T0, CFG)
    nf = dedup_by_phash(nf, content, CFG)
    out["dag_build_updatedb"] = round(time.time() - t, 2)

    t = time.time()
    nf._jdf.queryExecution().executedPlan()
    out["plan_updatedb"] = round(time.time() - t, 2)

    t = time.time()
    nf.count()
    out["updatedb_exec"] = round(time.time() - t, 2)

    # 5. empty-job roundtrip (scheduler overhead floor)
    t = time.time()
    spark.range(32).count()
    out["empty_job"] = round(time.time() - t, 3)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
