"""A/B: frontier.persist() + nf.persist() inside the cycle vs baseline."""
from __future__ import annotations

import os, sys, tempfile, time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402

T0, CFG = bench.T0, bench.CFG


def run_cycle_cached(spark, frontier_path):
    from coherencebot_spark.operators.dedup import dedup_by_phash
    from coherencebot_spark.operators.fetch import fetch
    from coherencebot_spark.operators.generate import generate
    from coherencebot_spark.operators.parse import parse, redirect_link_rows
    from coherencebot_spark.operators.updatedb import updatedb
    from coherencebot_spark.synth.world import validate_payload_rows

    frontier = spark.read.parquet(frontier_path)
    t0 = time.time()
    frontier = frontier.persist()
    frontier.count()
    fl = generate(frontier, T0, CFG, broadcast_select=True)
    log, content = fetch(fl, T0, CFG, n_images=1_000_000, n_hosts=bench.N_HOSTS)
    log = log.persist()
    content = content.persist()
    n = log.count()
    po = parse(log, content, CFG, validate_fn=validate_payload_rows
               ).unionByName(redirect_link_rows(log))
    nf = updatedb(frontier, log, po, T0, CFG, broadcast_delta=True).persist()
    nf2 = dedup_by_phash(nf, content, CFG, broadcast_content=True)
    nf2.count()
    sec = time.time() - t0
    for df in (frontier, log, content, nf):
        df.unpersist()
    return sec, n


def main():
    workdir = tempfile.mkdtemp(prefix="cbcache-")
    fp = os.path.join(workdir, "frontier")
    s = build_session(master="local[32]", shuffle_partitions=32, app_name="ab")
    bench.synthesize_frontier(s, fp)
    bench.warmup(s, fp)
    for name, fn in (("cached", run_cycle_cached),
                     ("baseline", lambda sp, p: bench.run_cycle(sp, p)),
                     ("cached2", run_cycle_cached)):
        sec, n = fn(s, fp)
        print(f"{name}: {sec:.1f}s rows={n}", flush=True)
    s.stop()


if __name__ == "__main__":
    main()
