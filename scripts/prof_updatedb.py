"""Isolate updatedb scaling: interleaved reps at local[8]/local[32] + config variants."""
from __future__ import annotations

import json, os, sys, tempfile, time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402

T0, CFG = bench.T0, bench.CFG


def prep(spark, fp, outdir):
    """Materialize fetchlist/log/parse_out to parquet so updatedb timing is pure."""
    from coherencebot_spark.operators.fetch import fetch
    from coherencebot_spark.operators.generate import generate
    from coherencebot_spark.operators.parse import parse, redirect_link_rows

    frontier = spark.read.parquet(fp)
    fl = generate(frontier, T0, CFG)
    log, content = fetch(fl, T0, CFG, payload_batch_fn=bench.tiny_payload_batch,
                         n_images=1_000_000, n_hosts=bench.N_HOSTS)
    log.write.mode("overwrite").parquet(os.path.join(outdir, "log"))
    content.persist()
    log = spark.read.parquet(os.path.join(outdir, "log"))
    po = parse(log, content, CFG).unionByName(redirect_link_rows(log))
    po.write.mode("overwrite").parquet(os.path.join(outdir, "po"))
    content.unpersist()


def run_updatedb(spark, fp, outdir):
    from coherencebot_spark.operators.updatedb import updatedb

    frontier = spark.read.parquet(fp)
    log = spark.read.parquet(os.path.join(outdir, "log"))
    po = spark.read.parquet(os.path.join(outdir, "po"))
    t = time.time()
    n = updatedb(frontier, log, po, T0, CFG).count()
    return round(time.time() - t, 2), n


def main():
    workdir = tempfile.mkdtemp(prefix="cbprofu-")
    fp = os.path.join(workdir, "frontier")
    s = build_session(master="local[32]", shuffle_partitions=32, app_name="prep")
    bench.synthesize_frontier(s, fp)
    prep(s, fp, workdir)
    s.stop()

    variants = [
        ("32c/sp32", "local[32]", 32, {}),
        ("8c/sp8", "local[8]", 8, {}),
        ("32c/sp128", "local[32]", 128, {}),
        ("32c/sp32/noCoalesce", "local[32]", 32,
         {"spark.sql.adaptive.coalescePartitions.enabled": "false"}),
        ("32c/sp32/noCodegen", "local[32]", 32,
         {"spark.sql.codegen.wholeStage": "false"}),
    ]
    out = {}
    for name, master, sp, conf in variants:
        s = build_session(master=master, shuffle_partitions=sp,
                          app_name=name.replace("/", "-"), extra_conf=conf)
        secs = [run_updatedb(s, fp, workdir)[0] for _ in range(2)]
        out[name] = secs
        s.stop()
        print(json.dumps({name: secs}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
