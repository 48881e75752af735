"""One pair at local[4] vs local[16]: does staying within physical cores
recover the scaling the SMT/bandwidth wall eats at local[32]?"""
from __future__ import annotations

import os, sys, tempfile, time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402


def main():
    workdir = tempfile.mkdtemp(prefix="cbn4-")
    fp = os.path.join(workdir, "frontier")
    s = build_session(master="local[16]", shuffle_partitions=16, app_name="synth")
    bench.synthesize_frontier(s, fp)
    s.stop()
    out = {}
    for n in (16, 4):
        s = build_session(master=f"local[{n}]", shuffle_partitions=max(n, 8),
                          app_name=f"n4-{n}")
        bench.warmup(s, fp)
        sec, counts = bench.run_cycle(s, fp)
        out[n] = sec
        print(f"local[{n}]: {sec:.1f}s", flush=True)
        s.stop()
    eff = (out[4] / out[16]) / 4
    print(f"raw efficiency 4->16: {eff:.3f}")


if __name__ == "__main__":
    main()
