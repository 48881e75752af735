"""Auxiliary measurement harness for the optimization round (guide §1).

``bench.py`` is FROZEN for driver measurement; this file carries the
iteration benches: per-phase timings of the bucketed MERGE headline cycle,
the r2 full-rewrite cycle, and the micro-op suite — with the noop-sink
isolation and job labels the guide prescribes.  Numbers from here are
cited in OPTIMIZATION_r06.md; the driver's record still comes from the
round-start bench.py.

Usage: python bench_extra.py [bucketed|cycle|micro|all] ...
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen; reused read-only)
from coherencebot_spark.session import build_session  # noqa: E402

CPUS = bench.CPUS
T0 = bench.T0


def _stream_probe(n: int = 8) -> float:
    """Machine-mode probe (bench._stream): seconds for an n-proc triad
    pass — attributes a slow wall-clock to VM degradation vs the code."""
    import multiprocessing as mp
    t = time.time()
    with mp.Pool(n) as p:
        p.map(bench._stream, range(n))
    return round(time.time() - t, 2)


def bucketed_phase(due_buckets: int = 13, modes=("full", "merge"),
                   event_logs: bool = False) -> dict:
    """bench.bench_bucketed, but returning per-phase CycleMetrics.timings."""
    from coherencebot_spark.plans.cycle import CrawlDriver

    cfg = bench.CFG.with_(
        max_count=200, ignore_external_links=True,
        use_url_seen=True, broadcast_small_sides=True,
    )
    base = tempfile.mkdtemp(prefix="cbspark-bx-bucketed-")
    evdir = os.path.join(base, "events")
    os.makedirs(evdir, exist_ok=True)
    frontier_path = os.path.join(base, "frontier_src")
    spark = build_session(master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          app_name="bx-bucketed-synth")
    bench.synthesize_frontier(spark, frontier_path,
                              due_bucket_count=due_buckets,
                              n_buckets=int(cfg.host_buckets))
    bench.warmup(spark, frontier_path)
    spark.stop()

    out = {}
    for mode in modes:
        extra = {}
        if event_logs:
            extra = {"spark.eventLog.enabled": "true",
                     "spark.eventLog.dir": evdir,
                     "spark.eventLog.compress": "false",
                     "spark.eventLog.rolling.enabled": "false"}
        probe = _stream_probe()
        s = build_session(master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          app_name=f"bx-bucketed-{mode}",
                          extra_conf=extra)
        wd = os.path.join(base, f"{mode}-0")
        d = CrawlDriver(s, wd, cfg, bucketed=(mode == "merge"),
                        backend=bench.all_success_backend,
                        n_hosts=bench.N_HOSTS, payload_partitions=256)
        src = s.read.parquet(frontier_path)
        d._write_frontier(src, cycle_id="seed",
                          metrics={"frontier_size": bench.N_FRONTIER})
        d._load_or_build_blooms()
        t0 = time.time()
        m = d.run_cycle(0, T0 + 1000)
        sec = round(time.time() - t0, 3)
        app_id = s.sparkContext.applicationId
        out[mode] = {"total_sec": sec, "timings": m.timings,
                     "generated": m.generated,
                     "frontier_size": m.frontier_size,
                     "stream_probe_s": probe}
        print(f"[bucketed:{mode}] {sec}s probe={probe}s "
              f"timings={json.dumps(m.timings)}", flush=True)
        s.stop()
        if event_logs:
            stages = _top_stages(evdir, app_id)
            out[mode]["top_stages"] = stages
            for st in stages:
                print(f"  stage {st}", flush=True)
        shutil.rmtree(wd, ignore_errors=True)
    if event_logs:
        shutil.rmtree("/tmp/bx_events", ignore_errors=True)
        shutil.copytree(evdir, "/tmp/bx_events")
    shutil.rmtree(base, ignore_errors=True)
    return out


def _top_stages(evdir: str, app_id: str, k: int = 30) -> list:
    import glob
    cands = glob.glob(os.path.join(evdir, "*" + app_id + "*"))
    if not cands:
        return []
    path = sorted(cands, key=os.path.getmtime)[-1]
    files = (sorted(glob.glob(os.path.join(path, "events*")))
             if os.path.isdir(path) else [path])
    stages, stage_desc = [], {}
    tm: dict = {}
    for fn in files:
        with open(fn) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    for sid in ev.get("Stage IDs", []):
                        stage_desc[sid] = desc
                elif kind == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    t = tm.setdefault(sid, {"run": 0.0, "gc": 0.0,
                                            "srf": 0.0, "max": 0.0,
                                            "inp": 0, "sr": 0, "sw": 0,
                                            "pyser": 0.0})
                    mt = ev.get("Task Metrics") or {}
                    run = mt.get("Executor Run Time", 0) / 1000.0
                    t["run"] += run
                    t["max"] = max(t["max"], run)
                    t["gc"] += mt.get("JVM GC Time", 0) / 1000.0
                    t["srf"] += (mt.get("Shuffle Read Metrics", {})
                                 .get("Fetch Wait Time", 0)) / 1000.0
                    t["inp"] += (mt.get("Input Metrics", {})
                                 .get("Bytes Read", 0))
                    t["sr"] += (mt.get("Shuffle Read Metrics", {})
                                .get("Remote Bytes Read", 0)
                                + mt.get("Shuffle Read Metrics", {})
                                .get("Local Bytes Read", 0))
                    t["sw"] += (mt.get("Shuffle Write Metrics", {})
                                .get("Shuffle Bytes Written", 0))
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    t0, t1 = si.get("Submission Time"), si.get("Completion Time")
                    if not (t0 and t1):
                        continue
                    stages.append({
                        "id": si["Stage ID"],
                        "wall_s": round((t1 - t0) / 1000.0, 2),
                        "tasks": si.get("Number of Tasks"),
                        "name": si.get("Stage Name", "")[:48]})
    for st in stages:
        st["job"] = stage_desc.get(st["id"], "")[:40]
        t = tm.get(st["id"], {})
        if t:
            st["cpu_s"] = round(t["run"], 1)
            st["max_task_s"] = round(t["max"], 1)
            st["gc_s"] = round(t["gc"], 1)
            st["fetchwait_s"] = round(t["srf"], 1)
            st["input_mb"] = round(t["inp"] / 1e6, 1)
            st["shuf_r_mb"] = round(t["sr"] / 1e6, 1)
            st["shuf_w_mb"] = round(t["sw"] / 1e6, 1)
    stages.sort(key=lambda x: -x["wall_s"])
    return stages[:k]


def cycle_phase(event_logs: bool = False) -> dict:
    """The r2 full-rewrite headline cycle at local[CPUS] (bench.run_cycle)."""
    workdir = tempfile.mkdtemp(prefix="cbspark-bx-cycle-")
    frontier_path = os.path.join(workdir, "frontier")
    evdir = os.path.join(workdir, "events")
    os.makedirs(evdir, exist_ok=True)
    extra = {}
    if event_logs:
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": evdir,
                 "spark.eventLog.compress": "false",
                 "spark.eventLog.rolling.enabled": "false"}
    probe = _stream_probe()
    spark = build_session(master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          app_name="bx-cycle", extra_conf=extra)
    bench.synthesize_frontier(spark, frontier_path)
    bench.warmup(spark, frontier_path)
    sec, counts = bench.run_cycle(spark, frontier_path)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    out = {"cycle_sec": round(sec, 3), "stream_probe_s": probe, **counts}
    print(f"[cycle] {json.dumps(out)}", flush=True)
    if event_logs:
        for st in _top_stages(evdir, app_id):
            print(f"  stage {st}", flush=True)
        shutil.rmtree("/tmp/bx_cycle_events", ignore_errors=True)
        shutil.copytree(evdir, "/tmp/bx_cycle_events")
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def scale_leg(n: int) -> dict:
    """One scaling leg (local[n]) of the bench's scaling pair."""
    workdir = tempfile.mkdtemp(prefix="cbspark-bx-scale-")
    frontier_path = os.path.join(workdir, "frontier")
    s0 = build_session(master=f"local[{CPUS}]",
                       shuffle_partitions=max(CPUS, 8),
                       app_name="bx-scale-synth")
    bench.synthesize_frontier(s0, frontier_path)
    s0.stop()
    scale_cfg = bench.CFG.with_(topn=bench.SCALE_TOPN)
    s = build_session(master=f"local[{n}]", shuffle_partitions=max(n, 8),
                      app_name=f"bx-scale-{n}")
    bench.warmup(s, frontier_path)
    sec, counts = bench.run_cycle(s, frontier_path, scale_cfg)
    s.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    out = {"cores": n, "cycle_sec": round(sec, 3), **counts}
    print(f"[scale] {json.dumps(out)}", flush=True)
    return out


def micro_phase() -> dict:
    workdir = tempfile.mkdtemp(prefix="cbspark-bx-micro-")
    frontier_path = os.path.join(workdir, "frontier")
    spark = build_session(master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS, 8),
                          app_name="bx-micro")
    bench.synthesize_frontier(spark, frontier_path)
    bench.warmup(spark, frontier_path)
    out = bench.bench_ops(spark, frontier_path)
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    print(f"[micro] {json.dumps(out)}", flush=True)
    return out


def main() -> None:
    phases = sys.argv[1:] or ["bucketed"]
    results = {}
    for p in phases:
        if p == "bucketed":
            results[p] = bucketed_phase()
        elif p == "bucketed-ev":
            results["bucketed"] = bucketed_phase(modes=("merge",),
                                                 event_logs=True)
        elif p == "bucketed-merge-only":
            results["bucketed"] = bucketed_phase(modes=("merge",))
        elif p == "cycle":
            results[p] = cycle_phase()
        elif p == "cycle-ev":
            results["cycle"] = cycle_phase(event_logs=True)
        elif p == "micro":
            results[p] = micro_phase()
        elif p.startswith("scale"):
            results[p] = scale_leg(int(p.split(":")[1]))
        elif p == "all":
            results["bucketed"] = bucketed_phase()
            results["cycle"] = cycle_phase()
            results["micro"] = micro_phase()
    print("RESULT " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
