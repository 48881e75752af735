"""Event-log-based stage profile of one bench cycle: which stages don't
scale from local[8] to local[32]?  Parses the Spark event log for stage
wall time, task count, and total executor CPU."""
from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402


def run_level(n, fp, evdir):
    s = build_session(
        master=f"local[{n}]", shuffle_partitions=max(n, 8),
        app_name=f"stprof-{n}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    bench.warmup(s, fp)
    t = time.time()
    sec, counts = bench.run_cycle(s, fp)
    app_id = s.sparkContext.applicationId
    s.stop()
    return sec, app_id


def parse_events(evdir, app_id, min_wall=0.2):
    cands = glob.glob(os.path.join(evdir, "*" + app_id + "*")) or sorted(
        glob.glob(os.path.join(evdir, "*")), key=os.path.getmtime)
    path = cands[-1]
    if os.path.isdir(path):  # Spark 4 rolling event log dir
        files = sorted(glob.glob(os.path.join(path, "events*")))
    else:
        files = [path]
    stages = {}

    def lines():
        for fn in files:
            with open(fn) as f:
                yield from f

    acc = {}
    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                a = acc.setdefault(sid, {"run": 0, "cpu": 0, "gc": 0,
                                         "pyt": 0, "ser": 0, "shuf": 0})
                a["run"] += tm.get("Executor Run Time", 0)
                a["cpu"] += tm.get("Executor CPU Time", 0) / 1e6
                a["gc"] += tm.get("JVM GC Time", 0)
                a["ser"] += tm.get("Result Serialization Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                a["shuf"] += sr.get("Fetch Wait Time", 0)
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                # pull a human operator name out of the RDD scope chain
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            scopes.append(json.loads(sc).get("name", ""))
                        except json.JSONDecodeError:
                            pass
                stages[sid] = {
                    "wall": round((comp - sub) / 1000, 2),
                    "tasks": si.get("Number of Tasks"),
                    "name": ",".join(dict.fromkeys(scopes))[:70],
                }
    out = []
    for sid, v in sorted(stages.items()):
        if v["wall"] < min_wall:
            continue
        a = acc.get(sid, {})
        out.append({
            "sid": sid, **v,
            "run_s": round(a.get("run", 0) / 1000, 1),
            "cpu_s": round(a.get("cpu", 0) / 1000, 1),
            "gc_s": round(a.get("gc", 0) / 1000, 1),
            "shufwait_s": round(a.get("shuf", 0) / 1000, 1),
        })
    return out


def main():
    workdir = tempfile.mkdtemp(prefix="cbst-")
    evdir = os.path.join(workdir, "ev")
    os.makedirs(evdir)
    fp = os.path.join(workdir, "frontier")
    s = build_session(master="local[32]", shuffle_partitions=32, app_name="synth")
    bench.synthesize_frontier(s, fp)
    s.stop()

    for n in (32, 8):
        sec, app_id = run_level(n, fp, evdir)
        st = parse_events(evdir, app_id)
        total = round(sum(x["wall"] for x in st), 1)
        print(f"=== local[{n}]  cycle={sec:.1f}s  sum_stage_wall={total}s ===")
        for x in sorted(st, key=lambda x: -x["wall"])[:15]:
            print(f"  wall={x['wall']:7.2f}s run={x['run_s']:7.1f}s "
                  f"cpu={x['cpu_s']:7.1f}s gc={x['gc_s']:6.1f}s "
                  f"shufwait={x['shufwait_s']:5.1f}s tasks={x['tasks']:4d} "
                  f"s{x['sid']:<4d} {x['name']}")


if __name__ == "__main__":
    main()
