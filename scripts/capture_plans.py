"""Capture .explain('formatted') for declared queries into plans/r06/.

Usage:
  python scripts/capture_plans.py after  q1 q2 ...   # current tree
  python scripts/capture_plans.py before q1 q2 ...   # round-start tree
                                                     # (env BEFORE_TREE)

The 'before' mode expects BEFORE_TREE to point at an exported checkout of
the round-start commit (git archive fb7d1ea).  Queries run at sf0.01 so
plans are cheap; plan SHAPE (Exchange count, join strategy, Python eval
nodes, PushedFilters) is scale-independent.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

mode = sys.argv[1]
queries = sys.argv[2:]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
tree = os.environ.get("BEFORE_TREE", "/tmp/r6_before_tree") \
    if mode == "before" else repo
sys.path.insert(0, tree)

import __spark_entry__ as entry  # noqa: E402
from coherencebot_spark.session import build_session  # noqa: E402

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(repo, "plans", "r06")
os.makedirs(OUT, exist_ok=True)

spark = build_session(master="local[8]", shuffle_partitions=8,
                      app_name=f"plans-{mode}")
qs = entry.queries()
for name in queries:
    df = qs[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{mode}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} chars)")
spark.stop()
