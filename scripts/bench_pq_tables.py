"""A/B the PQ ADC-table build at eval scale (VERDICT r4 #2 done-check).

The per-query lookup tables are built driver-side from the collected
query block.  r4 built them with a per-query Python triple loop — the
last driver-side per-query bottleneck; r5 routes query counts past 1024
through one numpy einsum.  This script times BOTH routes at >=10k
queries on the same synthetic corpus and prints one JSON line:

  {"n_queries": N, "loop_build_s": ..., "einsum_build_s": ...,
   "speedup": ..., "end_to_end_einsum_s": ...}

`build` time = driver-side plan construction (collect + table build);
the distributed scoring job itself is identical between routes.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coherencebot_spark.datapipe.similarity import (  # noqa: E402
    cosine_topk_pq, pq_train)
from coherencebot_spark.session import build_session  # noqa: E402

# the A/B isolates the DRIVER-side table build (∝ n_queries); the corpus
# stays modest so the end-to-end check (10k queries × corpus crossJoin
# through the ADC window) is minutes, not the point of the measurement
N_VEC = int(os.environ.get("PQ_AB_VECTORS", "10000"))
N_Q = int(os.environ.get("PQ_AB_QUERIES", "10000"))
DIM, M, KC = 32, 4, 256


def main() -> None:
    spark = build_session(master="local[16]", shuffle_partitions=16,
                          app_name="pq-ab")
    vecs = spark.range(N_VEC).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda i: (F.xxhash64(F.col("id"), i) % 1000)
                    .cast("double")).alias("embedding")).persist()
    vecs.count()
    queries = spark.range(N_Q).select(
        F.col("id").alias("query_id"),
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda i: (F.xxhash64(F.col("id") + 7_000_000, i) % 1000)
                    .cast("double")).alias("embedding")).persist()
    queries.count()
    books = pq_train(vecs, m=M, n_centroids=KC, sample=16384, iters=2)

    def build(threshold: int) -> float:
        t = time.time()
        df = cosine_topk_pq(vecs, queries, k=5, codebooks=books,
                            route="pandas", _table_threshold=threshold)
        sec = time.time() - t
        return sec, df

    loop_s, _ = build(10 ** 9)       # force the r4 per-query loop
    einsum_s, df = build(1024)       # r5 default: einsum past 1024
    t = time.time()
    n = df.count()
    e2e = time.time() - t
    print(json.dumps({
        "n_vectors": N_VEC, "n_queries": N_Q, "m": M, "n_centroids": KC,
        "loop_build_s": round(loop_s, 2),
        "einsum_build_s": round(einsum_s, 2),
        "speedup": round(loop_s / einsum_s, 1),
        "end_to_end_einsum_s": round(e2e, 2),
        "rows": n,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
