"""A/B harness for the heavy micro-suite ops (guide §1): same synthetic
corpora as bench.bench_ops, isolated timings of sub-stages and candidate
variants.  Usage: python scripts/prof_micro.py [winnow|lm|all]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coherencebot_spark.session import build_session  # noqa: E402

N_DOCS = int(os.environ.get("BENCH_DOCS", "1000000"))


def dsyn(spark):
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate header line across the corpus\n"),
            F.lit("body words alpha beta gamma group "),
            (F.col("id") % 1000).cast("string"),
            F.lit(" delta epsilon zeta eta theta iota kappa\n"),
            F.lit("unique tail line number "), F.col("id").cast("string"),
        ).alias("text"))


def t(label, fn):
    t0 = time.time()
    r = fn()
    sec = round(time.time() - t0, 3)
    print(f"  {label}: {sec}s -> {r}", flush=True)
    return sec


def winnow(spark):
    from coherencebot_spark.datapipe.dedup_text import (
        shared_passage_stats, winnow_fingerprints)
    d = dsyn(spark)
    spark.sparkContext.setJobDescription("winnow: fps only")
    t("winnow_fingerprints.count", lambda: winnow_fingerprints(d).count())
    spark.sparkContext.setJobDescription("winnow: full")
    t("shared_passage_stats", lambda: shared_passage_stats(d)
      .agg(F.avg("shared_frac")).collect())


def lm(spark):
    from coherencebot_spark.datapipe.lm_quality import (
        lm_typicality, train_trigram_lm)
    d = dsyn(spark)
    spark.sparkContext.setJobDescription("lm: train only")
    t("train_trigram_lm.collect", lambda: len(train_trigram_lm(d).collect()))
    spark.sparkContext.setJobDescription("lm: full")
    t("lm_typicality", lambda: lm_typicality(d)
      .agg(F.avg("avg_logp")).collect())


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = build_session(master="local[32]", shuffle_partitions=32,
                          app_name="prof-micro")
    # warm python workers / codegen
    spark.range(1000).select(F.xxhash64("id")).count()
    if which in ("winnow", "all"):
        print("[winnow]", flush=True)
        winnow(spark)
    if which in ("lm", "all"):
        print("[lm]", flush=True)
        lm(spark)
    spark.stop()


if __name__ == "__main__":
    main()
