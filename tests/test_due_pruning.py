"""Frontier due-pruning at rest: snapshots sorted by fetch_time within
host-buckets give tight parquet row-group stats, so generate's due-filter
(`fetch_time <= cur_time`) prunes not-yet-due row groups at scan time —
input decoded drops when most of the frontier is not yet due."""

from __future__ import annotations

from pyspark.sql import functions as F

from coherencebot_spark.sources.snapshot import SnapshotTable

# tiny row groups so the test file has many (prod uses the 128 MB default)
SMALL_RG = {"parquet.block.size": 4096}


def _frontier_df(spark, n=20_000, buckets=4):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".org/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 1000).alias("fetch_time"),  # due times spread wide
        F.pmod(F.col("id"), F.lit(buckets)).alias("bucket"),
    )


def _scan_rows_decoded(df) -> int:
    """numOutputRows of the parquet scan leaf = rows DECODED after
    row-group pruning (before that metric, pruned groups never decode)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        total += leaves.apply(i).metrics().apply("numOutputRows").value()
    return total


def test_due_filter_prunes_row_groups(spark, tmp_path):
    df = _frontier_df(spark)
    n = df.count()
    # ~5% of the frontier is due: selective enough that sorted row groups
    # mostly prune, dense enough that a random 100-row group almost surely
    # contains a due row (P(miss) = .95^100) — the adversarial layout
    due_cut = int(n * 0.05) * 1000

    sorted_t = SnapshotTable(str(tmp_path / "sorted"), "s")
    sorted_t.write(df.repartition("bucket"), partition_by=["bucket"],
                   sort_within=["bucket", "fetch_time"],
                   write_options=SMALL_RG)
    unsorted_t = SnapshotTable(str(tmp_path / "unsorted"), "u")
    # url-ordered layout (the natural key order a crawldb merge emits):
    # per-host page ids stride the whole time range, so every row group's
    # fetch_time min/max spans the table — nothing prunes
    # (sort keys must lead with the partition column, else the writer's
    # required Sort(bucket) replaces the layout sort — same rule the
    # production sort_within=["bucket", "fetch_time"] follows)
    unsorted_t.write(df.repartition("bucket")
                     .sortWithinPartitions("bucket", "url"),
                     partition_by=["bucket"], write_options=SMALL_RG)

    q_sorted = sorted_t.read(spark).filter(F.col("fetch_time") <= due_cut)
    q_unsorted = unsorted_t.read(spark).filter(F.col("fetch_time") <= due_cut)

    # identical answers...
    assert sorted(r.url for r in q_sorted.collect()) == \
        sorted(r.url for r in q_unsorted.collect())

    decoded_sorted = _scan_rows_decoded(q_sorted)
    decoded_unsorted = _scan_rows_decoded(q_unsorted)
    # ...but the sorted layout decodes a small fraction of the table while
    # the shuffled layout decodes (nearly) all of it
    assert decoded_sorted < n * 0.2, (decoded_sorted, n)
    assert decoded_unsorted > n * 0.8, (decoded_unsorted, n)
    assert decoded_sorted < decoded_unsorted / 4


def test_cycle_frontier_is_sorted_at_rest(spark, tmp_path):
    """The crawl driver's frontier snapshots actually carry the sorted
    layout: within every parquet file, fetch_time is non-decreasing."""
    import glob

    import pyarrow.parquet as pq

    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.plans.cycle import CrawlDriver
    from coherencebot_spark.schemas import SEEDS
    from coherencebot_spark.synth import world

    cfg = DEFAULT.with_(topn=150, num_partitions=2, server_delay_ms=100,
                        host_buckets=8)
    d = CrawlDriver(spark, str(tmp_path / "c"), cfg, n_images=150, n_hosts=10)
    d.inject(spark.createDataFrame(world.gen_seed_lines(30, 10), SEEDS),
             world.T0)
    d.run_cycle(0, world.T0 + 1000)

    files = glob.glob(str(tmp_path / "c" / "frontier" / "snapshots" /
                          "s0001-*" / "bucket=*" / "*.parquet"))
    assert files
    checked = 0
    for f in files:
        col = pq.read_table(f, columns=["fetch_time"])["fetch_time"]
        vals = col.to_pylist()
        assert vals == sorted(vals), f
        checked += len(vals)
    assert checked > 0


def test_generate_pushes_due_filter_to_scan(spark, tmp_path):
    """generate()'s due-gate must reach the parquet scan as PushedFilters
    on the RAW fetch_time column — the clamped filter is a CASE expression
    Catalyst cannot push, so generate pre-filters with the pushable
    equivalent (due OR far-future)."""
    import re

    from coherencebot_spark.config import DEFAULT
    from coherencebot_spark.operators.generate import generate

    t = SnapshotTable(str(tmp_path / "f"), "f")
    df = _frontier_df(spark).select(
        "url", F.lit("h.org").alias("host"), F.lit(1).alias("status"),
        "fetch_time", F.lit(0).alias("retries"),
        F.lit(2_592_000).cast("long").alias("fetch_interval"),
        F.lit(1.0).cast("float").alias("score"),
        F.lit(None).cast("binary").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        "bucket",
    )
    t.write(df.repartition("bucket"), partition_by=["bucket"],
            sort_within=["bucket", "fetch_time"], write_options=SMALL_RG)
    cur = 1_000_000  # ~5% of rows due
    fl = generate(t.read(spark).drop("bucket"), cur,
                  DEFAULT.with_(topn=50, num_partitions=2))
    plan = fl._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert pushed and all("fetch_time" in p for p in pushed), plan[:2000]
