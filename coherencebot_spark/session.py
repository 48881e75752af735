"""SparkSession factory with the engine's execution invariants.

Invariants (SURVEY.md §4):
  * AQE on (runtime re-plan, skew-join splitting) — but politeness
    correctness never relies on it; host-bucket partitioning is explicit.
  * Speculative execution off (politeness: a duplicate fetch task would
    violate per-host crawl-delay; ref ``fetcher/Fetcher.java:483-484``).
  * Arrow enabled — every per-row computation is a vectorized pandas UDF.
  * shuffle.partitions sized for the test scale; production submits override
    via ``spark-submit --conf`` (the code never hard-codes partition counts
    into logic — parallelism is always read from the config or passed in).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "coherencebot-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster, leave it unset and let spark-submit provide it.
    """
    # one BLAS/OMP thread per python worker: Spark's process-per-core model
    # already saturates the machine — nested numpy thread pools (32 workers
    # × N BLAS threads) oversubscribe CPUs and invert scaling
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
              "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(v, "1")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # politeness invariant: never re-run a fetch partition speculatively
        .config("spark.speculation", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # metadata merges use map_concat with last-wins semantics
        # (reference MapWritable.putAll overwrites existing keys)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # broadcast threshold: hostdb/robots/bloom joins are broadcast by
        # explicit F.broadcast() hints, but keep the auto threshold sane
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # split scans finer than the 128MB default: pre-shuffle stages chain
        # Arrow UDFs onto scan tasks, and a mid-size table must not starve a
        # 32-core executor with 6 scan partitions (cluster deploys override)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # fork Python workers from a daemon that has the Arrow stack
        # (pandas/pyarrow/serializers) preloaded: a fresh fork otherwise
        # pays the ~1-1.5 s import on its first batch, and cycle stages
        # chaining 2-3 Python operators fork past the idle pool inside
        # the timed phase (see pydaemon docstring; guide §4.5).  The
        # PYTHONPATH entry keeps the module importable from any cwd.
        .config("spark.python.daemon.module", "coherencebot_spark.pydaemon")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p for p in (
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    os.environ.get("PYTHONPATH", ""),
                ) if p
            ),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
