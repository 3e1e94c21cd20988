"""SparkSession factory tuned for the KG-construction workload.

Scale posture (local[32] here, 1000-executor cluster in production):
  - AQE on (runtime join re-planning, skew-join splitting, partition coalescing)
  - Arrow on (every UDF in this repo is a vectorized pandas/Arrow UDF;
    no per-row Python anywhere — BASELINE.json input_hint)
  - shuffle partitions sized from the parallelism level; on a real cluster
    this comes from spark-submit conf, AQE coalesces the tail.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdfrules-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] -> N; on a cluster the submitter sets this explicitly.
        try:
            n = int(master.split("[", 1)[1].rstrip("]").replace("*", cpus))
        except Exception:
            n = int(cpus)
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle/spill scratch: this sandbox's only disk is a shared
        # virtio device with 3x run-to-run throughput swings, which
        # drowns benchmark signal; tmpfs is the local-mode analog of the
        # NVMe shuffle volumes a real cluster provisions. Overridable
        # (and skipped when /dev/shm is absent).
        .config("spark.local.dir", os.environ.get(
            "SPARK_GRAFT_LOCAL_DIR",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        ))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if master.startswith("local-cluster"):
        # local-cluster executors are separate JVMs whose Python workers
        # don't inherit the driver's sys.path — ship the package root
        # (spark-submit analog: --py-files, tools/submit_job.py)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = builder.config("spark.executorEnv.PYTHONPATH", repo_root)
        # the local-cluster[n,cores,mem] mem argument is WORKER capacity;
        # the executor JVM heap is spark.executor.memory (default 1g) —
        # size it explicitly or large-corpus runs die in
        # UNABLE_TO_ACQUIRE_MEMORY regardless of worker capacity
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECMEM", "6g"),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
