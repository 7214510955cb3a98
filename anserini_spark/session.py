"""SparkSession factory with the engine's recommended configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "anserini-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(cpus)
    # pin per-worker native thread pools: N python workers each spinning
    # their own BLAS/OMP pool oversubscribes the host (spin-wait storms
    # show up as system-CPU time)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    # shuffle/spill on tmpfs when available: the sandbox's disk shows
    # high IO-contention variance under concurrent shuffle writers
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
    builder = SparkSession.builder.master(master)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
        # tmpfs shuffle: lz4 compress/decompress is pure CPU overhead
        # (no disk or network to save) — measured 25% off the 8-core
        # docvec stage wall, and it was the gap between the build's
        # 2->8 scaling and the host ceiling (BENCH.md round 3). On a
        # real cluster with network shuffle, leave compression ON.
        builder = (builder
                   .config("spark.shuffle.compress", "false")
                   .config("spark.shuffle.spill.compress", "false"))
    return (
        builder
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
