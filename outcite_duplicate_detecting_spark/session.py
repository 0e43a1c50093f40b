"""SparkSession factory tuned for the dedup workload.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ≈ cores (not 200), AQE on for runtime coalescing + skew-join
handling, Arrow on for pandas-UDF transfer, UTC session timezone so
results compare cleanly against the DuckDB oracle.

On a real cluster the same builder is used via ``spark-submit --py-files``;
only ``master`` / memory flags change. Iceberg catalog support is gated
behind an import/config try so the module works without the runtime jar
(the sandbox has none) — see ``sources/catalog.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "outcite_duplicate_detecting_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores``: int for ``local[N]``, "*" for all, None → $SPARK_GRAFT_CPUS
    or all cores. ``shuffle_partitions`` defaults to the core count — at
    cluster scale this is instead sized from input bytes (see
    plans/pipeline.py docstring).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"

    # make the package importable in python workers regardless of the
    # driver's cwd (the local-mode analogue of spark-submit --py-files)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    n_cores = os.cpu_count() or 8 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(n_cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # dedup shuffles are byte-small but CPU-heavy downstream (verify
        # UDFs, pair dedup): the default 1m floor lets AQE coalesce them to
        # 1-2 tasks and serialize those stages — keep partitions fine-grained
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # aggressively reclaim dropped localCheckpoint/persist blocks: the
        # default 30min periodic cleaner GC lets dead RDD blocks accumulate
        # across pipeline stages, starving execution memory (measured as
        # consecutive identical jobs degrading 10.2s → 77.9s)
        .config("spark.cleaner.periodicGC.interval", "45s")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
