"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-at-scale defaults (SURVEY.md §4.2): AQE with skew
join handling on, Arrow for pandas UDFs, UTC session timezone (oracle
parity with DuckDB).  ``shuffle_partitions`` should track cores locally
and input size on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    streaming_state: str | None = None,
) -> SparkSession:
    """``streaming_state="rocksdb"`` selects the RocksDB state store
    provider (ships with Spark) so stateful streaming state spills
    off-heap/disk — required by :func:`rdf_spark.streaming.global_dedup_stream`."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 32768 measured best for the Arrow line-parse hot path on this
        # class of box (10k: 4.71M lines/s, 32k: 5.46M, 128k: 4.82M —
        # bigger batches amortize per-batch Python/IPC overhead until
        # cache pressure wins); doc-sized pandas stages stay ≤ ~64 MB/batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if streaming_state == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        ).config(
            # incremental (changelog) checkpoints: upload deltas, not full
            # RocksDB snapshots, per micro-batch
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    return builder.getOrCreate()
