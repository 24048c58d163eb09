"""SparkSession factory with scale-oriented defaults.

The engine is designed for large clusters (100 TB inputs, ~1000 executors);
tests run on ``local[N]``. The knobs below are the ones that matter at both
scales:

* AQE on — runtime coalescing of shuffle partitions and skew-join splitting
  replace hand-tuned ``spark.sql.shuffle.partitions`` at scale.
* Broadcast threshold raised — dimension tables (region/nation/customer-scale)
  of a graph hop should broadcast instead of shuffling the fact side.
* Arrow on — every Pandas-UDF operator (minhash, multimodal decode) moves
  batches via Arrow, not pickle.
* Session timezone pinned to UTC — the reference's time-bucket semantics
  (Aggregation.scala:401-480) are epoch-arithmetic; UTC makes them
  deterministic across environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scalligraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit with ``spark-submit --master yarn/k8s``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TIMESTAMP(NANOS) parquet columns (events.ts) surface as long;
        # catalog loaders convert ns → timestamp exactly (catalog.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
