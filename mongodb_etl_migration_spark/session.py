"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-parity with the DuckDB oracle
(UTC session timezone, ANSI off) and for scale (AQE on with skew-join
handling, Arrow for any pandas exchange, capped broadcast threshold).

On a real cluster these same configs apply; only ``master`` and memory
sizing change. Shuffle partitioning is env-tunable so the driver's
bench (local[32]) and a 1000-executor run pick appropriate values:
at 100 TB you want `spark.sql.shuffle.partitions` sized so post-AQE
partitions land in the 100-500 MB range — AQE coalescing makes the
initial number a ceiling rather than a target, so we set it high-ish
and let AQE shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # Adaptive execution: runtime re-planning, partition coalescing and
    # skew-join splitting. The reference hand-tuned batch sizes and retry
    # loops (etl/loaders/cassandra_loader.py:119-259); AQE replaces all
    # of that with runtime statistics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic oracle parity: DuckDB reads parquet TIMESTAMP as
    # naive; keep Spark in UTC so instants stringify identically.
    "spark.sql.session.timeZone": "UTC",
    # Mongo field names are case-sensitive and the reference coalesces
    # over case-drifted pairs (birthDate|birthdate, fileUrl|fileURL —
    # field_mapper.py:29-61); default-insensitive resolution would make
    # those references ambiguous.
    "spark.sql.caseSensitive": "true",
    # Arrow for pandas UDF / toPandas exchange (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimensions in this workload (region/nation/customer/supplier and
    # the reference's 8 preloaded lookup tables) are broadcast-sized.
    # 64 MB threshold keeps FK-resolution joins shuffle-free even at
    # large SF; bigger fact-fact joins fall through to SMJ under AQE.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": "128m",
    # Local runs don't need the UI; harmless on a cluster.
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "mongodb-etl-migration-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a cluster pass ``None`` and submit with ``--master``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
