"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-parity with the DuckDB oracle
(UTC session timezone, ANSI ON — DuckDB also errors on invalid casts
and overflow, so ANSI is the parity-matching mode; use try_cast /
try_* functions where permissive per-row behavior is wanted) and for
scale (AQE on with skew-join handling, Arrow for any pandas exchange,
capped broadcast threshold).

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
    # ANSI explicitly ON (the Spark 4 default, pinned so behavior
    # cannot drift across versions): DuckDB raises on bad casts and
    # overflow too, so this is the oracle-parity mode. Code paths that
    # need per-row tolerance use try_cast/try_divide explicitly.
    "spark.sql.ansi.enabled": "true",
    # Local runs don't need the UI; harmless on a cluster.
    "spark.ui.enabled": "false",
    # NOTE: driver.memory is a JVM-LAUNCH-time conf — it only applies
    # when this call actually creates the JVM; under spark-submit or a
    # pre-existing session it is inert (size the driver there instead).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Worker daemon with numpy/pandas/pyarrow preimported: forked
    # workers inherit initialized modules via copy-on-write instead of
    # re-importing (~2 s CPU per spawn) inside the first task they run
    # — measured 60-200 s of executorRunTime per bench run on the
    # MapInPandas-heavy media chains before this (see python_daemon).
    "spark.python.daemon.module": "mongodb_etl_migration_spark.python_daemon",
}


def get_spark(
    app_name: str = "mongodb-etl-migration-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver
    contract) — UNLESS a master was already provided externally
    (``spark-submit --master`` sets ``spark.master``), which wins: the
    local fallback must never clobber a cluster submission.
    """
    if master is None:
        from pyspark import SparkConf

        if not SparkConf().contains("spark.master"):
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
            master = f"local[{cpus}]"
    # The preimporting daemon module (spark.python.daemon.module) must
    # be importable by the worker python, whose sys.path comes from the
    # PYTHONPATH the JVM passes to it — driver-side sys.path edits
    # (bench.py / scripts insert the repo root) do not propagate.
    # Export the package's parent dir before the JVM is created; no-op
    # when already present (e.g. an installed package on PYTHONPATH).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
