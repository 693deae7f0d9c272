"""Sinks — SURVEY.md §2.1 S6–S12.

Parquet writes stand in for the reference's PostgreSQL COPY
(etl/loaders/postgres_loader.py:165-226) and Cassandra batch loader
(etl/loaders/cassandra_loader.py:81-268). The adaptive batch sizing /
retry machinery of the reference is connector-side concern in Spark
(task retry + connector batching); what the engine owns is layout:
partitioning and in-partition clustering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame, path: str, mode: str = "overwrite", fmt: str = "parquet"
) -> None:
    """S6/S11: bulk write; overwrite = the truncate-then-load pattern
    (scripts/truncate_all_tables.py)."""
    df.write.format(fmt).mode(mode).save(path)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_key: str,
    cluster_by: Sequence[Column],
    mode: str = "overwrite",
) -> None:
    """O4: Cassandra-style (partition key, clustering order) layout —
    e.g. messages_by_room PRIMARY KEY ((room_id), message_id DESC)
    (backups/create_scylla_database.cql:21-46) — as hash-distributed
    files sorted within partitions. Readers scanning one key touch one
    partition's files; range reads are sequential thanks to the sort."""
    (
        df.repartition(F.col(partition_key))
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed, sorted table — the co-located-join layout.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle (each bucket pair joins independently);
    at 100 TB this converts every repeated fact⋈fact join on the key
    into a zero-exchange sort-merge — the shuffle is paid once at
    write time instead of per query. The reference has no equivalent
    (its Cassandra partition keys serve reads, not joins)."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout: directory per partition value.
    Filters on partition columns become PartitionFilters — the scan
    never lists, let alone reads, other partitions' files. At 100 TB
    this (date/tenant partitioning) is the first and cheapest pruning
    lever; combine with in-file clustering (write_clustered) for
    second-level skipping."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def align_to_schema(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """S12 additive schema evolution: project onto the target column
    list, adding NULLs for new columns — the engine-side equivalent of
    SchemaManager's ALTER TABLE ADD COLUMN IF NOT EXISTS
    (etl/utils/schema_manager.py:16-266)."""
    existing = set(df.columns)
    cols = [
        F.col(c) if c in existing else F.lit(None).alias(c) for c in columns
    ]
    return df.select(*cols)


def zorder_key(
    cols: Sequence[Column | str],
    minmax: Sequence[tuple[float, float]],
    bits: int = 12,
) -> Column:
    """Morton (Z-order) key over ``cols``: each column is scaled into a
    ``bits``-bit integer using the given (min, max), then the bits of
    all columns are interleaved. Rows close in Z-value are close in
    EVERY clustered dimension, so files written in Z-order carry tight
    parquet min/max ranges on all of them at once.

    Pure Column bit arithmetic (shiftleft/bitwiseOR loops unrolled at
    plan-build time) — whole-stage-codegen'd, no UDF. ``len(cols) *
    bits`` must stay ≤ 63 (signed long). The interleave itself is
    operators/layout.zvalue (the single Morton implementation, with a
    bit-exact DuckDB twin and the o6_zorder_layout driver oracle);
    this wrapper adds the float min/max scaling a real-valued column
    needs before bucketing."""
    from mongodb_etl_migration_spark.operators.layout import zvalue

    top = (1 << bits) - 1
    scaled_cols: list[Column] = []
    for c, (lo, hi) in zip(cols, minmax):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            # constant column: contributes nothing (all-zero bits),
            # but keeps its interleave position
            scaled_cols.append(F.lit(0).cast("long"))
            continue
        scaled_cols.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    (
                        (col.cast("double") - F.lit(float(lo)))
                        / F.lit(span)
                        * top
                    ).cast("long"),
                ),
            )
        )
    return zvalue(scaled_cols, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered sink: range-partition + sort by the Morton key
    so every output file covers a compact hyper-rectangle of the
    clustered dimensions. A predicate on ANY subset of ``cols`` then
    skips most files via parquet min/max stats — unlike a linear sort,
    which only prunes its leading column. This is the Delta/Iceberg
    OPTIMIZE ZORDER BY idea expressed with vanilla Spark + parquet.

    One tiny min/max agg job picks the scaling; the write itself is
    one range shuffle (same cost as any globally-sorted write)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).head()
    if row is None or any(row[f"__lo_{c}"] is None for c in cols):
        # empty input or an all-NULL cluster column: no Z-curve to
        # build — write as-is rather than crashing on float(None)
        df.write.mode(mode).parquet(path)
        return
    minmax = [
        (float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"])) for c in cols
    ]
    z = zorder_key(list(cols), minmax, bits)
    nf = n_files or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(nf, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> int:
    """Small-file-safe sink: size the output file count from the
    PLAN's row-size estimate so files land near ``target_file_bytes``
    instead of one-file-per-task (the classic small-files problem: a
    32k-task job writing 32k tiny parquet files murders the next
    scan's file listing + footer reads).

    The estimate comes from Catalyst statistics
    (``optimizedPlan().stats.sizeInBytes`` — column-pruned, filter
    aware), not a count() pre-pass, so planning stays one job.
    Returns the file count used. At 100 TB this is how nightly
    compaction jobs pick their width; pair with
    ``spark.sql.files.maxPartitionBytes`` on the read side."""
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    # in-memory estimate ≈ 2-4x parquet-encoded size; assume 3x
    n_files = max(1, min(100_000, est // (3 * target_file_bytes) + 1))
    df.repartition(int(n_files)).write.format(fmt).mode(mode).save(path)
    return int(n_files)
