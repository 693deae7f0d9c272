"""interval_join (operators/ranges.py): exact boundaries, multi-bucket
spans, overlap multiplicity, and the equi-join plan shape. Bulk
correctness is the oracle query j14_interval_join."""

from __future__ import annotations

from datetime import datetime

from mongodb_etl_migration_spark.operators.ranges import interval_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01T00:00:00")),  # == interval start
            (2, 1, _ts("2024-01-01T05:00:00")),  # == interval end
            (3, 1, _ts("2024-01-01T06:00:00")),  # outside
            (4, 1, _ts("2024-01-01T03:30:00")),  # inside A and B (overlap)
            (5, 2, _ts("2024-01-01T01:00:00")),  # right key, no interval
        ],
        "pid long, k long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T05:00:00"), "A"),
            (1, _ts("2024-01-01T03:00:00"), _ts("2024-01-01T04:00:00"), "B"),
        ],
        "k long, lo timestamp, hi timestamp, tag string",
    )
    return points, intervals


def test_interval_join_semantics(spark):
    points, intervals = _frames(spark)
    out = interval_join(
        points, intervals, ["k"], "ts", "lo", "hi", bucket_seconds=3600
    )
    pairs = sorted((r["pid"], r["tag"]) for r in out.collect())
    # A spans 6 buckets, B spans 2; inclusive ends; p4 matches both
    assert pairs == [(1, "A"), (2, "A"), (4, "A"), (4, "B")]


def test_interval_join_is_equi_join(spark):
    points, intervals = _frames(spark)
    out = interval_join(points, intervals, ["k"], "ts", "lo", "hi")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_sentinel_interval_fails_loudly(spark):
    """An open-ended sentinel interval must raise instead of exploding
    to tens of millions of bucket rows (executor OOM)."""
    import pytest
    from pyspark.sql import functions as F

    from mongodb_etl_migration_spark.operators.ranges import interval_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    bad = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "9999-12-31 00:00:00")],
        "k long, s string, e string",
    ).select(
        "k",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    with pytest.raises(Exception, match="sentinel|buckets"):
        interval_join(
            points, bad, on=["k"], ts_col="ts", start_col="s", end_col="e",
            bucket_seconds=3600,
        ).count()
