"""Interval (range) join — match points to [start, end] intervals of
the same key.

Beyond-parity temporal operator (see also operators/asof.py). A naive
``points.join(intervals, (key ==) & ts.between(start, end))`` keeps
the range as a residual join condition: every per-key |P_k|×|I_k|
pair is materialized and tested (and with no equality key at all,
Spark falls back to BroadcastNestedLoopJoin) — quadratic in the hot
keys, hopeless at 100 TB.

Spark-first strategy — bucketize time so the range join becomes an
EQUI-join Catalyst can hash-partition:

1. points get one bucket id: floor(epoch/width);
2. intervals EXPLODE to every bucket they overlap
   (``sequence(floor(start/width), floor(end/width))``);
3. equi-join on (key, bucket) — a plain shuffled hash join, AQE- and
   skew-split-eligible — then filter the exact range.

A point lies in exactly one bucket, so no post-join dedup is needed.
Pick ``bucket_seconds`` near the typical interval span: duplication
factor per interval is ceil(span/width)+1, while too-wide buckets
inflate the candidate set the exact filter must discard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Inner interval join: rows = (point, interval) pairs with equal
    ``on`` keys and ``start_col <= ts_col <= end_col`` (inclusive).
    Output columns = point columns + interval columns (caller renames
    clashes beforehand).

    ``max_buckets_per_interval`` is an explosion guard: one open-ended
    sentinel interval ('9999-12-31') would otherwise sequence to tens
    of millions of bucket rows and OOM the executor. Violating rows
    FAIL LOUDLY via raise_error (silent clamping would drop matches) —
    normalize sentinel ends upstream or widen bucket_seconds."""
    w = F.lit(bucket_seconds).cast("double")

    def epoch(c: str) -> F.Column:
        return F.col(c).cast("timestamp").cast("double")

    b_start = F.floor(epoch(start_col) / w)
    b_end = F.floor(epoch(end_col) / w)
    guarded_end = F.when(
        # abs(): a REVERSED interval with a sentinel start
        # ('9999-12-31' start, normal end) yields a large NEGATIVE
        # delta that would slip past a one-sided guard, and
        # sequence(b_start, b_end) then explodes a huge descending
        # array — the exact OOM this guard exists to stop. Reversed
        # intervals can never match a point, so they fail loudly too.
        F.abs(b_end - b_start) > max_buckets_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than "
                    f"{max_buckets_per_interval} buckets of "
                    f"{bucket_seconds}s — sentinel end date? start="
                ),
                F.col(start_col).cast("string"),
                F.lit(" end="),
                F.col(end_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(b_end)
    pb = points.withColumn("__b", F.floor(epoch(ts_col) / w))
    ib = intervals.withColumn("__b", F.explode(F.sequence(b_start, guarded_end)))
    # exact filter on the SAME casted instants the buckets use — raw
    # string comparison would be lexicographic and disagree with the
    # bucketing for non-canonical timestamp strings
    return (
        pb.join(ib, [*on, "__b"])
        .filter(
            (epoch(ts_col) >= epoch(start_col))
            & (epoch(ts_col) <= epoch(end_col))
        )
        .drop("__b")
    )
