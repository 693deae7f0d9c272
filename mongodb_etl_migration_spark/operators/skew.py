"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join split (on by default in session.py) handles most skew
at runtime by splitting oversized partitions; salting is the explicit
fallback for pathological keys (one room with millions of messages —
the reference's hot-room case, orchestrator.py:1235-1407) and for
aggregations, where AQE cannot split a single group.

`salted_join`: replicate the small side R times, scatter the big side
across R salt values — same result as the plain join, but the hot
key's rows spread over R tasks.

`salted_count`: two-stage aggregation (partial per (key, salt), then
final per key) — the explicit form of what partial aggregation already
does for algebraic aggregates; useful template for custom aggs that
lack map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered over ``salts``
    partitions. The small side is exploded ×salts (fine — it's small);
    the big side gets a deterministic salt from a stable hash of its
    whole row key + a spread column, keeping result equality."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    salted_big = big.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salts)
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, salts: int = 8
) -> DataFrame:
    """Per-key counts via explicit two-stage (salted) aggregation:
    groupBy((key, salt)) → partial counts → groupBy(key) → sum. The
    first shuffle spreads a hot key over ``salts`` reducers."""
    return (
        df.withColumn(
            "__salt",
            (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salts),
        )
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
