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

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stable_salt(key: str, spread_cols: Sequence[str] | None, df: DataFrame, salts: int):
    """Salt derived from actual row content (key + spread columns, or
    the whole row when no spread column is named) — identical across
    materializations, task retries, and partition layouts, so stage
    recomputation re-salts every row the same way and debugging a
    single reducer's input is reproducible.

    DEGENERACY GUARD: when the frame carries NOTHING but the key
    (``df.select(key)``), every row of a hot key is content-identical
    and any content hash collapses to ONE salt — silently disabling
    the mitigation. That case falls back to ``spark_partition_id()``:
    the hot key's rows spread across however many input partitions
    they span, and the id is stable under task retry (a recomputed
    task keeps its partition id), though not across re-layouts —
    the honest trade when rows have no distinguishing content."""
    spread = [
        c
        for c in (spread_cols if spread_cols is not None else df.columns)
        if c != key
    ]
    if not spread:
        # including the key twice (spread_cols=[key]) or a key-only
        # frame still hashes to a constant per key value — same
        # degeneracy, so normalize first and fall back on empty
        return F.pmod(F.spark_partition_id().cast("long"), F.lit(salts))
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in [key, *spread]]), F.lit(salts)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered over ``salts``
    partitions. The small side is exploded ×salts (fine — it's small);
    the big side's salt is a stable hash of row content — the join key
    plus ``spread_cols`` (default: every other column), never a
    partition-layout id — so retries and re-materializations assign
    identical salts while still spreading a hot key's rows (which
    share the key but differ in payload) across ``salts`` tasks.
    Result equality with the plain join holds for any salt choice
    because the small side carries every salt value."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    salted_big = big.withColumn("__salt", _stable_salt(key, spread_cols, big, salts))
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame,
    key: str,
    salts: int = 8,
    spread_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-key counts via explicit two-stage (salted) aggregation:
    groupBy((key, salt)) → partial counts → groupBy(key) → sum. The
    first shuffle spreads a hot key over ``salts`` reducers. The salt
    is content-stable (see ``_stable_salt``), not layout-dependent."""
    return (
        df.withColumn("__salt", _stable_salt(key, spread_cols, df, salts))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
