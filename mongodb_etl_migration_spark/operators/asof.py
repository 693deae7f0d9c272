"""As-of (temporal) join — for each left row, the payload of the most
recent right row of the same key at-or-before the left timestamp.

Beyond-parity temporal operator (the reference joins only on equality
keys — SURVEY §2.5); standard in time-series engines and needed by
training pipelines (attach the latest label/price/config to an event).

Spark-first strategy — the "union + last_value window" plan, NOT a
range join:

1. tag right rows (side=0) with their payload as one struct column,
   left rows (side=1) with a NULL payload;
2. union by name, shuffle ONCE on the key;
3. per key, sort by (ts, side) — right sorts before left at the same
   instant, making the match inclusive (ts >= right_ts) — and take
   ``last(payload, ignorenulls)`` over rows unboundedPreceding..current;
4. keep only left rows and unpack the struct.

Cost at scale: one Exchange of |L|+|R| rows on the key plus a
per-partition sort — linear, skew-safe under AQE, and never builds the
|L|×|R| intermediate a naive range-join produces. DuckDB's native
ASOF JOIN is the oracle twin (query ``j13_asof_join``).

The right side should be unique per (key, ts) — pre-aggregate it if
not, or which same-instant row wins is undefined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of LEFT join: every left row survives; payload columns are
    NULL when the key has no right row on the matching side of
    ``left_ts``. Output = left columns + ``payload_cols``.

    ``direction`` follows pandas ``merge_asof``: "backward" (default)
    matches the most recent right row at-or-before ``left_ts``;
    "forward" the earliest right row at-or-after it. Forward is the
    same single-exchange union+window plan with the traversal order
    reversed (``__t`` DESC) — right rows still sort ahead of left at
    equal timestamps, keeping the match inclusive on both directions.

    ``tolerance`` (SQL interval literal, e.g. ``"7 days"``) applies
    pandas ``merge_asof`` semantics: the nearest match is DISCARDED
    (payload NULL) when it is farther than ``tolerance`` from
    ``left_ts`` — it does not fall through to a farther row.
    Implemented as a post-window validity mask over the matched right
    timestamp (carried inside the payload struct), so the plan is
    unchanged: still one Exchange + one window, no extra join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        *[F.col(c) for c in payload_cols],
        F.col(right_ts).alias("__rt"),
    ).alias("__payload")
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload,
    )
    payload_type = r.schema["__payload"].dataType
    l = left.select(
        "*",
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    t_order = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    valid = F.col("__match").isNotNull()
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        valid = valid & (
            F.col("__t") <= F.col("__match.__rt") + iv
            if direction == "backward"
            else F.col("__match.__rt") <= F.col("__t") + iv
        )
    for c in payload_cols:
        out = out.withColumn(c, F.when(valid, F.col("__match").getField(c)))
    return out.drop("__k", "__t", "__side", "__payload", "__match")


def scd2_build(
    changes: DataFrame,
    key: str,
    order_by: list,
    valid_from_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """SCD Type-2 dimension build: a change log becomes a versioned
    dimension with half-open validity intervals — ``valid_to`` is the
    next change's timestamp (NULL = current version), the standard
    warehouse shape for point-in-time joins (pair with
    :func:`asof_join` to attach the version in effect at an event).

    One lead() window per key — a single Exchange on the key, linear
    in the change log. ``order_by`` must make the per-key ordering
    total (include a tiebreak column).
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    return changes.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(valid_from_col).alias("valid_from"),
        F.lead(valid_from_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
