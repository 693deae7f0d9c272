"""Stream-stream event-time joins (beyond-parity streaming surface —
the reference is batch-only, SURVEY §2.10; this is the Structured
Streaming idiom its pipeline would need to go continuous).

``interval_attribution_join`` is the canonical attribution shape: each
LEFT event (e.g. a purchase) picks up the RIGHT events (e.g. clicks)
of the same key within a lookback window ending at the left event.

Execution model at scale: both sides shuffle once on the key; in
streaming mode the watermark + the join's time bound let Spark expire
buffered rows, so per-key state is O(events in lookback+watermark),
not unbounded. The batch twin is the same expression minus watermarks
(oracle-checked as e_attribution_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
    streaming: bool = False,
) -> DataFrame:
    """Inner join: right rows with the same ``key`` whose ``right_ts``
    lies in ``[left_ts - lookback, left_ts)``.

    ``left_ts``/``right_ts`` must be DISTINCT column names (the caller
    aliases); every other column name must be unique across the two
    inputs except ``key``, which is coalesced into one output column.

    With ``streaming`` both inputs are watermarked (timestamps cast to
    instants — watermarks reject TIMESTAMP_NTZ; the session runs UTC so
    the cast is lossless) and the bounded time condition makes the join
    state expirable: Spark drops right-side state older than
    watermark + lookback.
    """
    lb = F.expr(f"INTERVAL {lookback}")
    l, r = left, right
    if streaming:
        l = l.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
            left_ts, watermark
        )
        r = r.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
            right_ts, watermark
        )
    # explicit aliases: both sides often derive from the same source
    # (self-join), where bare column refs are ambiguous
    l, r = l.alias("__ssj_l"), r.alias("__ssj_r")
    cond = (
        (F.col(f"__ssj_l.{key}") == F.col(f"__ssj_r.{key}"))
        & (F.col(right_ts) >= F.col(left_ts) - lb)
        & (F.col(right_ts) < F.col(left_ts))
    )
    return l.join(r, cond, "inner").drop(F.col(f"__ssj_r.{key}"))
