"""Event-sequence analytics: funnels and cohort retention.

Beyond-reference extensions: the two queries every product-analytics
engine ships (Amplitude/Mixpanel-class), expressed as single-shuffle
window plans over the events stream. Both are integer-exact —
timestamps compare by value, counts are longs — so they verify
hash-exact against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def funnel_stages(events, user_col: str, ts_col: str, type_col: str, steps):
    """Ordered-funnel analysis: for each user, the furthest step of
    ``steps`` reached IN ORDER (each step strictly after the previous
    step's first qualifying occurrence); output (stage, users) counts.

    Semantics are VALUE-based, not row-position-based: step k
    qualifies at time t iff step k-1 first qualified strictly before
    t. Running prefix-minima use RANGE frames (all ts ties included),
    so the result is deterministic under any sort-tie order — the
    property that lets two engines agree row-for-row.

    Plan shape: ONE shuffle (window partitioned by user, ordered by
    event time; the per-user aggregate and the final stage histogram
    reuse/contract that exchange). State per row is one running min
    per step — no per-user event buffering, no collect_list.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(user_col, ts_col, type_col)
    ts = F.col(ts_col)
    # qual_k = this row is step k happening strictly after the first
    # qualifying step k-1; rmin_k = earliest qualifying step k at or
    # before this row (RANGE prefix => tie-order independent).
    prev_rmin = None
    qual_cols = []
    for i, step in enumerate(steps):
        if prev_rmin is None:
            qual = F.when(F.col(type_col) == step, ts)
        else:
            qual = F.when(
                (F.col(type_col) == step) & (prev_rmin < ts), ts
            )
        qname = f"__q{i}"
        df = df.withColumn(qname, qual)
        prev_rmin = F.min(qname).over(w)
        qual_cols.append(qname)

    per_user = df.groupBy(user_col).agg(
        *[F.min(q).alias(q) for q in qual_cols]
    )
    # furthest non-null step wins: each F.when(...) wraps OUTERMOST
    # around the accumulated chain, so iterate shallow → deep and the
    # deepest step's check ends up evaluated first
    stage = F.lit(0)
    for i in range(len(qual_cols)):
        stage = F.when(
            F.col(qual_cols[i]).isNotNull(), F.lit(i + 1)
        ).otherwise(stage)
    return (
        per_user.select(stage.cast("bigint").alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").cast("bigint").alias("users"))
    )


def cohort_retention(events, user_col: str, ts_col: str):
    """Weekly cohort retention: users bucketed by the week of their
    first event; for each (cohort week, week offset), how many cohort
    members were active that week.

    Plan shape: the per-user first-event timestamp rides a window over
    the user exchange (no groupBy + self-join, single scan); the
    distinct (user, week) grid and the final rollup are the standard
    two aggregation shuffles. Weeks truncate Monday-start (ISO) in
    both engines; the offset is exact integer day arithmetic.
    """
    w = Window.partitionBy(user_col)
    marked = events.select(
        user_col,
        F.date_trunc("week", F.col(ts_col)).alias("__wk"),
        F.date_trunc("week", F.min(ts_col).over(w)).alias("__cohort"),
    ).distinct()
    return (
        marked.select(
            F.col("__cohort").alias("cohort_week"),
            F.expr("datediff(__wk, __cohort) div 7").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("active_users"))
    )


def copurchase_pairs(
    df,
    basket_col: str,
    item_col: str,
    min_item_support: int = 20,
    min_pair_support: int = 2,
):
    """Market-basket co-occurrence: item pairs appearing together in
    at least ``min_pair_support`` baskets — the first rung of Apriori
    association mining.

    Scale design: the per-basket self-join is inherently quadratic in
    BASKET SIZE, so the plan bounds it the way Apriori does — the
    frequent-item prune runs FIRST (anti-monotonicity: a pair of
    items can't be frequent unless both items are), shrinking each
    basket to its frequent members before any pairing. The self-join
    keys on the basket id (one exchange both sides share) with the
    ``p1 < p2`` residual, and the final pair count is a partial-agg
    shuffle. Real basket sizes are small (max 13 here); a pathological
    mega-basket is exactly what the support prune trims.

    Output: (p1, p2, support) with p1 < p2.
    """
    pairs = df.select(F.col(basket_col), F.col(item_col)).distinct()
    freq = (
        pairs.groupBy(item_col)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") >= min_item_support)
        .select(item_col)
    )
    fp = pairs.join(freq, item_col)
    a = fp.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("p1")
    )
    b = fp.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("p2")
    )
    return (
        a.join(b, "__b")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_pair_support)
    )
