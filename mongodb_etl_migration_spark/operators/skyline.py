"""Grouped Pareto-frontier (skyline) operator.

The multi-objective filter of classic OLAP research (Börzsönyi et al.
2001, "The Skyline Operator"): keep the rows no other row dominates —
better-or-equal on every objective and strictly better on at least
one. The workhorse for "best offers" / "non-dominated configs" /
quality-vs-cost curation cuts.

Spark-first shape: the textbook block-nested-loops algorithm is a
self-join (quadratic per group); the 2-D case instead admits an exact
single-pass formulation over one sort order — running aggregates over
windows that all share the group partitioning, so the whole frontier
costs ONE exchange and zero joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    group_cols: list[str],
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Per-group 2-D skyline: rows where no other row of the group has
    ``min_col`` ≤ mine AND ``max_col`` ≥ mine with at least one strict
    — e.g. per part, offers with no cheaper-and-larger alternative.

    Algorithm (exact, ties and duplicates included): sort each group
    by (min_col ASC, max_col DESC). A row is dominated iff either
      (a) some row with STRICTLY smaller min_col has max_col ≥ mine —
          detected by the running max of max_col over strictly
          preceding rows in that order, read at the row's min_col
          block boundary: the running max is non-decreasing, so
          ``min`` over the block recovers its value entering the
          block. A block whose first row has NO preceding rows (the
          group's first block) is recognized by the presence of a
          NULL running max — later rows of that block already see
          same-block values, so the null FLAG, not the null-skipping
          min, is what says "no lower block exists" (otherwise
          duplicates of the first frontier point would be wrongly
          dropped); or
      (b) some row with EQUAL min_col has STRICTLY larger max_col —
          detected by the per-(group, min_col) max.
    Exact duplicates dominate nothing and are all kept (equality in
    both dimensions is not dominance).

    100 TB shape: every window shares the ``group_cols`` hash
    partitioning — Spark plans ONE exchange, then in-partition sorts;
    no self-join, no quadratic blow-up, output bounded by the true
    frontier. Degenerate single giant group ⇒ same skew answer as any
    grouped window: pre-aggregate or salt upstream. Rows with NULL in
    either metric are excluded (dominance is undefined for them).
    """
    df = df.filter(
        F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
    )
    w_run = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(min_col).asc(), F.col(max_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_blk = Window.partitionBy(*group_cols, min_col)
    with_r = df.withColumn("__r", F.max(max_col).over(w_run))
    return (
        with_r.withColumn(
            "__first_blk",
            F.max(F.col("__r").isNull().cast("int")).over(w_blk),
        )
        .withColumn("__m_lower", F.min("__r").over(w_blk))
        .withColumn("__m_same", F.max(max_col).over(w_blk))
        .filter(
            (
                (F.col("__first_blk") == 1)
                | (F.col("__m_lower") < F.col(max_col))
            )
            & (F.col("__m_same") <= F.col(max_col))
        )
        .drop("__r", "__first_blk", "__m_lower", "__m_same")
    )
