"""Grouped 2-D Pareto frontier: exactness vs brute-force dominance,
tie/duplicate semantics, NULL exclusion, and plan shape."""

from __future__ import annotations

import random

from mongodb_etl_migration_spark.operators.skyline import pareto_frontier_2d


def _brute(rows):
    keep = []
    for a in rows:
        dominated = any(
            b[1] <= a[1]
            and b[2] >= a[2]
            and (b[1] < a[1] or b[2] > a[2])
            for b in rows
            if b[0] == a[0]
        )
        if not dominated:
            keep.append(a)
    return sorted(keep)


def test_pareto_frontier_matches_bruteforce_fuzz(spark):
    """30 random multi-group grids (dense value range → plenty of
    ties, duplicates, single-point groups) against the O(n²)
    dominance definition."""
    random.seed(7)
    for trial in range(30):
        n = random.randint(1, 40)
        rows = [
            (
                f"g{random.randint(0, 2)}",
                random.randint(0, 8),
                random.randint(0, 8),
                i,
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "g string, price int, qty int, rid int"
        )
        got = sorted(
            (r.g, r.price, r.qty, r.rid)
            for r in pareto_frontier_2d(df, ["g"], "price", "qty").collect()
        )
        assert got == _brute(rows), (trial, rows)


def test_pareto_frontier_duplicates_kept_nulls_excluded(spark):
    """Exact duplicates of a frontier point are NOT dominance (equal
    in both dims) — all copies stay, including in the group's first
    min-block where the running max is NULL; rows with NULL in either
    metric are excluded."""
    rows = [
        ("g", 1, 5, 0),
        ("g", 1, 5, 1),  # duplicate of the frontier point
        ("g", None, 9, 2),
        ("g", 2, None, 3),
        ("g", 2, 5, 4),  # dominated by (1,5)
    ]
    df = spark.createDataFrame(rows, "g string, price int, qty int, rid int")
    got = sorted(
        r.rid for r in pareto_frontier_2d(df, ["g"], "price", "qty").collect()
    )
    assert got == [0, 1]


def test_pareto_frontier_single_exchange_plan(spark):
    """All three windows share the group hash-partitioning: exactly
    ONE Exchange in the plan — the no-self-join promise."""
    df = spark.createDataFrame(
        [("g", 1.0, 2.0)], "g string, price double, qty double"
    )
    plan = (
        pareto_frontier_2d(df, ["g"], "price", "qty")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
