"""asof_join edge cases (operators/asof.py) + plan shape.

The oracle suite (j13_asof_join vs DuckDB ASOF JOIN) covers bulk
correctness; here: no-earlier-right ⇒ NULL payload, inclusive
same-instant match, per-key isolation, and the one-shuffle plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators.asof import asof_join


def _ts(s: str):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:00")),  # before any right row
            (2, 10, _ts("2024-01-02T00:00:00")),  # == right ts (inclusive)
            (3, 10, _ts("2024-01-05T00:00:00")),  # after both right rows
            (4, 20, _ts("2024-01-03T00:00:00")),  # other key
            (5, 30, _ts("2024-01-03T00:00:00")),  # key with no right rows
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-02T00:00:00"), "a"),
            (10, _ts("2024-01-04T00:00:00"), "b"),
            (20, _ts("2024-01-01T00:00:00"), "c"),
        ],
        "k long, rts timestamp, tag string",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "k", "ts", "rts", payload_cols=["tag"]
    )
    got = {r["event_id"]: r["tag"] for r in out.collect()}
    assert got == {1: None, 2: "a", 3: "b", 4: "c", 5: None}
    assert out.count() == left.count()  # LEFT join: all left rows survive
    assert set(out.columns) == {"event_id", "k", "ts", "tag"}


def test_asof_join_single_shuffle(spark):
    """The union+window plan shuffles once on the key — no range-join
    blowup: exactly one Exchange in the optimized physical plan."""
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "ts", "rts", ["tag"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_asof_join_tolerance_discards_stale_matches(spark):
    """merge_asof tolerance semantics: a match older than the window
    is discarded (NULL payload), never replaced by an older row; the
    boundary (exactly tolerance old) is inclusive; the plan keeps its
    single Exchange."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "k", "ts", "rts", ["tag"], tolerance="1 day"
    )
    # plan BEFORE execution: the post-run AQE final plan prints extra
    # Exchange nodes inside materialized shuffle stages
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    tags = {r.event_id: r.tag for r in out.collect()}
    assert tags == {
        1: None,   # no earlier right row
        2: "a",    # same instant
        3: "b",    # Jan 5 vs Jan 4: exactly 1 day -> inclusive keep
        4: None,   # Jan 3 vs Jan 1: 2 days old -> discarded, NOT 'c'
        5: None,   # key with no right rows
    }


def test_asof_join_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after the left ts,
    inclusive at equal instants; tolerance bounds how far ahead."""
    import pytest

    left, right = _frames(spark)
    out = asof_join(
        left, right, "k", "k", "ts", "rts", ["tag"], direction="forward"
    )
    tags = {r.event_id: r.tag for r in out.collect()}
    assert tags == {
        1: "a",    # Jan 1 -> next is Jan 2
        2: "a",    # same instant, inclusive
        3: None,   # Jan 5: nothing after
        4: None,   # key 20: right row is BEFORE (Jan 1 < Jan 3)
        5: None,   # no right rows
    }
    bounded = asof_join(
        left, right, "k", "k", "ts", "rts", ["tag"],
        direction="forward", tolerance="12 hours",
    )
    tags_b = {r.event_id: r.tag for r in bounded.collect()}
    assert tags_b[1] is None  # Jan 2 is 1 day ahead > 12h -> discarded
    assert tags_b[2] == "a"   # same instant still matches
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "k", "ts", "rts", ["tag"], direction="nearest")


def test_scd2_intervals_chain_and_single_current(spark):
    from pyspark.sql import functions as F

    from mongodb_etl_migration_spark.operators.asof import scd2_build

    changes = spark.createDataFrame(
        [
            (1, "A", 10),
            (1, "B", 20),
            (1, "C", 30),
            (2, "X", 5),
        ],
        "k long, val string, ts long",
    )
    out = scd2_build(
        changes, key="k", order_by=[F.col("ts")], valid_from_col="ts",
        attr_cols=["val"],
    ).collect()
    k1 = sorted([r for r in out if r.k == 1], key=lambda r: r.valid_from)
    # intervals chain: each valid_to == next valid_from; last is open
    assert [(r.valid_from, r.valid_to) for r in k1] == [
        (10, 20), (20, 30), (30, None)
    ]
    assert [r.is_current for r in k1] == [False, False, True]
    # exactly one current version per key
    cur = [r for r in out if r.is_current]
    assert sorted((r.k, r.val) for r in cur) == [(1, "C"), (2, "X")]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property: the union+window as-of equals pandas.merge_asof
    (the semantics reference) on randomized frames, for both
    directions, with and without tolerance."""
    import pandas as pd
    import numpy as np

    rng = np.random.RandomState(7)
    for direction in ("backward", "forward"):
        for tol_ms in (None, 250):
            left_pd = pd.DataFrame({
                "ts": pd.to_datetime(
                    rng.randint(0, 2000, size=60), unit="ms"
                ),
                "k": rng.randint(0, 4, size=60).astype("int64"),
                "event_id": np.arange(60, dtype="int64"),
            }).sort_values("ts").reset_index(drop=True)
            right_pd = pd.DataFrame({
                "rts": pd.to_datetime(
                    # distinct per key by construction: step of 7ms
                    np.arange(0, 2000, 7)[:120], unit="ms"
                ),
                "k": rng.randint(0, 4, size=120).astype("int64"),
                "tag": np.arange(120, dtype="int64"),
            }).sort_values("rts").reset_index(drop=True)
            expected = pd.merge_asof(
                left_pd, right_pd, left_on="ts", right_on="rts",
                by="k", direction=direction,
                tolerance=None if tol_ms is None else pd.Timedelta(milliseconds=tol_ms),
            )
            got = asof_join(
                spark.createDataFrame(left_pd),
                spark.createDataFrame(right_pd),
                "k", "k", "ts", "rts", ["tag"],
                tolerance=None if tol_ms is None else f"0.{tol_ms:03d} seconds",
                direction=direction,
            ).toPandas()
            exp = dict(zip(expected["event_id"], expected["tag"]))
            act = dict(zip(got["event_id"], got["tag"]))
            for eid in exp:
                e, a = exp[eid], act[eid]
                assert (pd.isna(e) and pd.isna(a)) or e == a, (
                    direction, tol_ms, eid, e, a
                )
