"""Funnel / cohort-retention semantics on hand-built event sequences —
the catalog's synthetic events are dense enough that every user
completes the funnel, so the stage splits and ordering rules are
pinned here."""

from __future__ import annotations

import datetime as dt

from mongodb_etl_migration_spark.operators import events as EV


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts int, event_type string")


def test_funnel_requires_strict_order(spark):
    df = _ev(
        spark,
        [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),  # full funnel
            (2, 1, "purchase"), (2, 2, "click"), (2, 3, "view"),  # reversed: stage 1
            (3, 1, "click"), (3, 2, "view"), (3, 3, "click"),     # view then click: 2
            (4, 1, "error"),                                       # no steps: 0
        ],
    )
    got = {
        r.stage: r.users
        for r in EV.funnel_stages(
            df, "user_id", "ts", "event_type", ("view", "click", "purchase")
        ).collect()
    }
    assert got == {3: 1, 1: 1, 2: 1, 0: 1}


def test_funnel_same_timestamp_does_not_qualify(spark):
    # click at the SAME ts as the first view is not "after" it —
    # strict value comparison, independent of sort-tie order
    df = _ev(spark, [(1, 5, "view"), (1, 5, "click"), (1, 6, "purchase")])
    got = {
        r.stage: r.users
        for r in EV.funnel_stages(
            df, "user_id", "ts", "event_type", ("view", "click", "purchase")
        ).collect()
    }
    assert got == {1: 1}


def test_cohort_retention_offsets(spark):
    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, base),                                # cohort w0, active w0
        (1, base + dt.timedelta(days=8)),         # ...and w1
        (2, base + dt.timedelta(days=7)),         # cohort w1, active w1
        (2, base + dt.timedelta(days=21)),        # ...and offset 2
        (2, base + dt.timedelta(days=22)),        # same week, counted once
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week.date().isoformat(), r.week_offset): r.active_users
        for r in EV.cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_copurchase_prune_runs_before_pairing(spark):
    # items y,z frequent (2 baskets); x appears once -> pruned, so the
    # (x,y) co-occurrence in basket 1 never becomes a pair
    rows = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "y"), (2, "z"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.p1, r.p2): r.support
        for r in EV.copurchase_pairs(
            df, "basket", "item", min_item_support=2, min_pair_support=2
        ).collect()
    }
    assert got == {("y", "z"): 2}


def test_copurchase_dedups_repeated_lines(spark):
    # the same item twice in one basket counts once (distinct first)
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = EV.copurchase_pairs(
        df, "basket", "item", min_item_support=1, min_pair_support=2
    ).collect()
    assert [(r.p1, r.p2, r.support) for r in got] == [("a", "b", 2)]


def test_funnel_matches_python_reference_randomized(spark):
    """Property (seeded-random, merge_asof-test pattern): the
    window-based funnel equals the obvious per-user Python reference —
    first view, first click strictly after it, first purchase strictly
    after that — including under heavy timestamp ties."""
    import numpy as np

    rng = np.random.RandomState(11)
    steps = ("view", "click", "purchase")
    types = ["view", "click", "purchase", "error", "other"]
    rows = [
        (int(rng.randint(0, 40)), int(rng.randint(0, 50)),
         types[rng.randint(0, len(types))])
        for _ in range(400)
    ]

    by_user: dict[int, list] = {}
    for u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, t))
    expected: dict[int, int] = {}
    for u, evs in by_user.items():
        prev = None
        stage = 0
        for k, step in enumerate(steps):
            cand = [
                ts
                for ts, t in evs
                if t == step and (k == 0 or ts > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            stage = k + 1
        expected[stage] = expected.get(stage, 0) + 1

    df = _ev(spark, rows)
    got = {
        r.stage: r.users
        for r in EV.funnel_stages(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert got == expected


def test_copurchase_matches_brute_force_randomized(spark):
    from itertools import combinations

    import numpy as np

    rng = np.random.RandomState(5)
    rows = [
        (int(rng.randint(0, 30)), f"i{rng.randint(0, 15)}")
        for _ in range(300)
    ]
    min_item, min_pair = 3, 2

    baskets: dict[int, set] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    item_support: dict[str, int] = {}
    for items in baskets.values():
        for i in items:
            item_support[i] = item_support.get(i, 0) + 1
    frequent = {i for i, n in item_support.items() if n >= min_item}
    pair_support: dict[tuple, int] = {}
    for items in baskets.values():
        for p in combinations(sorted(items & frequent), 2):
            pair_support[p] = pair_support.get(p, 0) + 1
    expected = {p: n for p, n in pair_support.items() if n >= min_pair}

    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.p1, r.p2): r.support
        for r in EV.copurchase_pairs(
            df, "basket", "item",
            min_item_support=min_item, min_pair_support=min_pair,
        ).collect()
    }
    assert got == expected
