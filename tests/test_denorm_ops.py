"""Unit tests for denorm operators: exact upsert semantics (S8) and
pair_generation's order_by (J7)."""

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators import denorm as DN


def test_upsert_matches_on_conflict_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0, "SEG1"), (2, "b", 20.0, "SEG2"), (3, "c", 30.0, "SEG3")],
        "k int, name string, bal double, seg string",
    )
    updates = spark.createDataFrame(
        [(2, "B2", None), (4, "D4", 44.0)],
        "k int, name string, bal double",
    )
    out = DN.upsert(target, updates, ["k"], ["name", "bal"]).collect()
    by_k = {r.k: r for r in out}
    assert len(out) == 4
    # untouched row passes through
    assert (by_k[1].name, by_k[1].bal, by_k[1].seg) == ("a", 10.0, "SEG1")
    # matched: set_cols overwritten UNCONDITIONALLY (NULL overwrites),
    # non-set columns preserved
    assert by_k[2].name == "B2" and by_k[2].bal is None and by_k[2].seg == "SEG2"
    assert (by_k[3].name, by_k[3].bal) == ("c", 30.0)
    # unmatched update inserted, target-only column NULL
    assert by_k[4].name == "D4" and by_k[4].bal == 44.0 and by_k[4].seg is None


def test_merge_update_keeps_target_on_null_update(spark):
    """merge_update is the coalesce variant: NULL update values keep
    the target's value (contrast with upsert)."""
    target = spark.createDataFrame([(1, 10.0)], "k int, bal double")
    updates = spark.createDataFrame([(1, None)], "k int, bal double")
    out = DN.merge_update(target, updates, ["k"], ["bal"]).collect()
    assert out[0].bal == 10.0


def test_pair_generation_honors_order_by(spark):
    members = spark.createDataFrame(
        [
            ("r1", "zed", 1),   # earliest joined_at → first member
            ("r1", "amy", 3),
            ("r1", "bob", 2),
            ("r2", "solo", 1),  # <2 members → skipped
        ],
        "room string, user string, joined_at int",
    )
    rows = DN.pair_generation(
        members, "room", "user", order_by=[F.col("joined_at")]
    ).collect()
    pairs = {(r.user1, r.user2) for r in rows}
    # first two BY joined_at are zed (1) and bob (2) — not amy/bob
    # (which the default member-value ordering would pick)
    assert pairs == {("zed", "bob"), ("bob", "zed")}
    # default ordering: lexicographic by member value
    rows2 = DN.pair_generation(members, "room", "user").collect()
    pairs2 = {(r.user1, r.user2) for r in rows2}
    assert pairs2 == {("amy", "bob"), ("bob", "amy")}
