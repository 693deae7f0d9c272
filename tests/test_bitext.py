"""Bitext mining (similarity.bitext_margin_pairs): mutual-best margin
alignment on hand-built geometry."""
from __future__ import annotations

from mongodb_etl_migration_spark.operators import similarity as SIM


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_bitext_mutual_best_pairs_mined(spark):
    # one bucket (plane (1,1): all positive-quadrant), two clean
    # alignments plus a src whose best target already belongs to
    # another src — non-mutual, must be excluded.
    src = _emb(
        spark,
        [
            (0, [1.0, 0.0]),   # aligns with t 100
            (2, [0.6, 0.8]),   # aligns with t 102
            (4, [0.7, 0.71]),  # best is t 102 too, but 102 prefers 2
        ],
    )
    tgt = _emb(
        spark,
        [(100, [0.99, 0.05]), (102, [0.55, 0.83])],
    )
    out = {
        r["src_id"]: r
        for r in SIM.bitext_margin_pairs(
            src, tgt, planes=[[1.0, 1.0]], k=2
        ).collect()
    }
    assert set(out) == {0, 2}
    assert out[0]["tgt_id"] == 100 and out[2]["tgt_id"] == 102
    for r in out.values():
        assert r["margin_milli"] >= 1000
        assert 0 < r["cos_e4"] <= 10000


def test_bitext_margin_threshold_filters(spark):
    # two targets nearly equidistant from the src: the margin over the
    # top-2 neighborhood is ~1.0; a high threshold must drop the pair.
    src = _emb(spark, [(0, [1.0, 0.0])])
    tgt = _emb(spark, [(1, [1.0, 0.02]), (3, [1.0, -0.02])])
    mined = SIM.bitext_margin_pairs(
        src, tgt, planes=[[1.0, 1.0]], k=2, margin_milli=1100
    ).collect()
    assert mined == []
    kept = SIM.bitext_margin_pairs(
        src, tgt, planes=[[1.0, 1.0]], k=2, margin_milli=1000
    ).collect()
    assert len(kept) == 1 and kept[0]["tgt_id"] == 1


def test_bitext_nonpositive_cosines_never_candidates(spark):
    # same bucket (plane (0,1)), but anti-parallel: cos < 0 -> dropped
    src = _emb(spark, [(0, [1.0, 0.1])])
    tgt = _emb(spark, [(1, [-1.0, 0.1])])
    assert (
        SIM.bitext_margin_pairs(src, tgt, planes=[[0.0, 1.0]], k=2).count()
        == 0
    )


def test_bitext_cross_bucket_pairs_never_compared(spark):
    # perfectly aligned vectors in DIFFERENT buckets are not mined —
    # the LSH block is the declared recall boundary (more planes =
    # more buckets = less work, mirrored by the multi-probe variant
    # for recall-critical paths).
    src = _emb(spark, [(0, [1.0, 0.0])])
    tgt = _emb(spark, [(1, [-0.1, 1.0])])  # plane (1,0): '0' vs src '1'
    assert (
        SIM.bitext_margin_pairs(src, tgt, planes=[[1.0, 0.0]], k=2).count()
        == 0
    )


def test_bitext_plan_no_cartesian_single_bucket_join(spark, sf_dir):
    from mongodb_etl_migration_spark.queries import QUERIES

    plan = (
        QUERIES["sim_bitext_margin"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_exclude_translation_and_rank(spark):
    # src 0 mines t 100; negatives must be the runner-up targets in
    # cosine order, never the mined translation itself.
    src = _emb(spark, [(0, [1.0, 0.0])])
    tgt = _emb(
        spark,
        [
            (100, [0.99, 0.02]),  # translation (rank 1)
            (102, [0.95, 0.2]),   # hardest negative
            (104, [0.8, 0.5]),    # next
            (106, [0.5, 0.8]),    # next
            (108, [0.1, 0.99]),   # beyond n_neg=3
        ],
    )
    rows = SIM.bitext_hard_negatives(
        src, tgt, planes=[[1.0, 1.0]], k=4, n_neg=3
    ).collect()
    got = sorted((r["neg_rank"], r["neg_id"]) for r in rows)
    assert got == [(1, 102), (2, 104), (3, 106)]
    assert all(r["neg_id"] != 100 for r in rows)


def test_hard_negatives_only_for_mined_srcs(spark):
    # src 4 loses the mutual-best race (t 102 prefers src 2): it must
    # contribute NO negatives even though it has runner-up candidates.
    src = _emb(
        spark, [(2, [0.6, 0.8]), (4, [0.7, 0.71]), (0, [1.0, 0.0])]
    )
    tgt = _emb(spark, [(100, [0.99, 0.05]), (102, [0.55, 0.83])])
    rows = SIM.bitext_hard_negatives(
        src, tgt, planes=[[1.0, 1.0]], k=2, n_neg=2
    ).collect()
    assert {r["src_id"] for r in rows} == {0, 2}
    assert all(r["src_id"] != 4 for r in rows)


def test_hard_negatives_empty_when_no_runner_up(spark):
    # exactly one candidate in the bucket: mined pair exists, but
    # there is no rank-2 target -> zero negatives, not an error
    src = _emb(spark, [(0, [1.0, 0.0])])
    tgt = _emb(spark, [(100, [0.99, 0.02])])
    assert (
        SIM.bitext_hard_negatives(
            src, tgt, planes=[[1.0, 1.0]], k=2, n_neg=3
        ).count()
        == 0
    )


def test_bitext_mine_returns_consistent_pairs_and_negatives(spark):
    src = _emb(spark, [(0, [1.0, 0.0]), (2, [0.6, 0.8])])
    tgt = _emb(
        spark,
        [(100, [0.99, 0.05]), (102, [0.55, 0.83]), (104, [0.7, 0.7])],
    )
    mined, negs = SIM.bitext_mine(src, tgt, planes=[[1.0, 1.0]], k=3, n_neg=2)
    mined_solo = SIM.bitext_margin_pairs(src, tgt, planes=[[1.0, 1.0]], k=3)
    negs_solo = SIM.bitext_hard_negatives(
        src, tgt, planes=[[1.0, 1.0]], k=3, n_neg=2
    )
    assert sorted(map(tuple, mined.collect())) == sorted(
        map(tuple, mined_solo.collect())
    )
    assert sorted(map(tuple, negs.collect())) == sorted(
        map(tuple, negs_solo.collect())
    )
    # negatives only for mined srcs, translations excluded
    mined_map = {r["src_id"]: r["tgt_id"] for r in mined.collect()}
    for r in negs.collect():
        assert r["src_id"] in mined_map
        assert r["neg_id"] != mined_map[r["src_id"]]
