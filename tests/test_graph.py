"""Fixed-point PageRank semantics on a hand-computed graph."""

from __future__ import annotations

from mongodb_etl_migration_spark.operators.graph import pagerank_integer


def test_pagerank_hand_computed_one_round(spark):
    # 1->2, 1->3, 2->1; node 3 is dangling (its mass drops).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "s long, d long"
    )
    got = {
        r.node: r.pr
        for r in pagerank_integer(
            edges, "s", "d", iterations=1, scale=1000, damping_pct=85
        ).collect()
    }
    # init = 1000//3 = 333 each; teleport = (15*1000//100)//3 = 50
    # node1 <- 333//1 = 333        => 50 + 85*333//100 = 50+283 = 333
    # node2 <- 333//2 = 166        => 50 + 85*166//100 = 50+141 = 191
    # node3 <- 166                 => 191
    assert got == {1: 333, 2: 191, 3: 191}


def test_pagerank_sink_heavy_graph_ranks_sink_highest(spark):
    # every node points at 1; 1 points only at 2
    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (1, 2)], "s long, d long"
    )
    ranks = {
        r.node: r.pr
        for r in pagerank_integer(edges, "s", "d", iterations=3).collect()
    }
    assert ranks[1] == max(ranks.values())
    assert ranks[3] == ranks[4] != ranks[2]  # symmetric leaves tie; 2 gets 1's mass


def test_pagerank_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "s long, d long")
    out = pagerank_integer(edges, "s", "d", iterations=2)
    assert out.columns == ["node", "pr"]
    assert out.count() == 0


def test_weighted_pagerank_follows_weights(spark):
    from mongodb_etl_migration_spark.operators.graph import pagerank_integer

    # 1 -> 2 (weight 9), 1 -> 3 (weight 1): weighted rank must favor 2;
    # unweighted splits evenly and ties them.
    e = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1)], "src long, dst long, w long"
    )
    weighted = {
        r.node: r.pr
        for r in pagerank_integer(e, "src", "dst", iterations=2, weight="w").collect()
    }
    uniform = {
        r.node: r.pr
        for r in pagerank_integer(e, "src", "dst", iterations=2).collect()
    }
    assert weighted[2] > weighted[3]
    assert uniform[2] == uniform[3]
    # duplicate (src,dst) rows pre-aggregate their weights
    e2 = spark.createDataFrame(
        [(1, 2, 5), (1, 2, 4), (1, 3, 1)], "src long, dst long, w long"
    )
    merged = {
        r.node: r.pr
        for r in pagerank_integer(e2, "src", "dst", iterations=2, weight="w").collect()
    }
    assert merged == weighted


def test_weighted_pagerank_drops_nonpositive_weights(spark):
    from mongodb_etl_migration_spark.operators.graph import pagerank_integer

    # a zero-weight edge carries no mass and must not divide-by-zero
    e = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 0), (4, 5, 0)], "src long, dst long, w long"
    )
    got = {
        r.node: r.pr
        for r in pagerank_integer(e, "src", "dst", iterations=2, weight="w").collect()
    }
    ref = {
        r.node: r.pr
        for r in pagerank_integer(
            spark.createDataFrame([(1, 2, 3)], "src long, dst long, w long"),
            "src", "dst", iterations=2, weight="w",
        ).collect()
    }
    assert got == ref  # zero-weight edges (and their isolated nodes) gone


def test_hits_hand_computed_one_round(spark):
    """1->3, 2->3, 3->4: after round 1, node 3 is the top authority
    (two in-links from full hubs) and nodes 1/2 tie as hubs pointing
    at it; node 4's only in-link is from 3."""
    from mongodb_etl_migration_spark.operators.graph import hits_integer

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "s long, d long"
    )
    out = {
        r.node: (r.auth, r.hub)
        for r in hits_integer(edges, "s", "d", iterations=1).collect()
    }
    S = 1_000_000
    # round 1 by hand: a_raw = {3: 2S, 4: S}, max 2S ->
    #   a = {3: S, 4: S//2, 1: 0, 2: 0}
    # h_raw = {1: a[3]=S, 2: S, 3: a[4]=S//2}, max S ->
    #   h = {1: S, 2: S, 3: S//2, 4: 0}
    assert out == {
        1: (0, S),
        2: (0, S),
        3: (S, S // 2),
        4: (S // 2, 0),
    }


def test_hits_directory_vs_content(spark):
    """A pure directory page (many out-links, no in-links) must score
    hub-high/authority-zero; the pages it links to authority-high —
    the separation HITS exists to make."""
    from mongodb_etl_migration_spark.operators.graph import hits_integer

    edges = spark.createDataFrame(
        [(100, i) for i in range(1, 6)] + [(1, 2)], "s long, d long"
    )
    out = {
        r.node: (r.auth, r.hub)
        for r in hits_integer(edges, "s", "d", iterations=3).collect()
    }
    assert out[100][0] == 0          # directory: no authority
    assert out[100][1] == 1_000_000  # max hub
    assert out[2][0] == max(v[0] for v in out.values())  # 2 has 2 in-links


def test_hits_empty_edges(spark):
    from mongodb_etl_migration_spark.operators.graph import hits_integer

    empty = spark.createDataFrame([], "s long, d long")
    assert hits_integer(empty, "s", "d").count() == 0
