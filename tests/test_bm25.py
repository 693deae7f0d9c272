"""BM25 ranked retrieval (text.bm25_topk): fixed-point scoring vs a
pure-Python reference, ranking semantics, plan shape."""
from __future__ import annotations

import re

from mongodb_etl_migration_spark.operators import text as T


def _bm25_reference(docs, queries, k1_milli=1200, b_milli=750, k=10):
    """Same fixed-point algebra in plain Python ints (// is the
    decimal div for positive operands)."""
    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in docs}
    n = len(docs)
    t_total = sum(len(v) for v in toks.values())
    df: dict[str, int] = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    out = {}
    for qid, terms in queries:
        scores: dict[int, int] = {}
        for i, ws in toks.items():
            s = 0
            for term in terms:
                tf = ws.count(term)
                if not tf or term not in df:
                    continue
                num = (
                    1000
                    * (2 * n - 2 * df[term] + 1)
                    * (tf * (k1_milli + 1000) * 1000 * t_total)
                )
                den = (2 * df[term] + 1) * (
                    tf * 1000000 * t_total
                    + k1_milli
                    * ((1000 - b_milli) * t_total + b_milli * len(ws) * n)
                )
                s += num // den
            if s:
                scores[i] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(i, s, r + 1) for r, (i, s) in enumerate(ranked)]
    return out


DOCS = [
    (1, "spark stream spark batch"),
    (2, "stream stream stream join"),
    (3, "join hash join hash join hash"),
    (4, "window batch window"),
    (5, "spark spark spark spark spark spark spark spark"),  # long doc
]
QUERIES = [("q1", ["spark", "stream"]), ("q2", ["join", "hash"])]


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in T.bm25_topk(df, QUERIES, k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_milli"], r["rn"])
        )
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    assert got == _bm25_reference(DOCS, QUERIES)


def test_bm25_length_normalization_prefers_dense_doc(spark):
    # doc 1 (tf=2 of 4 tokens) must outrank doc 5 (tf=8 of 8 tokens
    # stuffed): BM25's saturation + length norm is the whole point
    # vs raw tf. With b=0.75, k1=1.2 the short focused doc wins? No —
    # verify against the reference rather than intuition, and pin the
    # saturation property that doubling tf does NOT double the score.
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: r["score_milli"]
        for r in T.bm25_topk(df, [("q", ["spark"])], k=10).collect()
    }
    assert set(rows) == {1, 5}
    # tf 8 vs tf 2, but score ratio far below 4x (saturation)
    assert rows[5] < 2 * rows[1]


def test_bm25_rarer_term_scores_higher(spark):
    # same tf, same dl: the term with smaller df must score higher
    docs = [
        (1, "rare common"),
        (2, "common filler"),
        (3, "common filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        (r["query_id"], r["doc_id"]): r["score_milli"]
        for r in T.bm25_topk(
            df, [("qr", ["rare"]), ("qc", ["common"])], k=10
        ).collect()
    }
    assert rows[("qr", 1)] > rows[("qc", 1)]


def test_bm25_unmatched_query_absent_and_k_respected(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = T.bm25_topk(df, [("qx", ["zzz"]), ("q1", ["spark"])], k=1)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {"q1"}
    assert len(rows) == 1 and rows[0]["rn"] == 1


def test_bm25_plan_windowgrouplimit_and_broadcast(spark, sf_dir):
    from mongodb_etl_migration_spark.queries import QUERIES as CATALOG

    plan = (
        CATALOG["t_bm25_retrieval"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan  # map-side top-k trim
    assert "BroadcastHashJoin" in plan  # query terms broadcast
    assert "CartesianProduct" not in plan
