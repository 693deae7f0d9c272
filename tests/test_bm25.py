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


def test_bm25_probe_indexed_matches_topk_and_never_scans_corpus(
    spark, tmp_path
):
    """The persisted-index contract: bm25_probe_indexed over
    write_bm25_index output is row-identical to bm25_topk over the
    corpus (including an empty doc, which carries no postings but
    still counts in N via the stats table), and the probe's physical
    plan (a) scans ONLY the index paths — the corpus parquet/source
    never appears — and (b) prunes the postings scan to the query
    terms' tbucket partitions."""
    docs = DOCS + [(6, "")]  # zero-token doc: in N, not in postings
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = sorted(map(tuple, T.bm25_topk(df, QUERIES, k=10).collect()))
    path = str(tmp_path / "bm25idx")
    T.write_bm25_index(df, path, n_buckets=64)
    out = T.bm25_probe_indexed(spark, path, QUERIES, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    got = sorted(map(tuple, out.collect()))
    assert got == base
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    # exactly ONE file scan: the postings (stats were a bounded 1-row
    # collect at plan-build time); paths print truncated, so pin the
    # scan by its schema and pin corpus absence by its column — no
    # text#N column reference can appear anywhere in a plan that
    # never touches the corpus
    assert len(scans) == 1 and "tbucket" in scans[0], scans
    assert "text#" not in plan, "probe plan references the raw corpus"
    # directory pruning: the tbucket IN (...) filter must be a
    # PARTITION filter (prunes directories), not a data filter
    want = sorted(
        {
            T._term_bucket_py(t, 64)
            for _, terms in QUERIES
            for t in terms
        }
    )
    m = re.search(r"PartitionFilters: \[tbucket#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, "tbucket filter was not pushed to PartitionFilters"
    assert sorted(int(x) for x in m.group(1).split(",")) == want
    # query terms join the postings as a broadcast
    assert "BroadcastHashJoin" in plan


def test_bm25_index_incremental_maintenance(spark):
    """The maintenance recipe postings_from_tf documents: union a
    batch's tf layer into the held tf, re-sum per (doc, term),
    re-derive dl/df — must equal the from-scratch index over the
    union row-for-row, and a probe over the maintained index must
    equal a probe over the from-scratch one (N/T re-stated for the
    union). Exercises df growth (terms shared across halves), dl
    growth (a doc id appearing in both halves gains tokens), and a
    term only the increment contains."""
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(1, "spark stream spark"), (2, "join hash")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(2, "join window"), (3, "window stream novel")],
        "doc_id long, text string",
    )
    union = hist.unionByName(batch)
    p_full, s_full = T.bm25_index(union)
    tf_hist = T.bm25_index(hist)[0].select("doc_id", "term", "tf")
    tf_batch = T.bm25_index(batch)[0].select("doc_id", "term", "tf")
    tf_maintained = (
        tf_hist.unionByName(tf_batch)
        .groupBy("doc_id", "term")
        .agg(F.sum("tf").cast("bigint").alias("tf"))
    )
    # bucket modulus derived from the index's OWN stats row (the
    # repeated-literal footgun postings_from_tf now refuses); a
    # mismatching explicit cross-check must refuse loudly
    p_maint = T.postings_from_tf(tf_maintained, "doc_id", stats=s_full)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="built with n_buckets=64"):
        T.postings_from_tf(tf_maintained, "doc_id", 32, stats=s_full)
    with _pytest.raises(ValueError, match="needs n_buckets"):
        T.postings_from_tf(tf_maintained, "doc_id")
    key = lambda r: (r["doc_id"], r["term"])
    assert sorted(map(tuple, p_maint.collect()), key=lambda t: t[:2]) == \
        sorted(map(tuple, p_full.collect()), key=lambda t: t[:2])
    probe_full = T.bm25_probe(p_full, s_full, QUERIES, k=10).collect()
    probe_maint = T.bm25_probe(p_maint, s_full, QUERIES, k=10).collect()
    assert sorted(map(tuple, probe_maint)) == sorted(map(tuple, probe_full))


def test_bm25_probe_indexed_self_describes_bucket_count(spark, tmp_path):
    """The index persists its own n_buckets: a probe never repeats the
    build parameter (pruning derives from the stats row), and an
    explicit mismatching cross-check REFUSES instead of silently
    pruning away matching partitions (mod-32 postings probed mod-64
    would drop most query terms' buckets -> wrong top-k, no error)."""
    import pytest

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    path = str(tmp_path / "bm25idx32")
    T.write_bm25_index(df, path, n_buckets=32)
    base = sorted(map(tuple, T.bm25_topk(df, QUERIES, k=10).collect()))
    got = sorted(
        map(tuple, T.bm25_probe_indexed(spark, path, QUERIES, k=10).collect())
    )
    assert got == base  # bucket count read from the index itself
    with pytest.raises(ValueError, match="built with n_buckets=32"):
        T.bm25_probe_indexed(spark, path, QUERIES, k=10, n_buckets=64)
    # explicit MATCHING cross-check passes
    ok = T.bm25_probe_indexed(spark, path, QUERIES, k=10, n_buckets=32)
    assert sorted(map(tuple, ok.collect())) == base
