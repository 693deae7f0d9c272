"""Byte-equality of with_gopher_repetition's two engines.

The r15 Arrow-vectorized gram-fold kernel (gopher_fold_arrow) must
reproduce the pure-codegen SQL folds bit-for-bit: every fraction is an
integer-over-integer IEEE division downstream of the folds, so equal
integer (top, dup) pairs ⇒ equal doubles ⇒ equal oracle hashes. The
suite pins the full output frame (all 15 columns) across engines over
the edge cases the kernel branches on: NULL/empty text, <n tokens,
unicode (code-point lengths), repeated lines/grams, long docs spanning
batch rows, and caller-supplied token arrays WITH NULL elements (the
per-row reference fallback path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators import text as T
from mongodb_etl_migration_spark.operators.text import (
    _GOPHER_FOLD_FIELDS,
    _GOPHER_NS,
    _gopher_fold_batch,
    _gopher_fold_ref_row,
)


def _both(df, **kw):
    a = T.with_gopher_repetition(df, "text", engine="arrow", **kw)
    s = T.with_gopher_repetition(df, "text", engine="sql", **kw)
    ra = sorted(a.collect(), key=lambda r: r["doc_id"])
    rs = sorted(s.collect(), key=lambda r: r["doc_id"])
    assert len(ra) == len(rs)
    for x, y in zip(ra, rs):
        assert x == y, (
            f"engine mismatch doc {x['doc_id']}: "
            + ", ".join(
                f"{k}: {x[k]!r} != {y[k]!r}"
                for k in x.asDict()
                if x[k] != y[k]
            )
        )
    return ra


def test_engines_match_on_edge_cases(spark):
    rows = [
        (1, "the cat sat on the mat the cat sat on the mat"),
        (2, None),
        (3, ""),
        (4, "one"),
        (5, "a " * 40),  # one token repeated: every n saturates
        (6, "x1 y2 z3\nx1 y2 z3\nx1 y2 z3\n\n  \nunique line"),
        (7, "Ünïcode tökens ünïcode tökens ünïcode tökens"),
        (8, "ab cd " * 1500),  # long doc, windows span numpy batches
        (9, "\n\n\n"),
        (10, " ".join(f"w{i % 7}" for i in range(60))),
        (11, "9 8 7 6 5 4 3 2 1 0 9 8 7 6 5 4 3 2 1 0"),
        (12, "exactly ten tokens here so the ten gram fires once ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = _both(df)
    # sanity: the repeated-text rows actually exercise the folds
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[5]["dup_10gram_char_frac"] > 0
    assert by_id[1]["top_2gram_char_frac"] > 0
    assert by_id[2]["gopher_rep_pass"] is not None


def test_engines_match_with_supplied_tokens_and_null_elements(spark):
    # caller-supplied token arrays, including NULL elements —
    # array_join SKIPS nulls; the arrow kernel must route such rows
    # through the exact per-row reference
    rows = [
        (1, "ignored", ["a", "b", "a", "b", "a"]),
        (2, "ignored", ["a", None, "b", "a", None, "b"]),
        (3, "ignored", None),
        (4, "ignored", []),
        (5, "ignored", [None, None, None]),
        (6, "ignored", ["solo"]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, toks array<string>"
    )
    _both(df, toks_col="toks")


def test_kernel_matches_reference_rowwise(spark):
    import random

    import pyarrow as pa

    rng = random.Random(1517)
    vocab = ["a", "bb", "ccc", "dddd", "é", "xy1", "zz"]
    lists = [
        [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
        for _ in range(200)
    ] + [None, [], ["a"], ["a"] * 25]
    got = _gopher_fold_batch(pa.array(lists, type=pa.list_(pa.string())))
    for i, toks in enumerate(lists):
        want = _gopher_fold_ref_row(toks)
        for f in _GOPHER_FOLD_FIELDS:
            assert got.field(f)[i].as_py() == want[f], (i, f, toks)


def test_arrow_engine_plan_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b a b")], "doc_id bigint, text string"
    )
    plan = (
        T.with_gopher_repetition(df, "text", engine="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    # the sql engine stays pure codegen
    plan_sql = (
        T.with_gopher_repetition(df, "text", engine="sql")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan_sql


def test_fold_field_order_is_ns_major(spark):
    assert _GOPHER_FOLD_FIELDS == tuple(
        f"{k}{n}" for n in _GOPHER_NS for k in ("t", "d")
    )
    assert _GOPHER_NS == (2, 3, 4, 5, 6, 7, 8, 9, 10)


def test_engine_arg_validated(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    try:
        T.with_gopher_repetition(df, "text", engine="duckdb")
    except ValueError as exc:
        assert "engine" in str(exc)
    else:
        raise AssertionError("bad engine accepted")
