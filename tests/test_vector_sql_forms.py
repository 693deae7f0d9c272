"""SQL-template vector helpers must equal their Column-builder twins.

The r14 construction-cost fix (one ``F.expr`` parse instead of several
py4j round-trips per higher-order function) keeps BOTH forms in
``operators/similarity.py``: passing a column NAME takes the SQL
template, passing a Column takes the original HOF builders. This file
pins the two forms value-equal over the edge shapes that could diverge
(empty / NULL / NULL-element / unequal-length arrays, integer inputs,
negative zero and extreme-exponent plane literals — the repr()-based
double serialization must round-trip exactly).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators.similarity import (
    _dvec,
    dot,
    hyperplane_bucket,
    norm,
)

ROWS = [
    (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
    (2, [], []),
    (3, None, [1.0, 2.0]),
    (4, [1.0, None, 3.0], [1.0, 1.0, 1.0]),
    (5, [1.0, 2.0], [1.0, 2.0, 3.0]),          # unequal → zip_with pads NULL
    (6, [-0.0, 0.0], [1.0, -1.0]),
    (7, [1e-300, -1e300], [1e300, 1e-300]),
    (8, [-1.5, 2.5], None),
]

PLANES = [
    [1.0, -1.0, 0.5],
    [-0.0, 1e-300, -2.5e17],
    [0.1, 0.2, 0.30000000000000004],            # non-terminating binary reprs
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        ROWS, "id int, a array<double>, b array<double>"
    )


def _pairs(df, col_sql, col_col):
    out = df.select("id", col_sql.alias("s"), col_col.alias("c")).collect()
    return [(r["id"], r["s"], r["c"]) for r in out]


def _assert_equal(pairs):
    for rid, s, c in pairs:
        if isinstance(s, float) and isinstance(c, float):
            assert (s == c) or (math.isnan(s) and math.isnan(c)), (rid, s, c)
        else:
            assert s == c, (rid, s, c)


def test_dot_sql_matches_column_form(vec_df):
    _assert_equal(_pairs(vec_df, dot("a", "b"), dot(F.col("a"), F.col("b"))))


def test_norm_sql_matches_column_form(vec_df):
    _assert_equal(_pairs(vec_df, norm("a"), norm(F.col("a"))))


def test_dvec_sql_matches_column_form(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, []), (3, None), (4, [-7, None])],
        "id int, a array<int>",
    )
    out = df.select(
        _dvec("a").alias("s"), _dvec(F.col("a")).alias("c")
    ).collect()
    for r in out:
        assert r["s"] == r["c"]


def test_hyperplane_bucket_sql_matches_column_form(vec_df):
    good = vec_df.filter(F.col("id").isin(1, 2, 6, 7))  # non-NULL vectors
    _assert_equal(
        _pairs(
            good,
            hyperplane_bucket("a", PLANES),
            hyperplane_bucket(F.col("a"), PLANES),
        )
    )
    # NULL vectors: both forms must agree on the NULL-propagation shape
    nulls = vec_df.filter(F.col("id") == 3)
    _assert_equal(
        _pairs(
            nulls,
            hyperplane_bucket("a", PLANES),
            hyperplane_bucket(F.col("a"), PLANES),
        )
    )


def test_dotted_names_fall_back_to_column_path(spark):
    """ADVICE r14: a name containing '.' previously resolved as a
    nested-field reference under F.col but the SQL fast path turned
    it into a literal backticked column — the helpers must route
    non-simple names through the Column builders."""
    from mongodb_etl_migration_spark.operators.similarity import dot, norm

    df = spark.createDataFrame(
        [(1, ([1.0, 2.0], [3.0, 4.0]))],
        "id int, s struct<vec:array<double>, w:array<double>>",
    )
    out = df.select(
        dot("s.vec", "s.w").alias("d"),
        norm("s.vec").alias("n"),
        _dvec("s.vec").alias("v"),
        hyperplane_bucket("s.vec", PLANES).alias("b"),
        dot(F.col("s.vec"), F.col("s.w")).alias("d_c"),
        norm(F.col("s.vec")).alias("n_c"),
        hyperplane_bucket(F.col("s.vec"), PLANES).alias("b_c"),
    ).collect()[0]
    assert out["d"] == out["d_c"] == 11.0
    assert out["n"] == out["n_c"]
    assert out["v"] == [1.0, 2.0]
    assert out["b"] == out["b_c"]


def test_nonfinite_plane_literals_match_column_form(spark):
    """ADVICE r14: repr() spells non-finite floats 'inf'/'nan', which
    the SQL parser rejects — _f8_sql must emit the CAST spelling so
    both forms build AND agree."""
    import math

    from mongodb_etl_migration_spark.operators.similarity import (
        _f8_sql,
        lit_vec,
        lit_vec_sql,
    )

    assert _f8_sql(float("inf")) == "cast('Infinity' as double)"
    assert _f8_sql(float("-inf")) == "cast('-Infinity' as double)"
    assert _f8_sql(float("nan")) == "cast('NaN' as double)"
    v = [1.5, float("inf"), float("-inf"), float("nan")]
    got_sql = spark.sql(f"select {lit_vec_sql(v)} as v").collect()[0]["v"]
    got_col = spark.range(1).select(lit_vec(v).alias("v")).collect()[0]["v"]
    assert got_sql[:3] == got_col[:3] == [1.5, math.inf, -math.inf]
    assert math.isnan(got_sql[3]) and math.isnan(got_col[3])


def test_pq_sql_form_matches_column_form(spark):
    """r15: pq_encode/ivf_pq_topk build their per-subspace argmin as
    ONE parsed SQL expression (_pq_best_sql) instead of per-element
    F.lit Column chatter (~4 s construction per PQ query). The SQL
    form must stay value-equal to the original Column tree — pinned
    here over md5-derived subvectors incl. tie shapes (equal d2 →
    smaller code wins via struct ordering)."""
    import hashlib

    from mongodb_etl_migration_spark.operators.similarity import (
        _pq_best_sql,
    )

    def h(s, lo, hi):
        v = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        return v % (hi - lo) + lo

    book = [
        [h(f"b{c}:{e}", -50, 50) for e in range(4)] for c in range(6)
    ]
    book[3] = list(book[1])  # duplicate centroid: forced d2 tie
    rows = [
        (i, [h(f"v{i}:{e}", -50, 50) for e in range(4)]) for i in range(40)
    ] + [(100, list(book[1])), (101, [0, 0, 0, 0])]
    df = spark.createDataFrame(rows, "id int, sub array<bigint>")

    def column_form(sub):
        return F.array_min(
            F.array(
                *[
                    F.struct(
                        F.aggregate(
                            F.zip_with(
                                sub,
                                F.array(
                                    *[
                                        F.lit(int(v)).cast("long")
                                        for v in cvec
                                    ]
                                ),
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, x: acc + x,
                        ).alias("d2"),
                        F.lit(c).cast("int").alias("code"),
                    )
                    for c, cvec in enumerate(book)
                ]
            )
        )

    out = df.select(
        F.expr(_pq_best_sql("`sub`", book)).alias("s"),
        column_form(F.col("sub")).alias("c"),
    ).collect()
    for r in out:
        assert r["s"] == r["c"]
    # the duplicated centroid's tie resolves to the smaller code
    tie = df.filter("id = 100").select(
        F.expr(_pq_best_sql("`sub`", book)).alias("s")
    ).collect()[0]["s"]
    assert tie["code"] == 1 and tie["d2"] == 0
