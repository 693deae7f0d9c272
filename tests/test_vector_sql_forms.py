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
