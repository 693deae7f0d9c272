"""SQL-template MinHash builders must equal their Column twins.

r14 construction-cost fix (the pass-12/13 device applied to the
MinHash signature pipeline): ``with_shingle_column`` and
``minhash_signatures_narrow`` build their shingle/base-hash/affine
expressions via one ``F.expr`` parse each. The original Column
builders (``_shingle_expr``, ``shingle_base_hash``) stay for other
call sites and as the reference twins pinned here — over empty/short/
NULL texts, duplicate shingles, unicode, and every affine seed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators.dedup import (
    MINHASH_P,
    _shingle_expr,
    _shingle_expr_sql,
    affine_params,
    minhash_signatures_narrow,
    shingle_base_hash,
)
from mongodb_etl_migration_spark.operators.text import tokens

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a b",                                   # shorter than k → empty array
    "",
    None,
    "dup dup dup dup dup",                   # duplicate shingles collapse
    "ñ unicode 💡 tokens here and more",
    "x " * 200,
]


def test_shingle_sql_matches_column_form(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    ).select("doc_id", tokens("text").alias("_toks"))
    rows = df.select(
        F.expr(_shingle_expr_sql("`_toks`", 3)).alias("s"),
        _shingle_expr(F.col("_toks"), 3).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"]


def test_minhash_narrow_sql_matches_column_form(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r
        for r in minhash_signatures_narrow(df, "doc_id", "text").collect()
    }
    # Column-form reference: same pipeline built through the original
    # builders, seed by seed
    base = df.select(
        F.col("doc_id"),
        F.transform(
            _shingle_expr(tokens("text"), 3), shingle_base_hash
        ).alias("_h"),
    )
    ref_cols = [
        F.array_min(
            F.transform(
                F.col("_h"), lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P
            )
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(affine_params(16))
    ]
    for r in base.select("doc_id", *ref_cols).collect():
        g = got[r["doc_id"]]
        for i in range(16):
            assert g[f"sig_{i}"] == r[f"sig_{i}"], (r["doc_id"], i)
