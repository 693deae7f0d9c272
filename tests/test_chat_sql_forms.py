"""SQL-template GPT-2/chat encode chains must equal their Column twins.

r14 construction-cost fix (the pass-6/pass-12 device applied to the
BPE encode chain): ``gpt2_encoded`` / ``gpt2_token_ids`` /
``chat.sft_tokens`` emit ONE parseable SQL string when given a column
NAME and keep the original Column-builder form for Column inputs.
This file pins the two forms byte-equal over adversarial inputs —
quotes/backslashes/tabs/newlines (the SQL literal escaping), unicode
(OOV NULL ids), NULL/empty strings, NULL roles/contents, empty
conversations — across both templates and the special-ids mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.operators import chat as CH
from mongodb_etl_migration_spark.operators import text as T

MERGES = T.parse_merges(
    """\
Ġ t
Ġ a
h e
i n
r e
o n
he llo
w o
r l
d s
"""
)

TEXTS = [
    "hello world",
    "",
    None,
    "it's a test\nwith newline\tand tab",
    "quote ' and \\ backslash",
    "ñ unicode 💡",
    "  spaces  ",
    "the quick brown fox",
    "a" * 200,
]

CONVS = [
    [(0, "user", "hello there"), (1, "assistant", "hi! it's me"), (2, "user", "bye")],
    [(0, "assistant", "only assistant\nmultiline")],
    [(0, None, "null role"), (1, "assistant", None)],
    [],
    [(0, "system", "you're helpful"), (1, "assistant", "quote ' \\ tab\t")],
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "i int, t string"
    )


@pytest.fixture(scope="module")
def conv_df(spark):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(CONVS)],
        f"doc_id int, turns {CH.TURN_STRUCT}",
    )


def test_gpt2_encoded_sql_matches_column_form(text_df):
    rows = text_df.select(
        T.gpt2_encoded("t", MERGES).alias("s"),
        T.gpt2_encoded(F.col("t"), MERGES).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"]


def test_gpt2_token_ids_sql_matches_column_form(text_df):
    rows = text_df.select(
        T.gpt2_token_ids("t", MERGES).alias("s"),
        T.gpt2_token_ids(F.col("t"), MERGES).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"]


@pytest.mark.parametrize("template", ["tagged", "chatml"])
@pytest.mark.parametrize("use_special", [False, True])
def test_sft_tokens_sql_matches_column_form(conv_df, template, use_special):
    sids = (
        CH.special_token_ids(MERGES, ["<|im_start|>", "<|im_end|>"])
        if use_special
        else None
    )
    rows = conv_df.select(
        CH.sft_tokens("turns", MERGES, template, special_ids=sids).alias("s"),
        CH.sft_tokens(
            F.col("turns"), MERGES, template, special_ids=sids
        ).alias("c"),
    ).collect()
    for r in rows:
        assert r["s"] == r["c"]


def test_sql_templates_refuse_legacy_escaping(spark):
    """ADVICE r14: under spark.sql.parser.escapedStringLiterals=true
    every _sql_str-templated literal silently changes value while the
    Column twins keep working — the builders must fail loudly."""
    import pytest

    from mongodb_etl_migration_spark.operators import text as T

    T._ESCAPE_CONF_CHECKED.clear()
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        with pytest.raises(ValueError, match="escapedStringLiterals"):
            T._sql_str("a\\b")
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
        T._ESCAPE_CONF_CHECKED.clear()
    assert T._sql_str("a'b") == "'a\\'b'"


def test_gpt2_dotted_name_falls_back_to_column_path(spark):
    """ADVICE r14: gpt2_encoded/gpt2_token_ids with a dotted name must
    resolve nested fields like F.col, not a literal backticked column."""
    from mongodb_etl_migration_spark.operators.text import (
        gpt2_encoded,
        gpt2_token_ids,
    )

    merges = [("h", "e"), ("he", "l")]
    df = spark.createDataFrame(
        [(1, ("hello",))], "id int, s struct<txt:string>"
    )
    out = df.select(
        gpt2_encoded("s.txt", merges).alias("e"),
        gpt2_encoded(F.col("s.txt"), merges).alias("e_c"),
        gpt2_token_ids("s.txt", merges).alias("i"),
        gpt2_token_ids(F.col("s.txt"), merges).alias("i_c"),
    ).collect()[0]
    assert out["e"] == out["e_c"]
    assert out["i"] == out["i_c"]
