"""Known-answer and property tests for the deterministic UDFs and the
pure-Python cipher (SURVEY §5: unit-test the 3 UDFs; crypto round-trip
per encryption.py:326-353).
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.functions.crypto import (
    salsa20_decrypt_str,
    salsa20_encrypt_str,
    salsa20_xor,
)
from mongodb_etl_migration_spark.functions.keys import (
    timeuuid_deterministic,
    uuid5_oid,
)


def test_salsa20_ecrypt_known_vector():
    """ECRYPT Salsa20/20 256-bit test vector (Set 1, vector# 0):
    key = 80 00 ... 00, IV = all-zero; first keystream bytes are
    published — the keystream equals encrypting zeros."""
    key = bytes([0x80] + [0] * 31)
    nonce = bytes(8)
    ks = salsa20_xor(key, nonce, bytes(64))
    expected_start = bytes.fromhex(
        "e3be8fdd8beca2e3ea8ef9475b29a6e7"
        "003951e1097a5c38d23b7a5fad9f6844"
    )
    assert ks[:32] == expected_start


def test_salsa20_roundtrip_and_edge_semantics():
    for text in ["hello", "", "ñandú ✓ unicode", "x" * 5000]:
        enc = salsa20_encrypt_str("migration-key", "iv123", text)
        assert salsa20_decrypt_str("migration-key", "iv123", enc) == text
    # reference edge semantics (encryption.py:58-91)
    assert salsa20_decrypt_str("k", "i", None) is None
    assert salsa20_decrypt_str("k", "i", "") == ""
    assert salsa20_decrypt_str("k", "i", "!!!not-base64!!!") is None


def test_uuid5_udf_matches_python(spark):
    ids = [f"{i:024x}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in ids], "mongo_id string")
    got = {
        r["mongo_id"]: r["u"]
        for r in df.select(
            "mongo_id", uuid5_oid(F.col("mongo_id")).alias("u")
        ).collect()
    }
    for s in ids:
        assert got[s] == str(_uuid.uuid5(_uuid.NAMESPACE_OID, s))


def test_uuid_column_forms_match_arrow_twins(spark):
    """The r14 JVM-codegen rewrites of uuid5_oid / timeuuid_deterministic
    must stay byte-equal to the original Arrow-batched implementations
    (kept as *_arrow twins) on every edge shape: NULLs, empty string,
    multi-byte unicode, long strings, epoch/negative timestamps."""
    from mongodb_etl_migration_spark.functions.keys import (
        timeuuid_deterministic_arrow,
        uuid5_oid_arrow,
    )

    ids = [
        "",
        "ñandú ✓ unicode",
        "💡🎉",
        "x" * 5000,
        "room:42",
        "a\tb\nc",
        None,
    ] + [f"{i:024x}" for i in range(20)]
    df = spark.createDataFrame([(s,) for s in ids], "mongo_id string")
    for r in df.select(
        uuid5_oid(F.col("mongo_id")).alias("col_form"),
        uuid5_oid_arrow(F.col("mongo_id")).alias("arrow_form"),
    ).collect():
        assert r["col_form"] == r["arrow_form"]

    tu_rows = [
        ("edge", 0),
        ("edge2", 1),
        ("neg", -1000),
        (None, 123),
        ("nullms", None),
    ] + [(f"{i:024x}", 1_600_000_000_000 + i * 997) for i in range(20)]
    df2 = spark.createDataFrame(tu_rows, "mongo_id string, ms long")
    for r in df2.select(
        timeuuid_deterministic(F.col("mongo_id"), F.col("ms")).alias("col_form"),
        timeuuid_deterministic_arrow(F.col("mongo_id"), F.col("ms")).alias(
            "arrow_form"
        ),
    ).collect():
        assert r["col_form"] == r["arrow_form"]

    # double ts_millis with NaN (ADVICE r14): the twin returns NULL via
    # pd.isna; the Column form must too (cast('long') would give 0)
    nan_rows = [
        ("nan", float("nan")),
        ("ok", 1_600_000_000_000.0),
        ("zero", 0.0),
        (None, float("nan")),
    ]
    df3 = spark.createDataFrame(nan_rows, "mongo_id string, ms double")
    for r in df3.select(
        F.col("mongo_id"),
        timeuuid_deterministic(F.col("mongo_id"), F.col("ms")).alias(
            "col_form"
        ),
        timeuuid_deterministic_arrow(F.col("mongo_id"), F.col("ms")).alias(
            "arrow_form"
        ),
    ).collect():
        assert r["col_form"] == r["arrow_form"], r["mongo_id"]


def test_timeuuid_properties(spark):
    rows = [(f"{i:024x}", 1_600_000_000_000 + i * 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "mongo_id string, ms long")
    out = df.select(
        "mongo_id",
        "ms",
        timeuuid_deterministic(F.col("mongo_id"), F.col("ms")).alias("tu"),
    ).collect()
    for r in out:
        u = _uuid.UUID(r["tu"])
        assert u.version == 1
        # embedded timestamp round-trips to the input milliseconds
        ms = (u.time - 0x01B21DD213814000) // 10000
        assert ms == r["ms"]
    # determinism: same inputs → same uuid (two evaluations)
    again = {
        r["mongo_id"]: r["tu"]
        for r in df.select(
            "mongo_id",
            timeuuid_deterministic(F.col("mongo_id"), F.col("ms")).alias("tu"),
        ).collect()
    }
    for r in out:
        assert again[r["mongo_id"]] == r["tu"]


def test_crypto_migration_roundtrip_flags(spark, sf_dir):
    """x_crypto_migration's roundtrip_ok must be TRUE for every row —
    the driver's rows-only gate can't see the values, so assert here."""
    from mongodb_etl_migration_spark.queries import QUERIES

    out = QUERIES["x_crypto_migration"](spark, sf_dir)
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    # the query encrypts every source row (data-independent, so the
    # DuckDB oracle can mirror it); all must come back re-encrypted
    assert out.filter(~F.col("reencrypted")).count() == 0


def test_crypto_migration_plaintext_passthrough(spark):
    """Reference branch semantics (encryption.py:290-324): sources that
    are not decryptable ciphertext are treated as already-plaintext and
    pass through with NULL content_encrypted / encryption_data."""
    from mongodb_etl_migration_spark.functions import crypto as X

    enc = X.make_salsa20_encrypt_udf("fixture-old-key", "fixt-iv")
    df = spark.createDataFrame(
        [(1, "not base64 ciphertext !!"), (2, "secret payload")],
        "id int, text string",
    ).select(
        "id",
        F.when(F.col("id") == 2, enc(F.col("text")))
        .otherwise(F.col("text"))
        .alias("content"),
        "text",
    )
    out = X.migrate_messages(
        df, "content", "fixture-old-key", "fixt-iv",
        master_key_hex="a" * 64, master_iv_hex="b" * 32,
    ).collect()
    by_id = {r["id"]: r for r in out}
    # plaintext row: passthrough, nothing encrypted
    assert by_id[1]["content_decrypted"] == "not base64 ciphertext !!"
    assert by_id[1]["content_encrypted"] is None
    assert by_id[1]["encryption_data"] is None
    # ciphertext row: decrypts to the original and is re-encrypted
    assert by_id[2]["content_decrypted"] == "secret payload"
    assert by_id[2]["content_encrypted"] is not None
    assert by_id[2]["encryption_data"] is not None
