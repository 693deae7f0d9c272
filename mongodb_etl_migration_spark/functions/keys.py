"""Surrogate-key generation — SURVEY.md §2.4 (K1–K3).

The reference generates keys with in-memory caches and counters
(etl/utils/cassandra_id_mapper.py); here every key is a deterministic
function of the input so both outputs of a dual-destination entity (and
any re-run) agree by construction — no cross-DB sync step (K4) needed.
"""

from __future__ import annotations

import hashlib
import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# Shared hex formatting for the JVM-side UUID builders: Spark's hex()
# is uppercase with no leading zeros; RFC-4122 text is lowercase,
# fixed-width.
def _hex_field(col: Column, width: int) -> Column:
    return F.lpad(F.lower(F.hex(col)), width, "0")


# uuid.NAMESPACE_OID.bytes — the 16-byte RFC-4122 OID namespace.
_NS_OID_HEX = "6BA7B8129DAD11D180B400C04FD430C8"


# ------------------------------------------------------------------- K1
def uuid5_oid(mongo_id: Column | str) -> Column:
    """Deterministic UUID5(NAMESPACE_OID, mongo_id) —
    etl/utils/cassandra_id_mapper.py:45-71.

    Same input ⇒ same UUID across entities/runs; the keystone the
    reference validates at scripts/validate_migration.py:234-270.

    Pure Column expression (JVM codegen): RFC-4122 §4.3 composes the
    v5 uuid from sha1(namespace_bytes || utf8(name)) — Spark's sha1()
    returns exactly that digest as 40 lowercase hex chars, and the
    layout is hex slicing plus two nibble patches (version '5' at
    digest byte 6's high nibble, variant 10xx at byte 8's top bits).
    Replaces the former pandas UDF (kept as ``uuid5_oid_arrow`` for
    the equivalence test): no JVM→Python hop, no Arrow transpose —
    guide §4.1 "always prefer built-ins". NULL in ⇒ NULL out (concat
    propagates the NULL sha1).
    """
    c = F.col(mongo_id) if isinstance(mongo_id, str) else mongo_id
    h = F.sha1(F.concat(F.unhex(F.lit(_NS_OID_HEX)), F.encode(c, "UTF-8")))
    clock_hi = (
        F.conv(F.substring(h, 17, 2), 16, 10)
        .cast("int")
        .bitwiseAND(F.lit(0x3F))
        .bitwiseOR(F.lit(0x80))
    )
    return F.concat(
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.lit("5"), F.substring(h, 14, 3), F.lit("-"),
        _hex_field(clock_hi, 2), F.substring(h, 19, 2), F.lit("-"),
        F.substring(h, 21, 12),
    )


@pandas_udf(StringType())
def uuid5_oid_arrow(mongo_id: pd.Series) -> pd.Series:
    """Arrow-batched reference twin of :func:`uuid5_oid` (the original
    implementation) — suite-pinned byte-equal to the Column form."""
    return mongo_id.map(
        lambda s: str(uuid.uuid5(uuid.NAMESPACE_OID, s)) if s is not None else None
    )


# ------------------------------------------------------------------- K2
def timeuuid_deterministic(
    mongo_id: Column | str, ts_millis: Column | str
) -> Column:
    """RFC-4122 v1-format UUID whose 60-bit timestamp comes from
    ``ts_millis`` and whose clock-seq/node bits are sha1(mongo_id) —
    etl/utils/cassandra_id_mapper.py:116-138 re-expressed determinis-
    tically (the reference uses random clock-seq/node; the only property
    its schema relies on is timestamp-prefix ordering,
    backups/create_scylla_database.cql:46 — preserved here, plus
    replayability the reference lacks; SURVEY.md §7.4.2).

    Pure Column expression (JVM codegen) since round 14: the time
    fields are long bit-arithmetic over ``100-ns intervals since
    1582-10-15`` and the sha1-derived bits are hex slices of Spark's
    sha1() — no Python boundary (guide §4.1). The former pandas UDF
    survives as ``timeuuid_deterministic_arrow`` for the equivalence
    test. NULL mongo_id or NULL ts ⇒ NULL uuid, as before.
    """
    mid = F.col(mongo_id) if isinstance(mongo_id, str) else mongo_id
    ms = F.col(ts_millis) if isinstance(ts_millis, str) else ts_millis
    # NaN guard (ADVICE r14): a double NaN would cast('long') to 0
    # under non-ANSI Spark (a uuid at the 1582 epoch) while the Arrow
    # twin returns NULL via pd.isna — align on NULL. Integral inputs
    # pass through the double cast losslessly for the check only.
    ms = F.when(~F.isnan(ms.cast("double")), ms)
    # 100-ns intervals since 1582-10-15 (RFC 4122 epoch offset).
    ts = ms.cast("long") * F.lit(10000) + F.lit(0x01B21DD213814000)
    time_low = ts.bitwiseAND(F.lit(0xFFFFFFFF))
    time_mid = F.shiftright(ts, 32).bitwiseAND(F.lit(0xFFFF))
    time_hi_version = (
        F.shiftright(ts, 48).bitwiseAND(F.lit(0x0FFF)).bitwiseOR(F.lit(0x1000))
    )
    h = F.sha1(F.encode(mid, "UTF-8"))
    clock_hi = (
        F.conv(F.substring(h, 1, 2), 16, 10)
        .cast("int")
        .bitwiseAND(F.lit(0x3F))
        .bitwiseOR(F.lit(0x80))
    )
    return F.concat(
        _hex_field(time_low, 8), F.lit("-"),
        _hex_field(time_mid, 4), F.lit("-"),
        _hex_field(time_hi_version, 4), F.lit("-"),
        _hex_field(clock_hi, 2), F.substring(h, 3, 2), F.lit("-"),
        F.substring(h, 5, 12),
    )


@pandas_udf(StringType())
def timeuuid_deterministic_arrow(
    mongo_id: pd.Series, ts_millis: pd.Series
) -> pd.Series:
    """Arrow-batched reference twin of :func:`timeuuid_deterministic`
    (the original implementation) — suite-pinned byte-equal to the
    Column form."""

    def one(mid: str | None, ms: float | None) -> str | None:
        if mid is None or ms is None or pd.isna(ms):
            return None
        # 100-ns intervals since 1582-10-15 (RFC 4122 epoch offset).
        timestamp = int(ms) * 10000 + 0x01B21DD213814000
        time_low = timestamp & 0xFFFFFFFF
        time_mid = (timestamp >> 32) & 0xFFFF
        time_hi_version = ((timestamp >> 48) & 0x0FFF) | (1 << 12)
        h = hashlib.sha1(mid.encode("utf-8")).digest()
        clock_seq = ((h[0] & 0x3F) | 0x80) << 8 | h[1]
        node = int.from_bytes(h[2:8], "big")
        return str(
            uuid.UUID(
                fields=(time_low, time_mid, time_hi_version,
                        clock_seq >> 8, clock_seq & 0xFF, node)
            )
        )

    return pd.Series(
        [one(m, t) for m, t in zip(mongo_id, ts_millis)], dtype="object"
    )


# ------------------------------------------------------------------- K3
def assign_sequential_ids(
    df: DataFrame,
    order_by: list[Column | str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous sequential int ids, deterministic given sort order —
    etl/utils/cassandra_id_mapper.py:212-230,257-267 (global counter
    resumed from MAX(id)+1) re-expressed scalably.

    A naive global ``row_number()`` over an un-partitioned window pulls
    every row through ONE task — unusable at 100 TB. Instead:

    1. range-partition by the ordering key (parallel sort),
    2. number rows within each partition (no extra shuffle),
    3. add per-partition offsets computed from partition counts
       (a tiny driver-side collect of #partitions integers, broadcast
       back via join on partition id).

    Wall-clock is one range shuffle + one window within partitions —
    the same cost profile as a distributed sort.

    ``numbered`` is localCheckpoint'ed before the counts collect:
    repartitionByRange samples its range bounds with a nondeterministic
    seed, so WITHOUT pinning, the counts job and the final id-emission
    job could place boundary rows in different __pid partitions —
    silently duplicating or dropping ids. The checkpoint materializes
    one partition assignment that both jobs read (it also means the
    data is written once to executor-local storage — the price of a
    consistent global numbering, same as any distributed sort that
    must be read twice).

    ``num_partitions`` sizes the range shuffle; it defaults to
    ``spark.sql.shuffle.partitions``. Callers numbering a KNOWN
    dimension-sized set (e.g. a folder tree) should pass a small
    value — every range partition is a task in three jobs here
    (checkpoint, counts, emission), so 32 partitions of 100 rows is
    pure scheduling overhead, while at fact-table scale the default
    keeps the sort parallel.
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = df.repartitionByRange(int(n_part), *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    numbered = ranged.withColumn("__rn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    counts = (
        numbered.groupBy("__pid").agg(F.count("*").alias("__cnt")).collect()
    )
    offsets = {}
    acc = start - 1
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__cnt"]
    spark = df.sparkSession
    # explicit schema: an EMPTY input yields zero offsets, and
    # createDataFrame cannot infer a schema from an empty list (the
    # pipeline must produce an empty output, not crash)
    off_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        "__pid INT, __off BIGINT",
    )
    return (
        numbered.join(F.broadcast(off_df), "__pid")
        .withColumn(id_col, (F.col("__rn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__rn", "__off")
    )


def first_wins_dedup(df: DataFrame, key: str, order_by: list[Column | str]) -> DataFrame:
    """First-wins id-cache semantics (A7) made deterministic —
    etl/utils/cassandra_id_mapper.py:61-69,89-113 assign on first sight
    in arrival order; here "first" is defined by an explicit ordering
    (SURVEY.md §7.4.3)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
