"""Deterministic Mongo-shaped fixtures (FIXTURES.md §2).

Generates the reference's source-document shapes — nested structs,
field-name drift, ObjectId-or-embedded-doc references, missing fields,
materialized-path folders — as Spark DataFrames with explicit schemas.
No RNG: every value is a function of (collection, row index), so
surrogate keys and goldens are stable across runs (FIXTURES.md §4).

The `_id`-or-`{_id: ...}` reference drift is modeled as a two-field
struct ``ref(id=..., raw=...)`` where exactly one side is set; the
pipeline coalesces (`data_transformer.py:278-299`,
`field_mapper.py:511-518`).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EPOCH = datetime(2020, 9, 13, 12, 0, 0)  # fixed; no wall clock

REF = T.StructType(
    [T.StructField("_id", T.StringType()), T.StructField("raw", T.StringType())]
)


def oid(coll: str, i: int) -> str:
    """24-hex ObjectId derived from (collection, index) — FIXTURES §4."""
    return hashlib.sha1(f"{coll}:{i}".encode()).hexdigest()[:24]


def ts(i: int) -> datetime:
    return EPOCH + timedelta(minutes=i)


def ref_embedded(coll: str, i: int) -> tuple[str, None]:
    return (oid(coll, i), None)


def ref_bare(coll: str, i: int) -> tuple[None, str]:
    return (None, oid(coll, i))


def ref_for(coll: str, i: int, drift: int) -> tuple:
    """Alternate bare-ObjectId / embedded-doc representations."""
    return ref_embedded(coll, i) if drift % 2 == 0 else ref_bare(coll, i)


ROLE_NAMES = ["USER", "AGENTE", "ADMIN", "DIRECTOR"]

_PHONES = [
    "+58 412-555.1{:03d}",
    "0414 555 2{:03d}",
    "(0416) 555-3{:03d}",
    None,
]
_GENDERS = ["Masculino", "Femenino", "M", "F", "", None]
_DNIS = ["V{:08d}", "v-12.345.{:03d}", "{:08d}", None]


def roles_df(spark: SparkSession) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("default", T.BooleanType()),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = [
        (oid("roles", i), n, "app" if i % 2 == 0 else None, i == 0, ts(i))
        for i, n in enumerate(ROLE_NAMES)
    ]
    return spark.createDataFrame(rows, schema)


def provinces_df(spark: SparkSession, n: int = 5) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("keyInt", T.StringType()),
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
            T.StructField("isActive", T.BooleanType()),
        ]
    )
    rows = [
        (
            oid("provinces", i),
            f"Province {i}",
            f"PR{i}" if i % 3 != 2 else None,
            str(i) if i % 3 == 0 else ("" if i % 3 == 1 else None),
            10.0 + i * 0.25,
            -66.0 - i * 0.5,
            None if i % 2 == 0 else True,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def municipalities_df(spark: SparkSession, n: int = 8) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("province", REF),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = [
        (
            oid("municipalities", i),
            f"Municipality {i}",
            ref_for("provinces", i % 5, i),
            None if i % 3 == 0 else True,
            ts(400 + i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def parroquias_df(spark: SparkSession, n: int = 24) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("province", REF),
            T.StructField("municipality", REF),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = [
        (
            oid("parroquias", i),
            f"Parroquia {i}",
            ref_for("provinces", i % 5, i),
            # a few dangling municipality refs exercise miss ⇒ NULL
            ref_for("municipalities", i % 8, i + 1)
            if i % 11 != 10
            else ref_for("municipalities", 900 + i, i + 1),
            ts(450 + i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def users_df(spark: SparkSession, n: int = 120) -> DataFrame:
    social = T.StructType(
        [
            T.StructField("x", T.StringType()),
            T.StructField("instagram", T.StringType()),
            T.StructField("tiktok", T.StringType()),
            T.StructField("facebook", T.StringType()),
            T.StructField("whatsapp", T.StringType()),
            T.StructField("telegram", T.StringType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("displayName", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("fullName", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("phoneNumber", T.StringType()),
            T.StructField("phone", T.StringType()),
            T.StructField("cedula", T.StringType()),
            T.StructField("dni", T.StringType()),
            T.StructField("birthDate", T.DateType()),
            T.StructField("birthdate", T.DateType()),
            T.StructField("gender", T.StringType()),
            T.StructField("photoURL", T.StringType()),
            T.StructField("avatar", T.StringType()),
            T.StructField("socialMedia", social),
            T.StructField("userType", T.StringType()),
            T.StructField("role", T.StringType()),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("uuid", T.StringType()),
            T.StructField("province", REF),
            T.StructField("municipality", REF),
            T.StructField("profession", T.ArrayType(T.StringType())),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = []
    for i in range(n):
        drift = i % 3 != 0
        phone_fmt = _PHONES[i % 4]
        dni_fmt = _DNIS[i % 4]
        rows.append(
            (
                oid("users", i),
                f"User {i}" if drift else None,  # displayName
                None if drift else f"User {i}",  # name drift
                f"User Full {i}",
                f"  User{i}@Example.COM " if i % 7 != 6 else None,
                phone_fmt.format(i) if phone_fmt and i % 2 == 0 else None,
                phone_fmt.format(i) if phone_fmt and i % 2 == 1 else None,
                dni_fmt.format(12000000 + i if "8" in (dni_fmt or "") else i)
                if dni_fmt and i % 2 == 0
                else None,
                dni_fmt.format(12000000 + i if "8" in (dni_fmt or "") else i)
                if dni_fmt and i % 2 == 1
                else None,
                EPOCH.date() - timedelta(days=7000 + i) if i % 2 == 0 else None,
                EPOCH.date() - timedelta(days=7000 + i) if i % 2 == 1 else None,
                _GENDERS[i % 6],
                f"gs://sibci-devel.appspot.com/avatars/{i}.png"
                if i % 4 == 0
                else (f"https://cdn.example.com/a/{i}.png" if i % 4 == 1 else None),
                f"https://cdn.example.com/b/{i}.png" if i % 4 == 2 else None,
                (f"@u{i}", None, None, f"fb{i}", None, f"tg{i}")
                if i % 3 == 0
                else None,
                ROLE_NAMES[i % 4],
                ["USER_ROLE", "AGENTE_ROLE", "USER_ROLE", "USER_ROLE", "OTHER_ROLE"][
                    i % 5
                ],
                False if i % 10 == 7 else (True if i % 10 == 3 else None),
                f"fixed-uuid-{i}" if i % 5 != 4 else None,
                ref_for("provinces", i % 5, i),
                ref_for("municipalities", i % 8, i + 1),
                [oid("professions", i % 6), oid("professions", (i + 1) % 6)]
                if i % 3 == 0
                else ([] if i % 3 == 1 else None),
                ts(i) if i % 6 != 5 else None,
            )
        )
    return spark.createDataFrame(rows, schema)


def rooms_df(spark: SparkSession, n: int = 30) -> DataFrame:
    perms = T.StructType(
        [
            T.StructField("addMember", T.BooleanType()),
            T.StructField("editGroup", T.BooleanType()),
            T.StructField("sendMessage", T.BooleanType()),
            T.StructField("canSendMessage", T.BooleanType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("isGroup", T.BooleanType()),
            T.StructField("isBroadcast", T.BooleanType()),
            T.StructField("type", T.StringType()),
            T.StructField("permissions", perms),
            T.StructField("canWrite", T.BooleanType()),
            T.StructField("isAdmin", T.BooleanType()),
            T.StructField("isPublic", T.BooleanType()),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = []
    for i in range(n):
        # i%3==0 → p2p, 1 → group, 2 → broadcast
        is_group = i % 3 == 1
        is_broadcast = i % 3 == 2
        rows.append(
            (
                oid("rooms", i),
                f"Room {i}" if i % 4 != 3 else ("" if i % 8 == 3 else None),
                f"desc {i}" if i % 2 == 0 else None,
                is_group or None,
                is_broadcast or None,
                ["p2p", "group", "broadcast", "weird"][i % 4],
                (None, None, None, i % 2 == 0) if is_group else None,
                True if i % 5 != 4 else False,
                i % 5 == 0,
                i % 2 == 0,
                ts(1000 + i),
            )
        )
    return spark.createDataFrame(rows, schema)


BANNED_TYPES = ["GEO_LOCATION", "SURVEY", "CONTACT", "STICKER"]


def messages_df(
    spark: SparkSession, n: int = 400, n_rooms: int = 30, n_users: int = 120
) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("room", T.StringType()),
            T.StructField("sender", REF),
            T.StructField("message", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("msgType", T.StringType()),
            T.StructField("msgLife", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("isDeleted", T.BooleanType()),
            T.StructField("fileURL", T.StringType()),
            T.StructField("fileType", T.StringType()),
            T.StructField("fileName", T.StringType()),
            T.StructField("fileSize", T.LongType()),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    # file attachments: IMAGEN/.png, DOCUMENTO/.pdf (kept),
    # DOCUMENTO/.docx (dropped by F21's pdf-only rule), AUDIO/.mp3
    _files = {
        1: ("IMAGEN", "png"),
        3: ("DOCUMENTO", "pdf"),
        5: ("DOCUMENTO", "docx"),
        8: ("AUDIO", "mp3"),
    }
    rows = []
    for i in range(n):
        drift = i % 3 != 1
        banned = i % 13 == 12
        ftype, ext = _files.get(i % 11, (None, None))
        url = f"gs://sibci-2f7fc.appspot.com/files/{i}.{ext}" if ftype else None
        if ftype and i % 22 >= 11:
            # F26: half of each attachment class arrives Salsa20-
            # encrypted — the pipeline must decrypt BEFORE the
            # DOCUMENTO .pdf gate / bucket rewrite (an encrypted .pdf
            # would otherwise be dropped, data_transformer.py:397-452)
            from mongodb_etl_migration_spark.functions.crypto import (
                salsa20_encrypt_str,
            )
            from mongodb_etl_migration_spark.pipeline import (
                FILEURL_IV as _FIV,
                FILEURL_KEY as _FK,
            )

            url = salsa20_encrypt_str(_FK, _FIV, url)
        rows.append(
            (
                oid("messages", i),
                oid("rooms", i % n_rooms)
                if i % 29 != 28
                else oid("rooms", 10_000 + i),  # some orphan room refs
                ref_for("users", i % n_users, i),
                f"hello from message {i} " * (1 + i % 3) if drift else None,
                None if drift else f"hello from message {i}",
                BANNED_TYPES[i % 4] if banned else ["TEXT", "MEDIA"][i % 2],
                "TOUCH_SHOW_DELETE" if i % 17 == 16 else None,
                "user_message" if i % 2 == 0 else None,
                False if i % 19 == 18 else None,  # missing ⇒ active
                True if i % 23 == 22 else None,
                url,
                ftype,
                f"file{i}.{ext}" if ftype else None,
                1000 + i if ftype else None,
                ts(2000 + i),
            )
        )
    return spark.createDataFrame(rows, schema)


def members_df(spark: SparkSession, n_rooms: int = 30, n_users: int = 120) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("room", REF),
            T.StructField("user", REF),
            T.StructField("role", T.StringType()),
            T.StructField("joinedAt", T.TimestampType()),
            T.StructField("isMuted", T.BooleanType()),
        ]
    )
    rows = []
    k = 0
    for r in range(n_rooms):
        kind = r % 3  # 0 p2p, 1 group, 2 broadcast
        if kind == 0:
            n_m = 1 if r == 27 else (3 if r == 21 else 2)  # anomalies: 1- and 3-member p2p
        elif kind == 1:
            n_m = 3 + r % 3
        else:
            n_m = 2 + r % 4
        for m in range(n_m):
            rows.append(
                (
                    oid("roommembers", k),
                    ref_for("rooms", r, k),
                    ref_for("users", (r * 7 + m) % n_users, k + 1),
                    ["member", "admin", None, "MEMBER"][k % 4],
                    ts(3000 + k),
                    k % 9 == 8 or None,
                )
            )
            k += 1
    return spark.createDataFrame(rows, schema)


# string-or-{url} drift for picture/cover/photo fields
URLREF = T.StructType(
    [T.StructField("url", T.StringType()), T.StructField("raw", T.StringType())]
)


def _urlref(i: int, kind: str) -> tuple | None:
    if i % 5 == 4:
        return None
    url = (
        f"gs://sibci-devel.appspot.com/{kind}/{i}.png"
        if i % 3 == 0
        else f"https://cdn.example.com/{kind}/{i}.png"
    )
    return (url, None) if i % 2 == 0 else (None, url)


def professions_df(spark: SparkSession, n: int = 6) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("name_es", T.StringType()),
            T.StructField("isActive", T.BooleanType()),
        ]
    )
    rows = [
        (oid("professions", i), f"Profession {i}", f"Profesión {i}", True)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def channels_df(spark: SparkSession, n: int = 10, n_users: int = 120) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("visible", T.BooleanType()),
            T.StructField("picture", URLREF),
            T.StructField("cover", URLREF),
            T.StructField("lives", T.ArrayType(T.StringType())),
            T.StructField("createdBy", REF),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = [
        (
            oid("channels", i),
            f"Channel {i}",
            f"channel desc {i}" if i % 2 == 0 else None,
            None if i % 3 == 0 else (i % 3 == 1),
            i % 4 != 3,
            _urlref(i, "pic"),
            _urlref(i + 1, "cover"),
            [oid("lives", (i * 2 + j) % 20) for j in range(i % 4)],
            ref_for("users", (i * 11) % n_users, i),
            ts(4000 + i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def lives_df(spark: SparkSession, n: int = 20, n_channels: int = 10) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("photoURL", URLREF),
            T.StructField("coverImage", URLREF),
            T.StructField("thumbnail", URLREF),
            T.StructField("cover", URLREF),
            T.StructField("image", URLREF),
            T.StructField("isFinished", T.BooleanType()),
            T.StructField("isFeatured", T.BooleanType()),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("liveUrl", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("channel", REF),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = []
    for i in range(n):
        # exactly one of the 5 photo variants set (cycling), testing the
        # 5-way coalesce order
        photos: list = [None] * 5
        photos[i % 5] = _urlref(i * 2, "live") or (
            f"https://cdn.example.com/live/{i}.png",
            None,
        )
        rows.append(
            (
                oid("lives", i),
                f"Live {i}" if i % 2 == 0 else None,
                None if i % 2 == 0 else f"Live {i}",
                f"live desc {i}",
                *photos,
                i % 3 == 0,
                i % 4 == 0,
                False if i % 7 == 6 else True,
                f"https://youtu.be/v{i}" if i % 2 == 0 else None,
                f"https://youtube.com/watch?v={i}" if i % 2 == 1 else None,
                ref_for("channels", i % n_channels, i),
                ts(5000 + i),
            )
        )
    return spark.createDataFrame(rows, schema)


DOC_FOLDERS = [
    ("/", None),  # implicit root; not emitted as a row
    ("/legal", None),
    ("/legal/contracts", "/legal"),
    ("/legal/contracts/2020", "/legal/contracts"),  # depth 3
    ("/legal/briefs", "/legal"),
    ("/media", None),
    ("/media/images", "/media"),
]

# Salsa20 keys come from the pipeline's source-data config (the
# reference's settings.py:85-90 analogue) so fixtures encrypt with
# exactly what the pipeline decrypts.
from mongodb_etl_migration_spark.pipeline import FILEURL_IV, FILEURL_KEY  # noqa: E402


def docs_df(spark: SparkSession, n_files: int = 30) -> DataFrame:
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("fileUrl", T.StringType()),
            T.StructField("fileURL", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("onFolder", T.StringType()),
            T.StructField("uploadedBy", REF),
            T.StructField("specialRole", REF),
            T.StructField("isActive", T.BooleanType()),
            T.StructField("createdAt", T.TimestampType()),
        ]
    )
    rows = []
    # folder docs: title is the leaf name, onFolder is the PARENT path
    for i, (path, _parent) in enumerate(DOC_FOLDERS[1:]):
        leaf = path.rsplit("/", 1)[-1]
        parent = path.rsplit("/", 1)[0] or "/"
        rows.append(
            (
                oid("docs", i),
                leaf,
                None,
                None,
                None,
                "FOLDER",
                parent,
                ref_for("users", i, i),
                None,
                True,
                ts(6000 + i),
            )
        )
    from mongodb_etl_migration_spark.functions.crypto import salsa20_encrypt_str

    folder_paths = [p for p, _ in DOC_FOLDERS]
    for j in range(n_files):
        i = len(DOC_FOLDERS) - 1 + j
        drift = j % 2 == 0
        url = f"gs://sibci-2f7fc.appspot.com/docs/{j}.pdf" if j % 3 == 0 else f"https://cdn.example.com/docs/{j}.pdf"
        if j % 4 == 3:  # F26: some fileURLs arrive Salsa20-encrypted
            url = salsa20_encrypt_str(FILEURL_KEY, FILEURL_IV, url)
        on_folder = (
            f"/orphan/path{j}"  # exercises default-to-root
            if j % 9 == 8
            else folder_paths[j % len(folder_paths)]
        )
        rows.append(
            (
                oid("docs", 100 + j),
                f"File {j}" if drift else None,
                None if drift else f"File {j}",
                url if drift else None,
                None if drift else url,
                "DOCUMENTO" if j % 2 == 0 else "IMAGEN",
                on_folder,
                ref_for("users", j % 120, j),
                ref_for("roles", j % 4, j) if j % 6 == 5 else None,
                False if j % 10 == 9 else True,
                ts(6100 + j),
            )
        )
    return spark.createDataFrame(rows, schema)


def all_sources(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "roles": roles_df(spark),
        "provinces": provinces_df(spark),
        "municipalities": municipalities_df(spark),
        "parroquias": parroquias_df(spark),
        "users": users_df(spark),
        "rooms": rooms_df(spark),
        "messages": messages_df(spark),
        "roommembers": members_df(spark),
        "professions": professions_df(spark),
        "channels": channels_df(spark),
        "lives": lives_df(spark),
        "docs": docs_df(spark),
    }
