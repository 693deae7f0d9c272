"""Mongo extended-JSON ingest (readers.normalize_extended_json):
wrapper structs → typed columns, recursively, schema-driven (no UDF).
Mirrors the reference's per-document serialize_document walk
(etl/extractors/mongo_extractor.py:211-237) at plan time."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from mongodb_etl_migration_spark.sources.readers import (
    normalize_extended_json,
    read_json_documents,
)


def test_extended_json_normalization(spark, tmp_path):
    docs = [
        {
            "_id": {"$oid": "64b0c7e2a1b2c3d4e5f60718"},
            "createdAt": {"$date": "2021-03-04T05:06:07.008Z"},
            "updatedAt": {"$date": {"$numberLong": "1614834367008"}},
            "views": {"$numberLong": "9007199254740993"},
            "rank": {"$numberInt": "7"},
            "score": {"$numberDouble": "0.25"},
            "nested": {
                "owner": {"$oid": "64b0c7e2a1b2c3d4e5f60719"},
                "plain": "keep-me",
            },
            "tags": ["a", "b"],
            "refs": [
                {"$oid": "64b0c7e2a1b2c3d4e5f6071a"},
                {"$oid": "64b0c7e2a1b2c3d4e5f6071b"},
            ],
        },
        {
            "_id": {"$oid": "64b0c7e2a1b2c3d4e5f6071c"},
            "createdAt": {"$date": "2022-01-01T00:00:00.000Z"},
            "updatedAt": {"$date": {"$numberLong": "1640995200000"}},
            "views": {"$numberLong": "1"},
            "rank": {"$numberInt": "-3"},
            "score": {"$numberDouble": "1.5"},
            "nested": {"owner": {"$oid": "64b0c7e2a1b2c3d4e5f6071d"}, "plain": "x"},
            "tags": [],
            "refs": [],
        },
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in docs))

    raw = read_json_documents(spark, str(p))
    out = normalize_extended_json(raw)

    t = dict(out.dtypes)
    assert t["_id"] == "string"
    assert t["createdAt"] == "timestamp"
    assert t["updatedAt"] == "timestamp"
    assert t["views"] == "bigint"
    assert t["rank"] == "int"
    assert t["score"] == "double"
    assert t["refs"] == "array<string>"
    assert "owner:string" in t["nested"].replace(" ", "")

    r = out.orderBy("_id").collect()[0]
    assert r["_id"] == "64b0c7e2a1b2c3d4e5f60718"
    assert r["views"] == 9007199254740993
    assert r["rank"] == 7 and r["score"] == 0.25
    assert r["nested"]["owner"] == "64b0c7e2a1b2c3d4e5f60719"
    assert r["nested"]["plain"] == "keep-me"
    assert r["refs"] == [
        "64b0c7e2a1b2c3d4e5f6071a",
        "64b0c7e2a1b2c3d4e5f6071b",
    ]
    # $date (ISO) and $date.$numberLong (epoch ms) agree on the instant
    assert r["createdAt"] == r["updatedAt"]
    assert r["createdAt"] == datetime(2021, 3, 4, 5, 6, 7, 8000)
