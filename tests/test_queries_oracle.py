"""Every catalog query with an oracle must hash-match DuckDB at
sf0.001 — the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tests.oracle_compare import compare


def _pairs():
    from mongodb_etl_migration_spark.queries import ORACLES, QUERIES

    return sorted(QUERIES), ORACLES


NAMES = sorted(
    __import__(
        "mongodb_etl_migration_spark.queries", fromlist=["QUERIES"]
    ).QUERIES
)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from mongodb_etl_migration_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        # rows-only check (driver's weaker gate for non-SQL ops)
        assert sdf.count() >= 0
        assert len(sdf.schema.fields) > 0
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    ok, msg = compare(sdf, ddf)
    assert ok, f"{name}: {msg}"
