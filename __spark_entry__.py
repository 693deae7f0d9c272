"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``mongodb_etl_migration_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the denormalized
    latest-order-per-customer view (SURVEY.md J5+J6 shape)."""
    from mongodb_etl_migration_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


# Enumeration order for the driver's correctness run. The driver may
# cap the number of queries it checks per round, so the catalog must
# put the queries MOST in need of a fresh driver row first. The rule —
# CHANGED CODE INVALIDATES ITS GREEN — is enforced mechanically, not
# by hand-maintained sets: GREEN_HASHES.json (regenerated each round
# by scripts/update_green_hashes.py) snapshots every query's
# implementation hash (function source + oracle SQL + transitive
# package-module closure, see provenance.py) at the commit its latest
# green driver row actually tested. Enumeration order:
#   1. no snapshot entry (never driver-green) or hash mismatch
#      (implementation/oracle changed since last green) — catalog
#      order within the bucket;
#   2. hash-matching greens, oldest green round first (rotates fresh
#      rows onto the stalest receipts when the cap allows).


def _enumeration_order(query_names) -> list[str]:
    import json

    try:
        from mongodb_etl_migration_spark import provenance
        from mongodb_etl_migration_spark.queries import ORACLES, QUERIES

        snapshot = json.loads((Path(_REPO) / "GREEN_HASHES.json").read_text())
        current = provenance.catalog_hashes(
            QUERIES, ORACLES, Path(_REPO) / "mongodb_etl_migration_spark"
        )
    except Exception:
        return list(query_names)  # fail open: catalog order
    return _bucket_order(query_names, snapshot, current)


def _bucket_order(query_names, snapshot, current) -> list[str]:
    """Five buckets: (1) never-green — no driver receipt exists at
    all; (2) the query's OWN transitive call chain changed since its
    green (self-hash mismatch — receipt genuinely stale); (3) a file
    in its operator-module closure changed but not its own call chain
    (narrow mismatch, self match — usually an unrelated function
    added to a shared module); (4) only ubiquitous infra changed
    (full mismatch, narrow match); (5) clean greens. Buckets 3-5
    order stalest receipt first, rotating fresh rows onto the oldest
    receipts when the cap allows. Old snapshots stored one string
    hash — treated as full-only; dict snapshots without a "self"
    entry fall back to narrow-tier classification."""
    never, changed, module, infra, green = [], [], [], [], []
    for n in query_names:
        snap = snapshot.get(n)
        cur = current.get(n, {})
        if snap is None:
            never.append(n)
            continue
        sh = snap.get("hash")
        if isinstance(sh, str):
            (changed if sh != cur.get("full") else green).append(n)
        elif sh.get("self") is not None and cur.get("self") is not None:
            if sh["self"] != cur["self"]:
                changed.append(n)
            elif sh.get("narrow") != cur.get("narrow"):
                module.append(n)
            elif sh.get("full") != cur.get("full"):
                infra.append(n)
            else:
                green.append(n)
        elif sh.get("narrow") != cur.get("narrow"):
            changed.append(n)
        elif sh.get("full") != cur.get("full"):
            infra.append(n)
        else:
            green.append(n)
    for bucket in (module, infra, green):
        bucket.sort(key=lambda n: snapshot[n].get("round", 0))
    return never + changed + module + infra + green


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data extensions; queries whose implementation changed
    since their last green driver row (or never had one) first."""
    from mongodb_etl_migration_spark.queries import QUERIES

    return {n: QUERIES[n] for n in _enumeration_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query. Omitted entries
    (uuid/timeuuid bit-layouts, ciphers, runtime-looked-up LSH planes)
    fall back to the driver's rows-only check."""
    from mongodb_etl_migration_spark.queries import ORACLES

    return dict(ORACLES)
