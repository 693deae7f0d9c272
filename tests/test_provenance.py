"""Driver-priority mechanics: "changed code invalidates its green".

Covers provenance.catalog_hashes (two-tier full/narrow implementation
hashes) and __spark_entry__'s bucketed enumeration order — no Spark
session needed, the hashes are pure source inspection.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from mongodb_etl_migration_spark import provenance  # noqa: E402
from mongodb_etl_migration_spark.queries import ORACLES, QUERIES  # noqa: E402

entry = importlib.import_module("__spark_entry__")

PKG_ROOT = REPO / "mongodb_etl_migration_spark"


def _current():
    return provenance.catalog_hashes(QUERIES, ORACLES, PKG_ROOT)


def test_hashes_cover_catalog_with_both_tiers():
    cur = _current()
    assert set(cur) == set(QUERIES)
    for h in cur.values():
        assert set(h) == {"full", "narrow"}
        assert len(h["full"]) == 64 and len(h["narrow"]) == 64


def test_narrow_excludes_ubiquitous_infra_only():
    """Narrow must differ from full exactly when the closure touches
    an excluded infra module — i.e. for catalog-reading queries."""
    cur = _current()
    # Every catalog query reads via Catalog, so narrow != full there.
    assert cur["s1_filtered_scan"]["narrow"] != cur["s1_filtered_scan"]["full"]


def test_enumeration_is_permutation_of_catalog():
    order = entry._enumeration_order(QUERIES)
    assert sorted(order) == sorted(QUERIES)


def test_bucket_order_changed_then_infra_then_green():
    cur = _current()
    names = list(QUERIES)
    a, b, c, d = names[0], names[1], names[2], names[3]
    snapshot = {
        # a: narrow mismatch (own code changed) -> bucket 1
        a: {"round": 3, "hash": {"full": cur[a]["full"], "narrow": "x"}},
        # b: full-only mismatch (infra changed) -> bucket 2
        b: {"round": 3, "hash": {"full": "x", "narrow": cur[b]["narrow"]}},
        # c: clean green, old round -> bucket 3 (before d)
        c: {"round": 1, "hash": dict(cur[c])},
        d: {"round": 2, "hash": dict(cur[d])},
        # legacy single-string snapshots: match -> green, mismatch -> changed
    }
    order = entry._bucket_order([a, b, c, d], snapshot, cur)
    assert order == [a, b, c, d]
    # never-green joins bucket 1 ahead of infra/green
    order2 = entry._bucket_order([c, "brand_new", b], snapshot, {**cur, "brand_new": {}})
    assert order2 == ["brand_new", b, c]


def test_bucket_order_legacy_string_hash():
    cur = _current()
    a, b = list(QUERIES)[:2]
    snapshot = {
        a: {"round": 2, "hash": cur[a]["full"]},  # legacy, matches -> green
        b: {"round": 2, "hash": "stale"},  # legacy, mismatch -> changed
    }
    assert entry._bucket_order([a, b], snapshot, cur) == [b, a]


def test_green_hashes_snapshot_is_current_format():
    import json

    snap = json.loads((REPO / "GREEN_HASHES.json").read_text())
    assert snap, "GREEN_HASHES.json missing or empty"
    for v in snap.values():
        assert isinstance(v["hash"], dict) and {"full", "narrow"} <= set(v["hash"])
