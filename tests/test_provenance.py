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


def test_hashes_cover_catalog_with_all_tiers():
    cur = _current()
    assert set(cur) == set(QUERIES)
    for h in cur.values():
        assert set(h) == {"full", "narrow", "self"}
        assert all(len(v) == 64 for v in h.values())


def test_narrow_excludes_ubiquitous_infra_only():
    """Narrow must differ from full exactly when the closure touches
    an excluded infra module — i.e. for catalog-reading queries."""
    cur = _current()
    # Every catalog query reads via Catalog, so narrow != full there.
    assert cur["s1_filtered_scan"]["narrow"] != cur["s1_filtered_scan"]["full"]


def test_enumeration_is_permutation_of_catalog():
    order = entry._enumeration_order(QUERIES)
    assert sorted(order) == sorted(QUERIES)


def test_bucket_order_self_then_module_then_infra_then_green():
    cur = _current()
    names = list(QUERIES)
    a, b, c, d, e = names[:5]
    snapshot = {
        # a: self mismatch (own call chain changed) -> bucket 2
        a: {"round": 3, "hash": {**cur[a], "self": "x"}},
        # b: module-closure mismatch, self match (unrelated function
        # added to a shared operator module) -> bucket 3
        b: {"round": 3, "hash": {**cur[b], "narrow": "x"}},
        # c: full-only mismatch (ubiquitous infra changed) -> bucket 4
        c: {"round": 3, "hash": {**cur[c], "full": "x"}},
        # d/e: clean greens, stalest receipt first -> bucket 5
        d: {"round": 1, "hash": dict(cur[d])},
        e: {"round": 2, "hash": dict(cur[e])},
    }
    order = entry._bucket_order([e, d, c, b, a], snapshot, cur)
    assert order == [a, b, c, d, e]
    # never-green leads everything
    order2 = entry._bucket_order(
        [d, "brand_new", a], snapshot, {**cur, "brand_new": {}}
    )
    assert order2 == ["brand_new", a, d]


def test_bucket_order_snapshot_without_self_falls_back_to_narrow():
    """Pre-self-tier dict snapshots classify by narrow/full alone."""
    cur = _current()
    a, b = list(QUERIES)[:2]
    snapshot = {
        a: {
            "round": 3,
            "hash": {"full": cur[a]["full"], "narrow": "x"},
        },
        b: {
            "round": 3,
            "hash": {"full": cur[b]["full"], "narrow": cur[b]["narrow"]},
        },
    }
    assert entry._bucket_order([b, a], snapshot, cur) == [a, b]


def test_bucket_order_legacy_string_hash():
    cur = _current()
    a, b = list(QUERIES)[:2]
    snapshot = {
        a: {"round": 2, "hash": cur[a]["full"]},  # legacy, matches -> green
        b: {"round": 2, "hash": "stale"},  # legacy, mismatch -> changed
    }
    assert entry._bucket_order([a, b], snapshot, cur) == [b, a]


def test_self_hash_survives_append_only_module_edits(tmp_path):
    """An append-only edit to a shared operator module (new unrelated
    function added at the end) must leave untouched queries' SELF
    hashes stable — only full/narrow (module-file tiers) may drift.
    This is the property that keeps the driver's 50-row cap pointed at
    genuinely-risky rows instead of hash noise (round-6 verdict #1)."""
    files = provenance.package_files(PKG_ROOT)
    graph = provenance.import_graph(files)
    # Pick a query whose NARROW closure is non-empty (touches a shared
    # operator module), so the append is visible to the module tiers.
    for name, fn in QUERIES.items():
        mods, _, _ = provenance._fn_deps(fn, fn.__module__)
        closure = provenance._closure(mods, graph) - provenance._UBIQUITOUS
        in_files = sorted(m for m in closure if m in files)
        if in_files:
            break
    else:
        raise AssertionError("no query with a non-empty narrow closure")
    mod = in_files[0]
    before = provenance.query_impl_hash(fn, ORACLES.get(name), files, graph)
    # Simulate the append: copy the module file, append a new no-op
    # function at the end, re-hash.
    tampered = dict(files)
    copy = tmp_path / "readers_appended.py"
    copy.write_text(
        files[mod].read_text() + "\n\ndef _brand_new_unrelated():\n    return 1\n"
    )
    tampered[mod] = copy
    after = provenance.query_impl_hash(fn, ORACLES.get(name), tampered, graph)
    assert after["self"] == before["self"], "self tier must ignore module appends"
    assert after["narrow"] != before["narrow"], "module tiers must still notice"
    assert after["full"] != before["full"]


def test_green_hashes_snapshot_is_current_format():
    import json

    snap = json.loads((REPO / "GREEN_HASHES.json").read_text())
    assert snap, "GREEN_HASHES.json missing or empty"
    for v in snap.values():
        assert isinstance(v["hash"], dict)
        assert {"full", "narrow", "self"} <= set(v["hash"])
