"""Catalog-wide physical-plan invariants — the 100 TB guardrails.

Every query in the catalog must compile to a plan that would survive a
1000-executor cluster: no CartesianProduct, no BroadcastNestedLoopJoin
(a range predicate that misses its equi-key degenerates to one), and
no row-at-a-time Python UDFs (BatchEvalPython). Arrow-batched Python
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is allowed
only for the queries that declare it — keys, crypto, multimodal,
stateful streaming.

This is a systemic regression net: any future query that accidentally
plans a nested loop or drops to per-row Python fails here, not in a
100 TB run.
"""

from __future__ import annotations

import pytest

from mongodb_etl_migration_spark.queries import QUERIES

# Queries whose Arrow-batched Python stages are by design.
ARROW_OK = {
    "k1_uuid5",            # uuid5 bit layout (pandas UDF, K1)
    "k2_timeuuid",         # RFC-4122 v1 layout (pandas UDF, K2)
    "x_crypto_migration",  # Salsa20 (pure-Python spec cipher, F22)
    "m_multimodal_decode",   # mapInPandas decode plumbing
    "m_image_decode_real",   # real BMP codec (mapInPandas)
    "m_audio_decode_real",   # real WAV codec (mapInPandas)
    "e_sessionization",      # batch twin is pure SQL — listed in case
}

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
ARROW_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_invariants(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in FORBIDDEN:
        assert node not in plan, f"{name}: forbidden {node} in plan"
    if name not in ARROW_OK:
        for node in ARROW_NODES:
            assert node not in plan, (
                f"{name}: unexpected Python stage {node} — add to ARROW_OK "
                "only if the Python hop is genuinely required"
            )
