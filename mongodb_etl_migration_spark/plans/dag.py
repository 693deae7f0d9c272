"""Topological DAG driver — SURVEY.md §2.7 O5.

The reference orders its 15 entities by a hand-numbered 'order' field
(etl/config/settings.py:136-258, sorted at etl/orchestrator.py:597-619).
Here dependencies are declared per-spec and Kahn-sorted; execution is a
thin driver loop — plan construction is lazy, so "running" an entity
just materializes its writes, and independent entities can be submitted
concurrently (Spark's scheduler interleaves their stages).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame

from mongodb_etl_migration_spark.plans.spec import EntitySpec


def topo_order(specs: Sequence[EntitySpec]) -> list[EntitySpec]:
    by_name = {s.name: s for s in specs}
    ts = TopologicalSorter(
        {s.name: [d for d in s.depends_on if d in by_name] for s in specs}
    )
    return [by_name[name] for name in ts.static_order()]


def run_dag(
    specs: Sequence[EntitySpec],
    build: Callable[[EntitySpec], DataFrame],
    sink: Callable[[EntitySpec, DataFrame], None],
) -> dict[str, DataFrame]:
    """Build and sink every entity in dependency order; returns the
    built DataFrames (callers reuse them for id-maps / derived
    outputs instead of reading the sink back — SURVEY §7.4.5)."""
    built: dict[str, DataFrame] = {}
    for spec in topo_order(specs):
        df = build(spec)
        built[spec.name] = df
        sink(spec, df)
    return built
