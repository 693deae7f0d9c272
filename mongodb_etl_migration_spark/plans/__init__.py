"""Declarative entity plans: spec → lazy DataFrame, plus DAG driver."""

from mongodb_etl_migration_spark.plans.spec import (  # noqa: F401
    EntitySpec,
    FKJoin,
    KeySpec,
)
from mongodb_etl_migration_spark.plans.compiler import compile_entity  # noqa: F401
from mongodb_etl_migration_spark.plans.dag import run_dag  # noqa: F401
