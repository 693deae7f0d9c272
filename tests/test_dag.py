"""Topological DAG driver tests (O5) — spec ordering, full
build+sink loop, and compiler error surfaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.fixtures import (
    municipalities_df,
    provinces_df,
    roles_df,
    users_df,
)
from mongodb_etl_migration_spark.pipeline import (
    municipality_spec,
    province_spec,
    role_spec,
    user_spec,
)
from mongodb_etl_migration_spark.plans.compiler import compile_entity
from mongodb_etl_migration_spark.plans.dag import run_dag, topo_order
from datetime import datetime

RUN_TS = datetime(2021, 1, 1)


def test_topo_order_respects_dependencies():
    specs = [user_spec(RUN_TS), role_spec(), province_spec(), municipality_spec()]
    ordered = [s.name for s in topo_order(specs)]
    assert ordered.index("role") < ordered.index("user")
    assert ordered.index("province") < ordered.index("user")
    assert ordered.index("municipality") < ordered.index("user")


def test_run_dag_builds_and_sinks_in_order(spark, tmp_path):
    sources = {
        "roles": roles_df(spark),
        "provinces": provinces_df(spark),
        "municipalities": municipalities_df(spark),
        "users": users_df(spark),
    }
    specs = [user_spec(RUN_TS), role_spec(), province_spec(), municipality_spec()]
    built_order: list[str] = []
    id_maps: dict = {}

    def build(spec):
        df = compile_entity(spec, sources[spec.source], id_maps)
        if spec.name == "role":
            id_maps["role_by_name"] = df.select(
                F.col("name").alias("natural_key"), F.col("id")
            )
        if spec.name == "province":
            id_maps["province"] = df.select(
                F.col("mongo_id").alias("natural_key"), F.col("id")
            )
        if spec.name == "municipality":
            id_maps["municipality"] = df.select(
                F.col("mongo_id").alias("natural_key"), F.col("id")
            )
        return df

    def sink(spec, df):
        built_order.append(spec.name)
        df.write.mode("overwrite").parquet(str(tmp_path / spec.destination))

    built = run_dag(specs, build, sink)
    assert set(built) == {"role", "province", "municipality", "user"}
    assert built_order.index("role") < built_order.index("user")
    # sinks materialized and readable
    users_back = spark.read.parquet(str(tmp_path / "user"))
    assert users_back.count() == built["user"].count() > 0
    # FK resolution happened through the id maps built along the DAG
    assert users_back.filter(F.col("role_id").isNull()).count() == 0


def test_compile_entity_missing_id_map_raises(spark):
    with pytest.raises(KeyError, match="province"):
        compile_entity(user_spec(RUN_TS), users_df(spark), {})
