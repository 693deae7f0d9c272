"""Spec → DataFrame compiler.

Stage order matters for Catalyst:
1. filters first (so predicates sit directly on the scan and push down
   to parquet/connector — the Spark analogue of the reference pushing
   its message filter into Mongo find(),
   etl/extractors/mongo_extractor.py:53-72);
2. FK-resolution broadcast joins (replacing IDMapper dict caches,
   etl/utils/id_mapper.py:22-92);
3. projection to destination columns (FieldMapper,
   etl/transformers/field_mapper.py:550-578);
4. surrogate keys last (deterministic; never a join dependency —
   SURVEY §4 "candidate-but-rejected").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongodb_etl_migration_spark.functions.keys import (
    assign_sequential_ids,
    timeuuid_deterministic,
    uuid5_oid,
)
from mongodb_etl_migration_spark.plans.spec import EntitySpec


def compile_entity(
    spec: EntitySpec,
    source_df: DataFrame,
    id_maps: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Compile one entity spec to a lazy DataFrame.

    ``id_maps``: dim-name → DataFrame(natural_key, id) for FK joins
    (the broadcast replacement of the reference's preloaded caches,
    etl/orchestrator.py:86-102).
    """
    df = source_df
    for pred in spec.filters:
        df = df.filter(pred(df))

    for name, builder in spec.derivations.items():
        df = df.withColumn(name, builder(df))

    for pred in spec.post_filters:
        df = df.filter(pred(df))

    for fk in spec.fk_joins:
        if id_maps is None or fk.dim not in id_maps:
            raise KeyError(f"missing id map for dimension {fk.dim!r}")
        dim = id_maps[fk.dim].select(
            F.col("natural_key").alias(fk.on), F.col("id").alias(fk.out)
        )
        df = df.join(F.broadcast(dim), fk.on, fk.how)

    if spec.projection:
        df = df.select(
            *[builder(df).alias(dest) for dest, builder in spec.projection.items()]
        )

    key = spec.key
    if key is not None and key.kind != "none":
        if key.kind == "sequential":
            df = assign_sequential_ids(
                df, list(key.order_by) or [key.source_col], key.out, key.start
            )
        elif key.kind == "uuid5":
            df = df.withColumn(key.out, uuid5_oid(F.col(key.source_col)))
        elif key.kind == "timeuuid":
            ts_col, src = key.order_by[0], key.source_col
            # cast via instant: TIMESTAMP_NTZ has no direct double cast
            ms = (
                F.col(ts_col).cast("timestamp").cast("double") * 1000
            ).cast("bigint")
            df = df.withColumn(
                key.out, timeuuid_deterministic(F.col(src), ms)
            )
        else:
            raise ValueError(f"unknown key kind {key.kind!r}")
    return df


def compile_entity_outputs(
    spec: EntitySpec,
    source_df: DataFrame,
    id_maps: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Compile the entity AND its §2.9 side-outputs: the main frame is
    persisted once (the cache+multi-action idiom) and each side output
    is a cheap filter+projection over it — one scan feeding N sinks
    (etl/orchestrator.py:326-453).

    Cache lifecycle: the CALLER owns it — after running its actions
    over the returned frames, it should ``outs[spec.destination]
    .unpersist()`` (CacheManager entries are plan-keyed and never
    freed by GC; a long-lived session that compiles the same entity
    repeatedly otherwise accumulates dead caches)."""
    main = compile_entity(spec, source_df, id_maps)
    if not spec.side_outputs:
        return {spec.destination: main}
    main = main.persist()
    outs = {spec.destination: main}
    for name, (pred, projection) in spec.side_outputs.items():
        df = main.filter(pred(main)) if pred is not None else main
        outs[name] = df.select(
            *[builder(df).alias(dest) for dest, builder in projection.items()]
        )
    return outs
