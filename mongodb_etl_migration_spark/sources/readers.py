"""Source readers — SURVEY.md §2.1 S1–S5.

Parquet is the in-repo source format (driver testdata). The mongo path
is the same call shape with format("mongodb") — kept behind an option
so the engine runs without the connector jar. Filters are passed as
Column predicates applied directly on the scan; Catalyst pushes
supported predicates into the source (check ``PushedFilters`` in
.explain — the equivalent of the reference's server-side find() query,
etl/extractors/mongo_extractor.py:28-103).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_entity(
    spark: SparkSession,
    path: str,
    filters: Sequence[Column] = (),
    columns: Sequence[str] | None = None,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S1/S3: filtered, projected scan. Column pruning via select and
    predicate pushdown via filter-on-scan are both Catalyst-automatic."""
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load(path)
    for f in filters:
        df = df.filter(f)
    if columns:
        df = df.select(*columns)
    return df


def read_json_documents(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Mongo-shaped nested JSON ingest (S5): permissive mode keeps
    malformed docs (defensive, like the reference's .get() accessors);
    explicit schema avoids a second inference pass over 100 TB."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def ids_in_scan(df: DataFrame, id_col: str, ids: Sequence[str]) -> DataFrame:
    """S3: point/IN scan. Small lists inline into the scan filter
    (pushed down); big lists become a broadcast semi-join."""
    if len(ids) <= 1000:
        return df.filter(F.col(id_col).isin(list(ids)))
    spark = df.sparkSession
    ids_df = spark.createDataFrame([(i,) for i in ids], [id_col])
    return df.join(F.broadcast(ids_df), id_col, "left_semi")
