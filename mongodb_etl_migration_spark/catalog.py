"""Table catalog over the driver-generated parquet testdata.

The reference enumerates its 15 source collections in
``etl/config/settings.py:136-258``; here the analogous registry is the
driver's TPC-H-ish star schema (TESTDATA.md). Reads are plain
``spark.read.parquet`` so Catalyst gets full predicate pushdown /
column pruning (`PushedFilters` in the scan node) — the Spark
equivalent of the reference pushing filters into Mongo ``find()``
(etl/extractors/mongo_extractor.py:53-72).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy per-table DataFrame access for one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        if name not in self._cache:
            self._cache[name] = self.spark.read.parquet(
                f"{self.sf_dir}/{name}.parquet"
            )
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_temp_views(self) -> None:
        """Expose every table as a temp view for spark.sql(...) use."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
