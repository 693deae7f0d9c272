"""Run metrics — SURVEY.md §2.1 S13.

The reference accumulates per-entity extracted/transformed/loaded
counts plus run timings and dumps JSON (etl/utils/metrics.py:102-114).
Engine version: explicit per-output recording (counts come from the
DataFrames the pipeline already computed — no extra scans if the
caller passes known counts) plus a queries-facing DataFrame view.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class EntityMetric:
    entity: str
    rows: int
    seconds: float


@dataclass
class RunMetrics:
    started_at: float = field(default_factory=time.time)
    entities: list[EntityMetric] = field(default_factory=list)

    def record(self, entity: str, rows: int, seconds: float) -> None:
        self.entities.append(EntityMetric(entity, rows, seconds))

    def timed(self, entity: str, df: DataFrame) -> int:
        """Count one output, recording rows + wall time."""
        t0 = time.time()
        n = df.count()
        self.record(entity, n, time.time() - t0)
        return n

    @property
    def total_rows(self) -> int:
        return sum(e.rows for e in self.entities)

    def as_dict(self) -> dict:
        return {
            "started_at": self.started_at,
            "total_rows": self.total_rows,
            "entities": [
                {"entity": e.entity, "rows": e.rows, "seconds": round(e.seconds, 3)}
                for e in self.entities
            ],
        }

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.as_dict(), f, indent=2)

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [(e.entity, e.rows, float(e.seconds)) for e in self.entities],
            "entity string, rows long, seconds double",
        )
