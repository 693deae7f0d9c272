#!/usr/bin/env python
"""End-to-end migration run — the reference's ``python main.py``
twin (etl/orchestrator.py): compile the full 15-entity DAG, write
every output table as parquet, and emit a metrics JSON whose row
counts RIDE the write actions (RunMetrics.observed — one job per
output, no second count pass; S13 at scale).

Usage: python scripts/run_pipeline.py [out_dir]
"""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.fixtures import all_sources  # noqa: E402
from mongodb_etl_migration_spark.metrics import RunMetrics  # noqa: E402
from mongodb_etl_migration_spark.pipeline import run_reference_pipeline  # noqa: E402

RUN_TS = datetime(2021, 6, 1)


def main() -> int:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mongodb_etl_migration_run")
    spark = get_spark(app_name="migration-run")
    spark.sparkContext.setLogLevel("ERROR")

    outputs = run_reference_pipeline(all_sources(spark), RUN_TS)
    metrics = RunMetrics()
    for name, df in outputs.items():
        metrics.observed(name, df).write.mode("overwrite").parquet(
            str(out_dir / name)
        )
        # harvest per entity: the observation's wall time is
        # attach→harvest, so harvesting here scopes it to this write
        metrics.harvest()
    metrics.save(str(out_dir / "metrics.json"))

    for e in metrics.entities:
        print(f"  {e.entity:28s} {e.rows:8d} rows  {e.seconds:6.2f}s")
    print(f"TOTAL {metrics.total_rows} rows -> {out_dir}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
