#!/usr/bin/env python
"""End-to-end migration run — the reference's ``python main.py``
twin (etl/orchestrator.py): compile the full 15-entity DAG, write
every output table as parquet, and emit a metrics JSON whose row
counts RIDE the write actions (RunMetrics.observed — one job per
output, no second count pass; S13 at scale).

Usage: python scripts/run_pipeline.py [out_dir] [--from-bson DIR]

``--from-bson DIR`` sources every collection from mongodump backup
files (DIR/<collection>.bson, or a subdirectory per collection) via
format("mongodump") instead of the in-memory fixtures — the
reference's actual input path (backups/appcampana_db) end to end.
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


def _bson_sources(spark, backup_dir: Path):
    """Mirror all_sources() from a backup directory: schemas come from
    the fixture frames (the entity contracts), data from the dumps."""
    from mongodb_etl_migration_spark.sources.mongodump_source import (
        register_mongodump,
    )

    register_mongodump(spark)
    out = {}
    for name, fixture_df in all_sources(spark).items():
        path = backup_dir / f"{name}.bson"
        if not path.exists():
            path = backup_dir / name  # directory of part files
        out[name] = (
            spark.read.format("mongodump")
            .schema(fixture_df.schema)
            .option("path", str(path))
            .load()
        )
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if "--help" in args or "-h" in args:
        print(__doc__)
        return 0
    backup_dir = None
    if "--from-bson" in args:
        i = args.index("--from-bson")
        backup_dir = Path(args[i + 1])
        del args[i : i + 2]
    out_dir = Path(args[0] if args else "/tmp/mongodb_etl_migration_run")
    spark = get_spark(app_name="migration-run")
    spark.sparkContext.setLogLevel("ERROR")

    sources = (
        _bson_sources(spark, backup_dir) if backup_dir else all_sources(spark)
    )
    outputs = run_reference_pipeline(sources, RUN_TS)
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
