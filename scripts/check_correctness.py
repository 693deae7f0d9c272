#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
catalog query on Spark and its oracle on DuckDB at a given sf dir,
compare row count + schema + order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402

from mongodb_etl_migration_spark import get_spark  # noqa: E402
from mongodb_etl_migration_spark.catalog import TABLES  # noqa: E402
from mongodb_etl_migration_spark.queries import ORACLES, QUERIES  # noqa: E402
from tests.oracle_compare import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            if name not in ORACLES:
                n = sdf.count()
                print(f"  {name:28s} rows-only ({n} rows) "
                      f"[{time.time() - t0:.1f}s]")
                continue
            ddf = con.execute(ORACLES[name]).fetchdf()
            ok, msg = compare(sdf, ddf)
            status = "OK " if ok else "FAIL"
            print(f"  {name:28s} {status} ({len(ddf)} rows) "
                  f"[{time.time() - t0:.1f}s] {'' if ok else msg[:200]}")
            failures += 0 if ok else 1
        except Exception as e:  # pragma: no cover
            print(f"  {name:28s} ERROR {str(e)[:200]}")
            failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: "
          f"{len(names) - failures}/{len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
